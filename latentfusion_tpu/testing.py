"""Synthetic test fixtures: a differentiable analytic ellipsoid renderer that
implements the model interface consumed by pose estimators.

This is the TPU rebuild's analog of the reference's synthetic-evaluation rig
(``render_random_observations`` / ``sample_eval_observations``,
reference: observation.py:20-68) — but needs no mesh, no EGL, and is exactly
differentiable, so estimator integration tests can assert actual pose
recovery rather than just "it runs".
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .camera import Camera
from .observation import Observation
from .three import quaternion as quat


def render_ellipsoid(camera: Camera, size: int, axes=(0.15, 0.25, 0.35),
                     mask_sharpness: float = 400.0):
    """Analytic ray-traced ellipsoid centered at the object origin.

    Returns (depth_metric (N,1,h,w) with 0 at misses, mask (N,1,h,w),
    mask_logits). Differentiable w.r.t. camera pose.
    """
    u, v = camera.pixel_coords_uv(size)
    u0 = camera.u0.reshape(-1, 1, 1)
    v0 = camera.v0.reshape(-1, 1, 1)
    fu = camera.fu.reshape(-1, 1, 1)
    fv = camera.fv.reshape(-1, 1, 1)

    # Ray direction in camera frame (z component = 1 so that the ray
    # parameter equals camera-frame depth).
    dx = (u - u0) / fu
    dy = (v - v0) / fv
    dz = jnp.ones_like(dx)
    d_cam = jnp.stack((dx, dy, dz), axis=-1)  # (N, h, w, 3)

    R = camera.rotation_matrix[:, :3, :3]
    d_obj = jnp.einsum("nji,nhwj->nhwi", R, d_cam)  # R^T d
    o_obj = camera.position[:, None, None, :]  # (N, 1, 1, 3)

    inv_axes = 1.0 / jnp.asarray(axes)
    ds = d_obj * inv_axes
    os_ = o_obj * inv_axes
    a = (ds ** 2).sum(-1)
    b = 2.0 * (os_ * ds).sum(-1)
    c = (os_ ** 2).sum(-1) - 1.0
    disc = b ** 2 - 4 * a * c

    t = (-b - jnp.sqrt(jnp.maximum(disc, 1e-12))) / (2 * a)
    hit = disc > 0
    depth = jnp.where(hit, t, 0.0)[:, None]  # (N, 1, h, w)
    mask_logits = (disc * mask_sharpness)[:, None]
    mask = jax.nn.sigmoid(mask_logits)
    return depth, mask, mask_logits


class EllipsoidOracleModel:
    """Stands in for ``LatentFusionModel`` in estimator tests/benchmarks.

    ``decode_latent`` ignores ``z_obj`` and renders the analytic ellipsoid
    from the given (zoomed) cameras, producing the same output contract as
    ``Photographer.decode``.
    """

    def __init__(self, input_size: int = 64, camera_dist: float = 3.90625,
                 axes=(0.15, 0.25, 0.35)):
        self.input_size = input_size
        self.camera_dist = camera_dist
        self.axes = axes
        self.device = None
        self.photographer = None
        self.photographer_params = None

    def decode_latent(self, z_obj, camera: Camera, return_latent: bool = True,
                      apply_mask: bool = False):
        depth_metric, mask, mask_logits = render_ellipsoid(
            camera, self.input_size, self.axes)
        depth_norm = camera.normalize_depth(depth_metric)
        # Background pixels read as far plane -1 (masked normalized depth).
        depth_norm = jnp.where(mask > 0.5, depth_norm, -1.0)
        y = {
            "depth": depth_norm[None],
            "mask": mask[None],
            "mask_logits": mask_logits[None],
        }
        z_lat = jnp.zeros((1, camera.length, 1)) if return_latent else None
        return y, z_lat, None

    def compute_latent_code(self, observation, camera):
        return jnp.zeros((camera.length, 1))

    def build_latent_object(self, observation) -> jnp.ndarray:
        """Dummy latent with the (B, 1, C, D, H, W) contract (the oracle
        renders analytically and ignores it)."""
        return jnp.zeros((1, 1, 1, 1, 1, 1))

    def make_observation(self, camera: Camera,
                         full_size: Optional[tuple] = None,
                         shaded: bool = False) -> Observation:
        """Ground-truth full-frame observation of the ellipsoid.

        ``shaded=True`` renders a procedurally textured, headlight-lit
        color channel (orientation-informative — the analog of the
        reference's random PBR materials, training/pyrender.py:232-250)
        instead of the silhouette broadcast."""
        depth, mask, _ = render_ellipsoid_full(camera, self.axes)
        if shaded:
            color = render_ellipsoid_color(camera, depth, mask, self.axes)
        else:
            color = jnp.broadcast_to(
                mask, (camera.length, 3, camera.height, camera.width))
        return Observation(color, depth, (mask > 0.5).astype(jnp.float32),
                           camera)


def render_ellipsoid_full(camera: Camera, axes=(0.15, 0.25, 0.35)):
    """Full-frame variant (out size = (height, width))."""
    u, v = camera.pixel_coords_uv((camera.height, camera.width))
    u0 = camera.u0.reshape(-1, 1, 1)
    v0 = camera.v0.reshape(-1, 1, 1)
    fu = camera.fu.reshape(-1, 1, 1)
    fv = camera.fv.reshape(-1, 1, 1)
    dx = (u - u0) / fu
    dy = (v - v0) / fv
    d_cam = jnp.stack((dx, dy, jnp.ones_like(dx)), axis=-1)
    R = camera.rotation_matrix[:, :3, :3]
    d_obj = jnp.einsum("nji,nhwj->nhwi", R, d_cam)
    o_obj = camera.position[:, None, None, :]
    inv_axes = 1.0 / jnp.asarray(axes)
    ds = d_obj * inv_axes
    os_ = o_obj * inv_axes
    a = (ds ** 2).sum(-1)
    b = 2.0 * (os_ * ds).sum(-1)
    c = (os_ ** 2).sum(-1) - 1.0
    disc = b ** 2 - 4 * a * c
    t = (-b - jnp.sqrt(jnp.maximum(disc, 1e-12))) / (2 * a)
    hit = disc > 0
    depth = jnp.where(hit, t, 0.0)[:, None]
    mask = hit.astype(jnp.float32)[:, None]
    return depth, mask, None


def render_ellipsoid_color(camera: Camera, depth, mask,
                           axes=(0.15, 0.25, 0.35)):
    """Procedural texture + headlight Lambertian shading for the analytic
    ellipsoid. Hit points are back-projected from the rendered depth; the
    implicit-surface normal is p/axes^2 normalized. The sinusoidal texture
    is a function of the OBJECT-frame hit point, so color observations are
    informative about orientation (unlike the silhouette broadcast)."""
    u, v = camera.pixel_coords_uv((camera.height, camera.width))
    u0 = camera.u0.reshape(-1, 1, 1)
    v0 = camera.v0.reshape(-1, 1, 1)
    fu = camera.fu.reshape(-1, 1, 1)
    fv = camera.fv.reshape(-1, 1, 1)
    z = depth[:, 0]  # (N, h, w), camera-frame depth (0 at misses)
    p_cam = jnp.stack(((u - u0) / fu * z, (v - v0) / fv * z, z), axis=-1)
    R = camera.rotation_matrix[:, :3, :3]
    p_obj = jnp.einsum("nji,nhwj->nhwi", R, p_cam) \
        + camera.position[:, None, None, :]

    inv_axes2 = 1.0 / jnp.asarray(axes) ** 2
    n_obj = p_obj * inv_axes2
    n_obj = n_obj / jnp.maximum(
        jnp.linalg.norm(n_obj, axis=-1, keepdims=True), 1e-6)
    # Headlight: light from the camera along the viewing ray.
    view = camera.position[:, None, None, :] - p_obj
    view = view / jnp.maximum(jnp.linalg.norm(view, axis=-1, keepdims=True),
                              1e-6)
    lambert = jnp.clip((n_obj * view).sum(-1), 0.0, 1.0)
    phases = jnp.asarray([0.0, 2.1, 4.2])
    tex = 0.55 + 0.45 * jnp.sin(
        9.0 * p_obj.sum(-1)[..., None] + phases)  # (N, h, w, 3)
    shade = (0.25 + 0.75 * lambert)[..., None] * tex
    color = jnp.transpose(shade, (0, 3, 1, 2))
    return color * mask


# ---------------------------------------------------------------------------
# Multi-lobe analytic objects (unseen-object generalization rig).
#
# A "lobe shape" is a union of L rotated ellipsoid lobes — an object IS a
# parameter vector (centers/axes/rotations/texture), so a *pool* of distinct
# objects is a stacked (K, L, ...) array indexable inside jit: the TPU-native
# replacement for the reference's per-item trimesh loading
# (training/pyrender.py:302-342). Ray/object intersection stays closed-form
# (min over per-lobe quadratics), fully differentiable w.r.t. camera pose.
# ---------------------------------------------------------------------------

def _lobe_ray_hits(o_obj, d_obj, centers, axes, rots):
    """Intersect rays with a union of ellipsoid lobes.

    o_obj: (N, 1, 1, 3) ray origins (object frame); d_obj: (N, h, w, 3) ray
    directions with camera-frame z == 1 (so t == camera depth).
    centers (L, 3), axes (L, 3), rots (L, 3, 3) map object->lobe frame.

    Returns (t (N,h,w) depth with +inf at misses, disc_max (N,h,w) the most
    positive lobe discriminant (soft-mask signal), lobe_onehot (N,h,w,L)).
    """
    # Into each lobe's unit-sphere frame: p' = R_l (p - c_l) / a_l.
    o_rel = o_obj[..., None, :] - centers  # (N,1,1,L,3)
    o_l = jnp.einsum("lij,nhwlj->nhwli", rots, o_rel) / axes
    d_l = jnp.einsum("lij,nhwj->nhwli", rots, d_obj) / axes  # (N,h,w,L,3)
    a = (d_l ** 2).sum(-1)
    b = 2.0 * (o_l * d_l).sum(-1)
    c = (o_l ** 2).sum(-1) - 1.0
    disc = b ** 2 - 4 * a * c  # (N,h,w,L)
    t_l = (-b - jnp.sqrt(jnp.maximum(disc, 1e-12))) / (2 * a)
    valid = (disc > 0) & (t_l > 1e-3)
    t_l = jnp.where(valid, t_l, jnp.inf)
    t = t_l.min(-1)
    lobe_onehot = (t_l == t[..., None]).astype(jnp.float32)
    # Normalize per-lobe discriminants by the ray's quadratic scale so the
    # soft-mask sharpness is comparable across lobe sizes.
    disc_max = (disc / jnp.maximum(a, 1e-8)).max(-1)
    return t, disc_max, lobe_onehot


def _camera_rays(camera: Camera, size=None):
    """Object-frame ray origins/directions through pixel centers.

    size=None -> full frame (height, width); else the zoomed crop grid."""
    if size is None:
        size = (camera.height, camera.width)
    u, v = camera.pixel_coords_uv(size)
    u0 = camera.u0.reshape(-1, 1, 1)
    v0 = camera.v0.reshape(-1, 1, 1)
    fu = camera.fu.reshape(-1, 1, 1)
    fv = camera.fv.reshape(-1, 1, 1)
    dx = (u - u0) / fu
    dy = (v - v0) / fv
    d_cam = jnp.stack((dx, dy, jnp.ones_like(dx)), axis=-1)
    R = camera.rotation_matrix[:, :3, :3]
    d_obj = jnp.einsum("nji,nhwj->nhwi", R, d_cam)
    o_obj = camera.position[:, None, None, :]
    return o_obj, d_obj


def render_lobe_shape(camera: Camera, shape: dict, size=None,
                      mask_sharpness: float = 400.0):
    """Render a multi-lobe shape: (depth (N,1,h,w) 0 at misses, hard mask,
    soft mask_logits, lobe_onehot). Differentiable w.r.t. camera pose."""
    o_obj, d_obj = _camera_rays(camera, size)
    t, disc_max, lobe_onehot = _lobe_ray_hits(
        o_obj, d_obj, shape["centers"], shape["axes"], shape["rots"])
    hit = jnp.isfinite(t)
    depth = jnp.where(hit, t, 0.0)[:, None]
    mask_logits = (disc_max * mask_sharpness)[:, None]
    return depth, hit.astype(jnp.float32)[:, None], mask_logits, lobe_onehot


def lobe_shape_color(camera: Camera, depth, mask, lobe_onehot, shape: dict):
    """Headlight-shaded procedural color for a multi-lobe shape.

    Per-shape sinusoidal texture (phases/freq in ``shape``) plus a per-lobe
    tint selected by the hit lobe, so both the object identity and its
    orientation are visible in color (the analog of random PBR materials,
    reference training/pyrender.py:232-250)."""
    h, w = depth.shape[-2:]
    size = None if (h, w) == (camera.height, camera.width) else (h, w)
    o_obj, d_obj = _camera_rays(camera, size)
    z = depth[:, 0]
    p_obj = o_obj + d_obj * z[..., None]  # (N,h,w,3)

    # Implicit-surface normal of the hit lobe: R^T ((R (p-c)) / a^2).
    p_rel = p_obj[..., None, :] - shape["centers"]  # (N,h,w,L,3)
    p_l = jnp.einsum("lij,nhwlj->nhwli", shape["rots"], p_rel)
    n_l = jnp.einsum("lji,nhwlj->nhwli", shape["rots"],
                     p_l / shape["axes"] ** 2)
    n_obj = (n_l * lobe_onehot[..., None]).sum(-2)
    n_obj = n_obj / jnp.maximum(
        jnp.linalg.norm(n_obj, axis=-1, keepdims=True), 1e-6)

    view = -d_obj / jnp.maximum(
        jnp.linalg.norm(d_obj, axis=-1, keepdims=True), 1e-6)
    lambert = jnp.clip((n_obj * view).sum(-1), 0.0, 1.0)

    tex = 0.55 + 0.45 * jnp.sin(
        shape["tex_freq"] * p_obj.sum(-1)[..., None] + shape["tex_phase"])
    tint = (shape["tints"] * lobe_onehot[..., None]).sum(-2)  # (N,h,w,3)
    shade = (0.25 + 0.75 * lambert)[..., None] * tex * tint
    return jnp.transpose(shade, (0, 3, 1, 2)) * mask


def _np_quat_to_mat(q):
    """Row-vectorized (w,x,y,z) quaternion -> rotation matrix (numpy)."""
    import numpy as np

    w, x, y, z = q / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def sample_lobe_shapes(seed: int, n_shapes: int, max_lobes: int = 4,
                       n_points: int = 512, diameter: float = 1.0):
    """Sample a pool of multi-lobe shapes (host-side, once per run).

    Each shape is recentered at its surface centroid and rescaled to the
    target diameter — the reference's load_object convention
    (rendering.py:43-79). Returns (stacked param dict of (K, ...) jnp
    arrays, list of (P, 3) numpy surface point clouds for ADD-S metrics).
    Inactive lobes are duplicates of lobe 0 shrunk inside it, so every
    shape renders with the same static L = max_lobes."""
    import numpy as np

    rng = np.random.default_rng(seed)
    pool = {k: [] for k in
            ("centers", "axes", "rots", "tex_phase", "tex_freq", "tints")}
    clouds = []
    sphere_dirs = np.asarray(
        _fibonacci_sphere(max(n_points, 256)), dtype=np.float64)

    for _ in range(n_shapes):
        n_active = int(rng.integers(2, max_lobes + 1))
        centers = np.zeros((max_lobes, 3))
        axes = np.zeros((max_lobes, 3))
        rots = np.zeros((max_lobes, 3, 3))
        axes[0] = rng.uniform(0.16, 0.30, 3)
        rots[0] = _np_quat_to_mat(rng.normal(size=4))
        for li in range(1, n_active):
            axes[li] = rng.uniform(0.07, 0.20, 3)
            direction = rng.normal(size=3)
            direction /= np.linalg.norm(direction)
            # Center the lobe near lobe 0's surface so the union is
            # connected.
            reach = rng.uniform(0.55, 0.95) * axes[0].mean()
            centers[li] = direction * reach
            rots[li] = _np_quat_to_mat(rng.normal(size=4))
        for li in range(n_active, max_lobes):  # inactive: buried in lobe 0
            axes[li] = axes[0] * 0.5
            rots[li] = rots[0]

        # Surface points of active lobes, filtered to the union boundary.
        pts = []
        for li in range(n_active):
            p = centers[li] + (sphere_dirs * axes[li]) @ rots[li]
            inside_other = np.zeros(len(p), dtype=bool)
            for lj in range(n_active):
                if lj == li:
                    continue
                q = ((p - centers[lj]) @ rots[lj].T) / axes[lj]
                inside_other |= (q ** 2).sum(-1) < 0.98
            pts.append(p[~inside_other])
        pts = np.concatenate(pts, axis=0)

        centroid = pts.mean(0)
        pts -= centroid
        centers -= centroid
        # Diameter = max pairwise distance (exact O(P^2) on <=2k points).
        d = np.sqrt(((pts[None] - pts[:, None]) ** 2).sum(-1)).max()
        s = diameter / d
        pts *= s
        centers *= s
        axes *= s

        if len(pts) > n_points:
            idx = rng.choice(len(pts), n_points, replace=False)
            pts = pts[idx]
        pool["centers"].append(centers)
        pool["axes"].append(axes)
        pool["rots"].append(rots)
        pool["tex_phase"].append(rng.uniform(0, 2 * np.pi, 3))
        pool["tex_freq"].append(rng.uniform(6.0, 12.0))
        pool["tints"].append(rng.uniform(0.45, 1.0, (max_lobes, 3)))
        clouds.append(pts.astype(np.float32))

    stacked = {k: jnp.asarray(np.stack(v).astype(np.float32))
               for k, v in pool.items()}
    return stacked, clouds


def _fibonacci_sphere(n: int):
    """Evenly distributed unit directions (host-side numpy)."""
    import numpy as np

    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5 ** 0.5) * i
    return np.stack([np.cos(theta) * np.sin(phi),
                     np.sin(theta) * np.sin(phi), np.cos(phi)], axis=-1)


def index_lobe_shape(pool: dict, k) -> dict:
    """Select shape ``k`` from a stacked pool (jit-traceable gather)."""
    return {name: arr[k] for name, arr in pool.items()}


def _uv_sphere(lat: int, lon: int):
    """Unit UV-sphere (host numpy): vertices (V,3), faces (F,3), uvs (V,2).

    A (lat+1) x (lon+1) grid with a duplicated seam column so texture UVs
    are per-vertex (the layout meshutils.load_obj / the rasterizer use)."""
    import numpy as np

    th = np.linspace(0.0, np.pi, lat + 1)          # polar
    ph = np.linspace(0.0, 2 * np.pi, lon + 1)      # azimuth (seam dup)
    T, P = np.meshgrid(th, ph, indexing="ij")
    verts = np.stack([np.sin(T) * np.cos(P), np.sin(T) * np.sin(P),
                      np.cos(T)], axis=-1).reshape(-1, 3)
    uvs = np.stack([P / (2 * np.pi), 1.0 - T / np.pi],
                   axis=-1).reshape(-1, 2)

    idx = np.arange((lat + 1) * (lon + 1)).reshape(lat + 1, lon + 1)
    a = idx[:-1, :-1].ravel()
    b = idx[1:, :-1].ravel()
    c = idx[1:, 1:].ravel()
    d = idx[:-1, 1:].ravel()
    # Outward winding (CCW seen from outside).
    faces = np.concatenate([np.stack([a, b, c], -1),
                            np.stack([a, c, d], -1)], axis=0)
    # Drop degenerate pole triangles (zero area; harmless but wasteful).
    tri = verts[faces]
    area = np.linalg.norm(np.cross(tri[:, 1] - tri[:, 0],
                                   tri[:, 2] - tri[:, 0]), axis=1)
    return verts, faces[area > 1e-12], uvs


def lobe_shape_meshes(pool: dict, out_dir, lat: int = 32, lon: int = 64):
    """Triangulate every shape of a stacked lobe pool into textured OBJ
    meshes for the REAL data path (native rasterizer + synthetic stream).

    Each lobe becomes a transformed UV-sphere (vertex = center +
    (dir * axes) @ R — exactly ``sample_lobe_shapes``' surface
    parameterization, so the mesh matches the analytic oracle's geometry up
    to tessellation). Z-buffer rendering of the concatenated closed lobes
    produces the union's visible surface exactly: along any ray, the first
    boundary hit of ANY member solid is the union boundary (interior
    surfaces are never the nearest hit). Buried/inactive lobes never
    render. Per-lobe UV columns give the texture path full coverage.

    Reference analog: ShapeNet meshes feeding the synthetic stream
    (reference datasets/training/pyrender.py:302-342); here the pool itself
    is procedural so the unseen-object split stays exactly reproducible.

    Returns the list of written OBJ paths (one per shape).
    """
    import numpy as np
    from pathlib import Path

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    sph_v, sph_f, sph_uv = _uv_sphere(lat, lon)
    centers = np.asarray(pool["centers"])  # (K, L, 3)
    axes = np.asarray(pool["axes"])
    rots = np.asarray(pool["rots"])
    n_shapes, n_lobes = centers.shape[:2]

    paths = []
    for k in range(n_shapes):
        path = out_dir / f"lobes_{k:04d}.obj"
        with open(path, "w") as f:
            f.write(f"# multi-lobe shape {k} ({n_lobes} lobes)\n")
            offset = 0
            for li in range(n_lobes):
                # Inactive lobes are exact duplicates of lobe 0 shrunk
                # inside it (sample_lobe_shapes) — skip the redundant
                # triangles when that signature matches.
                if li > 0 and (np.allclose(centers[k, li], centers[k, 0])
                               and np.allclose(axes[k, li],
                                               axes[k, 0] * 0.5)):
                    continue
                v = centers[k, li] + (sph_v * axes[k, li]) @ rots[k, li]
                # Per-lobe horizontal UV strip so lobes map to distinct
                # texture regions.
                uv = sph_uv * np.asarray([1.0 / n_lobes, 1.0])
                uv[:, 0] += li / n_lobes
                for vv, tt in zip(v, uv):
                    f.write(f"v {vv[0]:.6f} {vv[1]:.6f} {vv[2]:.6f}\n")
                    f.write(f"vt {tt[0]:.6f} {tt[1]:.6f}\n")
                for tri in sph_f + offset + 1:
                    f.write(f"f {tri[0]}/{tri[0]} {tri[1]}/{tri[1]} "
                            f"{tri[2]}/{tri[2]}\n")
                offset += len(v)
        paths.append(path)
    return paths


class MultiLobeOracleModel:
    """``EllipsoidOracleModel`` generalized to a multi-lobe shape: stands in
    for ``LatentFusionModel`` in estimator evals on procedural objects."""

    def __init__(self, shape: dict, input_size: int = 128,
                 camera_dist: float = 5.78):
        self.shape = shape
        self.input_size = input_size
        self.camera_dist = camera_dist
        self.device = None
        self.photographer = None
        self.photographer_params = None

    def decode_latent(self, z_obj, camera: Camera, return_latent: bool = True,
                      apply_mask: bool = False):
        depth_metric, mask_hard, mask_logits, _ = render_lobe_shape(
            camera, self.shape, self.input_size)
        depth_norm = camera.normalize_depth(depth_metric)
        mask = jax.nn.sigmoid(mask_logits)
        depth_norm = jnp.where(mask_hard > 0.5, depth_norm, -1.0)
        y = {"depth": depth_norm[None], "mask": mask[None],
             "mask_logits": mask_logits[None]}
        z_lat = jnp.zeros((1, camera.length, 1)) if return_latent else None
        return y, z_lat, None

    def compute_latent_code(self, observation, camera):
        return jnp.zeros((camera.length, 1))

    def build_latent_object(self, observation) -> jnp.ndarray:
        return jnp.zeros((1, 1, 1, 1, 1, 1))

    def make_observation(self, camera: Camera, shaded: bool = True
                         ) -> Observation:
        depth, mask, _, lobe_onehot = render_lobe_shape(camera, self.shape)
        if shaded:
            color = lobe_shape_color(camera, depth, mask, lobe_onehot,
                                     self.shape)
        else:
            color = jnp.broadcast_to(
                mask, (camera.length, 3, camera.height, camera.width))
        return Observation(color, depth, mask, camera)


def make_camera(n: int = 1, z: float = 3.90625, f: float = 250.0,
                width: int = 320, height: int = 240, z_span: float = 0.5,
                key=None, quats=None) -> Camera:
    """Canonical-scale camera: with the default ``f=250`` and the oracle's
    ``input_size=64``, ``camera_dist = f/input_size = 3.90625`` makes the
    zoom box cover exactly one object unit (the LatentFusion convention:
    objects are normalized to unit diameter)."""
    """Convenience camera factory for tests/benchmarks."""
    import jax.numpy as jnp

    from . import three

    intrinsic = jnp.tile(
        jnp.array([[f, 0.0, width / 2], [0.0, f, height / 2], [0.0, 0.0, 1.0]])[None],
        (n, 1, 1))
    if quats is None:
        quats = quat.identity(n) if key is None else quat.random(key, n)
    trans = jnp.tile(jnp.array([[0.0, 0.0, z]]), (n, 1))
    extrinsic = three.to_extrinsic_matrix(trans, quats)
    return Camera(intrinsic, extrinsic, z_span=z_span, width=width,
                  height=height)
