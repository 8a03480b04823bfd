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
