"""Batched differentiable pinhole camera as a JAX pytree.

Behavioral reference: ``latentfusion/modules/geometry.py:46-590`` (Camera) and
``:20-43`` (bbox grids). The reference implements Camera as an ``nn.Module``
with buffers plus a custom DataParallel ``Scatterable`` protocol; here Camera
is a registered pytree, so it vmaps/shards/differentiates for free — pose
optimization takes gradients directly through Camera leaves, and hypothesis
sharding is a ``NamedSharding`` on the batch axis.

Pose state is the reference's parameterization exactly: ``log_quaternion``
(the imaginary part of the log of a unit quaternion, 3 numbers) plus
``translation`` — see geometry.py:86-99.

All methods are functional: mutators like ``rotate`` return new Cameras.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from . import three
from .ops.affine_resample import bbox_source_coords, separable_resample_2d
from .three import quaternion as quat
from .three.batchview import b2bv, bv2b


def bbox_to_grid(bbox, in_size, out_size):
    """grid_sample grid for one pixel-space bbox (reference: geometry.py:20-33).

    Corners are truncated toward zero: the reference function is
    ``@torch.jit.script``, and TorchScript coerces the float corners to int
    in the ``corner / in_size`` division (verified against torch 2.13; see
    ops/affine_resample.bbox_source_coords).
    """
    h, w = in_size
    bbox = jnp.trunc(bbox)
    xmin, ymin, xmax, ymax = bbox[0], bbox[1], bbox[2], bbox[3]
    gy = jnp.linspace(ymin / h, ymax / h, out_size[0]) * 2 - 1
    gx = jnp.linspace(xmin / w, xmax / w, out_size[1]) * 2 - 1
    grid_y, grid_x = jnp.meshgrid(gy, gx, indexing="ij")
    return jnp.stack((grid_x, grid_y), axis=-1)


def bboxes_to_grid(boxes, in_size, out_size):
    """Batched bbox grids (reference: geometry.py:36-43, vectorized instead of
    the reference's per-box Python loop)."""
    return jax.vmap(lambda b: bbox_to_grid(b, in_size, out_size))(boxes)


@jax.tree_util.register_pytree_node_class
class Camera:
    """Batched pinhole camera (reference: geometry.py:46-104).

    Pytree leaves: ``intrinsic`` (B,3,4), ``viewport`` (B,4) as
    (xmin,ymin,xmax,ymax), ``log_quaternion`` (B,3), ``translation`` (B,3).
    Static aux: ``z_span`` (float), ``width``/``height`` (ints).
    """

    def __init__(self, intrinsic, extrinsic=None, z_span=0.5, viewport=None,
                 width=640, height=480, log_quaternion=None, translation=None):
        intrinsic = jnp.asarray(intrinsic, dtype=jnp.float32)
        if intrinsic.ndim == 2:
            intrinsic = intrinsic[None]
        if intrinsic.shape[1] == 3 and intrinsic.shape[2] == 3:
            intrinsic = three.intrinsic_to_3x4(intrinsic)

        if viewport is None:
            viewport = jnp.broadcast_to(
                jnp.array((0.0, 0.0, width, height), dtype=jnp.float32)[None],
                (intrinsic.shape[0], 4),
            )
        else:
            viewport = jnp.asarray(viewport, dtype=jnp.float32)
            if viewport.ndim == 1:
                viewport = viewport[None]

        if extrinsic is not None:
            extrinsic = jnp.asarray(extrinsic, dtype=jnp.float32)
            if extrinsic.ndim == 2:
                extrinsic = extrinsic[None]
            rotation, translation_m = three.decompose(extrinsic)
            quaternion = quat.mat_to_quat(rotation[:, :3, :3])
            translation = translation_m[:, :3, -1]
            # The real part of the log of a unit quaternion is always 0.
            log_quaternion = quat.qlog(quaternion)[:, 1:]

        if translation is None:
            raise ValueError("translation must be given through extrinsic or explicitly.")
        translation = jnp.asarray(translation, dtype=jnp.float32)
        if translation.ndim == 1:
            translation = translation[None]

        if log_quaternion is None:
            raise ValueError("log_quaternion must be given through extrinsic or explicitly.")
        log_quaternion = jnp.asarray(log_quaternion, dtype=jnp.float32)
        if log_quaternion.ndim == 1:
            log_quaternion = log_quaternion[None]

        self.intrinsic = intrinsic
        self.viewport = viewport
        self.log_quaternion = log_quaternion
        self.translation = translation
        self.z_span = float(z_span)
        self.width = width
        self.height = height

    # ------------------------------------------------------------------ pytree
    def tree_flatten(self):
        children = (self.intrinsic, self.viewport, self.log_quaternion,
                    self.translation)
        aux = (self.z_span, self.width, self.height)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.intrinsic, obj.viewport, obj.log_quaternion, obj.translation = children
        obj.z_span, obj.width, obj.height = aux
        return obj

    _REPLACE_FIELDS = frozenset((
        "intrinsic", "viewport", "log_quaternion", "translation", "z_span",
        "width", "height"))

    def replace(self, **kwargs) -> "Camera":
        unknown = set(kwargs) - self._REPLACE_FIELDS
        if unknown:
            # e.g. replace(extrinsic=...) would otherwise silently no-op;
            # pose lives in log_quaternion/translation.
            raise TypeError(f"Camera.replace: unknown fields {sorted(unknown)}")
        out = object.__new__(Camera)
        out.intrinsic = kwargs.get("intrinsic", self.intrinsic)
        out.viewport = kwargs.get("viewport", self.viewport)
        out.log_quaternion = kwargs.get("log_quaternion", self.log_quaternion)
        out.translation = kwargs.get("translation", self.translation)
        out.z_span = kwargs.get("z_span", self.z_span)
        out.width = kwargs.get("width", self.width)
        out.height = kwargs.get("height", self.height)
        return out

    # -------------------------------------------------------------- properties
    @property
    def quaternion(self):
        """(reference: geometry.py:106-108)"""
        return quat.qexp(self.log_quaternion)

    def with_quaternion(self, q) -> "Camera":
        return self.replace(log_quaternion=quat.qlog(q)[:, 1:])

    @property
    def rotation_matrix(self):
        """4x4 rotation (reference: geometry.py:147-153)."""
        q = quat.normalize(self.quaternion)
        R = quat.quat_to_mat(q)
        return three.rotation_to_4x4(R)

    @property
    def translation_matrix(self):
        """(reference: geometry.py:155-158)"""
        return three.translation_to_4x4(self.translation)

    @property
    def inv_translation_matrix(self):
        return three.translation_to_4x4(-self.translation)

    @property
    def extrinsic(self):
        return self.translation_matrix @ self.rotation_matrix

    def with_extrinsic(self, extrinsic) -> "Camera":
        extrinsic = jnp.asarray(extrinsic, dtype=jnp.float32)
        if extrinsic.ndim == 2:
            extrinsic = extrinsic[None]
        rotation, translation_m = three.decompose(extrinsic)
        quaternion = quat.mat_to_quat(rotation[:, :3, :3])
        return self.replace(
            log_quaternion=quat.qlog(quaternion)[:, 1:],
            translation=translation_m[:, :3, -1],
        )

    @property
    def viewport_height(self):
        return self.viewport[:, 3] - self.viewport[:, 1]

    @property
    def viewport_width(self):
        return self.viewport[:, 2] - self.viewport[:, 0]

    @property
    def viewport_centroid(self):
        cx = (self.viewport[:, 2] + self.viewport[:, 0]) / 2.0
        cy = (self.viewport[:, 3] + self.viewport[:, 1]) / 2.0
        return jnp.stack((cx, cy), axis=-1)

    @property
    def u0(self):
        return self.intrinsic[:, 0, 2]

    @property
    def v0(self):
        return self.intrinsic[:, 1, 2]

    @property
    def fu(self):
        return self.intrinsic[:, 0, 0]

    @property
    def fv(self):
        return self.intrinsic[:, 1, 1]

    @property
    def fov_u(self):
        return jnp.arctan2(self.fu, self.viewport_width / 2.0)

    @property
    def fov_v(self):
        return jnp.arctan2(self.fv, self.viewport_height / 2.0)

    @property
    def obj_to_cam(self):
        return self.translation_matrix @ self.rotation_matrix

    @property
    def cam_to_obj(self):
        return jnp.swapaxes(self.rotation_matrix, 2, 1) @ self.inv_translation_matrix

    @property
    def obj_to_image(self):
        return self.intrinsic @ self.obj_to_cam

    @property
    def position(self):
        """Camera center C = -R^T t (reference: geometry.py:219-224)."""
        R = self.rotation_matrix[:, :3, :3]
        t = self.translation_matrix[:, :3, 3:]
        return (-jnp.swapaxes(R, 2, 1) @ t)[..., 0]

    @property
    def length(self):
        return self.intrinsic.shape[0]

    @property
    def znear(self):
        return self.translation[:, 2] - self.z_span

    @property
    def zfar(self):
        return self.translation[:, 2] + self.z_span

    @property
    def z_bounds(self):
        return self.znear, self.zfar

    # ------------------------------------------------------------- pose edits
    def rotate(self, q) -> "Camera":
        """Right-multiply the rotation (reference: geometry.py:235-237)."""
        return self.with_quaternion(quat.qmul(self.quaternion, q))

    def translate(self, offset) -> "Camera":
        """Translate the camera *center* by offset in object space.

        Note: the reference implementation (geometry.py:239-247) negates the
        homogeneous vector before dehomogenizing, which cancels the sign and
        yields t' = +R(C+offset) instead of -R(C+offset); it is dead code
        there (only a commented-out call site, recon/utils.py:87). We
        implement the mathematically consistent version: the new camera
        center is ``position + offset``.
        """
        offset = jnp.asarray(offset, dtype=jnp.float32)
        offset, _ = three.ensure_batch_dim(offset, 1)
        if offset.shape[0] == 1:
            offset = jnp.broadcast_to(offset, self.position.shape)
        position = (self.position + offset)[..., None]
        translation = -(self.rotation_matrix[:, :3, :3] @ position)[..., 0]
        return self.replace(translation=translation)

    # -------------------------------------------------------------- crops/zoom
    def uncrop(self, image=None, scale_mode: str = "nearest", scale: float = 1.0):
        """Paste a viewport-cropped prediction back into the full frame
        (reference: geometry.py:261-285)."""
        new_cam = Camera(self.intrinsic, None, self.z_span,
                         width=self.width, height=self.height,
                         log_quaternion=self.log_quaternion,
                         translation=self.translation)
        if image is None:
            return new_cam

        width = int(self.width * scale)
        height = int(self.height * scale)
        viewport = self.viewport * scale
        viewport_height = self.viewport_height * scale
        viewport_width = self.viewport_width * scale

        # Axis-separable resample: two per-axis interpolation matmuls (MXU)
        # instead of a 2D gather; exact grid_sample semantics (see
        # ops/affine_resample.py). Full-frame pixel i maps to crop pixel
        # (i - vp_min) / vp_size * crop_size - 0.5.
        rows = jnp.arange(height, dtype=jnp.float32)[None]
        cols = jnp.arange(width, dtype=jnp.float32)[None]
        h_img, w_img = image.shape[-2], image.shape[-1]
        src_y = (rows - viewport[:, 1:2]) / viewport_height[:, None] * h_img - 0.5
        src_x = (cols - viewport[:, 0:1]) / viewport_width[:, None] * w_img - 0.5
        return (
            separable_resample_2d(image, src_y, src_x, mode=scale_mode,
                                  padding_mode="border"),
            new_cam,
        )

    def crop_to_viewport(self, image, target_size: int, scale_mode: str = "nearest"):
        """(reference: geometry.py:287-292)"""
        src_y, src_x = bbox_source_coords(self.viewport, target_size)
        return separable_resample_2d(image, src_y, src_x, mode=scale_mode)

    def zoom(self, image, target_size: int, target_dist, target_fu=None,
             target_fv=None, image_scale: float = 1.0, zs=None,
             centroid_uvs=None, scale_mode: str = "bilinear"):
        """The canonical "zoom" crop: re-image as if viewed at ``target_dist``
        with canonical focal, into a ``target_size``² frame
        (reference: geometry.py:294-354).

        Returns ``(image_new, camera_new)``, or just ``camera_new`` when
        ``image is None``.
        """
        K = self.intrinsic
        if zs is None:
            zs = self.translation[:, 2]
        fu = K[:, 0, 0]
        fv = K[:, 1, 1]
        if target_fu is None:
            target_fu = fu
        if target_fv is None:
            target_fv = fv

        bbox_u = target_dist * (1.0 / zs) / fu * target_fu * target_size / self.width * image_scale
        bbox_v = target_dist * (1.0 / zs) / fv * target_fv * target_size / self.height * image_scale

        if centroid_uvs is None:
            origin = jnp.broadcast_to(
                jnp.array((0.0, 0.0, 0.0, 1.0))[None, :, None],
                (self.length, 4, 1))
            uvs = K @ self.obj_to_cam @ origin
            centroid_uvs = (uvs[:, :2, 0] / uvs[:, 2:, 0])

        center_u = centroid_uvs[:, 0] / self.width
        center_v = centroid_uvs[:, 1] / self.height

        boxes = jnp.stack(
            [
                (center_u - bbox_u / 2) * float(self.width),
                (center_v - bbox_v / 2) * float(self.height),
                (center_u + bbox_u / 2) * float(self.width),
                (center_v + bbox_v / 2) * float(self.height),
            ],
            axis=-1,
        )

        camera_new = Camera(self.intrinsic, None, self.z_span, viewport=boxes,
                            log_quaternion=self.log_quaternion,
                            translation=self.translation,
                            width=self.width, height=self.height)
        if image is None:
            return camera_new

        src_y, src_x = bbox_source_coords(boxes, target_size)
        image_new = separable_resample_2d(image, src_y, src_x, mode=scale_mode)
        return image_new, camera_new

    # ---------------------------------------------------------------- coords
    def pixel_coords_uvz(self, out_size):
        """Viewport-frustum meshgrid in pixel space (reference: geometry.py:469-493).

        Note: the z axis covers ``[znear, znear + z_span]`` (half of the
        [znear, zfar] window) exactly as the reference does — trained
        checkpoints depend on this convention.
        """
        if isinstance(out_size, int):
            out_size = (out_size, out_size, out_size)
        z_pixel, v_pixel, u_pixel = jnp.meshgrid(
            jnp.linspace(0.0, 1.0, out_size[0]),
            jnp.linspace(0.0, 1.0, out_size[1]),
            jnp.linspace(0.0, 1.0, out_size[2]),
            indexing="ij",
        )
        shape = (self.length, *out_size)
        u_pixel = jnp.broadcast_to(u_pixel[None], shape)
        v_pixel = jnp.broadcast_to(v_pixel[None], shape)
        z_pixel = jnp.broadcast_to(z_pixel[None], shape)

        u_pixel = (u_pixel * self.viewport_width.reshape(-1, 1, 1, 1)
                   + self.viewport[:, 0].reshape(-1, 1, 1, 1))
        v_pixel = (v_pixel * self.viewport_height.reshape(-1, 1, 1, 1)
                   + self.viewport[:, 1].reshape(-1, 1, 1, 1))
        z_pixel = z_pixel * self.z_span + self.znear.reshape(-1, 1, 1, 1)
        return u_pixel, v_pixel, z_pixel

    def pixel_coords_uv(self, out_size):
        """(reference: geometry.py:495-513)"""
        if isinstance(out_size, int):
            out_size = (out_size, out_size)
        v_pixel, u_pixel = jnp.meshgrid(
            jnp.linspace(0.0, 1.0, out_size[0]),
            jnp.linspace(0.0, 1.0, out_size[1]),
            indexing="ij",
        )
        shape = (self.length, *out_size)
        u_pixel = jnp.broadcast_to(u_pixel[None], shape)
        v_pixel = jnp.broadcast_to(v_pixel[None], shape)
        u_pixel = (u_pixel * self.viewport_width.reshape(-1, 1, 1)
                   + self.viewport[:, 0].reshape(-1, 1, 1))
        v_pixel = (v_pixel * self.viewport_height.reshape(-1, 1, 1)
                   + self.viewport[:, 1].reshape(-1, 1, 1))
        return u_pixel, v_pixel

    def camera_coords(self, out_size):
        """Frustum voxel centers in camera space (reference: geometry.py:515-531)."""
        u_pixel, v_pixel, z_pixel = self.pixel_coords_uvz(out_size)
        u0 = self.u0.reshape(-1, 1, 1, 1)
        v0 = self.v0.reshape(-1, 1, 1, 1)
        fu = self.fu.reshape(-1, 1, 1, 1)
        fv = self.fv.reshape(-1, 1, 1, 1)
        z_cam = z_pixel
        y_cam = (v_pixel - v0) / fv * z_cam
        x_cam = (u_pixel - u0) / fu * z_cam
        return x_cam, y_cam, z_cam

    def depth_camera_coords(self, depth):
        """Backproject a depth map (reference: geometry.py:533-544)."""
        u_pixel, v_pixel = self.pixel_coords_uv((depth.shape[-2], depth.shape[-1]))
        z_cam = depth.reshape(u_pixel.shape)
        u0 = self.u0.reshape(-1, 1, 1)
        v0 = self.v0.reshape(-1, 1, 1)
        fu = self.fu.reshape(-1, 1, 1)
        fv = self.fv.reshape(-1, 1, 1)
        x_cam = (u_pixel - u0) / fu * z_cam
        y_cam = (v_pixel - v0) / fv * z_cam
        return x_cam, y_cam, z_cam

    def depth_object_coords(self, depth):
        """(reference: geometry.py:546-553)"""
        xx, yy, zz = self.depth_camera_coords(depth)
        cam_grid = jnp.stack((xx, yy, zz), axis=-1)
        cam_coords = three.grid_to_coords(cam_grid)
        obj_coords = three.transform_coords(cam_coords, self.cam_to_obj).reshape(
            cam_grid.shape)
        return obj_coords[..., 0], obj_coords[..., 1], obj_coords[..., 2]

    # ----------------------------------------------------------- depth window
    def denormalize_depth(self, depth, eps: float = 0.01):
        """[-1,1] window depth -> metric depth (reference: geometry.py:555-558)."""
        lead = depth.shape[:-3]
        znear = (self.znear - eps).reshape(*lead, 1, 1, 1)
        zfar = (self.zfar + eps).reshape(*lead, 1, 1, 1)
        return (depth / 2.0 + 0.5) * (zfar - znear) + znear

    def normalize_depth(self, depth, eps: float = 0.01):
        """metric depth -> clamped [-1,1] window depth (reference: geometry.py:560-565)."""
        znear = (self.znear - eps).reshape(-1, 1, 1, 1)
        zfar = (self.zfar + eps).reshape(-1, 1, 1, 1)
        depth = (depth - znear) / (zfar - znear)
        return jnp.clip(depth, 0, 1) * 2.0 - 1.0

    # ------------------------------------------------------------- containers
    def __len__(self):
        return self.length

    def __getitem__(self, item):
        if isinstance(item, int):
            item = slice(item, item + 1) if item != -1 else slice(-1, None)
        return Camera(self.intrinsic[item], None, self.z_span, self.viewport[item],
                      log_quaternion=self.log_quaternion[item],
                      translation=self.translation[item],
                      width=self.width, height=self.height)

    def __iter__(self):
        return iter([self[i] for i in range(len(self))])

    def split(self, sections):
        if isinstance(sections, int):
            n = self.length // sections
            sections = [sections] * n
        out = []
        start = 0
        for s in sections:
            out.append(self[start:start + s])
            start += s
        return out

    @classmethod
    def cat(cls, cameras: Sequence["Camera"]) -> "Camera":
        first = cameras[0]
        return cls(
            jnp.concatenate([c.intrinsic for c in cameras], axis=0),
            None, first.z_span,
            jnp.concatenate([c.viewport for c in cameras], axis=0),
            log_quaternion=jnp.concatenate([c.log_quaternion for c in cameras], axis=0),
            translation=jnp.concatenate([c.translation for c in cameras], axis=0),
            width=first.width, height=first.height)

    @classmethod
    def vcat(cls, cameras: Sequence["Camera"], batch_size: int = -1) -> "Camera":
        """Concatenate along the view dim then re-fold (reference: geometry.py:418-441)."""
        first = cameras[0]
        intrinsic = jnp.concatenate(
            [b2bv(c.intrinsic, batch_size=batch_size) for c in cameras], axis=1)
        viewport = jnp.concatenate(
            [b2bv(c.viewport, batch_size=batch_size) for c in cameras], axis=1)
        log_quaternion = jnp.concatenate(
            [b2bv(c.log_quaternion, batch_size=batch_size) for c in cameras], axis=1)
        translation = jnp.concatenate(
            [b2bv(c.translation, batch_size=batch_size) for c in cameras], axis=1)
        return cls(bv2b(intrinsic), None, first.z_span, bv2b(viewport),
                   log_quaternion=bv2b(log_quaternion),
                   translation=bv2b(translation),
                   width=first.width, height=first.height)

    def repeat(self, n: int) -> "Camera":
        return Camera(jnp.tile(self.intrinsic, (n, 1, 1)), None, self.z_span,
                      jnp.tile(self.viewport, (n, 1)),
                      log_quaternion=jnp.tile(self.log_quaternion, (n, 1)),
                      translation=jnp.tile(self.translation, (n, 1)),
                      width=self.width, height=self.height)

    def repeat_interleave(self, n: int) -> "Camera":
        return Camera(jnp.repeat(self.intrinsic, n, axis=0), None, self.z_span,
                      jnp.repeat(self.viewport, n, axis=0),
                      log_quaternion=jnp.repeat(self.log_quaternion, n, axis=0),
                      translation=jnp.repeat(self.translation, n, axis=0),
                      width=self.width, height=self.height)

    def clone(self) -> "Camera":
        return self.replace()

    def detach(self) -> "Camera":
        return jax.lax.stop_gradient(self)

    def to(self, device=None) -> "Camera":
        """Device-placement no-op for API familiarity (JAX manages placement)."""
        return self

    # ------------------------------------------------------------------- io
    def to_kwargs(self):
        return {
            "intrinsic": self.intrinsic,
            "extrinsic": self.extrinsic,
            "z_span": self.z_span,
            "viewport": self.viewport,
            "height": self.height,
            "width": self.width,
        }

    @classmethod
    def from_kwargs(cls, kwargs):
        _kwargs = {}
        for k, v in kwargs.items():
            if isinstance(v, list):
                _kwargs[k] = jnp.asarray(v, dtype=jnp.float32)
            else:
                _kwargs[k] = v
        return cls(**_kwargs)

    def __repr__(self):
        return f"Camera(count={self.length})"
