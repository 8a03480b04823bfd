"""Sculptor (encoder 2D->3D) and Photographer (decoder 3D->2D).

Behavioral reference: ``latentfusion/recon/models.py``. Module/submodule
naming mirrors the reference's attribute names so torch state_dict conversion
is a mechanical key rename (see ``recon/checkpoint.py``).

The reference wraps forwards in CUDA autocast during training; on TPU the
analogous policy is bf16 compute inside the conv modules (see the ``dtype``
field on EqualizedConv), with fp32 params and fp32 grid-sample resampling.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..augment import gan_normalize
from ..camera import Camera
from ..modules import unet
from ..modules.blocks import Block, OutputBlock, create_block_defs
from ..modules.projection import (FactorProjection2d3d, FactorProjection3d2d,
                                  TileProjection2d3d)
from ..ops.interpolate import interpolate, resize_nearest
from ..three.batchview import b2bv, bv2b
from ..transforms import camera_to_object, object_to_camera
from . import utils


class Sculptor(nn.Module):
    """Encoder: per-view 2D U-Net -> 2D->3D projection -> camera-space 3D
    blocks (each intermediate also unprojected to object space for the
    fuser/skips) -> camera->object transform -> object blocks -> output
    (reference: models.py:84-258)."""

    in_size: int
    image_config: Any
    camera_config: Any
    object_config: Any
    relu_slope: float = 0.2
    cube_size: float = 1.0
    cube_activation_type: Optional[str] = None
    projection_type: str = "tile"
    input_color: bool = True
    input_depth: bool = False
    input_mask: bool = True
    scale_mode: str = "bilinear"

    @property
    def in_channels(self) -> int:
        c = 0
        if self.input_color:
            c += 3
        if self.input_mask:
            c += 1
        if self.input_depth:
            c += 1
        return c

    @property
    def image_out_size(self) -> int:
        return unet.UNet2d(self.in_channels, None,
                           self.image_config).output_size(self.in_size)

    @property
    def camera_out_size(self) -> int:
        return self.image_out_size // (2 ** self.camera_config.count("D"))

    @property
    def out_size(self) -> int:
        if self.object_config:
            return self.camera_out_size // (2 ** self.object_config.count("D"))
        return self.camera_out_size

    @property
    def out_channels(self) -> int:
        if self.object_config:
            return self.object_config[-1]
        return self.camera_config[-1]

    @property
    def image_bottleneck_size(self) -> int:
        """(reference: models.py:161-163)"""
        return unet.UNet2d(self.in_channels, None,
                           self.image_config).bottleneck_size(self.in_size)

    def checkpoint_args(self) -> dict:
        """(reference: models.py:178-196)"""
        return {
            "in_size": self.in_size,
            "image_config": self.image_config,
            "camera_config": self.camera_config,
            "object_config": self.object_config,
            "relu_slope": self.relu_slope,
            "cube_size": self.cube_size,
            "cube_activation_type": self.cube_activation_type,
            "projection_type": self.projection_type,
            "input_color": self.input_color,
            "input_depth": self.input_depth,
            "input_mask": self.input_mask,
            "scale_mode": self.scale_mode,
        }

    def setup(self):
        self.image_encoder = unet.UNet2d(self.in_channels, None,
                                         self.image_config)
        if self.projection_type == "tile":
            self.projection_block = TileProjection2d3d(
                in_channels=self.image_config[1][-1],
                out_channels=self.camera_config[0],
                out_size=self.image_out_size)
        elif self.projection_type == "factor":
            self.projection_block = FactorProjection2d3d(
                in_channels=self.image_config[1][-1],
                out_channels=self.camera_config[0],
                out_size=self.image_out_size)
        else:
            raise ValueError(f"Unknown projection type {self.projection_type!r}")

        self.camera_blocks = [
            Block(**kw) for kw in create_block_defs(
                self.camera_config, 3, 0.5, scale_mode=self.scale_mode)
        ]
        if self.object_config:
            self.object_blocks = [
                Block(**kw) for kw in create_block_defs(
                    self.object_config, 3, 0.5, scale_mode=self.scale_mode)
            ]
        else:
            self.object_blocks = []
        self.output_block = OutputBlock(self.out_channels, self.out_channels,
                                        ndim=3,
                                        activation=self.cube_activation_type)

    def __call__(self, x, camera: Camera):
        """x: (B*V, C, H, W) folded views; camera of length B*V.

        Returns (z_obj, z_cam_mid, z_obj_mid) — reference: models.py:198-224.
        """
        from ..layout import (activations_channels_last,
                              decode_channels_last, from_channels_last,
                              image2d_channels_last, to_channels_last)

        # Same channels-last internals as the Photographer (layout.py):
        # the encoder's conv stacks and per-block volume unprojections are
        # the training step's hot path. Boundaries stay NC*. Under 'hybrid'
        # the 2D image encoder + 2D->3D projection run in torch layout
        # (the projection reshape to (N,C,D,H,W) is a bitcast there) and
        # only the 3D stage is channels-last.
        cl = decode_channels_last()
        cl2d = image2d_channels_last()
        with activations_channels_last(cl):
            with activations_channels_last(cl2d):
                if cl2d:
                    x = to_channels_last(x)
                z = self.image_encoder(x)
                z = self.projection_block(z)
            if cl and not cl2d:
                z = to_channels_last(z)

            z_cam_mid = []
            z_obj_mid = []
            for block in self.camera_blocks:
                z = block(z)
                z_cam_mid.append(camera_to_object(z, camera, self.cube_size))

            z = camera_to_object(z, camera, self.cube_size)

            for block in self.object_blocks:
                z = block(z)
                z_obj_mid.append(z)

            z = self.output_block(z)

        if cl:
            z = from_channels_last(z)
            z_cam_mid = [from_channels_last(v) for v in z_cam_mid]
            z_obj_mid = [from_channels_last(v) for v in z_obj_mid]
        return z, z_cam_mid, z_obj_mid


def interpret_logits(logits, predict_color: bool, predict_depth: bool,
                     predict_mask: bool, apply_mask: bool = False) -> dict:
    """Split decoder logits into color/depth/mask heads
    (reference: models.py:455-484)."""
    logits = logits.astype(jnp.float32)
    channel_base = 0
    y = {}
    if predict_color:
        y["color_logits"] = logits[:, channel_base:channel_base + 3]
        y["color"] = jnp.tanh(y["color_logits"])
        channel_base += 3
    if predict_depth:
        y["depth_logits"] = logits[:, channel_base:channel_base + 1]
        y["depth"] = jnp.tanh(y["depth_logits"])
        channel_base += 1
    if predict_mask:
        y["mask_logits"] = logits[:, channel_base:channel_base + 1]
        y["mask"] = jax.nn.sigmoid(y["mask_logits"])
        channel_base += 1
    else:
        y["mask"] = (jax.lax.stop_gradient(y["depth"]) > -1.0).astype(jnp.float32)
        y["mask_logits"] = 100 * y["mask"] + (-100) * (1.0 - y["mask"])

    if apply_mask and predict_mask:
        if predict_depth:
            y["depth"] = (y["depth"] + 1) * (y["mask"] > 0.5) - 1
        if predict_color:
            y["color"] = y["color"] * (y["mask"] > 0.5)
    return y


class Photographer(nn.Module):
    """Decoder: object-space 3D blocks -> object->camera transform ->
    camera-space 3D blocks -> optional occlusion module -> depth collapse
    (sum | factor) -> 2D U-Net -> per-output heads
    (reference: models.py:261-505)."""

    in_size: int
    image_config: Any
    camera_config: Any
    object_config: Any
    projection_type: str = "sum"
    occlusion_config: Any = False
    in_views: int = 1
    skip_connections: bool = False
    relu_slope: float = 0.2
    cube_size: float = 1.0
    predict_color: bool = False
    predict_depth: bool = True
    predict_mask: bool = True
    scale_mode: str = "bilinear"

    @property
    def out_channels(self) -> Sequence[int]:
        out = []
        if self.predict_color:
            out.append(3)
        if self.predict_depth:
            out.append(1)
        if self.predict_mask:
            out.append(1)
        return out

    @property
    def object_out_size(self) -> int:
        return self.in_size * (2 ** self.object_config.count("U")) \
            if self.object_config else self.in_size

    @property
    def camera_out_size(self) -> int:
        return self.object_out_size * (2 ** self.camera_config.count("U"))

    @property
    def out_size(self) -> int:
        """(reference: models.py:342-344)"""
        return unet.UNet2d(None, None, self.image_config).output_size(
            self.camera_out_size)

    @property
    def image_bottleneck_size(self) -> int:
        """(reference: models.py:346-348)"""
        return unet.UNet2d(None, None, self.image_config).bottleneck_size(
            self.camera_out_size)

    def checkpoint_args(self) -> dict:
        """(reference: models.py:356-376)"""
        return {
            "image_config": self.image_config,
            "camera_config": self.camera_config,
            "occlusion_config": self.occlusion_config,
            "object_config": self.object_config,
            "projection_type": self.projection_type,
            "relu_slope": self.relu_slope,
            "in_views": self.in_views,
            "in_size": self.in_size,
            "skip_connections": self.skip_connections,
            "cube_size": self.cube_size,
            "predict_color": self.predict_color,
            "predict_depth": self.predict_depth,
            "predict_mask": self.predict_mask,
            "scale_mode": self.scale_mode,
        }

    def setup(self):
        if self.object_config:
            self.object_blocks = [
                Block(**kw) for kw in create_block_defs(
                    self.object_config, 3, 2.0, in_views=self.in_views,
                    skip_connections=self.skip_connections,
                    scale_mode=self.scale_mode)
            ]
        else:
            self.object_blocks = []
        if self.occlusion_config:
            self.occlusion_module = unet.UNet3d(
                self.object_config[-1] + 1, 1, self.occlusion_config)
        self.camera_blocks = [
            Block(**kw) for kw in create_block_defs(
                self.camera_config, 3, 2.0,
                skip_connections=self.skip_connections,
                skip_connect_start=True,
                skip_connection_views=self.in_views,
                scale_mode=self.scale_mode)
        ]
        if self.projection_type == "factor":
            self.projection_block = FactorProjection3d2d(
                self.camera_config[-1], self.image_config[0][0],
                out_size=self.camera_out_size)
        self.image_decoder = unet.UNet2d(None, None, self.image_config)
        self.output_blocks = [
            OutputBlock(self.image_config[1][-1], c, ndim=2)
            for c in self.out_channels
        ]

    def _compute_depth_weights(self, z_cam):
        """(reference: models.py:378-389)"""
        from ..layout import channel_axis, channels_last

        depth_axis = 1 if channels_last() else 2
        coords = utils.get_normalized_voxel_depth(z_cam)
        z = jnp.concatenate((z_cam, coords), axis=channel_axis())
        logits = self.occlusion_module(z)
        logits_resized = resize_nearest(
            logits, z_cam.shape[depth_axis])
        weights = jax.nn.softmax(logits, axis=depth_axis)
        weights_resized = jax.nn.softmax(logits_resized, axis=depth_axis)
        return weights, weights_resized

    @staticmethod
    def _depth_from_weight(depth_weights):
        """(reference: models.py:391-395)"""
        from ..layout import channels_last

        depth_axis = 1 if channels_last() else 2
        voxel_depth = utils.get_normalized_voxel_depth(depth_weights)
        return (voxel_depth * depth_weights).sum(axis=depth_axis)

    def __call__(self, z_obj, camera: Camera, z_cam_mid=None, z_obj_mid=None,
                 return_latent: bool = False):
        """z_obj: (B', C, D, H, W) with B' == len(camera), or B' dividing
        len(camera) (a shared latent decoded across hypothesis cameras:
        the object-space blocks then run once per latent and the
        per-hypothesis expansion happens inside the volume sampler, which
        reads the shared block instead of an N-way HBM broadcast —
        reference semantics: models.py:397-453 with the expand_dim
        broadcast of models.py:486-505 hoisted out of the per-camera
        path). Returns (y_logits, z_latent | None, z_depth | None)."""
        if camera.length % z_obj.shape[0] != 0:
            raise ValueError(
                f"batch dimension of z_obj must divide len(camera) "
                f"({z_obj.shape[0]} vs {camera.length})")
        if self.skip_connections and (z_cam_mid is None or z_obj_mid is None):
            raise ValueError("intermediates required for skip connections.")
        if self.skip_connections and z_obj.shape[0] != camera.length:
            # Skip tensors are per-view: align the latent with them.
            z_obj = jnp.repeat(z_obj, camera.length // z_obj.shape[0],
                               axis=0)

        from ..layout import (activations_channels_last, channel_axis,
                              decode_channels_last, from_channels_last,
                              image2d_channels_last, to_channels_last)

        # Run the decoder internals channels-last on TPU (layout.py): convs
        # lower channels-minor and the sampler matmul contracts (N,K,J) x
        # (N,J,C), so no physical NC*<->matmul transposes remain in the
        # fwd/bwd hot path. Module boundaries stay in the reference's NC*.
        # Under the 'hybrid' mode the 2D image decoder + heads run in torch
        # layout instead (XLA prefers spatial-minor there; see layout.py).
        cl = decode_channels_last()
        cl2d = image2d_channels_last()
        with activations_channels_last(cl):
            if cl:
                z_obj = to_channels_last(z_obj)
                if self.skip_connections:
                    z_cam_mid = [to_channels_last(z) for z in z_cam_mid]
                    z_obj_mid = [to_channels_last(z) for z in z_obj_mid]
            ch = channel_axis()

            if self.skip_connections:
                z_cam_mid = [object_to_camera(z_cam, camera, self.cube_size)
                             for z_cam in z_cam_mid]

            z = z_obj
            for block_id, block in enumerate(self.object_blocks):
                if self.skip_connections and block_id >= 1:
                    z = jnp.concatenate((z, z_obj_mid[-block_id - 1]),
                                        axis=ch)
                z = block(z)

            z = object_to_camera(z, camera, self.cube_size)

            for block_id, block in enumerate(self.camera_blocks):
                if self.skip_connections:
                    z = jnp.concatenate((z, z_cam_mid[-block_id - 1]),
                                        axis=ch)
                z = block(z)

            if self.occlusion_config:
                z_weights, depth_weights_resized = (
                    self._compute_depth_weights(z))
                z_depth = self._depth_from_weight(z_weights)
                z = z * depth_weights_resized
            else:
                z_depth = None

            if cl and not cl2d:
                # Hybrid boundary: hand the camera volume back to torch
                # layout before the depth collapse — the factor collapse
                # (N,C,D,H,W)->(N,C*D,H,W) is then a free bitcast and the
                # whole 2D stage runs in XLA's preferred tilings.
                z = from_channels_last(z)

            with activations_channels_last(cl2d):
                if self.projection_type == "sum":
                    z = z.sum(axis=1 if cl2d else 2)
                elif self.projection_type == "factor":
                    z = self.projection_block(z)

                # The output heads are 1x1 no-activation convs, so they
                # commute exactly with the image decoder's trailing bilinear
                # upsample (both linear, on disjoint axes). Running the heads
                # at the pre-upsample resolution keeps the wide-channel
                # feature map off the full-resolution boundary — the trace
                # showed ~1.6 ms/iter of head matmuls + dgrad + relayout
                # copies on the 64ch x 256^2 tensor in the flagship
                # refinement loop (reference contract unchanged:
                # models.py:398-409 applies heads after the decoder).
                defer = (all(ob.kernel_size == 1 and ob.activation is None
                             for ob in self.output_blocks)
                         and self.image_decoder.final_scale is not None)
                y = self.image_decoder(z, skip_final_scale=defer)
                outputs = [ob(y) for ob in self.output_blocks]
                y = jnp.concatenate(
                    outputs, axis=-1 if cl2d else 1)
                if defer:
                    scale, mode = self.image_decoder.final_scale
                    y = interpolate(y, scale_factor=scale, mode=mode)

        if cl2d:
            y = from_channels_last(y)
            z = from_channels_last(z)
        if cl and z_depth is not None:
            z_depth = from_channels_last(z_depth)

        if return_latent:
            return y, z, z_depth
        return y, None, z_depth

    def interpret_logits(self, logits, apply_mask: bool = False) -> dict:
        return interpret_logits(logits, self.predict_color, self.predict_depth,
                                self.predict_mask, apply_mask=apply_mask)


# --------------------------------------------------------------------------
# Functional encode/decode pipelines over (module_def, params) pairs.
# --------------------------------------------------------------------------

def encode(sculptor: Sculptor, sculptor_params, fuser, fuser_params,
           camera: Camera, color, depth=None, mask=None):
    """Full multi-view encode: fold views, run sculptor, unfold, fuse
    (reference: models.py:226-258).

    Args are (B, V, C, H, W) view-stacked tensors; camera length B*V.
    Returns (z_obj (B, 1, C, D, H, W), extra).
    """
    num_views = color.shape[1] if color is not None and color.ndim == 5 else 1

    x = []
    if sculptor.input_color:
        x.append(bv2b(color) if color.ndim == 5 else color)
    if sculptor.input_depth:
        x.append(bv2b(depth) if depth.ndim == 5 else depth)
    if sculptor.input_mask:
        m = bv2b(mask) if mask.ndim == 5 else mask
        x.append(gan_normalize(m))
    x = jnp.concatenate(x, axis=1)

    z_obj, z_cam_mid, z_obj_mid = sculptor.apply(sculptor_params, x, camera)
    z_obj = b2bv(z_obj, num_views)
    z_cam_mid = [b2bv(z, num_views) for z in z_cam_mid]
    z_obj_mid = [b2bv(z, num_views) for z in z_obj_mid]

    z_obj, z_extra = fuser.apply(fuser_params, z_obj, z_cam_mid, z_obj_mid,
                                 camera)
    return z_obj, z_extra


def decode(photographer: Photographer, params, z_obj, camera: Camera,
           interpret: bool = True, return_latent: bool = False,
           apply_mask: bool = False):
    """Expand the latent across hypothesis cameras and decode
    (reference: models.py:486-505).

    z_obj: (B, 1, C, D, H, W); camera length B*num_views.
    """
    num_batch = z_obj.shape[0]
    num_views = camera.length // num_batch
    # The latent is NOT broadcast to the hypothesis batch here: the
    # photographer decodes a (B, ...) latent across B*V cameras, running
    # the shared object-space work at batch B and serving the volume
    # sampler from the single HBM block per object (the reference
    # materializes the expand() instead, models.py:490-496 — on TPU that
    # broadcast costs ~0.5 GB/iteration at the 128-hypothesis CEM shape).
    z = z_obj.reshape(num_batch, *z_obj.shape[2:])

    y, z_lat, z_depth = photographer.apply(params, z, camera,
                                           return_latent=return_latent)
    if z_lat is not None:
        z_lat = b2bv(z_lat, num_views)
    if interpret:
        y = photographer.interpret_logits(y, apply_mask=apply_mask)
        y = {k: b2bv(v, num_views) for k, v in y.items()}
    return y, z_lat, z_depth


def autoencode(sculptor, sculptor_params, fuser, fuser_params,
               photographer, photographer_params, camera, color,
               depth=None, mask=None):
    """Encode+decode with the same cameras; squeezes the single view dim
    (reference: models.py:73-81)."""
    z_obj, _ = encode(sculptor, sculptor_params, fuser, fuser_params,
                      camera, color, depth, mask)
    y, z_pix, _ = decode(photographer, photographer_params, z_obj, camera,
                         interpret=True, return_latent=True)
    y = {k: v.squeeze(1) for k, v in y.items()}
    z_pix = z_pix.squeeze(1)
    return y, z_pix
