"""Pose estimation utilities.

Behavioral reference: ``latentfusion/pose/utils.py``. Camera
parameterization for gradient optimization is expressed as plain pytrees
(``camera_params`` / ``apply_camera_params``) instead of nn.Parameter
surgery — optax optimizes the dict directly, vmapped across hypotheses.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from .. import three
from ..camera import Camera
from ..three import quaternion as quat


def perturb_camera(key, camera: Camera, translation_std, quaternion_std) -> Camera:
    """Gaussian perturbation of translation + log-quaternion
    (reference: pose/utils.py:13-17)."""
    k1, k2 = jax.random.split(key)
    translation = camera.translation + jax.random.normal(
        k1, camera.translation.shape) * translation_std
    log_quaternion = camera.log_quaternion + jax.random.normal(
        k2, camera.log_quaternion.shape) * quaternion_std
    return camera.replace(translation=translation,
                          log_quaternion=log_quaternion)


def sample_cameras_with_estimate(n: int, camera_est: Camera,
                                 translation_std: float = 0.0,
                                 hemisphere: bool = False,
                                 upright: bool = False,
                                 key=None) -> Camera:
    """Sunflower-even rotation hypotheses around a translation estimate
    (reference: pose/utils.py:28-45)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    intrinsic = jnp.broadcast_to(camera_est.intrinsic,
                                 (n, *camera_est.intrinsic.shape[1:]))
    translation = jnp.broadcast_to(camera_est.translation, (n, 3))
    translation = translation + jax.random.normal(k1, (n, 3)) * translation_std
    quaternion = three.orientation.evenly_distributed_quats(
        n, hemisphere=hemisphere, upright=upright, key=k2)
    extrinsic = three.to_extrinsic_matrix(translation, quaternion)
    viewport = jnp.broadcast_to(camera_est.viewport, (n, 4))
    return Camera(intrinsic, extrinsic, camera_est.z_span,
                  width=camera_est.width, height=camera_est.height,
                  viewport=viewport)


def camera_params(camera: Camera, optimize_rotation: bool = True,
                  optimize_translation: bool = True,
                  optimize_viewport: bool = False) -> dict:
    """Extract the optimizable pose leaves (reference: pose/utils.py:48-63)."""
    params = {}
    if optimize_rotation:
        params["log_quaternion"] = camera.log_quaternion
    if optimize_translation:
        params["translation"] = camera.translation
    if optimize_viewport:
        params["viewport"] = camera.viewport
    return params


def apply_camera_params(camera: Camera, params: dict) -> Camera:
    """Rebuild a Camera with the optimized leaves swapped in."""
    return camera.replace(**params)


def deparameterize_camera(camera: Camera) -> Camera:
    """(reference: pose/utils.py:66-71)"""
    return jax.lax.stop_gradient(camera)


def flip_camera(camera: Camera, axis=(0.0, 0.0, 1.0)) -> Camera:
    """180-degree flip about an object axis (reference: pose/utils.py:74-78)."""
    ax = jnp.broadcast_to(jnp.asarray([axis], dtype=jnp.float32),
                          (len(camera), 3))
    flip_quat = quat.from_axis_angle(ax, math.pi)
    return camera.rotate(flip_quat)


def zero_invalid_pixels(tensor, invalid_mask):
    """Zero the loss where depth is missing but mask is positive
    (reference: pose/utils.py:81-96)."""
    valid_mask = ~invalid_mask
    return tensor * valid_mask.astype(tensor.dtype)


def iou_loss(input_mask, target_mask, eps: float = 1e-4):
    """log(union) - log(intersection) (reference: pose/utils.py:99-109)."""
    intersection = jnp.sum(input_mask * target_mask, axis=(1, 2, 3))
    union = (jnp.sum(input_mask, axis=(1, 2, 3))
             + jnp.sum(target_mask, axis=(1, 2, 3))
             - intersection)
    return (jnp.log(jnp.maximum(union, eps))
            - jnp.log(jnp.maximum(intersection, eps)))


def reduce_loss_mask(loss, mask, eps: float = 1e-4):
    """Masked mean over spatial dims (reference: pose/utils.py:111-117)."""
    if loss.ndim == 4:
        loss = loss.squeeze(1)
    if mask.ndim == 4:
        mask = mask.squeeze(1)
    num = jnp.maximum((loss * mask).sum(axis=(-2, -1)), eps / 10)
    den = jnp.maximum(mask.sum(axis=(-2, -1)), eps)
    return num / den


def mask_centroid(mask):
    """(reference: pose/utils.py:120-129)"""
    height, width = mask.shape[-2:]
    yy, xx = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32), indexing="ij")
    den = mask.sum(axis=(-2, -1))
    return jnp.stack(
        ((mask * yy).sum(axis=(-2, -1)) / den,
         (mask * xx).sum(axis=(-2, -1)) / den), axis=-1)


def mask_contour(mask):
    """(reference: pose/utils.py:132-137)"""
    mask = (mask > 0.5).astype(jnp.float32)
    yg = jnp.abs(mask[..., 1:, :] - mask[..., :-1, :])
    xg = jnp.abs(mask[..., :, 1:] - mask[..., :, :-1])
    return jnp.abs(yg[..., 1:, :-2] + xg[..., :-2, 1:]) > 0


def shape_loss(input_mask, target_mask):
    """Distance-to-centroid shape loss (reference: pose/utils.py:140-170)."""
    if input_mask.ndim == 4:
        input_mask = input_mask.squeeze(1)
    if target_mask.ndim == 4:
        target_mask = target_mask.squeeze(1)
    if target_mask.shape[0] == 1:
        target_mask = jnp.broadcast_to(target_mask, input_mask.shape)
    n = input_mask.shape[0]
    height, width = input_mask.shape[-2:]

    input_centroid = mask_centroid(input_mask)
    target_centroid = mask_centroid(target_mask)

    yy, xx = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32), indexing="ij")
    yx_coords = jnp.broadcast_to(jnp.stack((yy, xx), axis=0)[None],
                                 (n, 2, height, width))

    input_dtc = jnp.linalg.norm(
        yx_coords - input_centroid[:, :, None, None], axis=1)
    target_dtc = jnp.linalg.norm(
        yx_coords - target_centroid[:, :, None, None], axis=1) * target_mask
    target_maxdist = target_dtc.reshape(n, -1).max(axis=1)
    input_dtc = input_dtc / target_maxdist[:, None, None]
    target_dtc = target_dtc / target_maxdist[:, None, None]
    return jnp.abs(input_dtc - target_dtc) * input_mask


def contour_loss(input_mask, target_mask):
    """(reference: pose/utils.py:173-178)"""
    input_contour = mask_contour(input_mask).astype(jnp.float32)
    target_contour = mask_contour(target_mask).astype(jnp.float32)
    return jnp.abs(target_contour.sum(axis=(1, 2, 3))
                   - input_contour.sum(axis=(1, 2, 3)))


def get_perceptual_loss(vgg_params=None, torch_state_dict=None):
    """VGG16 perceptual loss used as the pose ``latent`` loss term
    (reference: pose/utils.py:21-24). Accepts either flax ``vgg_params``
    or a torchvision VGG16 ``state_dict`` (converted on the fly)."""
    from ..modules.vgg import (build_perceptual_loss,
                               params_from_torchvision_state_dict)

    if vgg_params is None:
        if torch_state_dict is None:
            raise ValueError(
                "provide vgg_params or torch_state_dict (torchvision VGG16)")
        vgg_params = params_from_torchvision_state_dict(torch_state_dict)
    return build_perceptual_loss(vgg_params)
