"""Image-based rendering: reproject input views via predicted depth.

Behavioral reference: ``latentfusion/ibr.py``. The reference's per-object
Python loops (``reproject_views_batch``, ``render_ibr``) are replaced with
vmap over the object axis.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from . import three
from .camera import Camera
from .distances import outer_distance
from .ops.grid_sample import grid_sample_2d
from .three.batchview import b2bv, bv2b


def depth_to_warp_field(source_cam: Camera, target_cam: Camera, target_depth):
    """Warp field taking source-view images to the target view via target
    depth (reference: ibr.py:11-49). Returns (V_o, V_i, H, W, 2)."""
    height, width = target_depth.shape[-2:]
    xx, yy, zz = target_cam.depth_camera_coords(
        target_cam.denormalize_depth(target_depth))
    cam_coords = three.grid_to_coords(jnp.stack((xx, yy, zz), axis=-1))
    obj_coords = three.transform_coords(cam_coords, target_cam.cam_to_obj)

    obj_coords = bv2b(jnp.broadcast_to(
        obj_coords[:, None],
        (target_cam.length, source_cam.length, *obj_coords.shape[1:])))
    obj_to_pix = bv2b(jnp.broadcast_to(
        source_cam.obj_to_image[None],
        (target_cam.length, *source_cam.obj_to_image.shape)))

    source_pix_coords = three.transform_coords(obj_coords, obj_to_pix)

    source_viewport = jnp.tile(source_cam.viewport, (target_cam.length, 1))
    source_width = source_viewport[:, 2] - source_viewport[:, 0]
    source_height = source_viewport[:, 3] - source_viewport[:, 1]

    grid_coords = jnp.stack(
        (
            ((source_pix_coords[..., 0] - source_viewport[:, 0, None])
             / source_width[:, None]) * 2 - 1,
            ((source_pix_coords[..., 1] - source_viewport[:, 1, None])
             / source_height[:, None]) * 2 - 1,
        ),
        axis=-1,
    )
    return grid_coords.reshape(target_cam.length, source_cam.length,
                               height, width, 2)


def reproject_views(image_in, depth_in, depth_out, camera_in: Camera,
                    camera_out: Camera):
    """Reproject input-view pixels into each output view
    (reference: ibr.py:52-93).

    image_in: (V_i, C, H, W); depth_in: (V_i, 1, H, W);
    depth_out: (V_o, 1, H, W). Returns image (V_o, V_i, C, H, W) and
    transformed+reprojected depth (V_o, V_i, 1, H, W).
    """
    grid = depth_to_warp_field(camera_in, camera_out, depth_out)

    image_in_b = bv2b(jnp.broadcast_to(
        image_in[None], (camera_out.length, *image_in.shape)))

    obj_coords_in = jnp.stack(camera_in.depth_object_coords(depth_in), axis=-1)
    obj_coords_in = bv2b(jnp.broadcast_to(
        obj_coords_in[None], (camera_out.length, *obj_coords_in.shape)))

    camera_out_rep = camera_out.repeat_interleave(camera_in.length)

    cam_coords_in_tf = three.transform_coord_grid(obj_coords_in,
                                                  camera_out_rep.obj_to_cam)
    depth_in_tf = cam_coords_in_tf[..., 2][:, None]
    depth_in_tf = camera_out_rep.normalize_depth(depth_in_tf)

    grid = bv2b(grid)
    image_reproj = grid_sample_2d(image_in_b, grid, mode="bilinear")
    depth_reproj = grid_sample_2d(depth_in_tf, grid, mode="bilinear")
    return (b2bv(image_reproj, camera_in.length),
            b2bv(depth_reproj, camera_in.length))


def reproject_views_batch(image_in, depth_in, depth_out, camera_in: Camera,
                          camera_out: Camera):
    """Batched reprojection (reference: ibr.py:96-138; the reference loops in
    Python — here the per-object work is stacked directly).

    image_in: (B, V_i, C, H, W). Returns
    (image_reproj (B, V_o, V_i, C, H, W), depth_reproj, cam_dists_r (B, V_o,
    V_i), cam_dists_t).
    """
    num_objects = image_in.shape[0]
    in_views = image_in.shape[1]
    out_views = depth_out.shape[1]

    image_reproj_list, depth_reproj_list = [], []
    dists_r, dists_t = [], []
    for i in range(num_objects):
        cam_in = camera_in[i * in_views:(i + 1) * in_views]
        cam_out = camera_out[i * out_views:(i + 1) * out_views]
        dists_r.append(three.quaternion.angular_distance(
            cam_out.quaternion, cam_in.quaternion, eps=1e-2) / math.pi)
        dists_t.append(outer_distance(cam_out.position, cam_in.position,
                                      metric="cosine") / 2.0)
        image_reproj, depth_reproj = reproject_views(
            image_in[i], depth_in[i], depth_out[i], cam_in, cam_out)
        image_reproj_list.append(image_reproj)
        depth_reproj_list.append(depth_reproj)

    return (jnp.stack(image_reproj_list), jnp.stack(depth_reproj_list),
            jnp.stack(dists_r), jnp.stack(dists_t))


def render_ibr(camera_in: Camera, camera_out: Camera, image_in, depth_fake_in,
               depth_fake_out, p=0.5, weight_type: str = "cam_dist",
               eps: float = 1e-2):
    """Weighted blend of reprojected views (reference: ibr.py:181-222).

    image_in: (B, V_i, C, H, W); depths: (B, V, 1, H, W) normalized.
    """
    image_fake_reproj, image_fake_ibrs = [], []
    num_b = image_in.shape[0]
    for i in range(num_b):
        num_in_views = camera_in.length // num_b
        num_out_views = camera_out.length // num_b
        cam_in = camera_in[i * num_in_views:(i + 1) * num_in_views]
        cam_out = camera_out[i * num_out_views:(i + 1) * num_out_views]
        image_reproj, depth_reproj = reproject_views(
            image_in[i], depth_fake_in[i], depth_fake_out[i], cam_in, cam_out)
        image_fake_reproj.append(image_reproj)

        if weight_type == "cam_dist":
            cam_dists = outer_distance(cam_out.position, cam_in.position,
                                       metric="cosine", eps=eps) / 2.0
            w = 1.0 / jnp.maximum(cam_dists[..., None, None] ** p, eps)
            cam_weights = jax.nn.softmax(w, axis=1)
        elif weight_type == "cam_angle":
            cam_dists = three.quaternion.angular_distance(
                cam_out.quaternion, cam_in.quaternion) / math.pi
            w = 1.0 / jnp.maximum(cam_dists[..., None, None] ** p, eps)
            cam_weights = jax.nn.softmax(w, axis=1)
        elif weight_type == "cam_hybrid":
            cam_dists_t = outer_distance(cam_out.position, cam_in.position,
                                         metric="cosine") / 2.0
            cam_dists_r = three.quaternion.angular_distance(
                cam_out.quaternion, cam_in.quaternion)
            cam_dists_r = jnp.clip(cam_dists_r / (math.pi / 8), 0.0, 1.0)
            cam_dists = 1.0 - (1.0 - cam_dists_t) * (1.0 - cam_dists_r)
            w = 1.0 / jnp.maximum(cam_dists[..., None, None] ** p, eps)
            cam_weights = jax.nn.softmax(w, axis=1)
        elif weight_type == "depth":
            depth_diff = jnp.abs(
                depth_reproj - jnp.broadcast_to(
                    depth_fake_out[i][:, None], depth_reproj.shape))
            cam_weights = jax.nn.softmax(
                1.0 / ((depth_diff / depth_diff.max()) ** p + eps),
                axis=1).squeeze(2)
        else:
            raise ValueError(f"Unknown weight_type {weight_type}")
        image_fake_ibrs.append(
            (cam_weights[:, :, None] * image_reproj).sum(axis=1))

    return jnp.stack(image_fake_ibrs), jnp.stack(image_fake_reproj)


def render_latent_ibr(photographer, photographer_params, z_obj,
                      camera_in: Camera, camera_out: Camera, image_in,
                      p=0.5, weight_type: str = "cam_dist", eps: float = 1e-4):
    """(reference: ibr.py:141-155)"""
    from .recon.models import decode

    fake_in, _, _ = decode(photographer, photographer_params, z_obj, camera_in)
    fake_out, _, _ = decode(photographer, photographer_params, z_obj, camera_out)
    image_fake_ibr, image_fake_reproj = render_ibr(
        camera_in, camera_out, image_in, fake_in["depth"], fake_out["depth"],
        p, weight_type, eps)
    return image_fake_ibr, fake_out["depth"], fake_out["mask"], image_fake_reproj


def render_latent_ibr2(photographer, photographer_params, z_obj,
                       camera_in: Camera, camera_out: Camera, image_in,
                       p=0.5, weight_type: str = "cam_dist",
                       return_latent: bool = True, eps: float = 1e-4,
                       apply_mask: bool = False):
    """(reference: ibr.py:158-178)"""
    from .recon.models import decode

    y_in, _, _ = decode(photographer, photographer_params, z_obj, camera_in,
                        apply_mask=apply_mask)
    y_out, z_out, _ = decode(photographer, photographer_params, z_obj,
                             camera_out, return_latent=return_latent,
                             apply_mask=apply_mask)
    image_fake_ibr, _ = render_ibr(camera_in, camera_out, image_in,
                                   y_in["depth"], y_out["depth"], p,
                                   weight_type, eps)
    if apply_mask:
        y_out["color"] = image_fake_ibr * (y_out["mask"] > 0.5)
    else:
        y_out["color"] = image_fake_ibr
    return y_out, z_out


def blend_logits(logits, image_reproj):
    """(reference: ibr.py:225-228)"""
    blend_weights = jax.nn.softmax(logits, axis=1)[:, :, None]
    image_fake = (blend_weights * image_reproj).sum(axis=1)
    return image_fake, blend_weights


def warp_blend_logits(logits, image_reproj, flow_size):
    """Learned blend + bounded flow correction (reference: ibr.py:231-249)."""
    num_input_views = image_reproj.shape[1]
    height, width = image_reproj.shape[-2:]
    blend, flow_x_logits, flow_y_logits = jnp.split(
        logits, [num_input_views, 2 * num_input_views], axis=1)
    blend_weights = jax.nn.softmax(blend, axis=1)[:, :, None]
    flow_dx = flow_size / width * jnp.tanh(flow_x_logits)
    flow_dy = flow_size / height * jnp.tanh(flow_y_logits)
    flow_y, flow_x = jnp.meshgrid(jnp.linspace(-1, 1, height),
                                  jnp.linspace(-1, 1, width), indexing="ij")
    flow_x = flow_x[None, None] + flow_dx
    flow_y = flow_y[None, None] + flow_dy
    flow_grid = jnp.clip(jnp.stack((flow_x, flow_y), axis=-1), -1, 1)

    image_fake = grid_sample_2d(bv2b(image_reproj), bv2b(flow_grid),
                                mode="bilinear")
    image_fake = b2bv(image_fake, num_input_views)
    image_fake = (blend_weights * image_fake).sum(axis=1)
    return image_fake, blend_weights, flow_dx, flow_dy
