"""Pose accuracy metrics: ADD, ADD-S, ADD-sym, Proj2D, rot/trans error.

Behavioral reference: ``latentfusion/pose/metrics.py``. ADD-S uses a chunked
min-cdist like the reference; all metrics are jit/vmap-friendly.
"""
from __future__ import annotations

import math
from typing import Dict

import jax.numpy as jnp

from .. import three
from ..three import quaternion


def camera_rotation_dist(camera1, camera2):
    return quaternion.angular_distance(camera1.quaternion, camera2.quaternion)


def camera_translation_dist(camera1, camera2):
    return jnp.linalg.norm(camera1.translation - camera2.translation, axis=-1)


def compute_point_add(extrinsic_gt, extrinsic_eval, points):
    """(reference: metrics.py:77-81)"""
    points_gt = three.transform_coords(points, extrinsic_gt)
    points_eval = three.transform_coords(points, extrinsic_eval)
    return jnp.mean(jnp.linalg.norm(points_gt - points_eval, axis=-1))


def best_distance(x1, x2, batch_size: int = 1000):
    """Chunked min distance from each x1 point to x2
    (reference: metrics.py:91-101)."""
    n = x1.shape[0]
    num_batches = int(math.ceil(n / batch_size))
    dists = []
    for i in range(num_batches):
        batch = x1[i * batch_size:(i + 1) * batch_size]
        # Direct differences (not the |a|^2+|b|^2-2ab expansion, which
        # cancels catastrophically for near-identical point sets).
        d = jnp.linalg.norm(batch[:, None, :] - x2[None, :, :], axis=-1)
        dists.append(d.min(axis=1))
    return jnp.concatenate(dists, axis=0)


def compute_point_add_s(extrinsic_gt, extrinsic_eval, points):
    """(reference: metrics.py:84-88)"""
    points_gt = three.transform_coords(points, extrinsic_gt)
    points_eval = three.transform_coords(points, extrinsic_eval)
    return jnp.mean(best_distance(points_gt, points_eval))


def compute_point_add_sym(extrinsic_gt, extrinsic_eval, points):
    """z-axis-symmetric ADD (reference: metrics.py:66-74)."""
    z_axis = jnp.asarray([[0.0, 0.0, 1.0]], dtype=jnp.float32)
    rot_z180 = quaternion.quat_to_mat(
        quaternion.from_axis_angle(z_axis, math.pi))
    rot_z180 = three.rotation_to_4x4(rot_z180)
    add_ident = compute_point_add(extrinsic_gt, extrinsic_eval, points)
    add_zsym = compute_point_add(extrinsic_gt @ rot_z180, extrinsic_eval, points)
    return jnp.minimum(add_ident, add_zsym)


def compute_point_proj2d(proj_gt, proj_eval, points):
    """(reference: metrics.py:104-108)"""
    points_gt = three.transform_coords(points, proj_gt)
    points_eval = three.transform_coords(points, proj_eval)
    return jnp.mean(jnp.linalg.norm(points_gt - points_eval, axis=-1))


def camera_metrics(camera_gt, camera_eval, points, scale_to_meters,
                   use_add: bool = True, use_add_sym: bool = True,
                   use_add_s: bool = True, use_proj2d: bool = True,
                   **kwargs) -> Dict:
    """(reference: metrics.py:19-63)"""
    if len(camera_gt) > 1:
        return [camera_metrics(c1, c2, points, scale_to_meters)
                for c1, c2 in zip(camera_gt, camera_eval)]
    rot_dist = camera_rotation_dist(camera_gt, camera_eval)
    trans_dist = camera_translation_dist(camera_gt, camera_eval) * scale_to_meters
    metrics = {
        "rotation_dist": float(rot_dist.reshape(())),
        "translation_dist": float(trans_dist.reshape(())),
    }
    if points is not None:
        if use_add:
            metrics["add"] = float(compute_point_add(
                camera_gt.obj_to_cam, camera_eval.obj_to_cam, points)
                * scale_to_meters)
        if use_add_s:
            metrics["add_s"] = float(compute_point_add_s(
                camera_gt.obj_to_cam, camera_eval.obj_to_cam, points)
                * scale_to_meters)
        if use_add_sym:
            metrics["add_sym"] = float(compute_point_add_sym(
                camera_gt.obj_to_cam, camera_eval.obj_to_cam, points)
                * scale_to_meters)
        if use_proj2d:
            metrics["proj2d"] = float(compute_point_proj2d(
                camera_gt.obj_to_image, camera_eval.obj_to_image, points))
    return metrics


def concat_camera_metrics(metrics_list):
    """(reference: metrics.py:111-118)"""
    import collections

    out = collections.defaultdict(list)
    for key in metrics_list[0].keys():
        for metrics in metrics_list:
            out[key].append(metrics[key])
    return out
