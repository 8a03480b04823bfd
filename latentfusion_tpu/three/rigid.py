"""Rigid transform (4x4 extrinsic) helpers.

Behavioral reference: ``latentfusion/three/rigid.py``.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from . import quaternion
from .core import dehomogenize, ensure_batch_dim, uniform


def intrinsic_to_3x4(matrix: jnp.ndarray) -> jnp.ndarray:
    """Pad a (.., 3, 3) intrinsic to (.., 3, 4) (reference: rigid.py:10-18)."""
    matrix, unsqueezed = ensure_batch_dim(matrix, 2)
    zeros = jnp.zeros((*matrix.shape[:-2], 3, 1), dtype=matrix.dtype)
    mat = jnp.concatenate((matrix, zeros), axis=-1)
    if unsqueezed:
        mat = mat[0]
    return mat


def matrix_3x3_to_4x4(matrix: jnp.ndarray) -> jnp.ndarray:
    """(reference: rigid.py:22-32)"""
    matrix, unsqueezed = ensure_batch_dim(matrix, 2)
    mat = jnp.pad(matrix, ((0, 0), (0, 1), (0, 1)))
    mat = mat.at[:, -1, -1].set(1.0)
    if unsqueezed:
        mat = mat[0]
    return mat


def rotation_to_4x4(matrix: jnp.ndarray) -> jnp.ndarray:
    return matrix_3x3_to_4x4(matrix)


def translation_to_4x4(translation: jnp.ndarray) -> jnp.ndarray:
    """(reference: rigid.py:40-49)"""
    translation, unsqueezed = ensure_batch_dim(translation, 1)
    eye = jnp.eye(4, dtype=translation.dtype)
    mat = jnp.pad(translation[..., None], ((0, 0), (0, 1), (3, 0))) + eye
    if unsqueezed:
        mat = mat[0]
    return mat


def decompose(matrix: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Split an extrinsic into rotation and translation 4x4s
    (reference: rigid.py:78-97). Accepts (.., 3, 4) or (.., 4, 4)."""
    matrix, unsqueezed = ensure_batch_dim(matrix, 2)
    b = matrix.shape[0]
    origin = jnp.tile(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=matrix.dtype).reshape(1, 4, 1), (b, 1, 1)
    )
    R = jnp.concatenate((matrix[:, :, :3], origin), axis=-1)
    eye = jnp.tile(jnp.eye(4, 3, dtype=matrix.dtype)[None], (b, 1, 1))
    T = jnp.concatenate((eye, matrix[:, :, 3:4]), axis=-1)
    if unsqueezed:
        R, T = R[0], T[0]
    return R, T


def inverse_transform(matrix: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a rigid 4x4 (reference: rigid.py:100-116)."""
    matrix, unsqueezed = ensure_batch_dim(matrix, 2)
    R, T = decompose(matrix)
    R_inv = jnp.swapaxes(R, 1, 2)
    t = T[:, :4, 3:4]
    t_inv = (R_inv @ t)[:, :3, 0]
    out = jnp.zeros_like(matrix)
    out = out.at[:, :3, :3].set(R_inv[:, :3, :3])
    out = out.at[:, :3, 3].set(-t_inv)
    out = out.at[:, 3, 3].set(1.0)
    if unsqueezed:
        out = out[0]
    return out


def translate_matrix(matrix: jnp.ndarray, offset) -> jnp.ndarray:
    """(reference: rigid.py:52-62)"""
    matrix, unsqueezed = ensure_batch_dim(matrix, 2)
    out = inverse_transform(matrix)
    out = out.at[:, :3, 3].add(offset)
    out = inverse_transform(out)
    if unsqueezed:
        out = out[0]
    return out


def scale_matrix(matrix: jnp.ndarray, scale) -> jnp.ndarray:
    """(reference: rigid.py:65-75)"""
    matrix, unsqueezed = ensure_batch_dim(matrix, 2)
    out = inverse_transform(matrix)
    out = out.at[:, :3, 3].multiply(scale)
    out = inverse_transform(out)
    if unsqueezed:
        out = out[0]
    return out


def extrinsic_to_position(extrinsic: jnp.ndarray) -> jnp.ndarray:
    """Camera center C = -R^T t (reference: rigid.py:119-128)."""
    extrinsic, unsqueezed = ensure_batch_dim(extrinsic, 2)
    rot_mat, trans_mat = decompose(extrinsic)
    position = jnp.swapaxes(rot_mat, -1, -2) @ trans_mat[:, :, 3:4]
    position = dehomogenize(position[..., 0])
    if unsqueezed:
        position = position[0]
    return position


def random_translation(key, n: int, x_bound, y_bound, z_bound) -> jnp.ndarray:
    """(reference: rigid.py:131-140)"""
    import jax

    kx, ky, kz = jax.random.split(key, 3)
    trans_x = uniform(kx, n, *x_bound)
    trans_y = uniform(ky, n, *y_bound)
    trans_z = uniform(kz, n, *z_bound)
    return jnp.stack((trans_x, trans_y, trans_z), axis=-1)


def to_extrinsic_matrix(translation: jnp.ndarray, quat: jnp.ndarray) -> jnp.ndarray:
    """Compose extrinsic = T @ R (reference: rigid.py:143-149)."""
    rot_mat = quaternion.quat_to_mat(quat)
    rot_mat = rotation_to_4x4(rot_mat)
    trans_mat = translation_to_4x4(translation)
    return trans_mat @ rot_mat


def extrinsic_to_quat(extrinsic: jnp.ndarray) -> jnp.ndarray:
    """(reference: rigid.py:152-155)"""
    rot_mat, _ = decompose(extrinsic)
    return quaternion.mat_to_quat(rot_mat[..., :3, :3])
