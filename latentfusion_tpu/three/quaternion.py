"""Quaternion algebra in (w, x, y, z) convention.

Behavioral reference: ``latentfusion/three/quaternion.py``. The log-quaternion
parameterization (``qexp``/``qlog``) is the pose parameterization used for
gradient-based pose refinement, so numerics here must match the reference
within fp32 tolerance.

All sampling functions take an explicit ``jax.random`` key.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from . import core


def identity(n: int) -> jnp.ndarray:
    """(reference: quaternion.py:10-11)"""
    return jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0], dtype=jnp.float32), (n, 1))


def normalize(quaternion: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize with eps clamp on the norm (matches F.normalize semantics;
    reference: quaternion.py:14-37)."""
    norm = jnp.linalg.norm(quaternion, axis=-1, keepdims=True)
    return quaternion / jnp.maximum(norm, eps)


def quat_to_mat(quaternion: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (w,x,y,z) to rotation matrix (reference: quaternion.py:40-96)."""
    quaternion, unsqueezed = core.ensure_batch_dim(quaternion, 1)
    q = normalize(quaternion)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    tx, ty, tz = 2.0 * x, 2.0 * y, 2.0 * z
    twx, twy, twz = tx * w, ty * w, tz * w
    txx, txy, txz = tx * x, ty * x, tz * x
    tyy, tyz = ty * y, tz * y
    tzz = tz * z
    matrix = jnp.stack(
        [
            1.0 - (tyy + tzz), txy - twz, txz + twy,
            txy + twz, 1.0 - (txx + tzz), tyz - twx,
            txz - twy, tyz + twx, 1.0 - (txx + tyy),
        ],
        axis=-1,
    ).reshape(*q.shape[:-1], 3, 3)
    if unsqueezed:
        matrix = matrix[0]
    return matrix


def mat_to_quat(rotation_matrix: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Rotation matrix to quaternion (w,x,y,z).

    Branch-free ``jnp.where`` selection over the same four cases as the
    reference (quaternion.py:99-186); the case predicates are identical so the
    selected branch (and hence the sign convention) matches exactly.
    """
    m, unsqueezed = core.ensure_batch_dim(rotation_matrix, 2)
    mv = m.reshape(*m.shape[:-2], 9)
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = [mv[..., i] for i in range(9)]

    tiny = jnp.finfo(mv.dtype).tiny

    def safe_div(num, den):
        return num / jnp.maximum(den, tiny)

    trace = m00 + m11 + m22

    # Case trace > 0.
    # Clamp sqrt args to avoid nan gradients/values in unselected branches.
    sq_t = jnp.sqrt(jnp.maximum(trace + 1.0, tiny)) * 2.0
    q_t = jnp.stack(
        [0.25 * sq_t, safe_div(m21 - m12, sq_t), safe_div(m02 - m20, sq_t),
         safe_div(m10 - m01, sq_t)], axis=-1)

    sq_1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22 + eps, tiny)) * 2.0
    q_1 = jnp.stack(
        [safe_div(m21 - m12, sq_1), 0.25 * sq_1, safe_div(m01 + m10, sq_1),
         safe_div(m02 + m20, sq_1)], axis=-1)

    sq_2 = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22 + eps, tiny)) * 2.0
    q_2 = jnp.stack(
        [safe_div(m02 - m20, sq_2), safe_div(m01 + m10, sq_2), 0.25 * sq_2,
         safe_div(m12 + m21, sq_2)], axis=-1)

    sq_3 = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11 + eps, tiny)) * 2.0
    q_3 = jnp.stack(
        [safe_div(m10 - m01, sq_3), safe_div(m02 + m20, sq_3),
         safe_div(m12 + m21, sq_3), 0.25 * sq_3], axis=-1)

    where_2 = jnp.where((m11 > m22)[..., None], q_2, q_3)
    where_1 = jnp.where(((m00 > m11) & (m00 > m22))[..., None], q_1, where_2)
    quaternion = jnp.where((trace > 0.0)[..., None], q_t, where_1)

    if unsqueezed:
        quaternion = quaternion[0]
    return quaternion


def random(key, k: int = 1) -> jnp.ndarray:
    """Uniform random unit quaternions (reference: quaternion.py:189-208)."""
    rand = jax.random.uniform(key, (k, 3))
    r1 = jnp.sqrt(1.0 - rand[:, 0])
    r2 = jnp.sqrt(rand[:, 0])
    pi2 = math.pi * 2.0
    t1 = pi2 * rand[:, 1]
    t2 = pi2 * rand[:, 2]
    return jnp.stack(
        [jnp.cos(t2) * r2, jnp.sin(t1) * r1, jnp.cos(t1) * r1, jnp.sin(t2) * r2],
        axis=1,
    )


def qmul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product (reference: quaternion.py:211-230)."""
    assert q1.shape[-1] == 4 and q2.shape[-1] == 4
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    # Matches the reference's outer-product formulation: ham[i,j] = q2[i]*q1[j].
    w = w2 * w1 - x2 * x1 - y2 * y1 - z2 * z1
    x = w2 * x1 + x2 * w1 - y2 * z1 + z2 * y1
    y = w2 * y1 + x2 * z1 + y2 * w1 - z2 * x1
    z = w2 * z1 - x2 * y1 + y2 * x1 + z2 * w1
    return jnp.stack((w, x, y, z), axis=-1).reshape(q1.shape)


def rotate_vector(quat: jnp.ndarray, vector: jnp.ndarray) -> jnp.ndarray:
    """Rotate 3-vectors by unit quaternions (reference: quaternion.py:233-252)."""
    assert quat.shape[-1] == 4 and vector.shape[-1] == 3
    original_shape = vector.shape
    quat = quat.reshape(-1, 4)
    vector = vector.reshape(-1, 3)
    pure = quat[:, 1:]
    uv = jnp.cross(pure, vector)
    uuv = jnp.cross(pure, uv)
    return (vector + 2 * (quat[:, :1] * uv + uuv)).reshape(original_shape)


def from_spherical(theta, phi, r=1.0):
    """(reference: quaternion.py:255-261)"""
    x = jnp.cos(theta) * jnp.sin(phi)
    y = jnp.sin(theta) * jnp.sin(phi)
    z = r * jnp.cos(phi)
    w = jnp.zeros_like(x)
    return jnp.stack((w, x, y, z), axis=-1)


def from_axis_angle(axis: jnp.ndarray, angle) -> jnp.ndarray:
    """(reference: quaternion.py:264-291)"""
    if not isinstance(angle, jnp.ndarray):
        angle = jnp.full(axis.shape[:-1], angle, dtype=axis.dtype)
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    c = jnp.cos(angle / 2.0)
    s = jnp.sin(angle / 2.0)
    return jnp.stack(
        (c, s * axis[..., 0], s * axis[..., 1], s * axis[..., 2]), axis=-1
    )


def qexp(q: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Quaternion exponential; accepts (*, 4) or pure-imaginary (*, 3)
    (reference: quaternion.py:294-317)."""
    if q.shape[-1] == 4:
        s, v = q[..., :1], q[..., 1:]
    else:
        s = jnp.zeros_like(q[..., :1])
        v = q
    theta = jnp.linalg.norm(v, axis=-1, keepdims=True)
    exp_s = jnp.exp(s)
    w = jnp.cos(theta)
    xyz = 1.0 / jnp.maximum(theta, eps) * jnp.sin(theta) * v
    return exp_s * jnp.concatenate((w, xyz), axis=-1)


def qlog(q: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Quaternion logarithm (reference: quaternion.py:320-340)."""
    mag = jnp.linalg.norm(q, axis=-1, keepdims=True)
    s, v = q[..., :1], q[..., 1:]
    w = jnp.log(mag)
    xyz = (
        v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)
        * core.acos_safe(s / jnp.maximum(mag, eps))
    )
    return jnp.concatenate((w, xyz), axis=-1)


def qdelta(key, n: int, std) -> jnp.ndarray:
    """Random small rotation quaternions (reference: quaternion.py:343-347)."""
    omega = jnp.concatenate(
        (jnp.zeros((n, 1)), jax.random.normal(key, (n, 3))), axis=-1
    )
    return qexp(std / 2.0 * omega)


def perturb(key, q: jnp.ndarray, std) -> jnp.ndarray:
    """Perturb unit quaternions with std-radian noise (reference: quaternion.py:350-374)."""
    q, unsqueezed = core.ensure_batch_dim(q, 1)
    delta_q = qdelta(key, q.shape[0], std)
    q_out = qmul(delta_q, q)
    if unsqueezed:
        q_out = q_out[0]
    return q_out


def angular_distance(q1: jnp.ndarray, q2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Pairwise angular distance matrix (reference: quaternion.py:377-382)."""
    q1 = normalize(q1)
    q2 = normalize(q2)
    dot = q1 @ q2.T
    return 2 * core.acos_safe(jnp.abs(dot), eps=eps)
