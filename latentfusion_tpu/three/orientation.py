"""Rotation sampling: spiral orbits, hemisphere/segment rays, sunflower-even
quaternions (used to seed pose hypotheses), disk-sampled quaternions.

Behavioral reference: ``latentfusion/three/orientation.py``. Rejection loops
are expressed as bounded ``lax.while_loop``s so everything stays jit-able.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

from . import core
from . import quaternion as q


def spiral_orbit(n: int, c: int = 16) -> jnp.ndarray:
    """(reference: orientation.py:9-13)"""
    phi = jnp.linspace(0, math.pi, n)
    theta = c * phi
    return q.from_spherical(phi, theta)


def _check_up(up, n: int) -> jnp.ndarray:
    if not isinstance(up, jnp.ndarray):
        up = jnp.asarray(up, dtype=jnp.float32)
    if up.ndim == 1:
        up = jnp.broadcast_to(up, (n, up.shape[0]))
    return core.normalize(up)


def _is_ray_in_segment(ray, up, min_angle, max_angle):
    angle = jnp.arccos(jnp.clip(core.inner_product(up, ray), -1.0, 1.0))
    return (min_angle <= angle) & (angle <= max_angle)


def sample_segment_rays(key, n: int, up, min_angle, max_angle,
                        max_iters: int = 256) -> jnp.ndarray:
    """Rejection-sample rays whose angle to ``up`` lies in a segment
    (reference: orientation.py:30-41); bounded resampling loop."""
    up = _check_up(up, n)

    def cond(state):
        _, rays, i = state
        return (~_is_ray_in_segment(rays, up, min_angle, max_angle)).any() & (
            i < max_iters
        )

    def body(state):
        key, rays, i = state
        key, sub = jax.random.split(key)
        fresh = core.normalize(jax.random.normal(sub, (n, 3)))
        valid = _is_ray_in_segment(rays, up, min_angle, max_angle)
        rays = jnp.where(valid[:, None], rays, fresh)
        return key, rays, i + 1

    key, sub = jax.random.split(key)
    rays = core.normalize(jax.random.normal(sub, (n, 3)))
    _, rays, _ = lax.while_loop(cond, body, (key, rays, 0))
    return core.normalize(rays)


def sample_hemisphere_rays(key, n: int, up) -> jnp.ndarray:
    """Uniform rays reflected into the hemisphere of ``up``
    (reference: orientation.py:44-67)."""
    up = _check_up(up, n)
    rays = core.normalize(jax.random.normal(key, (n, 3)))
    dot = (up * rays).sum(axis=-1)
    reflected = rays - 2 * dot[:, None] * up
    return jnp.where((dot < 0)[:, None], reflected, rays)


def random_quat_from_ray(forward: jnp.ndarray, up=None, key=None) -> jnp.ndarray:
    """Quaternions orienting the camera forward along ``forward``
    (reference: orientation.py:70-92)."""
    n = forward.shape[0]
    if up is None:
        if key is None:
            raise ValueError("key required when up is None")
        down = core.uniform_unit_vector(key, n)
    else:
        up = jnp.broadcast_to(jnp.asarray(up, dtype=jnp.float32)[None], (n, 3))
        up = up + forward
        down = -up
    right = core.normalize(jnp.cross(down, forward))
    down = core.normalize(jnp.cross(forward, right))
    mat = jnp.stack([right, down, forward], axis=1)
    return q.mat_to_quat(mat)


def sample_segment_quats(key, n: int, up, min_angle, max_angle) -> jnp.ndarray:
    """(reference: orientation.py:95-123)"""
    up = _check_up(up, n)
    k1, k2 = jax.random.split(key)
    yaw_angle = jax.random.uniform(k1, (n,)) * math.pi * 2.0
    yaw_quat = q.from_axis_angle(up, yaw_angle)
    rays = sample_segment_rays(k2, n, up, min_angle, max_angle)
    pivot = jnp.cross(up, rays)
    angles = jnp.arccos(jnp.clip(core.inner_product(up, rays), -1.0, 1.0))
    quat = q.from_axis_angle(pivot, angles)
    return q.qmul(quat, yaw_quat)


def evenly_distributed_points(n: int, hemisphere: bool = False,
                              pole=(0.0, 0.0, 1.0)) -> jnp.ndarray:
    """Sunflower-method even sphere sampling (reference: orientation.py:126-163)."""
    indices = jnp.arange(0, n, dtype=jnp.float32) + 0.5
    if hemisphere:
        phi = jnp.arccos(1 - 2 * indices / n / 2)
    else:
        phi = jnp.arccos(1 - 2 * indices / n)
    theta = math.pi * (1 + 5 ** 0.5) * indices
    points = jnp.stack(
        [jnp.cos(theta) * jnp.sin(phi), jnp.sin(theta) * jnp.sin(phi), jnp.cos(phi)],
        axis=1,
    )
    if hemisphere:
        default_pole = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
        pole = jnp.broadcast_to(jnp.asarray(pole, dtype=jnp.float32), (n, 3))
        if float(jnp.abs(default_pole[0] + pole[0]).sum()) < 1e-5:
            points = -points
        elif float(jnp.abs(default_pole[0] - pole[0]).sum()) < 1e-5:
            pass
        else:
            rot_axis = jnp.cross(pole, default_pole)
            rot_angle = jnp.arccos(jnp.clip(core.inner_product(pole, default_pole), -1, 1))
            rot_quat = q.from_axis_angle(rot_axis, rot_angle)
            points = q.rotate_vector(rot_quat, points)
    return points


def evenly_distributed_quats(n: int, hemisphere: bool = False,
                             hemisphere_pole=(0.0, 0.0, 1.0),
                             upright: bool = False,
                             upright_up=(0.0, 0.0, 1.0),
                             key=None) -> jnp.ndarray:
    """(reference: orientation.py:166-169)"""
    if key is None:
        key = jax.random.PRNGKey(0)
    rays = evenly_distributed_points(n, hemisphere, hemisphere_pole)
    return random_quat_from_ray(-rays, upright_up if upright else None, key=key)


def disk_sample_quats(key, n: int, min_angle: float, max_tries: int = 64) -> jnp.ndarray:
    """Greedy Poisson-disk sampling of quaternions
    (reference: orientation.py:172-187). Fixed-size buffer + while_loop."""

    def cond(state):
        _, _, count, _ = state
        return count < n

    def body(state):
        key, quats, count, num_tries = state
        key, sub = jax.random.split(key)
        new_quat = q.random(sub, 1)
        angles = q.angular_distance(quats, new_quat)[:, 0]
        # Only consider already-accepted entries.
        valid_mask = jnp.arange(n) < count
        ok = jnp.all(jnp.where(valid_mask, angles >= min_angle, True))
        accept = ok | (num_tries > max_tries)
        quats = lax.cond(
            accept, lambda qs: qs.at[count].set(new_quat[0]), lambda qs: qs, quats
        )
        count = jnp.where(accept, count + 1, count)
        num_tries = jnp.where(accept, 0, num_tries + 1)
        return key, quats, count, num_tries

    key, sub = jax.random.split(key)
    quats = jnp.zeros((n, 4), dtype=jnp.float32).at[0].set(q.random(sub, 1)[0])
    _, quats, _, _ = lax.while_loop(cond, body, (key, quats, 1, 0))
    return quats
