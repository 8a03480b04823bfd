"""Core 3D tensor math (TPU-native rebuild of the reference's math kernel).

Behavioral reference: ``latentfusion/three/core.py`` in NVlabs/latentfusion
(see file:line cites on each function). All functions are pure ``jax.numpy``
and jit/vmap-safe.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "acos_safe",
    "ensure_batch_dim",
    "normalize",
    "uniform",
    "uniform_unit_vector",
    "inner_product",
    "homogenize",
    "dehomogenize",
    "transform_coord_grid",
    "transform_coords",
    "grid_to_coords",
    "spherical_to_cartesian",
    "points_bound",
    "points_radius",
    "points_diameter",
    "points_centroid",
    "points_bounding_size",
]


def acos_safe(t: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Numerically safe arccos (reference: three/core.py:5)."""
    return jnp.arccos(jnp.clip(t, -1.0 + eps, 1.0 - eps))


def ensure_batch_dim(tensor: jnp.ndarray, num_dims: int):
    """Adds a leading batch dim if the tensor has ``num_dims`` dims
    (reference: three/core.py:10-16)."""
    if tensor.ndim == num_dims:
        return tensor[None], True
    return tensor, False


def normalize(vector: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """L2-normalize along ``axis`` (reference: three/core.py:19-30)."""
    return vector / jnp.linalg.norm(vector, axis=axis, keepdims=True)


def uniform(key, n: int, min_val: float, max_val: float) -> jnp.ndarray:
    """Uniform samples in [min_val, max_val) (reference: three/core.py:33-35)."""
    return (max_val - min_val) * jax.random.uniform(key, (n,)) + min_val


def uniform_unit_vector(key, n: int) -> jnp.ndarray:
    """Uniform random unit 3-vectors (reference: three/core.py:38-39)."""
    return normalize(jax.random.normal(key, (n, 3)), axis=1)


def inner_product(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return (a * b).sum(axis=-1)


def homogenize(coords: jnp.ndarray) -> jnp.ndarray:
    """Append a homogeneous 1 coordinate (reference: three/core.py:46-49)."""
    ones = jnp.ones_like(coords[..., :1])
    return jnp.concatenate((coords, ones), axis=-1)


def dehomogenize(coords: jnp.ndarray) -> jnp.ndarray:
    """Divide by (and drop) the last coordinate (reference: three/core.py:52-54)."""
    return coords[..., : coords.shape[-1] - 1] / coords[..., -1:]


def transform_coord_grid(grid: jnp.ndarray, transform: jnp.ndarray) -> jnp.ndarray:
    """Apply a (B, M, N) transform to a (B, *spatial, N-1) coordinate grid
    (reference: three/core.py:57-68)."""
    if transform.shape[0] != grid.shape[0]:
        raise ValueError("Batch dimensions must match.")
    out_shape = (*grid.shape[:-1], transform.shape[1])
    grid = homogenize(grid)
    coords = grid.reshape(grid.shape[0], -1, grid.shape[-1])
    coords = transform @ jnp.swapaxes(coords, 1, 2)
    coords = jnp.swapaxes(coords, 1, 2)
    return dehomogenize(coords.reshape(*out_shape))


def transform_coords(coords: jnp.ndarray, transform: jnp.ndarray) -> jnp.ndarray:
    """Apply homogeneous transform(s) to point sets (reference: three/core.py:71-83)."""
    coords, unsqueezed = ensure_batch_dim(coords, 2)
    coords = homogenize(coords)
    coords = transform @ jnp.swapaxes(coords, -1, -2)
    coords = jnp.swapaxes(coords, -1, -2)
    coords = dehomogenize(coords)
    if unsqueezed:
        coords = coords[0]
    return coords


def grid_to_coords(grid: jnp.ndarray) -> jnp.ndarray:
    """Flatten a (B, *spatial, C) grid to (B, prod(spatial), C)
    (reference: three/core.py:86-88)."""
    return grid.reshape(grid.shape[0], -1, grid.shape[-1])


def spherical_to_cartesian(theta, phi, r=1.0):
    """(reference: three/core.py:91-95). Note the reference's (nonstandard)
    convention: z uses cos(theta)."""
    x = r * jnp.cos(theta) * jnp.sin(phi)
    y = r * jnp.sin(theta) * jnp.sin(phi)
    z = r * jnp.cos(theta)
    return jnp.stack((x, y, z), axis=-1)


def points_bound(points: jnp.ndarray) -> jnp.ndarray:
    """(N,3) points -> (3,2) min/max bounds (reference: three/core.py:98-101)."""
    min_dim = jnp.min(points, axis=0)
    max_dim = jnp.max(points, axis=0)
    return jnp.stack((min_dim, max_dim), axis=1)


def points_radius(points: jnp.ndarray) -> jnp.ndarray:
    """Max distance from bbox centroid (reference: three/core.py:104-108)."""
    bounds = points_bound(points)
    centroid = bounds.mean(axis=1)[None]
    return jnp.linalg.norm(points - centroid, axis=1).max()


def points_diameter(points: jnp.ndarray) -> jnp.ndarray:
    return 2 * points_radius(points)


def points_centroid(points: jnp.ndarray) -> jnp.ndarray:
    return points_bound(points).mean(axis=1)


def points_bounding_size(points: jnp.ndarray) -> jnp.ndarray:
    bounds = points_bound(points)
    return jnp.linalg.norm(bounds[:, 1] - bounds[:, 0])
