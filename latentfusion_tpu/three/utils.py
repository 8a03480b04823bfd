"""Farthest-point sampling (used to pick evenly-spread reference views).

Behavioral reference: ``latentfusion/three/utils.py``.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def farthest_points(data: jnp.ndarray, n_clusters: int, dist_func,
                    return_center_indexes: bool = False,
                    return_distances: bool = False):
    """Farthest point sampling (reference: three/utils.py:4-48).

    ``dist_func(broadcasted_center, data) -> (N,)`` distances.
    """
    n = data.shape[0]
    if n_clusters >= n:
        if return_center_indexes:
            return jnp.arange(n), jnp.arange(n)
        return jnp.arange(n)

    def body(i, state):
        clusters, distances, centers = state
        center_idx = jnp.argmax(distances)
        centers = centers.at[i].set(center_idx)
        center = jnp.broadcast_to(data[center_idx][None], data.shape)
        new_distances = dist_func(center, data)
        distances_next = jnp.minimum(distances, new_distances)
        clusters = jnp.where(distances_next == new_distances, i, clusters)
        return clusters, distances_next, centers

    clusters = jnp.full((n,), -1, dtype=jnp.int32)
    distances = jnp.full((n,), 1e7, dtype=jnp.float32)
    centers = jnp.zeros((n_clusters,), dtype=jnp.int32)
    clusters, distances, centers = lax.fori_loop(
        0, n_clusters, body, (clusters, distances, centers)
    )

    if return_center_indexes:
        if return_distances:
            return clusters, centers, distances
        return clusters, centers
    return clusters
