"""Distance functions (behavioral reference: ``latentfusion/distances.py``)."""
from __future__ import annotations

import jax.numpy as jnp


def _cosine_similarity(x1, x2, axis=1, eps=1e-8):
    """Matches torch.cosine_similarity: dot / max(|x1|*|x2|, eps)."""
    dot = (x1 * x2).sum(axis=axis)
    n1 = jnp.linalg.norm(x1, axis=axis)
    n2 = jnp.linalg.norm(x2, axis=axis)
    return dot / jnp.maximum(n1 * n2, eps)


def cosine_distance(x1, x2, axis=1, eps=1e-8):
    """(reference: distances.py:5-9)"""
    if x1.ndim == 1:
        axis = 0
    return 1.0 - _cosine_similarity(x1, x2, axis, eps)


def pairwise_distance(x1, x2, metric="cosine", p=2, eps=1e-8):
    """(reference: distances.py:12-18)"""
    if metric == "cosine":
        return 1.0 - _cosine_similarity(x1, x2, axis=1, eps=eps)
    elif metric == "euclidean":
        return jnp.linalg.norm(x1 - x2 + eps, ord=p, axis=1)
    raise ValueError(f"Unknown type {metric!r}")


def distance(x1, x2, metric="cosine", p=2, eps=1e-8, axis=0):
    """(reference: distances.py:21-24)"""
    if metric == "cosine":
        return 1.0 - _cosine_similarity(x1, x2, axis=axis, eps=eps)
    return jnp.linalg.norm(x1 - x2, ord=p, axis=axis)


def outer_distance(x1, x2, metric="cosine", p=2, eps=1e-8):
    """All-pairs distances (reference: distances.py:27-43)."""
    if metric == "cosine":
        x12 = x1 @ x2.T
        w1 = jnp.linalg.norm(x1, axis=1, keepdims=True)
        w2 = jnp.linalg.norm(x2, axis=1, keepdims=True)
        return 1.0 - x12 / jnp.maximum(w1 @ w2.T, eps)
    elif metric == "euclidean":
        sq = (
            (x1 ** 2).sum(axis=1)[:, None]
            + (x2 ** 2).sum(axis=1)[None, :]
            - 2.0 * (x1 @ x2.T)
        )
        return jnp.sqrt(jnp.maximum(sq, 0.0))
    elif metric == "inner":
        return -(x1 @ x2.T)
    elif metric == "ols_coef":
        x12 = x1 @ x2.T
        w1 = jnp.linalg.norm(x1, axis=1, keepdims=True)
        return -(x12 / jnp.maximum(w1 ** 2, eps))
    raise ValueError(f"Unknown type {metric!r}")
