"""(B, V, ...) <-> (B*V, ...) reshape idiom used throughout the framework.

Behavioral reference: ``latentfusion/three/batchview.py``.
"""
from __future__ import annotations

import jax.numpy as jnp


def bvmm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched-view matmul (reference: batchview.py:5-17)."""
    if a.shape[0] != b.shape[0]:
        raise ValueError("batch dimension must match")
    if a.shape[1] != b.shape[1]:
        raise ValueError("view dimension must match")
    return jnp.einsum("bvij,bvjk->bvik", a, b)


def bv2b(x: jnp.ndarray) -> jnp.ndarray:
    """Fold the view dim into batch (reference: batchview.py:20-23)."""
    return x.reshape(-1, *x.shape[2:])


def b2bv(x: jnp.ndarray, num_view: int = -1, batch_size: int = -1) -> jnp.ndarray:
    """Unfold batch into (batch, view) (reference: batchview.py:26-29)."""
    if num_view == -1 and batch_size == -1:
        raise ValueError("One of num_view or batch_size must be non-negative.")
    return x.reshape(batch_size, num_view, *x.shape[1:])


def vcat(tensors, batch_size: int) -> jnp.ndarray:
    """Concatenate along the view dim then re-fold (reference: batchview.py:32-34)."""
    tensors = [b2bv(t, batch_size=batch_size) for t in tensors]
    return bv2b(jnp.concatenate(tensors, axis=1))


def vsplit(tensor: jnp.ndarray, sections) -> tuple:
    """Split along the view dim (reference: batchview.py:37-40).

    ``sections`` is a list of view counts (torch.split semantics).
    """
    num_view = sum(sections)
    tensor = b2bv(tensor, num_view=num_view)
    splits = []
    start = 0
    for s in sections:
        splits.append(bv2b(tensor[:, start:start + s]))
        start += s
    return tuple(splits)
