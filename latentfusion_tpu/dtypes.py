"""Global compute-dtype policy.

The reference trains under CUDA AMP and evaluates in fp32
(autocast(enabled=self.training), reference: recon/models.py:199,405). On TPU
the analogous policy is bf16 conv compute with fp32 params and fp32
resampling; bf16 needs no loss scaling. Parity tests run in fp32 (default);
benchmarks/training enable bf16 via ``set_compute_dtype``.
"""
from __future__ import annotations

import jax.numpy as jnp

_COMPUTE_DTYPE = jnp.float32


def set_compute_dtype(dtype) -> None:
    global _COMPUTE_DTYPE
    _COMPUTE_DTYPE = jnp.dtype(dtype) if not isinstance(dtype, str) else {
        "float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype]


def get_compute_dtype():
    return _COMPUTE_DTYPE
