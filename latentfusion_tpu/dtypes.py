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


# --------------------------------------------------------- compiler options
# Per-executable XLA compiler options for the HOT estimator loops.
# On tunneled backends (axon) server-side TPU flags cannot be passed via
# XLA_FLAGS — the local parse aborts on unknown flags — but PJRT forwards
# per-compile options (jit(..., compiler_options=...)) to the server
# compiler. bench.py exposes this as --compiler-option KEY=VAL for A/B
# sweeps (e.g. xla_tpu_scoped_vmem_limit_kib, the fusion emitter's scoped
# VMEM budget).

_COMPILER_OPTIONS: dict | None = None


def set_compiler_options(options: dict | None) -> None:
    global _COMPILER_OPTIONS
    _COMPILER_OPTIONS = dict(options) if options else None


def get_compiler_options() -> dict | None:
    return _COMPILER_OPTIONS
