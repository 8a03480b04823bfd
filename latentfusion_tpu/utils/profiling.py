"""Profiling helpers.

Behavioral reference: ``latentfusion/torchutils.py:272-286``
(``profile()`` / ``measure_time``). TPU equivalents: ``jax.profiler`` traces
(viewable in TensorBoard / Perfetto) and synchronized wall-clock timing via
``block_until_ready``.
"""
from __future__ import annotations

import contextlib
import logging
import time

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def profile(log_dir: str = "/tmp/latentfusion_tpu_trace"):
    """Capture a device trace for the enclosed region
    (reference: torchutils.py:272-276)."""
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # some backends (remote tunnels) can't trace
        logger.warning("device tracing unavailable: %s", e)
        started = False
    try:
        yield
    finally:
        if started:
            jax.profiler.stop_trace()
            logger.info("trace written to %s", log_dir)


@contextlib.contextmanager
def measure_time(name: str = "block", sync_value=None):
    """Synchronized wall-clock timer (reference: torchutils.py:279-286).

    Pass the output pytree via ``out['value'] = ...`` (or rely on the
    caller blocking) — the timer blocks on ``sync_value`` if given.
    """
    t0 = time.time()
    holder = {}
    try:
        yield holder
    finally:
        value = holder.get("value", sync_value)
        if value is not None:
            jax.block_until_ready(value)
        elapsed = time.time() - t0
        holder["elapsed"] = elapsed
        logger.info("%s took %.4fs", name, elapsed)


def timeit(fn, *args, reps: int = 10, warmup: int = 1):
    """Steady-state timing of a jitted callable; returns seconds/call."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = jax.block_until_ready(fn(*args))
    del out
    return (time.time() - t0) / reps
