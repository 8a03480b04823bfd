"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so that sharding/pjit code paths
are exercised without TPU hardware (SURVEY.md §4 "Distributed" bullet).

Note: the environment's sitecustomize imports jax at interpreter startup and
registers a TPU backend, so we cannot rely on env vars alone — we switch the
platform via jax.config before any backend is initialized.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Silence XLA AOT-cache feature-string warnings (prefer-no-gather etc. are
# XLA pseudo-features, not real ISA differences).
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# NOTE: no persistent compilation cache for CPU tests — the sandbox may move
# between hosts with different CPU features, and stale AOT entries spam
# feature-mismatch errors (and risk SIGILL).

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
