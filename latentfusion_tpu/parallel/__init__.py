"""Device-mesh parallelism.

The reference's only parallelism is single-host ``nn.DataParallel`` with a
custom ``Scatterable`` protocol so Camera survives the scatter
(reference: torchutils.py:111-170, SURVEY.md §2.11). On TPU this collapses
into ``jax.sharding``: Camera/Observation are pytrees, so a ``NamedSharding``
on the batch axis shards them for free over ICI, and XLA inserts the
collectives.

Axes:
- ``data``: training batch (data parallel; gradients psum over ICI)
- ``hypothesis``: pose hypotheses at inference (embarrassingly parallel; the
  north-star "pose hypotheses/sec/chip" axis)
"""
from __future__ import annotations

from contextlib import contextmanager
from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
HYPOTHESIS_AXIS = "hypothesis"


def make_mesh(n_devices: Optional[int] = None, axis_name: str = DATA_AXIS,
              devices: Optional[Sequence] = None) -> Mesh:
    """1-D device mesh over the given axis.

    Raises if fewer than ``n_devices`` devices are available — a silently
    truncated mesh would let multi-chip validation pass vacuously on a
    single-device backend.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise RuntimeError(
                f"make_mesh: requested {n_devices} devices but only "
                f"{len(devices)} available on backend "
                f"'{jax.default_backend()}' — refusing to build a degraded "
                f"mesh. For a virtual mesh, force the CPU platform with "
                f"jax.config.update('jax_platforms', 'cpu') and "
                f"XLA_FLAGS=--xla_force_host_platform_device_count=N before "
                f"any backend initialization (see tests/conftest.py).")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: Optional[str] = None) -> NamedSharding:
    """Shard the leading (batch/hypothesis) axis of every leaf."""
    axis_name = axis_name or mesh.axis_names[0]
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(tree, mesh: Mesh, axis_name: Optional[str] = None):
    """Device-put a pytree with the leading axis sharded across the mesh.

    Works on Camera/Observation directly (they are pytrees).
    """
    sharding = batch_sharding(mesh, axis_name)
    return jax.device_put(tree, sharding)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


@contextmanager
def use_mesh(mesh: Mesh):
    with mesh:
        yield mesh
