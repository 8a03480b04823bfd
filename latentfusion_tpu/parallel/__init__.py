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
- ``fsdp``: parameter/optimizer-state sharding (ZeRO-3 style) on a 2-D
  ``data x fsdp`` mesh — XLA's GSPMD partitioner inserts the
  all-gathers (params, forward) and reduce-scatters (grads, backward)
  from the shardings alone; no hand-written collectives.
"""
from __future__ import annotations

from contextlib import contextmanager
from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
HYPOTHESIS_AXIS = "hypothesis"
FSDP_AXIS = "fsdp"
MODEL_AXIS = "model"


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


def make_mesh_2d(n_data: int, n_fsdp: int,
                 devices: Optional[Sequence] = None) -> Mesh:
    """2-D ``data x fsdp`` mesh for sharded-parameter training.

    The batch shards over ``data`` (outer axis — on a real slice this maps
    to the slower interconnect dimension) and parameters/optimizer state
    shard over ``fsdp``. Raises on insufficient devices like ``make_mesh``.
    """
    n = n_data * n_fsdp
    if devices is None:
        devices = jax.devices()
    if len(devices) < n:
        raise RuntimeError(
            f"make_mesh_2d: requested {n_data}x{n_fsdp}={n} devices but only "
            f"{len(devices)} available on backend "
            f"'{jax.default_backend()}' — refusing to build a degraded mesh.")
    grid = np.asarray(devices[:n]).reshape(n_data, n_fsdp)
    return Mesh(grid, (DATA_AXIS, FSDP_AXIS))


def fsdp_spec(shape: Sequence[int], n_fsdp: int,
              axis_name: str = FSDP_AXIS,
              min_leaf_size: int = 2 ** 12) -> P:
    """PartitionSpec sharding the largest dim divisible by ``n_fsdp``.

    Leaves smaller than ``min_leaf_size`` elements (biases, norm gains) or
    with no evenly-divisible dim stay replicated — sharding them would cost
    more in collective latency than the bytes saved.
    """
    size = int(np.prod(shape)) if len(shape) else 1
    if size < min_leaf_size:
        return P()
    best = None
    for i, d in enumerate(shape):
        if d % n_fsdp == 0 and (best is None or d > shape[best]):
            best = i
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = axis_name
    return P(*spec)


def fsdp_shardings(tree, mesh: Mesh, axis_name: str = FSDP_AXIS,
                   min_leaf_size: int = 2 ** 12):
    """Per-leaf NamedShardings for a parameter / optimizer-state pytree.

    Scalars and small leaves come out replicated; everything else shards its
    largest ``n_fsdp``-divisible dim. The same function applies to optimizer
    state (adam mu/nu mirror the parameter shapes; counts are scalars).
    """
    n_fsdp = mesh.shape[axis_name]
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(
            mesh, fsdp_spec(jnp_shape(x), n_fsdp, axis_name, min_leaf_size)),
        tree)


def jnp_shape(x) -> tuple:
    return tuple(getattr(x, "shape", ()))


def shard_fsdp(tree, mesh: Mesh, axis_name: str = FSDP_AXIS,
               min_leaf_size: int = 2 ** 12):
    """Device-put a state pytree with per-leaf FSDP shardings."""
    shardings = fsdp_shardings(tree, mesh, axis_name, min_leaf_size)
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)


def tp_spec(shape: Sequence[int], n_model: int,
            axis_name: str = MODEL_AXIS,
            min_leaf_size: int = 2 ** 12) -> P:
    """Tensor-parallel PartitionSpec: shard the OUT-channel dim (dim 0).

    Conv/linear weights here are ``(out_ch, in_ch, *k)`` (torch layout for
    checkpoint parity), so sharding dim 0 makes every layer's activations
    channel-sharded; GSPMD inserts the partial-sum all-reduces where a
    following contraction needs them. Heads with few channels (depth/mask,
    out_ch 1-4) and small leaves stay replicated.
    """
    size = int(np.prod(shape)) if len(shape) else 1
    if size < min_leaf_size or not shape or shape[0] % n_model != 0:
        return P()
    return P(axis_name)


def tp_shardings(tree, mesh: Mesh, axis_name: str = MODEL_AXIS,
                 min_leaf_size: int = 2 ** 12):
    """Per-leaf tensor-parallel NamedShardings for a parameter pytree.

    Use with a 1-D ``model`` mesh (``make_mesh(n, MODEL_AXIS)``) to cut
    single-object decode latency across chips — the serving axis, where
    there is no hypothesis batch to shard.
    """
    n_model = mesh.shape[axis_name]
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(
            mesh, tp_spec(jnp_shape(x), n_model, axis_name, min_leaf_size)),
        tree)


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
