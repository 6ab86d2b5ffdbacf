"""Device mesh + sharding helpers: the framework's data-parallel backbone.

The reference has NO distributed story (single ``.cuda()`` device; SURVEY.md
section 2 "Parallelism inventory").  The TPU-native design makes data
parallelism first-class and everything else a config-away extension:

- a 1-D ``data`` mesh over all chips (ICI); gradients all-reduce implicitly
  under ``jit`` via sharding propagation — no hand-written collectives;
- batches are sharded along ``data``; params/opt-state are replicated;
- multi-host: ``jax.distributed.initialize()`` + per-host input sharding
  (:mod:`dsnt_pose2d_tpu.data.loader`) + ``jax.make_array_from_process_local_data``
  to assemble the global batch from host-local shards;
- a ``model`` axis carries tensor parallelism (:mod:`dsnt_pose2d_tpu.
  parallel.tp`): conv/dense kernels column-sharded over ``model``, XLA
  emitting the collectives.  Off by default (``model_parallel=1``) — the
  largest reference model, hg8 at ~26M params, fits trivially per chip, so
  TP is a scaling valve for larger-than-chip futures, not a win here.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(num_devices: int | None = None, model_parallel: int = 1,
              devices=None) -> Mesh:
    """Build the (data[, model]) mesh over the given/available devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def check_row_order(mesh: Mesh) -> None:
    """Verify the global-batch row-layout invariant used by predict().

    :func:`shard_batch` assembles the global batch with rows laid out in the
    mesh's device order; code that maps global rows back to per-host dataset
    indices (``ShardedLoader.global_index_batches``) assumes that order
    visits devices grouped by process, in ascending process index — true for
    the standard ``jax.devices()`` ordering.  Raise early on an exotic mesh
    rather than silently permuting predictions.
    """
    procs = [d.process_index for d in mesh.devices.flat]
    if procs != sorted(procs):
        raise ValueError(
            "mesh device order interleaves processes; global-batch rows "
            "would not be host-contiguous (reorder mesh devices by "
            "process_index)")


def shard_batch(mesh: Mesh, batch: dict):
    """Place a dict of host-global numpy arrays onto the mesh, batch-sharded.

    Single-process: a plain sharded ``device_put``.  Multi-process: each host
    passes its LOCAL shard and the global array is assembled across hosts.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(batch, sharding)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch)


def super_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a stacked k-step super-batch: axis 0 = step (replicated),
    axis 1 = global batch (sharded over ``data``)."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def shard_super_batch(mesh: Mesh, super_batch: dict):
    """Place a dict of (k, local_batch, ...) numpy stacks onto the mesh.

    The async ``device_put`` means calling this one dispatch group ahead
    overlaps the H2D transfer with the current group's compute (the
    ``steps_per_dispatch`` analogue of :func:`~dsnt_pose2d_tpu.data.loader.
    prefetch_to_device`).
    """
    sharding = super_batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.device_put(super_batch, sharding)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        super_batch)


_COORDINATOR_ENV_VARS = (
    # Set by multi-host launchers; their presence means THIS process is part
    # of a multi-process run and a failed bootstrap must be fatal.
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
)


def _multihost_env_configured() -> bool:
    import os

    return any(os.environ.get(v) for v in _COORDINATOR_ENV_VARS)


def initialize_distributed():
    """Multi-host bootstrap (no-op single-host); call before device queries.

    On a plain single-process run ``jax.distributed.initialize()`` raises
    (no coordinator to find) and we proceed single-process.  But when a
    coordinator env var IS set, this process belongs to a multi-host launch:
    swallowing the failure would silently degrade the job to N independent
    single-process runs that each think they're fine — re-raise instead.
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize()
    except Exception:
        if _multihost_env_configured():
            raise
        # single-process / local run
