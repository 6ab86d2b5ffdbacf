"""Device-resident dataset: the packed split staged in HBM, sharded over chips.

The streaming input path (mmap -> collate -> H2D -> step) is bounded by the
host->device transport: a 16-sample batch of 384px uint8 canvases is ~7 MB
per step, which on PCIe is negligible but on any slower transport (or at
much higher step rates) caps end-to-end throughput well below the device
step.  The TPU-idiomatic fix for a dataset this size (full MPII train at
384px is ~11 GB; a v5e chip has 16 GB of HBM) is to not stream at all:

- **stage once**: every sample array (uint8 canvases + float meta) is
  ``device_put`` ONCE, sharded along the sample axis over the ``data`` mesh
  axis — each chip holds ``1/D`` of the split in HBM;
- **gather per step**: the train step receives a (B,) vector of shard-local
  row offsets (64 bytes of H2D instead of 7 MB) and gathers its batch from
  the resident shard inside the jitted step (``shard_map``; HBM->HBM, ~µs);
  augmentation already runs on device, so nothing else changes;
- **shard-local sampling**: each device draws its per-epoch permutation from
  its own shard (pure function of ``(seed, epoch, shard)`` — deterministic,
  exactly resumable mid-epoch, like the streaming loader).  This is the
  standard shard-then-shuffle approximation of a global shuffle: rows are
  statically partitioned, orders are reshuffled every epoch.  The streaming
  loader keeps the reference's global-permutation semantics for runs that
  need them (``--device-resident off``).

Reference counterpart: none — the reference re-reads and re-decodes JPEGs in
DataLoader worker processes every epoch (SURVEY.md section 3.5).
"""

from __future__ import annotations

import os

import numpy as np

DEFAULT_BUDGET_BYTES = 11 << 30  # per-device cap for 'auto' (v5e: 16 GB HBM)


def resident_budget_bytes(mesh=None) -> int:
    """Per-device HBM budget for the 'auto' residency decision.

    Priority: ``DSNT_RESIDENT_BUDGET_BYTES`` env override; else 70% of the
    device's reported HBM limit (``memory_stats``, unavailable on some
    transports); else :data:`DEFAULT_BUDGET_BYTES` (sized for a 16 GB v5e:
    11 GiB staged data leaves ~5 GiB for params/opt/activations at the
    flagship hg8 batch-16 shape).
    """
    env = os.environ.get("DSNT_RESIDENT_BUDGET_BYTES")
    if env is not None:
        return int(env)
    try:
        import jax

        devs = list(mesh.devices.flat) if mesh is not None else \
            jax.local_devices()
        stats = devs[0].memory_stats()
        limit = stats.get("bytes_limit", 0) if stats else 0
        if limit > 0:
            return int(limit * 0.7)
    except Exception:
        pass
    return DEFAULT_BUDGET_BYTES


def resident_arrays(dataset) -> dict | None:
    """The dataset's full dict-of-arrays view, or None if unsupported.

    Supported sources are array-backed (``ArrayDataset``) or packed-mmap
    (``PackedDataset``) — anything whose per-sample dict is a row slice of
    whole-split arrays.  Decode-per-sample datasets (raw ``MPIIDataset``)
    stream; pack first (``python -m dsnt_pose2d_tpu.data.pack``) to go
    resident.
    """
    if hasattr(dataset, "arrays"):  # ArrayDataset
        return dict(dataset.arrays)
    if hasattr(dataset, "canvases") and hasattr(dataset, "meta"):
        return {"canvases": dataset.canvases, **dataset.meta}
    return None


def resident_nbytes(dataset) -> int:
    arrays = resident_arrays(dataset)
    return sum(a.nbytes for a in arrays.values()) if arrays else 0


def resident_fits(dataset, mesh, extra_nbytes: int = 0) -> bool:
    """'auto' fit check: per-device resident bytes within the HBM budget.

    ``extra_nbytes`` accounts for split(s) ALREADY staged resident (e.g. the
    train split when deciding whether the val split also fits).
    """
    arrays = resident_arrays(dataset)
    if arrays is None:
        return False
    d = mesh.shape.get("data", 1)
    budget = resident_budget_bytes(mesh)
    return (resident_nbytes(dataset) + extra_nbytes) // max(d, 1) <= budget


def _stage_strided(arrays: dict, mesh, n: int, d: int):
    """Stage whole-split arrays in HBM under the strided shard layout.

    Shard ``s`` holds dataset rows ``{s, s+d, s+2d, ...}`` — balanced to
    within one row for any ``n`` and matching the streaming loader's
    cross-host interleave.  Shards are padded to equal length by repeating
    their last valid row.  Returns ``(resident dict, rows_per_shard,
    shard_valid)`` where ``shard_valid[s]`` is the number of real (non-pad)
    rows in shard ``s``.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    rps = -(-n // d)  # ceil
    valid = (n - np.arange(d) + d - 1) // d
    n_pad = rps * d

    def staged(arr):
        def shard_of(index):
            sl = index[0]
            start = sl.start or 0
            stop = sl.stop if sl.stop is not None else n_pad
            g = np.arange(start, stop)
            shard, local = g // rps, g % rps
            rows = np.minimum(local, valid[shard] - 1) * d + shard
            return np.asarray(arr[rows])

        return jax.make_array_from_callback(
            (n_pad,) + arr.shape[1:],
            NamedSharding(mesh, P(DATA_AXIS, *([None] * (arr.ndim - 1)))),
            shard_of)

    return {k: staged(a) for k, a in arrays.items()}, rps, valid


def _put_sharded(mesh, host_arr: np.ndarray):
    """Stage a global (B,) / (k, B) host array, batch-axis sharded."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    spec = (P(DATA_AXIS) if host_arr.ndim == 1 else P(None, DATA_AXIS))
    return jax.make_array_from_callback(
        host_arr.shape, NamedSharding(mesh, spec),
        lambda index: host_arr[index])


class ResidentTrainData:
    """Epoch-index iterator + HBM-resident arrays for the train loop.

    Mirrors the ``ShardedLoader`` surface the :class:`~dsnt_pose2d_tpu.train.
    loop.Trainer` consumes (``steps_per_epoch``, ``local_batch_size``,
    ``epoch(epoch, start_step)``) but yields tiny device-resident index
    vectors instead of host batches; the batches themselves are gathered
    on device by the resident train step.
    """

    def __init__(self, dataset, global_batch_size: int, mesh, *, seed: int = 0):
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        arrays = resident_arrays(dataset)
        if arrays is None:
            raise ValueError(
                "dataset is not array-backed; pack it first or use the "
                "streaming loader")
        self.mesh = mesh
        self.seed = seed
        n = len(dataset)
        d = mesh.shape.get("data", 1)
        if global_batch_size % d:
            raise ValueError(
                f"global batch {global_batch_size} not divisible by "
                f"data-axis size {d}")
        if n < d:
            raise ValueError(f"dataset ({n}) smaller than data axis ({d})")
        self.num_shards = d
        self.global_batch_size = global_batch_size
        self.shard_batch_size = global_batch_size // d
        self.local_batch_size = global_batch_size // jax.process_count()
        self.resident, self.rows_per_shard, self.shard_valid = \
            _stage_strided(arrays, mesh, n, d)
        self.steps_per_epoch = int(self.shard_valid.min()) // self.shard_batch_size
        if self.steps_per_epoch < 1:
            raise ValueError(
                f"shards of {int(self.shard_valid.min())} valid rows cannot "
                f"fill a per-shard batch of {self.shard_batch_size}")
        self.nbytes = sum(a.nbytes for a in arrays.values())

    def dataset_row(self, shard: int, local: int) -> int:
        """Dataset row held at (shard, local-offset) under the strided layout."""
        return int(local) * self.num_shards + int(shard)

    # -- index streams ------------------------------------------------------

    def _shard_streams(self, epoch: int) -> np.ndarray:
        """(num_shards, steps*shard_batch) local row offsets for one epoch."""
        rows = self.steps_per_epoch * self.shard_batch_size
        out = np.empty((self.num_shards, rows), np.int32)
        for s in range(self.num_shards):
            rng = np.random.default_rng((self.seed, epoch, s))
            out[s] = rng.permutation(int(self.shard_valid[s]))[:rows]
        return out

    def _put_idx(self, host_idx: np.ndarray):
        """Stage a global (B,) / (k, B) index array, batch-axis sharded."""
        return _put_sharded(self.mesh, host_idx)

    def epoch(self, epoch: int, start_step: int = 0):
        """Yield per-step (B,) device index vectors (shard-local offsets)."""
        streams = self._shard_streams(epoch)
        bs = self.shard_batch_size
        for step in range(start_step, self.steps_per_epoch):
            host_idx = streams[:, step * bs:(step + 1) * bs].reshape(-1)
            yield self._put_idx(host_idx)

    def epoch_groups(self, epoch: int, k: int, start_step: int = 0):
        """Group the epoch stream into k-step (k, B) stacks for ``lax.scan``.

        Yields ``("multi", idx_kB)`` for full groups and ``("single", idx_B)``
        for the ragged tail — mirroring ``_prefetch_dispatch_groups``.
        """
        streams = self._shard_streams(epoch)
        bs = self.shard_batch_size
        step = start_step
        while step < self.steps_per_epoch:
            take = min(k, self.steps_per_epoch - step)
            block = streams[:, step * bs:(step + take) * bs]
            # (shards, take*bs) -> (take, shards*bs) global batch layout
            block = block.reshape(self.num_shards, take, bs)
            block = np.ascontiguousarray(
                np.transpose(block, (1, 0, 2))).reshape(take, -1)
            if take == k:
                yield "multi", self._put_idx(block)
            else:
                for i in range(take):
                    yield "single", self._put_idx(block[i])
            step += take


class ResidentEvalData:
    """HBM-resident val split + sequential full-coverage index stream.

    Counterpart of :class:`ResidentTrainData` for the Trainer's per-epoch
    eval pass.  The one-shot evaluate/infer CLIs gain nothing from residency
    (they pay the same one-time H2D either way), but IN-TRAINING eval
    re-streams the whole val split every epoch — on a slow host->device
    transport that costs more than the eval compute itself once the train
    path is resident.

    Coverage contract (mirrors the streaming loader's ``drop_last=False``
    semantics): every dataset row is evaluated exactly once.  The strided
    shard layout pads shards to equal length by repeating their last valid
    row, and the sequential stream pads the ragged final batch the same way;
    each yielded step therefore carries a (B,) ``valid`` vector alongside
    its (B,) shard-local offsets, and the resident eval step multiplies
    ``valid`` into the joint mask — masked loss denominators and PCKh counts
    then exclude pad rows exactly, so resident counts equal streaming counts
    row-for-row.
    """

    def __init__(self, dataset, global_batch_size: int, mesh):
        arrays = resident_arrays(dataset)
        if arrays is None:
            raise ValueError(
                "dataset is not array-backed; pack it first or use the "
                "streaming loader")
        self.mesh = mesh
        n = len(dataset)
        d = mesh.shape.get("data", 1)
        if global_batch_size % d:
            raise ValueError(
                f"global batch {global_batch_size} not divisible by "
                f"data-axis size {d}")
        if n < d:
            raise ValueError(f"dataset ({n}) smaller than data axis ({d})")
        self.num_shards = d
        self.global_batch_size = global_batch_size
        self.shard_batch_size = global_batch_size // d
        self.resident, self.rows_per_shard, self.shard_valid = \
            _stage_strided(arrays, mesh, n, d)
        self.steps_per_epoch = -(-self.rows_per_shard // self.shard_batch_size)
        self.nbytes = sum(a.nbytes for a in arrays.values())

    def _step_host_arrays(self, step: int):
        """Host-side (idx, valid) for one step, in global-batch layout.

        Global-batch layout matches the shard_map gather output: shard s's
        ``shard_batch_size`` rows occupy block s of the batch axis.
        """
        bs = self.shard_batch_size
        local = np.arange(step * bs, (step + 1) * bs)
        idx = np.minimum(local, self.rows_per_shard - 1)
        idx = np.broadcast_to(idx, (self.num_shards, bs))
        valid = local[None, :] < self.shard_valid[:, None]
        return (np.ascontiguousarray(idx).reshape(-1).astype(np.int32),
                valid.reshape(-1).astype(np.float32))

    def host_rows(self, step: int) -> np.ndarray:
        """DATASET row per global-batch position for one step (pads repeat
        their shard's last valid row) — for host-side sample rendering."""
        bs = self.shard_batch_size
        local = np.arange(step * bs, (step + 1) * bs)
        shard = np.repeat(np.arange(self.num_shards), bs)
        local = np.tile(local, self.num_shards)
        clamped = np.minimum(local, self.shard_valid[shard] - 1)
        return (clamped * self.num_shards + shard).astype(np.int64)

    def epoch(self):
        """Yield per-step device (idx, valid) pairs covering the split."""
        for step in range(self.steps_per_epoch):
            idx, valid = self._step_host_arrays(step)
            yield _put_sharded(self.mesh, idx), _put_sharded(self.mesh, valid)

    def epoch_stacked(self):
        """The WHOLE epoch's (idx, valid) as (steps, batch) device arrays.

        Input for the single-dispatch scan eval
        (``train.loop.make_resident_eval_scan``): the index stream is fixed
        per split, so one (S, B) upload (~KBs) replaces S per-step dispatches
        — on a high-latency transport the dispatch ISSUE cost (~1 s each over
        this image's tunnel) dominates an in-training eval pass.
        """
        pairs = [self._step_host_arrays(s) for s in range(self.steps_per_epoch)]
        idx = np.stack([p[0] for p in pairs])
        valid = np.stack([p[1] for p in pairs])
        return _put_sharded(self.mesh, idx), _put_sharded(self.mesh, valid)
