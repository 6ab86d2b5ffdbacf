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

DEFAULT_BUDGET_BYTES = 8 << 30  # per-device cap for 'auto' (v5e: 16 GB HBM)


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


def resident_fits(dataset, mesh) -> bool:
    """'auto' fit check: per-device resident bytes within the HBM budget."""
    arrays = resident_arrays(dataset)
    if arrays is None:
        return False
    d = mesh.shape.get("data", 1)
    budget = int(os.environ.get("DSNT_RESIDENT_BUDGET_BYTES",
                                DEFAULT_BUDGET_BYTES))
    return resident_nbytes(dataset) // max(d, 1) <= budget


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
        # Strided (round-robin) shard layout: shard s holds dataset rows
        # {s, s+d, s+2d, ...} — balanced to within one row for any n (a
        # contiguous block split can leave trailing shards empty), and the
        # same interleave the streaming loader uses across hosts.  Shards are
        # padded to equal length by repeating their last valid row; pad rows
        # are never sampled.
        self.rows_per_shard = -(-n // d)  # ceil
        self.shard_valid = (n - np.arange(d) + d - 1) // d
        self.steps_per_epoch = int(self.shard_valid.min()) // self.shard_batch_size
        if self.steps_per_epoch < 1:
            raise ValueError(
                f"shards of {int(self.shard_valid.min())} valid rows cannot "
                f"fill a per-shard batch of {self.shard_batch_size}")

        rps = self.rows_per_shard
        n_pad = rps * d
        valid = self.shard_valid

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

        self.resident = {k: staged(a) for k, a in arrays.items()}
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
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        spec = (P(DATA_AXIS) if host_idx.ndim == 1 else P(None, DATA_AXIS))
        return jax.make_array_from_callback(
            host_idx.shape, NamedSharding(self.mesh, spec),
            lambda index: host_idx[index])

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
