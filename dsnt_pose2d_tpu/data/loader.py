"""Per-host sharded, deterministic, prefetching batch loader.

Replaces the reference's ``DataLoader`` worker processes (SURVEY.md section 3.1
process boundary #1) with a TPU-idiomatic input path:

- **per-host input sharding**: in a multi-host run each host enumerates only
  its ``1/num_hosts`` slice of the (seeded, per-epoch permuted) index stream
  and feeds its local chip share of the global batch;
- **determinism / resume**: the permutation is a pure function of
  ``(seed, epoch)`` and the loader can start at any step offset, so a resumed
  run replays the exact data order (checkpoint stores ``(epoch, step)``);
- **prefetch**: a single background thread keeps a bounded queue of collated
  numpy batches ahead of the device (host work here is trivial by design —
  the heavy augmentation runs on device).
"""

from __future__ import annotations

import queue
import threading

import numpy as np


def _collate(samples: list[dict]) -> dict:
    out = {}
    for k in samples[0]:
        out[k] = np.stack([s[k] for s in samples])
    return out


def prefetch_to_device(batch_iter, mesh, depth: int = 2):
    """Keep ``depth`` batches resident on device ahead of the consumer.

    ``device_put`` is async, so eagerly placing the next batch overlaps its
    H2D transfer with the current step's compute — the TPU equivalent of the
    reference's pinned-memory prefetch, without worker processes.
    """
    from collections import deque

    from ..parallel.mesh import shard_batch

    queue_: deque = deque()
    for batch in batch_iter:
        queue_.append(shard_batch(mesh, batch))
        if len(queue_) > depth:
            yield queue_.popleft()
    while queue_:
        yield queue_.popleft()


class ShardedLoader:
    def __init__(self, dataset, global_batch_size: int, *, shuffle: bool,
                 seed: int = 0, num_hosts: int = 1, host_id: int = 0,
                 drop_last: bool = True, prefetch: int = 2, workers: int = 1):
        if global_batch_size % num_hosts:
            raise ValueError("global batch size must divide across hosts")
        self.dataset = dataset
        self.global_batch_size = global_batch_size
        self.local_batch_size = global_batch_size // num_hosts
        self.shuffle = shuffle
        self.seed = seed
        self.num_hosts = num_hosts
        self.host_id = host_id
        self.drop_last = drop_last
        self.prefetch = prefetch
        # Sample-fetch thread pool: the hot path (native JPEG decode + crop)
        # releases the GIL, so threads scale across host cores without the
        # reference's fork/IPC worker processes.
        self.workers = max(1, workers)

    @property
    def steps_per_epoch(self) -> int:
        n = len(self.dataset) // self.num_hosts
        if self.drop_last:
            return n // self.local_batch_size
        return -(-n // self.local_batch_size)

    def _epoch_indices(self, epoch: int) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, epoch))
            perm = rng.permutation(n)
        else:
            perm = np.arange(n)
        # Truncate to a common per-host length BEFORE slicing: with
        # n % num_hosts != 0 a raw strided slice gives hosts unequal sample
        # counts, so hosts would dispatch different numbers of collective
        # steps per epoch and a multi-host run would hang on the extras.
        n_even = (n // self.num_hosts) * self.num_hosts
        return perm[:n_even][self.host_id::self.num_hosts]

    def epoch(self, epoch: int, start_step: int = 0):
        """Yield host-local collated numpy batches for one epoch.

        With ``drop_last=False`` the final short batch is padded to the full
        (static) batch size by repeating samples whose ``mask`` is zeroed, so
        jitted shapes stay constant and metrics stay exact.
        """
        idx = self._epoch_indices(epoch)
        bs = self.local_batch_size
        starts = range(start_step * bs, len(idx) - (bs - 1 if self.drop_last else 0), bs)

        pool = None
        if self.workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(max_workers=self.workers)

        def fetch(indices):
            if pool is not None:
                return list(pool.map(self.dataset.__getitem__,
                                     [int(i) for i in indices]))
            return [self.dataset[int(i)] for i in indices]

        def produce(q: queue.Queue):
            try:
                for s in starts:
                    chunk = idx[s:s + bs]
                    pad = bs - len(chunk)
                    samples = fetch(chunk)
                    batch = _collate(samples + [samples[-1]] * pad)
                    if pad and "mask" in batch:
                        batch["mask"] = batch["mask"].copy()
                        batch["mask"][-pad:] = 0.0
                    q.put(batch)
                q.put(None)
            except BaseException as e:  # propagate to the consumer
                q.put(e)
            finally:
                if pool is not None:
                    pool.shutdown(wait=False)

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        t = threading.Thread(target=produce, args=(q,), daemon=True)
        t.start()
        while True:
            batch = q.get()
            if batch is None:
                break
            if isinstance(batch, BaseException):
                raise batch
            yield batch
