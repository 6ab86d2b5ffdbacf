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
    for _, device_batch in prefetch_pairs(batch_iter, mesh, depth):
        yield device_batch


def prefetch_pairs(batch_iter, mesh, depth: int = 2):
    """Like :func:`prefetch_to_device` but yields ``(host, device)`` pairs.

    The eval path needs the host-side numpy batch too (sample rendering,
    index bookkeeping), so it can't use the device-only prefetcher; this
    keeps the same H2D/compute overlap while retaining the raw batch.
    """
    from collections import deque

    from ..parallel.mesh import shard_batch

    queue_: deque = deque()
    for batch in batch_iter:
        queue_.append((batch, shard_batch(mesh, batch)))
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
        if self.drop_last:
            return (len(self.dataset) // self.num_hosts) // self.local_batch_size
        per_host = -(-len(self.dataset) // self.num_hosts)
        return -(-per_host // self.local_batch_size)

    def _epoch_indices(self, epoch: int):
        return self._epoch_indices_for(epoch, self.host_id)

    def _epoch_indices_for(self, epoch: int, host_id: int):
        """(dataset indices, valid mask) for one host's epoch stream.

        Hosts must enumerate EQUAL-length streams (unequal counts would
        dispatch different numbers of collective steps and hang a multi-host
        run).  With ``drop_last`` the permutation is truncated to a common
        per-host length (training: the few dropped samples rotate with the
        per-epoch shuffle).  Without it (eval/infer) the stream is instead
        padded UP by repeating the final index so EVERY sample is seen;
        pad entries are marked invalid and their ``mask`` is zeroed, keeping
        metrics exact.
        """
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng((self.seed, epoch))
            perm = rng.permutation(n)
        else:
            perm = np.arange(n)
        if self.drop_last:
            n_even = (n // self.num_hosts) * self.num_hosts
            idx = perm[:n_even][host_id::self.num_hosts]
            return idx, np.ones(len(idx), bool)
        n_pad = -(-n // self.num_hosts) * self.num_hosts
        if n_pad > n:
            perm = np.concatenate([perm, np.repeat(perm[-1:], n_pad - n)])
        pos = np.arange(host_id, n_pad, self.num_hosts)
        return perm[pos], pos < n

    def global_index_batches(self, epoch: int = 0) -> list[np.ndarray]:
        """Dataset indices for each GLOBAL batch; -1 marks pad rows.

        Row layout matches :func:`dsnt_pose2d_tpu.parallel.mesh.shard_batch`'s
        global assembly — hosts' local rows concatenated in process order
        (see ``mesh.check_row_order``) — so callers can scatter per-batch
        global outputs back into dataset order (EvalDriver.predict).
        """
        streams = [self._epoch_indices_for(epoch, h)
                   for h in range(self.num_hosts)]
        bs = self.local_batch_size
        out = []
        for step in range(self.steps_per_epoch):
            rows = []
            for idx, valid in streams:
                chunk = idx[step * bs:(step + 1) * bs]
                vch = valid[step * bs:(step + 1) * bs]
                g = np.where(vch, chunk, -1)
                pad = bs - len(chunk)
                if pad:
                    g = np.concatenate([g, np.full(pad, -1, g.dtype)])
                rows.append(g)
            out.append(np.concatenate(rows))
        return out

    def epoch(self, epoch: int, start_step: int = 0):
        """Yield host-local collated numpy batches for one epoch.

        With ``drop_last=False`` the final short batch is padded to the full
        (static) batch size by repeating samples whose ``mask`` is zeroed, so
        jitted shapes stay constant and metrics stay exact.
        """
        idx, valid = self._epoch_indices(epoch)
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
                    invalid = np.concatenate(
                        [~valid[s:s + bs], np.ones(pad, bool)])
                    if invalid.any() and "mask" in batch:
                        batch["mask"] = batch["mask"].copy()
                        batch["mask"][invalid] = 0.0
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
