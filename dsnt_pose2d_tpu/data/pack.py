"""Pack an MPII split into a memory-mapped canvas archive.

Host JPEG decode is the end-to-end bottleneck for real-MPII training on small
hosts (the v5e chip consumes ~280 img/s while one CPU core decodes <1 img/s).
Packing precomputes every sample's fixed-size canvas ONCE:

    python -m dsnt_pose2d_tpu.data.pack --data-dir data/mpii --subset train

writes ``<data_dir>/packed/<subset>_canvases.npy`` (uint8, memory-mappable)
plus ``<subset>_meta.npz`` (coords/mask/head_length/affines/margin).  At train
time :class:`PackedDataset` serves samples by mmap slice — no decode, no
resize, just a page-cache read — and the loaders/augmentation are unchanged
(augmentation stays on device, so packing loses no randomness).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

CANVAS_FILE = "{subset}_canvases.npy"
META_FILE = "{subset}_meta.npz"


def pack_split(data_dir: str, subset: str, canvas_size: int = 384,
               canvas_margin: float = 1.5, out_dir: str | None = None,
               workers: int = 0) -> str:
    """Precompute all canvases for a split; returns the output directory."""
    from .mpii import MPIIDataset

    ds = MPIIDataset(data_dir, subset, canvas_size=canvas_size,
                     canvas_margin=canvas_margin)
    out_dir = out_dir or os.path.join(data_dir, "packed")
    os.makedirs(out_dir, exist_ok=True)
    n = len(ds)

    canvases = np.lib.format.open_memmap(
        os.path.join(out_dir, CANVAS_FILE.format(subset=subset)), mode="w+",
        dtype=np.uint8, shape=(n, canvas_size, canvas_size, 3))
    coords = np.zeros((n, 16, 2), np.float32)
    mask = np.zeros((n, 16), np.float32)
    head = np.zeros((n,), np.float32)
    affines = np.zeros((n, 3, 3), np.float32)
    margins = np.zeros((n,), np.float32)

    def fill(i):
        s = ds[i]
        canvases[i] = s["canvases"]
        coords[i] = s["coords_px"]
        mask[i] = s["mask"]
        head[i] = s["head_length"]
        affines[i] = s["canvas_from_orig"]
        margins[i] = s["canvas_margin"]

    if workers > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=workers) as pool:
            list(pool.map(fill, range(n)))
    else:
        for i in range(n):
            fill(i)

    canvases.flush()
    # Split provenance rides along so evaluate/infer on the packed path can
    # stamp PCKh tables / preds files (a hash-holdout split must not
    # circulate as Tompson-split-comparable).
    split_method = getattr(getattr(ds, "annot", None), "split_method", "")
    np.savez(os.path.join(out_dir, META_FILE.format(subset=subset)),
             coords_px=coords, mask=mask, head_length=head,
             canvas_from_orig=affines, canvas_margin=margins,
             split_method=np.array(split_method or ""))
    return out_dir


class PackedDataset:
    """mmap-backed canvas dataset: the zero-decode train-time reader."""

    def __init__(self, packed_dir: str, subset: str):
        self.canvases = np.load(
            os.path.join(packed_dir, CANVAS_FILE.format(subset=subset)),
            mmap_mode="r")
        meta = np.load(os.path.join(packed_dir, META_FILE.format(subset=subset)))
        self.meta = {k: meta[k] for k in meta.files}
        # "" for archives packed before provenance was recorded.
        self.split_method = str(self.meta.pop("split_method", ""))

    def __len__(self):
        return len(self.canvases)

    def __getitem__(self, i: int) -> dict:
        return {
            "canvases": np.asarray(self.canvases[i]),
            "coords_px": self.meta["coords_px"][i],
            "mask": self.meta["mask"][i],
            "head_length": self.meta["head_length"][i],
            "canvas_from_orig": self.meta["canvas_from_orig"][i],
            "canvas_margin": self.meta["canvas_margin"][i],
        }


class AutoPackDataset:
    """Pack-as-you-stream: capture every decoded sample into a packed archive.

    Fresh runs on a raw MPII layout pay the JPEG-decode streaming path (tens
    of img/s on a small host) for EVERY epoch unless the user remembers to
    run ``data.pack`` first.  This wrapper makes epoch 0 itself the pack
    pass: each ``__getitem__`` both returns the sample and writes it into an
    under-construction mmap archive (``*.building`` files, atomically
    renamed on :meth:`finalize`), so the trainer can hot-swap to the
    :class:`PackedDataset` — and, per ``device_resident``, into HBM
    residency — from epoch 1 on.

    Thread-safety: loader fetch threads write DISTINCT rows (same-row
    double-writes from tail padding are idempotent), and ``done`` is a
    per-row byte flag — no locking needed.
    """

    def __init__(self, inner, out_dir: str, subset: str = "train"):
        self.inner = inner
        self.out_dir = out_dir
        self.subset = subset
        os.makedirs(out_dir, exist_ok=True)
        n = len(inner)
        cs = int(inner.canvas_size)
        self._canvas_path = os.path.join(out_dir,
                                         CANVAS_FILE.format(subset=subset))
        self._meta_path = os.path.join(out_dir,
                                       META_FILE.format(subset=subset))
        self.canvases = np.lib.format.open_memmap(
            self._canvas_path + ".building", mode="w+", dtype=np.uint8,
            shape=(n, cs, cs, 3))
        self.coords = np.zeros((n, 16, 2), np.float32)
        self.mask = np.zeros((n, 16), np.float32)
        self.head = np.zeros((n,), np.float32)
        self.affines = np.zeros((n, 3, 3), np.float32)
        self.margins = np.zeros((n,), np.float32)
        self.done = np.zeros(n, np.uint8)

    # Split provenance must keep flowing through the wrapper (PCKh tables
    # stamp it — see cli.common.dataset_split_method).
    @property
    def annot(self):
        return getattr(self.inner, "annot", None)

    @property
    def split_method(self) -> str:
        return getattr(self.inner, "split_method", "")

    def __len__(self):
        return len(self.inner)

    def __getitem__(self, i: int) -> dict:
        s = self.inner[i]
        if not self.done[i]:
            self.canvases[i] = s["canvases"]
            self.coords[i] = s["coords_px"]
            self.mask[i] = s["mask"]
            self.head[i] = s["head_length"]
            self.affines[i] = s["canvas_from_orig"]
            self.margins[i] = s["canvas_margin"]
            self.done[i] = 1
        return s

    def finalize(self) -> str:
        """Fill rows the epoch never touched (drop_last tails), publish.

        Returns the packed directory, ready for :class:`PackedDataset`.
        """
        for i in np.flatnonzero(self.done == 0):
            self[int(i)]
        self.canvases.flush()
        annot = getattr(self.inner, "annot", None)
        split_method = (getattr(self.inner, "split_method", "")
                        or getattr(annot, "split_method", "") or "")
        np.savez(self._meta_path + ".building", coords_px=self.coords,
                 mask=self.mask, head_length=self.head,
                 canvas_from_orig=self.affines, canvas_margin=self.margins,
                 split_method=np.array(split_method))
        # np.savez appends .npz to a bare path; normalize before the rename.
        built_meta = self._meta_path + ".building.npz"
        os.rename(built_meta, self._meta_path)
        os.rename(self._canvas_path + ".building", self._canvas_path)
        return self.out_dir


def packed_available(data_dir: str, subset: str) -> bool:
    p = os.path.join(data_dir, "packed")
    return (os.path.exists(os.path.join(p, CANVAS_FILE.format(subset=subset)))
            and os.path.exists(os.path.join(p, META_FILE.format(subset=subset))))


def main(argv=None):
    p = argparse.ArgumentParser("dsnt-pose2d-tpu pack")
    p.add_argument("--data-dir", required=True)
    p.add_argument("--subset", default="train",
                   choices=["train", "val", "test"])
    p.add_argument("--canvas-size", type=int, default=384)
    p.add_argument("--canvas-margin", type=float, default=1.5)
    p.add_argument("--workers", type=int, default=0)
    args = p.parse_args(argv)
    out = pack_split(args.data_dir, args.subset, args.canvas_size,
                     args.canvas_margin, workers=args.workers)
    print(f"packed {args.subset} -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
