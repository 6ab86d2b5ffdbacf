"""MPII dataset: annotations + images -> fixed-shape host canvases.

Reference: ``MPIIDataset`` in ``dsnt/data.py`` (SURVEY.md C10) — HDF5
annotations in the stacked-hourglass/Tompson train/val split (per sample:
image name, person center, scale, 16 joint (x, y), visibility, head length)
plus JPEG images.  TPU-first redesign: the host does only decode + one
fixed-size person-region resize (the *canvas*); every augmentation and
normalization step runs on device (:mod:`dsnt_pose2d_tpu.data.augment`).

Canvas construction: a square of side ``canvas_margin * scale * 200`` px
around the person center is resampled to ``canvas_size`` px.  The margin
leaves headroom so train-time rotation/zoom-out never reads outside the
canvas.  The affine ``canvas_from_orig`` is recorded per sample so
predictions map back to original-image pixels exactly.

Annotation layout accepted (``annot/<split>.h5`` or a single ``annot.h5``
with per-split groups): datasets ``imgname`` (bytes), ``center`` (N, 2),
``scale`` (N,), ``part`` (N, 16, 2), ``visible`` (N, 16), ``normalize``
(N,) — the layout published with the stacked-hourglass lineage tooling.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from .transforms import MPII_SCALE_BOX_PX

TRAIN, VAL, TEST = "train", "val", "test"


@dataclass
class MPIIAnnotations:
    imgnames: list[str]
    centers: np.ndarray      # (N, 2)
    scales: np.ndarray       # (N,)
    parts: np.ndarray        # (N, 16, 2) original-image px, (x, y)
    visible: np.ndarray      # (N, 16)
    head_lengths: np.ndarray  # (N,)
    # Provenance stamped by data.prepare ('' for externally-built files):
    # 'val-list:<file>' (Tompson-comparable) or 'hash-holdout:<frac>'.
    split_method: str = ""

    def __len__(self):
        return len(self.imgnames)


def load_annotations(data_dir: str, subset: str) -> MPIIAnnotations:
    import h5py

    candidates = [
        os.path.join(data_dir, "annot", f"{subset}.h5"),
        os.path.join(data_dir, f"{subset}.h5"),
        os.path.join(data_dir, "annot.h5"),
    ]
    path = next((p for p in candidates if os.path.exists(p)), None)
    if path is None:
        raise FileNotFoundError(
            f"no MPII annotations for subset {subset!r} under {data_dir!r} "
            f"(tried {candidates})")
    with h5py.File(path, "r") as f:
        g = f[subset] if subset in f else f
        imgnames = [
            n.decode() if isinstance(n, bytes) else str(n)
            for n in np.asarray(g["imgname"])
        ]
        centers = np.asarray(g["center"], np.float32)
        scales = np.asarray(g["scale"], np.float32).reshape(-1)
        parts = np.asarray(g["part"], np.float32)
        visible = np.asarray(g["visible"], np.float32) if "visible" in g else \
            np.ones(parts.shape[:2], np.float32)
        head = np.asarray(g["normalize"], np.float32).reshape(-1) if "normalize" in g \
            else np.full((len(imgnames),), 60.0, np.float32)
        split_method = str(f.attrs.get("split_method", ""))
    return MPIIAnnotations(imgnames, centers, scales, parts, visible, head,
                           split_method)


class MPIIDataset:
    """Host-side MPII sample producer (decode + canvas resize only).

    ``__getitem__`` returns the canvas record consumed by
    :func:`dsnt_pose2d_tpu.data.augment.preprocess_batch`.
    """

    def __init__(self, data_dir: str, subset: str = TRAIN,
                 canvas_size: int = 384, canvas_margin: float = 1.5,
                 use_native: bool | None = None):
        self.data_dir = data_dir
        self.subset = subset
        self.canvas_size = canvas_size
        self.canvas_margin = canvas_margin
        self.annot = load_annotations(data_dir, subset)
        self.images_dir = os.path.join(data_dir, "images")
        self._native_pref = use_native

    def _use_native(self) -> bool:
        if self._native_pref is not None:
            return self._native_pref
        # PIL is the measured default: on this class of host the C++ decoder
        # is ~10% slower single-threaded (52.5 vs 45.9 img/s/core at every
        # workers setting on a 1-core host, docs/DESIGN.md section 5), and
        # the packed/resident path makes decode a pack-time-only cost anyway.
        # Opt in explicitly (use_native=True or DSNT_NATIVE_DECODE=1) on
        # multi-core hosts where GIL-free thread scaling can pay.
        if os.environ.get("DSNT_NATIVE_DECODE", "") not in ("", "0"):
            from .. import native

            return native.available()
        return False

    def __len__(self):
        return len(self.annot)

    def __getitem__(self, i: int) -> dict:
        a = self.annot
        path = os.path.join(self.images_dir, a.imgnames[i])
        cx, cy = a.centers[i]
        box = float(a.scales[i]) * MPII_SCALE_BOX_PX * self.canvas_margin
        half = box / 2.0
        left, top, side = float(cx - half), float(cy - half), float(box)

        canvas = None
        if self._use_native():
            from .. import native

            try:
                with open(path, "rb") as f:
                    canvas = native.decode_crop_resize(
                        f.read(), left, top, side, self.canvas_size)
            except ValueError:
                canvas = None  # non-JPEG or corrupt: PIL fallback below
        if canvas is None:
            from PIL import Image

            img = Image.open(path).convert("RGB")
            li, ti, si = int(round(left)), int(round(top)), int(round(side))
            crop = img.crop((li, ti, li + si, ti + si))
            crop = crop.resize((self.canvas_size, self.canvas_size),
                               Image.BILINEAR)
            canvas = np.asarray(crop, np.uint8)
            left, top, side = float(li), float(ti), float(si)

        # Pixel-center affine of the crop/resize: output pixel ox samples
        # input x = left + (ox + 0.5) * side/S - 0.5, hence
        # x_canvas = s * x_orig + (0.5 * s - 0.5 - left * s),  s = S / side.
        s = self.canvas_size / side
        tx = 0.5 * s - 0.5 - left * s
        ty = 0.5 * s - 0.5 - top * s
        canvas_from_orig = np.asarray(
            [[s, 0, tx], [0, s, ty], [0, 0, 1]], np.float32)
        parts_canvas = a.parts[i] * s + np.asarray([tx, ty], np.float32)
        # Unannotated joints are stored as (0, 0) or negatives in the h5;
        # their visibility flag already masks them.
        return {
            "canvases": canvas,
            "coords_px": parts_canvas.astype(np.float32),
            "mask": a.visible[i].astype(np.float32),
            "head_length": np.float32(a.head_lengths[i]),
            "canvas_from_orig": canvas_from_orig,
            # The person box (scale*200 px) occupies the central
            # 1/canvas_margin of the canvas; the device crop maps THAT box
            # (not the whole canvas) to the model input at scale_aug = 1.
            "canvas_margin": np.float32(self.canvas_margin),
        }


class ArrayDataset:
    """In-memory dict-of-arrays dataset (synthetic fixture or packed MPII)."""

    def __init__(self, arrays: dict):
        self.arrays = arrays
        self._n = len(next(iter(arrays.values())))

    def __len__(self):
        return self._n

    def __getitem__(self, i: int) -> dict:
        return {k: v[i] for k, v in self.arrays.items()}
