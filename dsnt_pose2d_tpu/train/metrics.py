"""Metrics/telemetry: meters + JSONL sink + console tables.

Replaces the reference's ``tele`` meter registry and Showoff HTTP dashboard
(SURVEY.md C14) with a structured JSONL event stream (machine-readable, easy
to tail or plot) plus per-epoch console tables.  Skeleton-render hooks live in
``utils/visualization.py``.
"""

from __future__ import annotations

import json
import os
import sys
import time


class MeanMeter:
    """Running mean (reference ``MeanValueMeter`` surface)."""

    def __init__(self):
        self.sum = 0.0
        self.n = 0

    def add(self, value, n: int = 1):
        self.sum += float(value) * n
        self.n += n

    @property
    def value(self) -> float:
        return self.sum / max(self.n, 1)

    def reset(self):
        self.sum, self.n = 0.0, 0


class TimeMeter:
    def __init__(self):
        self.start = time.time()

    def elapsed(self) -> float:
        return time.time() - self.start

    def reset(self):
        self.start = time.time()


class MetricWriter:
    """Append-only JSONL event writer + optional console echo + TensorBoard.

    With ``tensorboard=True`` scalar events are mirrored to TB event files
    under ``<out_dir>/tb`` (flax SummaryWriter; the SURVEY section 5 metrics
    plan's "JSONL + TensorBoard-style writer").  Step-level events are tagged
    ``train/<name>`` and indexed by the global step; epoch-level events
    (those without a ``step`` key, i.e. the per-epoch summaries) are indexed
    by epoch, with ``val_*`` metrics tagged under ``val/`` and the rest under
    ``epoch/`` so step- and epoch-indexed points never share an x-axis.
    Booleans and other non-numeric values are JSONL-only.
    """

    def __init__(self, out_dir: str | None, echo: bool = True,
                 filename: str = "metrics.jsonl", tensorboard: bool = False):
        self.path = None
        self.echo = echo
        self._fh = None
        self._tb = None
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            self.path = os.path.join(out_dir, filename)
            self._fh = open(self.path, "a")
            if tensorboard:
                try:
                    from flax.metrics.tensorboard import SummaryWriter

                    self._tb = SummaryWriter(os.path.join(out_dir, "tb"))
                except Exception as e:  # pragma: no cover - env without TB
                    print(f"[metrics] tensorboard unavailable: {e}",
                          file=sys.stderr)

    def write(self, event: dict):
        event = {"time": time.time(), **event}
        if self._fh:
            self._fh.write(json.dumps(event) + "\n")
            self._fh.flush()
        if self._tb is not None:
            step_level = "step" in event
            idx = int(event.get("step", event.get("epoch", 0)))
            for k, v in event.items():
                if k in ("time", "step", "epoch"):
                    continue
                # bool is an int subclass: flag fields stay JSONL-only.
                if isinstance(v, bool) or not isinstance(v, (int, float)):
                    continue
                if step_level:
                    tag = f"train/{k}"
                elif k.startswith("val_"):
                    tag = f"val/{k[4:]}"
                else:
                    tag = f"epoch/{k}"
                self._tb.scalar(tag, float(v), idx)
            self._tb.flush()
        if self.echo:
            keys = [f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                    for k, v in event.items() if k != "time"]
            print("[metrics] " + " ".join(keys), file=sys.stderr)

    def image(self, tag: str, img, step: int = 0):
        """Log an (H, W, 3) float/uint8 image to TensorBoard (no-op without)."""
        if self._tb is not None:
            self._tb.image(tag, img, step)
            self._tb.flush()

    def close(self):
        if self._fh:
            self._fh.close()
        if self._tb is not None:
            self._tb.close()
