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
    """Append-only JSONL event writer + optional console echo."""

    def __init__(self, out_dir: str | None, echo: bool = True,
                 filename: str = "metrics.jsonl"):
        self.path = None
        self.echo = echo
        self._fh = None
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
            self.path = os.path.join(out_dir, filename)
            self._fh = open(self.path, "a")

    def write(self, event: dict):
        event = {"time": time.time(), **event}
        if self._fh:
            self._fh.write(json.dumps(event) + "\n")
            self._fh.flush()
        if self.echo:
            keys = [f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                    for k, v in event.items() if k != "time"]
            print("[metrics] " + " ".join(keys), file=sys.stderr)

    def close(self):
        if self._fh:
            self._fh.close()
