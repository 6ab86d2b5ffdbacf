"""Streaming-input-path study: where does the non-resident e2e gap come from?

Round-3 verdict item 5: streaming (mmap-packed -> loader threads -> H2D ->
step) ran at 16% of the device step while the resident path hit 91%.  The
hypothesis is a TRANSPORT-bound path: on this image the chip sits behind a
network tunnel, so per-step H2D of batch*canvas^2*3 uint8 bytes is paid at
tunnel bandwidth, not PCIe bandwidth.  This tool measures the pieces:

1. **Raw H2D bandwidth** — ``device_put`` of uint8 payloads at several sizes,
   two-point fetch-forced (same methodology as bench.py), giving MB/s and a
   per-size effective latency.
2. **Streaming e2e** at canvas {384, 320, 256} x prefetch depth {2, 6} x
   steps_per_dispatch {1, 4} — if the path is transport-bound, throughput
   should scale ~1/canvas^2 and be insensitive to depth/k.
3. **The predicted transport ceiling** — raw_bandwidth / bytes_per_image —
   printed next to each measured number so the bound is explicit.

Writes docs/bench_streaming.json (one summary dict).  Run on the real chip
(no JAX_PLATFORMS override); host must be otherwise idle.

Usage:  python tools/bench_streaming.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def measure_h2d(sizes_mb=(1, 4, 16, 64), repeats: int = 5) -> dict:
    """Raw host->device bandwidth via two-point fetch-forced device_put."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    dev = jax.devices()[0]
    out = {}
    for mb in sizes_mb:
        n = int(mb * 2**20)
        host = np.random.default_rng(0).integers(0, 255, size=n,
                                                 dtype=np.uint8)

        def push(k: int) -> float:
            t0 = time.time()
            acc = None
            for _ in range(k):
                a = jax.device_put(host, dev)
                # A tiny reduction forces the transfer to have LANDED; the
                # fetch of its scalar result is the true barrier
                # (block_until_ready alone lies over the tunnel).
                acc = jnp.sum(a[:: n // 64 or 1].astype(jnp.uint32))
            float(jax.device_get(acc))
            return time.time() - t0

        push(1)  # warm: compile the reduction, open transport
        per = []
        for _ in range(repeats):
            t1, t2 = push(2), push(4)
            dt = (t2 - t1) / 2.0
            if dt > 0:
                per.append(dt)
        med = statistics.median(per) if per else float("nan")
        out[f"{mb}MB"] = {"s_per_put": round(med, 4),
                          "MBps": round(mb / med, 1) if med else 0.0}
    return out


def main():
    ap = argparse.ArgumentParser(__doc__)
    ap.add_argument("--quick", action="store_true",
                    help="fewer cells (canvas 384/256, depth 2, k 1/4)")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--out", default=os.path.join(REPO, "docs",
                                                  "bench_streaming.json"))
    args = ap.parse_args()

    from bench import measure_e2e, measure_tpu

    report: dict = {"h2d": measure_h2d()}
    print(json.dumps({"h2d": report["h2d"]}), flush=True)
    # Best observed raw bandwidth = the transport's practical ceiling.
    best_mbps = max(v["MBps"] for v in report["h2d"].values())
    report["h2d_best_MBps"] = best_mbps

    dev = measure_tpu(batch=args.batch, repeats=3)
    report["device_step_img_s"] = dev["median"]
    print(json.dumps({"device_step": dev}), flush=True)

    canvases = (384, 256) if args.quick else (384, 320, 256)
    depths = (2,) if args.quick else (2, 6)
    ks = (1, 4)
    cells = []
    for canvas in canvases:
        bytes_per_img = canvas * canvas * 3
        ceiling = best_mbps * 2**20 / bytes_per_img
        for depth in depths:
            for k in ks:
                e = measure_e2e(batch=args.batch, steps_per_dispatch=k,
                                canvas=canvas, prefetch_depth=depth)
                cell = {"canvas": canvas, "prefetch_depth": depth,
                        "steps_per_dispatch": k,
                        "img_s": e["median"],
                        "transport_ceiling_img_s": round(ceiling, 1),
                        "pct_of_ceiling": round(
                            100.0 * e["median"] / ceiling, 1),
                        "pct_of_device_step": round(
                            100.0 * e["median"] / dev["median"], 1)}
                cells.append(cell)
                print(json.dumps(cell), flush=True)
    report["streaming"] = cells

    res = measure_e2e(batch=args.batch, steps_per_dispatch=4, resident=True)
    report["resident_img_s"] = res["median"]
    print(json.dumps({"resident": res}), flush=True)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
