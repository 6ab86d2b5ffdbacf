"""Sweep hg8 train-step throughput over the perf knobs (VERDICT round-1 #1).

Runs each configuration in a fresh subprocess (isolates XLA memory/compile
state), prints one JSON line per config, and a final ranked summary.

Usage: python tools/sweep_train_step.py [--quick]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    # (label, kwargs for bench.measure_tpu)
    ("b16", dict(batch=16)),
    ("b32", dict(batch=32)),
    ("b64", dict(batch=64)),
    ("b128", dict(batch=128)),
    ("b64_remat", dict(batch=64, remat=True)),
    ("b128_remat", dict(batch=128, remat=True)),
    ("b256_remat", dict(batch=256, remat=True)),
    ("b64_nopallas", dict(batch=64, use_pallas=False)),
    ("b64_k4", dict(batch=64, steps_per_dispatch=4)),
]


def run_one(label: str, kwargs: dict, iters: int) -> dict:
    code = (
        "import json, bench\n"
        f"r = bench.measure_tpu(iters={iters}, repeats=3, **{kwargs!r})\n"
        f"print(json.dumps({{'label': {label!r}, 'ips': r['median'],"
        f" 'min': r['min'], 'max': r['max'], 'mfu': r['implied_mfu'],"
        f" 'cfg': {kwargs!r}}}))\n"
    )
    try:
        out = subprocess.run([sys.executable, "-c", code], cwd=REPO,
                             capture_output=True, text=True, timeout=1800)
        line = [l for l in out.stdout.strip().splitlines()
                if l.startswith("{")]
        if not line:
            return {"label": label, "error": out.stderr.strip()[-500:]}
        return json.loads(line[-1])
    except subprocess.TimeoutExpired:
        return {"label": label, "error": "timeout"}


def main():
    iters = 8 if "--quick" in sys.argv else 20
    results = []
    for label, kwargs in CONFIGS:
        rec = run_one(label, kwargs, iters)
        print(json.dumps(rec), flush=True)
        results.append(rec)
    ok = [r for r in results if "ips" in r]
    ok.sort(key=lambda r: -r["ips"])
    print(json.dumps({"ranked": [(r["label"], r["ips"]) for r in ok]}))


if __name__ == "__main__":
    main()
