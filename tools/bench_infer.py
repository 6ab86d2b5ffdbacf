"""Serving/inference throughput benchmark across model families.

The companion paper reports an inference-fps table per backbone (SURVEY.md
§6 "Inference speed"); this is its TPU counterpart.  For each base model it
times the full serving graph (`train/loop.py::make_infer_fn`: deterministic
eval preprocess, forward, DSNT decode, crop→original untransform) on one
chip with the same two-point fetch-forced method as `bench.py` (naive
`block_until_ready` timings are wrong over remote PJRT transports), and
reports throughput at a serving batch plus single-sample latency.

Usage:
    python tools/bench_infer.py [--bases hg1,hg2,hg8,resnet18,resnet50]
                                [--batch 64] [--repeats 5] [--out FILE.json]

Each base runs in a fresh subprocess (isolates XLA state); prints one JSON
line per base and a final markdown table.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, statistics, sys, time

base, batch, repeats, iters = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4])

import jax

from dsnt_pose2d_tpu.cli.common import enable_compilation_cache
from dsnt_pose2d_tpu.data.synthetic import make_synthetic_mpii
from dsnt_pose2d_tpu.models.factory import build_pose_model
from dsnt_pose2d_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from dsnt_pose2d_tpu.train.loop import make_infer_fn
from dsnt_pose2d_tpu.train.state import create_train_state
from dsnt_pose2d_tpu.utils.config import Config, ModelConfig, TrainConfig

enable_compilation_cache()
cfg = Config(model=ModelConfig(base=base, output_strat="dsnt", reg="js",
                               dtype="bfloat16", use_pallas=True),
             train=TrainConfig(batch_size=batch))
model = build_pose_model(cfg.model)
mesh = make_mesh(1)
infer = make_infer_fn(model, cfg, mesh)
state = jax.device_put(
    create_train_state(model, cfg.optim, jax.random.PRNGKey(0), batch_size=2),
    replicated(mesh))


def measure(bs):
    dev = shard_batch(mesh, make_synthetic_mpii(bs, canvas_size=384, seed=0))
    for _ in range(3):
        out = infer(state, dev)
    float(jax.device_get(out[0, 0, 0]))

    # Small batches run sub-ms per step; scale the iteration count so the
    # two-point marginal time stays large relative to host/tunnel jitter
    # (a 20-iter b=1 window once measured a NEGATIVE marginal time).
    n_it = iters * max(1, 64 // bs)

    def timed(n):
        out = None
        t0 = time.time()
        for _ in range(n):
            out = infer(state, dev)
        float(jax.device_get(out[0, 0, 0]))
        return time.time() - t0

    # Top up toward 3+ clean repeats, but bound the attempts: persistently
    # nonpositive marginals (jitter >> marginal time) must not spin forever
    # into the parent's subprocess timeout.
    per, attempts = [], 0
    while (len(per) < max(repeats, 3)) and attempts < 3 * max(repeats, 3):
        attempts += 1
        t1, t2 = timed(n_it), timed(2 * n_it)
        dt = (t2 - t1) / n_it
        if dt > 0:  # nonpositive = jitter swamped the marginal; re-measure
            per.append(dt)
    if not per:
        print(json.dumps({"base": base, "batch": batch,
                          "error": "all marginal times nonpositive"}))
        sys.exit(0)
    ips = sorted(bs / t for t in per)
    return {"ips": round(statistics.median(ips), 2),
            "min": round(ips[0], 2), "max": round(ips[-1], 2),
            "ms_per_batch": round(1e3 * statistics.median(per), 3)}

thr = measure(batch)
lat = measure(1)
n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
print(json.dumps({"base": base, "batch": batch, "params_m": round(n_params / 1e6, 1),
                  "throughput": thr, "latency_b1": lat}))
"""


def main():
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--bases", default="hg1,hg2,hg4,hg8,resnet18,resnet34,resnet50")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--repeats", type=int, default=5)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--out", default="")
    args = p.parse_args()

    results = []
    for base in args.bases.split(","):
        r = subprocess.run(
            [sys.executable, "-c", WORKER, base, str(args.batch),
             str(args.repeats), str(args.iters)],
            cwd=REPO, capture_output=True, text=True, timeout=3600)
        lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
        rec = (json.loads(lines[-1]) if lines
               else {"base": base, "error": r.stderr.strip()[-500:]})
        print(json.dumps(rec), flush=True)
        results.append(rec)

    ok = [r for r in results if "throughput" in r]
    print("\n| base | params (M) | img/s @ b%d | ms/img @ b1 |" % args.batch)
    print("|---|---|---|---|")
    for r in sorted(ok, key=lambda r: -r["throughput"]["ips"]):
        print("| %s | %.1f | %.0f | %.2f |" % (
            r["base"], r["params_m"], r["throughput"]["ips"],
            r["latency_b1"]["ms_per_batch"]))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
