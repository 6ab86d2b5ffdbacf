"""Capture a jax.profiler trace of the flagship hg8 train step on the TPU.

Writes the TensorBoard-format trace to --out (default docs/traces/hg8) and
prints the XLA cost analysis (FLOPs/bytes) plus the derived MFU/bandwidth
numbers for the written analysis in docs/DESIGN.md.

Usage: python tools/profile_step.py [--batch 64] [--steps 6] [--out docs/traces/hg8]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--base", default="hg8")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--warp", default="gather")
    p.add_argument("--out", default="docs/traces/hg8")
    args = p.parse_args()

    import jax

    from dsnt_pose2d_tpu.data.synthetic import make_synthetic_mpii
    from dsnt_pose2d_tpu.models.factory import build_pose_model
    from dsnt_pose2d_tpu.parallel.mesh import make_mesh, replicated, shard_batch
    from dsnt_pose2d_tpu.train.loop import make_step_fns
    from dsnt_pose2d_tpu.train.state import create_train_state
    from dsnt_pose2d_tpu.utils.config import (Config, DataConfig, ModelConfig, TrainConfig)

    cfg = Config(
        model=ModelConfig(base=args.base, output_strat="dsnt", reg="js",
                          dtype="bfloat16", use_pallas=True, remat=args.remat),
        train=TrainConfig(batch_size=args.batch, donate=True),
        data=DataConfig(warp_method=args.warp),
    )
    model = build_pose_model(cfg.model)
    mesh = make_mesh(1)
    train_step, _ = make_step_fns(model, cfg, mesh)
    state = create_train_state(model, cfg.optim, jax.random.PRNGKey(0),
                               batch_size=2)
    state = jax.device_put(state, replicated(mesh))
    batch = shard_batch(mesh, make_synthetic_mpii(args.batch, canvas_size=384,
                                                  seed=0))

    # Cost analysis of the compiled step (authoritative FLOP count).
    lowered = train_step.lower(state, batch)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))

    # Warm up, then trace a few steps.
    for _ in range(3):
        state, m = train_step(state, batch)
    float(jax.device_get(m["loss"]))

    os.makedirs(args.out, exist_ok=True)
    with jax.profiler.trace(args.out):
        for _ in range(args.steps):
            state, m = train_step(state, batch)
        float(jax.device_get(m["loss"]))

    # Honest step time: two-point fetch-forced marginal (see bench.py).
    def timed(n):
        nonlocal state
        t0 = time.time()
        mm = None
        for _ in range(n):
            state, mm = train_step(state, batch)
        float(jax.device_get(mm["loss"]))
        return time.time() - t0

    t1 = timed(10)
    t2 = timed(20)
    step_s = (t2 - t1) / 10

    peak_flops = 197e12  # v5e bf16
    peak_bw = 819e9
    rec = {
        "base": args.base, "batch": args.batch, "remat": args.remat,
        "warp": args.warp,
        "step_ms": round(step_s * 1e3, 2),
        "images_per_sec": round(args.batch / step_s, 1),
        "xla_tflop_per_step": round(flops / 1e12, 3),
        "xla_bytes_gb_per_step": round(bytes_acc / 1e9, 2),
        "mfu": round(flops / step_s / peak_flops, 3),
        "hbm_util_of_peak": round(bytes_acc / step_s / peak_bw, 3),
        "trace_files": sorted(glob.glob(os.path.join(
            args.out, "**", "*.trace.json.gz"), recursive=True)),
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
