"""Benchmark: flagship training-step throughput on the TPU chip.

Measures images/sec/chip for the full hg8 + DSNT + JS train step (on-device
augmentation + forward + backward + RMSProp update, bf16 backbone, fused
Pallas DSNT head) — BASELINE config #3, the workload of BASELINE.json's
``metric``.  Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

``vs_baseline`` is the speedup over the PyTorch-CPU reference implementation
(bench_torch_reference.py), measured once and cached in BENCH_BASELINE.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

BASELINE_CACHE = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")


def _baseline_ips() -> float:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["torch_cpu_images_per_sec"]
    # Measure the torch CPU reference in a subprocess (isolates threads).
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__),
                                          "bench_torch_reference.py")],
            capture_output=True, text=True, timeout=3600, check=True)
        val = json.loads(out.stdout.strip().splitlines()[-1])
        with open(BASELINE_CACHE, "w") as f:
            json.dump(val, f)
        return val["torch_cpu_images_per_sec"]
    except Exception as e:  # pragma: no cover
        print(f"# baseline measurement failed ({e}); vs_baseline=0", file=sys.stderr)
        return 0.0


def measure_tpu(batch: int = 32, iters: int = 20, warmup: int = 3,
                use_pallas: bool = True, remat: bool = False,
                base: str = "hg8", steps_per_dispatch: int = 1,
                warp: str = "") -> float:
    """Two-point, fetch-forced measurement.

    On remote/tunneled PJRT transports ``block_until_ready`` can return
    before device execution completes, inflating naive timings by orders of
    magnitude (observed on this image's axon tunnel).  Only a VALUE fetch
    (``jax.device_get``) is a true execution barrier.  We therefore time two
    runs of N and 2N chained steps, each ending in a scalar fetch, and report
    the marginal per-step time — immune to fixed dispatch/fetch overheads.
    """
    import jax
    import jax.numpy as jnp

    from dsnt_pose2d_tpu.cli.common import enable_compilation_cache
    from dsnt_pose2d_tpu.data.synthetic import make_synthetic_mpii
    from dsnt_pose2d_tpu.models.factory import build_pose_model
    from dsnt_pose2d_tpu.parallel.mesh import make_mesh, replicated, shard_batch
    from dsnt_pose2d_tpu.train.loop import make_step_fns
    from dsnt_pose2d_tpu.train.state import create_train_state
    from dsnt_pose2d_tpu.utils.config import (Config, DataConfig, ModelConfig,
                                              TrainConfig)

    enable_compilation_cache()
    cfg = Config(
        model=ModelConfig(base=base, output_strat="dsnt", reg="js",
                          dtype="bfloat16", use_pallas=use_pallas,
                          remat=remat),
        train=TrainConfig(batch_size=batch, donate=True,
                          steps_per_dispatch=steps_per_dispatch),
        data=DataConfig(warp_method=warp) if warp else DataConfig(),
    )
    model = build_pose_model(cfg.model)
    mesh = make_mesh(1)
    k = max(1, steps_per_dispatch)
    if k > 1:
        from dsnt_pose2d_tpu.train.loop import make_multi_step

        multi = make_multi_step(model, cfg, mesh)
        data = make_synthetic_mpii(batch, canvas_size=384, seed=0)
        import numpy as _np

        super_batch = {key: _np.stack([v] * k) for key, v in data.items()}
        step_fn = lambda st, _b: multi(st, super_batch)
        batch_arrays = None
    else:
        train_step, _ = make_step_fns(model, cfg, mesh)
        data = make_synthetic_mpii(batch, canvas_size=384, seed=0)
        batch_arrays = shard_batch(mesh, data)
        step_fn = lambda st, b: train_step(st, b)
    state = create_train_state(model, cfg.optim, jax.random.PRNGKey(0),
                               batch_size=2)
    state = jax.device_put(state, replicated(mesh))

    for _ in range(warmup):
        state, metrics = step_fn(state, batch_arrays)
    loss = metrics["loss"]
    float(jax.device_get(loss if loss.ndim == 0 else loss[-1]))

    def timed(n):
        nonlocal state
        t0 = time.time()
        m = None
        for _ in range(n):
            state, m = step_fn(state, batch_arrays)
        loss = m["loss"]
        float(jax.device_get(loss if loss.ndim == 0 else loss[-1]))
        return time.time() - t0

    t1 = timed(iters)
    t2 = timed(2 * iters)
    per_step = (t2 - t1) / iters
    return batch * k / per_step


def main():
    batch = int(os.environ.get("BENCH_BATCH", "16"))  # throughput peak on v5e (memory-bound workload)
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    ips = measure_tpu(batch=batch, iters=iters)
    base = _baseline_ips()
    print(json.dumps({
        "metric": "images/sec/chip (hg8+DSNT+JS fwd/bwd train step)",
        "value": round(ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / base, 2) if base else 0.0,
    }))


if __name__ == "__main__":
    main()
