"""Benchmark: flagship training-step throughput on the TPU chip.

Measures images/sec/chip for the full hg8 + DSNT + JS train step (on-device
augmentation + forward + backward + RMSProp update, bf16 backbone, fused
Pallas DSNT head) — BASELINE config #3, the workload of BASELINE.json's
``metric``.  Prints ONE JSON line on stdout (progress goes to stderr):

    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N,
     "median": N, "min": N, "max": N, "spread_pct": N,
     "tflops_per_step": N, "implied_mfu": N, "e2e": {...}, "budget": {...}}

``value`` is the MEDIAN of ``BENCH_REPEATS`` independent two-point
measurements (round-2 verdict: single-shot numbers on the tunneled transport
spread by ~25%; medians + reported min/max make the figure reproducible).
``tflops_per_step``/``implied_mfu`` cross-check the timing against XLA's own
``compiled.cost_analysis()`` FLOP count — a wall-clock number implying more
than the chip's peak is a measurement bug, not a speedup.  ``e2e`` measures
the REAL input path (mmap-packed uint8 canvases -> ShardedLoader threads ->
H2D -> device step) over full epochs, the number a training run actually
sees.

BUDGET AWARENESS (round-5 fix for the r04 red artifact, rc=124/parsed=null):
the whole run operates under a wall-clock budget (``DSNT_BENCH_BUDGET_S``,
default 540 s — just inside the driver's observed ~600 s kill).  Three
defenses, mirroring __graft_entry__.dryrun_multichip:

  1. Every stage prints a flushed ``[bench +Ns]`` line to STDERR the moment
     it starts/finishes, so even a hard kill leaves per-stage evidence.
  2. Stages are ordered headline-first (device step -> e2e streaming -> e2e
     resident) and each optional stage is gated on remaining budget; repeat
     loops check the deadline between iterations.
  3. A daemon WATCHDOG thread fires ``margin`` seconds before the budget,
     prints the partial JSON (headline first, later stages marked skipped)
     and ``os._exit(0)`` — this works even while the main thread is blocked
     inside a C dispatch the driver's SIGTERM could never interrupt.

The FLOP count comes from the SAME AOT-compiled executable that the timing
loop runs (``jitted.lower(...).compile()`` once; ``cost_analysis()`` +
``compiled(...)`` from that one object) — the r04 bench paid a redundant
second trace/compile just for FLOPs.

``vs_baseline`` is the speedup over the PyTorch-CPU reference implementation
(bench_torch_reference.py), measured once and cached in BENCH_BASELINE.json.

Env knobs: BENCH_BATCH, BENCH_ITERS, BENCH_REPEATS, BENCH_SKIP_E2E,
BENCH_E2E_STEPS_PER_DISPATCH, BENCH_PEAK_FLOPS (default 197e12, v5e bf16),
BENCH_MFU_CEILING (default 0.60 — repeats implying more are re-measured),
BENCH_FIXTURE_DIR, DSNT_BENCH_BUDGET_S; plus tiny-config knobs for the CI
budget test (BENCH_BASE, BENCH_HG_FEATURES, BENCH_HG_DEPTH,
BENCH_INPUT_SIZE, BENCH_CANVAS) — tests/test_bench_budget.py runs this very
file cold-cache on CPU and asserts a parseable JSON line lands in budget.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import threading
import time

BASELINE_CACHE = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")
PEAK_FLOPS = float(os.environ.get("BENCH_PEAK_FLOPS", 197e12))  # v5e bf16

_T0 = time.monotonic()
BUDGET_S = float(os.environ.get("DSNT_BENCH_BUDGET_S", "540") or 0)
_WATCHDOG_MARGIN_S = 12.0

# The partial result, filled progressively; the watchdog emits it as-is.
_RESULT: dict = {
    "metric": "images/sec/chip (hg8+DSNT+JS fwd/bwd train step)",
    "value": 0.0,
    "unit": "images/sec/chip",
    "vs_baseline": 0.0,
}
_EMITTED = threading.Event()
_DONE = threading.Event()


def _elapsed() -> float:
    return time.monotonic() - _T0


def _remaining() -> float:
    """Seconds left before the watchdog fires (inf when no budget set)."""
    if not BUDGET_S:
        return float("inf")
    return BUDGET_S - _WATCHDOG_MARGIN_S - _elapsed()


def stage(msg: str) -> None:
    print(f"[bench +{_elapsed():6.1f}s] {msg}", file=sys.stderr, flush=True)


def _emit(partial: bool) -> None:
    """Print the ONE JSON line (exactly once, even if watchdog races main)."""
    if _EMITTED.is_set():
        return
    _EMITTED.set()
    budget_info = _RESULT.setdefault("budget", {})
    budget_info["budget_s"] = BUDGET_S or None
    budget_info["elapsed_s"] = round(_elapsed(), 1)
    budget_info["partial"] = partial
    print(json.dumps(_RESULT), flush=True)


def _watchdog() -> None:
    if not BUDGET_S:
        return
    deadline = BUDGET_S - _WATCHDOG_MARGIN_S
    while not _DONE.wait(timeout=min(1.0, max(0.05, deadline - _elapsed()))):
        if _elapsed() >= deadline:
            stage(f"WATCHDOG: budget {BUDGET_S:.0f}s nearly exhausted — "
                  "emitting partial result and exiting")
            _RESULT.setdefault("budget", {})["watchdog_fired"] = True
            _emit(partial=True)
            # os._exit: the main thread may be blocked inside an
            # uninterruptible C dispatch (tunneled PJRT fetch); a normal
            # sys.exit from a daemon thread would not stop it.
            os._exit(0)


def _baseline_ips(max_subprocess_s: float = 900.0) -> float:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)["torch_cpu_images_per_sec"]
    # Measure the torch CPU reference in a subprocess (isolates threads) —
    # only when enough budget remains; a missing cache must never eat the
    # whole run (the subprocess previously had a 3600 s timeout).
    if _remaining() < max_subprocess_s + 60:
        stage("baseline cache missing and budget too tight to measure; "
              "vs_baseline=0")
        return 0.0
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__),
                                          "bench_torch_reference.py")],
            capture_output=True, text=True, timeout=max_subprocess_s,
            check=True)
        val = json.loads(out.stdout.strip().splitlines()[-1])
        with open(BASELINE_CACHE, "w") as f:
            json.dump(val, f)
        return val["torch_cpu_images_per_sec"]
    except Exception as e:  # pragma: no cover
        print(f"# baseline measurement failed ({e}); vs_baseline=0",
              file=sys.stderr)
        return 0.0


def _flagship_config(batch: int, use_pallas: bool, remat: bool, base: str,
                     steps_per_dispatch: int, warp: str):
    from dsnt_pose2d_tpu.utils.config import (Config, DataConfig, ModelConfig,
                                              TrainConfig)

    return Config(
        model=ModelConfig(
            base=base, output_strat="dsnt", reg="js",
            dtype="bfloat16", use_pallas=use_pallas, remat=remat,
            hg_features=int(os.environ.get("BENCH_HG_FEATURES", "256")),
            hg_depth=int(os.environ.get("BENCH_HG_DEPTH", "4")),
            input_size=int(os.environ.get("BENCH_INPUT_SIZE", "0"))),
        train=TrainConfig(batch_size=batch, donate=True,
                          steps_per_dispatch=steps_per_dispatch),
        data=DataConfig(warp_method=warp) if warp else DataConfig(),
    )


def _aot_compile(jitted, *args):
    """One trace+compile; returns (callable, flops) from the SAME executable.

    Replaces the r04 pattern of a separate ``lower().compile()`` just for
    ``cost_analysis`` followed by a second independent jit trace for the
    timing loop — one cold XLA compile, not two.
    """
    compiled = jitted.lower(*args).compile()
    flops = 0.0
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except Exception:
        pass
    return compiled, flops


def measure_tpu(batch: int = 32, iters: int = 20, warmup: int = 3,
                repeats: int = 5, use_pallas: bool = True,
                remat: bool = False, base: str = "hg8",
                steps_per_dispatch: int = 1, warp: str = "") -> dict:
    """Repeated two-point, fetch-forced measurement of the device step.

    On remote/tunneled PJRT transports ``block_until_ready`` can return
    before device execution completes, inflating naive timings by orders of
    magnitude (observed on this image's axon tunnel).  Only a VALUE fetch
    (``jax.device_get``) is a true execution barrier.  Each repeat times two
    runs of N and 2N chained steps, each ending in a scalar fetch, and takes
    the marginal per-step time — immune to fixed dispatch/fetch overheads.
    The repeats are summarized as median + min/max (tunnel/host conditions
    drift between runs; one sample is not a number).

    Budget-aware: the repeat loop (including MFU-filter re-measures) stops
    when the global deadline approaches, reporting whatever repeats landed.
    """
    import jax

    from dsnt_pose2d_tpu.cli.common import enable_compilation_cache
    from dsnt_pose2d_tpu.data.synthetic import make_synthetic_mpii
    from dsnt_pose2d_tpu.models.factory import build_pose_model
    from dsnt_pose2d_tpu.parallel.mesh import (make_mesh, replicated,
                                               shard_batch, shard_super_batch)
    from dsnt_pose2d_tpu.train.loop import make_step_fns
    from dsnt_pose2d_tpu.train.state import create_train_state

    enable_compilation_cache()
    cfg = _flagship_config(batch, use_pallas, remat, base, steps_per_dispatch,
                           warp)
    model = build_pose_model(cfg.model)
    mesh = make_mesh(1)
    k = max(1, steps_per_dispatch)
    canvas = int(os.environ.get("BENCH_CANVAS", "384"))
    data = make_synthetic_mpii(batch, canvas_size=canvas, seed=0)
    state = create_train_state(model, cfg.optim, jax.random.PRNGKey(0),
                               batch_size=2)
    state = jax.device_put(state, replicated(mesh))
    if k > 1:
        from dsnt_pose2d_tpu.train.loop import make_multi_step
        import numpy as _np

        multi = make_multi_step(model, cfg, mesh)
        # Pre-staged on device, mirroring the k=1 path: H2D belongs to the
        # e2e benchmark, not the device-step one.
        super_batch = shard_super_batch(
            mesh, {key: _np.stack([v] * k) for key, v in data.items()})
        stage(f"compiling device step (base={base} k={k} batch={batch})")
        compiled, flops = _aot_compile(multi, state, super_batch)
        step_fn = lambda st, _b: compiled(st, super_batch)
        batch_arrays = None
    else:
        train_step, _ = make_step_fns(model, cfg, mesh)
        batch_arrays = shard_batch(mesh, data)
        stage(f"compiling device step (base={base} k=1 batch={batch})")
        compiled, flops = _aot_compile(train_step, state, batch_arrays)
        step_fn = lambda st, b: compiled(st, b)
    stage(f"device step compiled ({flops / 1e12:.3f} TFLOP/step)")

    for _ in range(warmup):
        state, metrics = step_fn(state, batch_arrays)
    loss = metrics["loss"]
    float(jax.device_get(loss if loss.ndim == 0 else loss[-1]))
    stage("warmup done")

    def timed(n):
        nonlocal state
        t0 = time.time()
        m = None
        for _ in range(n):
            state, m = step_fn(state, batch_arrays)
        loss = m["loss"]
        float(jax.device_get(loss if loss.ndim == 0 else loss[-1]))
        return time.time() - t0

    # A marginal time implying an implausible MFU is a measurement artifact
    # (tunnel jitter between the two windows), not a speedup — drop it and
    # re-measure, up to 2x the repeat budget.  Round 3 shipped an 881 img/s
    # outlier implying 75% MFU on a workload whose profiler trace ceiling is
    # ~48% (98.3% device-busy at 43.6% median MFU, DESIGN.md §8) — physically
    # impossible for this conv-bound graph, so the filter is an MFU ceiling,
    # not the chip's absolute peak.  Default 0.60 leaves real headroom above
    # the measured 43.6% for genuine kernel improvements; override with
    # BENCH_MFU_CEILING if the conv core ever beats it legitimately.
    mfu_ceiling = float(os.environ.get("BENCH_MFU_CEILING", "0.60"))
    floor = flops / (PEAK_FLOPS * mfu_ceiling) if flops else 0.0
    per_step, rejected = [], []
    attempts = 0
    repeat_cost = 0.0  # measured cost of one attempt; gates the next
    while len(per_step) < repeats and attempts < 2 * repeats:
        if attempts and _remaining() < 2.0 * repeat_cost:
            stage(f"deadline near: stopping after {attempts} repeat attempts")
            break
        attempts += 1
        ta = time.monotonic()
        t1 = timed(iters)
        t2 = timed(2 * iters)
        repeat_cost = max(repeat_cost, time.monotonic() - ta)
        dt = (t2 - t1) / (iters * k)  # per STEP (a dispatch runs k steps)
        (per_step if dt > floor else rejected).append(dt)
        stage(f"repeat {attempts}: {batch / dt:.1f} img/s"
              + ("" if dt > floor else " (rejected: above MFU ceiling)"))
    suspect = False
    if not per_step:
        # Every attempt was physically impossible (persistent tunnel jitter
        # or a broken FLOP floor): report the raw positive measurements,
        # flagged IN THE JSON so the number is never mistaken for a clean
        # run even when stderr is discarded.
        print(f"# WARNING: all {attempts} repeats rejected by the "
              f"{floor * 1e3:.2f} ms FLOP floor; reporting unfiltered times",
              file=sys.stderr)
        suspect = True
        per_step = [t for t in rejected if t > 0]
        if not per_step:
            # Negative marginal times throughout — no physically meaningful
            # throughput exists; report zero rather than a fabricated number.
            return {"median": 0.0, "min": 0.0, "max": 0.0, "spread_pct": 0.0,
                    "tflops_per_step": round(flops / 1e12, 3),
                    "implied_mfu": 0.0, "repeats": 0,
                    "all_repeats_rejected": True}
    ips = sorted(batch / t for t in per_step)
    med_t = statistics.median(per_step)
    out = {
        "median": round(statistics.median(ips), 2),
        "min": round(ips[0], 2),
        "max": round(ips[-1], 2),
        "spread_pct": round(100.0 * (ips[-1] - ips[0]) / ips[0], 1),
        "tflops_per_step": round(flops / 1e12, 3),
        "implied_mfu": round(flops / med_t / PEAK_FLOPS, 4) if flops else 0.0,
        "repeats": len(per_step),
        "rejected_outliers": len(rejected),
        "mfu_ceiling": mfu_ceiling,
    }
    if suspect:
        out["all_repeats_rejected"] = True
    return out


def _ensure_e2e_fixture(n: int, canvas: int = 384) -> str:
    """A packed-format (mmap uint8) fixture of n samples, cached on disk.

    Matches the REAL training input layout (PackedDataset) byte-for-byte in
    structure; content is random (throughput doesn't care).
    """
    import numpy as np

    from dsnt_pose2d_tpu.data.pack import CANVAS_FILE, META_FILE

    root = os.environ.get("BENCH_FIXTURE_DIR", "/tmp/dsnt_bench_fixture")
    out = os.path.join(root, f"n{n}_c{canvas}")
    if os.path.exists(os.path.join(out, META_FILE.format(subset="train"))):
        return out
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(0)
    canvases = np.lib.format.open_memmap(
        os.path.join(out, CANVAS_FILE.format(subset="train")), mode="w+",
        dtype=np.uint8, shape=(n, canvas, canvas, 3))
    for i in range(n):  # chunked writes keep peak memory flat
        canvases[i] = rng.integers(0, 256, size=(canvas, canvas, 3),
                                   dtype=np.uint8)
    canvases.flush()
    eye = np.broadcast_to(np.eye(3, dtype=np.float32), (n, 3, 3)).copy()
    np.savez(os.path.join(out, META_FILE.format(subset="train")),
             coords_px=rng.uniform(canvas * 0.2, canvas * 0.8,
                                   (n, 16, 2)).astype(np.float32),
             mask=np.ones((n, 16), np.float32),
             head_length=np.full((n,), 45.0, np.float32),
             canvas_from_orig=eye,
             canvas_margin=np.full((n,), 1.5, np.float32))
    return out


def measure_e2e(batch: int = 16, repeats: int = 3, epoch_steps: int = 24,
                use_pallas: bool = True, base: str = "hg8",
                steps_per_dispatch: int = 1, workers: int = 4,
                resident: bool = False, canvas: int = 0,
                prefetch_depth: int = 2) -> dict:
    """End-to-end epoch throughput over the real input path.

    ``resident=False``: mmap read -> collate -> H2D -> step (streaming; the
    round-2 verdict's hidden 3-10x gap, bounded by the transport).
    ``resident=True``: the device-resident path — packed canvases staged in
    HBM once, per-step input is a (B,) index vector gathered on device
    (data/resident.py), which removes per-step H2D entirely.

    Budget-aware: measurement epochs stop early when the deadline nears,
    reporting the epochs that completed (at least the first).
    """
    import jax
    import numpy as np

    from dsnt_pose2d_tpu.cli.common import enable_compilation_cache
    from dsnt_pose2d_tpu.data.loader import ShardedLoader, prefetch_to_device
    from dsnt_pose2d_tpu.data.pack import PackedDataset
    from dsnt_pose2d_tpu.models.factory import build_pose_model
    from dsnt_pose2d_tpu.parallel.mesh import make_mesh, replicated
    from dsnt_pose2d_tpu.train.loop import (_prefetch_dispatch_groups,
                                            make_multi_step,
                                            make_resident_multi_step,
                                            make_resident_step, make_step_fns)
    from dsnt_pose2d_tpu.train.state import create_train_state

    enable_compilation_cache()
    canvas = canvas or int(os.environ.get("BENCH_CANVAS", "384"))
    n = batch * epoch_steps
    fixture = _ensure_e2e_fixture(n, canvas=canvas)
    ds = PackedDataset(fixture, "train")
    cfg = _flagship_config(batch, use_pallas, False, base, steps_per_dispatch,
                           "")
    model = build_pose_model(cfg.model)
    mesh = make_mesh(1)
    k = max(1, steps_per_dispatch)
    state = create_train_state(model, cfg.optim, jax.random.PRNGKey(0),
                               batch_size=2)
    state = jax.device_put(state, replicated(mesh))

    if resident:
        from dsnt_pose2d_tpu.data.resident import ResidentTrainData

        rd = ResidentTrainData(ds, batch, mesh, seed=0)
        res_step = make_resident_step(model, cfg, mesh)
        res_multi = make_resident_multi_step(model, cfg, mesh) if k > 1 else None

        def run_epoch(epoch: int):
            nonlocal state
            t0 = time.time()
            steps = 0
            last = None
            if res_multi is not None:
                for kind, idx in rd.epoch_groups(epoch, k):
                    if kind == "single":
                        state, m = res_step(state, rd.resident, idx)
                        steps += 1
                        last = m["loss"]
                    else:
                        state, ms = res_multi(state, rd.resident, idx)
                        steps += k
                        last = ms["loss"][-1]
            else:
                for idx in rd.epoch(epoch):
                    state, m = res_step(state, rd.resident, idx)
                    steps += 1
                    last = m["loss"]
            float(jax.device_get(last))  # true execution barrier
            return steps * batch / (time.time() - t0)
    else:
        train_step, _ = make_step_fns(model, cfg, mesh)
        multi = make_multi_step(model, cfg, mesh) if k > 1 else None
        loader = ShardedLoader(ds, batch, shuffle=True, seed=0,
                               workers=workers, prefetch=prefetch_depth)

        def run_epoch(epoch: int):
            nonlocal state
            t0 = time.time()
            steps = 0
            last = None
            if multi is not None:
                for kind, payload in _prefetch_dispatch_groups(
                        loader.epoch(epoch), k, mesh):
                    if kind == "single":
                        state, m = train_step(state, payload)
                        steps += 1
                        last = m["loss"]
                    else:
                        state, ms = multi(state, payload)
                        steps += k
                        last = ms["loss"][-1]
            else:
                for b in prefetch_to_device(loader.epoch(epoch), mesh):
                    state, m = train_step(state, b)
                    steps += 1
                    last = m["loss"]
            float(jax.device_get(last))  # true execution barrier
            return steps * batch / (time.time() - t0)

    label = "resident" if resident else "streaming"
    t0 = time.monotonic()
    run_epoch(0)  # warmup: compile + page-cache the mmap / stage HBM
    epoch_cost = time.monotonic() - t0
    stage(f"e2e {label} k={k}: warmup epoch done ({epoch_cost:.1f}s)")
    vals = []
    for r in range(repeats):
        if vals and _remaining() < 1.5 * epoch_cost:
            stage(f"deadline near: e2e {label} stopping after "
                  f"{len(vals)}/{repeats} epochs")
            break
        te = time.monotonic()
        vals.append(run_epoch(1 + r))
        epoch_cost = time.monotonic() - te
    vals.sort()
    out = {
        "median": round(statistics.median(vals), 2),
        "min": round(vals[0], 2),
        "max": round(vals[-1], 2),
        "steps_per_dispatch": k,
        "epoch_steps": epoch_steps,
        "epochs_measured": len(vals),
        "resident": resident,
        "canvas": canvas,
    }
    if not resident:
        # Loader threads only exist on the streaming path; the resident path
        # has no host loader at all.
        out["workers"] = workers
    return out


def main():
    threading.Thread(target=_watchdog, daemon=True, name="bench-watchdog").start()
    stage(f"bench start (budget={BUDGET_S or 'none'}s)")
    batch = int(os.environ.get("BENCH_BATCH", "16"))  # throughput peak on v5e (memory-bound workload)
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    repeats = int(os.environ.get("BENCH_REPEATS", "7"))
    base_model = os.environ.get("BENCH_BASE", "hg8")
    _RESULT["budget"] = {"stages": []}
    stages_done = _RESULT["budget"]["stages"]

    try:
        dev = measure_tpu(batch=batch, iters=iters, repeats=repeats,
                          base=base_model)
        _RESULT.update(dev)
        _RESULT["value"] = dev["median"]
        stages_done.append("device_step")
        stage(f"headline: {dev['median']} img/s/chip "
              f"(mfu={dev.get('implied_mfu', 0)})")
        base = _baseline_ips()
        _RESULT["vs_baseline"] = (round(dev["median"] / base, 2)
                                  if base else 0.0)
        stages_done.append("vs_baseline")

        if not os.environ.get("BENCH_SKIP_E2E"):
            # Streaming e2e shares the device-step HLO (persistent-cache
            # hit); ~5 epochs of wall clock.  Gate on a conservative floor.
            if _remaining() > 90:
                k = int(os.environ.get("BENCH_E2E_STEPS_PER_DISPATCH", "1"))
                e2e = measure_e2e(batch=batch, steps_per_dispatch=k,
                                  base=base_model)
                e2e["vs_device_step_pct"] = round(
                    100.0 * e2e["median"] / dev["median"], 1)
                _RESULT["e2e"] = e2e
                stages_done.append("e2e_streaming")
            else:
                stage("skipping e2e streaming (budget)")
                _RESULT["e2e"] = {"skipped": "budget"}
            # The default train path: dataset resident in HBM, zero per-step
            # H2D — but a fresh scan-graph compile, the most expensive
            # remaining stage; needs the largest remaining window.
            if _remaining() > 120:
                kr = int(os.environ.get("BENCH_E2E_RESIDENT_DISPATCH", "4"))
                res = measure_e2e(batch=batch, steps_per_dispatch=kr,
                                  resident=True, base=base_model)
                res["vs_device_step_pct"] = round(
                    100.0 * res["median"] / dev["median"], 1)
                _RESULT["e2e_resident"] = res
                stages_done.append("e2e_resident")
            else:
                stage("skipping e2e resident (budget)")
                _RESULT["e2e_resident"] = {"skipped": "budget"}
    except Exception:
        # A failed stage must still leave a parseable artifact: record the
        # error IN the JSON (value stays 0.0 unless the headline landed) and
        # exit 0 so the driver captures the line instead of a bare rc=1.
        import traceback

        traceback.print_exc()
        _RESULT["error"] = traceback.format_exc(limit=3).strip().splitlines()[-1]
    finally:
        _DONE.set()
        _emit(partial="device_step" not in stages_done)


if __name__ == "__main__":
    main()
