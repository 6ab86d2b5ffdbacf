"""Kernel-level roofline benchmark for the fused Pallas DSNT head.

Measures the fused forward and forward+backward on real hg8-shaped inputs
(rows = stacks*batch*joints of 64x64 fp32 heatmaps) ON THE TPU, computes the
achieved HBM bandwidth against the chip's peak, and checks the SURVEY section
7 stage-6 target (>= ~70% of HBM speed-of-light).  Also times the unfused jnp
oracle composition at the same shape, so the fusion win is a measured number
rather than a claim.

Traffic model (minimum possible HBM bytes, the roofline denominator):
  forward       : one read of the heatmaps          = N*H*W*4 bytes
  fwd+bwd       : fwd read + bwd read + dh write    = 3*N*H*W*4 bytes
(coords/targets/reg rows are N*O(8) bytes — negligible at H*W = 4096.)

Timing method (see bench.py / docs/DESIGN.md): on this image's tunneled TPU
only a VALUE fetch is a true execution barrier, so each measurement chains
``iters`` kernel applications inside ONE jit (each iteration's targets are
perturbed by the carried accumulator so nothing can be hoisted out of the
loop; the heatmap buffer is re-read from HBM every iteration since it is far
larger than VMEM), fetches a dependent scalar, and the marginal time between
``iters`` and ``2*iters`` runs cancels every fixed dispatch/fetch overhead.

Usage:  python bench_kernel.py            # prints one JSON line per config
        BENCH_ROWS=131072 python bench_kernel.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

# Chip HBM peak bandwidth (GB/s).  Override with TPU_HBM_PEAK_GBPS.
_PEAK_GBPS = {
    "TPU v4": 1228.0,
    "TPU v5 lite": 819.0,   # v5e
    "TPU v5": 2765.0,       # v5p
    "TPU v6 lite": 1640.0,  # v6e / Trillium
}


def peak_gbps(device) -> float:
    env = os.environ.get("TPU_HBM_PEAK_GBPS")
    if env:
        return float(env)
    for k, v in _PEAK_GBPS.items():
        if device.device_kind.startswith(k):
            return v
    return 819.0


def _fetch(x) -> float:
    import jax

    return float(jax.device_get(x))


def _time_chain(run, x, t, iters: int, samples: int = 5) -> float:
    """Marginal seconds per chained iteration.

    The tunneled TPU has ~25-30 ms of fixed dispatch+fetch overhead per call
    and multi-ms jitter, so: time ``iters`` and ``7*iters`` chained runs,
    take the MIN over ``samples`` repeats of each (min filters interference
    spikes; the quantity is a physical lower bound, not an average), and
    report the slope.  The wide spacing makes the slope signal ~6x the
    per-run noise.
    """
    n1, n2 = iters, 7 * iters

    def best(n):
        _fetch(run(x, t, n))          # compile + warm
        ts = []
        for _ in range(samples):
            t0 = time.perf_counter()
            _fetch(run(x, t, n))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (best(n2) - best(n1)) / (n2 - n1)


def bench_fused(rows: int, reg: str, iters: int):
    """(fwd_s, fwdbwd_s, api_fwd_s) for the fused kernel.

    ``fwd``/``fwdbwd`` feed the kernel PRE-FLATTENED ``(rows, H*W)`` arrays —
    the kernel-proper roofline.  ``api_fwd`` goes through the public
    ``fused_dsnt_head`` on ``(rows, H, W)``: its internal reshape cannot be
    bitcast across the opaque custom-call boundary, so XLA materializes one
    full copy (~read+write of the heatmaps).  In the real model that copy is
    fused with the NHWC->NCHW transpose any layout-correct head needs, so it
    is reported separately rather than charged to the kernel.
    """
    import jax
    import jax.numpy as jnp

    from dsnt_pose2d_tpu.ops.pallas import dsnt_head as dk

    h = w = 64
    key = jax.random.PRNGKey(0)
    x2 = jax.random.normal(key, (rows, h * w), jnp.float32) * 2.0
    x3 = x2.reshape(rows, h, w)
    t = jax.random.uniform(jax.random.PRNGKey(1), (rows, 2), jnp.float32,
                           -0.9, 0.9)
    fused = dk._make_fused(h, w, 1.0, reg, "softmax")

    # Dependency notes: a pallas_call is opaque to XLA, so tapping ONE output
    # element keeps the whole kernel live (no partial DCE) while adding zero
    # consumer traffic — g[0, 0, 0] is the correct roofline consumer.  The
    # outputs c/r are (rows, 2)/(rows,) — summing them is negligible traffic
    # and guards against whole-output DCE.
    @functools.partial(jax.jit, static_argnames=("iters",))
    def run_fwd(x2, t, iters):
        def body(i, acc):
            ti = t + acc * 1e-20
            c, r = fused(x2, ti)
            dep = jnp.sum(c) + (0.0 if reg == "none" else jnp.sum(r))
            return acc + dep * 1e-20

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    def loss(x2, ti):
        c, r = fused(x2, ti)
        s = jnp.sum(c) * 1e-6
        if reg != "none":
            s = s + jnp.sum(r) * 1e-6
        return s

    # value_and_grad, with the VALUE in the dependency: with grad alone the
    # loss value is dead, the cotangents are constants, and partial-eval
    # legitimately DCEs the forward kernel — "fwd+bwd" silently measures bwd
    # only (observed: frac-of-peak > 1).
    @functools.partial(jax.jit, static_argnames=("iters",))
    def run_fwdbwd(x2, t, iters):
        def body(i, acc):
            ti = t + acc * 1e-20
            v, g = jax.value_and_grad(loss)(x2, ti)
            return acc + (v + g[0, 0]) * 1e-20

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run_api(x3, t, iters):
        def body(i, acc):
            ti = t + acc * 1e-20
            c, r = dk.fused_dsnt_head(x3, ti, sigma_px=1.0, reg=reg)
            dep = jnp.sum(c) if r is None else jnp.sum(r) + jnp.sum(c)
            return acc + dep * 1e-20

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    fwd_s = _time_chain(run_fwd, x2, t, iters)
    fb_s = _time_chain(run_fwdbwd, x2, t, iters)
    api_s = _time_chain(run_api, x3, t, iters)
    return fwd_s, fb_s, api_s


def bench_oracle(rows: int, reg: str, iters: int):
    """Same math via the unfused jnp ops (the oracle) — the fusion baseline."""
    import jax
    import jax.numpy as jnp

    from dsnt_pose2d_tpu.ops import activations, losses
    from dsnt_pose2d_tpu.ops.dsnt import dsnt

    h = w = 64
    x = jax.random.normal(jax.random.PRNGKey(0), (rows, h, w), jnp.float32) * 2.0
    t = jax.random.uniform(jax.random.PRNGKey(1), (rows, 2), jnp.float32,
                           -0.9, 0.9)
    reg_fns = {"js": losses.js_reg_losses, "kl": losses.kl_reg_losses,
               "mse": losses.mse_reg_losses}

    def head(x, ti):
        z = activations.flat_softmax(x)
        c = dsnt(z)
        if reg == "none":
            return c, None
        if reg == "var":
            return c, losses.variance_reg_losses(z, 1.0)
        return c, reg_fns[reg](z, ti, 1.0)

    # Oracle deps must touch EVERY row AND every iteration must depend on the
    # loop carry through x itself, or XLA legitimately slices the batch /
    # hoists the loop-invariant softmax+dsnt sub-graph out of the loop (it
    # sees through the jnp composition, unlike an opaque pallas_call).  The
    # x + acc*1e-20 broadcast add fuses into the first consumer, so it adds
    # no HBM traffic.  Summing g also lets XLA fuse the consumer and skip
    # materializing dh — so the oracle numbers are an optimistic bound; the
    # decision-grade comparison is the train-step A/B (bench.py with
    # use_pallas on/off).
    @functools.partial(jax.jit, static_argnames=("iters",))
    def run_fwd(x, t, iters):
        def body(i, acc):
            xi = x + acc * 1e-20
            c, r = head(xi, t)
            dep = jnp.sum(c) if r is None else jnp.sum(r) + jnp.sum(c)
            return acc + dep * 1e-20

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    def loss(x, ti):
        c, r = head(x, ti)
        s = jnp.sum(c) * 1e-6
        if r is not None:
            s = s + jnp.sum(r) * 1e-6
        return s

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run_fwdbwd(x, t, iters):
        def body(i, acc):
            xi = x + acc * 1e-20
            v, g = jax.value_and_grad(loss)(xi, t)
            return acc + (v + jnp.sum(g)) * 1e-20

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    fwd_s = _time_chain(run_fwd, x, t, iters)
    fb_s = _time_chain(run_fwdbwd, x, t, iters)
    return fwd_s, fb_s


def calibrate(rows: int, iters: int):
    """Micro-kernels pinning the chip's achievable ceilings for this layout.

    - copy: out[:] = in[:]          -> achievable HBM GB/s (read+write)
    - exp : out[:] = exp(in[:])     -> transcendental throughput
    - smax: out[:] = softmax row    -> the irreducible VPU cost of the
                                       softmax sub-graph alone

    The fused head's speed-of-light is min(HBM-bound, VPU-bound); these
    measurements make that denominator empirical instead of a datasheet
    number.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h = w = 64
    hwp = h * w
    x = jax.random.normal(jax.random.PRNGKey(0), (rows, hwp), jnp.float32)

    # Each kernel takes the loop-carried accumulator as an SMEM scalar and
    # adds it to the input INSIDE the kernel, so nothing is hoistable and the
    # HBM traffic per iteration is exactly one read + one write of x.
    def _copy_k(s_ref, x_ref, o_ref):
        o_ref[:] = x_ref[:] + s_ref[0]

    def _exp_k(s_ref, x_ref, o_ref):
        o_ref[:] = jnp.exp(x_ref[:] + s_ref[0])

    def _smax_k(s_ref, x_ref, o_ref):
        xs = x_ref[:] + s_ref[0]
        m = jnp.max(xs, axis=1, keepdims=True)
        e = jnp.exp(xs - m)
        o_ref[:] = e / jnp.sum(e, axis=1, keepdims=True)

    def call(kernel, s, x):
        n = x.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(pl.cdiv(n, 128),),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((128, hwp), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((128, hwp), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, hwp), jnp.float32),
        )(s, x)

    def make_runner(kern):
        @functools.partial(jax.jit, static_argnames=("iters",))
        def go(x, iters):
            def body(i, acc):
                y = call(kern, acc.reshape(1) * 1e-20, x)
                return acc + y[0, 0] * 1e-20

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        return lambda x, t, iters: go(x, iters)

    out = {}
    for name, kern in (("copy", _copy_k), ("exp", _exp_k), ("smax", _smax_k)):
        sec = _time_chain(make_runner(kern), x, None, iters)
        bytes_rw = 2 * rows * hwp * 4  # kernel read + write
        out[name] = {"ms": round(sec * 1e3, 3),
                     "gbps_read_write": round(bytes_rw / sec / 1e9, 1)}
    return out


def bench_row_shift(iters: int):
    """Roofline for the second kernel (ops/pallas/row_shift): the shear
    warp's per-row shift at the hg8-flagship pass-1 shape."""
    import jax
    import jax.numpy as jnp

    from dsnt_pose2d_tpu.ops.pallas.row_shift import shift_rows

    r, l, out = 18432, 1354, 836
    rows = jax.random.uniform(jax.random.PRNGKey(0), (r, l), jnp.float32)
    starts = jax.random.randint(jax.random.PRNGKey(1), (r,), 0, l - out - 1)
    fracs = jax.random.uniform(jax.random.PRNGKey(2), (r,), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(rows, starts, iters):
        def body(i, acc):
            s = (starts + acc.astype(jnp.int32)) % (l - out - 1)
            o = shift_rows(rows, s, fracs, out)
            return acc + o[0, 0] * 1e-20

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    sec = _time_chain(lambda a, b, n: run(rows, starts, n), None, None, iters)
    bytes_rw = (r * l + r * out) * 4
    return {"kernel": "row_shift", "rows": r, "l": l, "out": out,
            "ms": round(sec * 1e3, 3),
            "gbps_read_write": round(bytes_rw / sec / 1e9, 1)}


def main():
    import jax

    dev = jax.devices()[0]
    if dev.platform != "tpu":
        print(json.dumps({"error": "bench_kernel requires a TPU device",
                          "platform": dev.platform}))
        sys.exit(1)
    peak = peak_gbps(dev)
    rows = int(os.environ.get("BENCH_ROWS", str(8 * 64 * 16)))  # hg8 @ B=64
    iters = int(os.environ.get("BENCH_KERNEL_ITERS", "16"))
    regs = os.environ.get("BENCH_REGS", "js,none").split(",")
    h = w = 64
    bytes_fwd = rows * h * w * 4
    bytes_fb = 3 * bytes_fwd

    cal = calibrate(rows, iters)
    print(json.dumps({"calibration": cal, "rows": rows,
                      "device": dev.device_kind, "peak_hbm_gbps": peak}),
          flush=True)
    print(json.dumps(bench_row_shift(iters)), flush=True)

    # Empirical speed-of-light: what the DMA engines actually sustain for
    # this access pattern (the copy micro-kernel), not the datasheet number.
    ceiling = cal["copy"]["gbps_read_write"]

    results = []
    for reg in regs:
        fwd_s, fb_s, api_s = bench_fused(rows, reg, iters)
        o_fwd_s, o_fb_s = bench_oracle(rows, reg, iters)
        rec = {
            "kernel": "fused_dsnt_head", "reg": reg,
            "rows": rows, "hw": [h, w], "device": dev.device_kind,
            "peak_hbm_gbps": peak, "measured_copy_gbps": ceiling,
            "fwd_ms": round(fwd_s * 1e3, 3),
            "fwd_gbps": round(bytes_fwd / fwd_s / 1e9, 1),
            "fwd_frac_of_peak": round(bytes_fwd / fwd_s / 1e9 / peak, 3),
            "fwd_frac_of_ceiling": round(bytes_fwd / fwd_s / 1e9 / ceiling, 3),
            "fwdbwd_ms": round(fb_s * 1e3, 3),
            "fwdbwd_gbps": round(bytes_fb / fb_s / 1e9, 1),
            "fwdbwd_frac_of_peak": round(bytes_fb / fb_s / 1e9 / peak, 3),
            "fwdbwd_frac_of_ceiling": round(bytes_fb / fb_s / 1e9 / ceiling, 3),
            "api_reshape_overhead_ms": round((api_s - fwd_s) * 1e3, 3),
            "oracle_fwd_ms": round(o_fwd_s * 1e3, 3),
            "oracle_fwdbwd_ms": round(o_fb_s * 1e3, 3),
            "fusion_speedup_fwd": round(o_fwd_s / fwd_s, 2),
            "fusion_speedup_fwdbwd": round(o_fb_s / fb_s, 2),
        }
        rec["meets_70pct_target"] = (rec["fwd_frac_of_ceiling"] >= 0.7
                                     and rec["fwdbwd_frac_of_ceiling"] >= 0.7)
        results.append(rec)
        print(json.dumps(rec), flush=True)
    return results


if __name__ == "__main__":
    main()
