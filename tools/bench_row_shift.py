"""Micro-A/B of the row-shift kernel implementations on TPU.

The round-3 flagship trace measured the `legacy` kernel 10-26x off the HBM
copy ceiling: its per-row dynamic `pltpu.roll` is a (1, win) op using 1 of
8 sublanes.  The `vec` kernel vectorizes the sub-128 residual rotate as a
7-step conditional static-roll ladder over the whole row block.  This
benchmark times both at the exact shapes the hg8/batch-16 train step uses
(from the trace: x-shear 6144x3864 -> 2502, y-shear 4096x1674 -> 768,
stride 3) plus the HBM copy ceiling for the same bytes.

Usage: python tools/bench_row_shift.py [--iters 50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--iters", type=int, default=50)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dsnt_pose2d_tpu.ops.pallas.row_shift import shift_rows

    # (rows, row_len, out_len, stride): the two flagship shear passes.
    cases = [(6144, 3864, 2502, 3), (4096, 1674, 768, 3)]

    for r, l, out, stride in cases:
        rng = np.random.default_rng(0)
        rows = jnp.asarray(rng.uniform(size=(r, l)).astype(np.float32))
        starts = jnp.asarray(
            rng.integers(0, (l - out - stride) // stride,
                         size=(r,)).astype(np.int32) * stride)
        fracs = jnp.asarray(rng.uniform(size=(r,)).astype(np.float32))

        res = {}
        for impl in ("legacy", "vec"):
            fn = jax.jit(lambda a, b, c, impl=impl: shift_rows(
                a, b, c, out, stride=stride, impl=impl))
            y = fn(rows, starts, fracs)
            float(jax.device_get(jnp.sum(y)))

            def run(n):
                t0 = time.time()
                s = None
                for _ in range(n):
                    s = jnp.sum(fn(rows, starts, fracs))
                float(jax.device_get(s))
                return time.time() - t0

            run(3)
            t1, t2 = run(args.iters), run(2 * args.iters)
            res[impl] = (t2 - t1) / args.iters

        # equality of the two impls on the same inputs
        ya = shift_rows(rows, starts, fracs, out, stride=stride, impl="vec")
        yb = shift_rows(rows, starts, fracs, out, stride=stride,
                        impl="legacy")
        eq = float(jnp.max(jnp.abs(ya - yb)))

        bytes_min = (r * l + r * out) * 4  # one read + one write
        for impl, t in res.items():
            gbs = bytes_min / t / 1e9
            print(f"({r},{l})->{out} s{stride}  {impl:6s} "
                  f"{t * 1e3:7.3f} ms  {gbs:6.1f} GB/s-effective")
        print(f"  speedup {res['legacy'] / res['vec']:.2f}x  "
              f"max|vec-legacy| = {eq:.2e}")


if __name__ == "__main__":
    main()
