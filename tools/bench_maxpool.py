"""Micro-A/B: reduce_window max-pool vs reshape-max 2x2 pool, fwd+bwd, on TPU.

The round-2 step trace put "maxpool backward" in the ~9.5 ms small-op tail:
`nn.max_pool`'s gradient lowers to SelectAndScatter, which is notoriously
slow on XLA:TPU.  A 2x2/2 pool can instead be written as
reshape -> max over the two window axes; the forward is bit-identical and
the backward is an elementwise equality mask (ties split evenly instead of
first-wins — a subgradient choice with no eval-parity surface).

Usage: python tools/bench_maxpool.py [--batch 16] [--iters 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def reshape_pool(x):
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).max(axis=(2, 4))


def main():
    p = argparse.ArgumentParser(__doc__)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import flax.linen as nn_
    import numpy as np

    # Hourglass pool shapes at batch B: stem (192,192,64) once, then per
    # stack the 4 recursion levels (64->8 px) at 256 ch.
    shapes = [(args.batch, 192, 192, 64)] + [
        (args.batch, s, s, 256) for s in (64, 32, 16, 8)]

    def window_pool(x):
        return nn_.max_pool(x, (2, 2), strides=(2, 2))

    for shape in shapes:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, shape, jnp.bfloat16)

        results = {}
        for name, fn in (("window", window_pool), ("reshape", reshape_pool)):
            def loss(x):
                return jnp.sum(fn(x).astype(jnp.float32) ** 2)

            g = jax.jit(jax.grad(loss))
            # two-point fetch-forced timing (axon tunnel: only a value
            # fetch is a true barrier)
            def run(n):
                t0 = time.time()
                y = x
                for _ in range(n):
                    y = g(y)
                float(jax.device_get(jnp.sum(y.astype(jnp.float32))))
                return time.time() - t0

            run(2)  # warmup
            t1 = run(args.iters)
            t2 = run(2 * args.iters)
            results[name] = (t2 - t1) / args.iters * 1e3

        # numerics: forward identical
        fwd_eq = bool(jnp.all(window_pool(x) == reshape_pool(x)))
        w, r = results["window"], results["reshape"]
        print(f"{str(shape):>22}  window {w:7.3f} ms  reshape {r:7.3f} ms  "
              f"speedup {w / r:5.2f}x  fwd_equal={fwd_eq}")


if __name__ == "__main__":
    main()
