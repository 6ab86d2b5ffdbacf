"""Pallas row-shift kernel: per-row dynamic slice + fractional lerp.

The shear-decomposed augmentation warp needs ``out[r] = rows_r[k_r : k_r+W]``
blended with the next column (a per-row fractional 1-D shift).  Expressed as
``jax.lax.gather`` with a per-row start index, XLA:TPU lowers it to a SERIAL
scalar while-loop over rows (measured ~2 us/row — 36 ms/step at hg8 batch
16, worse than the per-pixel gather it was meant to replace).  This kernel
does the same thing as a pipelined Pallas grid: row offsets ride scalar
prefetch (SMEM), each grid step aligns its block's rows from VMEM at their
dynamic offsets and lerps — pure DMA + a few VPU passes.

Two implementations, selectable for A/B benchmarking
(``tools/bench_row_shift.py``):

``vec`` (default): per-row work is split into a coarse 128-aligned dynamic
slice (one short per-row loop — lane-dim dynamic slices must be 128-aligned
on TPU) and a sub-128 residual rotate done as a 7-step conditional
STATIC-roll ladder vectorized across the whole row block.  Static rolls are
exact at any lane width (no power-of-two constraint) and each ladder step
is a full-(block)-height VPU op, so the VPU runs at full sublane
utilization.  The per-row residuals ``k mod 128`` and blend fractions ride
in as (R, 1) VMEM vectors (computed by the wrapper) so the kernel never
builds vectors from SMEM scalars.  Measured at the flagship shear shapes
(v5e, median of 5 two-point repeats, bitwise-equal outputs): x-shear
(6144,3864)->2502 legacy 1.98 ms -> vec 0.82 ms, y-shear (4096,1674)->768
legacy 0.84 ms -> vec 0.22 ms — ~2.7x, ~1.8 ms saved per hg8/b16 train step.

``legacy``: the round-2 kernel — per-row dynamic slice + ONE dynamic
``pltpu.roll`` per row.  Correct, but every roll is a (1, win) op using 1 of
8 sublanes (~12% VPU utilization); the round-3 trace measured it 10-26x off
the HBM copy ceiling.  CAVEAT pinned by measurement AND covered by
tests/test_pallas.py::test_row_shift_*: compiled dynamic ``pltpu.roll`` is
only correct when the lane width is a POWER OF TWO (384 lanes produced
garbage; 256/512/1024 are exact), so this path rounds ``win`` up to a power
of two.

Used by :func:`dsnt_pose2d_tpu.data.augment.affine_warp_shear`; runs in
interpreter mode off-TPU so CPU tests exercise the same code path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 32  # rows per grid step (A/B'd: 8/16/32/64 -> 32 fastest at the flagship shapes)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel_vec(out_len: int, win: int, stride: int, k_ref, klo_ref, f_ref,
                in_ref, out_ref, scratch_ref):
    base = pl.program_id(0) * _ROWS

    # Coarse: copy each row's 128-aligned window into the scratch block.
    def body(i, carry):
        k = k_ref[base + i]
        k_hi = pl.multiple_of((k // 128) * 128, 128)
        scratch_ref[pl.ds(i, 1), :] = in_ref[pl.ds(i, 1), pl.ds(k_hi, win)]
        return carry

    jax.lax.fori_loop(0, _ROWS, body, 0, unroll=True)

    # Fine: left-rotate row i by k_lo_i < 128 via 7 conditional STATIC
    # rolls, each a full-block VPU op (the whole point vs `legacy`).
    x = scratch_ref[:, :]
    k_lo = klo_ref[:, :]                       # (_ROWS, 1) int32
    for bit in range(7):
        sh = 1 << bit
        rolled = pltpu.roll(x, win - sh, 1)    # left-rotate by sh
        x = jnp.where((k_lo & sh) == sh, rolled, x)
    f = f_ref[:, :]                            # (_ROWS, 1) f32
    out_ref[:, :] = ((1.0 - f) * x[:, :out_len]
                     + f * x[:, stride:out_len + stride])


def _kernel_legacy(out_len: int, win: int, stride: int, k_ref, f_ref, in_ref,
                   out_ref):
    base = pl.program_id(0) * _ROWS

    def body(i, carry):
        k = k_ref[base + i]
        f = f_ref[base + i]
        k_hi = pl.multiple_of((k // 128) * 128, 128)
        k_lo = k - k_hi
        row = in_ref[pl.ds(i, 1), pl.ds(k_hi, win)]
        row = pltpu.roll(row, win - k_lo, 1)   # left-rotate k_lo, shift >= 0
        out_ref[pl.ds(i, 1), :] = ((1.0 - f) * row[:, :out_len]
                                   + f * row[:, stride:out_len + stride])
        return carry

    jax.lax.fori_loop(0, _ROWS, body, 0)


@functools.partial(jax.jit, static_argnames=("out_len", "stride", "impl"))
def shift_rows(rows: jnp.ndarray, starts: jnp.ndarray, fracs: jnp.ndarray,
               out_len: int, stride: int = 1, impl: str = "vec"
               ) -> jnp.ndarray:
    """``out[r, i] = (1-f) * rows[r, k_r + i] + f * rows[r, k_r + i + stride]``.

    ``stride`` is the element distance of the second bilinear tap: 1 for
    scalar rows, C for channel-INTERLEAVED rows (a shift of one pixel is C
    elements, which lets all C channels of an image row share one kernel
    row — 3x fewer per-row loop iterations than channel-planar).

    Args:
        rows: ``(R, L)`` float32; caller pre-pads so every read is in range.
        starts: ``(R,)`` int32 slice starts, each in
            ``[0, L - out_len - stride]``.
        fracs: ``(R,)`` float32 fractional blend weights.
        out_len: static output row length.
        impl: ``"vec"`` (vectorized ladder, default) or ``"legacy"``.

    R is padded to a multiple of the block row count internally.
    """
    r, l = rows.shape
    rp = -(-r // _ROWS) * _ROWS
    # Window: 128-aligned start <= k, plus out_len + stride values, plus the
    # <128 rotate residual.  The ladder uses STATIC rolls (exact at any
    # width) so `vec` only rounds to the 128 lane tile; `legacy`'s dynamic
    # roll needs a POWER OF TWO (see module docstring).
    if impl == "vec":
        win = -(-(out_len + stride + 127) // 128) * 128
    else:
        win = 128
        while win < out_len + stride + 127:
            win *= 2
    # Rows are right-padded so the furthest aligned window stays in range.
    lp = max(l, ((l - out_len - stride) // 128) * 128 + win)
    if rp != r or lp != l:
        rows = jnp.pad(rows, ((0, rp - r), (0, lp - l)))
        starts = jnp.pad(starts, (0, rp - r))
        fracs = jnp.pad(fracs, (0, rp - r))
    starts = starts.astype(jnp.int32)
    fracs = fracs.astype(jnp.float32)
    rows = rows.astype(jnp.float32)

    if impl == "vec":
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(rp // _ROWS,),
            in_specs=[
                pl.BlockSpec((_ROWS, 1), lambda i, k: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_ROWS, 1), lambda i, k: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_ROWS, lp), lambda i, k: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_ROWS, out_len), lambda i, k: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((_ROWS, win), jnp.float32)],
        )
        out = pl.pallas_call(
            functools.partial(_kernel_vec, out_len, win, stride),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((rp, out_len), jnp.float32),
            interpret=_interpret(),
        )(starts, (starts % 128)[:, None], fracs[:, None], rows)
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(rp // _ROWS,),
            in_specs=[pl.BlockSpec((_ROWS, lp), lambda i, k, f: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((_ROWS, out_len), lambda i, k, f: (i, 0),
                                   memory_space=pltpu.VMEM),
        )
        out = pl.pallas_call(
            functools.partial(_kernel_legacy, out_len, win, stride),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((rp, out_len), jnp.float32),
            interpret=_interpret(),
        )(starts, fracs, rows)
    return out[:r]
