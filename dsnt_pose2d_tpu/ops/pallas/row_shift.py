"""Pallas row-shift kernel: per-row dynamic slice + fractional lerp.

The shear-decomposed augmentation warp needs ``out[r] = rows_r[k_r : k_r+W]``
blended with the next column (a per-row fractional 1-D shift).  Expressed as
``jax.lax.gather`` with a per-row start index, XLA:TPU lowers it to a SERIAL
scalar while-loop over rows (measured ~2 us/row — 36 ms/step at hg8 batch
16, worse than the per-pixel gather it was meant to replace).  This kernel
does the same thing as a pipelined Pallas grid: row offsets ride scalar
prefetch (SMEM), each grid step copies its block's rows from VMEM at their
dynamic offsets and lerps — pure DMA + one VPU pass.

Used by :func:`dsnt_pose2d_tpu.data.augment.affine_warp_shear`; runs in
interpreter mode off-TPU so CPU tests exercise the same code path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 8  # rows per grid step


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(out_len: int, win: int, stride: int, k_ref, f_ref, in_ref,
            out_ref):
    # Lane-dim dynamic slices must be 128-aligned on TPU: slice an aligned
    # window covering [k, k + out_len + 1] and left-rotate the sub-128
    # remainder in-register with ONE dynamic roll.  CAVEAT pinned by
    # measurement AND covered by tests/test_pallas.py::test_row_shift_*:
    # compiled dynamic pltpu.roll is only correct when the lane width is a
    # POWER OF TWO (384 lanes produced garbage; 256/512/1024 are exact), so
    # the wrapper rounds `win` up to a power of two.  (A 7-step conditional
    # static-roll ladder is correct at any width but costs ~14 row passes —
    # it erased the kernel's speed advantage.)
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


@functools.partial(jax.jit, static_argnames=("out_len", "stride"))
def shift_rows(rows: jnp.ndarray, starts: jnp.ndarray, fracs: jnp.ndarray,
               out_len: int, stride: int = 1) -> jnp.ndarray:
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

    R is padded to a multiple of the block row count internally.
    """
    r, l = rows.shape
    rp = -(-r // _ROWS) * _ROWS
    # Window: 128-aligned start <= k plus out_len + 1 values plus the <128
    # rotate remainder, rounded up to a POWER OF TWO of lanes (dynamic
    # in-register rotate is only correct at power-of-two widths — see
    # _kernel); rows are right-padded so the furthest aligned window stays
    # in range.
    win = 128
    while win < out_len + stride + 127:
        win *= 2
    lp = max(l, ((l - out_len - stride) // 128) * 128 + win)
    if rp != r or lp != l:
        rows = jnp.pad(rows, ((0, rp - r), (0, lp - l)))
        starts = jnp.pad(starts, (0, rp - r))
        fracs = jnp.pad(fracs, (0, rp - r))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(rp // _ROWS,),
        in_specs=[pl.BlockSpec((_ROWS, lp), lambda i, k, f: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_ROWS, out_len), lambda i, k, f: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, out_len, win, stride),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((rp, out_len), jnp.float32),
        interpret=_interpret(),
    )(starts.astype(jnp.int32), fracs.astype(jnp.float32),
      rows.astype(jnp.float32))
    return out[:r]
