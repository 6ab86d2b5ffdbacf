"""Fused DSNT-head Pallas kernel: softmax + coordinate expectation + regularizer
in ONE pass over the heatmaps, with a fused custom VJP.

This is the framework's designated custom kernel (BASELINE.json north star;
SURVEY.md C1/C2/C5 and section 3.4): the reference's DSNT head chains ~10-15
small ATen kernels, each re-reading the (B*J, H, W) heatmaps from memory.
Here the whole head is two Pallas kernels, each reading the raw heatmaps from
HBM exactly once:

forward  (per row = one joint heatmap, rows tiled over the grid):
    m  = max(h);  e = exp(h - m);  Z = e / sum(e)           # flat softmax
    x  = <Z, X>;  y = <Z, Y>                                 # DSNT expectation
    G  = normalize(exp(-((X-tx)^2/sx^2 + (Y-ty)^2/sy^2)/2))  # target Gaussian
    reg = JS(Z||G) | KL(Z||G) | MSE(Z,G) | var penalty       # fused reg

backward (recompute-based — no residual heatmap-sized tensors hit HBM):
    u   = gx*X + gy*Y + g_reg * d(reg)/dZ
    dh  = Z * (u - <Z, u>)                                   # softmax VJP

Numerics match the jnp ops in :mod:`dsnt_pose2d_tpu.ops` (the oracle) to
~1e-6 fp32, including the eps-guarded log convention (eps = 1e-24) and its
exact autodiff (the ``Z/(Z+eps)`` terms are kept, so gradients agree with
``jax.grad`` of the oracle even at underflowed-to-zero probabilities).

Layout: rows are (stack*batch*joint) heatmaps flattened to H*W lanes, padded
to a multiple of 128 lanes.  Lane padding uses ``h = -1e30`` (softmax weight
0) and grid coordinate ``1e4`` (Gaussian underflows to 0), so no explicit
masking is needed anywhere.  Runs in interpreter mode off-TPU so the CPU test
suite exercises the same code path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

AVAILABLE = True

_EPS = 1e-24
_ROW_TILE = 128
_LANE = 128
_PAD_NEG = -1e30
_PAD_COORD = 1e4

REG_KINDS = ("none", "js", "kl", "mse", "var")
# Pre-activations the kernel fuses.  The thresholded variant (paper ablation,
# SURVEY.md section 7 item 2) masks logits below the threshold before the
# softmax; the masked softmax VJP is the SAME formula (dropped pixels have
# Z = 0, hence zero gradient), so the backward kernel is shared.  The
# threshold value is a static kernel parameter (ModelConfig.hm_threshold).
PREACT_KINDS = ("softmax", "thresholded_softmax")


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _grids_flat(h: int, w: int, hw_pad: int, scale_x: float = 1.0,
                scale_y: float = 1.0):
    """Flattened normalized X/Y coordinate rows of length hw_pad (padded).

    ``scale_*`` pre-divides the grid by the target-Gaussian sigma so the
    kernel's ``(x - tx) / sx`` becomes a single subtract (one VPU pass saved
    per axis); the pad coordinate stays huge after scaling (sigma < 1), so
    padded lanes still underflow the Gaussian to 0.
    """
    xs = ((2.0 * jnp.arange(w, dtype=jnp.float32) + 1.0) / w - 1.0) * scale_x
    ys = ((2.0 * jnp.arange(h, dtype=jnp.float32) + 1.0) / h - 1.0) * scale_y
    xg = jnp.tile(xs, h)
    yg = jnp.repeat(ys, w)
    pad = hw_pad - h * w
    if pad:
        fill = jnp.full((pad,), _PAD_COORD, jnp.float32)
        xg = jnp.concatenate([xg, fill])
        yg = jnp.concatenate([yg, fill])
    return xg[None, :], yg[None, :]


def _exp_rows(h, preact: str, threshold: float = 0.0):
    """Stable ``(exp(h - max), rowsum)`` pair, plain or thresholded.

    Thresholded (matching :func:`ops.activations.thresholded_softmax`):
    logits below the threshold are excluded from the softmax (probability 0);
    if a whole row falls below, fall back to the plain softmax.  Lane padding
    (``_PAD_NEG``) is below any threshold and keeps weight 0 either way.
    """
    if preact != "softmax":
        keep = h >= threshold
        any_kept = jnp.any(keep, axis=1, keepdims=True)
        h = jnp.where(jnp.logical_or(keep, jnp.logical_not(any_kept)),
                      h, _PAD_NEG)
    m = jnp.max(h, axis=1, keepdims=True)
    e = jnp.exp(h - m)
    return e, jnp.sum(e, axis=1, keepdims=True)


def _activate_rows(h, preact: str, threshold: float = 0.0):
    e, s = _exp_rows(h, preact, threshold)
    return e * (1.0 / s)


def _gauss_rows_scaled(xgs, ygs, txs, tys):
    """Normalized Gaussian from PRE-SCALED (divided-by-sigma) grids/targets."""
    dx = xgs - txs
    dy = ygs - tys
    g = jnp.exp(-0.5 * (dx * dx + dy * dy))
    return g * (1.0 / jnp.maximum(jnp.sum(g, axis=1, keepdims=True), _EPS))


def _reg_value_rows(z, g, xg, yg, reg: str, hw: int, sigma_px, h: int, w: int):
    """Per-row ``(tile, 1)`` regularizer value, matching ops.losses formulas.

    Logs MUST stay in the subtraction form ``log(p+eps) - log(q+eps)``: the
    Mosaic fast ``log`` carries ~1e-4 absolute error, but it is a smooth
    function of the argument, so the errors of two logs at nearby values
    cancel in the difference; the algebraically-equal ratio form
    ``log((p+eps)/(q+eps))`` loses that cancellation (measured: 2.4e-5 JS
    drift vs the oracle, 10x the test tolerance).  All reductions keep dims:
    a ``(tile,)`` intermediate would be laid out along lanes and force a
    sublane<->lane relayout before the store (measured: relayouts, not math,
    dominated the v1 kernel).
    """
    if reg == "js":
        m2e = 0.5 * (z + g) + _EPS
        lm = jnp.log(m2e)
        lz = jnp.log(z + _EPS) - lm
        lg = jnp.log(g + _EPS) - lm
        return 0.5 * (jnp.sum(z * lz, axis=1, keepdims=True)
                      + jnp.sum(g * lg, axis=1, keepdims=True))
    if reg == "kl":
        return jnp.sum(z * (jnp.log(z + _EPS) - jnp.log(g + _EPS)), axis=1,
                       keepdims=True)
    if reg == "mse":
        return jnp.sum((z - g) ** 2, axis=1, keepdims=True) / hw
    if reg == "var":
        mu_x = jnp.sum(z * xg, axis=1, keepdims=True)
        mu_y = jnp.sum(z * yg, axis=1, keepdims=True)
        var_x = jnp.sum(z * xg * xg, axis=1, keepdims=True) - mu_x * mu_x
        var_y = jnp.sum(z * yg * yg, axis=1, keepdims=True) - mu_y * mu_y
        tvx = (2.0 * sigma_px / w) ** 2
        tvy = (2.0 * sigma_px / h) ** 2
        return (var_x - tvx) ** 2 + (var_y - tvy) ** 2
    raise ValueError(reg)


def _reg_grad_rows(z, g, xg, yg, reg: str, hw: int, sigma_px, h: int, w: int):
    """d(reg)/dZ per row-element, exact autodiff of the eps-guarded forward.

    For JS, ``(z+g)/(m2+eps)`` is rewritten as ``2*m2/(m2+eps)`` (m2 is
    already on hand) — exact algebra.  Logs stay in subtraction form for the
    Mosaic fast-log error cancellation (see :func:`_reg_value_rows`).
    """
    if reg == "js":
        m2 = 0.5 * (z + g)
        m2e = m2 + _EPS
        return (0.5 * (jnp.log(z + _EPS) - jnp.log(m2e))
                + 0.5 * z / (z + _EPS)
                - 0.5 * m2 / m2e)
    if reg == "kl":
        return jnp.log(z + _EPS) - jnp.log(g + _EPS) + z / (z + _EPS)
    if reg == "mse":
        return 2.0 * (z - g) / hw
    if reg == "var":
        mu_x = jnp.sum(z * xg, axis=1, keepdims=True)
        mu_y = jnp.sum(z * yg, axis=1, keepdims=True)
        var_x = jnp.sum(z * xg * xg, axis=1, keepdims=True) - mu_x * mu_x
        var_y = jnp.sum(z * yg * yg, axis=1, keepdims=True) - mu_y * mu_y
        tvx = (2.0 * sigma_px / w) ** 2
        tvy = (2.0 * sigma_px / h) ** 2
        return (2.0 * (var_x - tvx) * (xg * xg - 2.0 * mu_x * xg)
                + 2.0 * (var_y - tvy) * (yg * yg - 2.0 * mu_y * yg))
    raise ValueError(reg)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(reg: str, preact: str, threshold: float, hw: int,
                sigma_px: float, h: int, w: int, x_ref, t_ref, xg_ref,
                yg_ref, xgs_ref, ygs_ref, coords_ref, reg_ref):
    xg = xg_ref[:]                       # (1, HWp) broadcasts over rows
    yg = yg_ref[:]
    if reg == "none":
        # The reg output is unused by callers in this mode, but VMEM outputs
        # must still be written (uninitialized reads are garbage on TPU).
        reg_ref[:] = jnp.zeros_like(reg_ref)
        # Defer normalization to the (tile, 1) scalars — z never materializes.
        e, s = _exp_rows(x_ref[:], preact, threshold)
        rs = 1.0 / s
        cx = jnp.sum(e * xg, axis=1, keepdims=True) * rs
        cy = jnp.sum(e * yg, axis=1, keepdims=True) * rs
        coords_ref[:] = jnp.concatenate([cx, cy], axis=1)
        return
    z = _activate_rows(x_ref[:], preact, threshold)
    cx = jnp.sum(z * xg, axis=1, keepdims=True)
    cy = jnp.sum(z * yg, axis=1, keepdims=True)
    coords_ref[:] = jnp.concatenate([cx, cy], axis=1)
    g = None
    if reg in ("js", "kl", "mse"):
        inv_sx = w / (2.0 * sigma_px)
        inv_sy = h / (2.0 * sigma_px)
        g = _gauss_rows_scaled(xgs_ref[:], ygs_ref[:],
                               t_ref[:, 0:1] * inv_sx, t_ref[:, 1:2] * inv_sy)
    reg_ref[:] = _reg_value_rows(z, g, xg, yg, reg, hw, sigma_px, h, w)


def _bwd_kernel(reg: str, preact: str, threshold: float, hw: int,
                sigma_px: float, h: int, w: int, x_ref, t_ref, gc_ref,
                gr_ref, xg_ref, yg_ref, xgs_ref, ygs_ref, dh_ref):
    z = _activate_rows(x_ref[:], preact, threshold)
    xg = xg_ref[:]
    yg = yg_ref[:]
    gc = gc_ref[:]
    u = gc[:, 0:1] * xg + gc[:, 1:2] * yg
    if reg != "none":
        g = None
        if reg in ("js", "kl", "mse"):
            inv_sx = w / (2.0 * sigma_px)
            inv_sy = h / (2.0 * sigma_px)
            g = _gauss_rows_scaled(xgs_ref[:], ygs_ref[:],
                                   t_ref[:, 0:1] * inv_sx,
                                   t_ref[:, 1:2] * inv_sy)
        u = u + gr_ref[:] * _reg_grad_rows(z, g, xg, yg, reg, hw, sigma_px, h, w)
    dh_ref[:] = z * (u - jnp.sum(z * u, axis=1, keepdims=True))


# ---------------------------------------------------------------------------
# pallas_call wrappers.
#
# Deliberately NOT wrapped in jax.jit: a nested jit inside the custom_vjp
# lowers to an XLA closed_call boundary around the pallas custom-call, which
# costs ~0.2 ms of un-overlappable launch overhead PER INVOCATION on v5e
# (measured: the identical kernel runs 3x faster without it — 664 vs
# 205 GB/s effective on the reg=none forward).  Under the training step's
# outer jit these trace inline; eager calls still hit XLA's per-shape
# executable cache via pallas_call itself.
# ---------------------------------------------------------------------------

def _row_spec(tile, width):
    return pl.BlockSpec((tile, width), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _bcast_spec(width):
    return pl.BlockSpec((1, width), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)


def _fwd_call(x2, t2, xg, yg, xgs, ygs, *, reg, preact, threshold, hw,
              sigma_px, h, w):
    n, hwp = x2.shape
    grid = (pl.cdiv(n, _ROW_TILE),)
    kernel = functools.partial(_fwd_kernel, reg, preact, threshold, hw,
                               sigma_px, h, w)
    out_shape = [jax.ShapeDtypeStruct((n, 2), jnp.float32),
                 jax.ShapeDtypeStruct((n, 1), jnp.float32)]
    out_specs = [_row_spec(_ROW_TILE, 2), _row_spec(_ROW_TILE, 1)]
    transc = 2 * n * hwp if reg in ("js", "kl") else n * hwp
    coords, regv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[_row_spec(_ROW_TILE, hwp), _row_spec(_ROW_TILE, 2),
                  _bcast_spec(hwp), _bcast_spec(hwp),
                  _bcast_spec(hwp), _bcast_spec(hwp)],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=10 * n * hwp, transcendentals=transc,
            bytes_accessed=4 * n * hwp),
        interpret=_interpret(),
    )(x2, t2, xg, yg, xgs, ygs)
    return coords, regv[:, 0]


def _bwd_call(x2, t2, gc, gr, xg, yg, xgs, ygs, *, reg, preact, threshold,
              hw, sigma_px, h, w):
    n, hwp = x2.shape
    grid = (pl.cdiv(n, _ROW_TILE),)
    kernel = functools.partial(_bwd_kernel, reg, preact, threshold, hw,
                               sigma_px, h, w)
    transc = 2 * n * hwp if reg in ("js", "kl") else n * hwp
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[_row_spec(_ROW_TILE, hwp), _row_spec(_ROW_TILE, 2),
                  _row_spec(_ROW_TILE, 2), _row_spec(_ROW_TILE, 1),
                  _bcast_spec(hwp), _bcast_spec(hwp),
                  _bcast_spec(hwp), _bcast_spec(hwp)],
        out_specs=_row_spec(_ROW_TILE, hwp),
        out_shape=jax.ShapeDtypeStruct((n, hwp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=12 * n * hwp, transcendentals=transc,
            bytes_accessed=8 * n * hwp),
        interpret=_interpret(),
    )(x2, t2, gc, gr, xg, yg, xgs, ygs)


@functools.lru_cache(maxsize=None)
def _make_fused(h: int, w: int, sigma_px: float, reg: str, preact: str,
                threshold: float = 0.0):
    hw = h * w
    hw_pad = -(-hw // _LANE) * _LANE
    inv_sx = w / (2.0 * sigma_px)
    inv_sy = h / (2.0 * sigma_px)

    def _prep(raw2):
        pad = hw_pad - hw
        if pad:
            raw2 = jnp.pad(raw2, ((0, 0), (0, pad)), constant_values=_PAD_NEG)
        return raw2

    def _grids():
        xg, yg = _grids_flat(h, w, hw_pad)
        xgs, ygs = _grids_flat(h, w, hw_pad, inv_sx, inv_sy)
        return xg, yg, xgs, ygs

    @jax.custom_vjp
    def fused(raw2, targets2):
        xg, yg, xgs, ygs = _grids()
        coords, regv = _fwd_call(_prep(raw2), targets2, xg, yg, xgs, ygs,
                                 reg=reg, preact=preact, threshold=threshold,
                                 hw=hw, sigma_px=sigma_px, h=h, w=w)
        return coords, regv

    def fwd(raw2, targets2):
        out = fused(raw2, targets2)
        return out, (raw2, targets2)

    def bwd(res, cts):
        raw2, targets2 = res
        g_coords, g_reg = cts
        xg, yg, xgs, ygs = _grids()
        dh = _bwd_call(_prep(raw2), targets2,
                       g_coords.astype(jnp.float32),
                       g_reg.astype(jnp.float32)[:, None], xg, yg, xgs, ygs,
                       reg=reg, preact=preact, threshold=threshold, hw=hw,
                       sigma_px=sigma_px, h=h, w=w)
        return dh[:, :hw], None

    fused.defvjp(fwd, bwd)
    return fused


def fused_dsnt_head(raw, target_coords=None, sigma_px: float = 1.0,
                    reg: str = "js", preact: str = "softmax",
                    threshold: float = 0.0):
    """Fused flat-softmax + DSNT + regularizer over ``(..., H, W)`` heatmaps.

    Args:
        raw: unactivated heatmaps, any leading shape.
        target_coords: ``(..., 2)`` normalized targets (required unless
            ``reg == 'none'`` or ``reg == 'var'``); ``None`` disables the
            Gaussian-based regularizers.
        sigma_px: target Gaussian sigma in pixels (static).
        reg: one of ``none | js | kl | mse | var`` (static).
        threshold: logit cutoff for ``preact='thresholded_softmax'`` (static;
            ignored for plain softmax).

    Returns:
        ``(coords, reg_losses)`` with ``coords`` shaped ``(..., 2)`` and
        ``reg_losses`` shaped like the leading dims (``None`` when
        ``reg == 'none'``).
    """
    if reg not in REG_KINDS:
        raise ValueError(f"unknown reg {reg!r}")
    if preact not in PREACT_KINDS:
        raise ValueError(f"preact {preact!r} is not fused (supported: "
                         f"{PREACT_KINDS}); use the jnp ops path")
    *lead, h, w = raw.shape
    n = math.prod(lead) if lead else 1
    raw2 = raw.reshape(n, h * w).astype(jnp.float32)
    if target_coords is None:
        if reg in ("js", "kl", "mse"):
            reg = "none"
        targets2 = jnp.zeros((n, 2), jnp.float32)
    else:
        targets2 = target_coords.reshape(n, 2).astype(jnp.float32)
    coords, regv = _make_fused(h, w, float(sigma_px), reg, preact,
                               float(threshold))(raw2, targets2)
    coords = coords.reshape(*lead, 2)
    if reg == "none":
        return coords, None
    return coords, regv.reshape(lead)
