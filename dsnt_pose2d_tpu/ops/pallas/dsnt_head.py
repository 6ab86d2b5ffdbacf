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
# Z = 0, hence zero gradient), so the backward kernel is shared.
PREACT_KINDS = ("softmax", "thresholded_softmax")
_THRESHOLD = 0.0  # ops.activations.thresholded_softmax default


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _grids_flat(h: int, w: int, hw_pad: int):
    """Flattened normalized X/Y coordinate rows of length hw_pad (padded)."""
    xs = (2.0 * jnp.arange(w, dtype=jnp.float32) + 1.0) / w - 1.0
    ys = (2.0 * jnp.arange(h, dtype=jnp.float32) + 1.0) / h - 1.0
    xg = jnp.tile(xs, h)
    yg = jnp.repeat(ys, w)
    pad = hw_pad - h * w
    if pad:
        fill = jnp.full((pad,), _PAD_COORD, jnp.float32)
        xg = jnp.concatenate([xg, fill])
        yg = jnp.concatenate([yg, fill])
    return xg[None, :], yg[None, :]


def _softmax_rows(h):
    m = jnp.max(h, axis=1, keepdims=True)
    e = jnp.exp(h - m)
    s = jnp.sum(e, axis=1, keepdims=True)
    return e / s


def _activate_rows(h, preact: str):
    """Row activation: plain or thresholded flat softmax.

    Thresholded (matching :func:`ops.activations.thresholded_softmax`):
    logits below the threshold are excluded from the softmax (probability 0);
    if a whole row falls below, fall back to the plain softmax.  Lane padding
    (``_PAD_NEG``) is below any threshold and keeps weight 0 either way.
    """
    if preact == "softmax":
        return _softmax_rows(h)
    keep = h >= _THRESHOLD
    any_kept = jnp.any(keep, axis=1, keepdims=True)
    masked = jnp.where(jnp.logical_or(keep, jnp.logical_not(any_kept)),
                       h, _PAD_NEG)
    return _softmax_rows(masked)


def _gauss_rows(xg, yg, t, sx, sy):
    dx = (xg - t[:, 0:1]) / sx
    dy = (yg - t[:, 1:2]) / sy
    g = jnp.exp(-0.5 * (dx * dx + dy * dy))
    return g / jnp.maximum(jnp.sum(g, axis=1, keepdims=True), _EPS)


def _reg_value_rows(z, g, xg, yg, reg: str, hw: int, sigma_px, h: int, w: int):
    """Per-row regularizer value, matching ops.losses formulas exactly."""
    if reg == "js":
        m2 = 0.5 * (z + g)
        lz = jnp.log(z + _EPS) - jnp.log(m2 + _EPS)
        lg = jnp.log(g + _EPS) - jnp.log(m2 + _EPS)
        return 0.5 * jnp.sum(z * lz, axis=1) + 0.5 * jnp.sum(g * lg, axis=1)
    if reg == "kl":
        return jnp.sum(z * (jnp.log(z + _EPS) - jnp.log(g + _EPS)), axis=1)
    if reg == "mse":
        return jnp.sum((z - g) ** 2, axis=1) / hw
    if reg == "var":
        mu_x = jnp.sum(z * xg, axis=1)
        mu_y = jnp.sum(z * yg, axis=1)
        var_x = jnp.sum(z * xg * xg, axis=1) - mu_x * mu_x
        var_y = jnp.sum(z * yg * yg, axis=1) - mu_y * mu_y
        tvx = (2.0 * sigma_px / w) ** 2
        tvy = (2.0 * sigma_px / h) ** 2
        return (var_x - tvx) ** 2 + (var_y - tvy) ** 2
    raise ValueError(reg)


def _reg_grad_rows(z, g, xg, yg, reg: str, hw: int, sigma_px, h: int, w: int):
    """d(reg)/dZ per row-element, exact autodiff of the eps-guarded forward."""
    if reg == "js":
        m2 = 0.5 * (z + g)
        return (0.5 * (jnp.log(z + _EPS) - jnp.log(m2 + _EPS))
                + 0.5 * z / (z + _EPS)
                - 0.25 * (z + g) / (m2 + _EPS))
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

def _fwd_kernel(reg: str, preact: str, hw: int, sigma_px: float, h: int,
                w: int, x_ref, t_ref, xg_ref, yg_ref, coords_ref, reg_ref):
    z = _activate_rows(x_ref[:], preact)
    xg = xg_ref[:]                       # (1, HWp) broadcasts over rows
    yg = yg_ref[:]
    cx = jnp.sum(z * xg, axis=1)
    cy = jnp.sum(z * yg, axis=1)
    coords_ref[:] = jnp.stack([cx, cy], axis=1)
    if reg != "none":
        g = None
        if reg in ("js", "kl", "mse"):
            sx = 2.0 * sigma_px / w
            sy = 2.0 * sigma_px / h
            g = _gauss_rows(xg, yg, t_ref[:], sx, sy)
        val = _reg_value_rows(z, g, xg, yg, reg, hw, sigma_px, h, w)
        reg_ref[:] = val[:, None]


def _bwd_kernel(reg: str, preact: str, hw: int, sigma_px: float, h: int,
                w: int, x_ref, t_ref, gc_ref, gr_ref, xg_ref, yg_ref, dh_ref):
    z = _activate_rows(x_ref[:], preact)
    xg = xg_ref[:]
    yg = yg_ref[:]
    gc = gc_ref[:]
    u = gc[:, 0:1] * xg + gc[:, 1:2] * yg
    if reg != "none":
        g = None
        if reg in ("js", "kl", "mse"):
            sx = 2.0 * sigma_px / w
            sy = 2.0 * sigma_px / h
            g = _gauss_rows(xg, yg, t_ref[:], sx, sy)
        u = u + gr_ref[:] * _reg_grad_rows(z, g, xg, yg, reg, hw, sigma_px, h, w)
    dh_ref[:] = z * (u - jnp.sum(z * u, axis=1, keepdims=True))


# ---------------------------------------------------------------------------
# pallas_call wrappers (cached per static config)
# ---------------------------------------------------------------------------

def _row_spec(tile, width):
    return pl.BlockSpec((tile, width), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _bcast_spec(width):
    return pl.BlockSpec((1, width), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.jit, static_argnames=("reg", "preact", "hw",
                                              "sigma_px", "h", "w"))
def _fwd_call(x2, t2, xg, yg, *, reg, preact, hw, sigma_px, h, w):
    n, hwp = x2.shape
    grid = (pl.cdiv(n, _ROW_TILE),)
    kernel = functools.partial(_fwd_kernel, reg, preact, hw, sigma_px, h, w)
    out_shape = [jax.ShapeDtypeStruct((n, 2), jnp.float32),
                 jax.ShapeDtypeStruct((n, 1), jnp.float32)]
    out_specs = [_row_spec(_ROW_TILE, 2), _row_spec(_ROW_TILE, 1)]
    transc = 2 * n * hwp if reg in ("js", "kl") else n * hwp
    coords, regv = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[_row_spec(_ROW_TILE, hwp), _row_spec(_ROW_TILE, 2),
                  _bcast_spec(hwp), _bcast_spec(hwp)],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=10 * n * hwp, transcendentals=transc,
            bytes_accessed=4 * n * hwp),
        interpret=_interpret(),
    )(x2, t2, xg, yg)
    return coords, regv[:, 0]


@functools.partial(jax.jit, static_argnames=("reg", "preact", "hw",
                                              "sigma_px", "h", "w"))
def _bwd_call(x2, t2, gc, gr, xg, yg, *, reg, preact, hw, sigma_px, h, w):
    n, hwp = x2.shape
    grid = (pl.cdiv(n, _ROW_TILE),)
    kernel = functools.partial(_bwd_kernel, reg, preact, hw, sigma_px, h, w)
    transc = 2 * n * hwp if reg in ("js", "kl") else n * hwp
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[_row_spec(_ROW_TILE, hwp), _row_spec(_ROW_TILE, 2),
                  _row_spec(_ROW_TILE, 2), _row_spec(_ROW_TILE, 1),
                  _bcast_spec(hwp), _bcast_spec(hwp)],
        out_specs=_row_spec(_ROW_TILE, hwp),
        out_shape=jax.ShapeDtypeStruct((n, hwp), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=12 * n * hwp, transcendentals=transc,
            bytes_accessed=8 * n * hwp),
        interpret=_interpret(),
    )(x2, t2, gc, gr, xg, yg)


@functools.lru_cache(maxsize=None)
def _make_fused(h: int, w: int, sigma_px: float, reg: str, preact: str):
    hw = h * w
    hw_pad = -(-hw // _LANE) * _LANE

    def _prep(raw2):
        pad = hw_pad - hw
        if pad:
            raw2 = jnp.pad(raw2, ((0, 0), (0, pad)), constant_values=_PAD_NEG)
        return raw2

    @jax.custom_vjp
    def fused(raw2, targets2):
        xg, yg = _grids_flat(h, w, hw_pad)
        coords, regv = _fwd_call(_prep(raw2), targets2, xg, yg, reg=reg,
                                 preact=preact, hw=hw, sigma_px=sigma_px,
                                 h=h, w=w)
        return coords, regv

    def fwd(raw2, targets2):
        out = fused(raw2, targets2)
        return out, (raw2, targets2)

    def bwd(res, cts):
        raw2, targets2 = res
        g_coords, g_reg = cts
        xg, yg = _grids_flat(h, w, hw_pad)
        dh = _bwd_call(_prep(raw2), targets2,
                       g_coords.astype(jnp.float32),
                       g_reg.astype(jnp.float32)[:, None], xg, yg,
                       reg=reg, preact=preact, hw=hw, sigma_px=sigma_px,
                       h=h, w=w)
        return dh[:, :hw], None

    fused.defvjp(fwd, bwd)
    return fused


def fused_dsnt_head(raw, target_coords=None, sigma_px: float = 1.0,
                    reg: str = "js", preact: str = "softmax"):
    """Fused flat-softmax + DSNT + regularizer over ``(..., H, W)`` heatmaps.

    Args:
        raw: unactivated heatmaps, any leading shape.
        target_coords: ``(..., 2)`` normalized targets (required unless
            ``reg == 'none'`` or ``reg == 'var'``); ``None`` disables the
            Gaussian-based regularizers.
        sigma_px: target Gaussian sigma in pixels (static).
        reg: one of ``none | js | kl | mse | var`` (static).

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
    coords, regv = _make_fused(h, w, float(sigma_px), reg,
                               preact)(raw2, targets2)
    coords = coords.reshape(*lead, 2)
    if reg == "none":
        return coords, None
    return coords, regv.reshape(lead)
