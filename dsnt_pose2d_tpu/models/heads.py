"""Output strategies: DSNT / heatmap-matching ('gauss') / FC regression.

Reference: the head composition logic of ``HumanPoseModel`` in
``dsnt/model.py`` (SURVEY.md C8, section 7 items 7-8).  The three strategies
share a backbone that emits per-stack raw score maps ``(S, B, J, H, W)``:

- ``dsnt``:  activation -> soft-argmax coords; loss = Euclidean + optional
  distribution regularizer on the activated maps.  The hot path (activation,
  expectation, regularizer) can run as the fused Pallas kernel.
- ``gauss``: heatmap matching; loss = pixelwise MSE vs a rendered Gaussian at
  the target (peak-1 unnormalized, Newell lineage); eval decode = argmax with
  quarter-pixel offset.
- ``fc``:    per-joint linear layer from the flattened raw map to (x, y);
  Euclidean loss directly on coords.

Intermediate supervision: the loss sums (default; configurable to mean) the
per-stack masked losses; only the LAST stack's coordinates are decoded for
evaluation.
"""

from __future__ import annotations

from typing import Optional

import flax.struct
import jax.numpy as jnp

from .. import ops
from ..utils.config import ModelConfig


@flax.struct.dataclass
class PoseOutput:
    """Raw model outputs. ``heatmaps``: (S, B, J, H, W) unactivated scores;
    ``fc_coords``: (S, B, J, 2) for the fc strategy, else None."""

    heatmaps: jnp.ndarray
    fc_coords: Optional[jnp.ndarray] = None


def activate_heatmaps(raw: jnp.ndarray, preact: str,
                      threshold: float = 0.0) -> jnp.ndarray:
    """Apply the configured pre-activation, in fp32."""
    raw = raw.astype(jnp.float32)
    if preact == "thresholded_softmax":
        return ops.thresholded_softmax(raw, threshold)
    return ops.HEATMAP_ACTIVATIONS[preact](raw)


def _stack_reduce(per_stack_scalars: jnp.ndarray, mode: str) -> jnp.ndarray:
    return jnp.sum(per_stack_scalars) if mode == "sum" else jnp.mean(per_stack_scalars)


def pose_loss(output: PoseOutput, target_coords: jnp.ndarray,
              mask: jnp.ndarray, cfg: ModelConfig) -> tuple[jnp.ndarray, dict]:
    """Total training loss + aux dict (per-strategy diagnostics).

    Args:
        output: model outputs.
        target_coords: (B, J, 2) normalized target coordinates.
        mask: (B, J) joint visibility (1 = visible).
    """
    raw = output.heatmaps                      # (S, B, J, H, W)
    s = raw.shape[0]
    t = target_coords[None]                    # broadcast over stacks
    m = jnp.broadcast_to(mask[None], raw.shape[:3])

    if cfg.output_strat == "dsnt":
        if use_pallas_head(cfg):
            from ..ops.pallas import fused_dsnt_head

            coords, reg = fused_dsnt_head(
                raw.astype(jnp.float32), jnp.broadcast_to(t, (*raw.shape[:3], 2)),
                sigma_px=cfg.hm_sigma, reg=cfg.reg, preact=cfg.preact,
                threshold=cfg.hm_threshold)
        else:
            act = activate_heatmaps(raw, cfg.preact, cfg.hm_threshold)
            coords = ops.dsnt(act)
            reg = _reg_losses(act, t, cfg)
        euc = _coord_losses(coords, t, cfg)
        per_joint = euc if reg is None else euc + cfg.reg_coeff * reg
        # Masked mean within each stack, then sum/mean across stacks.  The
        # visibility mask is identical across stacks, so a single masked mean
        # over (S, B, J) times S equals the per-stack sum.
        per_stack = _masked_mean_keep_stacks(per_joint, m)
        loss = _stack_reduce(per_stack, cfg.stack_loss)
        aux = {"coords": coords[-1],
               "euclidean": ops.average_loss(euc[-1], mask),
               "reg": ops.average_loss(reg[-1], mask) if reg is not None else jnp.float32(0)}
        return loss, aux

    if cfg.output_strat == "gauss":
        h, w = raw.shape[-2:]
        target_hm = ops.make_gauss(t, (h, w), cfg.hm_sigma,
                                   normalize=cfg.gauss_target_normalize)
        per_joint = jnp.mean((raw.astype(jnp.float32) - target_hm) ** 2, axis=(-2, -1))
        per_stack = _masked_mean_keep_stacks(per_joint, m)
        loss = _stack_reduce(per_stack, cfg.stack_loss)
        coords = ops.heatmaps_to_coords(raw[-1].astype(jnp.float32))
        return loss, {"coords": coords, "mse": per_stack[-1]}

    if cfg.output_strat == "fc":
        euc = _coord_losses(output.fc_coords, t, cfg)
        per_stack = _masked_mean_keep_stacks(euc, m)
        loss = _stack_reduce(per_stack, cfg.stack_loss)
        return loss, {"coords": output.fc_coords[-1],
                      "euclidean": per_stack[-1]}

    raise ValueError(f"unknown output strategy {cfg.output_strat!r}")


def decode_coords(output: PoseOutput, cfg: ModelConfig) -> jnp.ndarray:
    """Evaluation-time normalized (x, y) coords from the LAST stack: (B, J, 2)."""
    if cfg.output_strat == "dsnt":
        raw = output.heatmaps[-1]
        if use_pallas_head(cfg):
            from ..ops.pallas import fused_dsnt_head

            # reg="none" explicitly: decode needs no targets/regularizer.
            coords, _ = fused_dsnt_head(raw.astype(jnp.float32), None,
                                        sigma_px=cfg.hm_sigma, reg="none",
                                        preact=cfg.preact,
                                        threshold=cfg.hm_threshold)
            return coords
        return ops.dsnt(activate_heatmaps(raw, cfg.preact, cfg.hm_threshold))
    if cfg.output_strat == "gauss":
        return ops.heatmaps_to_coords(output.heatmaps[-1].astype(jnp.float32))
    if cfg.output_strat == "fc":
        return output.fc_coords[-1]
    raise ValueError(f"unknown output strategy {cfg.output_strat!r}")


def _coord_losses(coords, t, cfg: ModelConfig):
    fn = {"euclidean": ops.euclidean_losses, "l1": ops.l1_losses,
          "mse": ops.mse_losses}[cfg.coord_loss]
    return fn(coords, t)


def _reg_losses(act, t, cfg: ModelConfig):
    reg_fn = ops.REGULARIZERS[cfg.reg]
    if reg_fn is None:
        return None
    if cfg.reg == "var":
        return reg_fn(act, cfg.hm_sigma)
    return reg_fn(act, t, cfg.hm_sigma)


def _masked_mean_keep_stacks(per_joint: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """(S, B, J) losses + (S, B, J) mask -> (S,) masked means."""
    mask = mask.astype(per_joint.dtype)
    num = jnp.sum(per_joint * mask, axis=(1, 2))
    den = jnp.maximum(jnp.sum(mask, axis=(1, 2)), 1.0)
    return num / den


def _pallas_available() -> bool:
    try:
        from ..ops import pallas  # noqa: F401

        return pallas.AVAILABLE
    except Exception:
        return False


_WARNED: set = set()


def _warn_once(msg: str):
    import warnings

    if msg not in _WARNED:
        _WARNED.add(msg)
        warnings.warn(msg, stacklevel=3)


def use_pallas_head(cfg: ModelConfig) -> bool:
    """Whether the fused Pallas DSNT head runs for this config.

    Warns (once per reason) when ``use_pallas=True`` is silently bypassed,
    so a user setting e.g. ``preact=relu, use_pallas=True`` learns they got
    the jnp path instead of wondering where the kernel went.
    """
    if not cfg.use_pallas or cfg.output_strat != "dsnt":
        return False
    if not _pallas_available():
        _warn_once("use_pallas=True but the Pallas kernel is unavailable; "
                   "using the jnp ops path")
        return False
    from ..ops.pallas.dsnt_head import PREACT_KINDS

    if cfg.preact not in PREACT_KINDS:
        _warn_once(f"use_pallas=True but preact={cfg.preact!r} is not fused "
                   f"(kernel supports {PREACT_KINDS}); using the jnp ops path")
        return False
    return True
