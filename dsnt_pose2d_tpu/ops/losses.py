"""Coordinate losses, distribution regularizers, and masked averaging.

Reference: ``dsnt/nn.py`` of anibali/dsnt-pose2d (SURVEY.md section 7 items
4 and 6; same math as the author's extracted ``dsntnn`` library).  All the
``*_losses`` functions return *per-joint* losses of shape ``(...)`` (one value
per leading heatmap/coordinate index); combine them with :func:`average_loss`
to apply the visibility mask and reduce to a scalar.

KL/JS use ``KL(p || q) = sum_i p_i * (log(p_i + eps) - log(q_i + eps))`` with
``eps = 1e-24`` guarding the logs, matching the reference's epsilon placement.
"""

from __future__ import annotations

import jax.numpy as jnp

from .coords import normalized_linspace
from .gauss import make_gauss

_EPS = 1e-24


# ---------------------------------------------------------------------------
# Coordinate losses
# ---------------------------------------------------------------------------

def euclidean_losses(actual: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-joint L2 distance between normalized coordinate pairs.

    Args:
        actual, target: ``(..., 2)`` normalized (x, y) coordinates.

    Returns:
        ``(...)`` distances.
    """
    return jnp.linalg.norm(actual - target, axis=-1)


def l1_losses(actual: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-joint L1 distance (paper ablation variant)."""
    return jnp.sum(jnp.abs(actual - target), axis=-1)


def mse_losses(actual: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Per-joint squared L2 distance (paper ablation variant)."""
    return jnp.sum((actual - target) ** 2, axis=-1)


# ---------------------------------------------------------------------------
# Distribution regularizers (heatmap vs. target Gaussian)
# ---------------------------------------------------------------------------

def _kl(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """KL(p || q) over the trailing (H, W) axes, eps-guarded logs."""
    unsummed = p * (jnp.log(p + _EPS) - jnp.log(q + _EPS))
    return jnp.sum(unsummed, axis=(-2, -1))


def kl_reg_losses(heatmaps: jnp.ndarray, target_coords: jnp.ndarray,
                  sigma_px) -> jnp.ndarray:
    """KL(heatmap || Gaussian at target)."""
    h, w = heatmaps.shape[-2:]
    gauss = make_gauss(target_coords, (h, w), sigma_px)
    return _kl(heatmaps, gauss)


def js_reg_losses(heatmaps: jnp.ndarray, target_coords: jnp.ndarray,
                  sigma_px) -> jnp.ndarray:
    """Jensen-Shannon divergence between heatmap and Gaussian at target.

    ``m = (Z + G) / 2;  JS = KL(Z || m) / 2 + KL(G || m) / 2``.
    """
    h, w = heatmaps.shape[-2:]
    gauss = make_gauss(target_coords, (h, w), sigma_px)
    m = 0.5 * (heatmaps + gauss)
    return 0.5 * _kl(heatmaps, m) + 0.5 * _kl(gauss, m)


def mse_reg_losses(heatmaps: jnp.ndarray, target_coords: jnp.ndarray,
                   sigma_px) -> jnp.ndarray:
    """Pixelwise mean squared error between heatmap and Gaussian at target."""
    h, w = heatmaps.shape[-2:]
    gauss = make_gauss(target_coords, (h, w), sigma_px)
    return jnp.mean((heatmaps - gauss) ** 2, axis=(-2, -1))


def variance_reg_losses(heatmaps: jnp.ndarray, sigma_px) -> jnp.ndarray:
    """Penalize deviation of per-axis heatmap variance from sigma^2.

    Variance is computed under the normalized coordinate grid; the target
    variance per axis is ``(2 * sigma_px / L)^2`` (sigma converted from pixels
    to that axis's normalized units, same convention as :func:`make_gauss`).
    Requires no ground-truth Gaussian.  Loss is summed over the two axes:
    ``(var_x - sx^2)^2 + (var_y - sy^2)^2``.
    """
    h, w = heatmaps.shape[-2:]
    dtype = heatmaps.dtype
    xs = normalized_linspace(w, dtype)
    ys = normalized_linspace(h, dtype)
    sigma_px = jnp.asarray(sigma_px, dtype=dtype)
    marg_x = jnp.sum(heatmaps, axis=-2)                 # (..., W)
    marg_y = jnp.sum(heatmaps, axis=-1)                 # (..., H)
    mu_x = jnp.sum(marg_x * xs, axis=-1)
    mu_y = jnp.sum(marg_y * ys, axis=-1)
    var_x = jnp.sum(marg_x * xs ** 2, axis=-1) - mu_x ** 2
    var_y = jnp.sum(marg_y * ys ** 2, axis=-1) - mu_y ** 2
    target_var_x = (2.0 * sigma_px / w) ** 2
    target_var_y = (2.0 * sigma_px / h) ** 2
    return (var_x - target_var_x) ** 2 + (var_y - target_var_y) ** 2


REGULARIZERS = {
    "none": None,
    "kl": kl_reg_losses,
    "js": js_reg_losses,
    "mse": mse_reg_losses,
    "var": variance_reg_losses,
}


# ---------------------------------------------------------------------------
# Masked reduction
# ---------------------------------------------------------------------------

def average_loss(losses: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Visibility-masked mean of per-joint losses.

    Invisible joints (mask == 0) contribute 0 to the numerator and are
    excluded from the denominator (SURVEY.md section 7 item 4).  With no mask,
    plain mean.
    """
    if mask is None:
        return jnp.mean(losses)
    mask = mask.astype(losses.dtype)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(losses * mask) / denom
