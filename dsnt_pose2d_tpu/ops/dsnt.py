"""The DSNT op: differentiable spatial-to-numerical transform (soft-argmax).

Reference: ``dsnt()`` in ``dsnt/nn.py`` of anibali/dsnt-pose2d (semantics per
SURVEY.md section 7 item 3 and the companion paper arXiv:1801.07372 eq. 2-3):
given per-joint probability heatmaps ``Z`` over an (H, W) grid,

    x_hat = <Z, X>_F      y_hat = <Z, Y>_F

where X, Y are the normalized pixel-center coordinate grids of
:mod:`dsnt_pose2d_tpu.ops.coords`.  Output is (..., 2) in (x, y) order, each
coordinate in (-1, 1).
"""

from __future__ import annotations

import jax.numpy as jnp

from .coords import normalized_linspace


def dsnt(heatmaps: jnp.ndarray) -> jnp.ndarray:
    """Expected (x, y) coordinates under per-map distributions.

    Args:
        heatmaps: ``(..., H, W)`` probability maps (non-negative, summing to 1
            over H*W; apply an activation from ``ops.activations`` first).

    Returns:
        ``(..., 2)`` normalized coordinates, (x, y) order.
    """
    h, w = heatmaps.shape[-2], heatmaps.shape[-1]
    xs = normalized_linspace(w, heatmaps.dtype)
    ys = normalized_linspace(h, heatmaps.dtype)
    # Marginalize first: cheaper than a full-grid inner product and XLA fuses
    # the two reductions into one pass over the heatmap.
    x_hat = jnp.sum(jnp.sum(heatmaps, axis=-2) * xs, axis=-1)
    y_hat = jnp.sum(jnp.sum(heatmaps, axis=-1) * ys, axis=-1)
    return jnp.stack([x_hat, y_hat], axis=-1)
