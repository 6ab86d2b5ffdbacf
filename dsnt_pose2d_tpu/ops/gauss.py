"""Target-Gaussian rendering on the normalized heatmap grid.

Reference: ``make_gauss()`` in ``dsnt/nn.py`` (SURVEY.md section 7 item 5).
Sigma is specified in *pixels* and converted to normalized units per axis by
``2 * sigma / L`` (the width of one pixel in normalized space is ``2 / L``).
The rendered (unnormalized) Gaussian is evaluated at pixel centers and then,
when ``normalize=True`` (the default, and what the regularizers use),
renormalized to sum to 1 over the map.
"""

from __future__ import annotations

import jax.numpy as jnp

from .coords import normalized_linspace

_EPS = 1e-24


def make_gauss(coords: jnp.ndarray, size_hw, sigma_px, normalize: bool = True) -> jnp.ndarray:
    """Render 2D Gaussians centered at normalized ``coords``.

    Args:
        coords: ``(..., 2)`` normalized (x, y) centers.
        size_hw: ``(H, W)`` output grid size.
        sigma_px: scalar standard deviation in pixels (isotropic in pixel
            units; anisotropic in normalized units when H != W).
        normalize: renormalize each map to sum to 1.

    Returns:
        ``(..., H, W)`` maps.
    """
    h, w = size_hw
    xs = normalized_linspace(w, coords.dtype)
    ys = normalized_linspace(h, coords.dtype)
    sigma_px = jnp.asarray(sigma_px, dtype=coords.dtype)
    std_x = 2.0 * sigma_px / w
    std_y = 2.0 * sigma_px / h
    dx = (xs - coords[..., 0:1]) / std_x               # (..., W)
    dy = (ys - coords[..., 1:2]) / std_y               # (..., H)
    gauss = jnp.exp(-0.5 * (dy[..., :, None] ** 2 + dx[..., None, :] ** 2))
    if normalize:
        denom = jnp.sum(gauss, axis=(-2, -1), keepdims=True)
        gauss = gauss / jnp.maximum(denom, _EPS)
    return gauss
