"""Normalized coordinate grids and pixel <-> normalized conversions.

The coordinate convention is the parity contract with the reference
(``dsnt/nn.py`` in anibali/dsnt-pose2d; semantics pinned in SURVEY.md section 7,
item 1): for an axis of length ``L``, the *center* of 0-indexed pixel ``i`` is

    n(i) = (2 * i + 1) / L - 1            in the open interval (-1, 1)

so (-1, -1) is the top-left *corner* of the top-left pixel and (+1, +1) is the
bottom-right corner of the bottom-right pixel.  Coordinates are always carried
in (x, y) order, with x running along the width axis.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalized_linspace(length: int, dtype=jnp.float32) -> jnp.ndarray:
    """Pixel-center coordinates for an axis of ``length`` pixels, in (-1, 1).

    Equivalent to ``linspace(-(L-1)/L, (L-1)/L, L)``.
    """
    i = jnp.arange(length, dtype=dtype)
    return (2.0 * i + 1.0) / length - 1.0


def coordinate_grids(height: int, width: int, dtype=jnp.float32):
    """Return ``(X, Y)`` grids of shape ``(height, width)``.

    ``X[i, j]`` is the normalized x-coordinate of pixel column ``j`` and
    ``Y[i, j]`` the normalized y-coordinate of pixel row ``i``.
    """
    xs = normalized_linspace(width, dtype)
    ys = normalized_linspace(height, dtype)
    x_grid = jnp.broadcast_to(xs[None, :], (height, width))
    y_grid = jnp.broadcast_to(ys[:, None], (height, width))
    return x_grid, y_grid


def pixel_to_normalized(coords_px: jnp.ndarray, size_hw) -> jnp.ndarray:
    """Map continuous pixel coordinates (x, y) to normalized (-1, 1) space.

    ``coords_px[..., 0]`` is x in ``[0, W-1]`` pixel-center units,
    ``coords_px[..., 1]`` is y.  ``size_hw = (H, W)``.
    """
    h, w = size_hw
    scale = jnp.asarray([w, h], dtype=coords_px.dtype)
    return (2.0 * coords_px + 1.0) / scale - 1.0


def normalized_to_pixel(coords_norm: jnp.ndarray, size_hw) -> jnp.ndarray:
    """Inverse of :func:`pixel_to_normalized`."""
    h, w = size_hw
    scale = jnp.asarray([w, h], dtype=coords_norm.dtype)
    return ((coords_norm + 1.0) * scale - 1.0) / 2.0
