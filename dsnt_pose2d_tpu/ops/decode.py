"""Hard-argmax heatmap decoding with quarter-pixel offset refinement.

Used by the ``gauss`` (heatmap-matching) output strategy at evaluation time
(reference ``dsnt/model.py``; SURVEY.md section 7 item 7): take the argmax
pixel, shift a quarter pixel toward the larger of each axis's two neighbors,
then map to normalized coordinates.  Implemented branch-free so it jits to a
single fused pass per heatmap.
"""

from __future__ import annotations

import jax.numpy as jnp

from .coords import pixel_to_normalized


def heatmaps_to_coords(heatmaps: jnp.ndarray) -> jnp.ndarray:
    """Argmax + quarter-offset decode. ``(..., H, W) -> (..., 2)`` normalized."""
    h, w = heatmaps.shape[-2:]
    flat = heatmaps.reshape(*heatmaps.shape[:-2], h * w)
    idx = jnp.argmax(flat, axis=-1)
    py = idx // w
    px = idx % w

    def _at(y, x):
        yc = jnp.clip(y, 0, h - 1)
        xc = jnp.clip(x, 0, w - 1)
        return jnp.take_along_axis(flat, (yc * w + xc)[..., None], axis=-1)[..., 0]

    # Quarter-pixel shift toward the higher neighbor along each axis; zero
    # shift at borders (the clipped neighbor equals the comparison on the
    # other side only coincidentally, so mask borders explicitly).
    right = _at(py, px + 1)
    left = _at(py, px - 1)
    down = _at(py + 1, px)
    up = _at(py - 1, px)
    dx = 0.25 * jnp.sign(right - left)
    dy = 0.25 * jnp.sign(down - up)
    dx = jnp.where((px > 0) & (px < w - 1), dx, 0.0)
    dy = jnp.where((py > 0) & (py < h - 1), dy, 0.0)

    coords_px = jnp.stack(
        [px.astype(heatmaps.dtype) + dx, py.astype(heatmaps.dtype) + dy], axis=-1
    )
    return pixel_to_normalized(coords_px, (h, w))
