"""Skeleton rendering for pose debugging (reference Showoff renders, C14).

Pure-numpy drawing (no display deps): overlay the 16-joint MPII skeleton on
an image, used by the metric writer's sample dumps and by humans inspecting
predictions.  Saved as PNG via PIL when available.
"""

from __future__ import annotations

import numpy as np

# MPII skeleton edges (joint index pairs).
SKELETON = (
    (0, 1), (1, 2), (2, 6), (3, 6), (3, 4), (4, 5),      # legs
    (6, 7), (7, 8), (8, 9),                               # spine/head
    (10, 11), (11, 12), (12, 7), (13, 7), (13, 14), (14, 15),  # arms
)

_COLORS = np.asarray([
    [255, 80, 80], [255, 160, 80], [255, 255, 80], [160, 255, 80],
    [80, 255, 80], [80, 255, 160], [80, 255, 255], [80, 160, 255],
    [80, 80, 255], [160, 80, 255], [255, 80, 255], [255, 80, 160],
    [200, 200, 200], [255, 200, 120], [120, 200, 255], [200, 255, 120],
], np.uint8)


def _draw_line(img, x0, y0, x1, y1, color):
    n = int(max(abs(x1 - x0), abs(y1 - y0), 1)) * 2
    xs = np.linspace(x0, x1, n).round().astype(int)
    ys = np.linspace(y0, y1, n).round().astype(int)
    h, w = img.shape[:2]
    ok = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    img[ys[ok], xs[ok]] = color


def _draw_dot(img, x, y, color, r=2):
    h, w = img.shape[:2]
    x, y = int(round(x)), int(round(y))
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            if dx * dx + dy * dy <= r * r and 0 <= y + dy < h and 0 <= x + dx < w:
                img[y + dy, x + dx] = color


def render_skeleton(image: np.ndarray, coords_px: np.ndarray,
                    mask: np.ndarray | None = None) -> np.ndarray:
    """Overlay skeleton on (H, W, 3) image; coords in pixel (x, y)."""
    img = np.ascontiguousarray(image)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    mask = np.ones(len(coords_px)) if mask is None else np.asarray(mask)
    for a, b in SKELETON:
        if mask[a] > 0 and mask[b] > 0:
            _draw_line(img, coords_px[a, 0], coords_px[a, 1],
                       coords_px[b, 0], coords_px[b, 1], _COLORS[a])
    for j, (x, y) in enumerate(np.asarray(coords_px)):
        if mask[j] > 0:
            _draw_dot(img, x, y, _COLORS[j])
    return img


def save_png(image: np.ndarray, path: str):
    from PIL import Image

    Image.fromarray(image).save(path)
