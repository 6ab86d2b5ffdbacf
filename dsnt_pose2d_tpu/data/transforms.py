"""3x3 affine utilities for the three coordinate frames.

Reference: the transform helpers of ``dsnt/util.py`` (SURVEY.md C12).  Frames:

1. **original image pixels** — continuous (x, y), pixel centers at integers;
2. **crop pixels** — the model's input_size x input_size frame;
3. **normalized** — (-1, 1) with the pixel-center convention of
   :mod:`dsnt_pose2d_tpu.ops.coords`.

An MPII sample is cropped person-centrically from its (center, scale)
annotation: the person box side is ``scale * 200`` px (MPII convention), and
the crop affine maps that box onto the crop frame, optionally composing
rotation about the person center, a scale perturbation, and a horizontal
flip.  All affines are plain 3x3 row-major matrices acting on column vectors
``[x, y, 1]^T``, built with jnp so they can be traced on-device.

The frame conventions here are parity-critical (SURVEY.md "Hard parts" #1):
evaluation maps predictions back to original-image pixels through the inverse
of the exact matrix used for cropping.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MPII_SCALE_BOX_PX = 200.0

# MPII 16-joint order: 0 r_ankle, 1 r_knee, 2 r_hip, 3 l_hip, 4 l_knee,
# 5 l_ankle, 6 pelvis, 7 thorax, 8 upper_neck, 9 head_top, 10 r_wrist,
# 11 r_elbow, 12 r_shoulder, 13 l_shoulder, 14 l_elbow, 15 l_wrist.
MPII_JOINT_NAMES = (
    "r_ankle", "r_knee", "r_hip", "l_hip", "l_knee", "l_ankle",
    "pelvis", "thorax", "upper_neck", "head_top",
    "r_wrist", "r_elbow", "r_shoulder", "l_shoulder", "l_elbow", "l_wrist",
)

# Left/right pair table (SURVEY.md C11): {(0,5),(1,4),(2,3),(10,15),(11,14),(12,13)}
MPII_FLIP_PAIRS = ((0, 5), (1, 4), (2, 3), (10, 15), (11, 14), (12, 13))



def _mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """3x3 affine composition at FULL f32 precision.

    Coordinate matrices carry translations of O(100-400) px; the TPU's
    default bf16 matmul precision rounds those to ~1-2 px (bf16 ulp at 384
    is 2.0) — a silent whole-pixel error in every warp source position and
    joint target.  All affine composition/application in this module
    therefore pins Precision.HIGHEST (the matrices are 3x3 — cost is nil).
    """
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)

def flip_permutation(num_joints: int = 16, pairs=MPII_FLIP_PAIRS):
    perm = list(range(num_joints))
    for a, b in pairs:
        perm[a], perm[b] = perm[b], perm[a]
    return jnp.asarray(perm, dtype=jnp.int32)


def _pair(a, b):
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    shape = jnp.broadcast_shapes(a.shape, b.shape)
    return jnp.broadcast_to(a, shape), jnp.broadcast_to(b, shape)


def translation(tx, ty) -> jnp.ndarray:
    tx, ty = _pair(tx, ty)
    o, l = jnp.ones_like(tx), jnp.zeros_like(tx)
    return jnp.stack([
        jnp.stack([o, l, tx], -1),
        jnp.stack([l, o, ty], -1),
        jnp.stack([l, l, o], -1),
    ], -2)


def scaling(sx, sy) -> jnp.ndarray:
    sx, sy = _pair(sx, sy)
    l = jnp.zeros_like(sx)
    return jnp.stack([
        jnp.stack([sx, l, l], -1),
        jnp.stack([l, sy, l], -1),
        jnp.stack([l, l, jnp.ones_like(sx)], -1),
    ], -2)


def rotation(theta_rad) -> jnp.ndarray:
    theta_rad = jnp.asarray(theta_rad, jnp.float32)
    c, s = jnp.cos(theta_rad), jnp.sin(theta_rad)
    l, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack([
        jnp.stack([c, -s, l], -1),
        jnp.stack([s, c, l], -1),
        jnp.stack([l, l, o], -1),
    ], -2)


def crop_transform(center_xy, scale, out_size: int, rot_rad=0.0,
                   scale_aug=1.0, flip=False) -> jnp.ndarray:
    """Affine mapping ORIGINAL-image px -> CROP px (out_size square).

    The person box (side ``scale * 200 / scale_aug`` px — a larger
    ``scale_aug`` zooms in) centered at ``center_xy`` lands on the crop frame,
    rotated by ``rot_rad`` about the person center; ``flip`` mirrors
    horizontally about the crop's center.  Batch dims broadcast.
    """
    center_xy = jnp.asarray(center_xy, jnp.float32)
    cx, cy = center_xy[..., 0], center_xy[..., 1]
    scale = jnp.asarray(scale, jnp.float32)
    box = scale * MPII_SCALE_BOX_PX / jnp.asarray(scale_aug, jnp.float32)
    s = out_size / box
    half = (out_size - 1) / 2.0
    m = translation(jnp.broadcast_to(half, cx.shape), half)
    m = _mm(m, _mm(scaling(s, s), _mm(rotation(rot_rad), translation(-cx, -cy))))
    flip_f = jnp.asarray(flip, jnp.float32)
    # x' = (S-1) - x when flipped: compose diag(-1,1) + translate in crop px.
    sign = 1.0 - 2.0 * flip_f
    fm = _mm(translation(flip_f * (out_size - 1.0), jnp.zeros_like(flip_f)),
             scaling(sign, jnp.ones_like(sign)))
    return _mm(fm, m)


def transform_coords(m: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Apply 3x3 affine(s) to points.

    ``coords`` is ``(..., N, 2)`` with ``m`` ``(..., 3, 3)`` (batch dims
    broadcast), or a bare ``(..., 2)`` point set matching ``m``'s batch dims.
    """
    squeeze = coords.ndim == m.ndim - 1
    if squeeze:
        coords = coords[..., None, :]
    homo = jnp.concatenate([coords, jnp.ones_like(coords[..., :1])], axis=-1)
    out = jnp.einsum("...ij,...nj->...ni", m, homo,
                     precision=jax.lax.Precision.HIGHEST)
    out = out[..., :2] / out[..., 2:3]
    return out[..., 0, :] if squeeze else out


def invert(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of ``(..., 3, 3)`` affine matrices.

    ``inv([A t; 0 1]) = [A^-1, -A^-1 t; 0 1]`` with the 2x2 adjugate —
    elementwise f32 math, so it sidesteps any batched-LU lowering and the
    TPU default-matmul-precision trap entirely (translations are O(100s) of
    px; see :func:`_mm`).
    """
    a, b = m[..., 0, 0], m[..., 0, 1]
    c, d = m[..., 1, 0], m[..., 1, 1]
    tx, ty = m[..., 0, 2], m[..., 1, 2]
    det = a * d - b * c
    ia, ib = d / det, -b / det
    ic, id_ = -c / det, a / det
    itx = -(ia * tx + ib * ty)
    ity = -(ic * tx + id_ * ty)
    zero = jnp.zeros_like(a)
    one = jnp.ones_like(a)
    return jnp.stack([
        jnp.stack([ia, ib, itx], axis=-1),
        jnp.stack([ic, id_, ity], axis=-1),
        jnp.stack([zero, zero, one], axis=-1),
    ], axis=-2)
