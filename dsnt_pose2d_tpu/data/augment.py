"""Fused on-device preprocessing graph (the BASELINE.json north star).

TPU-native replacement for the reference's CPU DataLoader-worker augmentation
(``dsnt/data.py``; SURVEY.md C11): instead of PIL warps in forked worker
processes, the host only supplies a fixed-size decoded *canvas* per sample
(the person region resized to a static shape) and everything else runs as one
jitted graph on device:

    canvas (B, C, C, 3) uint8/float
      -> single composed affine (crop * rotate * scale * flip) bilinear warp
      -> per-channel color jitter
      -> mean/std normalize
    coords: same affine + flip joint-swap -> normalized (-1, 1)

Augmentation parameters are sampled from a jax PRNG key per batch, so the
whole pipeline is deterministic given (key, data) and replays exactly on
resume.  Train-time parameters (reference values): rotation U(-30, 30) deg,
scale U(0.75, 1.25), flip p=0.5, color jitter; eval-time: identity (the
deterministic center-crop path, where the warp matches a CPU reference
bilinear resample — the inference-parity boundary per SURVEY.md "Hard parts"
item 3).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.config import DataConfig
from . import transforms as T


def affine_warp_bilinear(image: jnp.ndarray, m_out_to_in: jnp.ndarray,
                         out_size: int) -> jnp.ndarray:
    """Warp one image (H, W, C) with the affine mapping OUTPUT px -> INPUT px.

    Bilinear sampling at pixel centers; out-of-bounds reads return 0 (black
    fill, PIL-rotate behavior).

    All four bilinear corners come from TWO row gathers instead of four:
    profiling the hg8 train step showed four separate corner gathers were 48%
    of the whole step (~7-9 ms each at batch 16 — TPU gathers of 3-float rows
    are index-latency bound, so gather count matters, not bytes).  The canvas
    is zero-padded by one pixel (right/bottom) and the NEXT row is stacked
    into the channel dim, so one simple row gather at (y0, x0) returns the
    (y0,x0)+(y0+1,x0) pair and a second at x0+1 returns the other two
    corners.  (A single (2, 2C)-slice gather was tried and is slower: its 3-D
    output layout forces relayout copies that cost more than the saved
    gather.)  Per-corner out-of-bounds masks are applied after, so results
    are bit-identical to the four-gather formulation.
    """
    h, w, c = image.shape
    image = image.astype(jnp.float32)
    ys = jnp.arange(out_size, dtype=jnp.float32)
    xs = jnp.arange(out_size, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)                      # (S, S)
    pts = jnp.stack([gx, gy], axis=-1).reshape(-1, 2)  # (S*S, 2) output px
    src = T.transform_coords(m_out_to_in, pts)         # (S*S, 2) input px

    x, y = src[:, 0], src[:, 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx, fy = x - x0, y - y0
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)

    # Zero border on ALL sides so the base corner may sit at -1: at the
    # top/left edge the base is out-of-bounds while its +1 neighbor is the
    # first in-bounds pixel — clamping the base to 0 would silently fetch
    # neighbor row/column 1 instead of 0 for the blended edge pixels.
    padded = jnp.pad(image, ((1, 1), (1, 1), (0, 0)))            # (H+2, W+2, C)
    pair = jnp.concatenate([padded[:h + 1], padded[1:h + 2]], -1)  # (H+1, W+2, 2C)
    flat = pair.reshape((h + 1) * (w + 2), 2 * c)

    x0c = jnp.clip(x0i, -1, w - 1)
    y0c = jnp.clip(y0i, -1, h - 1)
    idx = (y0c + 1) * (w + 2) + (x0c + 1)
    ga = flat[idx]          # (S*S, 2C): corners (y0, x0) and (y0+1, x0)
    gb = flat[idx + 1]      # (S*S, 2C): corners (y0, x1) and (y0+1, x1)

    def inb(xi, yi):
        return ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))[:, None]

    v00 = jnp.where(inb(x0i, y0i), ga[:, :c], 0.0)
    v10 = jnp.where(inb(x0i, y0i + 1), ga[:, c:], 0.0)
    v01 = jnp.where(inb(x0i + 1, y0i), gb[:, :c], 0.0)
    v11 = jnp.where(inb(x0i + 1, y0i + 1), gb[:, c:], 0.0)
    top = v00 * (1 - fx[:, None]) + v01 * fx[:, None]
    bot = v10 * (1 - fx[:, None]) + v11 * fx[:, None]
    out = top * (1 - fy[:, None]) + bot * fy[:, None]
    return out.reshape(out_size, out_size, c)


def _row_shift_lerp(rows: jnp.ndarray, offsets: jnp.ndarray, out_len: int,
                    pad_left: int, stride: int = 1) -> jnp.ndarray:
    """Per-row fractional PIXEL shift on (R, L_px * stride) element rows.

    ``offsets``/``pad_left``/``out_len`` are in PIXELS; ``stride`` is the
    elements-per-pixel factor (C for channel-interleaved rows — all channels
    of an image row ride one kernel row, cutting per-row loop iterations by
    C vs channel-planar).  Zero-padded by the caller; reads outside yield 0.
    Implemented by the Pallas kernel (:mod:`..ops.pallas.row_shift`): the
    equivalent ``lax.gather`` with per-row starts lowers to a SERIAL scalar
    loop on XLA:TPU (~2 us/row).
    """
    from ..ops.pallas.row_shift import shift_rows

    r, l = rows.shape
    k = jnp.floor(offsets)
    f = (offsets - k).astype(rows.dtype)
    starts = jnp.clip(k.astype(jnp.int32) + pad_left, 0,
                      l // stride - out_len - 1) * stride
    return shift_rows(rows, starts, f, out_len * stride, stride)


def _resample_matrix(positions: jnp.ndarray, in_len: int) -> jnp.ndarray:
    """(B, OUT) real source positions -> (B, OUT, in_len) bilinear tent
    weights with zero fill outside [0, in_len)."""
    grid = jnp.arange(in_len, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(positions[..., None] - grid))


def affine_warp_shear(canvas: jnp.ndarray, m_out_to_in: jnp.ndarray,
                      out_size: int, max_abs_shear: float,
                      precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Batched affine warp via shear decomposition (MXU path).

    Decomposes the out->in map ``A = Hx(a) . D(dx, dy) . Hy(b)`` (valid while
    ``A11 != 0`` — rotations well below 90 deg) into:

      1. x-shear of the input: per-(image, row) fractional shift -> one
         ~B*H-row Pallas pass (vs the direct warp's B*out^2 gather indices),
      2. separable scale+translate: two per-sample bilinear-resampling
         MATMULS (einsum over a built tent-weight matrix, HIGHEST precision)
         on the MXU,
      3. y-shear on the transposed intermediate.

    The shift passes run on channel-INTERLEAVED rows (one kernel row per
    (image, row), a one-pixel shift = C elements) so all channels share a
    single per-row loop iteration — 3x fewer rows than channel-planar.

    For rotation-free affines (a = b = 0: the eval center-crop, flips, pure
    scale) every shear is an integer-zero shift and the separable resample
    equals 2-D bilinear exactly, so this path matches
    :func:`affine_warp_bilinear`.  With rotation the three chained 1-D
    interpolations differ slightly from direct 2-D bilinear (the standard
    multi-pass trade-off) — fine for train-time augmentation, which needs
    statistical, not bitwise, equivalence (SURVEY "Hard parts" 3).

    ``max_abs_shear`` (static) bounds |a| and |b| = |tan(rotation)|; it sizes
    the intermediate extents.  Samples whose taps fall outside the sized
    extents read 0 (same class of loss as out-of-canvas reads).

    ``precision`` applies to the two resampling matmuls.  HIGHEST (default,
    6-pass f32 MXU emulation) keeps the eval/parity path exact; the train
    preprocess passes DEFAULT (single bf16 pass) — each output mixes at most
    two taps whose bf16 rounding is ~2^-9 relative (~0.5/255 px), well under
    augmentation's statistical-equivalence bar, and the round-3 trace put
    the two HIGHEST einsums at ~1.5 ms of a 34 ms hg8/b16 step.
    """
    bsz, h, w, c = canvas.shape
    s = out_size
    img = canvas.astype(jnp.float32)                    # NHWC, interleaved
    a2 = m_out_to_in[:, :2, :2]
    t2 = m_out_to_in[:, :2, 2]
    a = a2[:, 0, 1] / a2[:, 1, 1]
    b = a2[:, 1, 0] / a2[:, 1, 1]
    dy = a2[:, 1, 1]
    dx = a2[:, 0, 0] - a2[:, 0, 1] * a2[:, 1, 0] / a2[:, 1, 1]
    tpx = t2[:, 0] - a * t2[:, 1]
    tpy = t2[:, 1]

    px = int(-(-max_abs_shear * (h - 1) // 1)) + 1
    py = int(-(-max_abs_shear * (s - 1) // 1)) + 1
    w1 = w + 2 * px          # extended x extent of the sheared canvas
    s2 = s + 2 * py          # extended y extent before the final y-shear

    hp = precision

    # Pass 1: x-shear. img1[b, y, vx, ch] = in(vx - px + a*y, y).  Reads span
    # [a*y - px, a*y - px + w1) with a*y in [-px, px] -> pad [-2px, w + 2px).
    # Channel-interleaved rows: one kernel row per (b, y), not per (b, ch, y).
    pad = 2 * px + 2
    rows = jnp.pad(img, ((0, 0), (0, 0), (pad, pad), (0, 0))
                   ).reshape(bsz * h, (w + 2 * pad) * c)
    offs = (a[:, None] * jnp.arange(h, dtype=jnp.float32)[None, :]
            - px).reshape(bsz * h)
    img1 = _row_shift_lerp(rows, offs, w1, pad, stride=c
                           ).reshape(bsz, h, w1, c)

    # Pass 2: separable scale+translate via two per-sample matmuls.
    xs = jnp.arange(s, dtype=jnp.float32)
    ax = _resample_matrix(dx[:, None] * xs + tpx[:, None] + px, w1)
    tmp = jnp.einsum("bxw,bhwc->bhxc", ax, img1, precision=hp)  # (B,H,S,C)
    uy = jnp.arange(s2, dtype=jnp.float32) - py
    ay = _resample_matrix(dy[:, None] * uy + tpy[:, None], h)
    img2 = jnp.einsum("bsh,bhxc->bsxc", ay, tmp, precision=hp)  # (B,S2,S,C)

    # Pass 3: y-shear along s2, on x-major rows.
    img2t = jnp.swapaxes(img2, 1, 2)                            # (B,S,S2,C)
    pad3 = 2
    cols = jnp.pad(img2t, ((0, 0), (0, 0), (pad3, pad3), (0, 0))
                   ).reshape(bsz * s, (s2 + 2 * pad3) * c)
    offs3 = (b[:, None] * jnp.arange(s, dtype=jnp.float32)[None, :]
             + py).reshape(bsz * s)
    outt = _row_shift_lerp(cols, offs3, s, pad3, stride=c
                           ).reshape(bsz, s, s, c)
    # outt[b, x, y, ch] -> (B, y, x, C)
    return jnp.swapaxes(outt, 1, 2)


@partial(jax.jit, static_argnames=("out_size", "train", "cfg", "eval_scale"))
def preprocess_batch(key, canvas, coords_px, mask, head_len_px,
                     canvas_from_orig, cfg: DataConfig, out_size: int,
                     train: bool, canvas_margin=None, eval_scale: float = 1.0):
    """The fused preprocessing graph.

    Args:
        key: PRNG key for this batch's augmentation draws.
        canvas: (B, C, C, 3) float32 in [0, 1] (or uint8) person canvases.
        coords_px: (B, J, 2) joint coords in CANVAS pixels.
        mask: (B, J) visibility.
        head_len_px: (B,) PCKh head length in ORIGINAL-image pixels.
        canvas_from_orig: (B, 3, 3) affine original px -> canvas px.
        cfg: augmentation config (static).
        out_size: model input size (static).
        train: sample augmentations vs deterministic center crop (static).
        eval_scale: deterministic crop scale for the eval path (static;
            same semantics as the train-time scale augmentation — larger
            zooms in). Multi-scale evaluation runs this graph once per
            scale and averages predictions in original-image space.

    Returns dict with normalized ``images`` (B, S, S, 3), ``coords`` (B, J, 2)
    in (-1, 1), ``mask``, ``head_length``, and ``crop_from_orig`` (B, 3, 3)
    mapping original px -> crop px (for PCKh untransform).
    """
    b, c_size, _, _ = canvas.shape
    j = coords_px.shape[1]
    if canvas.dtype == jnp.uint8:
        canvas = canvas.astype(jnp.float32) / 255.0
    else:
        canvas = canvas.astype(jnp.float32)

    k_rot, k_scale, k_flip, k_jit, k_rotp = jax.random.split(key, 5)
    if train:
        rot = jax.random.uniform(
            k_rot, (b,), minval=-cfg.max_rotation_deg, maxval=cfg.max_rotation_deg
        ) * (jnp.pi / 180.0)
        if cfg.rotation_prob < 1.0:
            apply_rot = jax.random.bernoulli(k_rotp, cfg.rotation_prob, (b,))
            rot = jnp.where(apply_rot, rot, 0.0)
        scale = jax.random.uniform(
            k_scale, (b,), minval=cfg.scale_range[0], maxval=cfg.scale_range[1])
        flip = jax.random.bernoulli(k_flip, cfg.flip_prob, (b,))
    else:
        rot = jnp.zeros((b,))
        scale = jnp.full((b,), float(eval_scale))
        flip = jnp.zeros((b,), jnp.bool_)

    # Canvas -> crop affine: the canvas is a person-centric square holding the
    # person box in its central 1/canvas_margin; at scale_aug = 1 the crop
    # maps exactly that box (side canvas/margin) to out_size — the reference's
    # framing — with rotation/scale about the center and optional mirror.
    if canvas_margin is None:
        margin = jnp.ones((b,), jnp.float32)
    else:
        margin = jnp.asarray(canvas_margin, jnp.float32).reshape(b)
    center = jnp.full((b, 2), (c_size - 1) / 2.0)
    m_crop_from_canvas = T.crop_transform(
        center, (c_size / margin) / T.MPII_SCALE_BOX_PX, out_size,
        rot_rad=rot, scale_aug=scale, flip=flip)

    m_out_to_in = T.invert(m_crop_from_canvas)
    use_shear = getattr(cfg, "warp_method", "gather") == "shear"
    if use_shear and train and cfg.max_rotation_deg > 60.0:
        # The shear decomposition divides by A11 ~ cos(rot): extents balloon
        # and the factorization degenerates toward 90 deg. Nobody trains
        # MPII beyond +-45; fall back loudly rather than warp garbage.
        import warnings

        warnings.warn(
            f"warp_method='shear' requires max_rotation_deg <= 60 "
            f"(got {cfg.max_rotation_deg}); falling back to 'gather'")
        use_shear = False
    if use_shear:
        import math

        # Zero shear extents whenever rotation cannot occur (eval, rot
        # disabled): the shears reduce to integer shifts and the path is
        # bit-comparable to the direct warp with identical padding offsets.
        rotates = train and cfg.max_rotation_deg > 0 and cfg.rotation_prob > 0
        max_shear = (math.tan(math.radians(cfg.max_rotation_deg)) * 1.01
                     if rotates else 0.0)
        # Train-time resample matmuls run at DEFAULT (one bf16 MXU pass);
        # eval stays HIGHEST so the rotation-free path remains bit-equal to
        # the direct bilinear warp (see affine_warp_shear docstring).
        resample_prec = (jax.lax.Precision.DEFAULT if train
                         else jax.lax.Precision.HIGHEST)
        warped = affine_warp_shear(canvas, m_out_to_in, out_size, max_shear,
                                   precision=resample_prec)
    else:
        warped = jax.vmap(affine_warp_bilinear, in_axes=(0, 0, None))(
            canvas, m_out_to_in, out_size)

    if train and cfg.color_jitter > 0:
        jit_scale = jax.random.uniform(
            k_jit, (b, 1, 1, 3), minval=1.0 - cfg.color_jitter,
            maxval=1.0 + cfg.color_jitter)
        warped = jnp.clip(warped * jit_scale, 0.0, 1.0)

    mean = jnp.asarray(cfg.mean, jnp.float32)
    std = jnp.asarray(cfg.std, jnp.float32)
    images = (warped - mean) / std

    # Joint coordinates through the same affine (+ L/R swap under flip).
    coords_crop = T.transform_coords(m_crop_from_canvas, coords_px)
    perm = T.flip_permutation(j)
    coords_crop = jnp.where(flip[:, None, None], coords_crop[:, perm], coords_crop)
    mask = jnp.where(flip[:, None], mask[:, perm], mask)
    coords_norm = (2.0 * coords_crop + 1.0) / out_size - 1.0

    crop_from_orig = jnp.matmul(m_crop_from_canvas, canvas_from_orig,
                                precision=jax.lax.Precision.HIGHEST)
    return {
        "images": images,
        "coords": coords_norm,
        "mask": mask.astype(jnp.float32),
        "head_length": head_len_px,
        "crop_from_orig": crop_from_orig,
    }
