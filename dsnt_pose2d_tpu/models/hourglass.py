"""Stacked-hourglass backbone (Newell et al., arXiv:1603.06937), flax.linen.

TPU-first re-design of the reference's hourglass (``dsnt/model.py`` /
``dsnt/hourglass.py``, bearpaw/pytorch-pose lineage; SURVEY.md C6): identical
topology — stem 256x256 -> 64x64, N stacks of depth-4 hourglasses over 256-ch
pre-activation bottleneck residuals, per-stack 1x1 conv to J score maps, and
inter-stack remap+add for intermediate supervision — but implemented NHWC with
XLA convolutions, nearest-neighbor upsampling expressed as a broadcast-reshape
(lowers to a cheap lane-replicating op on TPU), and an optional bfloat16
compute dtype with fp32 parameters/batch-stats.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


def _upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, 2H, 2W, C) nearest-neighbor, as broadcast+reshape."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


class Bottleneck(nn.Module):
    """Pre-activation bottleneck residual: BN-ReLU-1x1 -> BN-ReLU-3x3 -> BN-ReLU-1x1.

    ``planes`` is the bottleneck width; output channels = ``2 * planes``
    (expansion 2, hourglass-lineage convention).
    """

    planes: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        conv = lambda feats, k, s, name: nn.Conv(
            feats, (k, k), strides=(s, s), padding="SAME", use_bias=False,
            dtype=self.dtype, name=name)

        out_ch = 2 * self.planes
        residual = x
        y = nn.relu(norm("bn1")(x))
        # Pre-activation skip: project after the first BN-ReLU when shape changes.
        if x.shape[-1] != out_ch or self.stride != 1:
            residual = conv(out_ch, 1, self.stride, "proj")(y)
        y = conv(self.planes, 1, 1, "conv1")(y)
        y = nn.relu(norm("bn2")(y))
        y = conv(self.planes, 3, self.stride, "conv2")(y)
        y = nn.relu(norm("bn3")(y))
        y = conv(out_ch, 1, 1, "conv3")(y)
        return y + residual


class Hourglass(nn.Module):
    """One recursive hourglass module of the given depth over ``features`` channels."""

    depth: int = 4
    features: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        planes = self.features // 2

        def level(x, d):
            up1 = Bottleneck(planes, dtype=self.dtype, name=f"up1_d{d}")(x, train)
            low = nn.max_pool(x, (2, 2), strides=(2, 2))
            low = Bottleneck(planes, dtype=self.dtype, name=f"low1_d{d}")(low, train)
            if d > 1:
                low = level(low, d - 1)
            else:
                low = Bottleneck(planes, dtype=self.dtype, name=f"low2_d{d}")(low, train)
            low = Bottleneck(planes, dtype=self.dtype, name=f"low3_d{d}")(low, train)
            return up1 + _upsample_nearest_2x(low)

        return level(x, self.depth)


class HourglassNet(nn.Module):
    """Stacked hourglass network producing per-stack raw score maps.

    Input: ``(B, S_in, S_in, 3)`` images (NHWC, normalized).  Output: raw
    heatmaps ``(num_stacks, B, J, H, W)`` with ``H = W = S_in / 4``, channel
    axis moved to the ops convention.  Raw maps are emitted in fp32 regardless
    of the backbone compute dtype (the DSNT head is fp32 math).
    """

    num_stacks: int = 8
    num_joints: int = 16
    features: int = 256
    depth: int = 4
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        planes = self.features // 2
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)

        x = x.astype(self.dtype)
        # Stem: 7x7/2 -> bottleneck -> pool -> 2 bottlenecks => stride 4.
        # Explicit symmetric (3, 3) padding: the torch/Newell convention.
        # flax 'SAME' would pad (2, 3) on stride-2, silently shifting the
        # stem output half a pixel vs the reference lineage (the stride-1
        # 3x3 convs below are unaffected — SAME == (1, 1) there).
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = nn.relu(norm("stem_bn")(x))
        x = Bottleneck(64, dtype=self.dtype, name="stem_res1")(x, train)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = Bottleneck(planes, dtype=self.dtype, name="stem_res2")(x, train)
        x = Bottleneck(planes, dtype=self.dtype, name="stem_res3")(x, train)

        scores = []
        hg_cls = nn.remat(Hourglass, static_argnums=(2,)) if self.remat else Hourglass
        for i in range(self.num_stacks):
            y = hg_cls(self.depth, self.features, dtype=self.dtype,
                       name=f"hg{i}")(x, train)
            y = Bottleneck(planes, dtype=self.dtype, name=f"post_res{i}")(y, train)
            y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"fc{i}_conv")(y)
            y = nn.relu(norm(f"fc{i}_bn")(y))
            score = nn.Conv(self.num_joints, (1, 1), dtype=self.dtype,
                            name=f"score{i}")(y)
            scores.append(score)
            if i < self.num_stacks - 1:
                fc_back = nn.Conv(self.features, (1, 1), dtype=self.dtype,
                                  name=f"fc_back{i}")(y)
                score_back = nn.Conv(self.features, (1, 1), dtype=self.dtype,
                                     name=f"score_back{i}")(score)
                x = x + fc_back + score_back

        # (S, B, H, W, J) -> (S, B, J, H, W); promote so the head math runs
        # in at least fp32 (bf16 backbones emit fp32 heatmaps) without
        # truncating higher-precision runs (the fp64 parity suite).
        out_dtype = jnp.promote_types(self.dtype, jnp.float32)
        stacked = jnp.stack(scores, axis=0).astype(out_dtype)
        return jnp.transpose(stacked, (0, 1, 4, 2, 3))
