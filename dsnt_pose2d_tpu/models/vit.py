"""ViT backbone for DSNT pose estimation (BASELINE stretch config #5).

Not present in the reference — BASELINE.json's fifth benchmark config asks to
"stretch the soft-argmax head beyond hourglass" with a ViT backbone at 2x
input resolution.  TPU-first design choices:

- patchify with a single strided conv (16 px patches): at 448-512 px input
  the token grid is 28-32 square (<= 1024 tokens) — plain single-device
  attention; no sequence parallelism needed (SURVEY.md parallelism table);
- standard pre-norm transformer encoder blocks; attention and MLPs run in the
  configured compute dtype (bf16) with fp32 layernorms/params, matmuls on the
  MXU via `jax.nn.dot_product_attention`;
- learned 2-D factorized position embeddings (row + column), so the model
  transfers across the input-size axis of the ablation without resampling a
  joint table;
- head: tokens reshaped back to the (H/16, W/16) grid, then a 1x1 conv to J
  score maps and a single 2x nearest upsample + 3x3 conv refinement, giving
  heatmaps at stride 8 (e.g. 56x56 at 448 px) — resolution comparable to the
  hourglass path for the DSNT head.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .hourglass import _upsample_nearest_2x


class ViTBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (B, N, D)
        h = nn.LayerNorm(dtype=jnp.float32, name="ln1")(x).astype(self.dtype)
        qkv = nn.DenseGeneral((3, self.num_heads, self.dim // self.num_heads),
                              dtype=self.dtype, name="qkv")(h)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        attn = jax.nn.dot_product_attention(q, k, v)
        attn = attn.reshape(*attn.shape[:2], self.dim)
        x = x + nn.Dense(self.dim, dtype=self.dtype, name="proj")(attn)
        h = nn.LayerNorm(dtype=jnp.float32, name="ln2")(x).astype(self.dtype)
        h = nn.Dense(self.mlp_ratio * self.dim, dtype=self.dtype, name="fc1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        return x + h


class ViTPose(nn.Module):
    """ViT encoder + heatmap head, emitting (1, B, J, H/8, W/8) raw maps."""

    num_joints: int = 16
    patch: int = 16
    dim: int = 384
    depth: int = 12
    num_heads: int = 6
    dtype: Any = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, size, _, _ = x.shape
        if size % self.patch:
            raise ValueError(f"input {size} not divisible by patch {self.patch}")
        g = size // self.patch
        x = x.astype(self.dtype)
        x = nn.Conv(self.dim, (self.patch, self.patch),
                    strides=(self.patch, self.patch), dtype=self.dtype,
                    name="patch_embed")(x)                     # (B, g, g, D)
        row = self.param("pos_row", nn.initializers.normal(0.02),
                         (g, self.dim), jnp.float32)
        col = self.param("pos_col", nn.initializers.normal(0.02),
                         (g, self.dim), jnp.float32)
        x = x + (row[:, None, :] + col[None, :, :]).astype(self.dtype)
        x = x.reshape(b, g * g, self.dim)
        block_cls = nn.remat(ViTBlock) if self.remat else ViTBlock
        for i in range(self.depth):
            x = block_cls(self.dim, self.num_heads, dtype=self.dtype,
                          name=f"block{i}")(x)
        x = nn.LayerNorm(dtype=jnp.float32, name="ln_out")(x)
        x = x.reshape(b, g, g, self.dim).astype(self.dtype)
        # Stride-8 heatmaps: 2x upsample + refine + score.
        x = nn.Conv(self.dim // 2, (1, 1), dtype=self.dtype, name="up_proj")(x)
        x = _upsample_nearest_2x(x)
        x = nn.gelu(nn.Conv(self.dim // 2, (3, 3), padding="SAME",
                            dtype=self.dtype, name="refine")(x))
        score = nn.Conv(self.num_joints, (1, 1), dtype=self.dtype,
                        name="score")(x)
        score = score.astype(jnp.float32)
        return jnp.transpose(score, (0, 3, 1, 2))[None]  # (1, B, J, H, W)
