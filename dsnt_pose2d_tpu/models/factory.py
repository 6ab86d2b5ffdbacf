"""Model factory: ``build_mpii_pose_model`` — the reference's public builder.

Mirrors the signature of ``build_mpii_pose_model(**kwargs)`` in
``dsnt/model.py`` (SURVEY.md C9): a single string-keyed builder used by all
CLIs, returning a model object that exposes forward, loss, coordinate
decoding, and image-spec metadata.  Here the "model object" is a lightweight
:class:`PoseModel` bundling a flax module with pure loss/decode functions —
the idiomatic JAX shape of the same surface.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.config import ModelConfig
from .heads import PoseOutput, decode_coords, pose_loss
from .hourglass import HourglassNet
from .resnet import RESNET_SPECS, ResNetPose
from .vit import ViTPose

# (embed dim, depth, heads); 16px patches, stride-8 heatmaps.
VIT_SPECS = {
    "vit_t16": (192, 4, 3),
    "vit_s16": (384, 12, 6),
    "vit_b16": (768, 12, 12),
}


class PoseNet(nn.Module):
    """Backbone + (for 'fc') per-joint linear head, by config."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, images, train: bool = False) -> PoseOutput:
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
        if cfg.base.startswith("hg"):
            num_stacks = int(cfg.base[2:])
            raw = HourglassNet(
                num_stacks=num_stacks, num_joints=cfg.num_joints,
                features=cfg.hg_features, depth=cfg.hg_depth, dtype=dtype,
                remat=cfg.remat, name="backbone")(images, train)
        elif cfg.base in RESNET_SPECS:
            raw = ResNetPose(
                arch=cfg.base, num_joints=cfg.num_joints, dilate=cfg.dilate,
                truncate=cfg.truncate, dtype=dtype, name="backbone")(images, train)
        elif cfg.base in VIT_SPECS:
            dim, depth, heads = VIT_SPECS[cfg.base]
            raw = ViTPose(
                num_joints=cfg.num_joints, dim=dim, depth=depth,
                num_heads=heads, dtype=dtype, remat=cfg.remat,
                name="backbone")(images, train)
        else:
            raise ValueError(f"unknown base model {cfg.base!r}")

        fc_coords = None
        if cfg.output_strat == "fc":
            s, b, j, h, w = raw.shape
            flat = raw.reshape(s, b, j, h * w)
            # Per-joint weights: distinct (H*W -> 2) projection for each joint,
            # shared across stacks (the per-joint analogue of swapping the
            # DSNT op for a learned linear map).
            kernel = self.param(
                "fc_head_kernel",
                nn.initializers.normal(stddev=1e-3), (j, h * w, 2), jnp.float32)
            bias = self.param("fc_head_bias", nn.initializers.zeros, (j, 2),
                              jnp.float32)
            fc_coords = jnp.einsum("sbjp,jpc->sbjc", flat.astype(jnp.float32),
                                   kernel) + bias
        return PoseOutput(heatmaps=raw, fc_coords=fc_coords)


@dataclass(frozen=True)
class ImageSpecs:
    """Input-size/normalization metadata (reference: ``image_specs``)."""

    size: int
    mean: tuple = (0.485, 0.456, 0.406)
    std: tuple = (0.229, 0.224, 0.225)


@dataclass(frozen=True)
class PoseModel:
    """Bundle of the flax module + pure head functions for one config."""

    module: PoseNet
    cfg: ModelConfig

    @property
    def image_specs(self) -> ImageSpecs:
        return ImageSpecs(size=self.cfg.resolved_input_size)

    @property
    def heatmap_size(self) -> int:
        """Output heatmap side length implied by base/dilate/truncate."""
        size = self.cfg.resolved_input_size
        if self.cfg.base.startswith("hg"):
            return size // 4
        if self.cfg.base.startswith("vit"):
            return size // 8
        stride = 32 // (2 ** (self.cfg.dilate + self.cfg.truncate))
        return size // stride

    def init_variables(self, rng, batch_size: int = 1):
        images = jnp.zeros(
            (batch_size, self.image_specs.size, self.image_specs.size, 3),
            jnp.float32)
        return self.module.init(rng, images, train=False)

    def forward(self, variables, images, train: bool = False, mutable=False):
        return self.module.apply(variables, images, train=train, mutable=mutable)

    def loss(self, output: PoseOutput, target_coords, mask):
        return pose_loss(output, target_coords, mask, self.cfg)

    def decode(self, output: PoseOutput):
        return decode_coords(output, self.cfg)


def build_mpii_pose_model(
    base: str = "hg1",
    dilate: int = 0,
    truncate: int = 0,
    output_strat: str = "dsnt",
    preact: str = "softmax",
    reg: str = "none",
    reg_coeff: float = 1.0,
    hm_sigma: float = 1.0,
    **overrides: Any,
) -> PoseModel:
    """Build an MPII pose model (public surface parity with the reference).

    Extra keyword ``overrides`` map onto :class:`ModelConfig` fields (e.g.
    ``use_pallas``, ``dtype``, ``hg_features`` for CI-scale models).
    """
    cfg = ModelConfig(
        base=base, dilate=dilate, truncate=truncate, output_strat=output_strat,
        preact=preact, reg=reg, reg_coeff=reg_coeff, hm_sigma=hm_sigma,
        **overrides)
    return build_pose_model(cfg)


def build_pose_model(cfg: ModelConfig) -> PoseModel:
    return PoseModel(module=PoseNet(cfg), cfg=cfg)
