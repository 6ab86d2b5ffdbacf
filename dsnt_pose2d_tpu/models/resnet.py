"""ResNet backbones with dilation/truncation, flax.linen, NHWC.

TPU-native equivalent of the reference's torchvision-ResNet adapter
(``dsnt/model.py``, SURVEY.md C7): ResNet-{18,34,50,101} with

- ``truncate N``: drop the last N stages (raises heatmap resolution,
  7 -> 14 -> 28 -> 56 px at 224 input);
- ``dilate N``: convert the stride-2 downsampling of the last N remaining
  stages into dilation (stride 1, kernel dilation doubling per converted
  stage), preserving receptive field while raising resolution — the paper's
  mechanism for the heatmap-resolution ablation;

followed by a 1x1 conv to J joint score maps.  Pretrained ImageNet weights are
optional in the reference (BASELINE stretch); here models train from scratch
(a torchvision-weight importer can be layered on later without changing this
module).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

# (block, per-stage depths); channels per stage are 64*2^i (x4 for bottleneck).
RESNET_SPECS = {
    "resnet18": ("basic", (2, 2, 2, 2)),
    "resnet34": ("basic", (3, 4, 6, 3)),
    "resnet50": ("bottleneck", (3, 4, 6, 3)),
    "resnet101": ("bottleneck", (3, 4, 23, 3)),
}


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        d = (self.dilation, self.dilation)
        # Explicit symmetric padding (torch convention): flax 'SAME' pads
        # asymmetrically under stride 2, which breaks imported-weight parity.
        pad3 = ((self.dilation, self.dilation),) * 2
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    kernel_dilation=d, padding=pad3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(self.planes, (3, 3), kernel_dilation=d, padding=pad3,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = norm("bn2")(y)
        if x.shape[-1] != self.planes or self.stride != 1:
            x = nn.Conv(self.planes, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, dtype=self.dtype, name="proj")(x)
            x = norm("bn_proj")(x)
        return nn.relu(x + y)


class BottleneckBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        out_ch = 4 * self.planes
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                    kernel_dilation=(self.dilation, self.dilation),
                    padding=((self.dilation, self.dilation),) * 2,
                    use_bias=False, dtype=self.dtype,
                    name="conv2")(y)
        y = nn.relu(norm("bn2")(y))
        y = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = norm("bn3")(y)
        if x.shape[-1] != out_ch or self.stride != 1:
            x = nn.Conv(out_ch, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, dtype=self.dtype, name="proj")(x)
            x = norm("bn_proj")(x)
        return nn.relu(x + y)


class ResNetPose(nn.Module):
    """ResNet backbone + 1x1 score head, emitting (1, B, J, H, W) raw maps.

    The leading singleton axis matches the hourglass per-stack convention
    (a ResNet has one "stack"), so heads treat all backbones uniformly.
    """

    arch: str = "resnet34"
    num_joints: int = 16
    dilate: int = 0
    truncate: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        block_kind, depths = RESNET_SPECS[self.arch]
        block = BasicBlock if block_kind == "basic" else BottleneckBlock
        num_stages = len(depths) - self.truncate
        if num_stages < 1:
            raise ValueError(f"truncate={self.truncate} removes every stage")
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)

        x = x.astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        x = nn.relu(norm("stem_bn")(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))

        dilation = 1
        for stage in range(num_stages):
            planes = 64 * (2 ** stage)
            stride = 1 if stage == 0 else 2
            # The last `dilate` stages trade their stride for dilation.
            # torchvision semantics (replace_stride_with_dilation): the
            # stage's FIRST block keeps the pre-doubling dilation; only the
            # remaining blocks use the doubled one — required for imported
            # pretrained weights to compute the same function.
            prev_dilation = dilation
            if stage >= num_stages - self.dilate and stride == 2:
                stride = 1
                dilation *= 2
            for b in range(depths[stage]):
                x = block(planes, stride=stride if b == 0 else 1,
                          dilation=prev_dilation if b == 0 else dilation,
                          dtype=self.dtype,
                          name=f"stage{stage}_block{b}")(x, train)

        score = nn.Conv(self.num_joints, (1, 1), dtype=self.dtype,
                        name="score")(x)
        score = score.astype(jnp.float32)
        return jnp.transpose(score, (0, 3, 1, 2))[None]  # (1, B, J, H, W)
