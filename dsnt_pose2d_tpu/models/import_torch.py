"""Import torchvision ResNet weights into the flax ResNet backbone.

The reference uses ImageNet-pretrained torchvision ResNets (SURVEY.md C7).
This converter maps a torchvision ``resnet{18,34,50,101}`` ``state_dict``
(or an .npz/dict of numpy arrays with the same keys) onto
:class:`dsnt_pose2d_tpu.models.resnet.ResNetPose` parameters:

    conv1.weight                 -> backbone/stem_conv  (OIHW -> HWIO)
    bn1.{weight,bias}            -> backbone/stem_bn    scale/bias
    bn1.running_{mean,var}       -> batch_stats stem_bn mean/var
    layer{L}.{B}.conv{N}.weight  -> stage{L-1}_block{B} convN
    layer{L}.{B}.bn{N}.*         -> stage{L-1}_block{B} bnN
    layer{L}.{B}.downsample.0/1  -> proj / bn_proj
    fc.*                         -> dropped (classification head unused)

The score head (1x1 conv to J joints) keeps its fresh initialization.
Usage:

    variables = model.init_variables(rng)
    variables = load_torchvision_resnet(variables, state_dict_like)
"""

from __future__ import annotations

import re

import jax.numpy as jnp
import numpy as np


def _to_np(v):
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v)


def _conv_kernel(w):
    # torch OIHW -> flax HWIO
    return jnp.asarray(np.transpose(_to_np(w), (2, 3, 1, 0)))


def load_torchvision_resnet(variables: dict, state_dict) -> dict:
    """Return a new variables dict with backbone weights replaced.

    Raises KeyError when an expected torch key is missing and ValueError on
    shape mismatch, so silent partial imports cannot happen.
    """
    import flax

    sd = {k: _to_np(v) for k, v in dict(state_dict).items()}
    params = flax.core.unfreeze(variables["params"])
    stats = flax.core.unfreeze(variables.get("batch_stats", {}))
    bb_p = params["backbone"]
    bb_s = stats["backbone"]

    def set_conv(flax_name, torch_key):
        kern = _conv_kernel(sd[torch_key])
        if bb_p[flax_name]["kernel"].shape != kern.shape:
            raise ValueError(
                f"{torch_key}: shape {kern.shape} != "
                f"{bb_p[flax_name]['kernel'].shape}")
        bb_p[flax_name]["kernel"] = kern

    def set_bn(flax_name, torch_prefix):
        bb_p[flax_name]["scale"] = jnp.asarray(sd[f"{torch_prefix}.weight"])
        bb_p[flax_name]["bias"] = jnp.asarray(sd[f"{torch_prefix}.bias"])
        bb_s[flax_name]["mean"] = jnp.asarray(sd[f"{torch_prefix}.running_mean"])
        bb_s[flax_name]["var"] = jnp.asarray(sd[f"{torch_prefix}.running_var"])

    set_conv("stem_conv", "conv1.weight")
    set_bn("stem_bn", "bn1")

    block_re = re.compile(r"^layer(\d+)\.(\d+)\.")
    blocks = sorted({(int(m.group(1)), int(m.group(2)))
                     for k in sd if (m := block_re.match(k))})
    torch_blocks = {f"stage{l - 1}_block{b}" for l, b in blocks}
    flax_blocks = {k for k in bb_p if re.match(r"stage\d+_block\d+$", k)}
    missing = flax_blocks - torch_blocks
    if missing:
        raise ValueError(
            f"state_dict does not cover model blocks {sorted(missing)} — "
            f"wrong ResNet depth? (import would be silently partial)")
    for layer, b in blocks:
        flax_block = f"stage{layer - 1}_block{b}"
        if flax_block not in bb_p:
            continue  # truncated stage
        prefix = f"layer{layer}.{b}"
        n = 1
        while f"{prefix}.conv{n}.weight" in sd:
            set_conv_in_block(bb_p, bb_s, flax_block, f"conv{n}",
                              sd, f"{prefix}.conv{n}.weight")
            set_bn_in_block(bb_p, bb_s, flax_block, f"bn{n}", sd,
                            f"{prefix}.bn{n}")
            n += 1
        if f"{prefix}.downsample.0.weight" in sd:
            set_conv_in_block(bb_p, bb_s, flax_block, "proj", sd,
                              f"{prefix}.downsample.0.weight")
            set_bn_in_block(bb_p, bb_s, flax_block, "bn_proj", sd,
                            f"{prefix}.downsample.1")

    params["backbone"] = bb_p
    stats["backbone"] = bb_s
    out = dict(variables)
    out["params"] = flax.core.freeze(params) if isinstance(
        variables["params"], flax.core.FrozenDict) else params
    out["batch_stats"] = flax.core.freeze(stats) if isinstance(
        variables.get("batch_stats"), flax.core.FrozenDict) else stats
    return out


def set_conv_in_block(bb_p, bb_s, block, name, sd, torch_key):
    kern = _conv_kernel(sd[torch_key])
    if bb_p[block][name]["kernel"].shape != kern.shape:
        raise ValueError(f"{torch_key}: {kern.shape} != "
                         f"{bb_p[block][name]['kernel'].shape}")
    bb_p[block][name]["kernel"] = kern


def set_bn_in_block(bb_p, bb_s, block, name, sd, torch_prefix):
    bb_p[block][name]["scale"] = jnp.asarray(sd[f"{torch_prefix}.weight"])
    bb_p[block][name]["bias"] = jnp.asarray(sd[f"{torch_prefix}.bias"])
    bb_s[block][name]["mean"] = jnp.asarray(sd[f"{torch_prefix}.running_mean"])
    bb_s[block][name]["var"] = jnp.asarray(sd[f"{torch_prefix}.running_var"])
