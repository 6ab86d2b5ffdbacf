"""torchvision-ResNet weight import: build a real torch resnet18 (random
init — no downloads), convert, and verify numerics match the torch forward
through the shared trunk."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from dsnt_pose2d_tpu.models.factory import build_mpii_pose_model
from dsnt_pose2d_tpu.models.import_torch import load_torchvision_resnet


def _torch_resnet18():
    """Minimal torchvision-compatible resnet18 trunk (state_dict key layout)."""
    import torch.nn as tnn

    class Basic(tnn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(cout)
            self.conv2 = tnn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = tnn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = tnn.Sequential(
                    tnn.Conv2d(cin, cout, 1, stride, bias=False),
                    tnn.BatchNorm2d(cout))

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            y = torch.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return torch.relu(y + idt)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            for li, (c, n, s) in enumerate(
                    [(64, 2, 1), (128, 2, 2), (256, 2, 2), (512, 2, 2)], 1):
                cin = 64 if li == 1 else c // 2
                blocks = [Basic(cin, c, s)] + [Basic(c, c) for _ in range(n - 1)]
                setattr(self, f"layer{li}", tnn.Sequential(*blocks))

        def forward(self, x):
            x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
            for li in range(1, 5):
                x = getattr(self, f"layer{li}")(x)
            return x

    return Net()


@pytest.mark.slow
def test_import_resnet18_numerics():
    torch.manual_seed(0)
    tnet = _torch_resnet18().eval()
    # Randomize BN stats so the import is actually exercised.
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)
                m.weight.uniform_(0.8, 1.2)
                m.bias.uniform_(-0.1, 0.1)

    model = build_mpii_pose_model(base="resnet18", input_size=64,
                                  dtype="float32", use_pallas=False)
    variables = model.init_variables(jax.random.PRNGKey(0))
    variables = load_torchvision_resnet(variables, tnet.state_dict())

    x = np.random.default_rng(1).normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tnet(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    t_out = np.transpose(t_out.numpy(), (0, 2, 3, 1))

    # Compare the trunk feature map: strip the score conv by reading the
    # penultimate activation via a fresh apply of just the backbone...
    # simplest: score conv is 1x1 -> invertible check not needed; instead
    # compare through the score layer by zeroing it and checking shape, and
    # compare trunk outputs via the torch feature vs our heatmap regression:
    # here we directly compare the convolution stack by running our model's
    # backbone with the imported params.
    from dsnt_pose2d_tpu.models.resnet import ResNetPose

    backbone = ResNetPose(arch="resnet18", num_joints=16, dtype=jnp.float32)
    bb_vars = {"params": variables["params"]["backbone"],
               "batch_stats": variables["batch_stats"]["backbone"]}

    # Intercept the trunk: run the module but grab the input of the score
    # conv via capture_intermediates.
    out, state = backbone.apply(bb_vars, jnp.asarray(x), False,
                                capture_intermediates=True, mutable=["intermediates"])
    inter = state["intermediates"]
    # The last stage output feeds the score conv; find it as the __call__
    # input of 'score' is not captured, so instead invert: heatmaps = conv1x1
    # of trunk. Compare trunk by solving? Too indirect — instead capture the
    # final stage block output.
    trunk = inter["stage3_block1"]["__call__"][0]
    np.testing.assert_allclose(np.asarray(trunk), t_out, rtol=2e-4, atol=5e-4)


def _torch_resnet50(dilated_stages=0):
    """torchvision-semantics resnet50 trunk (state_dict key layout), with
    ``replace_stride_with_dilation`` applied to the last ``dilated_stages``
    stages: the stage's stride moves to dilation, its FIRST block keeping the
    pre-doubling dilation (torchvision ``_make_layer`` previous_dilation)."""
    import torch.nn as tnn

    class Bottleneck(tnn.Module):
        def __init__(self, cin, planes, stride=1, dilation=1, downsample=None):
            super().__init__()
            self.conv1 = tnn.Conv2d(cin, planes, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, stride, dilation,
                                    dilation, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            self.downsample = downsample

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            y = torch.relu(self.bn1(self.conv1(x)))
            y = torch.relu(self.bn2(self.conv2(y)))
            y = self.bn3(self.conv3(y))
            return torch.relu(y + idt)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            depths = (3, 4, 6, 3)
            inplanes, dilation = 64, 1
            for li in range(4):
                planes = 64 * (2 ** li)
                stride = 1 if li == 0 else 2
                prev_dilation = dilation
                if li >= 4 - dilated_stages and stride == 2:
                    dilation *= stride
                    stride = 1
                downsample = None
                if stride != 1 or inplanes != planes * 4:
                    downsample = tnn.Sequential(
                        tnn.Conv2d(inplanes, planes * 4, 1, stride, bias=False),
                        tnn.BatchNorm2d(planes * 4))
                blocks = [Bottleneck(inplanes, planes, stride, prev_dilation,
                                     downsample)]
                inplanes = planes * 4
                blocks += [Bottleneck(inplanes, planes, 1, dilation)
                           for _ in range(depths[li] - 1)]
                setattr(self, f"layer{li + 1}", tnn.Sequential(*blocks))

        def forward(self, x):
            x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
            for li in range(1, 5):
                x = getattr(self, f"layer{li}")(x)
            return x

    return Net()


@pytest.mark.slow
def test_import_dilated_resnet50_numerics():
    # The dilate>0 path (paper heatmap-resolution ablation, SURVEY C7) with
    # imported weights: flax dilated trunk == torch dilated trunk, including
    # the first-block previous_dilation subtlety (resnet.py:130-141).
    torch.manual_seed(1)
    tnet = _torch_resnet50(dilated_stages=2).eval()
    with torch.no_grad():
        for m in tnet.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)
                m.weight.uniform_(0.8, 1.2)
                m.bias.uniform_(-0.1, 0.1)

    model = build_mpii_pose_model(base="resnet50", dilate=2, input_size=64,
                                  dtype="float32", use_pallas=False)
    variables = model.init_variables(jax.random.PRNGKey(0))
    variables = load_torchvision_resnet(variables, tnet.state_dict())

    x = np.random.default_rng(2).normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tnet(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    t_out = np.transpose(t_out.numpy(), (0, 2, 3, 1))
    # Dilated stages keep resolution: 64 px -> /4 stem -> /2 stage1 -> 8x8.
    assert t_out.shape == (2, 8, 8, 2048)

    import jax.numpy as jnp

    from dsnt_pose2d_tpu.models.resnet import ResNetPose

    backbone = ResNetPose(arch="resnet50", dilate=2, num_joints=16,
                          dtype=jnp.float32)
    bb_vars = {"params": variables["params"]["backbone"],
               "batch_stats": variables["batch_stats"]["backbone"]}
    out, state = backbone.apply(bb_vars, jnp.asarray(x), False,
                                capture_intermediates=True,
                                mutable=["intermediates"])
    trunk = state["intermediates"]["stage3_block2"]["__call__"][0]
    assert trunk.shape == t_out.shape
    np.testing.assert_allclose(np.asarray(trunk), t_out, rtol=2e-4, atol=5e-4)


def test_import_rejects_shape_mismatch():
    tnet = _torch_resnet18()
    model = build_mpii_pose_model(base="resnet34", input_size=64,
                                  dtype="float32", use_pallas=False)
    variables = model.init_variables(jax.random.PRNGKey(0))
    with pytest.raises((ValueError, KeyError)):
        load_torchvision_resnet(variables, tnet.state_dict())
