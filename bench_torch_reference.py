"""CPU reference benchmark: an independent PyTorch hourglass+DSNT train step.

BASELINE.md's north-star denominator ("images/sec/chip over the CPU
reference") requires measuring a PyTorch implementation of the same workload
on CPU.  The reference repo is unreadable (empty mount), so this is a minimal
independent implementation of the published architecture (Newell stacked
hourglass, arXiv:1603.06937) with the DSNT head + JS regularizer math of
arXiv:1801.07372 — the same model family and training step the TPU framework
runs.  Run once; the result is cached in BENCH_BASELINE.json by bench.py.
"""

from __future__ import annotations

import time

import torch
import torch.nn as nn
import torch.nn.functional as F


class Bottleneck(nn.Module):
    def __init__(self, in_ch, planes):
        super().__init__()
        out_ch = planes * 2
        self.bn1 = nn.BatchNorm2d(in_ch)
        self.conv1 = nn.Conv2d(in_ch, planes, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, out_ch, 1, bias=False)
        self.proj = nn.Conv2d(in_ch, out_ch, 1, bias=False) if in_ch != out_ch else None

    def forward(self, x):
        y = F.relu(self.bn1(x))
        res = self.proj(y) if self.proj is not None else x
        y = self.conv1(y)
        y = self.conv2(F.relu(self.bn2(y)))
        y = self.conv3(F.relu(self.bn3(y)))
        return y + res


class Hourglass(nn.Module):
    def __init__(self, depth, feats):
        super().__init__()
        self.depth = depth
        p = feats // 2
        self.up = nn.ModuleList([Bottleneck(feats, p) for _ in range(depth)])
        self.low1 = nn.ModuleList([Bottleneck(feats, p) for _ in range(depth)])
        self.low3 = nn.ModuleList([Bottleneck(feats, p) for _ in range(depth)])
        self.bottom = Bottleneck(feats, p)

    def forward(self, x, d=None):
        d = self.depth if d is None else d
        i = self.depth - d
        up1 = self.up[i](x)
        low = F.max_pool2d(x, 2)
        low = self.low1[i](low)
        low = self.forward(low, d - 1) if d > 1 else self.bottom(low)
        low = self.low3[i](low)
        return up1 + F.interpolate(low, scale_factor=2, mode="nearest")


class HourglassNet(nn.Module):
    def __init__(self, stacks=8, feats=256, joints=16):
        super().__init__()
        p = feats // 2
        self.stem = nn.Sequential(
            nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False),
            nn.BatchNorm2d(64), nn.ReLU(),
            Bottleneck(64, 64), nn.MaxPool2d(2),
            Bottleneck(128, p), Bottleneck(feats, p))
        self.stacks = stacks
        self.hgs = nn.ModuleList([Hourglass(4, feats) for _ in range(stacks)])
        self.post = nn.ModuleList([Bottleneck(feats, p) for _ in range(stacks)])
        self.fc = nn.ModuleList([
            nn.Sequential(nn.Conv2d(feats, feats, 1, bias=False),
                          nn.BatchNorm2d(feats), nn.ReLU())
            for _ in range(stacks)])
        self.score = nn.ModuleList([nn.Conv2d(feats, joints, 1)
                                    for _ in range(stacks)])
        self.fc_back = nn.ModuleList([nn.Conv2d(feats, feats, 1)
                                      for _ in range(stacks - 1)])
        self.score_back = nn.ModuleList([nn.Conv2d(joints, feats, 1)
                                         for _ in range(stacks - 1)])

    def forward(self, x):
        x = self.stem(x)
        outs = []
        for i in range(self.stacks):
            y = self.fc[i](self.post[i](self.hgs[i](x)))
            s = self.score[i](y)
            outs.append(s)
            if i < self.stacks - 1:
                x = x + self.fc_back[i](y) + self.score_back[i](s)
        return outs


def _linspace(l):
    return (2 * torch.arange(l, dtype=torch.float32) + 1) / l - 1


def dsnt_js_loss(heatmaps, target, sigma=1.0):
    b, j, h, w = heatmaps.shape
    z = F.softmax(heatmaps.reshape(b, j, -1), -1).reshape(b, j, h, w)
    xs, ys = _linspace(w), _linspace(h)
    cx = (z.sum(-2) * xs).sum(-1)
    cy = (z.sum(-1) * ys).sum(-1)
    coords = torch.stack([cx, cy], -1)
    euc = torch.norm(coords - target, dim=-1)
    dx = (xs - target[..., 0:1]) / (2 * sigma / w)
    dy = (ys - target[..., 1:2]) / (2 * sigma / h)
    g = torch.exp(-0.5 * (dy.unsqueeze(-1) ** 2 + dx.unsqueeze(-2) ** 2))
    g = g / g.sum(dim=(-2, -1), keepdim=True)
    m = 0.5 * (z + g)
    eps = 1e-24
    kl1 = (z * ((z + eps).log() - (m + eps).log())).sum(dim=(-2, -1))
    kl2 = (g * ((g + eps).log() - (m + eps).log())).sum(dim=(-2, -1))
    return (euc + 0.5 * kl1 + 0.5 * kl2).mean()


def measure(batch=4, iters=3, stacks=8, size=256):
    torch.manual_seed(0)
    torch.set_num_threads(max(torch.get_num_threads(), 1))
    model = HourglassNet(stacks=stacks)
    opt = torch.optim.RMSprop(model.parameters(), lr=2.5e-4)
    x = torch.randn(batch, 3, size, size)
    t = torch.rand(batch, 16, 2) * 1.6 - 0.8

    def step():
        opt.zero_grad()
        outs = model(x)
        loss = sum(dsnt_js_loss(o, t) for o in outs)
        loss.backward()
        opt.step()
        return float(loss)

    step()  # warmup
    t0 = time.time()
    for _ in range(iters):
        step()
    dt = time.time() - t0
    return batch * iters / dt


if __name__ == "__main__":
    import json

    ips = measure()
    print(json.dumps({"torch_cpu_images_per_sec": ips}))
