"""Independent PyTorch oracle for the DSNT op math.

Re-implements the published math (Nibali et al., arXiv:1801.07372; SURVEY.md
section 7 "Exact op semantics") directly in PyTorch, *independently* of the jnp
library, to freeze golden parity fixtures.  This stands in for the reference
repo until `/root/reference` is readable: "bit-level-comparable coordinates"
is checked jnp-vs-this-oracle (fp32, atol 1e-6).

Run as a script to (re)generate ``tests/goldens/ops_goldens.npz``:

    python tests/oracle/torch_oracle.py
"""

import numpy as np
import torch

EPS = 1e-24


def normalized_linspace(length, dtype=torch.float32):
    i = torch.arange(length, dtype=dtype)
    return (2.0 * i + 1.0) / length - 1.0


def flat_softmax(x):
    *lead, h, w = x.shape
    return torch.softmax(x.reshape(*lead, h * w), dim=-1).reshape(*lead, h, w)


def dsnt(hm):
    h, w = hm.shape[-2:]
    xs = normalized_linspace(w, hm.dtype)
    ys = normalized_linspace(h, hm.dtype)
    x_hat = (hm.sum(dim=-2) * xs).sum(dim=-1)
    y_hat = (hm.sum(dim=-1) * ys).sum(dim=-1)
    return torch.stack([x_hat, y_hat], dim=-1)


def make_gauss(coords, size_hw, sigma_px, normalize=True):
    h, w = size_hw
    xs = normalized_linspace(w, coords.dtype)
    ys = normalized_linspace(h, coords.dtype)
    std_x = 2.0 * sigma_px / w
    std_y = 2.0 * sigma_px / h
    dx = (xs - coords[..., 0:1]) / std_x
    dy = (ys - coords[..., 1:2]) / std_y
    gauss = torch.exp(-0.5 * (dy.unsqueeze(-1) ** 2 + dx.unsqueeze(-2) ** 2))
    if normalize:
        gauss = gauss / gauss.sum(dim=(-2, -1), keepdim=True).clamp_min(EPS)
    return gauss


def _kl(p, q):
    return (p * ((p + EPS).log() - (q + EPS).log())).sum(dim=(-2, -1))


def kl_reg_losses(hm, coords, sigma_px):
    return _kl(hm, make_gauss(coords, hm.shape[-2:], sigma_px))


def js_reg_losses(hm, coords, sigma_px):
    g = make_gauss(coords, hm.shape[-2:], sigma_px)
    m = 0.5 * (hm + g)
    return 0.5 * _kl(hm, m) + 0.5 * _kl(g, m)


def mse_reg_losses(hm, coords, sigma_px):
    g = make_gauss(coords, hm.shape[-2:], sigma_px)
    return ((hm - g) ** 2).mean(dim=(-2, -1))


def variance_reg_losses(hm, sigma_px):
    h, w = hm.shape[-2:]
    xs = normalized_linspace(w, hm.dtype)
    ys = normalized_linspace(h, hm.dtype)
    marg_x = hm.sum(dim=-2)
    marg_y = hm.sum(dim=-1)
    mu_x = (marg_x * xs).sum(dim=-1)
    mu_y = (marg_y * ys).sum(dim=-1)
    var_x = (marg_x * xs**2).sum(dim=-1) - mu_x**2
    var_y = (marg_y * ys**2).sum(dim=-1) - mu_y**2
    tx = (2.0 * sigma_px / w) ** 2
    ty = (2.0 * sigma_px / h) ** 2
    return (var_x - tx) ** 2 + (var_y - ty) ** 2


def euclidean_losses(actual, target):
    return torch.norm(actual - target, dim=-1)


def average_loss(losses, mask=None):
    if mask is None:
        return losses.mean()
    return (losses * mask).sum() / mask.sum().clamp_min(1.0)


def generate_goldens(path):
    torch.manual_seed(20260816)
    raw = torch.randn(4, 16, 64, 64, dtype=torch.float32)
    coords_t = torch.rand(4, 16, 2, dtype=torch.float32) * 1.8 - 0.9
    mask = (torch.rand(4, 16) > 0.2).float()
    sigma = 1.0

    hm = flat_softmax(raw)
    pred = dsnt(hm)
    euc = euclidean_losses(pred, coords_t)
    js = js_reg_losses(hm, coords_t, sigma)
    kl = kl_reg_losses(hm, coords_t, sigma)
    mser = mse_reg_losses(hm, coords_t, sigma)
    var = variance_reg_losses(hm, sigma)
    total = average_loss(euc + 1.0 * js, mask)

    # Gradient golden: d total / d raw through softmax + dsnt + js.
    raw_g = raw.clone().requires_grad_(True)
    hm_g = flat_softmax(raw_g)
    loss = average_loss(
        euclidean_losses(dsnt(hm_g), coords_t) + js_reg_losses(hm_g, coords_t, sigma),
        mask,
    )
    loss.backward()

    np.savez(
        path,
        raw=raw.numpy(),
        target_coords=coords_t.numpy(),
        mask=mask.numpy(),
        sigma=np.float32(sigma),
        heatmaps=hm.numpy(),
        pred_coords=pred.numpy(),
        euclidean=euc.numpy(),
        js=js.numpy(),
        kl=kl.numpy(),
        mse_reg=mser.numpy(),
        variance=var.numpy(),
        total_loss=total.detach().numpy(),
        grad_raw=raw_g.grad.numpy(),
        gauss_rendered=make_gauss(coords_t, (64, 64), sigma).numpy(),
    )
    print(f"wrote goldens to {path}")


if __name__ == "__main__":
    import os

    out = os.path.join(os.path.dirname(__file__), "..", "goldens", "ops_goldens.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    generate_goldens(out)
