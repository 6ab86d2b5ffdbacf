"""Cross-framework TRAIN-STEP parity (round-2 VERDICT item 4).

Forward-pass weight-export equality (test_export_torch.py) pins the model
function; this pins the rest of the training step, in float64 so real
semantic differences are distinguishable from round-off:

1. **Loss parity**: identical weights + batch -> the full training loss
   (DSNT + JS reg, intermediate supervision, per-stack masked mean, sum)
   agrees between flax and torch to ~1e-8 relative (train-mode BN included).
2. **Gradient parity**: d(loss)/d(params) agree parameter-by-parameter
   (conv kernels, BN scales/biases, both stacks) to fp64 tolerance.
3. **Optimizer parity**: given BIT-IDENTICAL gradients, one
   ``optax.rmsprop(eps_in_sqrt=False)`` step equals one
   ``torch.optim.RMSprop`` step essentially bitwise on the whole tree
   (plus a synthetic-trajectory check that the optax DEFAULT eps convention
   would NOT match — the parity is evidence, not coincidence).

Float64 is load-bearing, not cosmetic: in fp32, gradients THROUGH train-mode
batch-norm are differences of large, nearly-cancelling terms, so the
element-wise residue is dominated by accumulation-order noise — measured
cross-framework correlation of the stem conv gradient is ~0 in fp32 and the
losses themselves drift ~1e-3.  At fp64 the cancellation resolves and both
frameworks agree to ~1e-9, which is what makes the comparison meaningful.

The torch side reuses the independent re-implementations
(``bench_torch_reference.HourglassNet``, ``tests/oracle/torch_oracle``) —
re-derived from the published math, not copied.
"""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent / "oracle"))

from bench_torch_reference import HourglassNet as TorchHG  # noqa: E402
import torch_oracle as TO  # noqa: E402

from dsnt_pose2d_tpu import ops  # noqa: E402
from dsnt_pose2d_tpu.models.export_torch import hourglass_to_torch_state  # noqa: E402
from dsnt_pose2d_tpu.models.hourglass import HourglassNet  # noqa: E402
from dsnt_pose2d_tpu.train.state import make_optimizer  # noqa: E402
from dsnt_pose2d_tpu.utils.config import OptimConfig  # noqa: E402

STACKS, FEATS, J, SIZE = 2, 32, 16, 64
LR, SIGMA = 2.5e-4, 1.0


def _flax_loss(model, params, batch_stats, x, t, mask):
    import jax.numpy as jnp

    out, _ = model.apply(
        {"params": params, "batch_stats": batch_stats}, x, train=True,
        mutable=["batch_stats"])                       # (S, B, J, H, W)
    z = ops.flat_softmax(out)
    coords = ops.dsnt(z)
    tb = jnp.broadcast_to(t[None], coords.shape)
    per_joint = (ops.euclidean_losses(coords, tb)
                 + ops.js_reg_losses(z, tb, SIGMA))    # (S, B, J)
    m = jnp.broadcast_to(mask[None], per_joint.shape).astype(per_joint.dtype)
    per_stack = (jnp.sum(per_joint * m, axis=(1, 2))
                 / jnp.maximum(jnp.sum(m, axis=(1, 2)), 1.0))
    return jnp.sum(per_stack)                          # stack_loss='sum'


def _torch_loss(model, x, t, mask):
    outs = model(x)                                    # list of (B, J, H, W)
    total = 0.0
    for s in outs:
        z = TO.flat_softmax(s)
        coords = TO.dsnt(z)
        per_joint = (TO.euclidean_losses(coords, t)
                     + TO.js_reg_losses(z, t, SIGMA))
        total = total + (per_joint * mask).sum() / mask.sum().clamp_min(1.0)
    return total


@pytest.mark.slow
def test_train_step_parity_fp64():
    import jax.numpy as jnp
    import optax

    with jax.enable_x64(True):
        rng = np.random.default_rng(31)
        x = rng.normal(size=(4, SIZE, SIZE, 3)).astype(np.float64) * 0.5
        t = rng.uniform(-0.7, 0.7, size=(4, J, 2)).astype(np.float64)
        mask = (rng.uniform(size=(4, J)) > 0.2).astype(np.float64)

        flax_model = HourglassNet(num_stacks=STACKS, num_joints=J,
                                  features=FEATS, dtype=jnp.float64)
        variables = flax_model.init(jax.random.PRNGKey(7), jnp.asarray(x),
                                    train=False)
        variables = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.float64), variables)
        torch_model = TorchHG(stacks=STACKS, feats=FEATS, joints=J).double()
        torch_model.load_state_dict(
            {k: torch.from_numpy(np.array(v, np.float64)) for k, v in
             hourglass_to_torch_state(variables, STACKS).items()},
            strict=True)
        torch_model.train()

        # --- flax loss + grads ------------------------------------------
        params, batch_stats = variables["params"], variables["batch_stats"]
        xj, tj, mj = jnp.asarray(x), jnp.asarray(t), jnp.asarray(mask)
        loss_f, grads = jax.value_and_grad(
            lambda p: _flax_loss(flax_model, p, batch_stats, xj, tj, mj)
        )(params)

        # --- torch loss + grads -----------------------------------------
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        tt, mt = torch.from_numpy(t), torch.from_numpy(mask)
        loss_t = _torch_loss(torch_model, xt, tt, mt)
        loss_t.backward()

        # (1) loss parity.
        np.testing.assert_allclose(float(loss_f), float(loss_t.detach()),
                                   rtol=1e-8)

        # (2) gradient parity.  atol is scaled to the GLOBAL gradient
        # magnitude: tensors like the score-conv bias have true gradient ~0
        # (the softmax Jacobian annihilates constants), so a per-tensor
        # relative test on them would compare pure round-off residues.
        g_exp = hourglass_to_torch_state(
            {"params": grads, "batch_stats": batch_stats}, STACKS)
        gmax = max(float(np.abs(np.asarray(g_exp[n])).max())
                   for n, _ in torch_model.named_parameters())
        n_checked = 0
        for name, p in torch_model.named_parameters():
            np.testing.assert_allclose(
                np.asarray(g_exp[name]), p.grad.detach().numpy(),
                rtol=1e-6, atol=1e-9 * gmax,
                err_msg=f"grad mismatch: {name}")
            n_checked += 1
        assert n_checked > 50  # every conv/bn weight+bias across both stacks

        # (3) optimizer parity on IDENTICAL gradients: feed the flax
        # gradients into torch.optim.RMSprop and into the framework's optax
        # chain (state.py: eps OUTSIDE the sqrt) — updated parameters must
        # agree essentially bitwise across the whole tree.
        with torch.no_grad():
            for name, p in torch_model.named_parameters():
                p.grad = torch.from_numpy(np.array(g_exp[name], np.float64))
        opt = torch.optim.RMSprop(torch_model.parameters(), lr=LR,
                                  alpha=0.99, eps=1e-8)
        opt.step()

        tx = make_optimizer(OptimConfig(lr=LR, schedule="constant"))
        updates, _ = tx.update(grads, tx.init(params), params)
        new_params = optax.apply_updates(params, updates)
        p_exp = hourglass_to_torch_state(
            {"params": new_params, "batch_stats": batch_stats}, STACKS)
        for name, p in torch_model.named_parameters():
            np.testing.assert_allclose(
                np.asarray(p_exp[name]), p.detach().numpy(),
                rtol=1e-10, atol=1e-14,
                err_msg=f"RMSProp update mismatch: {name}")


def test_rmsprop_trajectory_and_eps_convention():
    # Synthetic 3-step trajectory on a mixed-magnitude gradient sequence:
    # optax(eps_in_sqrt=False) tracks torch.optim.RMSprop bit-for-bit, and
    # the optax DEFAULT (eps inside the sqrt) visibly does not — guarding
    # the state.py:48 convention claim from both sides.
    import jax.numpy as jnp
    import optax

    p0, lr, alpha, eps = 0.5, 2.5e-4, 0.99, 1e-8

    def torch_traj(g_seq):
        p = torch.nn.Parameter(torch.tensor([p0]))
        opt = torch.optim.RMSprop([p], lr=lr, alpha=alpha, eps=eps)
        vals = []
        for g in g_seq:
            opt.zero_grad()
            p.grad = torch.tensor([g])
            opt.step()
            vals.append(float(p.detach()))
        return vals

    def optax_traj(tx, g_seq):
        params = jnp.array([p0], jnp.float32)
        st = tx.init(params)
        vals = []
        for g in g_seq:
            u, st = tx.update(jnp.array([g], jnp.float32), st, params)
            params = optax.apply_updates(params, u)
            vals.append(float(params[0]))
        return vals

    good = optax.rmsprop(lr, decay=alpha, eps=eps, eps_in_sqrt=False)
    default = optax.rmsprop(lr, decay=alpha, eps=eps)

    mixed = [0.37, -0.0021, 1e-6]
    np.testing.assert_array_equal(torch_traj(mixed),
                                  optax_traj(good, mixed))  # bit-identical

    # Small gradients are where the conventions diverge hard: with
    # nu ~ (1-alpha) g^2 tiny, sqrt(nu)+eps vs sqrt(nu+eps) differ by
    # orders of magnitude in step size.
    small = [1e-6, -2e-6, 1e-6]
    np.testing.assert_array_equal(torch_traj(small),
                                  optax_traj(good, small))
    t_small = torch_traj(small)
    d_small = optax_traj(default, small)
    assert abs(t_small[-1] - d_small[-1]) > 1e-5 * abs(t_small[-1] - p0)
