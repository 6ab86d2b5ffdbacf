"""Golden parity fixtures: jnp ops vs the independent PyTorch oracle.

The oracle (tests/oracle/torch_oracle.py) re-derives the op math from the
published paper; these tests pin bit-level-comparable behavior (fp32,
atol <= 1e-5) of the jnp library against it — the stand-in for the PyTorch
reference per SURVEY.md section 7 "Hard parts" item 1.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from dsnt_pose2d_tpu import ops

# DSNT_GOLDEN_PATH overrides the checked-in oracle goldens — this is how
# tools/close_the_loop.py re-runs the whole parity suite against goldens
# REGENERATED from the real reference's op module once the mount populates.
GOLDEN_PATH = os.environ.get(
    "DSNT_GOLDEN_PATH",
    os.path.join(os.path.dirname(__file__), "goldens", "ops_goldens.npz"))

pytestmark = pytest.mark.skipif(
    not os.path.exists(GOLDEN_PATH),
    reason="goldens not generated (run python tests/oracle/torch_oracle.py)",
)


@pytest.fixture(scope="module")
def g():
    return np.load(GOLDEN_PATH)


def test_flat_softmax_parity(g):
    hm = ops.flat_softmax(jnp.asarray(g["raw"]))
    np.testing.assert_allclose(hm, g["heatmaps"], atol=1e-6)


def test_dsnt_parity(g):
    coords = ops.dsnt(jnp.asarray(g["heatmaps"]))
    np.testing.assert_allclose(coords, g["pred_coords"], atol=1e-6)


def test_make_gauss_parity(g):
    rendered = ops.make_gauss(jnp.asarray(g["target_coords"]), (64, 64), float(g["sigma"]))
    np.testing.assert_allclose(rendered, g["gauss_rendered"], atol=1e-6)


def test_euclidean_parity(g):
    euc = ops.euclidean_losses(jnp.asarray(g["pred_coords"]), jnp.asarray(g["target_coords"]))
    np.testing.assert_allclose(euc, g["euclidean"], atol=1e-6)


@pytest.mark.parametrize(
    "fn,key",
    [
        (ops.js_reg_losses, "js"),
        (ops.kl_reg_losses, "kl"),
        (ops.mse_reg_losses, "mse_reg"),
    ],
)
def test_reg_parity(g, fn, key):
    val = fn(jnp.asarray(g["heatmaps"]), jnp.asarray(g["target_coords"]), float(g["sigma"]))
    # KL sums ~4096 eps-guarded log terms to O(50); fp32 summation order
    # (XLA vs torch) shifts the result by ~1e-5 relative — tolerance is
    # relative, not absolute, for the large-magnitude regularizers.
    np.testing.assert_allclose(val, g[key], rtol=1e-5, atol=1e-5)


def test_variance_parity(g):
    val = ops.variance_reg_losses(jnp.asarray(g["heatmaps"]), float(g["sigma"]))
    np.testing.assert_allclose(val, g["variance"], atol=1e-6)


def test_total_loss_parity(g):
    euc = ops.euclidean_losses(ops.dsnt(jnp.asarray(g["heatmaps"])), jnp.asarray(g["target_coords"]))
    js = ops.js_reg_losses(jnp.asarray(g["heatmaps"]), jnp.asarray(g["target_coords"]), float(g["sigma"]))
    total = ops.average_loss(euc + js, jnp.asarray(g["mask"]))
    np.testing.assert_allclose(float(total), float(g["total_loss"]), atol=1e-6)


def test_gradient_parity(g):
    import jax

    def loss_fn(raw):
        hm = ops.flat_softmax(raw)
        euc = ops.euclidean_losses(ops.dsnt(hm), jnp.asarray(g["target_coords"]))
        js = ops.js_reg_losses(hm, jnp.asarray(g["target_coords"]), float(g["sigma"]))
        return ops.average_loss(euc + js, jnp.asarray(g["mask"]))

    grad = jax.grad(loss_fn)(jnp.asarray(g["raw"]))
    np.testing.assert_allclose(grad, g["grad_raw"], atol=1e-6)
