"""Pallas fused DSNT-head kernel vs the jnp oracle (SURVEY.md section 7
stage 6): forward coords/reg equivalence and custom-VJP equivalence against
``jax.grad`` of the jnp composition, fp32, interpreter mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsnt_pose2d_tpu import ops
from dsnt_pose2d_tpu.ops.pallas import AVAILABLE, fused_dsnt_head

pytestmark = pytest.mark.skipif(not AVAILABLE, reason="pallas unavailable")


def _oracle(raw, t, sigma, reg, preact="softmax"):
    z = ops.HEATMAP_ACTIVATIONS[preact](raw)
    coords = ops.dsnt(z)
    if reg == "none":
        return coords, None
    if reg == "var":
        return coords, ops.variance_reg_losses(z, sigma)
    fn = {"js": ops.js_reg_losses, "kl": ops.kl_reg_losses,
          "mse": ops.mse_reg_losses}[reg]
    return coords, fn(z, t, sigma)


@pytest.fixture(scope="module")
def data(request):
    rng = np.random.default_rng(7)
    raw = jnp.asarray(rng.normal(size=(3, 4, 16, 16)).astype(np.float32) * 3)
    t = jnp.asarray(rng.uniform(-0.8, 0.8, size=(3, 4, 2)).astype(np.float32))
    return raw, t


@pytest.mark.parametrize("preact", ["softmax", "thresholded_softmax"])
@pytest.mark.parametrize("reg", ["none", "js", "kl", "mse", "var"])
def test_forward_matches_oracle(data, reg, preact):
    raw, t = data
    coords, regv = fused_dsnt_head(raw, t, sigma_px=1.0, reg=reg,
                                   preact=preact)
    coords_o, regv_o = _oracle(raw, t, 1.0, reg, preact)
    np.testing.assert_allclose(coords, coords_o, atol=2e-6)
    if reg != "none":
        np.testing.assert_allclose(regv, regv_o, rtol=1e-5, atol=1e-5)


def test_thresholded_all_below_falls_back(data):
    # A map entirely below the threshold must fall back to plain softmax
    # (same convention as ops.activations.thresholded_softmax).
    rng = np.random.default_rng(17)
    raw = jnp.asarray(rng.uniform(-5.0, -1.0, size=(4, 8, 8)).astype(np.float32))
    t = jnp.zeros((4, 2), jnp.float32)
    coords, regv = fused_dsnt_head(raw, t, reg="js",
                                   preact="thresholded_softmax")
    coords_o, regv_o = _oracle(raw, t, 1.0, "js", "thresholded_softmax")
    np.testing.assert_allclose(coords, coords_o, atol=2e-6)
    np.testing.assert_allclose(regv, regv_o, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("threshold", [-1.0, 0.5, 2.0])
def test_threshold_knob_matches_oracle(data, threshold):
    # The hm_threshold knob (ModelConfig.hm_threshold) must flow to BOTH the
    # fused kernel (static arg) and the jnp path and agree, fwd and grad.
    raw, t = data
    coords, regv = fused_dsnt_head(raw, t, sigma_px=1.0, reg="js",
                                   preact="thresholded_softmax",
                                   threshold=threshold)
    z = ops.thresholded_softmax(raw, threshold)
    coords_o = ops.dsnt(z)
    regv_o = ops.js_reg_losses(z, t, 1.0)
    np.testing.assert_allclose(coords, coords_o, atol=2e-6)
    np.testing.assert_allclose(regv, regv_o, rtol=1e-5, atol=1e-5)

    def loss_pallas(raw):
        c, r = fused_dsnt_head(raw, t, sigma_px=1.0, reg="js",
                               preact="thresholded_softmax",
                               threshold=threshold)
        return jnp.sum(ops.euclidean_losses(c, t) + r)

    def loss_oracle(raw):
        z = ops.thresholded_softmax(raw, threshold)
        return jnp.sum(ops.euclidean_losses(ops.dsnt(z), t)
                       + ops.js_reg_losses(z, t, 1.0))

    np.testing.assert_allclose(jax.grad(loss_pallas)(raw),
                               jax.grad(loss_oracle)(raw),
                               rtol=1e-4, atol=1e-6)


def test_threshold_knob_through_model_config():
    # End-to-end: hm_threshold in ModelConfig changes the loss on both the
    # pallas and jnp head paths, and the two paths agree.
    from dsnt_pose2d_tpu.models.heads import PoseOutput, pose_loss
    from dsnt_pose2d_tpu.utils.config import ModelConfig

    rng = np.random.default_rng(23)
    raw = jnp.asarray(rng.normal(size=(1, 2, 4, 8, 8)).astype(np.float32) * 3)
    t = jnp.asarray(rng.uniform(-0.5, 0.5, size=(2, 4, 2)).astype(np.float32))
    mask = jnp.ones((2, 4), jnp.float32)
    out = PoseOutput(heatmaps=raw)

    losses = {}
    for use_pallas in (True, False):
        for thr in (0.0, 1.0):
            cfg = ModelConfig(base="hg1", reg="js",
                              preact="thresholded_softmax",
                              hm_threshold=thr, use_pallas=use_pallas)
            losses[(use_pallas, thr)], _ = pose_loss(out, t, mask, cfg)
    np.testing.assert_allclose(losses[(True, 0.0)], losses[(False, 0.0)],
                               rtol=1e-5)
    np.testing.assert_allclose(losses[(True, 1.0)], losses[(False, 1.0)],
                               rtol=1e-5)
    assert abs(float(losses[(True, 0.0)] - losses[(True, 1.0)])) > 1e-6


def test_unfused_preact_raises(data):
    raw, t = data
    with pytest.raises(ValueError, match="not fused"):
        fused_dsnt_head(raw, t, reg="js", preact="relu")


def test_pallas_gate_warns_on_bypass():
    from dsnt_pose2d_tpu.models.heads import use_pallas_head
    from dsnt_pose2d_tpu.utils.config import ModelConfig

    with pytest.warns(UserWarning, match="not fused"):
        assert not use_pallas_head(ModelConfig(preact="relu", use_pallas=True))
    assert use_pallas_head(ModelConfig(preact="thresholded_softmax",
                                       use_pallas=True))
    assert not use_pallas_head(ModelConfig(use_pallas=False))


def test_eval_path_no_targets(data):
    raw, _ = data
    coords, regv = fused_dsnt_head(raw, None, reg="js")
    assert regv is None
    np.testing.assert_allclose(coords, ops.dsnt(ops.flat_softmax(raw)), atol=2e-6)


def test_nonaligned_heatmap_size():
    # 7x7 resnet heatmaps: lane padding path.
    rng = np.random.default_rng(3)
    raw = jnp.asarray(rng.normal(size=(5, 7, 7)).astype(np.float32))
    t = jnp.zeros((5, 2), jnp.float32)
    coords, regv = fused_dsnt_head(raw, t, sigma_px=0.7, reg="js")
    coords_o, regv_o = _oracle(raw, t, 0.7, "js")
    np.testing.assert_allclose(coords, coords_o, atol=2e-6)
    np.testing.assert_allclose(regv, regv_o, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("preact", ["softmax", "thresholded_softmax"])
@pytest.mark.parametrize("reg", ["none", "js", "kl", "mse", "var"])
def test_gradients_match_oracle(data, reg, preact):
    raw, t = data
    mask = jnp.asarray(
        np.random.default_rng(5).uniform(size=(3, 4)) > 0.3, jnp.float32)

    def loss_pallas(raw):
        coords, regv = fused_dsnt_head(raw, t, sigma_px=1.0, reg=reg,
                                       preact=preact)
        l = ops.euclidean_losses(coords, t)
        if regv is not None:
            l = l + regv
        return ops.average_loss(l, mask)

    def loss_oracle(raw):
        coords, regv = _oracle(raw, t, 1.0, reg, preact)
        l = ops.euclidean_losses(coords, t)
        if regv is not None:
            l = l + regv
        return ops.average_loss(l, mask)

    gp = jax.grad(loss_pallas)(raw)
    go = jax.grad(loss_oracle)(raw)
    np.testing.assert_allclose(gp, go, rtol=1e-4, atol=1e-6)


def test_coords_only_gradient():
    # Cotangent flows only through coords (reg output unused).
    rng = np.random.default_rng(11)
    raw = jnp.asarray(rng.normal(size=(2, 8, 8)).astype(np.float32))
    t = jnp.zeros((2, 2), jnp.float32)

    def f(raw):
        coords, _ = fused_dsnt_head(raw, t, reg="js")
        return jnp.sum(coords ** 2)

    def f_o(raw):
        return jnp.sum(ops.dsnt(ops.flat_softmax(raw)) ** 2)

    np.testing.assert_allclose(jax.grad(f)(raw), jax.grad(f_o)(raw),
                               rtol=1e-4, atol=1e-6)


def test_large_batch_tiling():
    # More rows than one 128-row tile: grid iteration correctness.
    rng = np.random.default_rng(13)
    raw = jnp.asarray(rng.normal(size=(300, 8, 8)).astype(np.float32))
    t = jnp.asarray(rng.uniform(-0.5, 0.5, size=(300, 2)).astype(np.float32))
    coords, regv = fused_dsnt_head(raw, t, reg="js")
    coords_o, regv_o = _oracle(raw, t, 1.0, "js")
    np.testing.assert_allclose(coords, coords_o, atol=2e-6)
    np.testing.assert_allclose(regv, regv_o, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("impl", ["vec", "legacy"])
@pytest.mark.parametrize("shape", [(64, 328, 210), (48, 146, 64),
                                   (256, 1288, 836), (16, 512, 300)])
def test_row_shift_matches_reference(shape, impl):
    # Shapes chosen to exercise non-power-of-two padded widths and both
    # k_hi = 0 and k_hi = 128 aligned windows: compiled dynamic lane rotates
    # were wrong at non-power-of-two widths (the `legacy` wrapper sizes
    # windows to powers of two; `vec` uses static rolls, exact at any
    # width) — keep these pinned on both interpret and TPU runs, both impls.
    from dsnt_pose2d_tpu.ops.pallas.row_shift import shift_rows

    r, l, out = shape
    rng = np.random.default_rng(r + l)
    rows = rng.uniform(size=(r, l)).astype(np.float32)
    starts = rng.integers(0, l - out - 1, size=(r,)).astype(np.int32)
    fracs = rng.uniform(size=(r,)).astype(np.float32)
    got = np.asarray(shift_rows(jnp.asarray(rows), jnp.asarray(starts),
                                jnp.asarray(fracs), out, impl=impl))
    exp = np.stack([(1 - fracs[i]) * rows[i, starts[i]:starts[i] + out]
                    + fracs[i] * rows[i, starts[i] + 1:starts[i] + out + 1]
                    for i in range(r)])
    np.testing.assert_allclose(got, exp, atol=1e-6)


def test_row_shift_strided():
    # stride=C interleaved rows: one-pixel shift = C elements (the shear
    # warp's layout).
    from dsnt_pose2d_tpu.ops.pallas.row_shift import shift_rows

    r, lpx, outpx, c = 24, 50, 30, 3
    rng = np.random.default_rng(9)
    rows = rng.uniform(size=(r, lpx * c)).astype(np.float32)
    starts_px = rng.integers(0, lpx - outpx - 1, size=(r,)).astype(np.int32)
    fracs = rng.uniform(size=(r,)).astype(np.float32)
    got = np.asarray(shift_rows(jnp.asarray(rows),
                                jnp.asarray(starts_px * c),
                                jnp.asarray(fracs), outpx * c, stride=c))
    exp = np.stack([
        (1 - fracs[i]) * rows[i, starts_px[i] * c:(starts_px[i] + outpx) * c]
        + fracs[i] * rows[i, (starts_px[i] + 1) * c:(starts_px[i] + outpx + 1) * c]
        for i in range(r)])
    np.testing.assert_allclose(got, exp, atol=1e-6)
