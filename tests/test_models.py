"""Model unit tests (reference style, SURVEY.md section 4): factory returns the
right architecture, forward shapes, head losses differentiable, dilate/truncate
resolution arithmetic.  All models are CI-scale (small features / inputs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsnt_pose2d_tpu.models import build_mpii_pose_model

# CI-scale overrides: tiny hourglass, small inputs, fp32, no pallas on CPU.
TINY = dict(hg_features=32, hg_depth=2, input_size=64, dtype="float32",
            use_pallas=False)


def _forward(model, batch=2, seed=0):
    rng = jax.random.PRNGKey(seed)
    variables = model.init_variables(rng, batch_size=batch)
    size = model.image_specs.size
    images = jax.random.normal(jax.random.PRNGKey(1), (batch, size, size, 3))
    out = model.forward(variables, images, train=False)
    return variables, images, out


class TestFactoryAndShapes:
    @pytest.mark.parametrize("base,stacks", [("hg1", 1), ("hg2", 2)])
    def test_hourglass_stacks_and_shape(self, base, stacks):
        model = build_mpii_pose_model(base=base, **TINY)
        _, _, out = _forward(model)
        # input 64 -> heatmaps 16x16.
        assert out.heatmaps.shape == (stacks, 2, 16, 16, 16)
        assert model.heatmap_size == 16

    def test_resnet18_shape(self):
        model = build_mpii_pose_model(base="resnet18", input_size=64,
                                      dtype="float32", use_pallas=False)
        _, _, out = _forward(model)
        # stride 32: 64 -> 2x2 heatmaps.
        assert out.heatmaps.shape == (1, 2, 16, 2, 2)

    @pytest.mark.parametrize("dilate,truncate,expect", [(1, 0, 4), (0, 1, 4), (2, 0, 8)])
    def test_resnet_dilate_truncate_resolution(self, dilate, truncate, expect):
        model = build_mpii_pose_model(base="resnet18", dilate=dilate,
                                      truncate=truncate, input_size=64,
                                      dtype="float32", use_pallas=False)
        _, _, out = _forward(model)
        assert out.heatmaps.shape[-1] == expect
        assert model.heatmap_size == expect

    def test_unknown_base_raises(self):
        with pytest.raises(ValueError):
            build_mpii_pose_model(base="vgg16")

    def test_bad_strategy_raises(self):
        with pytest.raises(ValueError):
            build_mpii_pose_model(output_strat="nope")


class TestHeads:
    def _targets(self, batch=2, joints=16, seed=3):
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        coords = jax.random.uniform(k1, (batch, joints, 2), minval=-0.9, maxval=0.9)
        mask = (jax.random.uniform(k2, (batch, joints)) > 0.2).astype(jnp.float32)
        return coords, mask

    @pytest.mark.parametrize("strat", ["dsnt", "gauss", "fc"])
    def test_loss_scalar_and_coords(self, strat):
        model = build_mpii_pose_model(base="hg1", output_strat=strat, **TINY)
        _, _, out = _forward(model)
        coords_t, mask = self._targets()
        loss, aux = model.loss(out, coords_t, mask)
        assert loss.shape == ()
        assert np.isfinite(float(loss))
        assert aux["coords"].shape == (2, 16, 2)
        decoded = model.decode(out)
        assert decoded.shape == (2, 16, 2)
        assert np.all(np.abs(np.asarray(decoded)) <= 1.0)

    @pytest.mark.parametrize("reg", ["js", "kl", "var", "mse"])
    def test_dsnt_regularizers(self, reg):
        model = build_mpii_pose_model(base="hg1", reg=reg, reg_coeff=1.0, **TINY)
        _, _, out = _forward(model)
        coords_t, mask = self._targets()
        loss, aux = model.loss(out, coords_t, mask)
        assert np.isfinite(float(loss))
        assert float(aux["reg"]) >= 0.0

    def test_intermediate_supervision_sums_stacks(self):
        # With 2 stacks and identical per-stack losses, sum > single-stack loss.
        model = build_mpii_pose_model(base="hg2", **TINY)
        variables, images, out = _forward(model)
        coords_t, mask = self._targets()
        loss2, _ = model.loss(out, coords_t, mask)
        one = out.replace(heatmaps=out.heatmaps[-1:])
        loss1, _ = model.loss(one, coords_t, mask)
        assert float(loss2) > float(loss1)

    def test_loss_gradients_flow(self):
        model = build_mpii_pose_model(base="hg1", reg="js", **TINY)
        variables, images, out = _forward(model)
        coords_t, mask = self._targets()

        def loss_fn(params):
            out = model.module.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                images, train=False)
            loss, _ = model.loss(out, coords_t, mask)
            return loss

        grads = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
        # At least the score conv must receive gradient.
        total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
        assert total > 0.0

    def test_train_mode_updates_batch_stats(self):
        model = build_mpii_pose_model(base="hg1", **TINY)
        variables, images, _ = _forward(model)
        out, mutated = model.forward(variables, images, train=True,
                                     mutable=["batch_stats"])
        old = jax.tree_util.tree_leaves(variables["batch_stats"])
        new = jax.tree_util.tree_leaves(mutated["batch_stats"])
        changed = any(not np.allclose(a, b) for a, b in zip(old, new))
        assert changed


class TestCoordLossVariants:
    @pytest.mark.parametrize("cl", ["euclidean", "l1", "mse"])
    def test_coord_loss_variants(self, cl):
        model = build_mpii_pose_model(base="hg1", coord_loss=cl, **TINY)
        _, _, out = _forward(model)
        k1, k2 = jax.random.split(jax.random.PRNGKey(3))
        coords_t = jax.random.uniform(k1, (2, 16, 2), minval=-0.9, maxval=0.9)
        mask = jnp.ones((2, 16))
        loss, _ = model.loss(out, coords_t, mask)
        assert np.isfinite(float(loss))

    def test_bad_coord_loss_raises(self):
        with pytest.raises(ValueError):
            build_mpii_pose_model(coord_loss="huber")

    @pytest.mark.parametrize("preact", ["thresholded_softmax", "relu", "abs",
                                        "sigmoid"])
    def test_preact_variants_forward(self, preact):
        model = build_mpii_pose_model(base="hg1", preact=preact, **TINY)
        _, _, out = _forward(model)
        decoded = model.decode(out)
        assert np.all(np.isfinite(np.asarray(decoded)))


class TestViT:
    def test_vit_shapes(self):
        model = build_mpii_pose_model(base="vit_t16", input_size=64,
                                      dtype="float32", use_pallas=False)
        _, _, out = _forward(model)
        # patch 16 -> grid 4, stride-8 head -> 8x8 heatmaps.
        assert out.heatmaps.shape == (1, 2, 16, 8, 8)
        assert model.heatmap_size == 8

    def test_vit_dsnt_loss_and_grads(self):
        model = build_mpii_pose_model(base="vit_t16", input_size=64, reg="js",
                                      dtype="float32", use_pallas=False)
        variables, images, out = _forward(model)
        coords_t = jnp.zeros((2, 16, 2))
        mask = jnp.ones((2, 16))

        def loss_fn(params):
            o = model.module.apply({"params": params}, images, train=False)
            loss, _ = model.loss(o, coords_t, mask)
            return loss

        g = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)

    def test_vit_rejects_bad_input_size(self):
        model = build_mpii_pose_model(base="vit_t16", input_size=60,
                                      dtype="float32", use_pallas=False)
        with pytest.raises(ValueError):
            model.init_variables(jax.random.PRNGKey(0))

    def test_vit_default_input_is_2x(self):
        model = build_mpii_pose_model(base="vit_s16")
        assert model.image_specs.size == 448
