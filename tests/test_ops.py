"""Unit tests for the jnp op library (reference test style: SURVEY.md section 4 —
hand-computable tiny heatmaps, delta/uniform distributions, loss identities,
gradient flow)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsnt_pose2d_tpu import ops


def delta_heatmap(h, w, iy, ix):
    hm = np.zeros((h, w), dtype=np.float32)
    hm[iy, ix] = 1.0
    return jnp.asarray(hm)


class TestCoords:
    def test_normalized_linspace_5(self):
        # L=5: centers at (2i+1)/5 - 1 = -0.8, -0.4, 0, 0.4, 0.8
        np.testing.assert_allclose(
            ops.normalized_linspace(5), [-0.8, -0.4, 0.0, 0.4, 0.8], atol=1e-7
        )

    def test_roundtrip(self):
        px = jnp.asarray([[0.0, 0.0], [3.0, 2.0], [1.5, 0.25]])
        norm = ops.pixel_to_normalized(px, (4, 6))
        back = ops.normalized_to_pixel(norm, (4, 6))
        np.testing.assert_allclose(back, px, atol=1e-6)

    def test_grid_orientation(self):
        x_grid, y_grid = ops.coordinate_grids(2, 3)
        # X varies along width (last axis), Y along height.
        np.testing.assert_allclose(x_grid[0], x_grid[1])
        np.testing.assert_allclose(y_grid[:, 0], y_grid[:, 1])
        assert x_grid.shape == (2, 3)


class TestActivations:
    def test_flat_softmax_sums_to_one(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 3, 4, 4)).astype(np.float32))
        z = ops.flat_softmax(x)
        np.testing.assert_allclose(jnp.sum(z, axis=(-2, -1)), np.ones((2, 3)), atol=1e-6)
        assert bool(jnp.all(z >= 0))

    def test_flat_softmax_is_2d_softmax(self, rng):
        x = jnp.asarray(rng.normal(size=(3, 5)).astype(np.float32))
        z = ops.flat_softmax(x)
        expect = jax.nn.softmax(x.reshape(-1)).reshape(3, 5)
        np.testing.assert_allclose(z, expect, atol=1e-6)

    def test_thresholded_softmax_masks(self):
        x = jnp.asarray([[0.0, 10.0], [-5.0, 10.0]], dtype=jnp.float32)
        z = ops.thresholded_softmax(x, threshold=0.0)
        # -5 is below threshold -> exactly zero probability.
        assert float(z[1, 0]) == 0.0
        np.testing.assert_allclose(float(jnp.sum(z)), 1.0, atol=1e-6)

    def test_thresholded_softmax_neginf_equals_softmax(self, rng):
        x = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))
        np.testing.assert_allclose(
            ops.thresholded_softmax(x, threshold=-np.inf), ops.flat_softmax(x), atol=1e-6
        )

    def test_thresholded_softmax_all_below_falls_back(self):
        x = jnp.full((3, 3), -1.0, dtype=jnp.float32)
        z = ops.thresholded_softmax(x, threshold=0.0)
        np.testing.assert_allclose(z, np.full((3, 3), 1.0 / 9.0), atol=1e-6)

    @pytest.mark.parametrize("name", ["relu", "abs", "sigmoid"])
    def test_other_activations_normalize(self, name, rng):
        x = jnp.asarray(rng.normal(size=(2, 4, 4)).astype(np.float32))
        z = ops.HEATMAP_ACTIVATIONS[name](x)
        np.testing.assert_allclose(jnp.sum(z, axis=(-2, -1)), np.ones(2), atol=1e-5)
        assert bool(jnp.all(z >= 0))


class TestDSNT:
    def test_delta_heatmap_gives_pixel_center(self):
        # 5x5, delta at (row 1, col 3) -> x = (2*3+1)/5-1 = 0.4, y = -0.4
        hm = delta_heatmap(5, 5, 1, 3)
        np.testing.assert_allclose(ops.dsnt(hm), [0.4, -0.4], atol=1e-6)

    def test_uniform_heatmap_gives_origin(self):
        hm = jnp.full((7, 9), 1.0 / 63.0, dtype=jnp.float32)
        np.testing.assert_allclose(ops.dsnt(hm), [0.0, 0.0], atol=1e-6)

    def test_rectangular_xy_order(self):
        # 2x4 map, delta at (row 0, col 0): x = 1/4-1 = -0.75, y = 1/2-1 = -0.5
        hm = delta_heatmap(2, 4, 0, 0)
        np.testing.assert_allclose(ops.dsnt(hm), [-0.75, -0.5], atol=1e-6)

    def test_batched_shapes(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 16, 8, 8)).astype(np.float32))
        coords = ops.dsnt(ops.flat_softmax(x))
        assert coords.shape == (2, 16, 2)

    def test_two_point_mixture(self):
        # Equal mass on two pixels -> mean of their centers.
        hm = np.zeros((4, 4), np.float32)
        hm[0, 0] = 0.5
        hm[3, 3] = 0.5
        np.testing.assert_allclose(ops.dsnt(jnp.asarray(hm)), [0.0, 0.0], atol=1e-6)

    def test_gradient_flows(self):
        def f(x):
            return jnp.sum(ops.dsnt(ops.flat_softmax(x)) ** 2)

        g = jax.grad(f)(jnp.ones((3, 3), jnp.float32))
        assert np.all(np.isfinite(np.asarray(g)))


class TestMakeGauss:
    def test_sums_to_one(self):
        g = ops.make_gauss(jnp.asarray([0.1, -0.2]), (8, 8), 1.0)
        np.testing.assert_allclose(float(jnp.sum(g)), 1.0, atol=1e-6)

    def test_peak_at_center(self):
        # Center exactly on pixel (row 2, col 5) of an 8x8 grid.
        c = ops.pixel_to_normalized(jnp.asarray([5.0, 2.0]), (8, 8))
        g = ops.make_gauss(c, (8, 8), 1.0)
        iy, ix = np.unravel_index(int(jnp.argmax(g)), (8, 8))
        assert (iy, ix) == (2, 5)

    def test_sigma_pixel_units(self):
        # With sigma = 1 px, mass one pixel away from center should relate by
        # exp(-0.5) to the peak, independent of grid size.
        for size in (8, 16):
            c = ops.pixel_to_normalized(
                jnp.asarray([size // 2.0, size // 2.0]), (size, size)
            )
            g = np.asarray(ops.make_gauss(c, (size, size), 1.0, normalize=False))
            peak = g[size // 2, size // 2]
            neighbor = g[size // 2, size // 2 + 1]
            np.testing.assert_allclose(neighbor / peak, np.exp(-0.5), atol=1e-5)

    def test_unnormalized_peak_is_one(self):
        c = ops.pixel_to_normalized(jnp.asarray([4.0, 4.0]), (9, 9))
        g = ops.make_gauss(c, (9, 9), 2.0, normalize=False)
        np.testing.assert_allclose(float(jnp.max(g)), 1.0, atol=1e-6)


class TestCoordinateLosses:
    def test_euclidean(self):
        a = jnp.asarray([[0.0, 0.0], [1.0, 1.0]])
        t = jnp.asarray([[3.0, 4.0], [1.0, 1.0]])
        np.testing.assert_allclose(ops.euclidean_losses(a, t), [5.0, 0.0], atol=1e-6)

    def test_l1_mse(self):
        a = jnp.asarray([[1.0, -1.0]])
        t = jnp.asarray([[0.0, 1.0]])
        np.testing.assert_allclose(ops.l1_losses(a, t), [3.0], atol=1e-6)
        np.testing.assert_allclose(ops.mse_losses(a, t), [5.0], atol=1e-6)


class TestRegularizers:
    def test_kl_js_zero_when_equal(self):
        c = jnp.asarray([0.25, -0.5])
        g = ops.make_gauss(c, (16, 16), 1.0)
        assert float(ops.kl_reg_losses(g, c, 1.0)) == pytest.approx(0.0, abs=1e-5)
        assert float(ops.js_reg_losses(g, c, 1.0)) == pytest.approx(0.0, abs=1e-5)
        assert float(ops.mse_reg_losses(g, c, 1.0)) == pytest.approx(0.0, abs=1e-8)

    def test_kl_positive_when_different(self, rng):
        hm = ops.flat_softmax(jnp.asarray(rng.normal(size=(16, 16)).astype(np.float32)))
        c = jnp.asarray([0.0, 0.0])
        assert float(ops.kl_reg_losses(hm, c, 1.0)) > 0.0
        assert float(ops.js_reg_losses(hm, c, 1.0)) > 0.0

    def test_js_symmetric_bounded(self, rng):
        # JS divergence is bounded by log(2).
        hm = ops.flat_softmax(jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32) * 10))
        assert 0.0 <= float(ops.js_reg_losses(hm, jnp.asarray([0.9, 0.9]), 0.5)) <= np.log(2) + 1e-5

    def test_variance_zero_for_matching_gauss(self):
        # A rendered Gaussian at the grid center with sigma_t has variance
        # ~ (2 sigma/L)^2 per axis (discretization error shrinks with L).
        c = jnp.asarray([0.0, 0.0])
        g = ops.make_gauss(c, (64, 64), 2.0)
        assert float(ops.variance_reg_losses(g, 2.0)) == pytest.approx(0.0, abs=1e-6)

    def test_reg_gradients_finite(self, rng):
        x = jnp.asarray(rng.normal(size=(4, 8, 8)).astype(np.float32))
        c = jnp.zeros((4, 2), jnp.float32)

        for fn in (ops.kl_reg_losses, ops.js_reg_losses, ops.mse_reg_losses):
            g = jax.grad(lambda x: jnp.sum(fn(ops.flat_softmax(x), c, 1.0)))(x)
            assert np.all(np.isfinite(np.asarray(g)))
        g = jax.grad(lambda x: jnp.sum(ops.variance_reg_losses(ops.flat_softmax(x), 1.0)))(x)
        assert np.all(np.isfinite(np.asarray(g)))


class TestAverageLoss:
    def test_masked_mean_excludes_invisible(self):
        losses = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
        mask = jnp.asarray([[1.0, 0.0], [1.0, 1.0]])
        # (1 + 3 + 4) / 3
        np.testing.assert_allclose(float(ops.average_loss(losses, mask)), 8.0 / 3.0, atol=1e-6)

    def test_no_mask_is_mean(self):
        losses = jnp.asarray([1.0, 2.0, 3.0])
        np.testing.assert_allclose(float(ops.average_loss(losses)), 2.0, atol=1e-6)

    def test_all_masked_is_zero(self):
        losses = jnp.asarray([5.0, 5.0])
        mask = jnp.zeros(2)
        assert float(ops.average_loss(losses, mask)) == 0.0


class TestDecode:
    def test_delta_decodes_to_pixel(self):
        hm = delta_heatmap(8, 8, 6, 2)
        coords = ops.heatmaps_to_coords(hm[None])[0]
        expect = ops.pixel_to_normalized(jnp.asarray([2.0, 6.0]), (8, 8))
        np.testing.assert_allclose(coords, expect, atol=1e-6)

    def test_quarter_offset_toward_higher_neighbor(self):
        hm = np.zeros((8, 8), np.float32)
        hm[4, 4] = 1.0
        hm[4, 5] = 0.5  # pull +x
        hm[3, 4] = 0.2  # pull -y
        coords = ops.heatmaps_to_coords(jnp.asarray(hm)[None])[0]
        expect = ops.pixel_to_normalized(jnp.asarray([4.25, 3.75]), (8, 8))
        np.testing.assert_allclose(coords, expect, atol=1e-6)

    def test_border_no_offset(self):
        hm = delta_heatmap(8, 8, 0, 7)
        coords = ops.heatmaps_to_coords(hm[None])[0]
        expect = ops.pixel_to_normalized(jnp.asarray([7.0, 0.0]), (8, 8))
        np.testing.assert_allclose(coords, expect, atol=1e-6)

    def test_decode_matches_dsnt_for_sharp_gauss(self):
        # A sharp rendered Gaussian: argmax decode and dsnt agree to < 1 px.
        c = ops.pixel_to_normalized(jnp.asarray([10.0, 20.0]), (64, 64))
        g = ops.make_gauss(c, (64, 64), 1.0)
        soft = ops.dsnt(g)
        hard = ops.heatmaps_to_coords(g[None])[0]
        assert float(jnp.max(jnp.abs(soft - hard))) < 2.0 / 64.0
