"""Data pipeline tests: affine frames, on-device augmentation graph, loader
sharding/determinism, synthetic fixture schema."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsnt_pose2d_tpu.data import (
    ArrayDataset,
    ShardedLoader,
    crop_transform,
    flip_permutation,
    make_synthetic_mpii,
    preprocess_batch,
    transform_coords,
)
from dsnt_pose2d_tpu.data.augment import affine_warp_bilinear
from dsnt_pose2d_tpu.utils.config import DataConfig

CFG = DataConfig(mean=(0.0, 0.0, 0.0), std=(1.0, 1.0, 1.0))


class TestTransforms:
    def test_crop_center_maps_to_crop_center(self):
        m = crop_transform(jnp.asarray([100.0, 80.0]), 1.0, 64)
        out = transform_coords(m, jnp.asarray([[100.0, 80.0]]))
        np.testing.assert_allclose(out[0], [31.5, 31.5], atol=1e-4)

    def test_box_corner_maps_to_crop_corner(self):
        # Box side = scale*200 = 200px centered at (100, 80): left edge of the
        # box (x = 0) lands at crop x = -0.18... Actually the box [0, 200)
        # maps linearly onto [?, ?): check scale factor 64/200.
        m = crop_transform(jnp.asarray([100.0, 80.0]), 1.0, 64)
        p = transform_coords(m, jnp.asarray([[100.0 + 100.0, 80.0]]))
        np.testing.assert_allclose(p[0, 0] - 31.5, 100.0 * 64 / 200.0, atol=1e-4)

    def test_rotation_about_center(self):
        m = crop_transform(jnp.asarray([50.0, 50.0]), 0.5, 64,
                           rot_rad=jnp.pi / 2)
        # Point right of center maps to below center (90 deg CCW in xy).
        p = transform_coords(m, jnp.asarray([[60.0, 50.0]]))
        center = jnp.asarray([31.5, 31.5])
        d = p[0] - center
        assert abs(float(d[0])) < 1e-3
        assert float(d[1]) > 1.0

    def test_flip_mirrors_x(self):
        m = crop_transform(jnp.asarray([50.0, 50.0]), 0.5, 64, flip=True)
        m0 = crop_transform(jnp.asarray([50.0, 50.0]), 0.5, 64, flip=False)
        p = transform_coords(m, jnp.asarray([[60.0, 55.0]]))
        p0 = transform_coords(m0, jnp.asarray([[60.0, 55.0]]))
        np.testing.assert_allclose(p[0, 0], 63.0 - p0[0, 0], atol=1e-4)
        np.testing.assert_allclose(p[0, 1], p0[0, 1], atol=1e-4)

    def test_inverse_roundtrip(self):
        m = crop_transform(jnp.asarray([77.0, 33.0]), 1.3, 64,
                           rot_rad=0.3, scale_aug=1.1)
        pts = jnp.asarray([[10.0, 20.0], [50.0, 60.0]])
        back = transform_coords(jnp.linalg.inv(m), transform_coords(m, pts))
        np.testing.assert_allclose(back, pts, atol=1e-3)

    def test_flip_permutation_involution(self):
        perm = np.asarray(flip_permutation(16))
        np.testing.assert_array_equal(perm[perm], np.arange(16))
        assert perm[0] == 5 and perm[12] == 13


class TestWarp:
    def test_identity_warp_preserves_image(self, rng):
        img = jnp.asarray(rng.uniform(size=(16, 16, 3)).astype(np.float32))
        out = affine_warp_bilinear(img, jnp.eye(3), 16)
        np.testing.assert_allclose(out, img, atol=1e-5)

    def test_translation_shifts(self, rng):
        img = jnp.asarray(rng.uniform(size=(16, 16, 3)).astype(np.float32))
        # Output px -> input px: shift +2 in x reads input x+2.
        m = jnp.asarray([[1.0, 0, 2.0], [0, 1, 0], [0, 0, 1]])
        out = affine_warp_bilinear(img, m, 16)
        np.testing.assert_allclose(out[:, :14], img[:, 2:], atol=1e-5)

    def test_out_of_bounds_is_zero(self):
        img = jnp.ones((8, 8, 3), jnp.float32)
        m = jnp.asarray([[1.0, 0, 100.0], [0, 1, 0], [0, 0, 1]])
        out = affine_warp_bilinear(img, m, 8)
        np.testing.assert_allclose(out, 0.0, atol=1e-6)

    def test_top_left_edge_blend(self, rng):
        # Regression: source base corner at -1 with its +1 neighbor in-bounds
        # (the first out-of-image row/column blends in as zero). The batched
        # two-gather warp once fetched neighbor row/col 1 instead of 0 here.
        img = jnp.asarray(rng.uniform(size=(8, 8, 3)).astype(np.float32))
        m = jnp.asarray([[1.0, 0, -0.7], [0, 1.0, -0.7], [0, 0, 1]])
        out = np.asarray(affine_warp_bilinear(img, m, 8))

        def ref_px(x, y):
            import math
            x0, y0 = math.floor(x), math.floor(y)
            fx, fy = x - x0, y - y0
            def at(xi, yi):
                if 0 <= xi < 8 and 0 <= yi < 8:
                    return np.asarray(img)[yi, xi]
                return np.zeros(3, np.float32)
            return ((1 - fy) * ((1 - fx) * at(x0, y0) + fx * at(x0 + 1, y0))
                    + fy * ((1 - fx) * at(x0, y0 + 1) + fx * at(x0 + 1, y0 + 1)))

        for oy in (0, 1, 7):
            for ox in (0, 1, 7):
                np.testing.assert_allclose(
                    out[oy, ox], ref_px(ox - 0.7, oy - 0.7), atol=1e-5,
                    err_msg=f"pixel ({ox},{oy})")


class TestShearWarp:
    """affine_warp_shear vs the direct-gather reference.

    Rotation-free affines (identity, translate, scale, flip) must match the
    direct warp EXACTLY (separable bilinear == 2-D bilinear there); rotations
    use three chained 1-D interpolations and only need to be close.
    """

    def _direct(self, imgs, ms, size):
        from dsnt_pose2d_tpu.data.augment import affine_warp_bilinear

        return jax.vmap(affine_warp_bilinear, in_axes=(0, 0, None))(
            imgs, ms, size)

    def _batch(self, rng, n=2, c=24):
        return jnp.asarray(rng.uniform(size=(n, c, c, 3)).astype(np.float32))

    @pytest.mark.parametrize("m", [
        np.eye(3, dtype=np.float32),
        np.asarray([[1, 0, 2.3], [0, 1, -1.7], [0, 0, 1]], np.float32),
        np.asarray([[1.4, 0, 1.0], [0, 0.8, 2.0], [0, 0, 1]], np.float32),
        np.asarray([[-1.0, 0, 23.0], [0, 1, 0], [0, 0, 1]], np.float32),
    ])
    def test_rotation_free_matches_direct_exactly(self, rng, m):
        from dsnt_pose2d_tpu.data.augment import affine_warp_shear

        imgs = self._batch(rng)
        ms = jnp.broadcast_to(jnp.asarray(m), (2, 3, 3))
        ours = affine_warp_shear(imgs, ms, 24, max_abs_shear=0.0)
        ref = self._direct(imgs, ms, 24)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_rotation_statistically_close(self, rng):
        import math

        from dsnt_pose2d_tpu.data.augment import affine_warp_shear

        imgs = self._batch(rng, n=2, c=32)
        # Smooth the noise so interpolation-filter differences stay small.
        k = jnp.ones((3, 3, 1, 1)) / 9.0
        imgs = jax.lax.conv_general_dilated(
            imgs.transpose(0, 3, 1, 2).reshape(6, 1, 32, 32), k,
            (1, 1), "SAME", dimension_numbers=("NCHW", "HWIO", "NCHW")
        ).reshape(2, 3, 32, 32).transpose(0, 2, 3, 1)
        th = math.radians(20.0)
        cos, sin = math.cos(th), math.sin(th)
        cx = (32 - 1) / 2.0
        rot = np.asarray([[cos, -sin, cx - cos * cx + sin * cx],
                          [sin, cos, cx - sin * cx - cos * cx],
                          [0, 0, 1]], np.float32)
        ms = jnp.broadcast_to(jnp.asarray(rot), (2, 3, 3))
        ours = affine_warp_shear(imgs, ms, 32, max_abs_shear=math.tan(th) * 1.01)
        ref = self._direct(imgs, ms, 32)
        # Interior pixels (borders differ by extent clipping).  The chained
        # 1-D interpolations low-pass slightly differently from direct 2-D
        # bilinear, so ~1% mean difference on (smoothed) noise is the
        # expected filter gap, not an error.
        d = np.abs(np.asarray(ours - ref))[:, 4:-4, 4:-4]
        assert d.mean() < 0.02 and d.max() < 0.2

    def test_preprocess_eval_path_warp_methods_agree(self):
        from dataclasses import replace

        from dsnt_pose2d_tpu.data.augment import preprocess_batch
        from dsnt_pose2d_tpu.data.synthetic import make_synthetic_mpii
        from dsnt_pose2d_tpu.utils.config import DataConfig

        data = {k: jnp.asarray(v)
                for k, v in make_synthetic_mpii(3, canvas_size=48, seed=2).items()}
        key = jax.random.PRNGKey(0)
        outs = {}
        for method in ("gather", "shear"):
            cfg = DataConfig(warp_method=method)
            outs[method] = preprocess_batch(
                key, data["canvases"], data["coords_px"], data["mask"],
                data["head_length"], data["canvas_from_orig"], cfg, 32,
                False, canvas_margin=data["canvas_margin"])
        np.testing.assert_allclose(outs["shear"]["images"],
                                   outs["gather"]["images"], atol=1e-4)
        np.testing.assert_allclose(outs["shear"]["coords"],
                                   outs["gather"]["coords"], atol=1e-6)


class TestPreprocess:
    def _data(self, n=4, c=48):
        d = make_synthetic_mpii(n, canvas_size=c, seed=1)
        return {k: jnp.asarray(v) for k, v in d.items()}

    def test_eval_path_deterministic_and_shapes(self):
        d = self._data()
        key = jax.random.PRNGKey(0)
        out1 = preprocess_batch(key, d["canvases"], d["coords_px"], d["mask"],
                                d["head_length"], d["canvas_from_orig"], CFG,
                                32, False)
        out2 = preprocess_batch(jax.random.PRNGKey(9), d["canvases"],
                                d["coords_px"], d["mask"], d["head_length"],
                                d["canvas_from_orig"], CFG, 32, False)
        assert out1["images"].shape == (4, 32, 32, 3)
        assert out1["coords"].shape == (4, 16, 2)
        np.testing.assert_allclose(out1["images"], out2["images"], atol=1e-6)
        np.testing.assert_allclose(out1["coords"], out2["coords"], atol=1e-6)

    def test_eval_coords_roundtrip_to_original(self):
        # crop_from_orig must map original joint px to the crop px that
        # corresponds to the returned normalized coords.
        d = self._data()
        out = preprocess_batch(jax.random.PRNGKey(0), d["canvases"],
                               d["coords_px"], d["mask"], d["head_length"],
                               d["canvas_from_orig"], CFG, 32, False)
        # canvas IS original here (identity canvas_from_orig).
        crop_px = transform_coords(out["crop_from_orig"], d["coords_px"])
        expect_norm = (2.0 * crop_px + 1.0) / 32 - 1.0
        np.testing.assert_allclose(out["coords"], expect_norm, atol=1e-4)

    def test_train_path_augments(self):
        d = self._data()
        cfg = DataConfig(mean=(0, 0, 0), std=(1, 1, 1), flip_prob=0.5)
        o1 = preprocess_batch(jax.random.PRNGKey(0), d["canvases"],
                              d["coords_px"], d["mask"], d["head_length"],
                              d["canvas_from_orig"], cfg, 32, True)
        o2 = preprocess_batch(jax.random.PRNGKey(1), d["canvases"],
                              d["coords_px"], d["mask"], d["head_length"],
                              d["canvas_from_orig"], cfg, 32, True)
        assert not np.allclose(o1["images"], o2["images"])
        assert not np.allclose(o1["coords"], o2["coords"])
        # Augmented coords stay finite and mostly in range.
        assert np.all(np.isfinite(np.asarray(o1["coords"])))

    def test_normalization_applied(self):
        d = self._data()
        cfg = DataConfig(mean=(0.5, 0.5, 0.5), std=(0.25, 0.25, 0.25))
        out = preprocess_batch(jax.random.PRNGKey(0), d["canvases"],
                               d["coords_px"], d["mask"], d["head_length"],
                               d["canvas_from_orig"], cfg, 32, False)
        raw = preprocess_batch(jax.random.PRNGKey(0), d["canvases"],
                               d["coords_px"], d["mask"], d["head_length"],
                               d["canvas_from_orig"], CFG, 32, False)
        np.testing.assert_allclose(
            out["images"], (raw["images"] - 0.5) / 0.25, atol=1e-5)


class TestLoader:
    def _ds(self, n=20):
        return ArrayDataset(make_synthetic_mpii(n, canvas_size=16, seed=2))

    def test_batches_and_shapes(self):
        loader = ShardedLoader(self._ds(), 4, shuffle=True, seed=3)
        batches = list(loader.epoch(0))
        assert len(batches) == 5
        assert batches[0]["canvases"].shape == (4, 16, 16, 3)

    def test_determinism_same_epoch(self):
        loader = ShardedLoader(self._ds(), 4, shuffle=True, seed=3)
        b1 = list(loader.epoch(0))
        b2 = list(loader.epoch(0))
        np.testing.assert_allclose(b1[2]["coords_px"], b2[2]["coords_px"])

    def test_different_epochs_differ(self):
        loader = ShardedLoader(self._ds(), 4, shuffle=True, seed=3)
        b1 = list(loader.epoch(0))
        b2 = list(loader.epoch(1))
        assert not np.allclose(b1[0]["coords_px"], b2[0]["coords_px"])

    def test_resume_start_step(self):
        loader = ShardedLoader(self._ds(), 4, shuffle=True, seed=3)
        full = list(loader.epoch(0))
        tail = list(loader.epoch(0, start_step=3))
        assert len(tail) == 2
        np.testing.assert_allclose(full[3]["coords_px"], tail[0]["coords_px"])

    def test_host_sharding_partitions(self):
        ds = self._ds(20)
        l0 = ShardedLoader(ds, 4, shuffle=False, num_hosts=2, host_id=0)
        l1 = ShardedLoader(ds, 4, shuffle=False, num_hosts=2, host_id=1)
        assert l0.local_batch_size == 2
        b0 = list(l0.epoch(0))
        b1 = list(l1.epoch(0))
        # Hosts see disjoint sample sets covering the dataset.
        all0 = np.concatenate([b["head_length"] for b in b0])
        assert len(all0) == 10 and len(b0) == 5
        c0 = np.concatenate([b["coords_px"] for b in b0])
        c1 = np.concatenate([b["coords_px"] for b in b1])
        assert not np.allclose(c0, c1)

    def test_no_drop_covers_all_samples_uneven_hosts(self):
        # n=10 over 4 hosts: without drop_last the index stream pads UP
        # (repeating the final index) instead of truncating, so every
        # sample is enumerated exactly once as valid; pad rows get mask 0.
        ds = self._ds(10)
        loaders = [ShardedLoader(ds, 4, shuffle=False, num_hosts=4, host_id=h,
                                 drop_last=False) for h in range(4)]
        assert all(l.steps_per_epoch == 3 for l in loaders)
        seen = []
        for l in loaders:
            idx, valid = l._epoch_indices(0)
            assert len(idx) == 3 and len(valid) == 3
            seen.extend(idx[valid])
        assert sorted(seen) == list(range(10))
        # Pad rows (invalid) have their mask zeroed in the emitted batches.
        batches = list(loaders[3].epoch(0))  # host 3 holds pads (pos 11 >= 10)
        idx3, valid3 = loaders[3]._epoch_indices(0)
        flat_mask = np.concatenate([b["mask"] for b in batches])
        for i, v in enumerate(valid3):
            if not v:
                assert np.all(flat_mask[i] == 0.0)

    def test_global_index_batches_single_host(self):
        ds = self._ds(10)
        loader = ShardedLoader(ds, 4, shuffle=False, drop_last=False)
        gidx = loader.global_index_batches(0)
        assert [g.tolist() for g in gidx] == [
            [0, 1, 2, 3], [4, 5, 6, 7], [8, 9, -1, -1]]

    def test_global_index_batches_matches_host_batches(self):
        # The global index map must agree with the actual samples each host
        # emits, under the row layout global = concat(host locals).
        ds = self._ds(10)
        loaders = [ShardedLoader(ds, 4, shuffle=False, num_hosts=2, host_id=h,
                                 drop_last=False) for h in range(2)]
        gidx = loaders[0].global_index_batches(0)
        per_host = [list(l.epoch(0)) for l in loaders]
        assert len(gidx) == len(per_host[0]) == len(per_host[1])
        for s, gi in enumerate(gidx):
            rows = np.concatenate([per_host[0][s]["coords_px"],
                                   per_host[1][s]["coords_px"]])
            masks = np.concatenate([per_host[0][s]["mask"],
                                    per_host[1][s]["mask"]])
            for r, di in enumerate(gi):
                if di >= 0:
                    np.testing.assert_allclose(rows[r], ds[int(di)]["coords_px"])
                else:
                    assert np.all(masks[r] == 0.0)
        covered = sorted(int(i) for g in gidx for i in g if i >= 0)
        assert covered == list(range(10))

    def test_synthetic_schema(self):
        d = make_synthetic_mpii(3, canvas_size=24)
        assert d["canvases"].shape == (3, 24, 24, 3)
        assert d["coords_px"].shape == (3, 16, 2)
        assert d["mask"].shape == (3, 16)
        assert d["canvas_from_orig"].shape == (3, 3, 3)
        assert d["canvases"].min() >= 0 and d["canvases"].max() <= 1


class TestCanvasMargin:
    def test_person_box_fills_crop(self):
        # With canvas_margin m, the central (canvas/m) person box must map to
        # the full crop at scale_aug=1: a joint at the box's right edge lands
        # at normalized x = +1 exactly.
        c, out, m = 96, 32, 1.5
        d = make_synthetic_mpii(2, canvas_size=c, seed=0)
        center = (c - 1) / 2.0
        half_box = c / (2 * m)
        d["coords_px"] = np.tile(
            np.asarray([[center + half_box, center]], np.float32), (2, 16, 1)
        ).reshape(2, 16, 2)
        d["canvas_margin"] = np.full((2,), m, np.float32)
        out_d = preprocess_batch(
            jax.random.PRNGKey(0), jnp.asarray(d["canvases"]),
            jnp.asarray(d["coords_px"]), jnp.asarray(d["mask"]),
            jnp.asarray(d["head_length"]), jnp.asarray(d["canvas_from_orig"]),
            CFG, out, False, canvas_margin=jnp.asarray(d["canvas_margin"]))
        np.testing.assert_allclose(out_d["coords"][:, :, 0], 1.0, atol=1e-5)
        np.testing.assert_allclose(out_d["coords"][:, :, 1], 0.0, atol=1e-5)

    def test_margin_one_is_full_canvas(self):
        # margin=1 (synthetic default): canvas edge maps to crop edge.
        c, out = 48, 32
        d = make_synthetic_mpii(1, canvas_size=c, seed=0)
        d["coords_px"] = np.tile(
            np.asarray([[c - 0.5, (c - 1) / 2.0]], np.float32), (1, 16, 1)
        ).reshape(1, 16, 2)
        out_d = preprocess_batch(
            jax.random.PRNGKey(0), jnp.asarray(d["canvases"]),
            jnp.asarray(d["coords_px"]), jnp.asarray(d["mask"]),
            jnp.asarray(d["head_length"]), jnp.asarray(d["canvas_from_orig"]),
            CFG, out, False, canvas_margin=jnp.asarray(d["canvas_margin"]))
        np.testing.assert_allclose(out_d["coords"][:, :, 0], 1.0, atol=1e-5)


def test_rotation_prob_zero_means_no_rotation():
    import dataclasses

    d = {k: jnp.asarray(v) for k, v in make_synthetic_mpii(4, canvas_size=48, seed=1).items()}
    cfg0 = dataclasses.replace(CFG, rotation_prob=0.0, flip_prob=0.0,
                               scale_range=(1.0, 1.0), color_jitter=0.0)
    train_out = preprocess_batch(jax.random.PRNGKey(0), d["canvases"],
                                 d["coords_px"], d["mask"], d["head_length"],
                                 d["canvas_from_orig"], cfg0, 32, True,
                                 canvas_margin=d["canvas_margin"])
    eval_out = preprocess_batch(jax.random.PRNGKey(0), d["canvases"],
                                d["coords_px"], d["mask"], d["head_length"],
                                d["canvas_from_orig"], cfg0, 32, False,
                                canvas_margin=d["canvas_margin"])
    # All augmentation disabled => train path equals the deterministic path.
    np.testing.assert_allclose(train_out["coords"], eval_out["coords"], atol=1e-6)
    np.testing.assert_allclose(train_out["images"], eval_out["images"], atol=1e-6)


def test_loader_propagates_producer_errors():
    class Broken:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            raise FileNotFoundError(f"missing sample {i}")

    loader = ShardedLoader(Broken(), 4, shuffle=False)
    with pytest.raises(FileNotFoundError, match="missing sample"):
        list(loader.epoch(0))


def test_affine_invert_matches_linalg(rng):
    from dsnt_pose2d_tpu.data.transforms import crop_transform, invert

    center = jnp.asarray(rng.uniform(20, 80, size=(4, 2)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.3, 0.8, size=(4,)).astype(np.float32))
    m = crop_transform(center, scale, 64,
                       rot_rad=jnp.asarray([0.1, -0.4, 0.0, 0.7]),
                       scale_aug=jnp.asarray([1.0, 0.8, 1.2, 1.0]),
                       flip=jnp.asarray([False, True, False, True]))
    inv = np.asarray(invert(m))
    np.testing.assert_allclose(inv, np.linalg.inv(np.asarray(m)),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.einsum("bij,bjk->bik", inv, np.asarray(m)),
                               np.broadcast_to(np.eye(3), (4, 3, 3)),
                               atol=1e-4)


def test_shear_warp_extreme_rotation_falls_back(rng):
    from dsnt_pose2d_tpu.data.augment import preprocess_batch
    from dsnt_pose2d_tpu.data.synthetic import make_synthetic_mpii

    data = {k: jnp.asarray(v)
            for k, v in make_synthetic_mpii(2, canvas_size=48, seed=4).items()}
    cfg = DataConfig(warp_method="shear", max_rotation_deg=85.0)
    with pytest.warns(UserWarning, match="falling back"):
        out = preprocess_batch(
            jax.random.PRNGKey(0), data["canvases"], data["coords_px"],
            data["mask"], data["head_length"], data["canvas_from_orig"],
            cfg, 32, True, canvas_margin=data["canvas_margin"])
    assert np.isfinite(np.asarray(out["images"])).all()
