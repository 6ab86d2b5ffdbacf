"""Data-prep tests: a synthetic official-release .mat round-trips through the
converter into the annot h5 layout that MPIIDataset/load_annotations reads."""

import numpy as np
import pytest

scipy = pytest.importorskip("scipy")
h5py = pytest.importorskip("h5py")

from dsnt_pose2d_tpu.data.mpii import load_annotations
from dsnt_pose2d_tpu.data.prepare import prepare


def _fake_release_mat(path, n_train=6, n_test=2):
    """Build a minimal RELEASE struct mimicking the official layout."""
    from scipy.io import savemat

    def obj(**kw):
        return kw

    annolist = []
    img_train = []
    rng = np.random.default_rng(0)
    for i in range(n_train + n_test):
        is_train = i < n_train
        img_train.append(1 if is_train else 0)
        points = []
        for j in range(16):
            points.append(obj(id=float(j), x=float(rng.uniform(10, 100)),
                              y=float(rng.uniform(10, 100)), is_visible="1"))
        rect = obj(scale=1.2 + 0.1 * i,
                   objpos=obj(x=60.0 + i, y=55.0),
                   x1=40.0, y1=20.0, x2=70.0, y2=50.0,
                   annopoints=obj(point=np.asarray(points, dtype=object)))
        annolist.append(obj(image=obj(name=f"img_{i:04d}.jpg"),
                            annorect=np.asarray([rect], dtype=object)))
    release = obj(annolist=np.asarray(annolist, dtype=object),
                  img_train=np.asarray(img_train))
    savemat(path, {"RELEASE": release})


def test_prepare_roundtrip(tmp_path):
    mat = tmp_path / "release.mat"
    _fake_release_mat(str(mat))
    out = tmp_path / "annot"
    prepare(str(mat), str(out), val_frac=0.4)

    train = load_annotations(str(tmp_path), "train")
    # h5 files land under out/; load via direct candidate path
    train = load_annotations(str(out.parent), "train") if False else train

    import os

    assert os.path.exists(out / "train.h5")
    assert os.path.exists(out / "test.h5")

    with h5py.File(out / "train.h5", "r") as f:
        assert f["part"].shape[1:] == (16, 2)
        assert f["center"].shape[1] == 2
        n = f["part"].shape[0]
        assert f["visible"].shape == (n, 16)
        # PCKh normalizer = 0.6 * diag of the 30x30 head box.
        np.testing.assert_allclose(
            f["normalize"][:], 0.6 * np.hypot(30, 30), rtol=1e-5)
        assert (f["visible"][:] == 1).all()

    # The layout loads through the dataset reader.
    ann = load_annotations(str(out), "train")
    assert len(ann) > 0
    assert ann.parts.shape[1:] == (16, 2)


def test_prepare_stamps_split_provenance(tmp_path):
    mat = tmp_path / "release.mat"
    _fake_release_mat(str(mat), n_train=10, n_test=0)

    out = tmp_path / "hash"
    prepare(str(mat), str(out), val_frac=0.4)
    with h5py.File(out / "val.h5") as f:
        assert f.attrs["split_method"] == "hash-holdout:0.4"
        assert f.attrs["source_mat"] == "release.mat"
    assert load_annotations(str(out), "val").split_method == "hash-holdout:0.4"

    # A --val-list split is stamped as Tompson-comparable.
    vl = tmp_path / "valid.txt"
    vl.write_text("img_0001.jpg 0\nimg_0003.jpg 0\n")
    out2 = tmp_path / "listed"
    prepare(str(mat), str(out2), val_list=str(vl))
    ann = load_annotations(str(out2), "val")
    assert ann.split_method == "val-list:valid.txt"
    assert len(ann) == 2


def test_prepare_val_split_deterministic(tmp_path):
    mat = tmp_path / "release.mat"
    _fake_release_mat(str(mat), n_train=10, n_test=0)
    out1 = tmp_path / "a"
    out2 = tmp_path / "b"
    prepare(str(mat), str(out1), val_frac=0.4)
    prepare(str(mat), str(out2), val_frac=0.4)
    with h5py.File(out1 / "val.h5") as f1, h5py.File(out2 / "val.h5") as f2:
        assert list(f1["imgname"][:]) == list(f2["imgname"][:])
