"""Native canvas-IO tests: libjpeg decode parity with PIL, crop/resize
equivalence with both a numpy reference and the on-device warp semantics, and
the MPIIDataset native path end-to-end on a fabricated mini-MPII."""

import io
import os

import numpy as np
import pytest

from dsnt_pose2d_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native canvasio not built")


@pytest.fixture
def jpeg_image(rng):
    from PIL import Image

    img = rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG", quality=95)
    data = buf.getvalue()
    decoded = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    return data, decoded


def test_decode_matches_pil(jpeg_image):
    data, pil = jpeg_image
    ours = native.decode_jpeg(data)
    np.testing.assert_array_equal(ours, pil)


def test_decode_rejects_garbage():
    with pytest.raises(ValueError):
        native.decode_jpeg(b"not a jpeg at all")


def _numpy_crop_resize(img, left, top, side, out_size):
    h, w, _ = img.shape
    scale = side / out_size
    oy, ox = np.mgrid[0:out_size, 0:out_size].astype(np.float32)
    sx = left + (ox + 0.5) * scale - 0.5
    sy = top + (oy + 0.5) * scale - 0.5
    x0 = np.floor(sx).astype(int)
    y0 = np.floor(sy).astype(int)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]

    def at(yi, xi):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        v = img[np.clip(yi, 0, h - 1), np.clip(xi, 0, w - 1)].astype(np.float32)
        return v * inb[..., None]

    out = (at(y0, x0) * (1 - fx) * (1 - fy) + at(y0, x0 + 1) * fx * (1 - fy)
           + at(y0 + 1, x0) * (1 - fx) * fy + at(y0 + 1, x0 + 1) * fx * fy)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def test_crop_resize_matches_numpy_reference(rng):
    img = rng.integers(0, 255, size=(40, 50, 3), dtype=np.uint8)
    for args in [(5.0, 3.0, 30.0, 16), (-10.0, -5.0, 60.0, 32),
                 (20.5, 10.25, 15.5, 8)]:
        ours = native.crop_resize(img, *args)
        ref = _numpy_crop_resize(img, *args)
        diff = np.abs(ours.astype(int) - ref.astype(int))
        assert diff.max() <= 1  # float rounding at exact .5 boundaries


def test_crop_resize_identity():
    img = (np.arange(16 * 16 * 3) % 256).astype(np.uint8).reshape(16, 16, 3)
    out = native.crop_resize(img, 0.0, 0.0, 16.0, 16)
    np.testing.assert_array_equal(out, img)


def test_out_of_bounds_zero_fill(rng):
    img = np.full((8, 8, 3), 200, np.uint8)
    out = native.crop_resize(img, -100.0, -100.0, 10.0, 4)
    assert out.max() == 0


def test_mpii_dataset_native_vs_pil(tmp_path, rng):
    """Fabricated mini-MPII: the native path and PIL path agree closely and the
    recorded affine maps joints consistently."""
    import h5py
    from PIL import Image

    from dsnt_pose2d_tpu.data.mpii import MPIIDataset
    from dsnt_pose2d_tpu.data.transforms import transform_coords

    os.makedirs(tmp_path / "images")
    os.makedirs(tmp_path / "annot")
    names = []
    for i in range(3):
        img = rng.integers(0, 255, size=(120, 160, 3), dtype=np.uint8)
        name = f"im{i}.jpg"
        Image.fromarray(img).save(tmp_path / "images" / name, quality=95)
        names.append(name.encode())
    n = len(names)
    with h5py.File(tmp_path / "annot" / "train.h5", "w") as f:
        f.create_dataset("imgname", data=np.asarray(names))
        f.create_dataset("center", data=np.tile([80.0, 60.0], (n, 1)))
        f.create_dataset("scale", data=np.full(n, 0.4))  # box 80px
        f.create_dataset("part", data=rng.uniform(40, 120, size=(n, 16, 2)))
        f.create_dataset("visible", data=np.ones((n, 16)))
        f.create_dataset("normalize", data=np.full(n, 25.0))

    ds_nat = MPIIDataset(str(tmp_path), "train", canvas_size=64, use_native=True)
    ds_pil = MPIIDataset(str(tmp_path), "train", canvas_size=64, use_native=False)
    a, b = ds_nat[0], ds_pil[0]
    assert a["canvases"].shape == (64, 64, 3)
    # Different resamplers (pure bilinear vs PIL's area-weighted filter);
    # on noise images pixel values differ, but both sample the same region:
    # require strong correlation.
    x = a["canvases"].astype(np.float64).ravel()
    y = b["canvases"].astype(np.float64).ravel()
    corr = np.corrcoef(x, y)[0, 1]
    assert corr > 0.75, corr
    # The recorded affine must map original joints onto the canvas coords.
    mapped = transform_coords(a["canvas_from_orig"],
                              ds_nat.annot.parts[0])
    np.testing.assert_allclose(np.asarray(mapped), a["coords_px"], atol=1e-3)
