"""Native C++ loader tests: JPEG batch decode parity vs PIL, threaded gather."""

import numpy as np
import pytest
from PIL import Image

from nvit_tpu.data import native
from nvit_tpu.data.datasets import ImageFolderDataset


requires_native = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


def make_jpegs(tmp_path, n=4, w=97, h=65):
    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        # smooth image so JPEG loss stays small
        base = rng.rand(4, 4, 3) * 255
        img = np.asarray(
            Image.fromarray(base.astype(np.uint8)).resize((w, h), Image.BILINEAR)
        )
        p = tmp_path / f"img_{i}.jpg"
        Image.fromarray(img).save(p, quality=95)
        paths.append(p)
    return paths


@requires_native
def test_decode_batch_shapes_and_ok(tmp_path):
    paths = make_jpegs(tmp_path)
    out, ok = native.decode_jpeg_batch(paths, target=32)
    assert out.shape == (4, 3, 32, 32)
    assert out.dtype == np.uint8
    assert ok.all()


@requires_native
def test_decode_matches_pil_closely(tmp_path):
    paths = make_jpegs(tmp_path, n=2, w=120, h=80)
    out, ok = native.decode_jpeg_batch(paths, target=48)
    assert ok.all()
    ds = ImageFolderDataset(paths=paths, labels=np.zeros(2, np.int32), num_classes=1, image_size=48)
    for i in range(2):
        ref = ds.decode(i)
        diff = np.abs(out[i].astype(np.int32) - ref.astype(np.int32))
        # different resize kernels → allow small differences on smooth images
        assert np.mean(diff) < 12.0, f"mean abs diff {np.mean(diff)}"


@requires_native
def test_decode_bad_file_flagged(tmp_path):
    good = make_jpegs(tmp_path, n=1)
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"not a jpeg")
    out, ok = native.decode_jpeg_batch([good[0], bad], target=16)
    assert ok[0] and not ok[1]
    assert (out[1] == 0).all()


@requires_native
def test_gather_rows_matches_numpy():
    src = np.random.RandomState(1).randint(0, 256, (64, 3, 8, 8), dtype=np.uint8)
    idx = np.random.RandomState(2).permutation(64)[:32]
    np.testing.assert_array_equal(native.gather_rows(src, idx), src[idx])


def test_gather_rows_fallback_non_uint8():
    src = np.random.RandomState(1).rand(8, 4).astype(np.float32)
    idx = np.array([3, 1])
    np.testing.assert_array_equal(native.gather_rows(src, idx), src[idx])


@requires_native
def test_folder_dataset_uses_native(tmp_path):
    paths = make_jpegs(tmp_path, n=3)
    ds = ImageFolderDataset(paths=paths, labels=np.arange(3, dtype=np.int32), num_classes=3, image_size=32)
    batch = ds.decode_batch(np.array([2, 0]))
    assert batch.shape == (2, 3, 32, 32)
