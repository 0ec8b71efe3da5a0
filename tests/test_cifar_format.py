"""CIFAR pickle-format loader tests against synthetic files in the standard
on-disk layout (cifar-10-batches-py / cifar-100-python)."""

import pickle

import numpy as np
import pytest

from nvit_tpu.data.datasets import load_cifar, load_dataset


def write_cifar10(root, n_per_batch=20):
    base = root / "cifar-10-batches-py"
    base.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(1, 6):
        batch = {
            b"data": rng.randint(0, 256, (n_per_batch, 3072), dtype=np.uint8),
            b"labels": rng.randint(0, 10, n_per_batch).tolist(),
        }
        (base / f"data_batch_{i}").write_bytes(pickle.dumps(batch))
    test = {
        b"data": rng.randint(0, 256, (n_per_batch, 3072), dtype=np.uint8),
        b"labels": rng.randint(0, 10, n_per_batch).tolist(),
    }
    (base / "test_batch").write_bytes(pickle.dumps(test))
    return base


def write_cifar100(root, n=30):
    base = root / "cifar-100-python"
    base.mkdir(parents=True)
    rng = np.random.RandomState(1)
    for split in ("train", "test"):
        d = {
            b"data": rng.randint(0, 256, (n, 3072), dtype=np.uint8),
            b"fine_labels": rng.randint(0, 100, n).tolist(),
        }
        (base / split).write_bytes(pickle.dumps(d))
    return base


def test_cifar10_train_concatenates_batches(tmp_path):
    write_cifar10(tmp_path)
    ds = load_cifar(tmp_path, variant="cifar10", train=True)
    assert ds.images.shape == (100, 3, 32, 32)
    assert ds.images.dtype == np.uint8
    assert ds.labels.dtype == np.int32
    assert ds.num_classes == 10


def test_cifar10_test_split(tmp_path):
    write_cifar10(tmp_path)
    ds = load_cifar(tmp_path, variant="cifar10", train=False)
    assert ds.images.shape == (20, 3, 32, 32)


def test_cifar100_fine_labels(tmp_path):
    write_cifar100(tmp_path)
    ds = load_cifar(tmp_path, variant="cifar100", train=True)
    assert ds.images.shape == (30, 3, 32, 32)
    assert ds.num_classes == 100
    assert ds.labels.max() < 100


def test_cifar_pixel_layout_roundtrip(tmp_path):
    """The 3072-byte rows are R-plane, G-plane, B-plane of a 32x32 image."""
    base = tmp_path / "cifar-10-batches-py"
    base.mkdir(parents=True)
    img = np.zeros((3, 32, 32), dtype=np.uint8)
    img[0, 0, 0] = 255  # red channel, top-left
    img[2, 31, 31] = 128  # blue channel, bottom-right
    row = img.reshape(-1)
    for i in range(1, 6):
        (base / f"data_batch_{i}").write_bytes(
            pickle.dumps({b"data": row[None, :], b"labels": [3]})
        )
    ds = load_cifar(tmp_path, variant="cifar10", train=True)
    np.testing.assert_array_equal(ds.images[0], img)
    assert ds.labels[0] == 3


def test_load_dataset_dispatch_cifar(tmp_path):
    write_cifar100(tmp_path)
    ds = load_dataset("cifar100", tmp_path, train=False)
    assert ds.name == "cifar100"


def test_missing_raises_helpfully(tmp_path):
    with pytest.raises(FileNotFoundError, match="data.download=true"):
        load_cifar(tmp_path, variant="cifar10")
