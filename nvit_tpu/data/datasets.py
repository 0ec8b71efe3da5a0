"""Dataset readers: CIFAR-10/100, ImageNet (folder layout), synthetic.

≙ reference train.py:256-358 (torchvision datasets + transforms).  The
torchvision dependency is replaced by direct readers:

* CIFAR-10/100: the standard python-pickle batch format
  (``cifar-10-batches-py`` / ``cifar-100-python``) read straight into one
  uint8 [N, 3, 32, 32] array — the whole dataset fits in host RAM, so the
  "loader" is an index-shuffled view with zero per-item Python cost.
* ImageNet: ``<root>/<split>/<wnid>/*.JPEG`` folder layout; decode happens
  host-side in worker threads (PIL), resize/crop to ``image_size``.
* synthetic: deterministic random tensors — for benchmarks, tests and
  zero-egress environments (this container cannot download datasets; the
  reference's ``download=master_process`` contract is replaced by a clear
  error naming the expected on-disk layout).

All images are returned CHW uint8 [0,255]; normalization/augmentation run on
device (see data/augment.py) — host work is just IO + decode.
"""

from __future__ import annotations

import hashlib
import os
import pickle
import shutil
import tarfile
import time
import urllib.request
from dataclasses import dataclass
from pathlib import Path

import numpy as np


@dataclass
class ArrayDataset:
    """In-memory dataset: images uint8 [N, C, H, W], labels int32 [N]."""

    images: np.ndarray
    labels: np.ndarray
    num_classes: int
    name: str = "array"

    def __len__(self) -> int:
        return len(self.images)


def _cifar_unpickle(path: Path) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f, encoding="bytes")


def _maybe_extract(root: Path, archive_name: str, member_dir: str, variant: str) -> None:
    """Extract the archive ATOMICALLY: unpack to a temp sibling, then rename.

    tarfile.extractall writes in place over several seconds; on a shared
    filesystem a non-master host polling ``cifar_ready`` could otherwise see
    a half-written batch file and unpickle garbage.  The rename also makes a
    crash mid-extract self-healing: completeness (not bare dir existence)
    gates the no-op, an incomplete in-place dir is moved aside and replaced,
    and stale temp dirs from a crashed process are swept on the next call.
    """
    archive = root / archive_name
    target = root / member_dir
    for stale in root.glob(member_dir + ".extract-*"):
        shutil.rmtree(stale, ignore_errors=True)
    if not archive.exists() or cifar_ready(root, variant):
        return
    tmp = root / f"{member_dir}.extract-{os.getpid()}"
    with tarfile.open(archive, "r:gz") as tf:
        try:
            tf.extractall(tmp, filter="data")  # refuse links/devices/abs paths
        except TypeError:  # pragma: no cover — pre-3.12 tarfile
            tf.extractall(tmp)
    if target.exists():  # incomplete dir from an interrupted legacy extract
        broken = root / f"{member_dir}.extract-{os.getpid()}-old"
        target.rename(broken)
        shutil.rmtree(broken, ignore_errors=True)
    (tmp / member_dir).rename(target)  # atomic: readers see all-or-nothing
    shutil.rmtree(tmp, ignore_errors=True)


# Canonical CIFAR sources (≙ torchvision's pinned URLs, reference
# train.py:283-301 download=master_process).  sha256 over the .tar.gz.
# NVIT_CIFAR{10,100}_SHA256 env overrides exist in case the upstream
# archive is ever re-rolled.
_CIFAR_SOURCES = {
    "cifar10": (
        "https://www.cs.toronto.edu/~kriz/cifar-10-python.tar.gz",
        "cifar-10-python.tar.gz",
        "cifar-10-batches-py",
        "6d958be074577803d12ecdefd02955f39262c83c16fe9348329d7fe0b5c001ce",
    ),
    "cifar100": (
        "https://www.cs.toronto.edu/~kriz/cifar-100-python.tar.gz",
        "cifar-100-python.tar.gz",
        "cifar-100-python",
        "85cd44d02ba6437773c5bbd22e183051d648de2e7d6b014e1ef29b855ba677a7",
    ),
}


def _cifar_required_files(base: Path, variant: str) -> list[Path]:
    if variant == "cifar10":
        return [base / f"data_batch_{i}" for i in range(1, 6)] + [base / "test_batch"]
    return [base / "train", base / "test"]


def cifar_ready(data_dir: str | Path, variant: str) -> bool:
    """True when the extracted CIFAR batch files are all present."""
    base = Path(data_dir) / _CIFAR_SOURCES[variant][2]
    return all(p.exists() for p in _cifar_required_files(base, variant))


def download_cifar(
    data_dir: str | Path,
    variant: str = "cifar10",
    *,
    url: str | None = None,
    sha256: str | None = None,
    timeout: float = 600.0,
) -> Path:
    """Opt-in, checksum-pinned CIFAR download (``data.download=true``).

    ≙ reference train.py:283-301 (torchvision ``download=master_process``).
    Fetches to ``<data_dir>/<archive>.part``, verifies sha256, atomically
    renames, extracts.  Idempotent: a present archive or extracted dir
    short-circuits.  Callers are responsible for master-process gating
    (see Trainer._load_data); this function is jax-free.
    """
    src_url, archive_name, member_dir, pinned = _CIFAR_SOURCES[variant]
    url = url or src_url
    sha256 = sha256 or os.environ.get(f"NVIT_{variant.upper()}_SHA256") or pinned
    root = Path(data_dir)
    root.mkdir(parents=True, exist_ok=True)
    archive = root / archive_name
    if cifar_ready(root, variant):
        return root / member_dir
    if not archive.exists():
        part = archive.with_suffix(archive.suffix + ".part")
        h = hashlib.sha256()
        with urllib.request.urlopen(url, timeout=timeout) as resp, open(part, "wb") as f:
            while chunk := resp.read(1 << 20):
                h.update(chunk)
                f.write(chunk)
        if h.hexdigest() != sha256:
            part.unlink()
            raise RuntimeError(
                f"{variant} download from {url} failed checksum verification: "
                f"got sha256 {h.hexdigest()}, expected {sha256}. Refusing to use it. "
                f"(Override with NVIT_{variant.upper()}_SHA256 only if the upstream "
                f"archive legitimately changed.)"
            )
        part.rename(archive)  # atomic: readers never see a torn archive
    else:
        # verify a pre-existing archive too (≙ torchvision check_integrity on
        # the cached file): a truncated earlier fetch or corrupt pre-staged
        # tarball must not be silently extracted
        h = hashlib.sha256()
        with open(archive, "rb") as f:
            while chunk := f.read(1 << 20):
                h.update(chunk)
        if h.hexdigest() != sha256:
            raise RuntimeError(
                f"existing archive {archive} failed checksum verification: "
                f"got sha256 {h.hexdigest()}, expected {sha256}. Delete it to "
                f"re-download, or override NVIT_{variant.upper()}_SHA256 if the "
                f"upstream archive legitimately changed."
            )
    _maybe_extract(root, archive_name, member_dir, variant)
    return root / member_dir


def wait_for_cifar(data_dir: str | Path, variant: str, *, timeout: float | None = None) -> None:
    """Non-master hosts wait for the master's download+extract to complete
    (shared-filesystem assumption, ≙ the reference's post-download barrier,
    train.py:299-301).

    Default deadline is 3600 s — a slow-but-healthy 162 MB fetch can
    legitimately exceed the old 900 s — and env-tunable
    (``NVIT_CIFAR_WAIT_S``) since the trainer call site passes no argument.
    Extraction is atomic (``_maybe_extract``), so readiness here implies the
    batch files are complete, not mid-write.
    """
    if timeout is None:
        timeout = float(os.environ.get("NVIT_CIFAR_WAIT_S", "") or 3600.0)
    deadline = time.monotonic() + timeout
    while not cifar_ready(data_dir, variant):
        if time.monotonic() > deadline:
            raise TimeoutError(
                f"timed out after {timeout}s waiting for the master process to "
                f"download/extract {variant} under {data_dir}"
            )
        time.sleep(1.0)


def load_cifar(
    data_dir: str | Path,
    *,
    variant: str = "cifar10",
    train: bool = True,
    download: bool = False,
    url: str | None = None,
    sha256: str | None = None,
) -> ArrayDataset:
    """Load CIFAR-10/100 from the standard python batch format."""
    root = Path(data_dir)
    if variant not in _CIFAR_SOURCES:
        raise ValueError(f"unknown CIFAR variant: {variant}")
    if download and not cifar_ready(root, variant):
        download_cifar(root, variant, url=url, sha256=sha256)
    _, archive_name, member_dir, _ = _CIFAR_SOURCES[variant]
    _maybe_extract(root, archive_name, member_dir, variant)
    base = root / member_dir
    if variant == "cifar10":
        files = [base / f"data_batch_{i}" for i in range(1, 6)] if train else [base / "test_batch"]
        label_key, num_classes = b"labels", 10
    else:
        files = [base / ("train" if train else "test")]
        label_key, num_classes = b"fine_labels", 100

    if not base.exists():
        raise FileNotFoundError(
            f"{variant} not found under {root} (expected {base}). Place the standard "
            f"python-format archive ({base.name}) there, set data.download=true "
            f"(checksum-pinned fetch, needs egress), or use dataset='synthetic'."
        )

    imgs, labels = [], []
    for f in files:
        d = _cifar_unpickle(f)
        imgs.append(d[b"data"].reshape(-1, 3, 32, 32))
        labels.append(np.asarray(d[label_key], dtype=np.int32))
    return ArrayDataset(
        images=np.concatenate(imgs).astype(np.uint8),
        labels=np.concatenate(labels),
        num_classes=num_classes,
        name=variant,
    )


@dataclass
class ImageFolderDataset:
    """Lazy JPEG-folder dataset (ImageNet layout): paths + labels; decode on
    access.  ≙ torchvision.datasets.ImageNet (train.py:277-289)."""

    paths: list[Path]
    labels: np.ndarray
    num_classes: int
    image_size: int
    name: str = "imagenet"

    def __len__(self) -> int:
        return len(self.paths)

    def decode_batch(self, indices: np.ndarray) -> np.ndarray:
        """Decode a batch → uint8 [n, 3, S, S] CHW.  Uses the native C++
        threaded decoder (data/native.py) when available; per-image PIL
        fallback otherwise (failed decodes fall back individually too)."""
        try:
            from nvit_tpu.data import native

            if native.available():
                paths = [self.paths[int(i)] for i in indices]
                out, ok = native.decode_jpeg_batch(paths, self.image_size)
                if not ok.all():
                    for j in np.nonzero(~ok)[0]:
                        out[j] = self.decode(int(indices[j]))
                return out
        except Exception:
            pass
        return np.stack([self.decode(int(i)) for i in indices])

    def decode(self, idx: int) -> np.ndarray:
        """Decode one image → uint8 CHW at image_size (resize-shorter + center crop)."""
        from PIL import Image

        with Image.open(self.paths[idx]) as im:
            im = im.convert("RGB")
            w, h = im.size
            scale = self.image_size / min(w, h)
            im = im.resize((max(self.image_size, round(w * scale)), max(self.image_size, round(h * scale))))
            w, h = im.size
            left, top = (w - self.image_size) // 2, (h - self.image_size) // 2
            im = im.crop((left, top, left + self.image_size, top + self.image_size))
            arr = np.asarray(im, dtype=np.uint8)
        return arr.transpose(2, 0, 1)


def load_imagenet(data_dir: str | Path, *, split: str = "train", image_size: int = 224) -> ImageFolderDataset:
    root = Path(data_dir) / "imagenet" / split
    if not root.exists():
        raise FileNotFoundError(
            f"ImageNet split not found at {root}; expected <data_dir>/imagenet/{split}/<wnid>/*.JPEG. "
            f"This environment cannot download datasets; use dataset='synthetic' otherwise."
        )
    classes = sorted(p.name for p in root.iterdir() if p.is_dir())
    class_to_idx = {c: i for i, c in enumerate(classes)}
    paths: list[Path] = []
    labels: list[int] = []
    for c in classes:
        for p in sorted((root / c).iterdir()):
            paths.append(p)
            labels.append(class_to_idx[c])
    return ImageFolderDataset(
        paths=paths,
        labels=np.asarray(labels, dtype=np.int32),
        num_classes=len(classes),
        image_size=image_size,
    )


def make_synthetic(
    *, num_examples: int = 2048, image_size: int = 32, num_classes: int = 100, seed: int = 0
) -> ArrayDataset:
    """Deterministic synthetic data with class-dependent structure so models
    can overfit it (useful for integration tests and benchmarks)."""
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, num_classes, size=num_examples).astype(np.int32)
    base = rng.randint(0, 255, size=(num_classes, 3, image_size, image_size))
    noise = rng.randint(-30, 30, size=(num_examples, 3, image_size, image_size))
    images = np.clip(base[labels] + noise, 0, 255).astype(np.uint8)
    return ArrayDataset(images=images, labels=labels, num_classes=num_classes, name="synthetic")


def load_digits_dataset(*, train: bool = True, image_size: int = 16) -> ArrayDataset:
    """REAL images with zero downloads: scikit-learn's bundled copy of the UCI
    optical-recognition-of-handwritten-digits set (1797 8×8 grayscale images,
    10 classes).  The only real dataset reachable in a zero-egress
    environment — it turns "loss decreases" integration checks into genuine
    held-out-accuracy checks (synthetic data can only prove optimization,
    never generalization).  ≙ reference train.py:277-304 dataset selection
    (smallest member of the family).

    Deterministic 80/20 split by a fixed permutation; nearest-neighbor
    upscale to ``image_size`` (a multiple of 8) and channel replication
    to [N, 3, S, S] uint8.
    """
    try:
        from sklearn.datasets import load_digits
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "dataset='digits' requires scikit-learn (its data is bundled; no download)"
        ) from e
    if image_size % 8 != 0:
        raise ValueError(f"digits images are 8×8; image_size must be a multiple of 8, got {image_size}")
    d = load_digits()
    imgs = (d.images * (255.0 / 16.0)).round().clip(0, 255).astype(np.uint8)  # pixel range is 0..16
    perm = np.random.RandomState(1797).permutation(len(imgs))
    idx = perm[len(imgs) // 5:] if train else perm[: len(imgs) // 5]
    f = image_size // 8
    sel = np.repeat(np.repeat(imgs[idx], f, axis=1), f, axis=2)
    images = np.broadcast_to(sel[:, None, :, :], (len(idx), 3, image_size, image_size)).copy()
    return ArrayDataset(
        images=images, labels=d.target[idx].astype(np.int32), num_classes=10, name="digits"
    )


def load_dataset(
    dataset: str,
    data_dir: str | Path,
    *,
    train: bool = True,
    image_size: int = 32,
    num_classes: int = 100,
    download: bool = False,
):
    """Dataset dispatch (≙ reference train.py:277-304 dataset selection)."""
    d = dataset.lower()
    if d in ("cifar10", "cifar100"):
        return load_cifar(data_dir, variant=d, train=train, download=download)
    if d == "imagenet":
        return load_imagenet(data_dir, split="train" if train else "val", image_size=image_size)
    if d == "digits":
        return load_digits_dataset(train=train, image_size=image_size)
    if d == "synthetic":
        return make_synthetic(
            num_examples=4096 if train else 1024,
            image_size=image_size,
            num_classes=num_classes,
            seed=0 if train else 1,
        )
    raise ValueError(f"Unknown dataset: {dataset}")
