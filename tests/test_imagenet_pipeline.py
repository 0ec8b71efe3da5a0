"""ImageNet-layout pipeline end-to-end: generated JPEG folder → threaded
(native) decode → device prefetch → Trainer steps."""

import dataclasses

import numpy as np
import pytest
from PIL import Image

from nvit_tpu.configs.schema import (
    AugmentationConfig,
    Config,
    DataConfig,
    OptimizerConfig,
    SystemConfig,
    TrainingConfig,
    ViTConfig,
)
from nvit_tpu.data.datasets import load_imagenet
from nvit_tpu.data.pipeline import iterate_folder
from nvit_tpu.train.trainer import Trainer


def make_imagenet_tree(root, *, wnids=("n01", "n02", "n03"), per_class=6, size=40):
    rng = np.random.RandomState(0)
    for split in ("train", "val"):
        for w in wnids:
            d = root / "imagenet" / split / w
            d.mkdir(parents=True)
            for i in range(per_class):
                img = rng.randint(0, 256, (size, size, 3), dtype=np.uint8)
                Image.fromarray(img).save(d / f"{w}_{i}.JPEG", quality=90)


def test_load_imagenet_layout(tmp_path):
    make_imagenet_tree(tmp_path)
    ds = load_imagenet(tmp_path, split="train", image_size=16)
    assert len(ds) == 18
    assert ds.num_classes == 3
    assert sorted(set(ds.labels.tolist())) == [0, 1, 2]
    img = ds.decode(0)
    assert img.shape == (3, 16, 16) and img.dtype == np.uint8


def test_iterate_folder_batches(tmp_path):
    make_imagenet_tree(tmp_path)
    ds = load_imagenet(tmp_path, split="train", image_size=16)
    batches = list(iterate_folder(ds, batch_size=8, epoch=0, seed=1, num_workers=2))
    assert len(batches) == 2  # 18 // 8 with drop_last
    imgs, labels = batches[0]
    assert imgs.shape == (8, 3, 16, 16) and imgs.dtype == np.uint8
    assert labels.shape == (8,)


def test_trainer_on_imagenet_folder(tmp_path):
    make_imagenet_tree(tmp_path, per_class=8)
    cfg = Config(
        model=ViTConfig(
            image_size=16, n_layer=1, n_head=2, n_embd=32, num_classes=3,
            local_patch_size=4, global_patch_size=8, use_nvit=True,
            use_kohonen=False, bias=True, flash_attn=False,
        ),
        training=TrainingConfig(
            batch_size=8, max_iters=2, eval_interval=10, log_interval=1, eval_iters=1
        ),
        optimizer=OptimizerConfig(learning_rate=1e-3, warmup_iters=1, lr_decay_iters=10),
        system=SystemConfig(use_ddp=False, use_tqdm=False, dtype="float32", use_amp=False),
        data=DataConfig(
            out_dir=str(tmp_path / "out"), dataset="imagenet", data_dir=str(tmp_path),
            num_workers=2, augmentation=AugmentationConfig(enabled=False),
        ),
    )
    t = Trainer(config=cfg)
    t.train()
    assert t.iter_num == 2
    assert (tmp_path / "out" / "checkpoint_latest.npz").exists()


def test_missing_imagenet_raises(tmp_path):
    with pytest.raises(FileNotFoundError, match="imagenet"):
        load_imagenet(tmp_path, split="train")
