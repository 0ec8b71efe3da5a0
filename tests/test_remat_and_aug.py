"""Remat-variant equivalence and the augmentation-enabled training path."""

import dataclasses

import jax
import numpy as np

from nvit_tpu.configs.schema import (
    AugmentationConfig,
    Config,
    DataConfig,
    OptimizerConfig,
    SystemConfig,
    TrainingConfig,
    ViTConfig,
)
from nvit_tpu.train import create_train_state, make_train_step


def cfg_with(system: SystemConfig) -> Config:
    return Config(
        model=ViTConfig(
            image_size=16, n_layer=2, n_head=2, n_embd=32, num_classes=10,
            local_patch_size=4, global_patch_size=8, use_nvit=True,
            use_kohonen=False, bias=True, flash_attn=False,
        ),
        training=TrainingConfig(batch_size=8),
        optimizer=OptimizerConfig(learning_rate=1e-3, warmup_iters=2, lr_decay_iters=100),
        system=system,
    )


def test_remat_variants_identical_numerics():
    """remat on / off / partial (remat_skip) must produce the SAME update —
    rematerialization trades memory for compute, never values."""
    base = SystemConfig(use_ddp=False, dtype="float32", use_amp=False)
    variants = [
        dataclasses.replace(base, remat=False),
        dataclasses.replace(base, remat=True),
        dataclasses.replace(base, remat=True, remat_skip_blocks=1),
    ]
    imgs = jax.random.normal(jax.random.PRNGKey(1), (8, 3, 16, 16))
    labels = jax.random.randint(jax.random.PRNGKey(2), (8,), 0, 10)

    results = []
    for system in variants:
        cfg = cfg_with(system)
        state = create_train_state(cfg)
        new_state, metrics = jax.jit(make_train_step(cfg))(state, imgs, labels)
        results.append((float(metrics["total_loss"]), np.asarray(new_state.params["head"]["w"])))

    for loss, w in results[1:]:
        np.testing.assert_allclose(loss, results[0][0], rtol=1e-6)
        np.testing.assert_allclose(w, results[0][1], rtol=1e-5, atol=1e-7)


def test_trainer_with_autoaugment(tmp_path):
    """Full loop with the on-device AutoAugment policy enabled."""
    from nvit_tpu.train.trainer import Trainer

    cfg = Config(
        model=ViTConfig(
            image_size=16, n_layer=1, n_head=2, n_embd=32, num_classes=10,
            local_patch_size=4, global_patch_size=8, use_nvit=True,
            use_kohonen=False, bias=True, flash_attn=False,
        ),
        training=TrainingConfig(
            batch_size=8, max_iters=2, eval_interval=10, log_interval=1, eval_iters=1
        ),
        optimizer=OptimizerConfig(learning_rate=1e-3, warmup_iters=1, lr_decay_iters=10),
        system=SystemConfig(use_ddp=False, use_tqdm=False, dtype="float32", use_amp=False),
        data=DataConfig(
            out_dir=str(tmp_path / "out"), dataset="synthetic", data_dir=str(tmp_path),
            augmentation=AugmentationConfig(enabled=True, auto_augment=True),
        ),
    )
    t = Trainer(config=cfg)
    t.train()
    assert t.iter_num == 2
