"""DistributedSampler-parity tests for the per-host data shard contract and
the quick-validation path."""

import dataclasses

import numpy as np

from nvit_tpu.data.pipeline import epoch_indices


class TestEpochIndicesSharding:
    def test_shards_are_disjoint_and_cover(self):
        shards = [
            epoch_indices(100, epoch=3, seed=7, shuffle=True, shard_index=i, shard_count=4)
            for i in range(4)
        ]
        all_idx = np.concatenate(shards)
        assert len(np.unique(all_idx)) == 100  # disjoint cover

    def test_same_seed_same_permutation_across_hosts(self):
        # every host must derive the SAME global permutation (≙ same-seed
        # DistributedSampler, train.py:316) — strided slices then differ
        a = epoch_indices(64, epoch=1, seed=5, shuffle=True, shard_index=0, shard_count=2)
        b = epoch_indices(64, epoch=1, seed=5, shuffle=True, shard_index=1, shard_count=2)
        full = epoch_indices(64, epoch=1, seed=5, shuffle=True)
        np.testing.assert_array_equal(a, full[0::2])
        np.testing.assert_array_equal(b, full[1::2])

    def test_epoch_reshuffles(self):
        a = epoch_indices(64, epoch=0, seed=5, shuffle=True)
        b = epoch_indices(64, epoch=1, seed=5, shuffle=True)
        assert not np.array_equal(a, b)

    def test_no_shuffle_ordered(self):
        np.testing.assert_array_equal(
            epoch_indices(10, epoch=9, seed=1, shuffle=False), np.arange(10)
        )


class TestQuickValidation:
    def test_quick_caps_batches(self, tmp_path):
        from nvit_tpu.configs.schema import (
            AugmentationConfig, Config, DataConfig, SystemConfig, TrainingConfig, ViTConfig,
        )
        from nvit_tpu.train.trainer import Trainer

        cfg = Config(
            model=ViTConfig(
                image_size=16, n_layer=1, n_head=2, n_embd=32, num_classes=10,
                local_patch_size=4, global_patch_size=8, use_nvit=True,
                use_kohonen=False, bias=True, flash_attn=False,
            ),
            training=TrainingConfig(batch_size=64, max_iters=1),
            system=SystemConfig(
                use_ddp=False, use_tqdm=False, dtype="float32", use_amp=False,
                quick_validation=True, quick_validation_size=128,
            ),
            data=DataConfig(
                out_dir=str(tmp_path / "out"), dataset="synthetic",
                data_dir=str(tmp_path / "data"),
                augmentation=AugmentationConfig(enabled=False),
            ),
        )
        t = Trainer(config=cfg)
        t._load_data()
        # valset has 1024 synthetic examples → full = 16 batches, quick = 2
        full = t.validate(quick=False)
        quick = t.validate(quick=True)
        assert "val/loss" in full and "val/loss" in quick
        # quick uses the first 2 batches only; with an untrained model the
        # losses are close but the paths are genuinely different
        assert quick["val/loss"] > 0
