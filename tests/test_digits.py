"""Real-data generalization: the bundled scikit-learn digits set.

Every other training test runs synthetic data, which can only prove
optimization.  The UCI handwritten-digits images (1797 real 8×8 scans,
bundled with scikit-learn — no download, so available in this zero-egress
environment) give a genuine held-out-accuracy check of the full pipeline:
CLI-shaped config → dataset reader → epoch iterator → jitted train step →
eval with top-k.  ≙ reference train.py:277-304 (dataset family) +
train.py:562-575 (top-k validation).
"""

import dataclasses
import json

import numpy as np
import pytest

pytest.importorskip("sklearn")

from nvit_tpu.configs.schema import (
    AugmentationConfig,
    Config,
    DataConfig,
    OptimizerConfig,
    SystemConfig,
    TrainingConfig,
    ViTConfig,
)
from nvit_tpu.data.datasets import load_dataset, load_digits_dataset
from nvit_tpu.train.trainer import Trainer


class TestDigitsDataset:
    def test_shapes_and_split_sizes(self):
        tr = load_digits_dataset(train=True, image_size=16)
        va = load_digits_dataset(train=False, image_size=16)
        assert tr.images.shape == (1797 - 1797 // 5, 3, 16, 16)
        assert va.images.shape == (1797 // 5, 3, 16, 16)
        assert tr.images.dtype == np.uint8
        assert tr.num_classes == va.num_classes == 10
        assert set(np.unique(va.labels)) == set(range(10))

    def test_split_is_deterministic_and_disjoint(self):
        tr = load_digits_dataset(train=True)
        tr2 = load_digits_dataset(train=True)
        va = load_digits_dataset(train=False)
        assert np.array_equal(tr.images, tr2.images)
        # disjointness via row fingerprints: no val image appears in train
        # (the digits set has a handful of duplicate scans; compare by index
        # through the fixed permutation instead of raw pixels)
        tr_ids = {hash(im.tobytes()) for im in tr.images}
        dup = sum(hash(im.tobytes()) in tr_ids for im in va.images)
        assert dup <= 5  # only genuine duplicate scans, not split leakage

    def test_upscale_and_channel_replication(self):
        ds = load_digits_dataset(train=False, image_size=16)
        im = ds.images[0]
        assert np.array_equal(im[0], im[1]) and np.array_equal(im[0], im[2])
        # nearest-neighbor 2×: every 2×2 block is constant
        assert np.array_equal(im[0, 0::2, 0::2], im[0, 1::2, 1::2])

    def test_bad_image_size_raises(self):
        with pytest.raises(ValueError, match="multiple of 8"):
            load_digits_dataset(image_size=20)

    def test_dispatch(self):
        ds = load_dataset("digits", "/nonexistent", train=False, image_size=16)
        assert ds.name == "digits"


class TestDigitsConvergence:
    def test_held_out_accuracy(self, tmp_path):
        """Tiny nViT reaches ≥70% top-1 on REAL held-out digits in 300 iters
        (measured: ~88% — threshold leaves platform margin).  ~40 s on CPU."""
        cfg = Config(
            model=ViTConfig(
                image_size=16, n_layer=2, n_head=4, n_embd=64, num_classes=10,
                local_patch_size=4, global_patch_size=8,
                use_nvit=True, use_kohonen=False, flash_attn=False,
            ),
            training=TrainingConfig(
                batch_size=64, max_iters=300, max_iters_per_launch=1000,
                eval_interval=150, log_interval=100, eval_iters=5,
                early_stopping_patience=100,
            ),
            optimizer=OptimizerConfig(learning_rate=1e-3, warmup_iters=50, lr_decay_iters=300),
            system=SystemConfig(use_ddp=False, use_tqdm=False, dtype="float32", use_amp=False),
            data=DataConfig(
                out_dir=str(tmp_path / "out"), dataset="digits",
                data_dir=str(tmp_path / "data"),
                augmentation=AugmentationConfig(enabled=False),
            ),
        )
        Trainer(config=cfg).train()
        evals = [
            json.loads(line)
            for line in (tmp_path / "out" / "metrics.jsonl").read_text().splitlines()
            if "val/top1_accuracy" in line
        ]
        assert evals, "no eval records written"
        top1 = evals[-1]["val/top1_accuracy"]
        top5 = evals[-1]["val/top5_accuracy"]
        assert top1 >= 70.0, f"held-out top-1 {top1:.1f}% < 70%"
        assert top5 >= 95.0, f"held-out top-5 {top5:.1f}% < 95%"

        # int8 serving path on REAL data: quantizing the trained model costs
        # (essentially) no held-out accuracy — measured identical on digits;
        # threshold allows 2 points for platform rounding drift
        from nvit_tpu.infer import Predictor

        va = load_digits_dataset(train=False, image_size=16)
        p_fp = Predictor.from_checkpoint(tmp_path / "out", "checkpoint_best")
        p_q = Predictor.from_checkpoint(tmp_path / "out", "checkpoint_best", quantize="int8")
        acc_fp = float((p_fp.predict(va.images)[0][:, 0] == va.labels).mean()) * 100
        acc_q = float((p_q.predict(va.images)[0][:, 0] == va.labels).mean()) * 100
        assert acc_q >= acc_fp - 2.0, f"int8 top-1 {acc_q:.1f}% vs fp {acc_fp:.1f}%"


class TestReferenceParityHarnessDrift:
    """The head-to-head parity claim (scripts/reference_parity_digits.sh)
    rests on BOTH sides training the same geometry with the same optimizer
    settings and budget.  The torch side hard-codes them in
    scripts/reference_digits_parity.py::make_config; the nvit_tpu side reads
    them from scripts/digits_matrix.sh's env block.  Guard the two against
    silent drift by parsing the shell script and comparing field by field."""

    @staticmethod
    def _shell_env(script: str) -> dict[str, str]:
        import pathlib
        import re

        text = (pathlib.Path(__file__).parent.parent / "scripts" / script).read_text()
        return dict(re.findall(r"(NVIT_[A-Z_]+)=([\w.]+)", text))

    def test_geometry_and_optimizer_match(self):
        torch = pytest.importorskip("torch")  # noqa: F841 — harness needs it
        import importlib.util
        import pathlib

        path = pathlib.Path(__file__).parent.parent / "scripts" / "reference_digits_parity.py"
        spec = importlib.util.spec_from_file_location("ref_parity_harness", path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)

        env = self._shell_env("digits_matrix.sh")
        cfg = mod.make_config(use_nvit=True, use_kohonen=True)
        for field, key, conv in (
            ("image_size", "NVIT_MODEL__IMAGE_SIZE", int),
            ("n_layer", "NVIT_MODEL__N_LAYER", int),
            ("n_head", "NVIT_MODEL__N_HEAD", int),
            ("n_embd", "NVIT_MODEL__N_EMBD", int),
            ("num_classes", "NVIT_MODEL__NUM_CLASSES", int),
            ("local_patch_size", "NVIT_MODEL__LOCAL_PATCH_SIZE", int),
            ("global_patch_size", "NVIT_MODEL__GLOBAL_PATCH_SIZE", int),
            ("kohonen_nodes", "NVIT_MODEL__KOHONEN_NODES", int),
        ):
            assert getattr(cfg, field) == conv(env[key]), field
        assert mod.BATCH == int(env["NVIT_TRAINING__BATCH_SIZE"])
        assert mod.EVAL_INTERVAL == int(env["NVIT_TRAINING__EVAL_INTERVAL"])
        assert mod.LR == float(env["NVIT_OPTIMIZER__LEARNING_RATE"])
        assert mod.WARMUP == int(env["NVIT_OPTIMIZER__WARMUP_ITERS"])

        # the remaining knobs come from the shared settings.yaml defaults on
        # the nvit_tpu side — pin the torch side to the same file
        from nvit_tpu.configs.loader import load_config

        full = load_config()
        assert mod.MIN_LR == full.optimizer.min_lr
        assert mod.WD == full.optimizer.weight_decay
        assert mod.BETAS == (full.optimizer.beta1, full.optimizer.beta2)
        assert mod.CLIP == full.optimizer.grad_clip
        assert mod.CONSISTENCY_W == full.training.consistency_weight
        assert mod.SMOOTHNESS_W == full.training.smoothness_weight
        # ITERS defaults must agree between the harness and the shell matrix
        import pathlib as _pl

        matrix = (_pl.Path(__file__).parent.parent / "scripts" / "digits_matrix.sh").read_text()
        assert "ITERS=${ITERS:-%d}" % mod.ITERS in matrix

        y = full.model
        for field in (
            "dropout", "bias", "kohonen_alpha", "reconstruction_weight",
            "map_balance_weight", "local_quantization_weight",
            "global_quantization_weight", "kohonen_scheduler_enabled",
            "kohonen_scheduler_warmup_steps", "kohonen_scheduler_decay_steps",
            "kohonen_scheduler_min_lr",
        ):
            assert getattr(cfg, field) == getattr(y, field), field
