"""Optional orbax checkpoint backend: roundtrip + Trainer resume across
backends (data.checkpoint_backend: orbax)."""

import dataclasses

import numpy as np
import jax
import pytest

pytest.importorskip("orbax.checkpoint")

from nvit_tpu.ckpt.checkpoint import restore_for_resume
from nvit_tpu.ckpt.orbax_backend import (
    load_checkpoint_orbax,
    orbax_checkpoint_exists,
    save_checkpoint_orbax,
)
from nvit_tpu.train.state import create_train_state
from nvit_tpu.train.trainer import Trainer
from tests.test_trainer import make_cfg


def test_orbax_roundtrip_bit_exact(tmp_path):
    cfg = make_cfg(tmp_path)
    state = create_train_state(cfg)
    save_checkpoint_orbax(tmp_path, "ck", state, cfg, {"val/loss": 0.5})
    assert orbax_checkpoint_exists(tmp_path, "ck")
    template = create_train_state(cfg, seed=123)
    restored, meta = load_checkpoint_orbax(tmp_path, "ck", template)
    for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert meta["metrics"]["val/loss"] == 0.5


def test_trainer_trains_and_resumes_with_orbax_backend(tmp_path):
    cfg = make_cfg(tmp_path)
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(cfg.data, checkpoint_backend="orbax"))
    t1 = Trainer(config=cfg)
    t1.train()
    assert t1.iter_num == 6
    assert (tmp_path / "out" / "checkpoint_latest.orbax").exists()
    assert (tmp_path / "out" / "checkpoint_latest.json").exists()

    # restore_for_resume dispatches on the metadata format tag
    state, cfg2, meta = restore_for_resume(tmp_path / "out", "checkpoint_latest")
    assert meta["iter_num"] == 6

    cfg3 = dataclasses.replace(
        cfg,
        training=dataclasses.replace(cfg.training, init_from="resume", max_iters=8),
        data=dataclasses.replace(cfg.data, checkpoint_dir=str(tmp_path / "out"),
                                 checkpoint_backend="orbax"),
    )
    t2 = Trainer(config=cfg3)
    assert t2.iter_num == 6
    t2.train()
    assert t2.iter_num == 8


def test_export_from_orbax_checkpoint(tmp_path):
    """ckpt.export reads orbax-backend checkpoints too (restore_for_resume
    dispatches on the format tag) and the export predicts identically."""
    from nvit_tpu.ckpt.export import export_for_inference
    from nvit_tpu.infer import Predictor

    cfg = make_cfg(tmp_path)
    state = create_train_state(cfg)
    save_checkpoint_orbax(tmp_path, "checkpoint_best", state, cfg, {"val/loss": 0.7})
    export_for_inference(tmp_path, "checkpoint_best", tmp_path / "deploy", dtype="float32")
    p = Predictor.from_export(tmp_path / "deploy", "checkpoint_best", compute_dtype=None)
    imgs = np.random.RandomState(0).randint(0, 256, (2, 3, 16, 16), dtype=np.uint8)
    ref = Predictor(state.params, cfg.model, compute_dtype=None).predict_probs(imgs)
    np.testing.assert_allclose(p.predict_probs(imgs), ref, atol=1e-6)
