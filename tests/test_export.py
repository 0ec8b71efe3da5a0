"""Inference-only export artifact: size, roundtrip, Predictor agreement."""

import dataclasses
import json

import numpy as np
import pytest

from nvit_tpu.ckpt.checkpoint import save_checkpoint
from nvit_tpu.ckpt.export import export_for_inference, load_export
from nvit_tpu.configs.schema import Config, DataConfig, ViTConfig
from nvit_tpu.infer import Predictor
from nvit_tpu.train.state import create_train_state


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    out = tmp_path_factory.mktemp("ckpt")
    cfg = Config(
        model=ViTConfig(
            image_size=16, n_layer=1, n_head=2, n_embd=32, num_classes=10,
            local_patch_size=4, global_patch_size=8, use_nvit=True,
            use_kohonen=False, flash_attn=False,
        ),
        data=DataConfig(out_dir=str(out)),
    )
    state = create_train_state(cfg)
    save_checkpoint(out, "checkpoint_best", state, cfg, metrics={"val/loss": 1.5})
    return out, cfg, state


class TestExport:
    def test_artifact_smaller_and_metadata(self, ckpt, tmp_path):
        out, cfg, state = ckpt
        path = export_for_inference(out, "checkpoint_best", tmp_path / "deploy")
        train_size = (out / "checkpoint_best.npz").stat().st_size
        assert path.stat().st_size < train_size / 2  # params-only + bf16
        meta = json.loads((tmp_path / "deploy" / "checkpoint_best.export.json").read_text())
        assert meta["format"] == "nvit_tpu.ckpt.export.v1"
        assert meta["model"]["n_embd"] == 32
        assert meta["source_metrics"]["val/loss"] == 1.5

    def test_roundtrip_and_prediction_agreement(self, ckpt, tmp_path):
        out, cfg, state = ckpt
        export_for_inference(out, "checkpoint_best", tmp_path / "d2", dtype="float32")
        params, model_cfg = load_export(tmp_path / "d2", "checkpoint_best")
        assert model_cfg == cfg.model
        # fp32 export restores the params bit-exactly
        for a, b in zip(
            __import__("jax").tree_util.tree_leaves(params),
            __import__("jax").tree_util.tree_leaves(state.params),
        ):
            assert np.array_equal(np.asarray(a), np.asarray(b))
        imgs = np.random.RandomState(0).randint(0, 256, (2, 3, 16, 16)).astype(np.uint8)
        p_full = Predictor.from_checkpoint(out, "checkpoint_best").predict_probs(imgs)
        p_exp = Predictor.from_export(tmp_path / "d2", "checkpoint_best").predict_probs(imgs)
        np.testing.assert_allclose(p_full, p_exp, atol=1e-6)

    def test_bf16_export_close(self, ckpt, tmp_path):
        out, cfg, state = ckpt
        export_for_inference(out, "checkpoint_best", tmp_path / "d3", dtype="bfloat16")
        imgs = np.random.RandomState(1).randint(0, 256, (2, 3, 16, 16)).astype(np.uint8)
        p_full = Predictor.from_checkpoint(out, "checkpoint_best").predict_probs(imgs)
        p_exp = Predictor.from_export(tmp_path / "d3", "checkpoint_best").predict_probs(imgs)
        np.testing.assert_allclose(p_full, p_exp, atol=2e-2)

    def test_int8_export_roundtrip(self, ckpt, tmp_path):
        out, cfg, state = ckpt
        path = export_for_inference(out, "checkpoint_best", tmp_path / "d8", dtype="int8")
        # int8 artifact beats even the bf16 export on size
        bf16 = export_for_inference(out, "checkpoint_best", tmp_path / "d8b")
        assert path.stat().st_size < bf16.stat().st_size
        imgs = np.random.RandomState(2).randint(0, 256, (3, 3, 16, 16)).astype(np.uint8)
        # load-ready: the artifact already holds quantized leaves, and the
        # quantized predictor over the ORIGINAL checkpoint must agree exactly
        # (same quantization applied at export vs at load)
        p_exp = Predictor.from_export(tmp_path / "d8", "checkpoint_best").predict_probs(imgs)
        p_q = Predictor.from_checkpoint(out, "checkpoint_best", quantize="int8").predict_probs(imgs)
        np.testing.assert_allclose(p_exp, p_q, atol=1e-5)
        # passing quantize="int8" on an already-int8 artifact is a no-op
        p_idem = Predictor.from_export(
            tmp_path / "d8", "checkpoint_best", quantize="int8"
        ).predict_probs(imgs)
        np.testing.assert_allclose(p_idem, p_exp, atol=1e-6)
        # and close to the full-precision serving path
        p_full = Predictor.from_checkpoint(out, "checkpoint_best").predict_probs(imgs)
        assert np.abs(p_exp - p_full).mean() < 0.02

    def test_bad_dtype_raises(self, ckpt, tmp_path):
        out, *_ = ckpt
        with pytest.raises(ValueError, match="dtype"):
            export_for_inference(out, "checkpoint_best", tmp_path / "d4", dtype="fp8")

    def test_load_rejects_non_export(self, ckpt, tmp_path):
        out, *_ = ckpt
        (tmp_path / "bad").mkdir()
        (tmp_path / "bad" / "x.export.json").write_text(json.dumps({"format": "other"}))
        with pytest.raises(ValueError, match="not an inference export"):
            load_export(tmp_path / "bad", "x")
