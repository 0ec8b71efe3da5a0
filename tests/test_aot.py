"""AOT (jax.export / StableHLO) serving artifact: roundtrip agreement,
symbolic batch, int8 composition, platform/format guards, service drop-in."""

import json

import numpy as np
import pytest

from nvit_tpu.ckpt.aot import AotPredictor, export_aot, load_aot
from nvit_tpu.ckpt.checkpoint import save_checkpoint
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
    save_checkpoint(out, "checkpoint_best", state, cfg, metrics={"val/loss": 1.0})
    return out, cfg


class TestAot:
    def test_roundtrip_matches_predictor(self, ckpt, tmp_path):
        out, cfg = ckpt
        export_aot(out, "checkpoint_best", tmp_path / "d")
        aot = load_aot(tmp_path / "d", "checkpoint_best")
        assert aot.cfg == cfg.model
        ref = Predictor.from_checkpoint(out, "checkpoint_best")
        rng = np.random.RandomState(0)
        # symbolic batch: several batch sizes against ONE exported program
        for b in (1, 3, 8):
            imgs = rng.randint(0, 256, (b, 3, 16, 16), dtype=np.uint8)
            got = aot.predict_probs(imgs)
            np.testing.assert_allclose(got, ref.predict_probs(imgs), rtol=1e-4, atol=1e-6)
        idx, pk = aot.predict(imgs, top_k=3)
        assert idx.shape == (8, 3) and (pk[:, 0] >= pk[:, 1]).all()

    def test_int8_composes(self, ckpt, tmp_path):
        out, cfg = ckpt
        export_aot(out, "checkpoint_best", tmp_path / "q", quantize="int8")
        meta = json.loads((tmp_path / "q" / "checkpoint_best.aot.json").read_text())
        assert meta["quantize"] == "int8"
        aot = load_aot(tmp_path / "q", "checkpoint_best")
        ref = Predictor.from_checkpoint(out, "checkpoint_best", quantize="int8")
        imgs = np.random.RandomState(1).randint(0, 256, (4, 3, 16, 16), dtype=np.uint8)
        np.testing.assert_allclose(
            aot.predict_probs(imgs), ref.predict_probs(imgs), rtol=1e-4, atol=1e-6
        )

    def test_platform_guard(self, ckpt, tmp_path):
        out, _ = ckpt
        export_aot(out, "checkpoint_best", tmp_path / "p")
        meta_path = tmp_path / "p" / "checkpoint_best.aot.json"
        meta = json.loads(meta_path.read_text())
        assert meta["platforms"], "exporter must record its lowering platforms"
        meta["platforms"] = ["tpu"]
        meta_path.write_text(json.dumps(meta))
        with pytest.raises(ValueError, match="lowered for"):
            load_aot(tmp_path / "p", "checkpoint_best")

    def test_format_guard_and_bad_quantize(self, ckpt, tmp_path):
        out, _ = ckpt
        (tmp_path / "bad").mkdir()
        (tmp_path / "bad" / "x.aot.json").write_text(json.dumps({"format": "other"}))
        with pytest.raises(ValueError, match="not an AOT export"):
            load_aot(tmp_path / "bad", "x")
        with pytest.raises(ValueError, match="quantize"):
            export_aot(out, "checkpoint_best", tmp_path / "z", quantize="int4")

    def test_service_drop_in(self, ckpt, tmp_path):
        from nvit_tpu.serve import InferenceService

        out, _ = ckpt
        export_aot(out, "checkpoint_best", tmp_path / "s")
        svc = InferenceService(load_aot(tmp_path / "s", "checkpoint_best"), max_batch=8)
        svc.warmup()
        imgs = np.random.RandomState(2).randint(0, 256, (2, 3, 16, 16), dtype=np.uint8)
        resp = svc.predict(imgs, top_k=2)
        assert np.asarray(resp["labels"]).shape == (2, 2)

    def test_symbolic_export_swaps_flash_for_xla(self, ckpt, tmp_path):
        """A symbolic batch cannot parameterize a Pallas launch grid, so
        symbolic exports must lower the XLA attention path even when the
        checkpoint config says flash_attn=true — and still match numerically
        (the paths are parity-tested)."""
        import dataclasses

        out, cfg = ckpt
        flash_cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, flash_attn=True)
        )
        from nvit_tpu.ckpt.checkpoint import save_checkpoint
        from nvit_tpu.train.state import create_train_state

        out2 = tmp_path / "fl"
        out2.mkdir()
        save_checkpoint(out2, "checkpoint_best", create_train_state(flash_cfg), flash_cfg,
                        metrics={"val/loss": 1.0})
        export_aot(out2, "checkpoint_best", tmp_path / "flx")
        meta = json.loads((tmp_path / "flx" / "checkpoint_best.aot.json").read_text())
        assert meta["attention"] == "xla" and meta["batch"] is None
        aot = load_aot(tmp_path / "flx", "checkpoint_best")
        imgs = np.random.RandomState(3).randint(0, 256, (2, 3, 16, 16), dtype=np.uint8)
        assert aot.predict_probs(imgs).shape == (2, 10)

    def test_concrete_batch_export(self, ckpt, tmp_path):
        out, _ = ckpt
        export_aot(out, "checkpoint_best", tmp_path / "cb", batch=4)
        meta = json.loads((tmp_path / "cb" / "checkpoint_best.aot.json").read_text())
        assert meta["batch"] == 4
        aot = load_aot(tmp_path / "cb", "checkpoint_best")
        imgs = np.random.RandomState(4).randint(0, 256, (4, 3, 16, 16), dtype=np.uint8)
        assert aot.predict_probs(imgs).shape == (4, 10)
        with pytest.raises(Exception):  # pinned batch: other sizes are rejected
            aot.predict_probs(imgs[:2])

    def test_pinned_batch_service(self, ckpt, tmp_path):
        """A concrete-batch artifact behind InferenceService: requests pad up
        to the pinned batch; oversize is rejected with a clear error."""
        from nvit_tpu.serve import InferenceService

        out, _ = ckpt
        export_aot(out, "checkpoint_best", tmp_path / "pb", batch=4)
        svc = InferenceService(load_aot(tmp_path / "pb", "checkpoint_best"), max_batch=64)
        assert svc.max_batch == 4
        svc.warmup()
        imgs = np.random.RandomState(5).randint(0, 256, (3, 3, 16, 16), dtype=np.uint8)
        resp = svc.predict(imgs, top_k=1)
        assert np.asarray(resp["labels"]).shape == (3, 1)
        with pytest.raises(ValueError, match="pinned batch"):
            svc.predict(np.zeros((5, 3, 16, 16), dtype=np.uint8))

    def test_serve_rejects_aot_flag_conflicts(self):
        from nvit_tpu.serve import main as serve_main

        with pytest.raises(SystemExit):
            serve_main(["--checkpoint", "x", "--aot", "--int8"])

    def test_cli(self, ckpt, tmp_path, capsys):
        from nvit_tpu.ckpt.aot import main

        out, _ = ckpt
        main(["--checkpoint", str(out), "--name", "checkpoint_best",
              "--dest", str(tmp_path / "cli"), "--int8"])
        assert "exported" in capsys.readouterr().out
        assert (tmp_path / "cli" / "checkpoint_best.aot.bin").exists()
