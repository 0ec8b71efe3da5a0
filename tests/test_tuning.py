"""ops/tuning.py: v5e-measured kernel constants with NVIT_TUNE_* overrides."""

import importlib

import nvit_tpu.ops.tuning as tuning


def test_defaults_are_v5e_measured():
    assert tuning.FUSED_BWD_MAX_T == 1024
    assert tuning.BLOCK_Q_CAP_FWD == 1024
    assert tuning.BLOCK_Q_CAP_BWD == 512
    assert (tuning.GATED_MLP_FWD_ROW, tuning.GATED_MLP_FWD_COL) == (512, 1024)
    assert (tuning.GATED_MLP_BWD_ROW, tuning.GATED_MLP_BWD_COL) == (256, 1024)
    assert tuning.GATED_MLP_AUTO_MAX_EMBD == 768


def test_env_overrides(monkeypatch):
    monkeypatch.setenv("NVIT_TUNE_FUSED_BWD_MAX_T", "2048")
    monkeypatch.setenv("NVIT_TUNE_GATED_MLP_AUTO_MAX_EMBD", "1024")
    try:
        importlib.reload(tuning)
        assert tuning.FUSED_BWD_MAX_T == 2048
        assert tuning.GATED_MLP_AUTO_MAX_EMBD == 1024

        # the auto dispatch boundary must honor the override: _use_mlp_kernel
        # imports the constant at CALL time, so the reload above is the only
        # thing making this pass (no setattr shortcuts — they'd make the
        # assertion tautological)
        from nvit_tpu.configs.schema import ViTConfig
        from nvit_tpu.models import blocks

        cfg = ViTConfig(
            n_embd=1024, n_head=16, flash_attn=True, gated_mlp_kernel="auto"
        )
        assert blocks._use_mlp_kernel(cfg) is True
    finally:
        monkeypatch.delenv("NVIT_TUNE_FUSED_BWD_MAX_T")
        monkeypatch.delenv("NVIT_TUNE_GATED_MLP_AUTO_MAX_EMBD")
        importlib.reload(tuning)
    assert tuning.FUSED_BWD_MAX_T == 1024
