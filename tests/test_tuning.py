"""ops/tuning.py: v5e-measured kernel constants with NVIT_TUNE_* overrides.

Round-5 (ADVICE r4): constants are served through module __getattr__, so an
env override set AFTER the first nvit_tpu import takes effect on the next
``tuning.X`` access — no importlib.reload needed, and every consumer
(flash-attention caps, gated-MLP tiles, auto-dispatch boundary) sees the
same value at the same time.
"""

import nvit_tpu.ops.tuning as tuning


def test_defaults_are_v5e_measured():
    assert tuning.FUSED_BWD_MAX_T == 1024
    assert tuning.BLOCK_Q_CAP_FWD == 1024
    assert tuning.BLOCK_Q_CAP_BWD == 512
    assert (tuning.GATED_MLP_FWD_ROW, tuning.GATED_MLP_FWD_COL) == (512, 1024)
    assert (tuning.GATED_MLP_BWD_ROW, tuning.GATED_MLP_BWD_COL) == (256, 1024)
    assert tuning.GATED_MLP_AUTO_MAX_EMBD == 768


def test_env_overrides_apply_without_reload(monkeypatch):
    monkeypatch.setenv("NVIT_TUNE_FUSED_BWD_MAX_T", "2048")
    monkeypatch.setenv("NVIT_TUNE_GATED_MLP_AUTO_MAX_EMBD", "1024")
    assert tuning.FUSED_BWD_MAX_T == 2048
    assert tuning.GATED_MLP_AUTO_MAX_EMBD == 1024

    # the auto dispatch boundary honors the late override too
    from nvit_tpu.configs.schema import ViTConfig
    from nvit_tpu.models import blocks

    cfg = ViTConfig(n_embd=1024, n_head=16, flash_attn=True, gated_mlp_kernel="auto")
    assert blocks._use_mlp_kernel(cfg) is True

    monkeypatch.delenv("NVIT_TUNE_FUSED_BWD_MAX_T")
    monkeypatch.delenv("NVIT_TUNE_GATED_MLP_AUTO_MAX_EMBD")
    assert tuning.FUSED_BWD_MAX_T == 1024
    assert blocks._use_mlp_kernel(cfg) is False


def test_pick_block_q_reads_cap_at_call_time(monkeypatch):
    from nvit_tpu.ops.flash_attention import _pick_block_q

    assert _pick_block_q(896) == 448  # default bwd cap 512
    monkeypatch.setenv("NVIT_TUNE_BLOCK_Q_CAP_BWD", "1024")
    assert _pick_block_q(896) == 896  # full-T now fits the raised cap


def test_unknown_attribute_raises():
    import pytest

    with pytest.raises(AttributeError):
        tuning.NOT_A_CONSTANT
