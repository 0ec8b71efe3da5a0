"""Observability formatting tests + driver-contract (graft entry) tests."""

import json
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

from nvit_tpu.configs.schema import Config, ViTConfig
from nvit_tpu.models.vit import init_vit
from nvit_tpu.obs.metrics import MetricsWriter, StepTimer, hparams_str, memory_stats, write_stat_line

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root for __graft_entry__


def small_cfg(**kw):
    base = dict(
        image_size=16, n_layer=2, n_head=2, n_embd=32, num_classes=10,
        local_patch_size=4, global_patch_size=8, kohonen_nodes=18,
        use_nvit=True, use_kohonen=False, flash_attn=False,
    )
    base.update(kw)
    return Config(model=ViTConfig(**base))


class TestWandbLogin:
    def _fake_wandb(self):
        import types

        calls = {}
        mod = types.ModuleType("wandb")
        mod.login = lambda key=None: calls.__setitem__("login_key", key)
        mod.init = lambda **kw: calls.__setitem__("init", kw)
        mod.log = lambda *a, **kw: None
        mod.finish = lambda: None
        return mod, calls

    def test_online_logs_in_with_secret_key(self, tmp_path, monkeypatch):
        """wandb.login is called with the key from secrets/NVIT_WANDB_API_KEY
        before init (≙ reference train.py:514-515; VERDICT r2 missing #2)."""
        mod, calls = self._fake_wandb()
        monkeypatch.setitem(sys.modules, "wandb", mod)
        monkeypatch.setenv("NVIT_WANDB_API_KEY", "sekrit-123")
        w = MetricsWriter(tmp_path, wandb_mode="online")
        assert calls["login_key"] == "sekrit-123"
        assert w.wandb is mod

    def test_offline_skips_login(self, tmp_path, monkeypatch):
        mod, calls = self._fake_wandb()
        monkeypatch.setitem(sys.modules, "wandb", mod)
        monkeypatch.setenv("NVIT_WANDB_API_KEY", "sekrit-123")
        MetricsWriter(tmp_path, wandb_mode="offline")
        assert "login_key" not in calls
        assert "init" in calls

    def test_keyless_online_still_inits(self, tmp_path, monkeypatch):
        mod, calls = self._fake_wandb()
        monkeypatch.setitem(sys.modules, "wandb", mod)
        monkeypatch.delenv("NVIT_WANDB_API_KEY", raising=False)
        monkeypatch.delenv("WANDB_API_KEY", raising=False)
        MetricsWriter(tmp_path, wandb_mode="online")
        assert "login_key" not in calls
        assert "init" in calls


class TestHparamsStr:
    def test_nvit_format(self):
        cfg = small_cfg()
        params = init_vit(jax.random.PRNGKey(0), cfg.model)
        s = hparams_str(params, cfg)
        fields = s.split()
        # 1 (sz) + 4 per block (sqk, attn_alpha, mlp_alpha, suv)
        assert len(fields) == 1 + 4 * cfg.model.n_layer
        # at init: sz_eff=1.0, sqk_eff=1.0, alpha_eff=0.05, suv_eff=1.0
        assert float(fields[0]) == pytest.approx(1.0)
        assert float(fields[1]) == pytest.approx(1.0, abs=1e-4)
        assert float(fields[2]) == pytest.approx(0.05, abs=1e-4)
        assert float(fields[4]) == pytest.approx(1.0, abs=1e-4)

    def test_baseline_empty(self):
        cfg = small_cfg(use_nvit=False)
        params = init_vit(jax.random.PRNGKey(0), cfg.model)
        assert hparams_str(params, cfg) == ""


class TestStatFile:
    def test_write_and_append(self, tmp_path):
        cfg = small_cfg()
        params = init_vit(jax.random.PRNGKey(0), cfg.model)
        write_stat_line(tmp_path, iter_num=0, lr=0.0, train_loss=0.0, val_loss=0.0,
                        params=params, cfg=cfg, append=False)
        write_stat_line(tmp_path, iter_num=100, lr=1e-3, train_loss=2.5, val_loss=2.7,
                        params=params, cfg=cfg)
        lines = (tmp_path / "stat").read_text().strip().splitlines()
        assert len(lines) == 2
        f = lines[1].split()
        assert float(f[0]) == 100 and float(f[1]) == pytest.approx(1e-3)
        assert float(f[2]) == pytest.approx(2.5) and float(f[3]) == pytest.approx(2.7)
        # 9 zero placeholder fields (reference format; its broken f-string fixed)
        assert all(float(x) == 0.0 for x in f[4:13])


class TestMetricsWriter:
    def test_jsonl_sink(self, tmp_path):
        w = MetricsWriter(tmp_path, wandb_mode="disabled")
        w.log({"a": 1.5, "b": np.float32(2.0)}, step=3)
        w.finish()
        rows = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
        assert rows[0] == {"a": 1.5, "b": 2.0, "_step": 3}


class TestMemoryStats:
    def test_has_host_ram(self):
        stats = memory_stats()
        assert stats.get("ram_used_gb", 0) > 0

    def test_disabled(self):
        assert memory_stats(log_memory=False) == {}


class TestXlaCostAnalysis:
    """The shim normalizes Compiled.cost_analysis() across JAX versions
    (older: one-element list of dicts; newer: dict; defensive: empty)."""

    class _Fake:
        def __init__(self, ret):
            self._ret = ret

        def cost_analysis(self):
            return self._ret

    def test_dict_form(self):
        from nvit_tpu.obs.profiling import xla_cost_analysis

        assert xla_cost_analysis(self._Fake({"flops": 7.0})) == {"flops": 7.0}

    def test_list_form(self):
        from nvit_tpu.obs.profiling import xla_cost_analysis

        assert xla_cost_analysis(self._Fake([{"flops": 7.0}])) == {"flops": 7.0}

    def test_empty_forms(self):
        from nvit_tpu.obs.profiling import xla_cost_analysis

        assert xla_cost_analysis(self._Fake([])) == {}
        assert xla_cost_analysis(self._Fake(None)) == {}


class TestStepTimer:
    def test_mfu_math(self):
        t = StepTimer(flops_per_iter=1e12, peak_flops=1e14)
        import time

        time.sleep(0.01)
        dt, mfu = t.tick()
        assert dt >= 0.01
        assert mfu == pytest.approx((1e12 / dt) / 1e14, rel=1e-6)


class TestGraftEntry:
    def test_entry_abstract_eval(self):
        import __graft_entry__ as g

        fn, args = g.entry()
        out = jax.eval_shape(fn, *args)
        assert out.shape == (8, 1000)

    def test_dryrun_multichip_8(self, capsys):
        import __graft_entry__ as g

        g.dryrun_multichip(8)
        assert "dryrun_multichip OK" in capsys.readouterr().out

    def test_dryrun_multichip_2(self, capsys):
        import __graft_entry__ as g

        g.dryrun_multichip(2)
        assert "dryrun_multichip OK" in capsys.readouterr().out
