"""Eval-cadence gradient histograms (system.log_grad_histograms; VERDICT r4
next #5 — closes the wandb.watch(gradients) observability gap,
≙ reference train.py:531-546, without per-step fetches)."""

import dataclasses
import json

import jax.numpy as jnp
import numpy as np
import pytest

from nvit_tpu.obs.grad_hist import (
    BINS,
    MAX_ELEMS,
    MIN_EXP,
    grad_histogram,
    histogram_edges,
    tree_grad_histograms,
)

from tests.test_trainer import make_cfg
from nvit_tpu.train.trainer import Trainer


class TestBinning:
    def test_zeros_land_in_bin_zero(self):
        h = np.asarray(grad_histogram(jnp.zeros((100,))))
        assert h[0] == 100 and h.sum() == 100

    def test_known_magnitudes_hit_expected_bins(self):
        # |g| in [2^(MIN_EXP+k-1), 2^(MIN_EXP+k)) → bin k
        g = jnp.array([2.0 ** MIN_EXP, 2.0**-10, -(2.0**-10), 1.0, 2.0**30])
        h = np.asarray(grad_histogram(g))
        assert h[1] == 1  # exactly 2^MIN_EXP opens bin 1
        assert h[-10 - MIN_EXP + 1] == 2  # sign-symmetric
        assert h[0 - MIN_EXP + 1] == 1  # 1.0 = 2^0
        assert h[BINS - 1] == 1  # overflow bin catches explosions
        assert h.sum() == 5

    def test_nonfinite_grads_land_in_explosion_bin(self):
        # NaN survived log2/clip as NaN and int-cast of NaN is undefined —
        # JAX's scatter then DROPS the out-of-bounds index, hiding the one
        # signal this tool exists for (review finding, round 5)
        g = jnp.array([jnp.nan, -jnp.nan, jnp.inf, -jnp.inf, 1.0, 0.0])
        h = np.asarray(grad_histogram(g))
        assert h[BINS - 1] == 4, "NaN/±inf must count in the explosion bin"
        assert h[0] == 1 and h[0 - MIN_EXP + 1] == 1
        assert h.sum() == 6

    def test_downsampling_caps_count(self):
        g = jnp.ones((MAX_ELEMS * 3 + 17,))
        h = np.asarray(grad_histogram(g))
        assert h.sum() <= MAX_ELEMS
        assert h[0 - MIN_EXP + 1] == h.sum()  # all ones → one bin

    def test_edges_match_bins(self):
        e = histogram_edges()
        assert len(e) == BINS + 1
        assert e[0] == 0.0 and np.isinf(e[-1])
        assert e[1] == pytest.approx(2.0 ** MIN_EXP)

    def test_tree_paths_are_dotted(self):
        tree = {"blocks": [{"attn": jnp.ones((4, 4))}], "head": jnp.zeros((3,))}
        hists = tree_grad_histograms(tree)
        assert set(hists) == {"gradhist/blocks.0.attn", "gradhist/head"}
        assert all(v.shape == (BINS,) for v in hists.values())


class TestTrainerIntegration:
    def test_histograms_logged_at_eval_cadence_only(self, tmp_path):
        cfg = make_cfg(tmp_path)
        cfg = dataclasses.replace(
            cfg, system=dataclasses.replace(cfg.system, log_grad_histograms=True)
        )
        t = Trainer(cfg)
        try:
            t.train()
        finally:
            t.cleanup()
        rows = [
            json.loads(l)
            for l in (tmp_path / "out" / "metrics.jsonl").open()
            if l.strip()
        ]
        hist_rows = [r for r in rows if any(k.startswith("gradhist/") for k in r)]
        assert hist_rows, "no histogram rows logged"
        # only eval rows carry histograms (eval_interval=3, max_iters=6)
        for r in hist_rows:
            assert "val/loss" in r
            assert r["_step"] % cfg.training.eval_interval == 0 and r["_step"] > 0
        # per-tensor coverage and well-formedness
        r = hist_rows[-1]
        keys = [k for k in r if k.startswith("gradhist/")]
        assert any("blocks.0" in k for k in keys)
        assert any("head" in k for k in keys)
        for k in keys:
            counts = r[k]
            assert len(counts) == BINS
            assert sum(counts) > 0
        # the iter-0 eval (no step yet) must NOT carry a histogram
        first_eval = [x for x in rows if "val/loss" in x][0]
        assert not any(k.startswith("gradhist/") for k in first_eval)

    def test_off_by_default_no_histogram_keys(self, tmp_path):
        cfg = make_cfg(tmp_path)
        t = Trainer(cfg)
        try:
            t.train()
        finally:
            t.cleanup()
        rows = [
            json.loads(l)
            for l in (tmp_path / "out" / "metrics.jsonl").open()
            if l.strip()
        ]
        assert not any(k.startswith("gradhist/") for r in rows for k in r)
