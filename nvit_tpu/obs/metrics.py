"""Observability: logging, metric sinks (console/logfile, JSONL, wandb),
the nViT hparam stat file, and host/device memory stats.

≙ reference observability (SURVEY.md §2 #22): three sinks —
(1) wandb (train.py:508-560) → gated: real wandb if importable+configured,
    else a JSONL file sink with the same interface;
(2) Python logging → console + ``out/training.log`` (train.py:138-151);
(3) ``out/stat`` append-format text file with the per-block means of the
    learned nViT scale vectors (train.py:844-849, 1037-1072 — including the
    fix for the broken placeholder f-string at train.py:1069).
"""

from __future__ import annotations

import json
import logging
import sys
import time
from pathlib import Path
from typing import Any

import jax
import numpy as np

from nvit_tpu.configs.schema import Config
from nvit_tpu.models.blocks import (
    ATTN_ALPHA_INIT_VALUE,
    MLP_ALPHA_INIT_VALUE,
    SQK_INIT_VALUE,
    SUV_INIT_SCALING,
    SUV_INIT_VALUE,
)


def _WANDB_HIST_EDGES() -> np.ndarray:
    """Static finite bin edges for wandb gradhist rendering (cached).

    The gradhist edges (obs/grad_hist.py) are constant by design; wandb
    needs finite ends, so the open first/last edges are clamped.  Computed
    once — the per-key per-log recompute was pure waste for a ~150-leaf
    model.
    """
    cached = getattr(_WANDB_HIST_EDGES, "_cache", None)
    if cached is None:
        from nvit_tpu.obs.grad_hist import histogram_edges

        e = histogram_edges()
        cached = np.concatenate([[0.0], e[1:-1], [e[-2] * 2]])
        _WANDB_HIST_EDGES._cache = cached
    return cached


def setup_logging(out_dir: str | Path, *, level: str = "INFO", to_file: bool = True) -> logging.Logger:
    """Console + logfile logging (≙ train.py:138-151)."""
    handlers: list[logging.Handler] = [logging.StreamHandler(sys.stderr)]
    if to_file:
        Path(out_dir).mkdir(parents=True, exist_ok=True)
        handlers.append(logging.FileHandler(Path(out_dir) / "training.log"))
    logging.basicConfig(
        level=getattr(logging, level.upper(), logging.INFO),
        format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
        handlers=handlers,
        force=True,
    )
    return logging.getLogger("nvit_tpu")


class MetricsWriter:
    """Grouped metric logging (≙ wandb.log with train/ val/ optimizer/ system/
    prefixes, train.py:548-560).  Writes JSONL always; mirrors to wandb when
    available and enabled."""

    def __init__(self, out_dir: str | Path, wandb_mode: str = "disabled", run_name: str = "nvit",
                 project: str = "nvit", config: dict | None = None):
        self.path = Path(out_dir) / "metrics.jsonl"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._fh = open(self.path, "a")
        self.wandb = None
        if wandb_mode in ("online", "offline"):
            try:
                import wandb  # type: ignore

                # log in with the API key from secrets.yaml / NVIT_WANDB_API_KEY
                # before init (≙ reference wandb.login(key=…), train.py:514-515);
                # offline mode and keyless environments skip it gracefully
                from nvit_tpu.configs.loader import get_secret

                api_key = get_secret("WANDB_API_KEY")
                if api_key and wandb_mode == "online":
                    wandb.login(key=api_key)
                wandb.init(mode=wandb_mode, project=project,
                           name=f"{run_name}_{time.strftime('%Y%m%d_%H%M%S')}", config=config or {})
                self.wandb = wandb
            except Exception:  # wandb not installed / no network: JSONL only
                logging.getLogger("nvit_tpu").warning("wandb unavailable; metrics go to %s", self.path)

    def log(self, metrics: dict[str, Any], step: int | None = None) -> None:
        clean = {}
        for k, v in metrics.items():
            if getattr(v, "ndim", 0) > 0:  # e.g. gradhist bin counts
                v = np.asarray(v).tolist()
            elif hasattr(v, "item"):
                v = v.item()
            clean[k] = v
        if step is not None:
            clean["_step"] = int(step)
        self._fh.write(json.dumps(clean) + "\n")
        self._fh.flush()
        if self.wandb is not None:
            out = dict(metrics)
            for k, v in metrics.items():
                # gradhist/* values are bin-count lists over the static
                # log2-magnitude edges (obs/grad_hist.py) — render them as
                # real wandb histograms (≙ wandb.watch, train.py:531-546)
                if k.startswith("gradhist/"):
                    try:
                        out[k] = self.wandb.Histogram(
                            np_histogram=(np.asarray(v, dtype=np.int64), _WANDB_HIST_EDGES())
                        )
                    except Exception:
                        pass  # leave the raw list; never break the sink
            self.wandb.log(out, step=step)

    def finish(self) -> None:
        self._fh.close()
        if self.wandb is not None:
            self.wandb.finish()


def hparams_str(params: dict, cfg: Config) -> str:
    """Mean effective nViT scale params, per block (≙ train.py:1037-1061)."""
    if not cfg.model.use_nvit:
        return ""
    base = cfg.model.base_scale
    sz_eff = np.mean(np.asarray(params["sz"])) * (cfg.model.sz_init_value / cfg.model.sz_init_scaling)
    parts = [f"{sz_eff:.5f} "]
    for bp in params["blocks"]:
        sqk = np.mean(np.asarray(bp["sqk"])) * (SQK_INIT_VALUE / base)
        attn_alpha = np.mean(np.asarray(bp["attn_alpha"])) * (ATTN_ALPHA_INIT_VALUE / base)
        mlp_alpha = np.mean(np.asarray(bp["mlp_alpha"])) * (MLP_ALPHA_INIT_VALUE / base)
        suv = np.mean(np.asarray(bp["suv"])) * (SUV_INIT_VALUE / SUV_INIT_SCALING)
        parts.append(f"{sqk:.5f} {attn_alpha:.5f} {mlp_alpha:.5f} {suv:.5f} ")
    return "".join(parts)


def write_stat_line(
    out_dir: str | Path, *, iter_num: int, lr: float, train_loss: float, val_loss: float,
    params: dict, cfg: Config, append: bool = True,
) -> None:
    """One line of ``out/stat`` (≙ train.py:1063-1072; the reference's literal
    '0.0:.4e ' placeholder string bug is fixed as real zero fields)."""
    path = Path(out_dir) / "stat"
    line = f"{iter_num:.6e} {lr:.4e} {train_loss:.4e} {val_loss:.4e} "
    line += "".join(f"{0.0:.4e} " for _ in range(9))
    line += hparams_str(params, cfg) + "\n"
    with open(path, "a" if append else "w") as f:
        f.write(line)
        f.flush()


def memory_stats(log_memory: bool = True) -> dict[str, float]:
    """Host RAM + device HBM stats (≙ train.py:785-803, 1138-1152)."""
    if not log_memory:
        return {}
    stats: dict[str, float] = {}
    try:
        import psutil

        stats["ram_used_gb"] = psutil.Process().memory_info().rss / 2**30
        stats["ram_percent"] = psutil.virtual_memory().percent
    except Exception:
        pass
    for i, dev in enumerate(jax.local_devices()):
        try:
            m = dev.memory_stats()
            if m:
                stats[f"device_{i}/hbm_used_gb"] = m.get("bytes_in_use", 0) / 2**30
                stats[f"device_{i}/hbm_limit_gb"] = m.get("bytes_limit", 0) / 2**30
        except Exception:
            pass
    return stats


class StepTimer:
    """Step-time + MFU meter (≙ dt logging train.py:952-955 and
    estimate_mfu model.py:387-401, with the chip's bf16 peak replacing the
    A100 constant)."""

    def __init__(self, flops_per_iter: float, peak_flops: float):
        self.flops_per_iter = flops_per_iter
        self.peak_flops = peak_flops
        self.t0 = time.perf_counter()

    def tick(self) -> tuple[float, float]:
        t1 = time.perf_counter()
        dt = t1 - self.t0
        self.t0 = t1
        mfu = (self.flops_per_iter / dt) / self.peak_flops if dt > 0 else 0.0
        return dt, mfu
