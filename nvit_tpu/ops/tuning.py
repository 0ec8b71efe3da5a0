"""Kernel tuning constants — v5e-MEASURED, env-overridable for other chips.

Every number here was measured on TPU v5e (16 MB VMEM/core, 197 bf16
TFLOPS, 819 GB/s HBM — BASELINE.md rounds 1-3) and is a heuristic, not a
law of nature.  On v5p (459 TFLOPS, 2765 GB/s, different VMEM:flops ratio)
the crossovers move; rather than silently inheriting v5e numbers, every
constant reads an ``NVIT_TUNE_*`` env override so a v5p bring-up can sweep
them without code changes (docs/PERFORMANCE.md "What changes on v5p").

scripts/scale_run.sh pre-flights these on non-v5e devices: it warns which
constants are v5e-measured and names the override env vars.

No reference counterpart: the reference delegates tile selection to
flash-attn/cuDNN/Inductor autotuners.
"""

from __future__ import annotations

import os


def _env_int(name: str, default: int) -> int:
    raw = os.environ.get(name, "")
    return int(raw) if raw else default


# Every constant is served through module __getattr__ (PEP 562) so the
# NVIT_TUNE_* env is re-read on EVERY ``tuning.X`` access — an override set
# after the first nvit_tpu import still takes effect for programs compiled
# afterwards (ADVICE r4: the old module-level bindings froze some constants
# at import while others read late, silently inconsistent).  Already-jitted
# programs keep the tiles they were built with.
_DEFAULTS = {
    # -- flash attention (ops/flash_attention.py) ----------------------------
    # Largest padded T the fused single-program backward handles: the whole
    # [T, T] fp32 score tile + operands must fit VMEM next to dq/dk/dv.
    # 1024 ⇒ ~4 MB score tile; measured fastest ≤1024 on v5e's 16 MB VMEM.
    "FUSED_BWD_MAX_T": 1024,
    # Q-tile row caps for the multi-tile paths: forward keeps ONE [BQ, T]
    # fp32 buffer live (cap 1024); backward holds K/V + temporaries too.
    "BLOCK_Q_CAP_FWD": 1024,
    "BLOCK_Q_CAP_BWD": 512,
    # -- fused gated MLP (ops/gated_mlp.py) ----------------------------------
    # Forward tiles: [512, 1024] fp32 gate intermediates ≈ 14 MB VMEM on
    # v5e.  Backward holds g + two outputs — half the rows.
    "GATED_MLP_FWD_ROW": 512,
    "GATED_MLP_FWD_COL": 1024,
    "GATED_MLP_BWD_ROW": 256,
    "GATED_MLP_BWD_COL": 1024,
    # ``model.gated_mlp_kernel: auto`` uses the fused kernel iff n_embd ≤
    # this.  Measured v5e crossover: d=768 +7% img/s, d=1024 −7% and
    # +3.3 GB peak (the backward's in-VMEM uv recompute competes with the
    # main matmuls once the MXU has no idle headroom; six alternative
    # tilings all lost at d=1024 — scripts/gated_mlp_tile_bench.py).  A v5p
    # sweep may move this boundary.
    "GATED_MLP_AUTO_MAX_EMBD": 768,
}


def __getattr__(name: str) -> int:
    if name in _DEFAULTS:
        return _env_int(f"NVIT_TUNE_{name}", _DEFAULTS[name])
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_DEFAULTS))
