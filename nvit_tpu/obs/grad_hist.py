"""Eval-cadence per-tensor gradient histograms (≙ wandb.watch(gradients),
reference train.py:531-546).

The reference logs full per-tensor gradient histograms every log step via
torch hooks.  A verbatim port would fetch ~1.4 GB/step through this
backend's host link, so the repo long substituted per-component gradient
NORMS (PARITY.md #22).  This module closes the remaining observability
delta at negligible cost: fixed log2-magnitude bins, computed IN-STEP on a
strided downsample of each gradient tensor (counts are device-side int32[64]
per tensor, ~40 KB total), fetched only when an eval actually logs.

Binning: bin 0 counts |g| < 2^MIN_EXP (including exact zeros — a vanishing
gradient signal); bins 1..62 are one log2 octave each, [2^(MIN_EXP+k-1),
2^(MIN_EXP+k)); bin 63 counts |g| ≥ 2^(MIN_EXP+62) plus NaN/±inf (explosion signal).
Static edges make histograms comparable across steps and runs without a
host round-trip for the range.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

BINS = 64
MIN_EXP = -44  # fp32 grads at healthy scale sit around 2^-20..2^0
MAX_ELEMS = 65536  # per-tensor downsample cap (strided, deterministic)


def histogram_edges() -> np.ndarray:
    """The 65 static bin edges (host-side, for wandb.Histogram / plotting)."""
    return np.concatenate(
        [[0.0], np.exp2(np.arange(MIN_EXP, MIN_EXP + BINS - 1, dtype=np.float64)), [np.inf]]
    )


def grad_histogram(g: jax.Array, max_elems: int = MAX_ELEMS) -> jax.Array:
    """int32[BINS] log2-magnitude histogram of a downsampled gradient tensor.

    Jit-safe: static shapes, no data-dependent control flow; the scatter-add
    runs only on eval-cadence step variants (see make_train_step).
    """
    flat = g.reshape(-1)
    n = flat.shape[0]
    if n > max_elems:
        stride = -(-n // max_elems)  # ceil → at most max_elems survive
        flat = flat[::stride]
    mag = jnp.abs(flat.astype(jnp.float32))
    tiny = 2.0 ** MIN_EXP
    exp = jnp.floor(jnp.log2(jnp.maximum(mag, tiny)))
    idxf = jnp.clip(exp - (MIN_EXP - 1), 0, BINS - 1)
    idxf = jnp.where(mag < tiny, 0.0, idxf)
    # NaN must land in the explosion bin, not vanish: log2(NaN)=NaN survives
    # clip, and int-cast of NaN is undefined (scatter then silently DROPS the
    # out-of-bounds index) — the exact signal this histogram exists to show.
    # (+inf already reaches BINS-1 through the clip.)
    idxf = jnp.where(jnp.isnan(mag), float(BINS - 1), idxf)
    idx = idxf.astype(jnp.int32)
    return jnp.zeros((BINS,), jnp.int32).at[idx].add(1)


def _path_name(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:  # pragma: no cover
            parts.append(str(p))
    return ".".join(parts)


def tree_grad_histograms(grads) -> dict[str, jax.Array]:
    """{'gradhist/<dotted.path>': int32[BINS]} for every leaf tensor."""
    leaves = jax.tree_util.tree_flatten_with_path(grads)[0]
    return {f"gradhist/{_path_name(path)}": grad_histogram(leaf) for path, leaf in leaves}
