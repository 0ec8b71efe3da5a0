"""Pallas fused attention for TPU — flash-style, non-causal, custom scale.

≙ reference flash-attn 2.x CUDA dependency (model.py:7, 122, 253), rebuilt as
TPU Pallas kernels.  The payoff vs the XLA path is memory: the [B, H, T, T]
logits/probs tensors never touch HBM — each (batch·head, q-tile) program
computes its softmax entirely in VMEM — which is what bounds the trainable
batch size at ImageNet scale (T = 784 tokens).

Design notes (shapes sized for this model family: T ≤ a few thousand):
* K/V for one (batch, head) fit comfortably in VMEM (T_pad × 64 × bf16 ≈
  114 KB at T=896), so the kernel uses a single-pass softmax over the full
  key axis per q-tile — flash-style tiling over Q only, no online-softmax
  carry loop.  All reductions are fp32; the P·V matmul feeds the MXU in the
  input dtype with fp32 accumulation.
* Sequence padding to the 128-lane tile is handled by masking padded KEY
  columns with −1e30 in the forward and zeroing padded QUERY columns of Pᵀ in
  the backward; padded rows are sliced away by the wrapper.
* Backward is the FlashAttention-2 split: a dq kernel tiled over Q and a
  dk/dv kernel tiled over K, both recomputing P from the saved logsumexp.
* Custom softmax scale: baseline 1/sqrt(d), nViT sqrt(d) (model.py:114-116).

The public entry ``flash_attention(q, k, v, scale)`` is differentiable
(custom VJP) and used via ops/attention.py when ``config.flash_attn=True``.
"""

from __future__ import annotations

import functools
from typing import Any

from nvit_tpu.ops import tuning

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
NEG_INF = -1e30


def _pad_len(t: int, dtype: Any = None) -> int:
    """HBM padding for the sequence axis.

    The single-tile kernels (full-T forward q-tiles, fused backward) only
    need SUBLANE alignment on T (8 fp32 / 16 bf16): the [T, T] score tile's
    lane dimension is an in-VMEM intermediate that Mosaic pads internally at
    zero HBM cost.  Explicitly padding to the 128 lane multiple instead
    forces a pad/unpad copy of every q/k/v/g/o tensor around every kernel
    call — measured ~10 ms/step at the flagship T=784 (which is 16-aligned
    already, so no copy at all).  The long-T multi-tile path still pads to
    128 so the q-tile grid divides evenly."""
    lane = ((t + LANE - 1) // LANE) * LANE
    if dtype is None:
        return lane
    sub = 8 if jnp.dtype(dtype).itemsize >= 4 else 16
    t_sub = ((t + sub - 1) // sub) * sub
    return t_sub if t_sub <= tuning.FUSED_BWD_MAX_T else lane


def _pick_block_q(t_pad: int, cap: int | None = None) -> int:
    """Q-tile rows: full-T when it fits the cap (single program per bh —
    t_pad then only needs sublane alignment), else the largest 128-multiple
    divisor of t_pad ≤ cap.

    Per-program overhead (~2 µs) dominates at tiny tiles: at T=896 a 128-row
    tile means 2688 programs per call; a 448-row tile cuts that 3.5× while
    the fp32 [BQ, T] softmax scratch (448×896×4 B ≈ 1.6 MB) still fits VMEM
    alongside K/V and the bwd temporaries.  The forward kernel (one [BQ, T]
    fp32 buffer live) can afford full-T tiles up to 1024."""
    if cap is None:
        cap = tuning.BLOCK_Q_CAP_BWD  # call-time read (NVIT_TUNE_*, ADVICE r4)
    if t_pad <= cap:
        return t_pad
    for cand in (1024, 896, 768, 640, 512, 448, 384, 256, 128):
        if cand <= cap and t_pad % cand == 0:
            return cand
    return 128


# --------------------------------------------------------------------- fwd
def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float, t_actual: int):
    """One (batch·head, q-tile) program: full-K softmax in VMEM.

    q_ref: [BLOCK_Q, D]; k_ref/v_ref: [T_pad, D]; o_ref: [BLOCK_Q, D];
    lse_ref: [BLOCK_Q, 1] (fp32).
    """
    # softmax scale folded into the [BQ, D] q operand instead of a full VPU
    # pass over the [BQ, T] score tile (12x fewer elements at D=64; exact
    # when scale is a power of two, e.g. sqrt(64)=8 for this model family).
    # Measured NEUTRAL at step level on v5e (the multiply pipelines behind
    # the exp chain) — kept because it strictly removes VPU ops per element
    # and the VPU:MXU ratio differs on other TPU generations.
    q = q_ref[0] * scale
    k = k_ref[0]
    t_pad = k.shape[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, T_pad], already scaled
    if t_actual < t_pad:  # mask padded key columns
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(col < t_actual, s, NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)  # [BQ, 1]
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)  # [BQ, 1]

    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BQ, D]
    o_ref[0] = (pv / l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)


def _fwd(q3: Array, k3: Array, v3: Array, scale: float, t_actual: int):
    """q3/k3/v3: [BH, T_pad, D] → (o [BH, T_pad, D], lse [BH, T_pad, 1])."""
    bh, t_pad, d = q3.shape
    BLOCK_Q = _pick_block_q(t_pad, cap=tuning.BLOCK_Q_CAP_FWD)
    grid = (bh, t_pad // BLOCK_Q)
    kernel = functools.partial(_fwd_kernel, scale=scale, t_actual=t_actual)
    o, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK_Q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, t_pad, d), q3.dtype),
            jax.ShapeDtypeStruct((bh, t_pad, 1), jnp.float32),
        ],
        # cost estimates are APPROXIMATE scheduler hints: they count the
        # [T, D]-sized tensors in the q-dtype and omit the [T, 1] fp32
        # lse/delta stats (<1% of traffic) — do not read them as exact
        # byte accounting (ADVICE r2 #5)
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * t_pad * t_pad * d,
            bytes_accessed=bh * t_pad * d * 3 * q3.dtype.itemsize,
            transcendentals=bh * t_pad * t_pad,
        ),
    )(q3, k3, v3)
    return o, lse


# ---------------------------------------------------------------------- bwd
def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *, scale, t_actual):
    """dq tile: dq = (P ∘ (dO·Vᵀ − Δ)) · K · scale, P recomputed from lse."""
    q = q_ref[0] * scale  # scale folded into the [BQ, D] operand (see _fwd_kernel)
    k = k_ref[0]
    t_pad = k.shape[0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if t_actual < t_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(col < t_actual, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0])  # [BQ, T_pad]

    dp = jax.lax.dot_general(
        do_ref[0], v_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BQ, T_pad]
    ds = p * (dp - delta_ref[0])  # [BQ, T_pad] fp32
    dq = jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref, *, scale, t_actual):
    """dk/dv tile over K: Pᵀ recomputed; padded QUERY columns zeroed."""
    # scale folded into the q operand — the SAME operand _fwd_kernel scales,
    # so the recomputed Sᵀ products bit-match the forward's S (and p matches
    # the saved lse) even for non-power-of-two scales
    k = k_ref[0]  # [BK, D]
    q = q_ref[0] * scale  # [T_pad, D]
    t_pad = q.shape[0]

    st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    # st [BK, T_pad] = S^T, already scaled
    pt = jnp.exp(st - lse_ref[0].reshape(1, t_pad))
    if t_actual < t_pad:  # zero padded query columns
        col = jax.lax.broadcasted_iota(jnp.int32, pt.shape, dimension=1)
        pt = jnp.where(col < t_actual, pt, 0.0)

    dv = jax.lax.dot_general(
        pt.astype(do_ref.dtype), do_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BK, D]
    dv_ref[0] = dv.astype(dv_ref.dtype)

    dpt = jax.lax.dot_general(
        v_ref[0], do_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BK, T_pad]
    dst = pt * (dpt - delta_ref[0].reshape(1, t_pad))
    dk = jax.lax.dot_general(
        dst.astype(q.dtype), q, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # q carries the scale ⇒ dk = scale·dstᵀ·q_raw already
    dk_ref[0] = dk.astype(dk_ref.dtype)


# Combined single-program backward (used when a whole [T, T] score tile fits
# VMEM): ONE softmax recompute and 5 matmuls produce dq, dk and dv together —
# the two-kernel FlashAttention-2 split recomputes the softmax twice and runs
# 7 matmuls.  For this model family (T ≤ ~1k) this is the hot path.


def _bwd_fused_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, o_ref,
                      dq_ref, dk_ref, dv_ref, *, scale, t_actual):
    # scale folded into [T, D] operand copies instead of three full passes
    # over the [Tq, Tk] score tile / dq/dk outputs (see _fwd_kernel): qs
    # carries the scale through BOTH the score matmul (s = qs·kᵀ) and the
    # dk matmul (dk = dsᵀ·qs = scale·dsᵀ·q); ks likewise through dq
    qs = q_ref[0] * scale
    k = k_ref[0]
    ks = k * scale
    v = v_ref[0]
    do = do_ref[0]
    t_pad = qs.shape[0]

    # Δ_i = rowsum(dO ∘ O) computed in VMEM — folding it here saves the
    # separate XLA pass over g and o (one [T, D] read per layer per step)
    delta = jnp.sum(
        do.astype(jnp.float32) * o_ref[0].astype(jnp.float32), axis=-1, keepdims=True
    )

    s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if t_actual < t_pad:  # mask padded KEY columns (as in fwd)
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(col < t_actual, s, NEG_INF)
    p = jnp.exp(s - lse_ref[0])  # [Tq, Tk]
    if t_actual < t_pad:  # zero padded QUERY rows (their lse is garbage)
        row = jax.lax.broadcasted_iota(jnp.int32, p.shape, dimension=0)
        p = jnp.where(row < t_actual, p, 0.0)

    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - delta)  # [Tq, Tk] fp32

    pb = p.astype(do.dtype)
    dsb = ds.astype(qs.dtype)
    dv_ref[0] = jax.lax.dot_general(
        pb, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)
    dk_ref[0] = jax.lax.dot_general(
        dsb, qs, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dk_ref.dtype)
    dq_ref[0] = jax.lax.dot_general(
        dsb, ks, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)


def _bwd_fused(scale: float, t_actual: int, q3, k3, v3, g, lse, o3):
    bh, t_pad, d = q3.shape
    full = pl.BlockSpec((1, t_pad, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    stat = pl.BlockSpec((1, t_pad, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_fused_kernel, scale=scale, t_actual=t_actual),
        grid=(bh,),
        in_specs=[full, full, full, full, stat, full],
        out_specs=[full, full, full],
        out_shape=[
            jax.ShapeDtypeStruct((bh, t_pad, d), q3.dtype),
            jax.ShapeDtypeStruct((bh, t_pad, d), q3.dtype),
            jax.ShapeDtypeStruct((bh, t_pad, d), v3.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * t_pad * t_pad * d,
            bytes_accessed=bh * t_pad * d * 8 * q3.dtype.itemsize,
            transcendentals=bh * t_pad * t_pad,
        ),
    )(q3, k3, v3, g, lse, o3)


def _bwd(scale: float, t_actual: int, res, g):
    q3, k3, v3, o3, lse = res
    bh, t_pad, d = q3.shape
    g = g.astype(o3.dtype)

    if t_pad <= tuning.FUSED_BWD_MAX_T:
        # Δ is computed inside the fused kernel (one fewer XLA pass over g, o)
        return _bwd_fused(scale, t_actual, q3, k3, v3, g, lse, o3)

    # Δ_i = rowsum(dO ∘ O) — cheap elementwise reduce, fused by XLA
    delta = jnp.sum(g.astype(jnp.float32) * o3.astype(jnp.float32), axis=-1, keepdims=True)

    BLOCK_Q = _pick_block_q(t_pad)
    grid_q = (bh, t_pad // BLOCK_Q)
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, t_actual=t_actual),
        grid=grid_q,
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BLOCK_Q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, t_pad, d), q3.dtype),
    )(q3, k3, v3, g, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, t_actual=t_actual),
        grid=grid_q,
        in_specs=[
            pl.BlockSpec((1, t_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, 1), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, 1), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK_Q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, t_pad, d), q3.dtype),
            jax.ShapeDtypeStruct((bh, t_pad, d), v3.dtype),
        ],
    )(q3, k3, v3, g, lse, delta)
    return dq, dk, dv


# ------------------------------------------------------------------ wrapper
@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_padded(q3, k3, v3, static):
    o, _ = _fwd(q3, k3, v3, *static)
    return o


def _flash_padded_fwd(q3, k3, v3, static):
    o, lse = _fwd(q3, k3, v3, *static)
    return o, (q3, k3, v3, o, lse)


def _flash_padded_bwd(static, res, g):
    return _bwd(static[0], static[1], res, g)


_flash_padded.defvjp(_flash_padded_fwd, _flash_padded_bwd)


def flash_attention(q: Array, k: Array, v: Array, scale: float) -> Array:
    """Fused non-causal attention.  q/k/v: [B, H, T, D] (same T for q and kv
    in this model); returns [B, H, T, D] in v.dtype."""
    b, h, t, d = q.shape
    dtype = v.dtype
    t_pad = _pad_len(t, dtype)

    def prep(x):
        x = x.astype(dtype).reshape(b * h, t, d)
        if t_pad != t:
            x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
        return x

    o = _flash_padded(prep(q), prep(k), prep(v), (float(scale), t))
    if t_pad != t:
        o = o[:, :t, :]
    return o.reshape(b, h, t, d)


# ----------------------------------------------- fused QK-norm (nViT) variant
# Folds the nViT per-head Q/K hypersphere projection into the attention
# kernels: q̂ = s ⊙ q/‖q‖, k̂ = s ⊙ k/‖k‖ (s = effective sqk vector, fp32) are
# computed in VMEM instead of a separate XLA elementwise chain — saving two
# full [B,H,T,D] HBM round-trips per direction (measured ~6 ms/step on
# nViT-B/16, CLAUDE.md roadmap #1).  ≙ reference model.py:108-116, where
# flash-attn gets the already-scaled q/k adjacent to the kernel.
_NORM_EPS = 1e-30  # guards padded all-zero rows; exact elsewhere


def _normed_scaled(x, s):
    """fp32 (x/‖x‖, ‖x‖) with s-scaling: returns (x̂ fp32, xn fp32, ‖x‖ fp32)."""
    x32 = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(x32 * x32, axis=-1, keepdims=True))
    norm = jnp.maximum(norm, _NORM_EPS)
    xn = x32 / norm
    return s * xn, xn, norm


def _fwd_qknorm_kernel(q_ref, k_ref, v_ref, s_ref, o_ref, lse_ref, *, scale, t_actual,
                       bounded):
    """nViT fused-projection forward.  ``bounded=True`` uses the bounded
    softmax: scores are PROVABLY bounded (q̂·k̂ = Σ_d s_d² qn_d kn_d with unit
    qn/kn ⇒ |score| ≤ scale·max_d(s_d²) by Cauchy-Schwarz), so subtracting
    the per-head SCALAR bound replaces the per-row max — one fewer VPU
    reduce pass over the [Tq, Tk] tile (measured +2 img/s on the flagship).
    No overflow ever (s ≤ bound ⇒ exp argument ≤ 0); underflow is fenced by
    the _BOUNDED_EXP_FLOOR clamp below: sqk is LEARNED with a 32×-amplified
    effective LR (stored pre-scaled by base_scale — nothing renorms it), and
    the round-4 flagship soak measured sqk_eff drifting past 2.3 within 200
    iters of the LR peak.  At sqk_eff ≥ 2.336 (bound ≥ 43.65) a whole row of
    exp(s − bound) can underflow fp32 (scores ≥ −bound ⇒ argument ≥ −2·bound
    < −87.3) → l = 0 → 0/0 NaN — exactly the observed soak failure (NaN ~85
    iters after the 2.307 reading; BASELINE.md round 4).  The clamp keeps
    every row sum ≥ T·e^−60 > 0: numerically invisible in the sound regime
    (clamped entries carry ≤ e^−60/l relative weight; constant shifts cancel
    in the normalization) and degrades a row to uniform attention instead of
    NaN in the pathological full-clamp regime.  lse = bound + log(l) is
    exactly what the backward recomputes from (same clamp there)."""
    q = q_ref[0]
    k = k_ref[0]
    s_vec = s_ref[0]  # [1, D] fp32
    t_pad = k.shape[0]

    # softmax scale folded into the q̂ operand ([T, D], fp32, pre-cast)
    # instead of a full VPU pass over the [Tq, Tk] score tile; the bounded
    # stabilizer below keeps using the RAW s_vec, so the bound is unchanged
    qhat, _, _ = _normed_scaled(q, s_vec * scale)
    khat, _, _ = _normed_scaled(k, s_vec)
    qhat = qhat.astype(v_ref.dtype)
    khat = khat.astype(v_ref.dtype)

    s = jax.lax.dot_general(
        qhat, khat, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # already scaled
    if t_actual < t_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(col < t_actual, s, NEG_INF)

    if bounded:
        bound = scale * jnp.max(s_vec * s_vec)
        m = jnp.full((s.shape[0], 1), bound, jnp.float32)
        p = jnp.exp(jnp.maximum(s - bound, _BOUNDED_EXP_FLOOR))
        if t_actual < t_pad:
            # the clamp resurrects NEG_INF-masked columns — re-zero them
            col = jax.lax.broadcasted_iota(jnp.int32, p.shape, dimension=1)
            p = jnp.where(col < t_actual, p, 0.0)
    else:
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (pv / l).astype(o_ref.dtype)
    lse_ref[0] = m + jnp.log(l)


# Bounded-softmax safety gate (auto mode): with bound = scale·max(sqk_eff²)
# < 20, the worst-case exp argument is −2·bound > −40, far from fp32
# under/overflow — the clamp below never fires inside the gate.
_BOUND_GATE = 20.0

# Static-"bounded" underflow fence: exp arguments are clamped to ≥ −60, so a
# row sum is ≥ T·e^−60 ≈ T·8.8e−27 ≫ fp32 tiny — no 0/0 at ANY learned-sqk
# drift (observed drift: sqk_eff > 2.3, bound > 43, argument < −87 = fp32
# exp underflow; see _fwd_qknorm_kernel's docstring).  −60 is far below any
# entry that matters (relative weight ≤ e^−60/l) yet safely above underflow
# even after the bf16 cast of p (bf16 min subnormal ≈ 9.2e−41).
#
# COTANGENT APPROXIMATION in the fully-clamped regime (ADVICE r4): when the
# clamp floors an ENTIRE row, the forward output is uniform attention —
# constant w.r.t. the scores, so the true score gradient is exactly 0.  The
# VJP kernels still compute ds = p·(dp − Δ) with p = 1/T as if the softmax
# were live, emitting finite-but-nonzero cotangents for q/k/sqk there.  This
# is deliberate: the regime requires max-score < bound − 60, i.e. a
# pathologically mis-scaled row.  In "auto" mode the jax-level fallback cond
# (bound > _BOUND_GATE) routes such programs to the exact row-max kernel
# long before the clamp can fire; zeroing ds would cost an extra [Tq, Tk]
# compare+select per tile in the hot backward.  Static "bounded" mode CAN
# reach this regime under runaway sqk drift — the round-4 20k soak did
# (sqk_eff → 24, attention uniform, capability collapse; BASELINE.md r5),
# which is why "rowmax" is the config default since round 5 and "bounded"
# is opt-in with the trainer's drift watch.  The approximate gradient
# still points TOWARD reviving the row (it shrinks the bound via dsqk).
# tests/test_flash_attention asserts finiteness, not exactness, here — by
# design.
_BOUNDED_EXP_FLOOR = -60.0


def _fwd_qknorm(q3, k3, v3, s3, scale: float, t_actual: int, mode: str = "auto"):
    """``mode`` selects the softmax-stabilizer strategy (static — part of the
    custom-VJP nondiff static tuple):

    * ``"rowmax"`` (config default since round 5) — compile only the classic
      per-row-max kernel: exact at ANY learned-sqk drift, one extra VPU
      reduce pass over the score tile (measured NEUTRAL on v5e: 142.19 vs
      bounded's 142.5±0.5 img/s — BASELINE.md round 5).
    * ``"bounded"`` (opt-in) — compile ONLY the bounded-softmax kernel.
      NaN-proof at any learned-sqk drift via the _BOUNDED_EXP_FLOOR clamp
      (round 4: sqk has a 32×-amplified effective LR and measured drift past
      2.3 on the Kohonen flagship — the earlier "sqk_eff stays ≈ 1" premise
      was wrong; a pre-clamp run NaN'd at bound ≈ 44, BASELINE.md round 4).
      Numerics are exact vs rowmax wherever the clamp is inert (all rows with
      max score > bound − 60); a fully-clamped row degrades to uniform
      attention instead of 0/0 — which is a SILENT capability collapse when
      drift runs away (the 20k soak: sqk_eff → 24, class loss back to
      chance; BASELINE.md round-5 reconciliation — hence no longer the
      default).  Reclaims the ~1.5 GB of planned peak HBM the runtime cond
      cost (XLA double-buffers the cond arms' operands; VERDICT r2 weak #5).
    * ``"auto"`` — runtime jax-level cond between the two compiled variants.
      CAVEATS: the cond double-buffers q/k/v/s operands (≈ +1.5 GB planned
      peak at the flagship shape), and under vmap (e.g. per-example grads)
      lax.cond lowers to select so BOTH kernels execute every step
      (ADVICE r2 #2).
    """
    bh, t_pad, d = q3.shape
    BLOCK_Q = _pick_block_q(t_pad, cap=tuning.BLOCK_Q_CAP_FWD)
    grid = (bh, t_pad // BLOCK_Q)

    def call(bounded):
        def run(q3, k3, v3, s3):
            return _fwd_qknorm_call(
                q3, k3, v3, s3, scale=scale, t_actual=t_actual, bounded=bounded,
                grid=grid, BLOCK_Q=BLOCK_Q,
            )

        return run

    if mode == "bounded":
        return call(True)(q3, k3, v3, s3)
    if mode == "rowmax":
        return call(False)(q3, k3, v3, s3)
    bound_all = scale * jnp.max(s3.astype(jnp.float32) ** 2)
    return jax.lax.cond(bound_all < _BOUND_GATE, call(True), call(False), q3, k3, v3, s3)


def _fwd_qknorm_call(q3, k3, v3, s3, *, scale, t_actual, bounded, grid, BLOCK_Q):
    bh, t_pad, d = q3.shape
    o, lse = pl.pallas_call(
        functools.partial(
            _fwd_qknorm_kernel, scale=scale, t_actual=t_actual, bounded=bounded
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BLOCK_Q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BLOCK_Q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLOCK_Q, 1), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, t_pad, d), v3.dtype),
            jax.ShapeDtypeStruct((bh, t_pad, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * t_pad * t_pad * d,
            bytes_accessed=bh * t_pad * d * 3 * q3.dtype.itemsize,
            transcendentals=bh * t_pad * t_pad,
        ),
    )(q3, k3, v3, s3)
    return o, lse


def _bwd_fused_qknorm_kernel(q_ref, k_ref, v_ref, s_ref, do_ref, lse_ref, o_ref,
                             dq_ref, dk_ref, dv_ref, ds_ref, *, scale, t_actual,
                             bounded):
    """Single-program backward with the QK-norm projection math.

    Emits raw-input grads: dq = (I − qn qnᵀ)/‖q‖ · (s ⊙ dq̂)  (justnorm VJP),
    likewise dk, plus the per-program sqk grad Σ_t (dq̂⊙qn + dk̂⊙kn).

    ``bounded=True`` (static "bounded" mode only) recomputes p with the SAME
    _BOUNDED_EXP_FLOOR clamp as the forward — exp(max(s − bound, floor) −
    (lse − bound)) — so the recomputed softmax matches the forward's even
    when the clamp fired.  In "rowmax"/"auto" modes the plain exp(s − lse)
    is exact (shift-invariance; the auto gate guarantees the bounded arm
    only runs where the clamp is inert)."""
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    s_vec = s_ref[0]  # [1, D] fp32
    t_pad = q.shape[0]

    # Δ in VMEM (see _bwd_fused_kernel)
    delta = jnp.sum(
        do.astype(jnp.float32) * o_ref[0].astype(jnp.float32), axis=-1, keepdims=True
    )

    qhat32, qn, qnorm = _normed_scaled(q, s_vec)
    khat32, kn, knorm = _normed_scaled(k, s_vec)
    # scale folded into [T, D] operand copies instead of three passes over
    # the [Tq, Tk] tiles (see _fwd_kernel): qhat_s carries it through the
    # score matmul AND the dk̂ matmul; khat_s through the dq̂ matmul — so
    # dqhat/dkhat below already include the softmax scale.  NOTE the
    # multiply ORDER (s_vec·scale)·qn matches _fwd_qknorm_kernel's
    # _normed_scaled(q, s_vec·scale) exactly, so the recomputed s (and
    # hence p = exp(s − lse)) bit-matches the forward softmax even for
    # non-power-of-two scales.
    qhat_s = ((s_vec * scale) * qn).astype(v.dtype)
    khat = khat32.astype(v.dtype)
    khat_s = ((s_vec * scale) * kn).astype(v.dtype)

    s = jax.lax.dot_general(qhat_s, khat, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if t_actual < t_pad:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(col < t_actual, s, NEG_INF)
    if bounded:
        bound = scale * jnp.max(s_vec * s_vec)
        p = jnp.exp(jnp.maximum(s - bound, _BOUNDED_EXP_FLOOR) + (bound - lse_ref[0]))
        if t_actual < t_pad:
            p = jnp.where(col < t_actual, p, 0.0)  # clamp resurrects masked cols
    else:
        p = jnp.exp(s - lse_ref[0])
    if t_actual < t_pad:
        row = jax.lax.broadcasted_iota(jnp.int32, p.shape, dimension=0)
        p = jnp.where(row < t_actual, p, 0.0)

    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - delta)

    pb = p.astype(do.dtype)
    dsb = ds.astype(q.dtype)
    dv_ref[0] = jax.lax.dot_general(
        pb, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)
    dkhat = jax.lax.dot_general(
        dsb, qhat_s, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Tk, D] fp32, = scale·dsᵀ·q̂
    dqhat = jax.lax.dot_general(
        dsb, khat_s, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [Tq, D] fp32, = scale·ds·k̂

    # sqk grad: q̂ = s ⊙ qn ⇒ ∂L/∂s = Σ_t (dq̂ ⊙ qn + dk̂ ⊙ kn)
    ds_ref[0] = jnp.sum(dqhat * qn + dkhat * kn, axis=0, keepdims=True)

    # justnorm VJP back to the raw projections
    dqn = s_vec * dqhat
    dq = (dqn - qn * jnp.sum(qn * dqn, axis=-1, keepdims=True)) / qnorm
    dkn = s_vec * dkhat
    dk = (dkn - kn * jnp.sum(kn * dkn, axis=-1, keepdims=True)) / knorm
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)


def _bwd_qknorm(static, res, g):
    # static = (scale, t_actual, mode).  The backward recomputes p from the
    # saved lse; in static "bounded" mode it applies the forward's underflow
    # clamp (see _bwd_fused_qknorm_kernel), in "rowmax"/"auto" the plain
    # exp(s − lse) is exact by shift-invariance.
    scale, t_actual = static[0], static[1]
    bounded = len(static) > 2 and static[2] == "bounded"
    q3, k3, v3, s3, o3, lse = res
    bh, t_pad, d = q3.shape
    g = g.astype(o3.dtype)

    full = pl.BlockSpec((1, t_pad, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    stat = pl.BlockSpec((1, t_pad, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    svec = pl.BlockSpec((1, 1, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    dq, dk, dv, ds3 = pl.pallas_call(
        functools.partial(_bwd_fused_qknorm_kernel, scale=scale, t_actual=t_actual,
                          bounded=bounded),
        grid=(bh,),
        in_specs=[full, full, full, svec, full, stat, full],
        out_specs=[full, full, full, svec],
        out_shape=[
            jax.ShapeDtypeStruct((bh, t_pad, d), q3.dtype),
            jax.ShapeDtypeStruct((bh, t_pad, d), k3.dtype),
            jax.ShapeDtypeStruct((bh, t_pad, d), v3.dtype),
            jax.ShapeDtypeStruct((bh, 1, d), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * bh * t_pad * t_pad * d,
            bytes_accessed=bh * t_pad * d * 8 * q3.dtype.itemsize,
            transcendentals=bh * t_pad * t_pad,
        ),
    )(q3, k3, v3, s3, g, lse, o3)
    return dq, dk, dv, ds3


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _flash_qknorm_padded(q3, k3, v3, s3, static):
    o, _ = _fwd_qknorm(q3, k3, v3, s3, *static)
    return o


def _flash_qknorm_padded_fwd(q3, k3, v3, s3, static):
    o, lse = _fwd_qknorm(q3, k3, v3, s3, *static)
    return o, (q3, k3, v3, s3, o, lse)


_flash_qknorm_padded.defvjp(_flash_qknorm_padded_fwd, _bwd_qknorm)


def flash_attention_qknorm(
    q: Array, k: Array, v: Array, sqk_eff: Array, scale: float, *, mode: str = "auto"
) -> Array:
    """Fused nViT attention: per-head L2-norm + sqk scaling of Q/K inside the
    kernel.  q/k/v: [B, H, T, D]; sqk_eff: [H, D] fp32 (the effective vector
    ``sqk · init_value/init_scaling``).  Differentiable in q, k, v AND sqk_eff.

    ``mode``: softmax-stabilizer strategy — "bounded" | "rowmax" | "auto"
    (see _fwd_qknorm; "auto" adds a runtime cond whose operands XLA
    double-buffers, and under vmap both arms execute — prefer a static mode).

    Long sequences (t_pad > fused-backward limit) fall back to the XLA
    projection + the plain flash kernels."""
    b, h, t, d = q.shape
    dtype = v.dtype
    t_pad = _pad_len(t, dtype)

    if t_pad > tuning.FUSED_BWD_MAX_T:
        s_bc = sqk_eff.reshape(1, h, 1, d)
        qh = (s_bc * (q.astype(jnp.float32) / jnp.maximum(
            jnp.linalg.norm(q.astype(jnp.float32), axis=-1, keepdims=True), _NORM_EPS
        ))).astype(dtype)
        kh = (s_bc * (k.astype(jnp.float32) / jnp.maximum(
            jnp.linalg.norm(k.astype(jnp.float32), axis=-1, keepdims=True), _NORM_EPS
        ))).astype(dtype)
        return flash_attention(qh, kh, v, scale)

    def prep(x):
        x = x.astype(dtype).reshape(b * h, t, d)
        if t_pad != t:
            x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
        return x

    s3 = jnp.broadcast_to(
        sqk_eff.astype(jnp.float32).reshape(1, h, 1, d), (b, h, 1, d)
    ).reshape(b * h, 1, d)
    o = _flash_qknorm_padded(prep(q), prep(k), prep(v), s3, (float(scale), t, mode))
    if t_pad != t:
        o = o[:, :t, :]
    return o.reshape(b, h, t, d)
