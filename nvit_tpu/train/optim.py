"""Optimizer construction: AdamW with parameter groups + global-norm clipping.

≙ reference model.py:369-385 (``configure_optimizers``) and train.py:935-938
(scaler-aware grad clip):

* decay group: parameters with ndim ≥ 2 get ``weight_decay``;
* no-decay group: ndim < 2 (biases, norms, the learned scale vectors, and
  ``sz`` — the reference lists sz as its own no-decay group, model.py:373-377,
  which is behaviorally identical to the ndim<2 rule since sz is 1-D);
* global-norm gradient clipping when ``grad_clip != 0`` (train.py:935-938);
* cosine LR schedule with warmup injected as an optax schedule so the whole
  update — including the LR computation — lives inside the jitted step
  (the reference pokes LR into param groups host-side, train.py:873-876).

The reference's CUDA "fused AdamW" becomes simply optax.adamw under jit: XLA
fuses the elementwise update chain across the whole parameter tree.
"""

from __future__ import annotations

import zlib
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax import Array

from nvit_tpu.configs.schema import OptimizerConfig
from nvit_tpu.models.schedules import cosine_lr
from nvit_tpu.ops.renorm import RENORM_AXES


def decay_mask(params: Any) -> Any:
    """True for leaves that receive weight decay (ndim ≥ 2)."""
    return jax.tree_util.tree_map(lambda p: p.ndim >= 2, params)


def make_optimizer(opt_cfg: OptimizerConfig) -> optax.GradientTransformation:
    schedule = lambda step: cosine_lr(opt_cfg, step)  # noqa: E731
    parts = []
    if opt_cfg.grad_clip:
        parts.append(optax.clip_by_global_norm(opt_cfg.grad_clip))
    parts.append(
        optax.adamw(
            learning_rate=schedule,
            b1=opt_cfg.beta1,
            b2=opt_cfg.beta2,
            eps=1e-8,
            weight_decay=opt_cfg.weight_decay,
            mask=decay_mask,
        )
    )
    return optax.chain(*parts)


# ------------------------------------------------------- fused update sweep
# One pass over every parameter leaf computing clip-scale → AdamW moments →
# bias correction → decayed update → apply → (nViT) hypersphere renorm, per
# leaf, in a single fused elementwise chain.  The optax chain + separate
# renorm_params sweep reads/writes the large weights in several passes
# (measured 12 ms + 8 ms on nViT-B/16); this brings the traffic down to the
# irreducible read(g, m, v, p) + write(m, v, p).  ≙ reference CUDA fused
# AdamW (model.py:384) + per-step normalize_matrices (train.py:461-480).
#
# Semantics are verified EQUAL to optax.chain(clip_by_global_norm, adamw) +
# renorm_params in tests/test_train_step.py.
_ADAM_EPS = 1e-8


class FusedAdamWState(NamedTuple):
    count: Array  # int32, number of updates applied so far
    mu: Any
    nu: Any


def init_fused_adamw(params: Any, moments_dtype: str = "float32") -> FusedAdamWState:
    """Zero moments.  ``moments_dtype="bfloat16"`` stores mu/nu in bf16 (the
    round-5 pre-registered traffic experiment, BASELINE.md): −0.96 GB/step of
    optimizer-state HBM traffic at nViT-B/16.  The update then computes in
    fp32 and stores back with STOCHASTIC ROUNDING (unbiased — plain-bf16
    accumulation was rejected on numerics in round 3; SR has no systematic
    drift)."""
    dt = jnp.bfloat16 if moments_dtype == "bfloat16" else None
    zeros = lambda: jax.tree_util.tree_map(  # noqa: E731
        lambda p: jnp.zeros(p.shape, dt or p.dtype), params
    )
    return FusedAdamWState(count=jnp.zeros((), jnp.int32), mu=zeros(), nu=zeros())


def _sr_with_bits(x32: Array, r: Array) -> Array:
    """Stochastically round fp32→bf16 given 16 uniform dither bits per element:
    add the bits below the bf16 mantissa boundary, then truncate.  E[sr(x)] = x
    exactly (round-up probability = fraction/ulp); carries into the exponent
    ARE the round-up path.  Non-finite values pass through a plain cast (a
    uint carry past the exponent field would otherwise corrupt them)."""
    xi = jax.lax.bitcast_convert_type(x32, jnp.uint32)
    yi = (xi + (r & jnp.uint32(0xFFFF))) & jnp.uint32(0xFFFF0000)
    y = jax.lax.bitcast_convert_type(yi, jnp.float32).astype(jnp.bfloat16)
    return jnp.where(jnp.isfinite(x32), y, x32.astype(jnp.bfloat16))


def sr_bf16(x32: Array, key: Array) -> Array:
    """SR store with threefry dither bits (``optimizer.sr_dither=threefry``)."""
    return _sr_with_bits(x32, jax.random.bits(key, x32.shape, jnp.uint32))


def _fmix32(x: Array) -> Array:
    """murmur3's 32-bit finalizer (full avalanche): the per-element hash behind
    ``sr_dither=hash``.  uint32 in, uint32 out; multiplies wrap mod 2^32."""
    x = x ^ (x >> 16)
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> 13)
    x = x * jnp.uint32(0xC2B2AE35)
    return x ^ (x >> 16)


def sr_bf16_hash(x32: Array, seed: Array) -> Array:
    """SR store with counter-hash dither (``optimizer.sr_dither=hash``, the
    round-5 pre-registered experiment #2 — BASELINE.md): dither bits are
    fmix32(global_element_index · φ32 ^ seed), ~13 u32 VPU ops/element vs
    threefry's ~100.  ``seed`` is a scalar uint32 already mixing (step count,
    leaf path, mu-vs-nu salt), so the bits stay deterministic in (step, path)
    — identical replay on resume, bit-identical DP replicas — and independent
    of the value being rounded (unbiasedness; bias analysis in BASELINE.md).
    Under GSPMD sharding ``broadcasted_iota`` keeps GLOBAL index semantics, so
    sharded and unsharded stores round identically."""
    idx = jnp.zeros(x32.shape, jnp.uint32)
    stride = 1
    for d in reversed(range(x32.ndim)):
        idx = idx + jax.lax.broadcasted_iota(jnp.uint32, x32.shape, d) * jnp.uint32(stride)
        stride *= x32.shape[d]
    return _sr_with_bits(x32, _fmix32(idx * jnp.uint32(0x9E3779B9) ^ seed))


def _renorm_axis_of(path) -> int | None:
    """Renorm axis for a param leaf, from its tree path: only the transformer
    Block matrices ``blocks[i].<name>.w`` are renormalized (ops/renorm.py)."""
    keys = [k.key if hasattr(k, "key") else k.idx for k in path]
    if (
        len(keys) == 4
        and keys[0] == "blocks"
        and keys[2] in RENORM_AXES
        and keys[3] == "w"
    ):
        return RENORM_AXES[keys[2]]
    return None


def fused_adamw_renorm_update(
    opt_cfg: OptimizerConfig,
    params: Any,
    grads: Any,
    state: FusedAdamWState,
    *,
    renorm: bool,
) -> tuple[Any, FusedAdamWState]:
    """Apply one fused AdamW(+renorm) step: returns (new_params, new_state)."""
    b1, b2, wd = opt_cfg.beta1, opt_cfg.beta2, opt_cfg.weight_decay

    gscale = None
    if opt_cfg.grad_clip:
        leaves = [
            jnp.sum(jnp.square(g.astype(jnp.float32)))
            for g in jax.tree_util.tree_leaves(grads)
        ]
        gnorm = jnp.sqrt(sum(leaves))
        clip = jnp.float32(opt_cfg.grad_clip)
        gscale = jnp.where(gnorm < clip, jnp.float32(1.0), clip / gnorm)

    lr = cosine_lr(opt_cfg, state.count)  # optax schedules see the 0-based count
    t = (state.count + 1).astype(jnp.float32)
    bc1 = 1.0 - jnp.power(jnp.float32(b1), t)
    bc2 = 1.0 - jnp.power(jnp.float32(b2), t)

    # bf16 moments (see init_fused_adamw): dither deterministic in
    # (state.count, leaf path, mu/nu), so resume replays the identical
    # rounding sequence and DP replicas agree bit-for-bit.  Two bit sources
    # (optimizer.sr_dither): "threefry" = jax.random.bits with one key per
    # step folded per leaf; "hash" = fmix32 counter hash (pre-registered
    # experiment #2, BASELINE.md) — same guarantees, ~8× fewer VPU ops.
    bf16_moments = any(
        m.dtype == jnp.bfloat16 for m in jax.tree_util.tree_leaves(state.mu)
    )
    sr_base = None
    if bf16_moments and opt_cfg.sr_dither == "threefry":
        sr_base = jax.random.fold_in(jax.random.PRNGKey(0x51AB), state.count)
    count_u32 = state.count.astype(jnp.uint32) if bf16_moments else None

    def leaf(path, p, g, m, v):
        if gscale is not None:
            g = g * gscale.astype(g.dtype)
        store = lambda x, salt: x  # noqa: E731
        if m.dtype == jnp.bfloat16:
            # per-leaf salt from the (static) tree path — stable across
            # traces, resumes and shardings
            pid = zlib.crc32(jax.tree_util.keystr(path).encode()) & 0x3FFFFFFF
            if opt_cfg.sr_dither == "hash":
                seed = lambda salt: _fmix32(  # noqa: E731
                    count_u32 ^ (jnp.uint32(2 * pid + salt) * jnp.uint32(0x9E3779B9))
                )
                store = lambda x, salt: sr_bf16_hash(x, seed(salt))  # noqa: E731
            else:
                store = lambda x, salt: sr_bf16(x, jax.random.fold_in(sr_base, 2 * pid + salt))  # noqa: E731
            m, v = m.astype(jnp.float32), v.astype(jnp.float32)
            g = g.astype(jnp.float32)
        m = b1 * m + (1.0 - b1) * g
        v = b2 * v + (1.0 - b2) * jnp.square(g)
        upd = (m / bc1) / (jnp.sqrt(v / bc2) + _ADAM_EPS)
        if p.ndim >= 2:  # decay mask (≙ configure_optimizers groups)
            upd = upd + wd * p.astype(upd.dtype)
        new_p = p - lr.astype(p.dtype) * upd.astype(p.dtype)
        axis = _renorm_axis_of(path) if renorm else None
        if axis is not None:
            p32 = new_p.astype(jnp.float32)
            norm = jnp.sqrt(jnp.sum(p32 * p32, axis=axis, keepdims=True))
            new_p = (p32 / norm).astype(new_p.dtype)
        return new_p, store(m, 0), store(v, 1)

    fused = jax.tree_util.tree_map_with_path(leaf, params, grads, state.mu, state.nu)
    is_triple = lambda x: isinstance(x, tuple) and len(x) == 3 and not isinstance(x[0], tuple)  # noqa: E731
    pick = lambda i: jax.tree_util.tree_map(lambda t_: t_[i], fused, is_leaf=is_triple)  # noqa: E731
    return pick(0), FusedAdamWState(count=state.count + 1, mu=pick(1), nu=pick(2))
