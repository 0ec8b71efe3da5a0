"""Transformer blocks: self-attention Block and CrossAttentionBlock.

Pure functions over explicit parameter pytrees.  ≙ reference
nvit/model.py:47-169 (Block) and model.py:187-275 (CrossAttentionBlock).

Each block runs in one of two modes (static config switch):
* **baseline** — pre-RMSNorm, additive residual, softmax scale 1/sqrt(d_head).
* **nViT** — no pre-norm; per-head L2-normalized Q/K scaled by learnable
  ``sqk``; softmax scale sqrt(d_head); ``suv``-scaled gated MLP; residuals are
  spherical LERPs with learnable per-channel eigen learning rates.

Reference-bug fix (SURVEY.md §2 #4): the reference constructs the Block
RMSNorms only when ``use_nvit=True`` (model.py:63-65) yet calls them only when
``use_nvit=False`` (model.py:95-96, 145-146), so pure-baseline mode crashes.
Canonical semantics here: RMSNorms exist and are applied exactly in baseline
mode.  CrossAttentionBlock had this right in the reference; we match it.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from jax import Array
from jax.ad_checkpoint import checkpoint_name

from nvit_tpu.configs.schema import ViTConfig
from nvit_tpu.core.layers import c_proj_std, concat_linears, init_linear, linear
from nvit_tpu.core.norms import rms_norm
from nvit_tpu.core.residual import slerp_residual
from nvit_tpu.ops.attention import attention, attention_qknorm
from nvit_tpu.ops.gated_mlp import gated_mlp

Params = dict[str, Any]

# Fixed (init_value, init_scaling) constants for the learned scale vectors
# (≙ reference model.py:67-82; scaling for alpha/sqk is config.base_scale).
ATTN_ALPHA_INIT_VALUE = 0.05
MLP_ALPHA_INIT_VALUE = 0.05
SQK_INIT_VALUE = 1.0
SUV_INIT_VALUE = 1.0
SUV_INIT_SCALING = 1.0


def init_block(key: Array, cfg: ViTConfig) -> Params:
    d = cfg.n_embd
    keys = jax.random.split(key, 8)
    p: Params = {
        "query": init_linear(keys[0], d, d, bias=cfg.bias),
        "key": init_linear(keys[1], d, d, bias=cfg.bias),
        "value": init_linear(keys[2], d, d, bias=cfg.bias),
        "att_c_proj": init_linear(keys[3], d, d, bias=cfg.bias, std=c_proj_std(cfg.n_layer)),
        "c_fc": init_linear(keys[4], d, 2 * 4 * d, bias=cfg.bias),
        "mlp_c_proj": init_linear(keys[5], 4 * d, d, bias=cfg.bias, std=c_proj_std(cfg.n_layer)),
        "skip_param": jnp.ones((1,), dtype=jnp.float32),
    }
    if cfg.use_nvit:
        p["attn_alpha"] = cfg.base_scale * jnp.ones((d,), dtype=jnp.float32)
        p["mlp_alpha"] = cfg.base_scale * jnp.ones((d,), dtype=jnp.float32)
        p["sqk"] = cfg.base_scale * jnp.ones((d,), dtype=jnp.float32)
        p["suv"] = SUV_INIT_SCALING * jnp.ones((2 * 4 * d,), dtype=jnp.float32)
    else:
        p["rmsnorm_att"] = jnp.ones((d,), dtype=jnp.float32)
        p["rmsnorm_mlp"] = jnp.ones((d,), dtype=jnp.float32)
    return p


def _split_heads(x: Array, n_head: int) -> Array:
    """[B, T, C] → [B, H, T, D]."""
    b, t, c = x.shape
    return x.reshape(b, t, n_head, c // n_head).transpose(0, 2, 1, 3)


def _merge_heads(x: Array) -> Array:
    """[B, H, T, D] → [B, T, C]."""
    b, h, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)


def _gated_linear(p: Params, x: Array, *, compute_dtype: Any, use_kernel: bool) -> Array:
    """``u * silu(v)`` over ``x @ w (+ b)`` — the gated projection shared by
    the MLP (model.py:148-155) and CrossAttentionBlock's output (model.py:
    258-262).  Casting contract matches core.layers.linear; dispatches to the
    fused Pallas kernel (ops/gated_mlp.py) so the double-width ``uv`` tensor
    never round-trips HBM.  Int8-quantized params (serving path, ops/quant.py)
    run the projection on the int8 MXU and gate in the compute dtype."""
    if "wq" in p:
        uv = linear(p, x, compute_dtype=compute_dtype)
        u, v = jnp.split(uv, 2, axis=-1)
        return u * jax.nn.silu(v)
    w, b = p["w"], p.get("b")
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
        b = b.astype(compute_dtype) if b is not None else None
    return gated_mlp(x, w, b, use_kernel=use_kernel)


def _use_mlp_kernel(cfg: ViTConfig) -> bool:
    """Resolve the fused gated-MLP dispatch (see ViTConfig.gated_mlp_kernel):
    the kernel's bwd recompute wins while the MXU has idle headroom — measured
    crossover on v5e is between d=768 (+7%) and d=1024 (−7%); the boundary is
    env-overridable for other chips (NVIT_TUNE_GATED_MLP_AUTO_MAX_EMBD,
    ops/tuning.py)."""
    if not cfg.flash_attn:  # flash_attn gates ALL Pallas paths
        return False
    if cfg.gated_mlp_kernel == "auto":
        from nvit_tpu.ops.tuning import GATED_MLP_AUTO_MAX_EMBD

        return cfg.n_embd <= GATED_MLP_AUTO_MAX_EMBD
    return cfg.gated_mlp_kernel == "on"


def _sqk_eff(sqk: Array, cfg: ViTConfig) -> Array:
    """Effective per-head sqk vector [H, D] (≙ reference model.py:108-110:
    ``sqk · (init_value/init_scaling)`` reshaped per-head)."""
    return (sqk.astype(jnp.float32) * (SQK_INIT_VALUE / cfg.base_scale)).reshape(
        cfg.n_head, cfg.head_dim
    )


def block_apply(p: Params, cfg: ViTConfig, h: Array, *, compute_dtype: Any = None) -> Array:
    """Self-attention transformer block (≙ reference model.py:92-169).

    Returns the block output WITHOUT the outer ``norm_skip`` — the ViT forward
    applies that around the block (model.py:450-452), matching the reference's
    double-residual structure.
    """
    dt = compute_dtype
    h_in = h

    x = h if cfg.use_nvit else rms_norm(h, p["rmsnorm_att"])
    # fused QKV projection: concatenating the three [d, d] weights (a 7 MB
    # copy) lets one matmul read the [B, T, d] activation once instead of
    # three times, and the backward produces dx in one matmul instead of
    # three-plus-adds.  Params stay separate (checkpoint/renorm parity);
    # autodiff slices the weight gradient back apart.
    p_qkv = concat_linears([p["query"], p["key"], p["value"]])
    qkv = linear(p_qkv, x, compute_dtype=dt)
    q, k, v = (_split_heads(t, cfg.n_head) for t in jnp.split(qkv, 3, axis=-1))

    sqrt_hd = math.sqrt(cfg.head_dim)
    if cfg.use_nvit:
        # per-head QK hypersphere projection fused into the attention call
        # (Pallas kernel on the flash path; XLA chain otherwise)
        att = attention_qknorm(
            q, k, v, _sqk_eff(p["sqk"], cfg), sqrt_hd, use_flash=cfg.flash_attn,
            bounded_softmax=cfg.bounded_softmax,
        )
    else:
        att = attention(q, k, v, 1.0 / sqrt_hd, use_flash=cfg.flash_attn)
    # named so the remat policy can SAVE attention outputs — backward then
    # recomputes only the cheap elementwise/linear parts, not the kernel
    att = checkpoint_name(att, "attn_out")
    h_att = linear(p["att_c_proj"], _merge_heads(att), compute_dtype=dt)

    if cfg.use_nvit:
        h = slerp_residual(h_in, h_att, p["attn_alpha"], ATTN_ALPHA_INIT_VALUE, cfg.base_scale)
    else:
        h = x + h_att

    x = h if cfg.use_nvit else rms_norm(h, p["rmsnorm_mlp"])
    if cfg.use_nvit:
        # weight-side suv gating: suv·(x@W) ≡ x@(W·suv), so scale the
        # [d, 8d] weight COLUMNS (4.7M elements, fp32) instead of the
        # [B, T, 8d] activation tensor (~308 MB bf16 at the flagship shape).
        # The fwd elementwise pass over the 8d-wide tensor disappears, and the
        # d(suv) backward becomes a weight-sized reduction Σ_in(dW_eff ⊙ W)
        # instead of two full passes over the activation tensor
        # (≙ reference model.py:147-151, which scales activations — the
        # flash-attn library it leans on does the analogous fold for sqk).
        suv_eff = p["suv"] * ((SUV_INIT_VALUE / SUV_INIT_SCALING) * math.sqrt(cfg.n_embd))
        if "wq" in p["c_fc"]:
            # int8 serving path: suv scales OUTPUT columns, so it folds into
            # the per-output-channel quant scale exactly — bit-identical to
            # quantizing the suv-folded weight (ops/quant.py module docs)
            c_fc_eff: Params = {
                "wq": p["c_fc"]["wq"],
                "scale": p["c_fc"]["scale"] * suv_eff,
            }
        else:
            c_fc_eff = {"w": p["c_fc"]["w"] * suv_eff}
        if "b" in p["c_fc"]:
            c_fc_eff["b"] = p["c_fc"]["b"] * suv_eff
    else:
        c_fc_eff = p["c_fc"]
    x_mlp = _gated_linear(c_fc_eff, x, compute_dtype=dt, use_kernel=_use_mlp_kernel(cfg))
    h_mlp = linear(p["mlp_c_proj"], x_mlp, compute_dtype=dt)

    if cfg.use_nvit:
        h = slerp_residual(h, h_mlp, p["mlp_alpha"], MLP_ALPHA_INIT_VALUE, cfg.base_scale)
    else:
        h = x + h_mlp
    return h


def init_cross_attention(key: Array, cfg: ViTConfig) -> Params:
    d = cfg.n_embd
    keys = jax.random.split(key, 5)
    p: Params = {
        "q_local": init_linear(keys[0], d, d, bias=cfg.bias),
        "k_global": init_linear(keys[1], d, d, bias=cfg.bias),
        "v_global": init_linear(keys[2], d, d, bias=cfg.bias),
        "proj": init_linear(keys[3], d, 2 * d, bias=cfg.bias),
        "out_proj": init_linear(keys[4], d, d, bias=cfg.bias),
    }
    if cfg.use_nvit:
        p["attn_alpha"] = cfg.base_scale * jnp.ones((d,), dtype=jnp.float32)
        p["sqk"] = cfg.base_scale * jnp.ones((d,), dtype=jnp.float32)
    else:
        p["local_norm"] = jnp.ones((d,), dtype=jnp.float32)
        p["global_norm"] = jnp.ones((d,), dtype=jnp.float32)
    return p


def cross_attention_apply(
    p: Params, cfg: ViTConfig, local: Array, global_: Array, *, compute_dtype: Any = None
) -> Array:
    """Cross attention: Q from the local stream, K/V from the global stream,
    gated output projection (≙ reference model.py:219-275).  In nViT mode the
    residual LERPs toward ``local`` (model.py:265-273)."""
    dt = compute_dtype
    local_in = local

    if not cfg.use_nvit:
        local = rms_norm(local, p["local_norm"])
        global_ = rms_norm(global_, p["global_norm"])

    q = _split_heads(linear(p["q_local"], local, compute_dtype=dt), cfg.n_head)
    # fused KV projection — K and V both read the global stream; one matmul
    # reads it once (see the QKV fuse in block_apply)
    p_kv = concat_linears([p["k_global"], p["v_global"]])
    kv = linear(p_kv, global_, compute_dtype=dt)
    k, v = (_split_heads(t, cfg.n_head) for t in jnp.split(kv, 2, axis=-1))

    sqrt_hd = math.sqrt(cfg.head_dim)
    if cfg.use_nvit:
        att = attention_qknorm(
            q, k, v, _sqk_eff(p["sqk"], cfg), sqrt_hd, use_flash=cfg.flash_attn,
            bounded_softmax=cfg.bounded_softmax,
        )
    else:
        att = attention(q, k, v, 1.0 / sqrt_hd, use_flash=cfg.flash_attn)

    out = _gated_linear(p["proj"], _merge_heads(att), compute_dtype=dt, use_kernel=_use_mlp_kernel(cfg))
    out = linear(p["out_proj"], out, compute_dtype=dt)

    if cfg.use_nvit:
        out = slerp_residual(local_in, out, p["attn_alpha"], ATTN_ALPHA_INIT_VALUE, cfg.base_scale)
    return out
