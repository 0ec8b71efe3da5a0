"""Parameter initialization and the linear-layer primitive.

Weights are stored ``[in, out]`` so forward is a plain ``x @ w`` (MXU-friendly,
no transpose).  The torch reference stores ``[out, in]``; every axis-dependent
operation (renorm axes, init fans) documents the mapping.

Initialization matches the reference:
* Linear weights: normal(0, 0.02)   (≙ model.py:358-362)
* ``c_proj``-style output projections: normal(0, 0.02/sqrt(2·n_layer))
  (≙ model.py:354-356)
* biases: zeros
* conv patch embeds keep torch's default kaiming-uniform-ish init
  (≙ model.py:286-304, untouched by _init_weights)
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from jax import Array

Params = dict[str, Any]


def init_linear(
    key: Array,
    in_dim: int,
    out_dim: int,
    *,
    bias: bool = True,
    std: float = 0.02,
    dtype: Any = jnp.float32,
) -> Params:
    p: Params = {"w": std * jax.random.normal(key, (in_dim, out_dim), dtype=dtype)}
    if bias:
        p["b"] = jnp.zeros((out_dim,), dtype=dtype)
    return p


def linear(p: Params, x: Array, *, compute_dtype: Any = None) -> Array:
    """``x @ w (+ b)``.  When ``compute_dtype`` is set (bf16 policy), both the
    activation and the weight are cast before the matmul — the MXU path — and
    the output stays in the compute dtype (≙ torch autocast semantics).

    Quantized leaves (``{"wq", "scale"[, "b"]}``, produced by
    ops/quant.quantize_vit_params for the int8 serving path) dispatch to the
    int8 MXU matmul; ``compute_dtype`` is moot there (the epilogue returns in
    ``x.dtype``)."""
    if "wq" in p:
        from nvit_tpu.ops.quant import quantized_linear

        if compute_dtype is not None:
            x = x.astype(compute_dtype)
        return quantized_linear(p, x)
    w = p["w"]
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        w = w.astype(compute_dtype)
    y = x @ w
    if "b" in p:
        b = p["b"].astype(y.dtype) if compute_dtype is not None else p["b"]
        y = y + b
    return y


def concat_linears(parts: list[Params]) -> Params:
    """Fuse linears that share an input into one wider projection (the QKV /
    KV fusions in models/blocks.py) — out-axis concatenation of weights and
    biases.  Handles both full-precision (``w``) and int8-quantized (``wq`` +
    per-output-channel ``scale``) leaves: per-column scales concatenate along
    the same axis, so the fused quantized projection is bit-identical to
    running the parts separately."""
    if "wq" in parts[0]:
        p: Params = {
            "wq": jnp.concatenate([q["wq"] for q in parts], axis=1),
            "scale": jnp.concatenate([q["scale"] for q in parts]),
        }
    else:
        p = {"w": jnp.concatenate([q["w"] for q in parts], axis=1)}
    if "b" in parts[0]:
        p["b"] = jnp.concatenate([q["b"] for q in parts])
    return p


def init_conv_patch(
    key: Array,
    channels: int,
    patch: int,
    out_dim: int,
    *,
    dtype: Any = jnp.float32,
) -> Params:
    """Patch-embedding 'conv' stored as a matmul weight [patch*patch*C, out].

    On TPU a stride==kernel conv is a reshape + matmul (space-to-depth), which
    maps straight onto the MXU; we store the weight pre-flattened.  Init mirrors
    torch Conv2d's default kaiming_uniform(a=sqrt(5)) → U(-1/sqrt(fan_in),
    1/sqrt(fan_in)) with fan_in = C·k·k, and the same bound for bias
    (≙ reference model.py:286-304, conv init left at torch default).
    """
    fan_in = channels * patch * patch
    bound = 1.0 / math.sqrt(fan_in)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (fan_in, out_dim), dtype=dtype, minval=-bound, maxval=bound),
        "b": jax.random.uniform(kb, (out_dim,), dtype=dtype, minval=-bound, maxval=bound),
    }


def c_proj_std(n_layer: int) -> float:
    """Scaled init std for residual output projections (≙ model.py:354-356)."""
    return 0.02 / math.sqrt(2 * n_layer)
