"""Normalization primitives.

``justnorm`` is the hypersphere primitive (≙ reference nvit/model.py:43-44) and
``rms_norm`` the fp32 RMS norm with learnable weight (≙ model.py:172-184).
All norms compute in float32 and cast back to the input dtype — on TPU the
reductions stay in fp32 even under a bf16 compute policy, matching the
reference's explicit ``x.float()`` upcast.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def justnorm(x: Array, axis: int = -1, eps: float = 0.0) -> Array:
    """L2-normalize along ``axis`` (fp32 accumulate, original dtype out).

    ≙ reference model.py:43-44: ``x / x.norm(p=2, dim=-1, keepdim=True)``.
    ``eps=0`` matches the reference exactly (it relies on nonzero inputs);
    pass a small eps where robustness matters.
    """
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(x32 * x32, axis=axis, keepdims=True))
    if eps:
        norm = jnp.maximum(norm, eps)
    return (x32 / norm).astype(dtype)


def rms_norm(x: Array, weight: Array, eps: float = 1e-6) -> Array:
    """RMS norm with learnable per-channel weight (≙ reference model.py:172-184).

    Matches the reference ordering exactly: normalize in fp32, cast back to the
    input dtype, THEN multiply by the (fp32) weight — so the output dtype is
    promoted by the weight multiply, as in torch.
    """
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    ms = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    xnorm = (x32 * jnp.reciprocal(jnp.sqrt(ms + eps))).astype(dtype)
    return xnorm * weight


def layer_norm(x: Array, weight: Array, bias: Array, eps: float = 1e-5) -> Array:
    """Standard LayerNorm (≙ torch nn.LayerNorm used in the reference head,
    model.py:341-344); fp32 statistics, original dtype out."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    return (y.astype(dtype) * weight + bias).astype(jnp.result_type(dtype, weight.dtype))
