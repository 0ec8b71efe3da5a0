"""Int8 post-training quantization for the serving path (w8a8).

Beyond-parity feature: the reference has no quantized inference (its only
inference surface is ``validate_only``, train.py:179-189).  On TPU v5e the
MXU's int8 peak is 2x the bf16 peak (394 vs 197 TOPS), and int8 weights
halve the weight-side HBM traffic, so a quantized serving path is the
idiomatic TPU way to push inference throughput past the bf16 roofline.

The nViT architecture is unusually quantization-friendly, and the scheme
exploits that structure:

* **Per-output-channel symmetric weight quant** — ``wq = round(w / s)``,
  ``s[j] = max|w[:, j]| / 127``.  After every optimizer step the training
  renorm projects each weight column back onto the unit hypersphere
  (ops/renorm.py), so columns have identical L2 norm and no outlier
  channels — the classic int8 failure mode (a few wide channels forcing a
  coarse shared scale) cannot occur.
* **Per-token dynamic activation quant** — hidden states live ON the unit
  hypersphere (``justnorm`` after every residual), so per-token ranges are
  tight and known; ``xq = round(x / sx)``, ``sx = max|x| / 127`` per token.
* **Exact per-column folds** — every weight-side scale in nViT (the ``suv``
  MLP gate fold, fused-projection concatenation) acts per OUTPUT column,
  which composes exactly with the per-column quant scale: folding ``suv``
  into ``scale`` after quantization is bit-identical to quantizing the
  folded weight (no re-quantization error).  See models/blocks.py.

The matmul runs int8 x int8 -> int32 on the MXU (``lax.dot_general`` with
``preferred_element_type=int32``); the fp32 rescale ``acc * (sx * s)`` is a
cheap epilogue XLA fuses.  Attention itself (the flash kernels) and the
norms/residuals stay bf16 — the weight-heavy projections and MLP are where
the int8 FLOPs and bytes are.

Quantization is applied once to a loaded parameter tree
(``quantize_vit_params``); the model's ``linear``/gated dispatchers detect
the quantized leaf format (``{"wq", "scale"[, "b"]}``) and route to
``quantized_linear``.  Training never sees quantized params.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import Array

Params = dict[str, Any]

# parameter-tree leaves that hold a quantizable linear ({"w"[, "b"]})
_TOP_LINEARS = ("local_patch_embed", "global_patch_embed", "reconstruction_head", "head")
_BLOCK_LINEARS = ("query", "key", "value", "att_c_proj", "c_fc", "mlp_c_proj")
_CROSS_LINEARS = ("q_local", "k_global", "v_global", "proj", "out_proj")


def is_quantized(p: Params) -> bool:
    """True if ``p`` is a quantized linear leaf (``{"wq", "scale"[, "b"]}``)."""
    return "wq" in p


def quantize_weight(w: Array) -> tuple[Array, Array]:
    """Symmetric per-output-channel int8: ``w ~ wq * scale`` (w is [in, out]).

    Returns ``(wq int8 [in, out], scale fp32 [out])``.
    """
    w = w.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-12) / 127.0
    wq = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return wq, scale


def quantize_linear_params(p: Params) -> Params:
    """``{"w"[, "b"]}`` -> ``{"wq", "scale"[, "b"]}`` (bias stays fp32)."""
    wq, scale = quantize_weight(p["w"])
    q: Params = {"wq": wq, "scale": scale}
    if "b" in p:
        q["b"] = p["b"].astype(jnp.float32)
    return q


def quantize_activations(x: Array) -> tuple[Array, Array]:
    """Dynamic symmetric per-token int8: ``x ~ xq * sx`` along the last axis.

    Returns ``(xq int8, sx fp32 [..., 1])``.
    """
    x32 = x.astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x32 / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def quantized_linear(p: Params, x: Array) -> Array:
    """``x @ w (+ b)`` with int8 weights and dynamically-quantized activations.

    The contraction is int8 x int8 -> int32 (MXU-native); the per-token x
    per-channel rescale and bias add are an fp32 epilogue.  Output returns in
    ``x.dtype`` (the serving compute dtype, normally bf16) — same contract as
    ``core.layers.linear`` under a compute policy.
    """
    xq, sx = quantize_activations(x)
    acc = jax.lax.dot_general(
        xq, p["wq"], (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (sx * p["scale"])
    if "b" in p:
        y = y + p["b"]
    return y.astype(x.dtype)


def _maybe_quantize(p: Params, keys: tuple[str, ...]) -> Params:
    out = dict(p)
    for k in keys:
        if k in out and not is_quantized(out[k]):  # idempotent (int8 exports)
            out[k] = quantize_linear_params(out[k])
    return out


def _quantize_tree(params: Params) -> Params:
    out = _maybe_quantize(params, _TOP_LINEARS)
    out["cross_attention"] = _maybe_quantize(params["cross_attention"], _CROSS_LINEARS)
    out["blocks"] = [_maybe_quantize(bp, _BLOCK_LINEARS) for bp in params["blocks"]]
    return out


_quantize_tree_jit = jax.jit(_quantize_tree)


def quantize_vit_params(params: Params) -> Params:
    """Quantize every linear in a ViT/nViT parameter tree to int8.

    Non-matmul parameters (norms, scale vectors, position embeddings, SOM
    codebooks, ``sz``) stay full precision — they are elementwise/VPU work
    with no int8 win and carry the model's learned geometry.

    Runs as ONE jitted program: the eager form is dozens of tiny ops, each a
    separately-compiled program — pathological through a remote-compile
    backend (minutes per program over the axon tunnel).
    """
    return _quantize_tree_jit(params)


def quantized_size_bytes(params: Params) -> int:
    """Total parameter bytes (diagnostic for export/artifact sizing)."""
    return sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(params))
