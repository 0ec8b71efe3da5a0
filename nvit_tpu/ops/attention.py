"""Attention dispatch: XLA reference path + Pallas fused path.

The reference dispatches between flash-attn and torch SDPA
(/root/reference/nvit/model.py:121-124, 252-255) with a custom softmax scale
(1/sqrt(d) baseline, sqrt(d) in nViT mode) and non-causal attention.  The
reference's flash path passes [B,H,T,D] tensors where flash-attn expects
[B,T,H,D] — per SURVEY.md §2 #5 we treat the SDPA semantics as canonical.

Here ``config.flash_attn=True`` selects the Pallas fused kernel
(nvit_tpu/ops/flash_attention.py) when running on TPU; otherwise (CPU tests,
interpret mode) the plain XLA einsum path is used.  Both produce identical
math: fp32 softmax, custom scale, non-causal.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.sharding import PartitionSpec as P

from nvit_tpu.parallel.spmd import axis_size, current_kernel_mesh, warn_kernel_fallback


def sdpa_xla(q: Array, k: Array, v: Array, scale: float) -> Array:
    """Plain XLA scaled-dot-product attention.

    q: [B, H, Tq, D]; k, v: [B, H, Tk, D].  Softmax in fp32 (flash-attn and
    torch SDPA both accumulate softmax in fp32), output in v.dtype.
    XLA fuses the scale/softmax chain; the matmuls hit the MXU.
    """
    logits = jnp.einsum("bhtd,bhsd->bhts", q, k, preferred_element_type=jnp.float32)
    logits = logits.astype(jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhts,bhsd->bhtd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend probing should not fail
        return False


def _attn_spec(mesh, b: int, h: int) -> P | None:
    """shard_map PartitionSpec for [B, H, T, D] attention operands on the
    ambient mesh: batch over ``data``, heads over ``model`` (the qkv
    projection is column-parallel, so tensor parallelism shards heads).
    None when a dimension doesn't divide its axis — caller falls back to the
    XLA path, which the SPMD partitioner handles natively."""
    dp, tp = axis_size(mesh, "data"), axis_size(mesh, "model")
    if b % dp or h % tp:
        warn_kernel_fallback(
            ("attention", b, h, dp, tp),
            "attention: flash kernel requested but shape (B=%d, H=%d) does not "
            "divide the mesh (data=%d, model=%d) — using the XLA path, which "
            "GSPMD partitions", b, h, dp, tp,
        )
        return None
    return P("data" if dp > 1 else None, "model" if tp > 1 else None, None, None)


def attention(q: Array, k: Array, v: Array, scale: float, *, use_flash: bool = False) -> Array:
    """Non-causal multi-head attention with a custom softmax scale.

    ``use_flash`` (≙ reference config.flash_attn) selects the Pallas fused
    kernel on TPU; falls back to the XLA path elsewhere so the same config
    runs in CPU tests.  Under a multi-device mesh (parallel/spmd.py ambient
    context) the kernel is shard_mapped — Mosaic kernels cannot be
    partitioned by GSPMD — or skipped if the shape doesn't divide the mesh.
    """
    if use_flash and _on_tpu():
        from nvit_tpu.ops.flash_attention import flash_attention

        mesh = current_kernel_mesh()
        if mesh is None:
            return flash_attention(q, k, v, scale)
        spec = _attn_spec(mesh, q.shape[0], q.shape[1])
        if spec is not None:
            fn = functools.partial(flash_attention, scale=scale)
            return jax.shard_map(
                fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec, check_vma=False
            )(
                q, k, v
            )
    return sdpa_xla(q, k, v, scale)


def qknorm_project_xla(q: Array, k: Array, sqk_eff: Array, out_dtype) -> tuple[Array, Array]:
    """XLA reference of the nViT per-head Q/K projection: ``s ⊙ justnorm(x)``.

    ≙ reference model.py:108-112 with its exact rounding order: normalize in
    fp32, round back to the input dtype, multiply by the fp32 sqk vector,
    cast to the attention compute dtype."""
    from nvit_tpu.core.norms import justnorm

    h, d = sqk_eff.shape
    s_bc = sqk_eff.astype(jnp.float32).reshape(1, h, 1, d)
    q = (s_bc * justnorm(q).astype(jnp.float32)).astype(out_dtype)
    k = (s_bc * justnorm(k).astype(jnp.float32)).astype(out_dtype)
    return q, k


def attention_qknorm(
    q: Array, k: Array, v: Array, sqk_eff: Array, scale: float, *, use_flash: bool = False,
    bounded_softmax: str = "auto",
) -> Array:
    """nViT attention with the per-head hypersphere projection of Q/K.

    On the TPU flash path the projection is FUSED into the Pallas kernels
    (no separate [B,H,T,D] HBM round-trip — ≙ what flash-attn gives the
    reference adjacent to its kernel, model.py:108-116).  ``sqk_eff``:
    [H, D] fp32 effective scale (``sqk · init_value/init_scaling``).
    ``bounded_softmax``: "bounded" | "rowmax" | "auto" — the flash kernel's
    softmax-stabilizer strategy (flash_attention.py:_fwd_qknorm).
    """
    if use_flash and _on_tpu():
        from nvit_tpu.ops.flash_attention import flash_attention_qknorm

        mesh = current_kernel_mesh()
        if mesh is None:
            return flash_attention_qknorm(q, k, v, sqk_eff, scale, mode=bounded_softmax)
        spec = _attn_spec(mesh, q.shape[0], q.shape[1])
        if spec is not None:
            # sqk [H, D] shards with the heads; replicated over data — its
            # gradient is psum'd across data shards by shard_map's transpose
            s_spec = P(spec[1], None)
            fn = functools.partial(flash_attention_qknorm, scale=scale, mode=bounded_softmax)
            return jax.shard_map(
                fn, mesh=mesh, in_specs=(spec, spec, spec, s_spec), out_specs=spec,
                check_vma=False,
            )(q, k, v, sqk_eff)
    qh, kh = qknorm_project_xla(q, k, sqk_eff, v.dtype)
    return sdpa_xla(qh, kh, v, scale)
