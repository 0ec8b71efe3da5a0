"""Fused gated-MLP (matmul + u·SiLU(v)) Pallas kernel for TPU.

≙ reference model.py:148-155 (``c_fc`` → chunk(2) → ``u * silu(v)``) — but the
reference materializes the 8d-wide ``uv`` tensor in GPU memory between the
matmul and the gate; at the flagship shape that tensor is [32, 784, 6144]
bf16 ≈ 308 MB per block, round-tripped through HBM twice per forward
(matmul write + gate read) and again in the backward.  XLA cannot fuse it
away either: the gate reads two disjoint column halves of the matmul output,
which defeats output fusion, and the backward needs u/v again.

This kernel computes ``x @ [Wu | Wv]`` tile-by-tile in VMEM and applies the
gate in-register, writing ONLY the half-width result:

    fwd : reads x, Wu, Wv → writes u·silu(v)        (uv never touches HBM)
    bwd : recomputes the uv tile from (x, Wu, Wv) in VMEM and writes
          du = g·silu(v), dv = g·u·silu'(v) directly — the MXU recompute
          replaces an HBM round-trip, the right trade on a
          bandwidth-bound step (BASELINE.md: 169 GB/step vs 21.8 TFLOP).
          dWu/dWv/dx remain plain XLA matmuls over du/dv.

Accumulation and the gate run in fp32; inputs/outputs are the compute dtype
(bf16 policy).  Shapes that don't tile cleanly (tests, tiny configs) fall
back to the identical-semantics XLA path; numerics are asserted against it
in tests/test_gated_mlp.py (interpret mode) and scripts/tpu_flash_parity.py
(real Mosaic).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Mosaic kernels need a real TPU backend, so a flash_attn=True config still
# runs on CPU hosts/tests via the XLA fallback; tests monkeypatch this
# module's _on_tpu (like tests/test_flash_attention.py does for
# ops/attention.py) to force the kernel path under interpret mode.
from nvit_tpu.ops import tuning
from nvit_tpu.ops.attention import _on_tpu

# Tile caps come from ops/tuning.py, read at CALL time (module __getattr__
# re-reads the NVIT_TUNE_GATED_MLP_* env — ADVICE r4): forward keeps rows
# innermost in the grid so each W column-tile is fetched once and x streams;
# [512, 1024] fp32 gate intermediates keep VMEM ~= 14 MB.  Backward holds
# g + two outputs too — its row tile is half.
def _FWD_ROW(): return tuning.GATED_MLP_FWD_ROW
def _FWD_COL(): return tuning.GATED_MLP_FWD_COL
def _BWD_ROW(): return tuning.GATED_MLP_BWD_ROW
def _BWD_COL(): return tuning.GATED_MLP_BWD_COL


def _pick(total: int, cap: int, step: int = 128) -> int | None:
    """Largest divisor of ``total`` that is a multiple of ``step`` and ≤ cap.

    Columns ride the 128-wide lane dimension (step=128).  ROWS only need
    sublane alignment (step=16 covers bf16's 16 and fp32's 8), so batch
    sizes whose B·T has few factors of two still tile — e.g. nViT-L at
    B=12 has n = 12·784 = 9408 = 2^6·3·7², no 128-multiple divisor at all,
    but a 448-row tile divides it exactly (round-2's nViT-L numbers
    silently ran the XLA fallback because of the old 128-only search)."""
    for cand in range(cap, step - 1, -step):
        if total % cand == 0:
            return cand
    return None


def _silu(v32: Array) -> Array:
    return v32 * jax.nn.sigmoid(v32)


# ---------------------------------------------------------------- kernels
# One body per direction, parametrized by has_bias (STATIC: resolved at trace
# time, so the compiled Mosaic programs are identical to hand-split variants).
# Round 3's "fp32-accumulate dx" fix had to be hand-copied into the bias
# twins before this refactor — shared bodies make that class of divergence
# impossible.
def _uv_tiles(x, wu_ref, wv_ref, bias_refs):
    """fp32 u/v tiles (x @ W [+ b]) — the recompute shared by fwd and bwd."""
    u = jax.lax.dot_general(
        x, wu_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    v = jax.lax.dot_general(
        x, wv_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    if bias_refs is not None:
        bu_ref, bv_ref = bias_refs
        u = u + bu_ref[...].astype(jnp.float32)
        v = v + bv_ref[...].astype(jnp.float32)
    return u, v


def _fwd_kernel(*refs, has_bias: bool):
    x_ref, wu_ref, wv_ref, *rest = refs
    bias_refs = tuple(rest[:2]) if has_bias else None
    o_ref = rest[-1]
    u, v = _uv_tiles(x_ref[...], wu_ref, wv_ref, bias_refs)
    o_ref[...] = (u * _silu(v)).astype(o_ref.dtype)


def _bwd_kernel(*refs, has_bias: bool):
    x_ref, wu_ref, wv_ref, *rest = refs
    bias_refs = tuple(rest[:2]) if has_bias else None
    g_ref, du_ref, dv_ref = rest[-3:]
    u, v = _uv_tiles(x_ref[...], wu_ref, wv_ref, bias_refs)
    g = g_ref[...].astype(jnp.float32)
    sig = jax.nn.sigmoid(v)
    du_ref[...] = (g * v * sig).astype(du_ref.dtype)
    # d silu(v)/dv = sig·(1 + v·(1 − sig))
    dv_ref[...] = (g * u * sig * (1.0 + v * (1.0 - sig))).astype(dv_ref.dtype)


def _call(kernel, x2, wu, wv, bias, extra, *, row_cap, col_cap, n_out, extra_traffic):
    """Shared pallas_call builder for fwd (extra=(), n_out=1) and bwd
    (extra=(g,), n_out=2); bias tiles ride along when present."""
    n, k = x2.shape
    h = wu.shape[1]
    row, col = _pick(n, row_cap, 16), _pick(h, col_cap)
    grid = (h // col, n // row)  # rows innermost: W tile fetched once per col
    spec_x = pl.BlockSpec((row, k), lambda j, i: (i, 0), memory_space=pltpu.VMEM)
    spec_w = pl.BlockSpec((k, col), lambda j, i: (0, j), memory_space=pltpu.VMEM)
    spec_b = pl.BlockSpec((1, col), lambda j, i: (0, j), memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((row, col), lambda j, i: (i, j), memory_space=pltpu.VMEM)
    in_specs = [spec_x, spec_w, spec_w]
    args = [x2, wu, wv]
    if bias is not None:
        in_specs += [spec_b, spec_b]
        args += list(bias)
    in_specs += [spec_o] * len(extra)
    args += list(extra)
    out_shape = [jax.ShapeDtypeStruct((n, h), x2.dtype)] * n_out
    out = pl.pallas_call(
        functools.partial(kernel, has_bias=bias is not None),
        grid=grid,
        in_specs=in_specs,
        out_specs=[spec_o] * n_out if n_out > 1 else spec_o,
        out_shape=out_shape if n_out > 1 else out_shape[0],
        cost_estimate=pl.CostEstimate(
            flops=4 * n * k * h,
            bytes_accessed=(n * k + 2 * k * h + extra_traffic * n * h) * x2.dtype.itemsize,
            transcendentals=n * h,
        ),
    )(*args)
    return out


def _fwd(x2: Array, wu: Array, wv: Array, bias=None) -> Array:
    return _call(_fwd_kernel, x2, wu, wv, bias, (), row_cap=_FWD_ROW(),
                 col_cap=_FWD_COL(), n_out=1, extra_traffic=1)


def _bwd_duv(x2: Array, wu: Array, wv: Array, g: Array, bias=None) -> tuple[Array, Array]:
    return _call(_bwd_kernel, x2, wu, wv, bias, (g,), row_cap=_BWD_ROW(),
                 col_cap=_BWD_COL(), n_out=2, extra_traffic=3)


# ------------------------------------------------------------------ wrapper
def _dw_dx(x2, wu, wv, du, dv):
    """dWu/dWv/dx from the duv tiles — shared by both VJPs.  fp32 accumulate
    both dx matmuls AND their sum (matches the XLA path's fp32-accumulated
    single matmul; ADVICE r2 #1)."""
    dwu = jax.lax.dot_general(
        x2, du, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(wu.dtype)
    dwv = jax.lax.dot_general(
        x2, dv, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(wv.dtype)
    dx = jax.lax.dot_general(
        du, wu, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) + jax.lax.dot_general(
        dv, wv, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    return dx.astype(x2.dtype), dwu, dwv


@jax.custom_vjp
def _gated_core(x2: Array, wu: Array, wv: Array) -> Array:
    return _fwd(x2, wu, wv)


def _core_fwd(x2, wu, wv):
    return _fwd(x2, wu, wv), (x2, wu, wv)


def _core_bwd(saved, g):
    x2, wu, wv = saved
    du, dv = _bwd_duv(x2, wu, wv, g.astype(x2.dtype))
    return _dw_dx(x2, wu, wv, du, dv)


_gated_core.defvjp(_core_fwd, _core_bwd)


@jax.custom_vjp
def _gated_core_b(x2: Array, wu: Array, wv: Array, bu: Array, bv: Array) -> Array:
    return _fwd(x2, wu, wv, (bu, bv))


def _core_fwd_b(x2, wu, wv, bu, bv):
    return _fwd(x2, wu, wv, (bu, bv)), (x2, wu, wv, bu, bv)


def _core_bwd_b(saved, g):
    x2, wu, wv, bu, bv = saved
    du, dv = _bwd_duv(x2, wu, wv, g.astype(x2.dtype), (bu, bv))
    dx, dwu, dwv = _dw_dx(x2, wu, wv, du, dv)
    # db = column-sum of the half gradients (u = x@Wu + bu), fp32 accumulated
    dbu = jnp.sum(du.astype(jnp.float32), axis=0, keepdims=True).astype(bu.dtype)
    dbv = jnp.sum(dv.astype(jnp.float32), axis=0, keepdims=True).astype(bv.dtype)
    return dx, dwu, dwv, dbu, dbv


_gated_core_b.defvjp(_core_fwd_b, _core_bwd_b)


def _xla_gated(x: Array, w: Array, b: Array | None) -> Array:
    uv = x @ w
    if b is not None:
        uv = uv + b.astype(uv.dtype)
    u, v = jnp.split(uv, 2, axis=-1)
    return u * jax.nn.silu(v)


def _tileable(n: int, k: int, h: int) -> bool:
    return (
        k % 128 == 0
        and _pick(h, _FWD_COL()) is not None
        and _pick(h, _BWD_COL()) is not None
        and _pick(n, _FWD_ROW(), 16) is not None
        and _pick(n, _BWD_ROW(), 16) is not None
    )


# warn once PER SHAPE: a single global flag would let e.g. the hot MLP shape
# fall back silently after a small eval-path shape already warned — exactly
# the silent-fallback failure mode the warning exists to catch
_warned_shapes: set[tuple[int, int, int]] = set()


def gated_mlp(x: Array, w: Array, b: Array | None = None, *, use_kernel: bool = True) -> Array:
    """``u * silu(v)`` where ``[u | v] = x @ w (+ b)``; w is [K, 2H].

    ``x``/``w`` must already be in the compute dtype (the caller casts — same
    contract as core.layers.linear).  Dispatches to the fused Pallas kernel
    when running on a real TPU backend, the shapes tile cleanly, and
    ``use_kernel`` is set (the flash_attn knob gates all Pallas paths); the
    bias variant (≙ reference ``c_fc`` bias, model.py:59-61) folds ``b`` into
    the u/v tiles in VMEM and emits db as a column-sum, so the
    reference-default ``bias: true`` config also gets the fused path.  Falls
    back to the identical-semantics XLA chain otherwise — loudly, once, when
    the kernel was requested but the shapes don't tile (VERDICT r2 weak #4).

    Under a multi-device mesh (parallel/spmd.py ambient context) the kernel
    is shard_mapped over the ``data`` axis with the weights replicated —
    Mosaic kernels cannot be partitioned by GSPMD.  With a sharded ``model``
    axis the c_fc weight itself is column-sharded into contiguous u|v halves
    that land on different devices (parallel/mesh.py nuance), so tensor-
    parallel configs use the XLA chain, which the partitioner handles.
    """
    if use_kernel and _on_tpu():
        from jax.sharding import PartitionSpec as P

        from nvit_tpu.parallel.spmd import axis_size, current_kernel_mesh, warn_kernel_fallback

        mesh = current_kernel_mesh()
        if mesh is not None:
            tp, dp = axis_size(mesh, "model"), axis_size(mesh, "data")
            if tp > 1 or x.ndim < 2 or x.shape[0] % dp:
                warn_kernel_fallback(
                    ("gated_mlp_mesh", x.shape, dp, tp),
                    "gated_mlp: fused kernel requested but %s under the mesh "
                    "(data=%d, model=%d) — using the XLA chain, which GSPMD "
                    "partitions",
                    "the c_fc u|v column halves are split across the model axis"
                    if tp > 1 else f"rows {x.shape} do not divide the data axis",
                    dp, tp,
                )
                return _xla_gated(x, w, b)
            x_spec = P("data", *([None] * (x.ndim - 1)))
            w_spec = P(None, None)
            # per-shard re-dispatch (use_kernel, tiling) runs on LOCAL shapes;
            # the mesh context is irrelevant inside the already-manual region
            inner = functools.partial(_gated_dispatch, use_kernel=use_kernel)
            if b is None:
                return jax.shard_map(
                    lambda x_, w_: inner(x_, w_, None),
                    mesh=mesh, in_specs=(x_spec, w_spec), out_specs=x_spec,
                    check_vma=False,
                )(x, w)
            return jax.shard_map(
                inner, mesh=mesh, in_specs=(x_spec, w_spec, P(None)), out_specs=x_spec,
                check_vma=False,
            )(x, w, b)
    return _gated_dispatch(x, w, b, use_kernel=use_kernel)


def _gated_dispatch(x: Array, w: Array, b: Array | None, *, use_kernel: bool) -> Array:
    """Single-device kernel-vs-XLA dispatch (the shard_map body under SPMD)."""
    *lead, k = x.shape
    h = w.shape[1] // 2
    n = 1
    for d_ in lead:
        n *= d_
    if not use_kernel or not _tileable(n, k, h) or not _on_tpu():
        if use_kernel and _on_tpu() and not _tileable(n, k, h):
            if (n, k, h) not in _warned_shapes:
                _warned_shapes.add((n, k, h))
                import logging

                logging.getLogger("nvit_tpu").warning(
                    "gated_mlp: fused kernel requested but shape (n=%d, k=%d, h=%d) "
                    "does not tile (need k%%128==0, a ≤%d-col 128-multiple divisor "
                    "of h, and ≤%d-row 16-multiple divisors of n) — using the "
                    "XLA fallback", n, k, h, _FWD_COL(), _FWD_ROW(),
                )
        return _xla_gated(x, w, b)
    x2 = x.reshape(n, k)
    wu, wv = w[:, :h], w[:, h:]
    if b is None:
        out = _gated_core(x2, wu, wv)
    else:
        bu = b[:h].reshape(1, h).astype(x.dtype)
        bv = b[h:].reshape(1, h).astype(x.dtype)
        out = _gated_core_b(x2, wu, wv, bu, bv)
    return out.reshape(*lead, h)
