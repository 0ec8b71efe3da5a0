"""MXU/VPU overlap experiment: q-sub-tiled fused QK-norm attention backward.

BASELINE.md's roofline derivation shows the step sits at traffic-floor +
SERIAL attention-VPU time: within each fused-backward program the chain
s(MXU) -> exp(VPU) -> dp(MXU) -> ds(VPU) -> 3 matmuls(MXU) is one dependency
chain, so the ~9 ms/step of backward attention MXU work cannot overlap the
~27 ms of VPU work.  This experiment restructures the kernel body into
independent q-sub-tiles (statically unrolled, 16-row-aligned splits of
T=784: [400,384] or 7x112) so Mosaic's instruction scheduler CAN interleave
sub-tile i's exp with sub-tile i+1's score matmul — if the hardware/compiler
co-issues, the full-step upside is ~4-6%.

Op-level A/B at the flagship shape ([B*H, T, D] = [384, 784, 64] bf16, one
layer's worth per call).  Run on the real TPU (single process!):
    nohup python scripts/attn_bwd_split_bench.py > /tmp/attn_split.log 2>&1 &
    echo $! > /tmp/tpu.pid
"""

from __future__ import annotations

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from nvit_tpu.utils import acquire_tpu_lock  # noqa: E402

# one TPU-touching process at a time: two deadlock on the single-chip claim
# (CLAUDE.md chip-lock protocol), so every on-chip entry point serializes here
_TPU_LOCK = acquire_tpu_lock()

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

import importlib  # noqa: E402

# nvit_tpu.ops re-exports the flash_attention FUNCTION, which shadows the
# submodule on ``import ... as`` attribute lookup — resolve explicitly
fa = importlib.import_module("nvit_tpu.ops.flash_attention")

BH, T, D = 384, 784, 64
SCALE = 8.0  # sqrt(64)
WARMUP, ITERS = 2, 30


def _split_bounds(t: int, nsplit: int) -> list[tuple[int, int]]:
    """nsplit 16-aligned row ranges covering [0, t)."""
    step = ((t // nsplit) // 16) * 16
    bounds, a = [], 0
    for i in range(nsplit - 1):
        bounds.append((a, a + step))
        a += step
    bounds.append((a, t))
    return bounds


def _bwd_split_kernel(q_ref, k_ref, v_ref, s_ref, do_ref, lse_ref, o_ref,
                      dq_ref, dk_ref, dv_ref, ds_ref, *, scale, nsplit):
    """fa._bwd_fused_qknorm_kernel restructured into independent q-sub-tiles.

    Same math (multiply ordering matches the forward exactly, as in the
    integrated kernel); dv/dk-hat accumulate in fp32 across sub-tiles.
    No padding masks: the experiment runs at t_actual == t_pad.
    """
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    s_vec = s_ref[0]
    t_pad = q.shape[0]

    qhat32, qn, qnorm = fa._normed_scaled(q, s_vec)
    khat32, kn, knorm = fa._normed_scaled(k, s_vec)
    qhat_s = ((s_vec * scale) * qn).astype(v.dtype)
    khat = khat32.astype(v.dtype)
    khat_s = ((s_vec * scale) * kn).astype(v.dtype)

    dv_acc = jnp.zeros((t_pad, v.shape[1]), jnp.float32)
    dkhat_acc = jnp.zeros((t_pad, v.shape[1]), jnp.float32)
    dqhat_parts = []
    for a, b in _split_bounds(t_pad, nsplit):
        qh = qhat_s[a:b]
        doh = do[a:b]
        delta = jnp.sum(
            doh.astype(jnp.float32) * o_ref[0][a:b].astype(jnp.float32),
            axis=-1, keepdims=True,
        )
        s = jax.lax.dot_general(
            qh, khat, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        p = jnp.exp(s - lse_ref[0][a:b])
        dp = jax.lax.dot_general(
            doh, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        pb = p.astype(do.dtype)
        dsb = ds.astype(q.dtype)
        dv_acc = dv_acc + jax.lax.dot_general(
            pb, doh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dkhat_acc = dkhat_acc + jax.lax.dot_general(
            dsb, qh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dqhat_parts.append(jax.lax.dot_general(
            dsb, khat_s, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ))

    dqhat = jnp.concatenate(dqhat_parts, axis=0) if len(dqhat_parts) > 1 else dqhat_parts[0]
    dv_ref[0] = dv_acc.astype(dv_ref.dtype)
    ds_ref[0] = jnp.sum(dqhat * qn + dkhat_acc * kn, axis=0, keepdims=True)
    dqn = s_vec * dqhat
    dq_ref[0] = ((dqn - qn * jnp.sum(qn * dqn, axis=-1, keepdims=True)) / qnorm).astype(dq_ref.dtype)
    dkn = s_vec * dkhat_acc
    dk_ref[0] = ((dkn - kn * jnp.sum(kn * dkn, axis=-1, keepdims=True)) / knorm).astype(dk_ref.dtype)


def bwd_split(nsplit, q3, k3, v3, s3, g, lse, o3):
    bh, t_pad, d = q3.shape
    full = pl.BlockSpec((1, t_pad, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    stat = pl.BlockSpec((1, t_pad, 1), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    svec = pl.BlockSpec((1, 1, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_split_kernel, scale=SCALE, nsplit=nsplit),
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


def time_fn(tag, fn, *args):
    jitted = jax.jit(fn)
    for _ in range(WARMUP):
        outs = jitted(*args)
        chk = float(jnp.sum(outs[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        outs = jitted(*args)
    chk = float(jnp.sum(outs[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{tag:28s} {dt:8.3f} ms   (chk {chk:.5e})", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    q3 = jax.device_put(jax.random.normal(ks[0], (BH, T, D), jnp.bfloat16))
    k3 = jax.device_put(jax.random.normal(ks[1], (BH, T, D), jnp.bfloat16))
    v3 = jax.device_put(jax.random.normal(ks[2], (BH, T, D), jnp.bfloat16) * 0.3)
    s3 = jax.device_put(jnp.broadcast_to(
        1.0 + 0.02 * jax.random.normal(ks[3], (1, 1, D), jnp.float32), (BH, 1, D)
    ).copy())
    g = jax.device_put(jax.random.normal(ks[4], (BH, T, D), jnp.bfloat16) * 0.1)

    # forward once (bounded mode, the shipped default) for o/lse residuals
    o3, lse = jax.jit(
        lambda *a: fa._fwd_qknorm(*a, SCALE, T, "bounded")
    )(q3, k3, v3, s3)
    o3, lse = jax.device_put(o3), jax.device_put(lse)
    float(jnp.sum(lse))

    static = (SCALE, T, "bounded")
    res = (q3, k3, v3, s3, o3, lse)
    base = jax.jit(lambda gg: fa._bwd_qknorm(static, res, gg))
    ref = base(g)

    for nsplit in (2, 7):
        outs = jax.jit(lambda gg, n=nsplit: bwd_split(n, q3, k3, v3, s3, gg, lse, o3))(g)
        for name, a, b in zip(("dq", "dk", "dv", "dsqk"), ref, outs):
            a32, b32 = a.astype(jnp.float32), b.astype(jnp.float32)
            err = float(jnp.max(jnp.abs(a32 - b32)) / (jnp.max(jnp.abs(a32)) + 1e-9))
            print(f"nsplit={nsplit} {name}: max_rel_err={err:.3e}", flush=True)
            assert err < 3e-2, (nsplit, name, err)

    time_fn("integrated (nsplit=1)", lambda gg: fa._bwd_qknorm(static, res, gg), g)
    for nsplit in (2, 7):
        time_fn(f"split nsplit={nsplit}",
                lambda gg, n=nsplit: bwd_split(n, q3, k3, v3, s3, gg, lse, o3), g)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
