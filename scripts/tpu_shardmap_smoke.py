"""Real-chip smoke of Mosaic kernels under jax.shard_map manual lowering.

The SPMD dispatch (nvit_tpu/parallel/spmd.py) wraps the Pallas kernels in
shard_map whenever the step is jitted over a multi-device mesh — the path a
v5p-8 run takes.  Multi-chip hardware is not reachable from this container,
but the MANUAL-AXES lowering itself (SPMDAxisContext with all axes manual →
tpu_custom_call, jax _src/tpu_custom_call.py:339-346) can be exercised on one
chip: a 1-element mesh with the batch dim mapped runs the same code path the
8-chip mesh does, minus the collectives.

Checks (real Mosaic, not interpret):
  1. flash_attention under shard_map(P('data',...)) == direct kernel call
  2. flash_attention_qknorm fwd + all four grads under shard_map == direct
  3. gated_mlp (bias) under shard_map == direct

Interpret-mode multi-device parity (dp8 / dp4×tp2, CPU) lives in
tests/spmd_checks.py; this script is the hardware-lowering complement.
"""

import math
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

sys.path.insert(0, "/root/repo")

from nvit_tpu.ops.flash_attention import flash_attention, flash_attention_qknorm
from nvit_tpu.ops.gated_mlp import _gated_dispatch
from nvit_tpu.utils import acquire_tpu_lock  # noqa: E402

# one TPU-touching process at a time: two deadlock on the single-chip
# claim (CLAUDE.md), so every on-chip entry point serializes here
_TPU_LOCK = acquire_tpu_lock()


FAILURES = []


def check(name, a, b, tol=2e-2):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    denom = np.maximum(np.abs(b), 1e-3)
    err = float(np.max(np.abs(a - b) / denom))
    status = "PASS" if err <= tol else "FAIL"
    if err > tol:
        FAILURES.append(name)
    print(f"{status} {name}: max_rel_err={err:.3e} (tol {tol:.1e})", flush=True)


def main():
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    spec = P("data", None, None, None)
    b, h, t, d = 8, 4, 288, 64
    dtype = jnp.bfloat16
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (b, h, t, d), dtype)
    k = jax.random.normal(ks[1], (b, h, t, d), dtype)
    v = jax.random.normal(ks[2], (b, h, t, d), dtype)
    sqk = 1.0 + 0.05 * jax.random.normal(ks[3], (h, d), jnp.float32)
    scale = math.sqrt(d)

    # 1. plain flash under shard_map
    fn = lambda q_, k_, v_: flash_attention(q_, k_, v_, 1.0 / scale)  # noqa: E731
    sm = jax.jit(jax.shard_map(fn, mesh=mesh, in_specs=(spec,) * 3, out_specs=spec,
                               check_vma=False))
    check("shardmap_flash_fwd", sm(q, k, v), jax.jit(fn)(q, k, v))

    # 2. qknorm fwd + grads
    def loss(q_, k_, v_, s_):
        o = flash_attention_qknorm(q_, k_, v_, s_, scale, mode="bounded")
        return jnp.sum(jnp.square(o.astype(jnp.float32)))

    s_spec = P(None, None)
    loss_sm = jax.shard_map(loss, mesh=mesh, in_specs=(spec, spec, spec, s_spec),
                            out_specs=P(), check_vma=False)
    g_sm = jax.jit(jax.value_and_grad(loss_sm, argnums=(0, 1, 2, 3)))(q, k, v, sqk)
    g_ref = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3)))(q, k, v, sqk)
    check("shardmap_qknorm_loss", g_sm[0], g_ref[0])
    for name, a_, b_ in zip(("dq", "dk", "dv", "dsqk"), g_sm[1], g_ref[1]):
        check(f"shardmap_qknorm_{name}", a_, b_)

    # 3. gated MLP (bias kernel) under shard_map
    kx, kw, kb = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(kx, (8, 96, 256), dtype)
    w = (0.1 * jax.random.normal(kw, (256, 1024), jnp.float32)).astype(dtype)
    bias = (0.1 * jax.random.normal(kb, (1024,), jnp.float32)).astype(dtype)
    mfn = lambda x_, w_, b_: _gated_dispatch(x_, w_, b_, use_kernel=True)  # noqa: E731
    msm = jax.jit(jax.shard_map(
        mfn, mesh=mesh, in_specs=(P("data", None, None), P(None, None), P(None)),
        out_specs=P("data", None, None), check_vma=False))
    check("shardmap_gated_mlp_bias", msm(x, w, bias), jax.jit(mfn)(x, w, bias))

    if FAILURES:
        print(f"FAILED: {FAILURES}")
        sys.exit(1)
    print("ALL_PASS (shard_map mosaic lowering)")


if __name__ == "__main__":
    main()
