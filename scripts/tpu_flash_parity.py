"""Real-TPU (Mosaic, not interpret-mode) flash-attention parity assertions.

VERDICT round-1 #9: the Pallas kernels were verified only in interpret mode on
CPU; this script runs on the actual chip and asserts forward + gradient
agreement between the Pallas kernels and the XLA reference path at bf16
tolerances, for both the plain kernel and the fused QK-norm (nViT) variant,
at the flagship's shape (T=784, D=64).

Run inside the bench TPU session (single process!):
    python scripts/tpu_flash_parity.py
Prints one PASS line per check with the max abs error; exits nonzero on
failure.  Results are recorded in BASELINE.md.
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from nvit_tpu.ops.attention import qknorm_project_xla, sdpa_xla  # noqa: E402
from nvit_tpu.ops.flash_attention import flash_attention, flash_attention_qknorm  # noqa: E402
from nvit_tpu.ops.gated_mlp import _gated_core, _gated_core_b, _xla_gated  # noqa: E402
from nvit_tpu.utils import acquire_tpu_lock  # noqa: E402

# one TPU-touching process at a time: two deadlock on the single-chip
# claim (CLAUDE.md), so every on-chip entry point serializes here
_TPU_LOCK = acquire_tpu_lock()


B, H, T, D = 2, 12, 784, 64
SCALE = float(np.sqrt(D))  # the nViT scale — harder on the softmax than 1/sqrt(d)
checks: list[tuple[str, float, float]] = []


def record(name: str, got, want, tol: float):
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(want.astype(jnp.float32)))) or 1.0
    rel = err / scale
    ok = rel < tol
    checks.append((name, rel, tol))
    print(f"{'PASS' if ok else 'FAIL'} {name}: max_rel_err={rel:.3e} (tol {tol:.1e})", flush=True)
    return ok


def main() -> int:
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    q = jax.random.normal(ks[0], (B, H, T, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, T, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, T, D), jnp.bfloat16)
    sqk = (1.0 + 0.1 * jax.random.normal(ks[3], (H, D))).astype(jnp.float32)
    g = jax.random.normal(ks[4], (B, H, T, D), jnp.float32)

    ok = True

    # ---- plain kernel: fwd + grads ----
    out_f = jax.jit(lambda q, k, v: flash_attention(q, k, v, SCALE))(q, k, v)
    out_x = jax.jit(lambda q, k, v: sdpa_xla(q, k, v, SCALE))(q, k, v)
    ok &= record("flash_fwd_bf16", out_f, out_x, 2e-2)

    def loss_f(q, k, v):
        return jnp.sum(flash_attention(q, k, v, SCALE).astype(jnp.float32) * g)

    def loss_x(q, k, v):
        return jnp.sum(sdpa_xla(q, k, v, SCALE).astype(jnp.float32) * g)

    gf = jax.jit(jax.grad(loss_f, argnums=(0, 1, 2)))(q, k, v)
    gx = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2)))(q, k, v)
    for name, a, b in zip("qkv", gf, gx):
        ok &= record(f"flash_grad_d{name}_bf16", a, b, 3e-2)

    # ---- fused QK-norm kernel: fwd + grads incl. dsqk ----
    def ref_qkn(q, k, v, s):
        qh, kh = qknorm_project_xla(q, k, s, v.dtype)
        return sdpa_xla(qh, kh, v, SCALE)

    out_f = jax.jit(lambda q, k, v, s: flash_attention_qknorm(q, k, v, s, SCALE))(q, k, v, sqk)
    out_x = out_qkn_ref = jax.jit(ref_qkn)(q, k, v, sqk)
    ok &= record("qknorm_fwd_bf16", out_f, out_x, 2e-2)

    def loss_fq(q, k, v, s):
        return jnp.sum(flash_attention_qknorm(q, k, v, s, SCALE).astype(jnp.float32) * g)

    def loss_xq(q, k, v, s):
        return jnp.sum(ref_qkn(q, k, v, s).astype(jnp.float32) * g)

    gf = jax.jit(jax.grad(loss_fq, argnums=(0, 1, 2, 3)))(q, k, v, sqk)
    gx = jax.jit(jax.grad(loss_xq, argnums=(0, 1, 2, 3)))(q, k, v, sqk)
    for name, a, b in zip(("q", "k", "v", "sqk"), gf, gx):
        ok &= record(f"qknorm_grad_d{name}_bf16", a, b, 3e-2)

    # ---- fused gated-MLP kernel: fwd + grads (flagship MLP shape) ----
    n, kdim, hdim = 1024, 768, 3072
    x = jax.random.normal(ks[5], (n, kdim), jnp.bfloat16)
    kw1, kw2 = jax.random.split(jax.random.PRNGKey(7))
    wu = (0.05 * jax.random.normal(kw1, (kdim, hdim))).astype(jnp.bfloat16)
    wv = (0.05 * jax.random.normal(kw2, (kdim, hdim))).astype(jnp.bfloat16)
    gm = jax.random.normal(jax.random.PRNGKey(8), (n, hdim), jnp.float32)

    out_f = jax.jit(_gated_core)(x, wu, wv)
    out_x = jax.jit(lambda x, wu, wv: _xla_gated(x, jnp.concatenate([wu, wv], 1), None))(x, wu, wv)
    ok &= record("gated_mlp_fwd_bf16", out_f, out_x, 2e-2)

    def loss_gm_f(x, wu, wv):
        return jnp.sum(_gated_core(x, wu, wv).astype(jnp.float32) * gm)

    def loss_gm_x(x, wu, wv):
        return jnp.sum(
            _xla_gated(x, jnp.concatenate([wu, wv], 1), None).astype(jnp.float32) * gm
        )

    gf = jax.jit(jax.grad(loss_gm_f, argnums=(0, 1, 2)))(x, wu, wv)
    gx = jax.jit(jax.grad(loss_gm_x, argnums=(0, 1, 2)))(x, wu, wv)
    for name, a, b in zip(("x", "wu", "wv"), gf, gx):
        ok &= record(f"gated_mlp_grad_d{name}_bf16", a, b, 3e-2)

    # ---- fused gated-MLP BIAS variant (reference-default bias=true config) ----
    bias = (0.1 * jax.random.normal(jax.random.PRNGKey(9), (2 * hdim,))).astype(jnp.float32)
    bu = bias[:hdim].reshape(1, hdim).astype(jnp.bfloat16)
    bv = bias[hdim:].reshape(1, hdim).astype(jnp.bfloat16)

    out_f = jax.jit(_gated_core_b)(x, wu, wv, bu, bv)
    out_x = jax.jit(
        lambda x, wu, wv: _xla_gated(
            x, jnp.concatenate([wu, wv], 1), jnp.concatenate([bu[0], bv[0]])
        )
    )(x, wu, wv)
    ok &= record("gated_mlp_bias_fwd_bf16", out_f, out_x, 2e-2)

    def loss_gmb_f(x, wu, wv, bu, bv):
        return jnp.sum(_gated_core_b(x, wu, wv, bu, bv).astype(jnp.float32) * gm)

    def loss_gmb_x(x, wu, wv, bu, bv):
        return jnp.sum(
            _xla_gated(
                x, jnp.concatenate([wu, wv], 1), jnp.concatenate([bu[0], bv[0]])
            ).astype(jnp.float32) * gm
        )

    gf = jax.jit(jax.grad(loss_gmb_f, argnums=(0, 1, 2, 3, 4)))(x, wu, wv, bu, bv)
    gx = jax.jit(jax.grad(loss_gmb_x, argnums=(0, 1, 2, 3, 4)))(x, wu, wv, bu, bv)
    for name, a, b in zip(("x", "wu", "wv", "bu", "bv"), gf, gx):
        ok &= record(f"gated_mlp_bias_grad_d{name}_bf16", a, b, 3e-2)

    # ---- static bounded-softmax modes of the QK-norm kernel ----
    for mode in ("bounded", "rowmax"):
        out_m = jax.jit(
            lambda q, k, v, s, _m=mode: flash_attention_qknorm(q, k, v, s, SCALE, mode=_m)
        )(q, k, v, sqk)
        ok &= record(f"qknorm_fwd_{mode}_bf16", out_m, out_qkn_ref, 2e-2)

    print(("ALL_PASS" if ok else "SOME_FAILED") + f" ({len(checks)} checks)", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
