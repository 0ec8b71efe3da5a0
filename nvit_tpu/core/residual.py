"""Residual-update primitives for the nViT hypersphere geometry.

* ``slerp_residual`` — the nGPT-style spherical-LERP residual with a learnable
  per-channel eigen learning rate (≙ reference nvit/model.py:134-142, 159-167,
  265-273).
* ``norm_skip`` — the outer normalized skip connection applied by the ViT loop
  around every block (≙ model.py:84-87, 450-452).

Both carry a hand-written custom VJP (CLAUDE.md roadmap #2): the autodiff
backward of the ``justnorm → lerp → justnorm`` chain materializes every
intermediate (a, b, res, three norms) as saved residuals and replays them as
separate HBM-bound elementwise kernels.  The analytic backward saves only the
primal INPUTS — which are live anyway as block inputs/outputs — and computes
all gradients in one fused fp32 pass:

    out = N(res),  res = a + lr·(b−a),  a = N(h),  b = N(h_up),  lr = |α·c|
    dres = (g − out·(out⊙g))/‖res‖            (justnorm VJP)
    da   = dres·(1−lr)        db = dres·lr
    dα   = c·sign(α·c)·Σ_rows dres⊙(b−a)
    dh   = (da − a·(a⊙da))/‖h‖                (justnorm VJP)
    dh_up= (db − b·(b⊙db))/‖h_up‖

The recompute mimics the forward's dtype chain (norms in fp32, intermediate
values rounded to the input dtype) so values match the composed primitives
bit-for-bit and gradients match autodiff to rounding error (tests/test_core.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array

from nvit_tpu.core.norms import justnorm


def _norm32(x32: Array) -> Array:
    return jnp.sqrt(jnp.sum(x32 * x32, axis=-1, keepdims=True))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def slerp_residual(h: Array, h_update: Array, alpha: Array, alpha_init_value: float, alpha_init_scaling: float) -> Array:
    """``norm(norm(h) + |lr|·(norm(h_update) − norm(h)))``.

    ``lr = |alpha · (init_value / init_scaling)|`` is per-channel and fp32
    (≙ model.py:135-142).  The abs() keeps the interpolation direction stable.
    """
    out, _ = _slerp_fwd(h, h_update, alpha, alpha_init_value, alpha_init_scaling)
    return out


def _slerp_fwd(h, h_update, alpha, alpha_init_value, alpha_init_scaling):
    lr = jnp.abs(alpha.astype(jnp.float32) * (alpha_init_value / alpha_init_scaling))
    a = justnorm(h)
    b = justnorm(h_update)
    res = a + lr.astype(a.dtype) * (b - a)
    return justnorm(res), (h, h_update, alpha)


def _slerp_bwd(alpha_init_value, alpha_init_scaling, saved, g):
    h, h_update, alpha = saved
    c = alpha_init_value / alpha_init_scaling
    ac = alpha.astype(jnp.float32) * c
    lr = jnp.abs(ac)

    # recompute the forward chain with the SAME dtype rounding as the primal
    a = justnorm(h)
    b = justnorm(h_update)
    res = a + lr.astype(a.dtype) * (b - a)

    g32 = g.astype(jnp.float32)
    a32 = a.astype(jnp.float32)
    b32 = b.astype(jnp.float32)
    res32 = res.astype(jnp.float32)
    n_res = _norm32(res32)
    out32 = res32 / n_res

    dres = (g32 - out32 * jnp.sum(out32 * g32, axis=-1, keepdims=True)) / n_res
    da = dres * (1.0 - lr)
    db = dres * lr
    d_lr = jnp.sum(
        (dres * (b32 - a32)).reshape(-1, alpha.shape[-1]), axis=0
    )  # [D]
    d_alpha = (d_lr * c * jnp.sign(ac)).astype(alpha.dtype)

    h32 = h.astype(jnp.float32)
    hu32 = h_update.astype(jnp.float32)
    n_h = _norm32(h32)
    n_hu = _norm32(hu32)
    dh = (da - a32 * jnp.sum(a32 * da, axis=-1, keepdims=True)) / n_h
    dhu = (db - b32 * jnp.sum(b32 * db, axis=-1, keepdims=True)) / n_hu
    return dh.astype(h.dtype), dhu.astype(h_update.dtype), d_alpha


slerp_residual.defvjp(_slerp_fwd, _slerp_bwd)


@jax.custom_vjp
def norm_skip(h_new: Array, h: Array, skip_param: Array) -> Array:
    """``norm(h_new · skip_param + h)`` (≙ model.py:84-87).

    Applied by the ViT forward around each transformer block in BOTH baseline
    and nViT modes (model.py:450-452), giving blocks a double residual — we
    keep that behavior for parity.
    """
    out, _ = _norm_skip_fwd(h_new, h, skip_param)
    return out


def _norm_skip_fwd(h_new, h, skip_param):
    res = h_new * skip_param.astype(h_new.dtype) + h
    return justnorm(res), (h_new, h, skip_param)


def _norm_skip_bwd(saved, g):
    h_new, h, skip_param = saved
    res = h_new * skip_param.astype(h_new.dtype) + h

    g32 = g.astype(jnp.float32)
    res32 = res.astype(jnp.float32)
    n_res = _norm32(res32)
    out32 = res32 / n_res
    dres = (g32 - out32 * jnp.sum(out32 * g32, axis=-1, keepdims=True)) / n_res

    hn32 = h_new.astype(jnp.float32)
    d_skip = jnp.sum(dres * hn32).reshape(skip_param.shape).astype(skip_param.dtype)
    d_hnew = (dres * skip_param.astype(jnp.float32)).astype(h_new.dtype)
    return d_hnew, dres.astype(h.dtype), d_skip


norm_skip.defvjp(_norm_skip_fwd, _norm_skip_bwd)
