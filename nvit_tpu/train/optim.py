"""Optimizer construction: AdamW with parameter groups + global-norm clipping.

≙ reference model.py:369-385 (``configure_optimizers``) and train.py:935-938
(scaler-aware grad clip):

* decay group: parameters with ndim ≥ 2 get ``weight_decay``;
* no-decay group: ndim < 2 (biases, norms, the learned scale vectors, and
  ``sz`` — the reference lists sz as its own no-decay group, model.py:373-377,
  which is behaviorally identical to the ndim<2 rule since sz is 1-D);
* global-norm gradient clipping when ``grad_clip != 0`` (train.py:935-938);
* cosine LR schedule with warmup injected as an optax schedule so the whole
  update — including the LR computation — lives inside the jitted step
  (the reference pokes LR into param groups host-side, train.py:873-876).

The reference's CUDA "fused AdamW" becomes simply optax.adamw under jit: XLA
fuses the elementwise update chain across the whole parameter tree.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax import Array

from nvit_tpu.configs.schema import OptimizerConfig
from nvit_tpu.models.schedules import cosine_lr
from nvit_tpu.ops.renorm import RENORM_AXES


def decay_mask(params: Any) -> Any:
    """True for leaves that receive weight decay (ndim ≥ 2)."""
    return jax.tree_util.tree_map(lambda p: p.ndim >= 2, params)


def make_optimizer(opt_cfg: OptimizerConfig) -> optax.GradientTransformation:
    schedule = lambda step: cosine_lr(opt_cfg, step)  # noqa: E731
    parts = []
    if opt_cfg.grad_clip:
        parts.append(optax.clip_by_global_norm(opt_cfg.grad_clip))
    parts.append(
        optax.adamw(
            learning_rate=schedule,
            b1=opt_cfg.beta1,
            b2=opt_cfg.beta2,
            eps=1e-8,
            weight_decay=opt_cfg.weight_decay,
            mask=decay_mask,
        )
    )
    return optax.chain(*parts)


# ------------------------------------------------------- fused update sweep
# One pass over every parameter leaf computing clip-scale → AdamW moments →
# bias correction → decayed update → apply → (nViT) hypersphere renorm, per
# leaf, in a single fused elementwise chain.  The optax chain + separate
# renorm_params sweep reads/writes the large weights in several passes
# (measured 12 ms + 8 ms on nViT-B/16); this brings the traffic down to the
# irreducible read(g, m, v, p) + write(m, v, p).  ≙ reference CUDA fused
# AdamW (model.py:384) + per-step normalize_matrices (train.py:461-480).
#
# Semantics are verified EQUAL to optax.chain(clip_by_global_norm, adamw) +
# renorm_params in tests/test_train_step.py.
_ADAM_EPS = 1e-8


class FusedAdamWState(NamedTuple):
    count: Array  # int32, number of updates applied so far
    mu: Any
    nu: Any


def init_fused_adamw(params: Any) -> FusedAdamWState:
    zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)  # noqa: E731
    return FusedAdamWState(count=jnp.zeros((), jnp.int32), mu=zeros(), nu=zeros())


def _renorm_axis_of(path) -> int | None:
    """Renorm axis for a param leaf, from its tree path: only the transformer
    Block matrices ``blocks[i].<name>.w`` are renormalized (ops/renorm.py)."""
    keys = [k.key if hasattr(k, "key") else k.idx for k in path]
    if (
        len(keys) == 4
        and keys[0] == "blocks"
        and keys[2] in RENORM_AXES
        and keys[3] == "w"
    ):
        return RENORM_AXES[keys[2]]
    return None


def fused_adamw_renorm_update(
    opt_cfg: OptimizerConfig,
    params: Any,
    grads: Any,
    state: FusedAdamWState,
    *,
    renorm: bool,
) -> tuple[Any, FusedAdamWState]:
    """Apply one fused AdamW(+renorm) step: returns (new_params, new_state)."""
    b1, b2, wd = opt_cfg.beta1, opt_cfg.beta2, opt_cfg.weight_decay

    gscale = None
    if opt_cfg.grad_clip:
        leaves = [
            jnp.sum(jnp.square(g.astype(jnp.float32)))
            for g in jax.tree_util.tree_leaves(grads)
        ]
        gnorm = jnp.sqrt(sum(leaves))
        clip = jnp.float32(opt_cfg.grad_clip)
        gscale = jnp.where(gnorm < clip, jnp.float32(1.0), clip / gnorm)

    lr = cosine_lr(opt_cfg, state.count)  # optax schedules see the 0-based count
    t = (state.count + 1).astype(jnp.float32)
    bc1 = 1.0 - jnp.power(jnp.float32(b1), t)
    bc2 = 1.0 - jnp.power(jnp.float32(b2), t)

    def leaf(path, p, g, m, v):
        if gscale is not None:
            g = g * gscale.astype(g.dtype)
        m = b1 * m + (1.0 - b1) * g
        v = b2 * v + (1.0 - b2) * jnp.square(g)
        upd = (m / bc1) / (jnp.sqrt(v / bc2) + _ADAM_EPS)
        if p.ndim >= 2:  # decay mask (≙ configure_optimizers groups)
            upd = upd + wd * p
        new_p = p - lr.astype(p.dtype) * upd
        axis = _renorm_axis_of(path) if renorm else None
        if axis is not None:
            p32 = new_p.astype(jnp.float32)
            norm = jnp.sqrt(jnp.sum(p32 * p32, axis=axis, keepdims=True))
            new_p = (p32 / norm).astype(new_p.dtype)
        return new_p, m, v

    fused = jax.tree_util.tree_map_with_path(leaf, params, grads, state.mu, state.nu)
    is_triple = lambda x: isinstance(x, tuple) and len(x) == 3 and not isinstance(x[0], tuple)  # noqa: E731
    pick = lambda i: jax.tree_util.tree_map(lambda t_: t_[i], fused, is_leaf=is_triple)  # noqa: E731
    return pick(0), FusedAdamWState(count=state.count + 1, mu=pick(1), nu=pick(2))
