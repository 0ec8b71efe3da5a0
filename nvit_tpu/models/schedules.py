"""Learning-rate schedules: optimizer cosine-with-warmup and the Kohonen
warmup→cosine-decay schedule.

Both are implemented as jit-traceable functions of the (traced) step so the
whole train step — including LR computation — compiles into one XLA program
(the reference computes LR host-side each iteration and pokes it into the
optimizer param groups, train.py:873-876).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from nvit_tpu.configs.schema import OptimizerConfig, ViTConfig


def cosine_lr(opt: OptimizerConfig, step: Array | int) -> Array:
    """Warmup → cosine decay → min_lr (≙ reference train.py:1025-1035).

    Honors ``decay_lr=False`` by returning the constant base LR
    (≙ train.py:874).
    """
    step = jnp.asarray(step, dtype=jnp.float32)
    base, mn = opt.learning_rate, opt.min_lr
    if not opt.decay_lr:
        return jnp.full_like(step, base)
    warm = float(opt.warmup_iters)
    decay = float(opt.lr_decay_iters)
    warmup_lr = base * step / jnp.maximum(warm, 1.0)
    ratio = jnp.clip((step - warm) / jnp.maximum(decay - warm, 1.0), 0.0, 1.0)
    coeff = 0.5 * (1.0 + jnp.cos(jnp.pi * ratio))
    cos_lr = mn + coeff * (base - mn)
    lr = jnp.where(step < warm, warmup_lr, jnp.where(step > decay, mn, cos_lr))
    return lr


def kohonen_lr(cfg: ViTConfig, step: Array | int) -> Array:
    """Kohonen map LR: linear warmup (from min_lr) → cosine decay → min_lr.

    ≙ reference model.py:563-581.  With the scheduler disabled returns the
    constant ``kohonen_alpha``.
    """
    step = jnp.asarray(step, dtype=jnp.float32)
    if not cfg.kohonen_scheduler_enabled:
        return jnp.full_like(step, cfg.kohonen_alpha)
    warm = float(cfg.kohonen_scheduler_warmup_steps)
    decay = float(cfg.kohonen_scheduler_decay_steps)
    mn = cfg.kohonen_scheduler_min_lr
    mx = cfg.kohonen_alpha
    warmup_lr = mn + (mx - mn) * (step / jnp.maximum(warm, 1.0))
    ratio = jnp.clip((step - warm) / jnp.maximum(decay - warm, 1.0), 0.0, 1.0)
    coeff = 0.5 * (1.0 + jnp.cos(jnp.pi * ratio))
    cos_lr = mn + coeff * (mx - mn)
    lr = jnp.where(step < warm, warmup_lr, jnp.where(step > decay, mn, cos_lr))
    return lr
