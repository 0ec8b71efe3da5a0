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

from typing import Any

import jax
import optax

from nvit_tpu.configs.schema import OptimizerConfig
from nvit_tpu.models.schedules import cosine_lr


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
