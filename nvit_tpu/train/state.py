"""TrainState: the single pytree carried through the jitted train step.

≙ the reference Trainer's scattered mutable state (model params, optimizer
state, ``iter_num``, RNG, SOM codebooks mutated in-place): all of it becomes
one explicit, checkpointable pytree (SURVEY.md §7 translation #1).  The SOM
nodes live inside ``params`` (they receive gradients, like the reference's
nn.Parameter) and additionally get the Hebbian delta applied in-step.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from nvit_tpu.configs.schema import Config
from nvit_tpu.models.vit import init_vit
from nvit_tpu.train.optim import init_fused_adamw


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: Array  # int32 scalar — ≙ Trainer.iter_num / model.step
    rng: Array  # PRNGKey threaded through augmentation etc.


def create_train_state(cfg: Config, seed: int | None = None) -> TrainState:
    seed = cfg.training.seed if seed is None else seed
    key = jax.random.PRNGKey(seed)
    pkey, rng = jax.random.split(key)
    params = init_vit(pkey, cfg.model)
    opt_state = init_fused_adamw(params, cfg.optimizer.moments_dtype)
    return TrainState(
        params=params,
        opt_state=opt_state,
        step=jnp.zeros((), dtype=jnp.int32),
        rng=rng,
    )


def compute_dtype_of(cfg: Config):
    """bf16 policy (≙ reference AMP): params fp32, activations in compute dtype.

    ``use_amp=False`` or ``dtype=float32`` forces fp32 compute (train.py:245-254).
    On TPU bf16 needs no loss scaling, so there is no GradScaler equivalent.
    """
    if not cfg.system.use_amp:
        return None
    return {
        "bfloat16": jnp.bfloat16,
        "float16": jnp.bfloat16,  # fp16 has no TPU advantage; map to bf16
        "float32": None,
    }[cfg.system.dtype]
