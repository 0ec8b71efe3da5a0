from nvit_tpu.train.optim import (
    FusedAdamWState,
    decay_mask,
    fused_adamw_renorm_update,
    init_fused_adamw,
    make_optimizer,
)
from nvit_tpu.train.state import TrainState, compute_dtype_of, create_train_state
from nvit_tpu.train.step import make_eval_step, make_loss_fn, make_train_step

__all__ = [
    "FusedAdamWState",
    "decay_mask",
    "fused_adamw_renorm_update",
    "init_fused_adamw",
    "make_optimizer",
    "TrainState",
    "compute_dtype_of",
    "create_train_state",
    "make_eval_step",
    "make_loss_fn",
    "make_train_step",
]
