from nvit_tpu.train.optim import decay_mask, make_optimizer
from nvit_tpu.train.state import TrainState, compute_dtype_of, create_train_state
from nvit_tpu.train.step import make_eval_step, make_loss_fn, make_train_step

__all__ = [
    "decay_mask",
    "make_optimizer",
    "TrainState",
    "compute_dtype_of",
    "create_train_state",
    "make_eval_step",
    "make_loss_fn",
    "make_train_step",
]
