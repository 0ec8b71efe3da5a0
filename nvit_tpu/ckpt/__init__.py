from nvit_tpu.ckpt.checkpoint import (
    checkpoint_exists,
    load_checkpoint,
    load_checkpoint_meta,
    restore_for_resume,
    save_checkpoint,
)

__all__ = [
    "checkpoint_exists",
    "load_checkpoint",
    "load_checkpoint_meta",
    "restore_for_resume",
    "save_checkpoint",
]
