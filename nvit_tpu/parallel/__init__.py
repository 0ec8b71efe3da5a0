from nvit_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_spec,
    make_mesh,
    param_specs,
    replicated,
    shard_batch,
    shard_opt_state,
    shard_params,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "batch_spec",
    "make_mesh",
    "param_specs",
    "replicated",
    "shard_batch",
    "shard_opt_state",
    "shard_params",
]
