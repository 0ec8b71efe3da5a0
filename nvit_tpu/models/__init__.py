from nvit_tpu.models.vit import (
    VitOutput,
    embed_patches,
    estimate_flops_per_iter,
    init_vit,
    kohonen_spec,
    num_params,
    total_loss,
    vit_apply,
)
from nvit_tpu.models.blocks import (
    block_apply,
    cross_attention_apply,
    init_block,
    init_cross_attention,
)

__all__ = [
    "VitOutput",
    "embed_patches",
    "estimate_flops_per_iter",
    "init_vit",
    "kohonen_spec",
    "num_params",
    "total_loss",
    "vit_apply",
    "block_apply",
    "cross_attention_apply",
    "init_block",
    "init_cross_attention",
]
