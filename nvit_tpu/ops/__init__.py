from nvit_tpu.ops.attention import attention, sdpa_xla
from nvit_tpu.ops.flash_attention import flash_attention
from nvit_tpu.ops.gated_mlp import gated_mlp
from nvit_tpu.ops.renorm import RENORM_AXES, renorm_block, renorm_params

__all__ = [
    "attention",
    "sdpa_xla",
    "flash_attention",
    "gated_mlp",
    "RENORM_AXES",
    "renorm_block",
    "renorm_params",
]
