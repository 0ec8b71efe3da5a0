from nvit_tpu.core.norms import justnorm, layer_norm, rms_norm
from nvit_tpu.core.layers import c_proj_std, init_conv_patch, init_linear, linear
from nvit_tpu.core.residual import norm_skip, slerp_residual

__all__ = [
    "justnorm",
    "layer_norm",
    "rms_norm",
    "c_proj_std",
    "init_conv_patch",
    "init_linear",
    "linear",
    "norm_skip",
    "slerp_residual",
]
