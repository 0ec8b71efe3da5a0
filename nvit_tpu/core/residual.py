"""Residual-update primitives for the nViT hypersphere geometry.

* ``slerp_residual`` — the nGPT-style spherical-LERP residual with a learnable
  per-channel eigen learning rate (≙ reference nvit/model.py:134-142, 159-167,
  265-273).
* ``norm_skip`` — the outer normalized skip connection applied by the ViT loop
  around every block (≙ model.py:84-87, 450-452).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from nvit_tpu.core.norms import justnorm


def slerp_residual(h: Array, h_update: Array, alpha: Array, alpha_init_value: float, alpha_init_scaling: float) -> Array:
    """``norm(norm(h) + |lr|·(norm(h_update) − norm(h)))``.

    ``lr = |alpha · (init_value / init_scaling)|`` is per-channel and fp32
    (≙ model.py:135-142).  The abs() keeps the interpolation direction stable.
    """
    lr = jnp.abs(alpha.astype(jnp.float32) * (alpha_init_value / alpha_init_scaling))
    a = justnorm(h)
    b = justnorm(h_update)
    res = a + lr.astype(a.dtype) * (b - a)
    return justnorm(res)


def norm_skip(h_new: Array, h: Array, skip_param: Array) -> Array:
    """``norm(h_new · skip_param + h)`` (≙ model.py:84-87).

    Applied by the ViT forward around each transformer block in BOTH baseline
    and nViT modes (model.py:450-452), giving blocks a double residual — we
    keep that behavior for parity.
    """
    res = h_new * skip_param.astype(h_new.dtype) + h
    return justnorm(res)
