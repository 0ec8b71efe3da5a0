"""Pallas fused attention for TPU (flash-style blockwise softmax).

≙ reference flash-attn 2.x dependency (model.py:7,122,253).  Current status:
the fused Pallas kernel is being brought up; this module exposes the
dispatch point used by ops/attention.py.  Until the kernel lands, the XLA
path (which XLA already fuses well at these sequence lengths ≤ 784) is used.
"""

from __future__ import annotations

from jax import Array

from nvit_tpu.ops.attention import sdpa_xla


def flash_attention(q: Array, k: Array, v: Array, scale: float) -> Array:
    return sdpa_xla(q, k, v, scale)
