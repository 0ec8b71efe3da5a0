"""Post-step weight renormalization for nViT — in-jit, sharding-friendly.

≙ reference train.py:461-480 (``normalize_matrices``): after every optimizer
step in nViT mode, the Q/K/V/c_fc weights are L2-renormalized along their
input dimension and the two output projections along their output dimension,
keeping every weight vector on the unit hypersphere (the nGPT constraint).

The reference does this host-side with a Python loop over blocks, re-writing
``.data`` every iteration.  Here it is a pure tree transform applied INSIDE
the jitted train step, so XLA fuses the whole sweep into the update program;
under sharding each weight's renorm reduction runs over its local axis layout
(row/col norms need no cross-shard communication as long as the normalized
axis is unsharded — the sharding rules in parallel/mesh.py guarantee that).

Axis mapping (our weights are [in, out]; torch's are [out, in]):
* torch ``justnorm(W, dim=1)`` (query/key/value/c_fc)   → axis=0 here
* torch ``justnorm(W, dim=0)`` (att_c_proj/mlp_c_proj)  → axis=1 here

Parity notes: the sweep touches ONLY the self-attention Block weights — not
cross-attention, patch embeds, or the head — exactly like the reference.
Norms compute in fp32 and cast back (train.py:466-469).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from jax import Array

Params = dict[str, Any]

# weight name → axis to normalize (in our [in, out] layout)
RENORM_AXES: dict[str, int] = {
    "query": 0,
    "key": 0,
    "value": 0,
    "c_fc": 0,
    "att_c_proj": 1,
    "mlp_c_proj": 1,
}


def _justnorm_w(w: Array, axis: int) -> Array:
    w32 = w.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(w32 * w32, axis=axis, keepdims=True))
    return (w32 / norm).astype(w.dtype)


def renorm_block(block_params: Params) -> Params:
    out = dict(block_params)
    for name, axis in RENORM_AXES.items():
        entry = dict(block_params[name])
        entry["w"] = _justnorm_w(entry["w"], axis)
        out[name] = entry
    return out


def renorm_params(params: Params) -> Params:
    """Renormalize every transformer block's matrices (pure; jit-safe)."""
    out = dict(params)
    out["blocks"] = [renorm_block(bp) for bp in params["blocks"]]
    return out
