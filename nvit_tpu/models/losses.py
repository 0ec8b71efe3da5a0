"""Auxiliary losses: consistency, smoothness, quantization, reconstruction,
plus cross-entropy and accuracy helpers.

≙ reference nvit/model.py:482-561 (aux losses), nvit/train.py:906-926 (loss
weighting) and train.py:562-575 (top-k accuracy).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


def cross_entropy(logits: Array, labels: Array) -> Array:
    """Mean softmax cross-entropy with integer labels (≙ F.cross_entropy).

    Computed in fp32 regardless of logit dtype.
    """
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    return jnp.mean(logz - picked)


def huber_loss(pred: Array, target: Array, delta: float = 1.0) -> Array:
    """Mean Huber loss (≙ F.huber_loss defaults: delta=1, mean reduction)."""
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    abs_diff = jnp.abs(diff)
    quad = 0.5 * diff * diff
    lin = delta * (abs_diff - 0.5 * delta)
    return jnp.mean(jnp.where(abs_diff <= delta, quad, lin))


def mse_loss(pred: Array, target: Array) -> Array:
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(diff * diff)


def _safe_norm(x: Array, axis: int = -1) -> Array:
    """L2 norm whose gradient is 0 (not NaN) where the norm is exactly 0.

    d‖x‖/dx = x/‖x‖ is 0/0 at x = 0; jnp.linalg.norm propagates that NaN
    into every parameter it touches.  Exact same VALUES as linalg.norm —
    only the x = 0 cotangent changes — via the standard double-where trick.
    The reference's torch.norm has the identical NaN hazard (latent there:
    its Hebbian channel is too weak to ever collapse two SOM nodes to
    bit-equality; ours did at flagship scale — BASELINE.md round-4 soak)."""
    d2 = jnp.sum(x * x, axis=axis)
    safe = jnp.where(d2 > 0, d2, 1.0)
    return jnp.where(d2 > 0, jnp.sqrt(safe), 0.0)


def _safe_unit(x: Array) -> Array:
    """x/‖x‖ whose gradient is 0 (not ~1e12) where x is exactly 0.

    Clamping only the denominator (x / max(‖x‖, 1e-12)) keeps the VALUE
    finite at x = 0 but its cotangent is upstream/1e-12 per element — one
    collapsed SOM node then consumes the whole global grad-clip budget.
    Zeroing the numerator branch too (double-where) gives the zero
    cotangent consistent with _safe_norm.  Values match x/‖x‖ everywhere
    except subnormal norms: at x = 0 the quotient was already 0, and for
    0 < ‖x‖ < 1e-12 the result has magnitude ‖x‖/1e-12 ≪ 1 rather than 1
    (kept: dividing by a subnormal fp32 norm risks inf, and a vector that
    small IS a collapsed node for every consumer here)."""
    n = _safe_norm(x)[..., None]
    num = jnp.where(n > 0, x, 0.0)
    denom = jnp.where(n > 0, jnp.maximum(n, 1e-12), 1.0)
    return num / denom


def consistency_loss(local_repr: Array, global_repr: Array) -> Array:
    """1 − mean cosine similarity (≙ reference model.py:482-490).

    Normalization is collapse-safe (a SOM node pulled to exactly 0 must not
    NaN the step or emit a clip-saturating gradient — see _safe_unit)."""
    ln = _safe_unit(local_repr.astype(jnp.float32))
    gn = _safe_unit(global_repr.astype(jnp.float32))
    return 1.0 - jnp.mean(jnp.sum(ln * gn, axis=-1))


def neighbor_indices(indices: Array, grid_m: int, grid_n: int) -> Array:
    """8-neighborhood on the SOM grid with periodic modulo wrap.

    ≙ reference model.py:504-537, with a bug fix: the reference assumes a
    square ``sqrt(nodes_per_map)`` grid and *raises* for non-square node
    counts (model.py:509-513) — which its own default config (kohonen_nodes=64
    → 32/map) triggers, crashing the nvit1_k1 profile.  Canonical semantics
    here: neighbors live on the SOM's true m×n grid (linear index = row·n +
    col, matching kohonen.py:61-62's location layout), wrapping modulo (m, n).
    For perfect-square counts this is identical to the reference.

    indices [...,] → neighbors [..., 8].
    """
    row = indices // grid_n
    col = indices % grid_n
    offsets = np.array(
        [[-1, -1], [-1, 0], [-1, 1], [0, -1], [0, 1], [1, -1], [1, 0], [1, 1]], dtype=np.int32
    )
    nrow = (row[..., None] + offsets[:, 0]) % grid_m
    ncol = (col[..., None] + offsets[:, 1]) % grid_n
    return nrow * grid_n + ncol


def map_smoothness(nodes: Array, indices: Array, grid_m: int, grid_n: int) -> Array:
    """Mean L2 distance from each BMU's embedding to its 8 neighbors' embeddings
    (≙ reference model.py:539-561).

    The distance depends only on the BMU's node INDEX, so instead of gathering
    a [B·T, 8, d] embedding tensor (≈600 MB at ImageNet scale — the reference's
    formulation), compute the per-node mean-neighbor-distance table [N] once
    and weight it by each node's BMU count:
        mean_i dist(bmu_i) = Σ_n (count_n / S) · table_n
    — mathematically identical, with gradients flowing into ``nodes`` through
    the table exactly as before (indices carry no gradient — argmin)."""
    n_nodes = nodes.shape[0]
    node_ids = jnp.arange(n_nodes)
    neigh = neighbor_indices(node_ids, grid_m, grid_n)  # [N, 8]
    cur = nodes.astype(jnp.float32)  # [N, d]
    nb = jnp.take(nodes, neigh, axis=0).astype(jnp.float32)  # [N, 8, d]
    table = jnp.mean(_safe_norm(cur[:, None, :] - nb), axis=-1)  # [N]
    idx = indices.reshape(-1)
    counts = jax.ops.segment_sum(
        jnp.ones_like(idx, dtype=jnp.float32), idx, num_segments=n_nodes
    )
    return jnp.sum(counts * table) / idx.shape[0]


def smoothness_loss(
    local_nodes: Array,
    local_indices: Array,
    global_nodes: Array,
    global_indices: Array,
    grid_m: int,
    grid_n: int,
) -> Array:
    """Sum of the per-map smoothness terms (≙ reference model.py:492-502)."""
    return map_smoothness(local_nodes, local_indices, grid_m, grid_n) + map_smoothness(
        global_nodes, global_indices, grid_m, grid_n
    )


def topk_accuracy(logits: Array, labels: Array, k: int = 5) -> tuple[Array, Array]:
    """(top1%, topk%) — ≙ reference train.py:562-575; k clamps to num_classes."""
    maxk = min(k, logits.shape[-1])
    _, pred = jax.lax.top_k(logits.astype(jnp.float32), maxk)  # [..., maxk]
    correct = pred == labels[..., None]
    top1 = jnp.mean(correct[..., 0].astype(jnp.float32)) * 100.0
    topk = jnp.mean(jnp.any(correct, axis=-1).astype(jnp.float32)) * 100.0
    return top1, topk
