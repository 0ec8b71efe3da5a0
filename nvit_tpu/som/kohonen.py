"""Kohonen self-organizing map — vectorized, explicit-state, MXU-friendly.

≙ reference nvit/kohonen.py:30-165 (adapted there from quicksom).  The
reference keeps ``nodes`` as an nn.Parameter that receives BOTH gradient
updates (through the BMU gather used by the aux losses / cross-attention) and
in-place Hebbian neighborhood updates executed per-sample in a Python loop
(kohonen.py:138-165) — the #1 hot spot.

TPU-native redesign (all static shapes, two small matmuls, no loops):

* **BMU search** (``bmu``): ``argmin_n ‖x_i − node_n‖²`` via the expansion
  ‖x‖² − 2·x@nodesᵀ + ‖nodes‖²; the x@nodesᵀ term is an [S,d]@[d,N] MXU
  matmul.  Gradients flow into ``nodes`` through the gathered representations,
  exactly like the reference's ``self.nodes[winning_indices]``.

* **Hebbian update** (``hebbian_delta``): the per-sample sequential loop is
  replaced by the standard *batch SOM* update computed against the current
  nodes:  Δ = lr·α·(K @ Σ_b one_hot(bmu_b)ᵀ x_b  −  (K @ counts) ⊙ nodes)
  where K[n,m] = exp(−d²_torus(n,m)/2σ²) is the precomputed periodic
  neighborhood kernel.  This is two [N,N]@[N,·] matmuls.  (Deviation from the
  reference documented in SURVEY.md §7: the reference's loop truncates to the
  first B of B·T samples via a zip() quirk and applies a dubious input-resize
  hack, kohonen.py:138-159; the batch formulation uses every sample and is
  order-independent — required for SPMD, where per-shard deltas are psum'd.)

Grid geometry matches the reference: roughly-square m×n grid
(kohonen.py:52-54), default σ = sqrt(m·n)/2 (kohonen.py:65-68), periodic
topology via wrap offsets (kohonen.py:71-78).
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array


class KohonenSpec(NamedTuple):
    """Static SOM geometry (hashable; safe to close over in jit)."""

    num_nodes: int
    input_dim: int
    m: int
    n: int
    sigma: float
    alpha: float
    periodic: bool


def make_spec(
    input_dim: int,
    num_nodes: int,
    alpha: float = 0.01,
    sigma: float | None = None,
    periodic: bool = True,
) -> KohonenSpec:
    """Grid layout ≙ reference kohonen.py:52-68: m = floor(sqrt(N)),
    n = N // m, grid_size = m·n (may drop nodes for non-square N)."""
    m = int(math.isqrt(num_nodes))
    n = num_nodes // m
    grid = m * n
    if sigma is None:
        sigma = math.sqrt(m * n) / 2.0
    return KohonenSpec(grid, input_dim, m, n, float(sigma), float(alpha), periodic)


def init_nodes(key: Array, spec: KohonenSpec, dtype: Any = jnp.float32) -> Array:
    """Node codebook init: standard normal (≙ kohonen.py:60 torch.randn)."""
    return jax.random.normal(key, (spec.num_nodes, spec.input_dim), dtype=dtype)


def grid_locations(spec: KohonenSpec) -> np.ndarray:
    """[N, 2] integer (row, col) grid coordinates (≙ kohonen.py:61-62)."""
    return np.array([[i, j] for i in range(spec.m) for j in range(spec.n)], dtype=np.int64)


def neighborhood_kernel(spec: KohonenSpec) -> jnp.ndarray:
    """Precompute K[n, m] = exp(−d²(n,m) / (2σ²)) with torus distance.

    The reference computes, per sample, the min squared distance over the
    identity plus 8 wrap offsets (kohonen.py:84-94); node-to-node distances
    are static, so we fold the whole neighborhood into one [N, N] table at
    trace time (numpy; becomes a jit constant).
    """
    locs = grid_locations(spec).astype(np.float64)  # [N, 2]
    diff = locs[:, None, :] - locs[None, :, :]  # [N, N, 2]
    if spec.periodic:
        offsets = np.array(
            [
                [0, 0],
                [-spec.m, -spec.n], [spec.m, spec.n],
                [-spec.m, 0], [spec.m, 0],
                [0, -spec.n], [0, spec.n],
                [-spec.m, spec.n], [spec.m, -spec.n],
            ],
            dtype=np.float64,
        )  # ≙ kohonen.py:71-78 (+ the unshifted case)
        d2 = np.min(
            np.sum((diff[None, :, :, :] + offsets[:, None, None, :]) ** 2, axis=-1), axis=0
        )
    else:
        d2 = np.sum(diff**2, axis=-1)
    kernel = np.exp(-d2 / (2.0 * spec.sigma * spec.sigma))
    return jnp.asarray(kernel, dtype=jnp.float32)


def bmu(nodes: Array, x: Array) -> tuple[Array, Array]:
    """Find best-matching units.  x: [..., S, d]; nodes: [N, d].

    Returns (node_repr [..., S, d], indices [..., S]).  Gradient flows into
    ``nodes`` via the gather, matching the reference forward
    (kohonen.py:100-119: cdist → argmin → index).
    """
    # The cross matmul runs in the ACTIVATION dtype (bf16 under the compute
    # policy → full-rate MXU; fp32 callers keep fp32) with fp32 accumulation;
    # ‖x−n‖² = ‖x‖² − 2 x·n + ‖n‖², the ‖x‖² term is constant in argmin.
    nodes_mm = nodes.astype(x.dtype)
    cross = jnp.einsum("...sd,nd->...sn", x, nodes_mm, preferred_element_type=jnp.float32)
    n32 = nodes_mm.astype(jnp.float32)
    nsq = jnp.sum(n32 * n32, axis=-1)
    indices = jnp.argmin(nsq - 2.0 * cross, axis=-1)
    # Gather as a one-hot matmul: identical values (the fp32-accumulated sum
    # has exactly one nonzero term), but the BACKWARD becomes
    # one_hotᵀ @ d(repr) — an MXU matmul — instead of a [S → N] scatter-add,
    # which XLA:TPU serializes.  Also keeps node_repr in the activation dtype
    # end-to-end instead of materializing an [S, d] fp32 gather.
    one_hot = jax.lax.stop_gradient(jax.nn.one_hot(indices, nodes.shape[0], dtype=x.dtype))
    node_repr = jnp.einsum(
        "...sn,nd->...sd", one_hot, nodes_mm, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    return node_repr, indices


def hebbian_delta(
    nodes: Array,
    kernel: Array,
    x: Array,
    indices: Array,
    lr: Array | float,
    alpha: float,
) -> Array:
    """Batch Hebbian update delta for the node codebook (non-gradient).

    nodes: [N, d]; kernel: [N, N]; x: [..., S, d] inputs; indices: [..., S]
    BMU indices; lr: the scheduled Kohonen learning rate; alpha: the map's
    intrinsic rate (both multiply, ≙ kohonen.py:146
    ``update_strength = learning_rate * self.alpha * neighborhood``).

    Returns Δnodes [N, d]:  Δ = lr·α·(K @ Σ_i e_{bmu_i} x_iᵀ − (K @ counts) ⊙ nodes).
    Everything is stop-gradiented — this is the non-gradient update channel.
    """
    n_nodes = nodes.shape[0]
    xs = jax.lax.stop_gradient(x).reshape(-1, x.shape[-1])  # [S, d], activation dtype
    idx = jax.lax.stop_gradient(indices).reshape(-1)  # [S]
    # scatter-sum as a one-hot matmul in the activation dtype (bf16 → MXU at
    # full rate) with fp32 accumulation; each node's sum accumulates ≤S terms
    # in fp32, so the bf16 inputs cost only input rounding
    one_hot = jax.nn.one_hot(idx, n_nodes, dtype=xs.dtype)  # [S, N]
    xsum = jnp.einsum("sn,sd->nd", one_hot, xs, preferred_element_type=jnp.float32)  # [N, d]
    counts = jax.ops.segment_sum(
        jnp.ones_like(idx, dtype=jnp.float32), idx, num_segments=n_nodes
    )  # [N]
    strength_x = kernel @ xsum  # [N, d]
    strength_total = kernel @ counts  # [N]
    nodes32 = jax.lax.stop_gradient(nodes.astype(jnp.float32))
    delta = strength_x - strength_total[:, None] * nodes32
    return (lr * alpha) * delta
