"""Device mesh + sharding rules: SPMD data parallelism with a tensor-parallel
axis hook.

≙ reference DDP/NCCL stack (train.py:197-243 process-group setup, 434-446 DDP
wrap, 898-933 ``no_sync`` grad accumulation, DistributedSampler): on TPU all
of it collapses into a `jax.sharding.Mesh` and sharding annotations — the
XLA SPMD partitioner inserts the gradient all-reduces (riding ICI), there is
no process-group ceremony, and "``no_sync``" is unnecessary because the
accumulation loop lives inside one jitted program (SURVEY.md §5, distributed
row).

Axes:
* ``data``  — batch sharding (the reference's only strategy, DP);
* ``model`` — tensor-parallel hook: MLP and attention-head weights are
  sharded over it (Megatron-style column→row split).  Not required for
  reference parity (SURVEY.md §2.3) but the mesh/rules support it natively.

FSDP (``fsdp=True``, ≙ ZeRO-3): the transformer-trunk weights AND their
AdamW moments additionally shard over the ``data`` axis, so per-device
parameter+optimizer memory scales down with data parallelism.  There is no
hand-written gather/scatter machinery: the specs below are plain GSPMD
sharding annotations, and the XLA partitioner inserts the per-use weight
all-gathers (forward and backward) and emits gradients as reduce-scatters
directly into the param sharding — the idiomatic TPU formulation of FSDP
(scaling-book recipe: annotate, let XLA insert collectives).

The TP and FSDP layouts are chosen so the nViT per-step weight renorm needs
NO cross-shard communication: matrices normalized along their input axis
(query/key/value/c_fc, axis 0) are sharded only over their output axis, and
vice versa for the output projections (see ops/renorm.py).  FSDP shards the
SAME (renorm-free) axis as TP, just over ``data`` as well, so the in-step
renorm stays local under every topology.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax import Array
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = dict[str, Any]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(devices: list | None = None, model_parallel: int = 1) -> Mesh:
    """Build a (data × model) mesh over the given (default: all) devices."""
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_spec() -> P:
    """Batch tensors shard over the data axis (first dim)."""
    return P(DATA_AXIS)


def block_param_specs(use_nvit: bool, fsdp: bool = False) -> Params:
    """PartitionSpecs for one transformer block (Megatron-style TP).

    qkv/c_fc: column-parallel (shard the OUT axis → model);
    output projections: row-parallel (shard the IN axis → model);
    per-channel scale vectors follow the axis they broadcast against where
    sharded, else replicated.  With ``fsdp`` the same weight axis also shards
    over ``data`` (ZeRO-3; the renorm axis stays unsharded — module docstring).

    Known TP nuance: the gated MLP splits c_fc's output columns into the
    contiguous u|v halves (reference weight layout, model.py:148-151), so a
    contiguous column shard puts u and v on different devices; GSPMD inserts
    the reshard collective automatically (correct, verified by the dp×tp
    dryrun/tests).  A comms-free Megatron-SwiGLU layout would interleave the
    halves per shard — deferred until real multi-chip hardware is available
    to measure it.
    """
    out_axes = (MODEL_AXIS, DATA_AXIS) if fsdp else MODEL_AXIS
    col = {"w": P(None, out_axes), "b": P(out_axes)}
    row = {"w": P(out_axes, None), "b": P()}
    specs: Params = {
        "query": col,
        "key": col,
        "value": col,
        "att_c_proj": row,
        "c_fc": col,
        "mlp_c_proj": row,
        "skip_param": P(),
    }
    if use_nvit:
        specs.update(
            {
                "attn_alpha": P(),
                "mlp_alpha": P(),
                "sqk": P(),
                "suv": P(),
            }
        )
    else:
        specs.update({"rmsnorm_att": P(), "rmsnorm_mlp": P()})
    return specs


def param_specs(params: Params, use_nvit: bool, fsdp: bool = False) -> Params:
    """Full-model PartitionSpec tree matching ``init_vit``'s structure.

    Everything outside the transformer trunk is replicated — patch embeds,
    SOM codebooks, heads, and the cross-attention block are small relative to
    the trunk; replication keeps their (gather-heavy) ops local.
    """

    def replicate(tree):
        return jax.tree_util.tree_map(lambda _: P(), tree)

    specs = {k: replicate(v) for k, v in params.items() if k != "blocks"}
    block_spec = block_param_specs(use_nvit, fsdp=fsdp)

    def prune(spec_tree, param_tree):
        # drop spec entries for params that don't exist (e.g. no bias)
        if isinstance(param_tree, dict):
            return {k: prune(spec_tree[k], v) for k, v in param_tree.items()}
        return spec_tree

    specs["blocks"] = [prune(block_spec, bp) for bp in params["blocks"]]
    return specs


def shard_params(params: Params, mesh: Mesh, use_nvit: bool, fsdp: bool = False) -> Params:
    """Place the parameter tree onto the mesh according to the TP/FSDP/
    replication rules (≙ DDP's initial parameter broadcast)."""
    specs = param_specs(params, use_nvit, fsdp=fsdp)
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs, is_leaf=lambda x: isinstance(x, P)
    )
    return jax.device_put(params, shardings)


def shard_opt_state(opt_state: Any, mesh: Mesh, use_nvit: bool, fsdp: bool = False) -> Any:
    """Place the AdamW moments on the mesh exactly like their parameters.

    Under FSDP this is the ZeRO optimizer-state shard: mu/nu memory scales
    down with the data axis.  Under plain TP/DP it pins the moments to the
    param layout instead of leaving their placement to propagation.  The
    moments are params-shaped trees (train/optim.py::FusedAdamWState), so the
    param specs apply directly; optimizer states without mu/nu pass through.
    """
    if not (hasattr(opt_state, "mu") and hasattr(opt_state, "nu")):
        return opt_state
    return opt_state._replace(
        mu=shard_params(opt_state.mu, mesh, use_nvit, fsdp=fsdp),
        nu=shard_params(opt_state.nu, mesh, use_nvit, fsdp=fsdp),
    )


def shard_batch(batch: Array, mesh: Mesh) -> Array:
    """Shard a host batch over the data axis (≙ DistributedSampler: each
    device sees B/data_parallel examples)."""
    return jax.device_put(batch, NamedSharding(mesh, batch_spec()))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
