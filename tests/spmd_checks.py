"""Subprocess bodies for tests/test_spmd_kernels.py.

Each check runs ONE multi-device interpret-mode Pallas program and exits 0
on parity.  They must run in separate processes: jax's mosaic-interpret
machinery simulates every device with io_callback threads sharing global
state, and running several such programs in one process deadlocks
nondeterministically on a small host (observed repeatedly under pytest;
single-program processes never hang).  ``python tests/spmd_checks.py <name>``.
"""

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))  # repo root

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

# the gated-MLP checks replicate the [K, 2H] weight across the mesh, which
# trips a mosaic-interpreter deadlock — they (and the full train step) use
# the generic interpreter; rationale in tests/kernel_force.py
from tests.kernel_force import generic_interpret_mode

import nvit_tpu.ops.attention  # noqa: F401
import nvit_tpu.ops.gated_mlp  # noqa: F401

att_mod = sys.modules["nvit_tpu.ops.attention"]
mlp_mod = sys.modules["nvit_tpu.ops.gated_mlp"]
att_mod._on_tpu = lambda: True
mlp_mod._on_tpu = lambda: True

from nvit_tpu.ops.attention import attention, attention_qknorm, qknorm_project_xla, sdpa_xla
from nvit_tpu.ops.gated_mlp import _xla_gated, gated_mlp
from nvit_tpu.parallel.mesh import make_mesh
from nvit_tpu.parallel.spmd import kernel_mesh


def rand_qkv(seed, b=8, h=4, t=36, d=32, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    return (
        jax.random.normal(k1, (b, h, t, d), dtype),
        jax.random.normal(k2, (b, h, t, d), dtype),
        jax.random.normal(k3, (b, h, t, d), dtype),
    )


def attention_fwd(model_parallel: int) -> None:
    mesh = make_mesh(model_parallel=model_parallel)
    q, k, v = rand_qkv(0)
    scale = 1.0 / math.sqrt(q.shape[-1])
    ref = sdpa_xla(q, k, v, scale)
    with kernel_mesh(mesh), pltpu.force_tpu_interpret_mode():
        out = jax.jit(lambda a, b, c: attention(a, b, c, scale, use_flash=True))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=5e-4, atol=5e-5)


def qknorm_grads(model_parallel: int) -> None:
    """Fwd + grads (q, k, v AND the replicated sqk — whose cotangent must be
    psum'd over data shards by shard_map's transpose) vs the XLA path."""
    mesh = make_mesh(model_parallel=model_parallel)
    q, k, v = rand_qkv(1, b=8, h=4, t=20, d=32)
    sqk = 1.0 + 0.05 * jax.random.normal(jax.random.PRNGKey(7), (4, 32), jnp.float32)
    scale = math.sqrt(q.shape[-1])

    def loss_kernel(q, k, v, s):
        return jnp.sum(jnp.square(attention_qknorm(
            q, k, v, s, scale, use_flash=True, bounded_softmax="bounded")))

    def loss_ref(q, k, v, s):
        qh, kh = qknorm_project_xla(q, k, s, v.dtype)
        return jnp.sum(jnp.square(sdpa_xla(qh, kh, v, scale)))

    with kernel_mesh(mesh), pltpu.force_tpu_interpret_mode():
        val, grads = jax.jit(jax.value_and_grad(loss_kernel, argnums=(0, 1, 2, 3)))(q, k, v, sqk)
    val_ref, grads_ref = jax.value_and_grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, sqk)
    np.testing.assert_allclose(float(val), float(val_ref), rtol=1e-4)
    for name, a, b in zip(("dq", "dk", "dv", "dsqk"), grads, grads_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4, err_msg=f"{name} mismatch"
        )


def gated_mlp_grads(with_bias: bool) -> None:
    """dp8 shard_map of the fused gated-MLP: fwd + dx/dw(/db) parity.
    Local shapes (n=2·16=32 rows, k=128, h=256) tile → the kernel path runs."""
    mesh = make_mesh()
    kx, kw, kb = jax.random.split(jax.random.PRNGKey(3), 3)
    x = jax.random.normal(kx, (8, 16, 128), jnp.float32)
    w = 0.1 * jax.random.normal(kw, (128, 512), jnp.float32)
    b = 0.1 * jax.random.normal(kb, (512,), jnp.float32) if with_bias else None

    def loss_kernel(x, w, b):
        return jnp.sum(jnp.square(gated_mlp(x, w, b, use_kernel=True)))

    def loss_ref(x, w, b):
        return jnp.sum(jnp.square(_xla_gated(x, w, b)))

    argnums = (0, 1, 2) if with_bias else (0, 1)
    with kernel_mesh(mesh), generic_interpret_mode():
        val, grads = jax.jit(jax.value_and_grad(loss_kernel, argnums=argnums))(x, w, b)
    val_ref, grads_ref = jax.value_and_grad(loss_ref, argnums=argnums)(x, w, b)
    np.testing.assert_allclose(float(val), float(val_ref), rtol=1e-4)
    for name, a, g in zip(("dx", "dw", "db"), grads, grads_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(g), rtol=2e-3, atol=2e-4, err_msg=f"{name} mismatch"
        )


def full_flash_train_step(
    fsdp: bool = False, model_parallel: int = 1, kohonen: bool = False
) -> None:
    """The regression that motivated the shard_map dispatch: a flash_attn=True
    train step jitted over a multi-device mesh.  Without it this crashes at
    lowering on real TPUs (Mosaic: 'cannot be automatically partitioned');
    here we assert it runs AND matches the XLA-path step numerically.

    With ``fsdp`` the trunk params + moments are additionally ZeRO-sharded
    over the data axis (parallel/mesh.py) — the kernels' shard_map specs
    declare weights replicated, so GSPMD must all-gather the FSDP shards at
    the shard_map boundary; this asserts that composition stays exact.

    With ``model_parallel`` + ``kohonen`` on top this is the ALL-FEATURES
    intersection (VERDICT r3 #4): SOM delta reduction + ZeRO all-gathers +
    TP head sharding + shard_mapped kernels in ONE partitioned program."""
    import dataclasses

    from jax.sharding import NamedSharding, PartitionSpec as P

    from nvit_tpu.configs.loader import load_config
    from nvit_tpu.parallel.mesh import shard_opt_state, shard_params
    from nvit_tpu.train import create_train_state, make_train_step

    mesh = make_mesh(model_parallel=model_parallel)  # dp8 or dp4xtp2
    cfg = load_config(settings_file=None, env={}, overrides={
        "model": {"image_size": 16, "n_layer": 1, "n_head": 2, "n_embd": 64,
                  "num_classes": 10, "local_patch_size": 4, "global_patch_size": 8,
                  "use_nvit": True, "use_kohonen": kohonen, "kohonen_nodes": 18,
                  "flash_attn": True, "bounded_softmax": "bounded"},
        "training": {"batch_size": 8, "gradient_accumulation_steps": 1},
        "system": {"dtype": "float32", "use_amp": False, "log_gpu_stats": False,
                   "model_parallel": model_parallel, "fsdp": fsdp},
        "data": {"dataset": "synthetic"},
    })
    state = create_train_state(cfg)
    if fsdp or model_parallel > 1:
        state = state._replace(
            params=shard_params(state.params, mesh, use_nvit=True, fsdp=fsdp),
            opt_state=shard_opt_state(state.opt_state, mesh, use_nvit=True, fsdp=fsdp),
        )
    imgs = jax.random.normal(jax.random.PRNGKey(8), (8, 3, 16, 16), jnp.float32)
    labels = jax.random.randint(jax.random.PRNGKey(9), (8,), 0, 10)
    bsh = NamedSharding(mesh, P("data"))
    imgs_s, labels_s = jax.device_put(imgs, bsh), jax.device_put(labels, bsh)

    with generic_interpret_mode():
        step = jax.jit(make_train_step(cfg, mesh=mesh))
        new_state, metrics = step(state, imgs_s, labels_s)
        loss_kernel = float(metrics["total_loss"])
        assert all(
            bool(jnp.isfinite(x).all()) for x in jax.tree_util.tree_leaves(new_state.params)
        )
    if kohonen:
        # the psum'd Hebbian channel must leave every data shard holding
        # identical codebooks (SURVEY §7 hard-part 1 divergence hazard)
        for mkey in ("local_kohonen", "global_kohonen"):
            shards = [np.asarray(s.data) for s in new_state.params[mkey]["nodes"].addressable_shards]
            for v in shards[1:]:
                np.testing.assert_array_equal(shards[0], v, err_msg=f"{mkey} diverged")

    cfg_xla = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, flash_attn=False))
    step_xla = jax.jit(make_train_step(cfg_xla, mesh=mesh))
    state_xla = create_train_state(cfg_xla)
    if fsdp or model_parallel > 1:
        state_xla = state_xla._replace(
            params=shard_params(state_xla.params, mesh, use_nvit=True, fsdp=fsdp),
            opt_state=shard_opt_state(state_xla.opt_state, mesh, use_nvit=True, fsdp=fsdp),
        )
    _, metrics_xla = step_xla(state_xla, imgs_s, labels_s)
    np.testing.assert_allclose(loss_kernel, float(metrics_xla["total_loss"]), rtol=1e-4)


CHECKS = {
    "attention_fwd_dp8": lambda: attention_fwd(1),
    "attention_fwd_dp4tp2": lambda: attention_fwd(2),
    "qknorm_grads_dp8": lambda: qknorm_grads(1),
    "qknorm_grads_dp4tp2": lambda: qknorm_grads(2),
    "gated_mlp_grads": lambda: gated_mlp_grads(False),
    "gated_mlp_grads_bias": lambda: gated_mlp_grads(True),
    "full_flash_train_step": full_flash_train_step,
    "full_flash_train_step_fsdp": lambda: full_flash_train_step(fsdp=True),
    # ALL-FEATURES intersection: dp4xtp2 + ZeRO + SOM + shard_mapped kernels
    "full_flash_train_step_allfeatures": lambda: full_flash_train_step(
        fsdp=True, model_parallel=2, kohonen=True
    ),
}


if __name__ == "__main__":
    CHECKS[sys.argv[1]]()
    print(f"SPMD_CHECK_OK {sys.argv[1]}")
