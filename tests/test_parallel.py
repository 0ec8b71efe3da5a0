"""SPMD tests on the virtual 8-device CPU mesh: data-parallel and
data×tensor-parallel training steps, sharding rules, numerical equivalence
with single-device execution."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from nvit_tpu.configs.schema import Config, OptimizerConfig, TrainingConfig, ViTConfig
from nvit_tpu.parallel import make_mesh, param_specs, shard_batch, shard_params
from nvit_tpu.train import create_train_state, make_train_step


def tiny_config(**model_kw) -> Config:
    model = dict(
        image_size=16,
        n_layer=2,
        n_head=2,
        n_embd=32,
        num_classes=10,
        local_patch_size=4,
        global_patch_size=8,
        kohonen_nodes=18,
        bias=True,
        flash_attn=False,
        use_nvit=True,
        use_kohonen=True,
    )
    model.update(model_kw)
    return Config(
        model=ViTConfig(**model),
        training=TrainingConfig(batch_size=16),
        optimizer=OptimizerConfig(learning_rate=1e-3, warmup_iters=2, lr_decay_iters=100),
    )


def batch(key, cfg, b=16):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    imgs = jax.random.normal(k1, (b, 3, cfg.model.image_size, cfg.model.image_size))
    labels = jax.random.randint(k2, (b,), 0, cfg.model.num_classes)
    return imgs, labels


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    mesh2 = make_mesh(model_parallel=2)
    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2
    with pytest.raises(ValueError):
        make_mesh(model_parallel=3)


def test_param_specs_cover_tree():
    cfg = tiny_config()
    state = create_train_state(cfg)
    specs = param_specs(state.params, use_nvit=True)
    # same tree structure
    jax.tree_util.tree_map(lambda p, s: None, state.params, specs, is_leaf=lambda x: isinstance(x, P))
    assert specs["blocks"][0]["c_fc"]["w"] == P(None, "model")
    assert specs["blocks"][0]["mlp_c_proj"]["w"] == P("model", None)
    assert specs["head"]["w"] == P()


@pytest.mark.parametrize("model_parallel", [1, 2], ids=["dp8", "dp4_tp2"])
def test_sharded_step_matches_single_device(model_parallel):
    """The full train step under dp (and dp×tp) must match the unsharded step."""
    cfg = tiny_config()
    state = create_train_state(cfg)
    step_fn = make_train_step(cfg)
    imgs, labels = batch(0, cfg)

    # single-device reference
    ref_state, ref_metrics = jax.jit(step_fn)(state, imgs, labels)

    # sharded run
    mesh = make_mesh(model_parallel=model_parallel)
    params = shard_params(state.params, mesh, use_nvit=True)
    state_sh = state._replace(params=params)
    imgs_sh = shard_batch(imgs, mesh)
    labels_sh = shard_batch(labels, mesh)
    with jax.set_mesh(mesh):
        new_state, metrics = jax.jit(step_fn)(state_sh, imgs_sh, labels_sh)

    np.testing.assert_allclose(
        float(metrics["total_loss"]), float(ref_metrics["total_loss"]), rtol=1e-4
    )
    # parameters after the step agree (spot-check several leaves)
    for path in (("head", "w"), ("cross_attention", "q_local", "w")):
        a, b = new_state.params, ref_state.params
        for k in path:
            a, b = a[k], b[k]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(new_state.params["blocks"][0]["c_fc"]["w"]),
        np.asarray(ref_state.params["blocks"][0]["c_fc"]["w"]),
        rtol=1e-4,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(new_state.params["local_kohonen"]["nodes"]),
        np.asarray(ref_state.params["local_kohonen"]["nodes"]),
        rtol=1e-4,
        atol=1e-6,
    )


def test_batch_sharding_layout():
    mesh = make_mesh()
    x = jnp.zeros((16, 3, 8, 8))
    xs = shard_batch(x, mesh)
    assert xs.sharding.spec == P("data")
    # each device holds B/8 rows
    assert xs.addressable_shards[0].data.shape[0] == 2


def test_multi_step_training_sharded():
    """Several sharded steps: loss finite, step counter advances, renorm holds."""
    cfg = tiny_config(use_kohonen=False)
    state = create_train_state(cfg)
    mesh = make_mesh()
    state = state._replace(params=shard_params(state.params, mesh, use_nvit=True))
    step_fn = jax.jit(make_train_step(cfg))
    with jax.set_mesh(mesh):
        for i in range(3):
            imgs, labels = batch(i, cfg)
            state, metrics = step_fn(state, shard_batch(imgs, mesh), shard_batch(labels, mesh))
    assert int(state.step) == 3
    assert np.isfinite(float(metrics["total_loss"]))
    w = np.asarray(state.params["blocks"][0]["query"]["w"], dtype=np.float32)
    np.testing.assert_allclose(np.linalg.norm(w, axis=0), 1.0, rtol=1e-4)
