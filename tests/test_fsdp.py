"""FSDP (ZeRO-3-style) sharding on the virtual 8-device CPU mesh.

``system.fsdp`` shards the transformer-trunk weights AND their AdamW moments
over the ``data`` mesh axis (parallel/mesh.py) — per-device param+optimizer
memory scales down with data parallelism while GSPMD inserts the per-use
weight all-gathers and reduce-scatter gradients.  Beyond reference parity
(the reference is DDP-only, /root/reference/nvit/train.py:434-446); SURVEY.md
§2.3 extension rows.

These tests assert (a) exact spec/layout, (b) numerical equivalence with the
single-device step under dp8-fsdp and dp4×tp2-fsdp, (c) that the ZeRO layout
SURVIVES the donated train step (a propagation regression would silently
replicate everything back), (d) the in-step renorm stays exact under the
sharded layout, and (e) the Trainer-level wiring (config knobs, checkpoint
save/resume roundtrip with FSDP-sharded state).
"""

import dataclasses

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from nvit_tpu.parallel import (
    make_mesh,
    param_specs,
    shard_batch,
    shard_opt_state,
    shard_params,
)
from nvit_tpu.train import create_train_state, make_train_step

from test_parallel import batch, tiny_config


def _fsdp_state(state, mesh):
    return state._replace(
        params=shard_params(state.params, mesh, use_nvit=True, fsdp=True),
        opt_state=shard_opt_state(state.opt_state, mesh, use_nvit=True, fsdp=True),
    )


def test_fsdp_specs_and_layout():
    cfg = tiny_config()
    state = create_train_state(cfg)
    specs = param_specs(state.params, use_nvit=True, fsdp=True)
    assert specs["blocks"][0]["c_fc"]["w"] == P(None, ("model", "data"))
    assert specs["blocks"][0]["mlp_c_proj"]["w"] == P(("model", "data"), None)
    assert specs["head"]["w"] == P()  # non-trunk stays replicated

    mesh = make_mesh()  # dp8
    state = _fsdp_state(state, mesh)
    w = state.params["blocks"][0]["c_fc"]["w"]
    # 8-way sharded over the out axis: each device holds 1/8 of the columns
    assert w.addressable_shards[0].data.shape == (w.shape[0], w.shape[1] // 8)
    mu = state.opt_state.mu["blocks"][0]["c_fc"]["w"]
    nu = state.opt_state.nu["blocks"][0]["c_fc"]["w"]
    for m in (mu, nu):  # ZeRO: moments shard like their params
        assert m.addressable_shards[0].data.shape == (w.shape[0], w.shape[1] // 8)


@pytest.mark.parametrize("model_parallel", [1, 2], ids=["dp8_fsdp", "dp4_tp2_fsdp"])
def test_fsdp_step_matches_single_device(model_parallel):
    cfg = tiny_config()
    state = create_train_state(cfg)
    step_fn = make_train_step(cfg)
    imgs, labels = batch(0, cfg)

    ref_state, ref_metrics = jax.jit(step_fn)(state, imgs, labels)

    mesh = make_mesh(model_parallel=model_parallel)
    state_sh = _fsdp_state(state, mesh)
    with jax.set_mesh(mesh):
        new_state, metrics = jax.jit(step_fn)(
            state_sh, shard_batch(imgs, mesh), shard_batch(labels, mesh)
        )

    np.testing.assert_allclose(
        float(metrics["total_loss"]), float(ref_metrics["total_loss"]), rtol=1e-4
    )
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


def test_fsdp_with_grad_accumulation_matches_single_device():
    """FSDP under the lax.scan micro-batch loop: every micro-step re-gathers
    the sharded weights; the accumulated step must still match the unsharded
    one exactly."""
    cfg = tiny_config(use_kohonen=False)
    cfg = dataclasses.replace(
        cfg, training=dataclasses.replace(cfg.training, gradient_accumulation_steps=2)
    )
    state = create_train_state(cfg)
    step_fn = make_train_step(cfg)
    imgs, labels = batch(0, cfg)

    ref_state, ref_metrics = jax.jit(step_fn)(state, imgs, labels)

    mesh = make_mesh()
    state_sh = _fsdp_state(state, mesh)
    with jax.set_mesh(mesh):
        new_state, metrics = jax.jit(step_fn)(
            state_sh, shard_batch(imgs, mesh), shard_batch(labels, mesh)
        )
    np.testing.assert_allclose(
        float(metrics["total_loss"]), float(ref_metrics["total_loss"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(new_state.params["blocks"][0]["c_fc"]["w"]),
        np.asarray(ref_state.params["blocks"][0]["c_fc"]["w"]),
        rtol=1e-4,
        atol=1e-6,
    )


def test_fsdp_layout_survives_steps_and_renorm_holds():
    """Three donated steps: params/moments must STAY data-sharded (the ZeRO
    memory saving is per-step, not just at init) and the in-step renorm must
    produce exact unit norms along the (unsharded) renorm axis."""
    cfg = tiny_config(use_kohonen=False)
    state = _fsdp_state(create_train_state(cfg), make_mesh())
    mesh = make_mesh()
    step_fn = jax.jit(make_train_step(cfg))
    with jax.set_mesh(mesh):
        for i in range(3):
            imgs, labels = batch(i, cfg)
            state, metrics = step_fn(state, shard_batch(imgs, mesh), shard_batch(labels, mesh))
    assert np.isfinite(float(metrics["total_loss"]))

    w = state.params["blocks"][0]["c_fc"]["w"]
    assert w.addressable_shards[0].data.shape[1] == w.shape[1] // 8, (
        f"FSDP layout lost through the step: {w.sharding}"
    )
    mu = state.opt_state.mu["blocks"][0]["c_fc"]["w"]
    assert mu.addressable_shards[0].data.shape[1] == w.shape[1] // 8
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(state.params["blocks"][0]["query"]["w"], np.float32), axis=0),
        1.0,
        rtol=1e-4,
    )


def _trainer_cfg(tmp_path, **system_kw):
    from test_trainer import make_cfg

    cfg = make_cfg(tmp_path)
    system_kw.setdefault("use_ddp", True)
    return dataclasses.replace(
        cfg, system=dataclasses.replace(cfg.system, **system_kw)
    )


def test_trainer_fsdp_end_to_end(tmp_path):
    """Trainer with system.fsdp: short synthetic run trains, checkpoints, and
    resumes (npz device_get of data-sharded-but-addressable arrays)."""
    from nvit_tpu.train.trainer import Trainer

    cfg = _trainer_cfg(tmp_path, fsdp=True)
    t = Trainer(config=cfg)
    assert t.mesh is not None and t.mesh.shape["data"] == 8
    w = t.state.params["blocks"][0]["c_fc"]["w"]
    assert w.addressable_shards[0].data.shape[1] == w.shape[1] // 8
    t.train()
    assert t.iter_num == cfg.training.max_iters

    cfg2 = dataclasses.replace(
        cfg,
        training=dataclasses.replace(cfg.training, init_from="resume", max_iters=8),
        data=dataclasses.replace(cfg.data, checkpoint_dir=str(tmp_path / "out")),
    )
    t2 = Trainer(config=cfg2)
    assert int(t2.state.step) == cfg.training.max_iters
    w2 = t2.state.params["blocks"][0]["c_fc"]["w"]
    assert w2.addressable_shards[0].data.shape[1] == w2.shape[1] // 8
    t2.train()
    assert t2.iter_num == 8


def test_trainer_model_parallel_knob(tmp_path):
    from nvit_tpu.train.trainer import Trainer

    t = Trainer(config=_trainer_cfg(tmp_path, model_parallel=2))
    assert t.mesh.shape == {"data": 4, "model": 2}

    with pytest.raises(ValueError, match="model_parallel"):
        Trainer(config=_trainer_cfg(tmp_path, model_parallel=3))

    with pytest.raises(ValueError, match="model_parallel"):
        Trainer(config=_trainer_cfg(tmp_path, use_ddp=False, model_parallel=2))

    # fsdp without a mesh is a warned no-op, not an error (configs are shared
    # across host sizes; on one device there is nothing to shard)
    t3 = Trainer(config=_trainer_cfg(tmp_path, use_ddp=False, fsdp=True))
    assert t3.mesh is None
