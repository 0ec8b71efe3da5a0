"""Predictor + presets tests."""

import numpy as np
import pytest

from nvit_tpu.configs.schema import Config, DataConfig, SystemConfig, TrainingConfig, ViTConfig
from nvit_tpu.infer import Predictor
from nvit_tpu.models.presets import PRESETS, preset


def small_cfg(tmp_path):
    return Config(
        model=ViTConfig(
            image_size=16, n_layer=1, n_head=2, n_embd=32, num_classes=7,
            local_patch_size=4, global_patch_size=8, use_nvit=True,
            use_kohonen=False, flash_attn=False,
        ),
        training=TrainingConfig(batch_size=4),
        system=SystemConfig(use_ddp=False),
        data=DataConfig(out_dir=str(tmp_path)),
    )


def test_preset_lookup():
    cfg = ViTConfig(**preset("nvit-b16"), num_classes=1000)
    assert cfg.n_embd == 768 and cfg.n_layer == 12 and cfg.use_nvit
    with pytest.raises(KeyError):
        preset("nope")
    assert "nvit-l16" in PRESETS


def test_predictor_fresh(tmp_path):
    cfg = small_cfg(tmp_path)
    p = Predictor.from_config(cfg, compute_dtype=None)
    imgs = np.random.RandomState(0).randint(0, 256, (3, 3, 16, 16), dtype=np.uint8)
    probs = p.predict_probs(imgs)
    assert probs.shape == (3, 7)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)
    idx, pk = p.predict(imgs, top_k=3)
    assert idx.shape == (3, 3)
    assert (pk[:, 0] >= pk[:, 1]).all()


def test_predictor_from_checkpoint(tmp_path):
    from nvit_tpu.ckpt.checkpoint import save_checkpoint
    from nvit_tpu.train.state import create_train_state

    cfg = small_cfg(tmp_path)
    state = create_train_state(cfg)
    save_checkpoint(tmp_path, "checkpoint_best", state, cfg, {"val/loss": 1.0})
    p = Predictor.from_checkpoint(tmp_path, "checkpoint_best", compute_dtype=None)
    imgs = np.zeros((2, 3, 16, 16), dtype=np.uint8)
    probs = p.predict_probs(imgs)
    assert probs.shape == (2, 7)

    # predictions match the raw forward on the saved params
    import jax, jax.numpy as jnp
    from nvit_tpu.data.augment import normalize
    from nvit_tpu.models.vit import vit_apply

    ref = vit_apply(state.params, cfg.model, normalize(jnp.asarray(imgs))).logits
    ref_probs = np.asarray(jax.nn.softmax(ref.astype(jnp.float32), -1))
    np.testing.assert_allclose(probs, ref_probs, rtol=1e-4, atol=1e-6)


def test_predictor_data_parallel_matches_single_device(tmp_path):
    """Batch-sharded prediction over the 8-device CPU mesh ≡ single-device,
    including internal padding for batches that don't divide the mesh."""
    import jax

    cfg = small_cfg(tmp_path)
    single = Predictor.from_config(cfg, compute_dtype=None)
    dp = Predictor(single.params, cfg.model, compute_dtype=None, data_parallel=True)
    assert dp._batch_multiple == jax.device_count() >= 8
    rng = np.random.RandomState(3)
    for b in (3, 8, 16):  # 3 exercises the pad-and-slice path
        imgs = rng.randint(0, 256, (b, 3, 16, 16), dtype=np.uint8)
        np.testing.assert_allclose(
            dp.predict_probs(imgs), single.predict_probs(imgs), rtol=1e-5, atol=1e-6
        )


def test_predictor_data_parallel_flash_kernels(tmp_path):
    """Data-parallel Predictor with flash_attn=true: the Pallas kernels must
    be shard_mapped over the Predictor's data mesh (parallel/spmd.py) and
    match the XLA path.  Kernels run under the GENERIC interpreter (the
    mosaic multi-device interpreter deadlocks on large replicated shard_map
    operands — tests/spmd_checks.py)."""
    import dataclasses

    import jax

    from tests.kernel_force import force_on_tpu, generic_interpret_mode

    cfg = small_cfg(tmp_path)
    cfg_flash = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, flash_attn=True)
    )
    xla_ref = Predictor.from_config(cfg, compute_dtype=None)
    with force_on_tpu(), generic_interpret_mode():
        dp = Predictor(
            xla_ref.params, cfg_flash.model, compute_dtype=None, data_parallel=True
        )
        assert dp._batch_multiple == jax.device_count()
        imgs = np.random.RandomState(5).randint(0, 256, (8, 3, 16, 16), dtype=np.uint8)
        got = dp.predict_probs(imgs)
    np.testing.assert_allclose(got, xla_ref.predict_probs(imgs), rtol=1e-4, atol=1e-5)


def test_predictor_model_parallel_matches_single_device(tmp_path):
    """Tensor-parallel serving: the trunk sharded with the training-side
    Megatron rules (dp4×tp2 and pure tp8) must match single-device probs,
    and the weights must actually be sharded (the point is fitting a model
    bigger than one chip's HBM)."""
    cfg = small_cfg(tmp_path)
    single = Predictor.from_config(cfg, compute_dtype=None)
    imgs = np.random.RandomState(7).randint(0, 256, (5, 3, 16, 16), dtype=np.uint8)
    ref = single.predict_probs(imgs)

    for kw, shards in ((dict(data_parallel=True, model_parallel=2), 2), (dict(model_parallel=8), 8)):
        tp = Predictor(single.params, cfg.model, compute_dtype=None, **kw)
        np.testing.assert_allclose(tp.predict_probs(imgs), ref, rtol=1e-5, atol=1e-6)
        w = tp.params["blocks"][0]["c_fc"]["w"]
        assert w.addressable_shards[0].data.shape == (w.shape[0], w.shape[1] // shards)


def test_predictor_model_parallel_guards(tmp_path):
    """Idle devices and unsupported combinations are refused up front."""
    cfg = small_cfg(tmp_path)
    p = Predictor.from_config(cfg, compute_dtype=None)
    with pytest.raises(ValueError, match="idle"):
        Predictor(p.params, cfg.model, model_parallel=2)  # 6 of 8 devices idle
    with pytest.raises(ValueError, match="divisible"):
        Predictor(p.params, cfg.model, data_parallel=True, model_parallel=3)
    with pytest.raises(ValueError, match="quantize"):
        Predictor(p.params, cfg.model, data_parallel=True, model_parallel=2, quantize="int8")


def test_predictor_model_parallel_flash_kernels(tmp_path):
    """TP serving on the kernel path: attention heads shard over the model
    axis inside the shard_mapped Pallas call (parallel/spmd.py) — dp4×tp2
    predictions must match the single-device XLA path."""
    import dataclasses

    from tests.kernel_force import force_on_tpu, generic_interpret_mode

    cfg = small_cfg(tmp_path)
    cfg_flash = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, flash_attn=True))
    xla_ref = Predictor.from_config(cfg, compute_dtype=None)
    imgs = np.random.RandomState(9).randint(0, 256, (8, 3, 16, 16), dtype=np.uint8)
    with force_on_tpu(), generic_interpret_mode():
        tp = Predictor(
            xla_ref.params, cfg_flash.model, compute_dtype=None,
            data_parallel=True, model_parallel=2,
        )
        got = tp.predict_probs(imgs)
    np.testing.assert_allclose(got, xla_ref.predict_probs(imgs), rtol=1e-4, atol=1e-5)


def test_predictor_model_parallel_invalid_values(tmp_path):
    cfg = small_cfg(tmp_path)
    p = Predictor.from_config(cfg, compute_dtype=None)
    for bad in (0, -2):
        with pytest.raises(ValueError, match="model_parallel"):
            Predictor(p.params, cfg.model, data_parallel=True, model_parallel=bad)
