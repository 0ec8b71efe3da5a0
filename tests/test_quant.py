"""Int8 serving-path quantization (ops/quant.py): numerics, exact folds,
model-level closeness, and the Predictor integration.

Beyond-parity feature — the reference has no quantized inference; tolerance
targets are self-set: per-matmul relative error well under 1e-2 given nViT's
unit-norm columns/tokens, end-to-end logits within a few percent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nvit_tpu.configs.schema import Config, DataConfig, SystemConfig, TrainingConfig, ViTConfig
from nvit_tpu.core.layers import concat_linears, init_linear, linear
from nvit_tpu.infer import Predictor
from nvit_tpu.models.vit import init_vit, vit_apply
from nvit_tpu.ops.quant import (
    quantize_linear_params,
    quantize_vit_params,
    quantized_linear,
    quantized_size_bytes,
)


def tiny_cfg(**kw) -> ViTConfig:
    base = dict(
        image_size=16, n_layer=2, n_head=2, n_embd=32, num_classes=10,
        local_patch_size=4, global_patch_size=8, kohonen_nodes=18,
        bias=True, flash_attn=False,
    )
    base.update(kw)
    return ViTConfig(**base)


def rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12))


class TestQuantizedLinear:
    def test_weight_roundtrip_bound(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (64, 48)) * 0.3
        q = quantize_linear_params({"w": w})
        deq = q["wq"].astype(jnp.float32) * q["scale"]
        # symmetric rounding: per-element error <= scale/2 for its column
        err = np.abs(np.asarray(deq - w))
        bound = np.asarray(q["scale"]) / 2 + 1e-7
        assert (err <= bound[None, :]).all()

    def test_matmul_close_to_fp32(self):
        key = jax.random.PRNGKey(1)
        w = jax.random.normal(key, (128, 96)) * 0.05
        b = jax.random.normal(jax.random.PRNGKey(2), (96,)) * 0.01
        x = jax.random.normal(jax.random.PRNGKey(3), (4, 7, 128))
        # hypersphere-like rows (the serving regime)
        x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        y_fp = linear({"w": w, "b": b}, x)
        y_q = quantized_linear(quantize_linear_params({"w": w, "b": b}), x)
        assert y_q.dtype == x.dtype
        assert rel_err(y_q, y_fp) < 0.01

    def test_int32_accumulation_no_overflow(self):
        # worst case: all-127 operands over the largest contraction in the
        # flagship (8*1024 for nViT-L c_fc) stays far inside int32
        assert 127 * 127 * 8 * 1024 < 2**31 - 1
        x = jnp.ones((2, 512))
        w = jnp.ones((512, 8)) * 0.5
        y = quantized_linear(quantize_linear_params({"w": w}), x)
        np.testing.assert_allclose(np.asarray(y), 256.0, rtol=1e-6)

    def test_dispatch_via_linear(self):
        p = init_linear(jax.random.PRNGKey(0), 32, 16, bias=True)
        x = jax.random.normal(jax.random.PRNGKey(1), (5, 32))
        q = quantize_linear_params(p)
        np.testing.assert_allclose(
            np.asarray(linear(q, x)), np.asarray(quantized_linear(q, x)), rtol=0
        )
        # compute_dtype casts the activation before quantization (bf16 serving)
        y16 = linear(q, x, compute_dtype=jnp.bfloat16)
        assert y16.dtype == jnp.bfloat16

    def test_concat_matches_separate(self):
        ks = jax.random.split(jax.random.PRNGKey(4), 3)
        parts = [init_linear(k, 32, 24, bias=True) for k in ks]
        x = jax.random.normal(jax.random.PRNGKey(5), (6, 32))
        qparts = [quantize_linear_params(p) for p in parts]
        fused = quantized_linear(concat_linears(qparts), x)
        sep = jnp.concatenate([quantized_linear(q, x) for q in qparts], axis=-1)
        # per-column scales concatenate exactly -> bit-identical
        np.testing.assert_array_equal(np.asarray(fused), np.asarray(sep))

    def test_suv_fold_is_exact(self):
        # folding a per-output-column scale into `scale` after quantization
        # == quantizing the folded weight (models/blocks.py int8 suv path)
        w = jax.random.normal(jax.random.PRNGKey(6), (40, 20)) * 0.1
        suv = jnp.linspace(-1.5, 2.0, 20)  # mixed signs
        x = jax.random.normal(jax.random.PRNGKey(7), (3, 40))
        q = quantize_linear_params({"w": w})
        folded = {"wq": q["wq"], "scale": q["scale"] * suv}
        q_direct = quantize_linear_params({"w": w * suv})
        np.testing.assert_allclose(
            np.asarray(quantized_linear(folded, x)),
            np.asarray(quantized_linear(q_direct, x)),
            rtol=1e-6, atol=1e-7,
        )


class TestQuantizedModel:
    @pytest.mark.parametrize(
        "nvit,koh", [(False, False), (True, False), (True, True)],
        ids=["n0k0", "n1k0", "n1k1"],
    )
    def test_forward_close_all_profiles(self, nvit, koh):
        cfg = tiny_cfg(use_nvit=nvit, use_kohonen=koh)
        params = init_vit(jax.random.PRNGKey(0), cfg)
        qparams = quantize_vit_params(params)
        img = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 16, 16))
        out_fp = vit_apply(params, cfg, img)
        out_q = vit_apply(qparams, cfg, img)
        assert out_q.logits.shape == out_fp.logits.shape
        assert rel_err(out_q.logits, out_fp.logits) < 0.08

    def test_quantized_tree_is_smaller(self):
        cfg = tiny_cfg(use_nvit=True, use_kohonen=True)
        params = init_vit(jax.random.PRNGKey(0), cfg)
        q = quantize_vit_params(params)
        # linears dominate -> close to 4x smaller vs fp32
        assert quantized_size_bytes(q) < 0.45 * quantized_size_bytes(params)
        # non-linear leaves untouched (learned geometry stays fp32)
        np.testing.assert_array_equal(
            np.asarray(q["local_pos_embed"]), np.asarray(params["local_pos_embed"])
        )
        np.testing.assert_array_equal(
            np.asarray(q["blocks"][0]["sqk"]), np.asarray(params["blocks"][0]["sqk"])
        )


def small_config(tmp_path, **model_kw) -> Config:
    mk = dict(
        image_size=16, n_layer=1, n_head=2, n_embd=32, num_classes=7,
        local_patch_size=4, global_patch_size=8, use_nvit=True,
        use_kohonen=False, flash_attn=False,
    )
    mk.update(model_kw)
    return Config(
        model=ViTConfig(**mk),
        training=TrainingConfig(batch_size=4),
        system=SystemConfig(use_ddp=False),
        data=DataConfig(out_dir=str(tmp_path)),
    )


class TestPredictorInt8:
    def test_probs_close_to_fp(self, tmp_path):
        cfg = small_config(tmp_path)
        imgs = np.random.RandomState(0).randint(0, 256, (5, 3, 16, 16), dtype=np.uint8)
        p_fp = Predictor.from_config(cfg, compute_dtype=None)
        p_q = Predictor.from_config(cfg, compute_dtype=None, quantize="int8")
        probs_fp = p_fp.predict_probs(imgs)
        probs_q = p_q.predict_probs(imgs)
        np.testing.assert_allclose(probs_q.sum(-1), 1.0, rtol=1e-5)
        assert np.abs(probs_q - probs_fp).mean() < 0.02

    def test_data_parallel_matches_single_device(self, tmp_path):
        cfg = small_config(tmp_path)
        imgs = np.random.RandomState(1).randint(0, 256, (11, 3, 16, 16), dtype=np.uint8)
        p1 = Predictor.from_config(cfg, quantize="int8")
        p8 = Predictor.from_config(cfg, quantize="int8", data_parallel=True)
        np.testing.assert_allclose(
            p1.predict_probs(imgs), p8.predict_probs(imgs), atol=2e-3
        )

    def test_data_parallel_flash_kernels_int8(self, tmp_path):
        """int8 + flash kernels + data parallelism together: quantized linears
        are GSPMD-partitioned while the (bf16) attention kernel is shard_mapped
        over the Predictor mesh — must match the single-device int8 XLA path.
        Generic interpreter for the kernels (tests/kernel_force.py)."""
        import dataclasses

        from tests.kernel_force import force_on_tpu, generic_interpret_mode

        cfg = small_config(tmp_path)
        cfg_flash = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, flash_attn=True)
        )
        ref = Predictor.from_config(cfg, compute_dtype=None, quantize="int8")
        imgs = np.random.RandomState(7).randint(0, 256, (8, 3, 16, 16), dtype=np.uint8)
        with force_on_tpu(), generic_interpret_mode():
            dp = Predictor(
                ref.params, cfg_flash.model, compute_dtype=None, data_parallel=True
            )
            got = dp.predict_probs(imgs)
        np.testing.assert_allclose(got, ref.predict_probs(imgs), rtol=1e-3, atol=1e-4)

    def test_unknown_mode_raises(self, tmp_path):
        with pytest.raises(ValueError, match="quantize"):
            Predictor.from_config(small_config(tmp_path), quantize="int4")
