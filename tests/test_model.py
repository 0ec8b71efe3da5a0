"""Model tests: patch embeds, blocks, cross-attention, full ViT forward in all
profile-matrix modes (n0k0 baseline, n1k0 nViT, n1k1 nViT+Kohonen)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nvit_tpu.configs.schema import ViTConfig
from nvit_tpu.models import (
    block_apply,
    init_block,
    init_cross_attention,
    cross_attention_apply,
    init_vit,
    num_params,
    total_loss,
    vit_apply,
)
from nvit_tpu.models.patch import extract_overlapping_patches, reflect_pad, space_to_depth
from nvit_tpu.ops.attention import sdpa_xla


def tiny_cfg(**kw) -> ViTConfig:
    base = dict(
        image_size=16,
        n_layer=2,
        n_head=2,
        n_embd=32,
        num_classes=10,
        local_patch_size=4,
        global_patch_size=8,
        kohonen_nodes=18,  # 9 per map → 3x3 grids
        bias=True,
        flash_attn=False,
    )
    base.update(kw)
    return ViTConfig(**base)


class TestPatch:
    def test_space_to_depth_layout(self):
        # 1x1 channel image: tokens must tile row-major with (C, ph, pw) layout
        img = jnp.arange(16.0).reshape(1, 1, 4, 4)
        tok = space_to_depth(img, 2)  # [1, 4, 4]
        np.testing.assert_array_equal(np.asarray(tok[0, 0]), [0, 1, 4, 5])
        np.testing.assert_array_equal(np.asarray(tok[0, 1]), [2, 3, 6, 7])
        np.testing.assert_array_equal(np.asarray(tok[0, 3]), [10, 11, 14, 15])

    def test_space_to_depth_channel_major(self):
        img = jnp.stack([jnp.zeros((2, 2)), jnp.ones((2, 2))])[None]  # [1,2,2,2]
        tok = space_to_depth(img, 2)  # [1, 1, 8]
        np.testing.assert_array_equal(np.asarray(tok[0, 0]), [0, 0, 0, 0, 1, 1, 1, 1])

    def test_overlapping_patches_match_space_to_depth_when_disjoint(self):
        img = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 8, 8))
        a = extract_overlapping_patches(img, 4, 4)
        b = space_to_depth(img, 4)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    def test_overlapping_token_count(self):
        img = jnp.zeros((1, 3, 16, 16))
        padded = reflect_pad(img, 2)  # 20x20; k=8, s=4 → 4x4 grid
        p = extract_overlapping_patches(padded, 8, 4)
        assert p.shape == (1, 16, 3 * 64)

    def test_reflect_pad_matches_numpy(self):
        img = jnp.arange(9.0).reshape(1, 1, 3, 3)
        out = np.asarray(reflect_pad(img, 1))
        expected = np.pad(np.arange(9.0).reshape(3, 3), 1, mode="reflect")
        np.testing.assert_array_equal(out[0, 0], expected)

    def test_local_global_token_grids_align(self):
        cfg = tiny_cfg()
        img = jnp.zeros((2, 3, cfg.image_size, cfg.image_size))
        local = space_to_depth(img, cfg.local_patch_size)
        pad = (cfg.global_patch_size - cfg.local_patch_size) // 2
        glob = extract_overlapping_patches(reflect_pad(img, pad), cfg.global_patch_size, cfg.local_patch_size)
        assert local.shape[1] == glob.shape[1] == cfg.n_patches


class TestAttention:
    def test_softmax_rows_via_uniform_values(self):
        q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 5, 8))
        k = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 5, 8))
        v = jnp.ones((1, 2, 5, 8))
        out = sdpa_xla(q, k, v, 0.35)
        np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-5)  # convex comb of ones

    def test_matches_numpy_reference(self):
        rng = np.random.RandomState(0)
        q = rng.randn(1, 1, 4, 8).astype(np.float32)
        k = rng.randn(1, 1, 6, 8).astype(np.float32)
        v = rng.randn(1, 1, 6, 8).astype(np.float32)
        scale = 2.83
        logits = q[0, 0] @ k[0, 0].T * scale
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        expected = p @ v[0, 0]
        got = np.asarray(sdpa_xla(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale))[0, 0]
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


class TestBlock:
    def test_baseline_shapes_and_finite(self):
        cfg = tiny_cfg(use_nvit=False)
        p = init_block(jax.random.PRNGKey(0), cfg)
        assert "rmsnorm_att" in p and "sqk" not in p
        h = jax.random.normal(jax.random.PRNGKey(1), (2, 16, cfg.n_embd))
        out = block_apply(p, cfg, h)
        assert out.shape == h.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_nvit_output_on_sphere(self):
        cfg = tiny_cfg(use_nvit=True)
        p = init_block(jax.random.PRNGKey(0), cfg)
        assert "sqk" in p and "rmsnorm_att" not in p
        h = jax.random.normal(jax.random.PRNGKey(1), (2, 16, cfg.n_embd))
        out = block_apply(p, cfg, h)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1), 1.0, rtol=1e-5)

    def test_param_shapes(self):
        cfg = tiny_cfg(use_nvit=True)
        p = init_block(jax.random.PRNGKey(0), cfg)
        d = cfg.n_embd
        assert p["c_fc"]["w"].shape == (d, 8 * d)
        assert p["mlp_c_proj"]["w"].shape == (4 * d, d)
        assert p["suv"].shape == (8 * d,)
        assert p["sqk"].shape == (d,)
        assert p["skip_param"].shape == (1,)

    def test_no_bias_config(self):
        cfg = tiny_cfg(bias=False)
        p = init_block(jax.random.PRNGKey(0), cfg)
        assert "b" not in p["query"]


class TestCrossAttention:
    def test_baseline(self):
        cfg = tiny_cfg(use_nvit=False)
        p = init_cross_attention(jax.random.PRNGKey(0), cfg)
        assert "local_norm" in p
        local = jax.random.normal(jax.random.PRNGKey(1), (2, 16, cfg.n_embd))
        glob = jax.random.normal(jax.random.PRNGKey(2), (2, 16, cfg.n_embd))
        out = cross_attention_apply(p, cfg, local, glob)
        assert out.shape == local.shape

    def test_nvit_on_sphere(self):
        cfg = tiny_cfg(use_nvit=True)
        p = init_cross_attention(jax.random.PRNGKey(0), cfg)
        local = jax.random.normal(jax.random.PRNGKey(1), (2, 16, cfg.n_embd))
        glob = jax.random.normal(jax.random.PRNGKey(2), (2, 16, cfg.n_embd))
        out = cross_attention_apply(p, cfg, local, glob)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1), 1.0, rtol=1e-5)


@pytest.mark.parametrize(
    "use_nvit,use_kohonen",
    [(False, False), (True, False), (True, True)],
    ids=["n0k0", "n1k0", "n1k1"],
)
class TestViTForward:
    """The three-profile experiment matrix (≙ reference profiles/*.env)."""

    def test_forward(self, use_nvit, use_kohonen):
        cfg = tiny_cfg(use_nvit=use_nvit, use_kohonen=use_kohonen)
        params = init_vit(jax.random.PRNGKey(0), cfg)
        img = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 16, 16))
        out = vit_apply(params, cfg, img, step=0, train=True)
        assert out.logits.shape == (2, cfg.num_classes)
        assert np.isfinite(np.asarray(out.logits)).all()
        assert "reconstruction" in out.aux_losses
        if use_kohonen:
            for k in ("kohonen_consistency", "kohonen_smoothness", "local_quantization", "global_quantization"):
                assert k in out.aux_losses, k
            assert out.som_info["local_delta"].shape == params["local_kohonen"]["nodes"].shape
        else:
            assert out.som_info == {}

    def test_eval_mode_no_som_delta(self, use_nvit, use_kohonen):
        cfg = tiny_cfg(use_nvit=use_nvit, use_kohonen=use_kohonen)
        params = init_vit(jax.random.PRNGKey(0), cfg)
        img = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 16, 16))
        out = vit_apply(params, cfg, img, step=5, train=False)
        assert "local_delta" not in out.som_info

    def test_total_loss_scalar_and_grad(self, use_nvit, use_kohonen):
        cfg = tiny_cfg(use_nvit=use_nvit, use_kohonen=use_kohonen)
        params = init_vit(jax.random.PRNGKey(0), cfg)
        img = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 16, 16))
        labels = jnp.array([1, 7])

        def loss_fn(p):
            out = vit_apply(p, cfg, img, step=0, train=True)
            loss, _ = total_loss(cfg, 0.1, 0.1, out.logits, labels, out.aux_losses)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(loss))
        flat = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in flat)
        # at least the head weight must receive gradient
        assert float(jnp.abs(grads["head"]["w"]).sum()) > 0

    def test_jit_compiles(self, use_nvit, use_kohonen):
        cfg = tiny_cfg(use_nvit=use_nvit, use_kohonen=use_kohonen)
        params = init_vit(jax.random.PRNGKey(0), cfg)
        img = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 16, 16))
        fn = jax.jit(lambda p, x, s: vit_apply(p, cfg, x, step=s, train=True).logits)
        a = fn(params, img, 0)
        b = vit_apply(params, cfg, img, step=0, train=True).logits
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)


class TestViTDetails:
    def test_sz_scales_logits(self):
        cfg = tiny_cfg(use_nvit=True)
        params = init_vit(jax.random.PRNGKey(0), cfg)
        img = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 16, 16))
        base = vit_apply(params, cfg, img).logits
        params2 = dict(params)
        params2["sz"] = params["sz"] * 2.0
        doubled = vit_apply(params2, cfg, img).logits
        np.testing.assert_allclose(np.asarray(doubled), 2 * np.asarray(base), rtol=1e-5)

    def test_baseline_has_no_sz(self):
        cfg = tiny_cfg(use_nvit=False)
        params = init_vit(jax.random.PRNGKey(0), cfg)
        assert "sz" not in params

    def test_param_count_reasonable(self):
        cfg = tiny_cfg(use_nvit=True, use_kohonen=True)
        n = num_params(init_vit(jax.random.PRNGKey(0), cfg))
        assert 50_000 < n < 500_000

    def test_reconstruction_loss_only_weighted_with_kohonen(self):
        # loss weighting parity with train.py:906-926
        cfg0 = tiny_cfg(use_kohonen=False)
        params = init_vit(jax.random.PRNGKey(0), cfg0)
        img = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 16, 16))
        labels = jnp.array([0, 1])
        out = vit_apply(params, cfg0, img, train=True)
        loss, terms = total_loss(cfg0, 0.1, 0.1, out.logits, labels, out.aux_losses)
        np.testing.assert_allclose(float(loss), float(terms["class_loss"]), rtol=1e-6)

    def test_bf16_compute(self):
        cfg = tiny_cfg(use_nvit=True, use_kohonen=True)
        params = init_vit(jax.random.PRNGKey(0), cfg)
        img = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 16, 16))
        out = vit_apply(params, cfg, img, train=True, compute_dtype=jnp.bfloat16)
        assert np.isfinite(np.asarray(out.logits, dtype=np.float32)).all()

    def test_deterministic(self):
        cfg = tiny_cfg(use_nvit=True, use_kohonen=True)
        params = init_vit(jax.random.PRNGKey(0), cfg)
        img = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 16, 16))
        a = vit_apply(params, cfg, img, train=True).logits
        b = vit_apply(params, cfg, img, train=True).logits
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
