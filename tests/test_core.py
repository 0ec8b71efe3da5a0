"""Unit tests for core numerics: norms, residuals, layers, schedules, losses.

Golden values are computed with independent numpy formulations (not the
reference's torch code).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nvit_tpu.configs.schema import OptimizerConfig, ViTConfig
from nvit_tpu.core import justnorm, layer_norm, linear, norm_skip, rms_norm, slerp_residual
from nvit_tpu.core.layers import init_linear
from nvit_tpu.models import losses as L
from nvit_tpu.models.schedules import cosine_lr, kohonen_lr


class TestJustnorm:
    def test_unit_norm(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 7, 16))
        y = justnorm(x)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(y), axis=-1), 1.0, rtol=1e-6)

    def test_matches_numpy(self):
        x = np.random.RandomState(0).randn(3, 5).astype(np.float32)
        expected = x / np.linalg.norm(x, axis=-1, keepdims=True)
        np.testing.assert_allclose(np.asarray(justnorm(jnp.asarray(x))), expected, rtol=1e-6)

    def test_bf16_roundtrip_dtype(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 8), dtype=jnp.bfloat16)
        assert justnorm(x).dtype == jnp.bfloat16


class TestRmsNorm:
    def test_matches_numpy(self):
        rng = np.random.RandomState(1)
        x = rng.randn(2, 3, 8).astype(np.float32)
        w = rng.rand(8).astype(np.float32)
        ms = np.mean(x * x, axis=-1, keepdims=True)
        expected = (x / np.sqrt(ms + 1e-6)) * w
        got = rms_norm(jnp.asarray(x), jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5)

    def test_unit_weight_gives_unit_rms(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (16, 32)) * 3.0
        y = np.asarray(rms_norm(x, jnp.ones(32)))
        np.testing.assert_allclose(np.sqrt(np.mean(y * y, axis=-1)), 1.0, rtol=1e-4)


class TestLayerNorm:
    def test_zero_mean_unit_var(self):
        x = jax.random.normal(jax.random.PRNGKey(3), (4, 16)) * 5 + 2
        y = np.asarray(layer_norm(x, jnp.ones(16), jnp.zeros(16)))
        np.testing.assert_allclose(y.mean(-1), 0.0, atol=1e-5)
        np.testing.assert_allclose(y.std(-1), 1.0, atol=1e-2)


class TestSlerpResidual:
    def test_output_on_sphere(self):
        key = jax.random.PRNGKey(4)
        h = jax.random.normal(key, (2, 5, 32))
        upd = jax.random.normal(jax.random.fold_in(key, 1), (2, 5, 32))
        alpha = 0.03125 * jnp.ones(32)
        out = slerp_residual(h, upd, alpha, 0.05, 0.03125)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1), 1.0, rtol=1e-5)

    def test_zero_alpha_returns_norm_h(self):
        h = jax.random.normal(jax.random.PRNGKey(5), (3, 8))
        upd = jax.random.normal(jax.random.PRNGKey(6), (3, 8))
        out = slerp_residual(h, upd, jnp.zeros(8), 0.05, 0.03125)
        np.testing.assert_allclose(np.asarray(out), np.asarray(justnorm(h)), rtol=1e-5)

    def test_negative_alpha_same_as_positive(self):
        # |lr| is taken (≙ reference model.py:136)
        h = jax.random.normal(jax.random.PRNGKey(7), (3, 8))
        upd = jax.random.normal(jax.random.PRNGKey(8), (3, 8))
        a = 0.01 * jnp.ones(8)
        np.testing.assert_allclose(
            np.asarray(slerp_residual(h, upd, a, 0.05, 0.03125)),
            np.asarray(slerp_residual(h, upd, -a, 0.05, 0.03125)),
            rtol=1e-6,
        )


class TestNormSkip:
    def test_on_sphere_and_formula(self):
        h_new = jax.random.normal(jax.random.PRNGKey(9), (2, 4, 16))
        h = jax.random.normal(jax.random.PRNGKey(10), (2, 4, 16))
        skip = jnp.asarray([1.7])
        out = np.asarray(norm_skip(h_new, h, skip))
        raw = np.asarray(h_new) * 1.7 + np.asarray(h)
        expected = raw / np.linalg.norm(raw, axis=-1, keepdims=True)
        np.testing.assert_allclose(out, expected, rtol=1e-5)


class TestLinear:
    def test_matmul_and_bias(self):
        p = init_linear(jax.random.PRNGKey(0), 4, 3, bias=True)
        x = jnp.ones((2, 4))
        expected = np.ones((2, 4)) @ np.asarray(p["w"]) + np.asarray(p["b"])
        np.testing.assert_allclose(np.asarray(linear(p, x)), expected, rtol=1e-5, atol=1e-6)

    def test_compute_dtype_cast(self):
        p = init_linear(jax.random.PRNGKey(0), 4, 3, bias=True)
        y = linear(p, jnp.ones((2, 4)), compute_dtype=jnp.bfloat16)
        assert y.dtype == jnp.bfloat16


class TestSchedules:
    def test_cosine_lr_endpoints(self):
        opt = OptimizerConfig(learning_rate=1e-3, min_lr=1e-5, warmup_iters=100, lr_decay_iters=1000)
        assert float(cosine_lr(opt, 0)) == 0.0
        np.testing.assert_allclose(float(cosine_lr(opt, 50)), 0.5e-3, rtol=1e-6)
        np.testing.assert_allclose(float(cosine_lr(opt, 100)), 1e-3, rtol=1e-6)
        np.testing.assert_allclose(float(cosine_lr(opt, 2000)), 1e-5, rtol=1e-6)
        # midpoint of decay: mean of base and min
        np.testing.assert_allclose(float(cosine_lr(opt, 550)), (1e-3 + 1e-5) / 2, rtol=1e-5)

    def test_cosine_lr_no_decay(self):
        opt = OptimizerConfig(learning_rate=3e-4, decay_lr=False)
        assert float(cosine_lr(opt, 12345)) == pytest.approx(3e-4)

    def test_kohonen_lr_disabled_constant(self):
        cfg = ViTConfig(kohonen_scheduler_enabled=False, kohonen_alpha=0.02)
        assert float(kohonen_lr(cfg, 0)) == pytest.approx(0.02)
        assert float(kohonen_lr(cfg, 99999)) == pytest.approx(0.02)

    def test_kohonen_lr_schedule_shape(self):
        cfg = ViTConfig(
            kohonen_scheduler_enabled=True,
            kohonen_alpha=0.02,
            kohonen_scheduler_warmup_steps=100,
            kohonen_scheduler_decay_steps=1000,
            kohonen_scheduler_min_lr=0.001,
        )
        # warmup starts at min_lr and rises linearly (≙ model.py:573-575)
        np.testing.assert_allclose(float(kohonen_lr(cfg, 0)), 0.001, rtol=1e-6)
        np.testing.assert_allclose(float(kohonen_lr(cfg, 50)), 0.001 + 0.019 * 0.5, rtol=1e-5)
        np.testing.assert_allclose(float(kohonen_lr(cfg, 100)), 0.02, rtol=1e-5)
        np.testing.assert_allclose(float(kohonen_lr(cfg, 5000)), 0.001, rtol=1e-6)


class TestLosses:
    def test_cross_entropy_uniform(self):
        logits = jnp.zeros((4, 10))
        labels = jnp.array([0, 3, 5, 9])
        np.testing.assert_allclose(float(L.cross_entropy(logits, labels)), np.log(10), rtol=1e-6)

    def test_cross_entropy_matches_numpy(self):
        rng = np.random.RandomState(2)
        logits = rng.randn(8, 5).astype(np.float32)
        labels = rng.randint(0, 5, size=8)
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        expected = -np.mean(np.log(p[np.arange(8), labels]))
        got = float(L.cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_huber_quadratic_and_linear(self):
        pred = jnp.array([0.0, 0.0])
        tgt = jnp.array([0.5, 3.0])
        # 0.5*0.25 and (3 - 0.5) averaged
        expected = (0.125 + 2.5) / 2
        np.testing.assert_allclose(float(L.huber_loss(pred, tgt)), expected, rtol=1e-6)

    def test_consistency_identical_is_zero(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 8))
        assert float(L.consistency_loss(x, x)) == pytest.approx(0.0, abs=1e-6)

    def test_consistency_opposite_is_two(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 8))
        assert float(L.consistency_loss(x, -x)) == pytest.approx(2.0, abs=1e-5)

    def test_neighbor_indices_wrap(self):
        # 4x4 map (16 nodes); node 0 at (0,0): neighbors wrap modulo 4
        neigh = np.asarray(L.neighbor_indices(jnp.array([0]), 4, 4))[0]
        # offsets (-1,-1)..(1,1) of (0,0) → rows/cols in {3,0,1}
        expected = np.array([3 * 4 + 3, 3 * 4 + 0, 3 * 4 + 1, 0 * 4 + 3, 0 * 4 + 1, 1 * 4 + 3, 1 * 4 + 0, 1 * 4 + 1])
        np.testing.assert_array_equal(np.sort(neigh), np.sort(expected))

    def test_neighbor_indices_rect_grid(self):
        # 5x6 grid (reference default: 32 nodes/map → 5x6=30 grid); interior node
        neigh = np.asarray(L.neighbor_indices(jnp.array([7]), 5, 6))[0]  # (1,1)
        expected = np.array([0, 1, 2, 6, 8, 12, 13, 14])
        np.testing.assert_array_equal(np.sort(neigh), expected)

    def test_degenerate_inputs_keep_gradients_finite(self):
        """Collapsed SOM codebooks (bit-identical nodes) and zero reprs must
        not NaN the step: d‖x‖/dx at x=0 is 0/0, and the 'sum' Hebbian
        magnitude really did collapse the flagship codebook on the chip
        (BASELINE.md round-4 soak — loss NaN'd at iter ~505).  Same latent
        hazard exists in the reference's torch.norm smoothness."""
        nodes = jnp.ones((16, 8), jnp.float32)  # every neighbor distance == 0
        idx = jnp.zeros((32,), jnp.int32)
        loss = float(L.map_smoothness(nodes, idx, 4, 4))
        g = jax.grad(lambda n: L.map_smoothness(n, idx, 4, 4))(nodes)
        assert loss == 0.0 and bool(jnp.isfinite(g).all())

        z = jnp.zeros((4, 8))
        o = jax.random.normal(jax.random.PRNGKey(2), (4, 8))
        gz = jax.grad(lambda a: L.consistency_loss(a, o))(z)
        # must be exactly 0, not merely finite: a denominator-only clamp
        # yields ~upstream/1e-12 here, which saturates global grad clipping
        # and zeroes every other parameter's step
        assert bool((gz == 0.0).all())

        # guards must not change values on non-degenerate inputs
        a = jax.random.normal(jax.random.PRNGKey(3), (4, 8))
        ref = 1.0 - jnp.mean(jnp.sum(
            (a / jnp.linalg.norm(a, axis=-1, keepdims=True))
            * (o / jnp.linalg.norm(o, axis=-1, keepdims=True)), -1))
        assert float(L.consistency_loss(a, o)) == pytest.approx(float(ref), abs=1e-7)

    def test_topk_accuracy(self):
        logits = jnp.asarray(np.eye(4, 6, dtype=np.float32) * 10)  # argmax = diag
        labels = jnp.array([0, 1, 2, 0])  # 3 of 4 top-1 correct
        top1, top5 = L.topk_accuracy(logits, labels)
        assert float(top1) == pytest.approx(75.0)
        assert float(top5) >= 75.0


class TestResidualCustomVJP:
    """The analytic custom VJPs of slerp_residual / norm_skip must match the
    autodiff of the composed primitives (value bit-exact, grads to rounding)."""

    @staticmethod
    def _slerp_composed(h, upd, alpha, iv=0.05, isc=0.03125):
        lr = jnp.abs(alpha.astype(jnp.float32) * (iv / isc))
        a = justnorm(h)
        b = justnorm(upd)
        return justnorm(a + lr.astype(a.dtype) * (b - a))

    def test_slerp_value_and_grads_match_autodiff(self):
        rs = np.random.RandomState(11)
        h = jnp.asarray(rs.randn(4, 6, 8).astype(np.float32))
        upd = jnp.asarray(rs.randn(4, 6, 8).astype(np.float32))
        alpha = jnp.asarray(0.03125 + 0.01 * rs.randn(8).astype(np.float32))

        np.testing.assert_array_equal(
            np.asarray(slerp_residual(h, upd, alpha, 0.05, 0.03125)),
            np.asarray(self._slerp_composed(h, upd, alpha)),
        )

        def loss_custom(h, upd, alpha):
            return jnp.sum(jnp.sin(slerp_residual(h, upd, alpha, 0.05, 0.03125)))

        def loss_ref(h, upd, alpha):
            return jnp.sum(jnp.sin(self._slerp_composed(h, upd, alpha)))

        gc = jax.grad(loss_custom, argnums=(0, 1, 2))(h, upd, alpha)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(h, upd, alpha)
        for name, a, b in zip(("h", "h_update", "alpha"), gc, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
                err_msg=f"slerp grad d{name}",
            )

    def test_slerp_negative_alpha_grad(self):
        """|α·c| kinks at 0 — sign handling must match autodiff for α<0."""
        rs = np.random.RandomState(12)
        h = jnp.asarray(rs.randn(2, 3, 8).astype(np.float32))
        upd = jnp.asarray(rs.randn(2, 3, 8).astype(np.float32))
        alpha = jnp.asarray(-0.03 + 0.01 * rs.randn(8).astype(np.float32))

        gc = jax.grad(lambda a: jnp.sum(slerp_residual(h, upd, a, 0.05, 0.03125)))(alpha)
        gr = jax.grad(lambda a: jnp.sum(self._slerp_composed(h, upd, a)))(alpha)
        np.testing.assert_allclose(np.asarray(gc), np.asarray(gr), rtol=1e-5, atol=1e-6)

    def test_norm_skip_value_and_grads_match_autodiff(self):
        rs = np.random.RandomState(13)
        h_new = jnp.asarray(rs.randn(4, 6, 8).astype(np.float32))
        h = jnp.asarray(rs.randn(4, 6, 8).astype(np.float32))
        skip = jnp.asarray(np.array([1.1], dtype=np.float32))

        def composed(h_new, h, skip):
            return justnorm(h_new * skip.astype(h_new.dtype) + h)

        np.testing.assert_array_equal(
            np.asarray(norm_skip(h_new, h, skip)), np.asarray(composed(h_new, h, skip))
        )

        def loss_custom(h_new, h, skip):
            return jnp.sum(jnp.cos(norm_skip(h_new, h, skip)))

        def loss_ref(h_new, h, skip):
            return jnp.sum(jnp.cos(composed(h_new, h, skip)))

        gc = jax.grad(loss_custom, argnums=(0, 1, 2))(h_new, h, skip)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(h_new, h, skip)
        for name, a, b in zip(("h_new", "h", "skip"), gc, gr):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
                err_msg=f"norm_skip grad d{name}",
            )

    def test_bf16_values_match_composed(self):
        rs = np.random.RandomState(14)
        h = jnp.asarray(rs.randn(2, 4, 8), jnp.bfloat16)
        upd = jnp.asarray(rs.randn(2, 4, 8), jnp.bfloat16)
        alpha = jnp.asarray(0.03125 * np.ones(8, np.float32))
        np.testing.assert_array_equal(
            np.asarray(slerp_residual(h, upd, alpha, 0.05, 0.03125), np.float32),
            np.asarray(self._slerp_composed(h, upd, alpha), np.float32),
        )
