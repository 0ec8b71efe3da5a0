"""Train-step tests: optimizer groups, renorm invariants, SOM Hebbian channel,
gradient accumulation, and loss decrease on a tiny synthetic task."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nvit_tpu.configs.schema import Config, OptimizerConfig, TrainingConfig, ViTConfig
from nvit_tpu.ops.renorm import RENORM_AXES, renorm_params
from nvit_tpu.train import (
    create_train_state,
    decay_mask,
    make_eval_step,
    make_train_step,
)


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
        training=TrainingConfig(batch_size=8, consistency_weight=0.1, smoothness_weight=0.1),
        optimizer=OptimizerConfig(learning_rate=1e-3, warmup_iters=2, lr_decay_iters=100),
    )


def batch(key, cfg, b=8):
    k1, k2 = jax.random.split(jax.random.PRNGKey(key))
    imgs = jax.random.normal(k1, (b, 3, cfg.model.image_size, cfg.model.image_size))
    labels = jax.random.randint(k2, (b,), 0, cfg.model.num_classes)
    return imgs, labels


class TestDecayMask:
    def test_matrices_decay_vectors_dont(self):
        cfg = tiny_config()
        state = create_train_state(cfg)
        mask = decay_mask(state.params)
        assert mask["head"]["w"] is True
        assert mask["head"]["b"] is False
        assert mask["blocks"][0]["sqk"] is False  # scale vectors: no decay
        assert mask["blocks"][0]["c_fc"]["w"] is True
        if "sz" in mask:
            assert mask["sz"] is False  # ≙ reference sz no-decay group


class TestRenorm:
    def test_renorm_unit_norms(self):
        cfg = tiny_config()
        state = create_train_state(cfg)
        # perturb then renorm
        params = jax.tree_util.tree_map(lambda p: p * 1.7 + 0.1, state.params)
        params = renorm_params(params)
        for bp in params["blocks"]:
            for name, axis in RENORM_AXES.items():
                w = np.asarray(bp[name]["w"], dtype=np.float32)
                norms = np.linalg.norm(w, axis=axis)
                np.testing.assert_allclose(norms, 1.0, rtol=1e-5, err_msg=name)

    def test_renorm_leaves_other_params(self):
        cfg = tiny_config()
        state = create_train_state(cfg)
        params = renorm_params(state.params)
        np.testing.assert_array_equal(
            np.asarray(params["cross_attention"]["q_local"]["w"]),
            np.asarray(state.params["cross_attention"]["q_local"]["w"]),
        )
        np.testing.assert_array_equal(np.asarray(params["head"]["w"]), np.asarray(state.params["head"]["w"]))


class TestTrainStep:
    @pytest.mark.parametrize("use_nvit,use_kohonen", [(False, False), (True, False), (True, True)], ids=["n0k0", "n1k0", "n1k1"])
    def test_step_runs_and_advances(self, use_nvit, use_kohonen):
        cfg = tiny_config(use_nvit=use_nvit, use_kohonen=use_kohonen)
        state = create_train_state(cfg)
        step_fn = jax.jit(make_train_step(cfg))
        imgs, labels = batch(0, cfg)
        new_state, metrics = step_fn(state, imgs, labels)
        assert int(new_state.step) == 1
        assert np.isfinite(float(metrics["total_loss"]))
        assert float(metrics["grad_norm"]) > 0

    def test_nvit_weights_stay_unit_after_step(self):
        cfg = tiny_config(use_nvit=True, use_kohonen=False)
        state = create_train_state(cfg)
        step_fn = jax.jit(make_train_step(cfg))
        imgs, labels = batch(1, cfg)
        for _ in range(3):
            state, _ = step_fn(state, imgs, labels)
        for bp in state.params["blocks"]:
            for name, axis in RENORM_AXES.items():
                w = np.asarray(bp[name]["w"], dtype=np.float32)
                np.testing.assert_allclose(np.linalg.norm(w, axis=axis), 1.0, rtol=1e-4, err_msg=name)

    def test_som_nodes_receive_hebbian_update(self):
        cfg = tiny_config(use_nvit=True, use_kohonen=True)
        # zero LR isolates the Hebbian channel from the AdamW channel
        cfg = dataclasses.replace(
            cfg, optimizer=OptimizerConfig(learning_rate=0.0, min_lr=0.0, warmup_iters=0, lr_decay_iters=1, grad_clip=0.0, weight_decay=0.0)
        )
        state = create_train_state(cfg)
        step_fn = jax.jit(make_train_step(cfg))
        imgs, labels = batch(2, cfg)
        before = np.asarray(state.params["local_kohonen"]["nodes"])
        state, _ = step_fn(state, imgs, labels)
        after = np.asarray(state.params["local_kohonen"]["nodes"])
        assert np.abs(after - before).max() > 1e-6  # nodes moved without gradients

    def test_grad_accumulation_matches_full_batch(self):
        cfg1 = tiny_config(use_nvit=True, use_kohonen=True)
        cfg2 = dataclasses.replace(
            cfg1, training=dataclasses.replace(cfg1.training, gradient_accumulation_steps=2)
        )
        s1 = create_train_state(cfg1)
        s2 = create_train_state(cfg2)
        imgs, labels = batch(3, cfg1)
        n1, m1 = jax.jit(make_train_step(cfg1))(s1, imgs, labels)
        n2, m2 = jax.jit(make_train_step(cfg2))(s2, imgs, labels)
        # same data, averaged micro-grads ≈ full-batch grad is NOT exact for
        # mean-based losses over different micro-batches, but loss terms
        # should be very close and params must stay finite and unit-normed.
        assert np.isfinite(float(m2["total_loss"]))
        for bp in n2.params["blocks"]:
            w = np.asarray(bp["query"]["w"], dtype=np.float32)
            np.testing.assert_allclose(np.linalg.norm(w, axis=0), 1.0, rtol=1e-4)

    def test_loss_decreases_overfit_tiny(self):
        """Integration: memorize an 8-image batch (loss must drop markedly)."""
        cfg = tiny_config(use_nvit=True, use_kohonen=False)
        cfg = dataclasses.replace(
            cfg, optimizer=OptimizerConfig(learning_rate=3e-3, min_lr=3e-3, warmup_iters=0, lr_decay_iters=10**6)
        )
        state = create_train_state(cfg)
        step_fn = jax.jit(make_train_step(cfg))
        imgs, labels = batch(4, cfg)
        _, first = step_fn(state, imgs, labels)
        for _ in range(60):
            state, metrics = step_fn(state, imgs, labels)
        assert float(metrics["total_loss"]) < 0.5 * float(first["total_loss"]), (
            f"loss did not decrease: {float(first['total_loss'])} → {float(metrics['total_loss'])}"
        )

    def test_lr_metric_matches_schedule(self):
        cfg = tiny_config()
        state = create_train_state(cfg)
        step_fn = jax.jit(make_train_step(cfg))
        imgs, labels = batch(5, cfg)
        _, metrics = step_fn(state, imgs, labels)
        assert float(metrics["learning_rate"]) == pytest.approx(0.0)  # warmup step 0


class TestEvalStep:
    def test_eval_metrics(self):
        cfg = tiny_config()
        state = create_train_state(cfg)
        eval_fn = jax.jit(make_eval_step(cfg))
        imgs, labels = batch(6, cfg)
        metrics = eval_fn(state.params, imgs, labels)
        for k in ("loss", "top1_accuracy", "top5_accuracy", "class_loss"):
            assert k in metrics
        assert 0.0 <= float(metrics["top1_accuracy"]) <= 100.0


class TestFusedAdamWRenorm:
    """The single-sweep fused update must be numerically EQUAL to the previous
    optax.chain(clip_by_global_norm, adamw) + renorm_params composition."""

    @staticmethod
    def _setup(seed=0):
        import dataclasses as dc

        from nvit_tpu.configs.schema import Config, OptimizerConfig, ViTConfig
        from nvit_tpu.train.state import create_train_state

        cfg = Config(
            model=ViTConfig(
                image_size=16, n_layer=2, n_head=2, n_embd=32, num_classes=10,
                local_patch_size=4, global_patch_size=8, use_nvit=True,
            ),
            optimizer=OptimizerConfig(
                learning_rate=1e-3, warmup_iters=2, lr_decay_iters=50, grad_clip=1.0
            ),
        )
        state = create_train_state(cfg, seed=seed)
        grads = jax.tree_util.tree_map(
            lambda p: 0.5 * jax.random.normal(jax.random.PRNGKey(hash(p.shape) % 2**31), p.shape, p.dtype),
            state.params,
        )
        return cfg, state, grads

    def _optax_reference(self, cfg, params, grads, n_steps, renorm):
        import optax

        from nvit_tpu.ops.renorm import renorm_params
        from nvit_tpu.train.optim import make_optimizer

        tx = make_optimizer(cfg.optimizer)
        opt_state = tx.init(params)
        for _ in range(n_steps):
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if renorm:
                params = renorm_params(params)
        return params

    @pytest.mark.parametrize("renorm", [False, True])
    def test_matches_optax_chain(self, renorm):
        from nvit_tpu.train.optim import fused_adamw_renorm_update, init_fused_adamw

        cfg, state, grads = self._setup()
        params = state.params
        fstate = init_fused_adamw(params)
        for _ in range(3):
            params, fstate = fused_adamw_renorm_update(
                cfg.optimizer, params, grads, fstate, renorm=renorm
            )
        ref = self._optax_reference(cfg, state.params, grads, 3, renorm)
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(ref),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7,
                err_msg=f"fused vs optax mismatch at {jax.tree_util.keystr(pa)}",
            )

    def test_clipping_engages(self):
        """Huge grads: the global-norm clip must bound the update magnitude
        identically to optax."""
        from nvit_tpu.train.optim import fused_adamw_renorm_update, init_fused_adamw

        cfg, state, grads = self._setup(seed=1)
        grads = jax.tree_util.tree_map(lambda g: g * 1e4, grads)
        params, _ = fused_adamw_renorm_update(
            cfg.optimizer, state.params, grads, init_fused_adamw(state.params), renorm=False
        )
        ref = self._optax_reference(cfg, state.params, grads, 1, False)
        for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)

    def test_renorm_invariant_holds(self):
        """After a fused update with renorm=True every Block matrix is unit-norm
        along its renorm axis."""
        from nvit_tpu.ops.renorm import RENORM_AXES
        from nvit_tpu.train.optim import fused_adamw_renorm_update, init_fused_adamw

        cfg, state, grads = self._setup(seed=2)
        params, _ = fused_adamw_renorm_update(
            cfg.optimizer, state.params, grads, init_fused_adamw(state.params), renorm=True
        )
        for bp in params["blocks"]:
            for name, axis in RENORM_AXES.items():
                norms = np.linalg.norm(np.asarray(bp[name]["w"]), axis=axis)
                np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


def test_per_group_grad_norms_logged():
    """≙ wandb.watch gradient monitoring: per-component grad norms appear in
    step metrics when log_gpu_stats is on."""
    import dataclasses as dc

    from nvit_tpu.configs.schema import Config, SystemConfig, TrainingConfig, ViTConfig
    from nvit_tpu.train.state import create_train_state
    from nvit_tpu.train.step import make_train_step

    cfg = Config(
        model=ViTConfig(image_size=16, n_layer=2, n_head=2, n_embd=32, num_classes=10,
                        local_patch_size=4, global_patch_size=8, use_nvit=True),
        training=TrainingConfig(batch_size=8),
        system=SystemConfig(use_ddp=False, dtype="float32", use_amp=False, log_gpu_stats=True),
    )
    state = create_train_state(cfg)
    step = make_train_step(cfg)
    imgs = jnp.zeros((8, 3, 16, 16), jnp.float32)
    labels = jnp.zeros((8,), jnp.int32)
    _, metrics = step(state, imgs, labels)
    assert "blocks.0_grad_norm" in metrics and "blocks.1_grad_norm" in metrics
    assert "cross_attention_grad_norm" in metrics and "head_grad_norm" in metrics
    assert float(metrics["grad_norm"]) >= 0.0


class TestBf16MomentsSR:
    """bf16 AdamW moments with stochastic-rounding stores (the round-5
    pre-registered traffic experiment — BASELINE.md; optimizer.moments_dtype)."""

    def test_sr_bf16_unbiased_and_neighbor_valued(self):
        from nvit_tpu.train.optim import sr_bf16

        # bf16 has a 7-bit mantissa: at 1.0 the ulp is 2^-7, so 1 + 2^-8 sits
        # exactly between the neighbors 1.0 and 1 + 2^-7
        x = jnp.full((65536,), 1.0 + 2.0**-8, jnp.float32)
        out = np.asarray(sr_bf16(x, jax.random.PRNGKey(0)), dtype=np.float32)
        assert set(np.unique(out)) <= {1.0, 1.0 + 2.0**-7}, np.unique(out)
        # unbiased: the midpoint rounds up half the time → mean ≈ x
        assert abs(out.mean() - float(x[0])) < 2.0**-7 * 0.02

    def test_sr_bf16_exact_values_pass_through(self):
        from nvit_tpu.train.optim import sr_bf16

        x = jnp.asarray([0.0, 1.0, -2.5, 2.0**-20], jnp.float32)  # all bf16-exact
        out = np.asarray(sr_bf16(x, jax.random.PRNGKey(3)), dtype=np.float32)
        np.testing.assert_array_equal(out, np.asarray(x))

    def test_sr_bf16_nonfinite_passthrough(self):
        from nvit_tpu.train.optim import sr_bf16

        x = jnp.asarray([jnp.inf, -jnp.inf, jnp.nan], jnp.float32)
        out = np.asarray(sr_bf16(x, jax.random.PRNGKey(1)), dtype=np.float32)
        assert np.isposinf(out[0]) and np.isneginf(out[1]) and np.isnan(out[2])

    def test_bf16_moments_track_fp32_trajectory(self):
        import dataclasses as dc

        from nvit_tpu.train.optim import fused_adamw_renorm_update, init_fused_adamw

        cfg, state, grads = TestFusedAdamWRenorm._setup(seed=4)
        p32, f32 = state.params, init_fused_adamw(state.params, "float32")
        p16, f16 = state.params, init_fused_adamw(state.params, "bfloat16")
        for m in jax.tree_util.tree_leaves(f16.mu):
            assert m.dtype == jnp.bfloat16
        step = jax.jit(
            lambda p, f: fused_adamw_renorm_update(cfg.optimizer, p, grads, f, renorm=True)
        )
        for _ in range(5):
            p32, f32 = step(p32, f32)
            p16, f16 = step(p16, f16)
        # moment dtype persists through the jitted update
        for m in jax.tree_util.tree_leaves(f16.mu) + jax.tree_util.tree_leaves(f16.nu):
            assert m.dtype == jnp.bfloat16
        # parameters stay close to the fp32-moments trajectory (SR noise only)
        for (pa, a), b in zip(
            jax.tree_util.tree_leaves_with_path(p16), jax.tree_util.tree_leaves(p32)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-3,
                err_msg=f"bf16-moments trajectory diverged at {jax.tree_util.keystr(pa)}",
            )

    def test_sr_is_deterministic_in_count(self):
        from nvit_tpu.train.optim import fused_adamw_renorm_update, init_fused_adamw

        cfg, state, grads = TestFusedAdamWRenorm._setup(seed=5)
        outs = []
        for _ in range(2):
            p, f = state.params, init_fused_adamw(state.params, "bfloat16")
            p, f = fused_adamw_renorm_update(cfg.optimizer, p, grads, f, renorm=False)
            outs.append(f)
        for a, b in zip(jax.tree_util.tree_leaves(outs[0]), jax.tree_util.tree_leaves(outs[1])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_checkpoint_roundtrip_bf16_moments(self, tmp_path):
        import dataclasses as dc

        from nvit_tpu.ckpt.checkpoint import restore_for_resume, save_checkpoint
        from nvit_tpu.train.state import create_train_state

        cfg, state, grads = TestFusedAdamWRenorm._setup(seed=6)
        cfg = dc.replace(cfg, optimizer=dc.replace(cfg.optimizer, moments_dtype="bfloat16"))
        state = create_train_state(cfg, seed=6)
        from nvit_tpu.train.optim import fused_adamw_renorm_update

        params, opt = fused_adamw_renorm_update(
            cfg.optimizer, state.params, grads, state.opt_state, renorm=True
        )
        state = state._replace(params=params, opt_state=opt, step=state.step + 1)
        save_checkpoint(tmp_path, "checkpoint_latest", state, cfg, metrics={"loss": 1.0})
        restored, rcfg, _ = restore_for_resume(tmp_path, "checkpoint_latest")
        assert rcfg.optimizer.moments_dtype == "bfloat16"
        for a, b in zip(
            jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(restored)
        ):
            assert a.dtype == b.dtype
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_bad_moments_dtype_rejected(self):
        from nvit_tpu.configs.schema import OptimizerConfig

        with pytest.raises(ValueError, match="moments_dtype"):
            OptimizerConfig(moments_dtype="fp8").validate()


class TestHashDither:
    """sr_dither=hash: counter-hash SR bits (pre-registered experiment #2,
    BASELINE.md round 5) — same unbiasedness/determinism guarantees as
    threefry, ~8× fewer VPU ops per element."""

    def test_hash_sr_unbiased_and_neighbor_valued(self):
        from nvit_tpu.train.optim import sr_bf16_hash

        # midpoint between bf16 neighbors 1.0 and 1+2^-7 must round up half
        # the time — the unbiasedness criterion, same as the threefry test
        x = jnp.full((65536,), 1.0 + 2.0**-8, jnp.float32)
        out = np.asarray(sr_bf16_hash(x, jnp.uint32(12345)), dtype=np.float32)
        assert set(np.unique(out)) <= {1.0, 1.0 + 2.0**-7}, np.unique(out)
        assert abs(out.mean() - float(x[0])) < 2.0**-7 * 0.02

    def test_hash_sr_quarter_point_probability(self):
        from nvit_tpu.train.optim import sr_bf16_hash

        # 1 + 2^-9 sits a quarter of the way up the [1.0, 1+2^-7] ulp: the
        # round-up probability must be ~0.25, not just the midpoint case —
        # catches dither-bit distributions that are symmetric but non-uniform
        x = jnp.full((65536,), 1.0 + 2.0**-9, jnp.float32)
        out = np.asarray(sr_bf16_hash(x, jnp.uint32(777)), dtype=np.float32)
        frac_up = float((out > 1.0).mean())
        assert abs(frac_up - 0.25) < 0.02, frac_up

    def test_hash_sr_exact_and_nonfinite_passthrough(self):
        from nvit_tpu.train.optim import sr_bf16_hash

        x = jnp.asarray([0.0, 1.0, -2.5, 2.0**-20, jnp.inf, -jnp.inf, jnp.nan], jnp.float32)
        out = np.asarray(sr_bf16_hash(x, jnp.uint32(9)), dtype=np.float32)
        np.testing.assert_array_equal(out[:4], np.asarray(x[:4]))
        assert np.isposinf(out[4]) and np.isneginf(out[5]) and np.isnan(out[6])

    def test_hash_dither_varies_with_seed_and_index(self):
        from nvit_tpu.train.optim import sr_bf16_hash

        x = jnp.full((4096,), 1.0 + 2.0**-8, jnp.float32)
        a = np.asarray(sr_bf16_hash(x, jnp.uint32(1)), dtype=np.float32)
        b = np.asarray(sr_bf16_hash(x, jnp.uint32(2)), dtype=np.float32)
        assert (a != b).any()  # seed changes the rounding pattern
        assert (a != a[0]).any()  # and elements differ within one call

    def test_hash_dither_global_index_matches_sharded_semantics(self):
        from nvit_tpu.train.optim import sr_bf16_hash

        # broadcasted_iota is GLOBAL under GSPMD: rounding a 2D leaf must
        # equal rounding its rows separately offset by their global strides —
        # i.e. the hash depends only on the flattened global index
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 128), jnp.float32)
        whole = np.asarray(sr_bf16_hash(x, jnp.uint32(5)), dtype=np.float32)
        flat = np.asarray(sr_bf16_hash(x.reshape(-1), jnp.uint32(5)), dtype=np.float32)
        np.testing.assert_array_equal(whole.reshape(-1), flat)

    def test_hash_moments_deterministic_and_track_fp32(self):
        import dataclasses as dc

        from nvit_tpu.train.optim import fused_adamw_renorm_update, init_fused_adamw

        cfg, state, grads = TestFusedAdamWRenorm._setup(seed=7)
        opt = dc.replace(cfg.optimizer, moments_dtype="bfloat16", sr_dither="hash")
        outs = []
        for _ in range(2):
            p, f = state.params, init_fused_adamw(state.params, "bfloat16")
            for _ in range(3):
                p, f = fused_adamw_renorm_update(opt, p, grads, f, renorm=True)
            outs.append((p, f))
        for a, b in zip(jax.tree_util.tree_leaves(outs[0]), jax.tree_util.tree_leaves(outs[1])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # and the trajectory stays near fp32 moments (SR noise only)
        p32, f32 = state.params, init_fused_adamw(state.params, "float32")
        for _ in range(3):
            p32, f32 = fused_adamw_renorm_update(cfg.optimizer, p32, grads, f32, renorm=True)
        for a, b in zip(jax.tree_util.tree_leaves(outs[0][0]), jax.tree_util.tree_leaves(p32)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)

    def test_sr_dither_enum_and_env_override(self):
        from nvit_tpu.configs import loader
        from nvit_tpu.configs.schema import OptimizerConfig

        # default flipped to "hash" by pre-registered experiment #2's keep
        # bar (BASELINE.md round 5)
        assert loader.load_config(env={}).optimizer.sr_dither == "hash"
        cfg = loader.load_config(env={"NVIT_OPTIMIZER__SR_DITHER": "threefry"})
        assert cfg.optimizer.sr_dither == "threefry"
        with pytest.raises(ValueError, match="sr_dither"):
            loader.load_config(env={"NVIT_OPTIMIZER__SR_DITHER": "xorshift"})
        with pytest.raises(ValueError, match="sr_dither"):
            OptimizerConfig(sr_dither="lcg").validate()
