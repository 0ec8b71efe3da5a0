"""Pallas flash-attention tests (interpret mode on CPU): forward and gradient
parity vs the XLA reference path, padding correctness, both softmax scales."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from nvit_tpu.ops.attention import sdpa_xla
from nvit_tpu.ops.flash_attention import flash_attention


def rand_qkv(key, b=2, h=2, t=100, d=32, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(key), 3)
    q = jax.random.normal(k1, (b, h, t, d), dtype)
    k = jax.random.normal(k2, (b, h, t, d), dtype)
    v = jax.random.normal(k3, (b, h, t, d), dtype)
    return q, k, v


@pytest.mark.parametrize("t", [64, 100, 128, 200])
@pytest.mark.parametrize("scale", [0.17677, 5.65685])  # 1/sqrt(32), sqrt(32)
def test_forward_matches_xla(t, scale):
    q, k, v = rand_qkv(0, t=t)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, scale)
    ref = sdpa_xla(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_forward_bf16():
    q, k, v = rand_qkv(1, t=96, dtype=jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, 0.25)
    ref = sdpa_xla(q, k, v, 0.25)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2
    )


@pytest.mark.parametrize("t", [64, 100])
def test_gradients_match_xla(t):
    q, k, v = rand_qkv(2, b=1, h=2, t=t, d=32)
    scale = 0.25

    def loss_flash(q, k, v):
        return jnp.sum(jnp.square(flash_attention(q, k, v, scale)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(sdpa_xla(q, k, v, scale)))

    with pltpu.force_tpu_interpret_mode():  # covers fwd AND the vjp kernels
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_flash, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
            err_msg=f"grad d{name} mismatch",
        )


def test_long_sequence_two_kernel_backward():
    """T > _FUSED_BWD_MAX_T exercises the split dq / dkv kernel path."""
    q, k, v = rand_qkv(7, b=1, h=1, t=1100, d=16)
    scale = 0.25

    def loss_flash(q, k, v):
        return jnp.sum(jnp.square(flash_attention(q, k, v, scale)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(sdpa_xla(q, k, v, scale)))

    with pltpu.force_tpu_interpret_mode():
        g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_flash, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4,
            err_msg=f"grad d{name} mismatch (long-seq path)",
        )


def test_padding_does_not_leak():
    """T=100 fp32 pads to the 104 sublane multiple (dtype-aware _pad_len);
    the masked pad keys/queries must not leak into the first 100 positions."""
    q, k, v = rand_qkv(3, t=100)
    with pltpu.force_tpu_interpret_mode():
        out = flash_attention(q, k, v, 0.3)
    ref = sdpa_xla(q, k, v, 0.3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_lane_padding_does_not_leak():
    """Force the 128-lane pad path through the single-tile kernels by calling
    the padded core directly with t_pad=128 > t_actual=100 (the public
    wrapper now prefers the sublane pad for short T)."""
    from nvit_tpu.ops.flash_attention import _flash_padded

    q, k, v = rand_qkv(8, b=1, h=2, t=100, d=32)
    qp, kp, vp = (jnp.pad(x.reshape(2, 100, 32), ((0, 0), (0, 28), (0, 0))) for x in (q, k, v))
    with pltpu.force_tpu_interpret_mode():
        out = _flash_padded(qp, kp, vp, (0.3, 100))[:, :100, :].reshape(1, 2, 100, 32)
    ref = sdpa_xla(q, k, v, 0.3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)
    assert out.shape == q.shape


def test_block_apply_uses_flash_when_enabled():
    """End-to-end: a Block with flash_attn=True (interpret mode) matches the
    same Block with flash_attn=False."""
    import sys

    from nvit_tpu.configs.schema import ViTConfig
    from nvit_tpu.models.blocks import block_apply, init_block

    # NB: nvit_tpu.ops.__init__ re-exports the `attention` FUNCTION under the
    # submodule's name, so `import nvit_tpu.ops.attention as att` would bind
    # the function; fetch the real module.
    att = sys.modules["nvit_tpu.ops.attention"]

    cfg_x = ViTConfig(image_size=16, n_layer=1, n_head=2, n_embd=32, local_patch_size=4,
                      global_patch_size=8, use_nvit=True, flash_attn=False)
    cfg_f = ViTConfig(image_size=16, n_layer=1, n_head=2, n_embd=32, local_patch_size=4,
                      global_patch_size=8, use_nvit=True, flash_attn=True)
    p = init_block(jax.random.PRNGKey(0), cfg_x)
    h = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 32))
    ref = block_apply(p, cfg_x, h)

    orig = att._on_tpu
    att._on_tpu = lambda: True  # force the flash path; interpret mode runs it on CPU
    try:
        with pltpu.force_tpu_interpret_mode():
            out = block_apply(p, cfg_f, h)
    finally:
        att._on_tpu = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-4)


# -------------------------------------------- fused QK-norm (nViT) variant
class TestQKNormFused:
    """flash_attention_qknorm folds the per-head justnorm+sqk projection into
    the kernels (≙ reference model.py:108-116 adjacency); must match the XLA
    projection + attention chain in value AND in all four gradients."""

    @staticmethod
    def _setup(t=100, b=2, h=2, d=32, seed=10, dtype=jnp.float32):
        q, k, v = rand_qkv(seed, b=b, h=h, t=t, d=d, dtype=dtype)
        sqk = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(seed + 1), (h, d))
        return q, k, v, sqk

    @staticmethod
    def _ref(q, k, v, sqk, scale):
        from nvit_tpu.ops.attention import qknorm_project_xla

        qh, kh = qknorm_project_xla(q, k, sqk, v.dtype)
        return sdpa_xla(qh, kh, v, scale)

    @pytest.mark.parametrize("t", [64, 100, 128])
    def test_forward(self, t):
        from nvit_tpu.ops.flash_attention import flash_attention_qknorm

        q, k, v, sqk = self._setup(t=t)
        scale = 5.65685  # sqrt(32), the nViT scale
        with pltpu.force_tpu_interpret_mode():
            out = flash_attention_qknorm(q, k, v, sqk, scale)
        ref = self._ref(q, k, v, sqk, scale)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)

    @pytest.mark.parametrize("t", [64, 100])
    def test_gradients_including_sqk(self, t):
        from nvit_tpu.ops.flash_attention import flash_attention_qknorm

        q, k, v, sqk = self._setup(t=t, b=1)
        scale = 5.65685
        tgt = jax.random.normal(jax.random.PRNGKey(99), q.shape)

        def loss_fused(q, k, v, sqk):
            return jnp.sum((flash_attention_qknorm(q, k, v, sqk, scale) - tgt) ** 2)

        def loss_ref(q, k, v, sqk):
            return jnp.sum((self._ref(q, k, v, sqk, scale) - tgt) ** 2)

        with pltpu.force_tpu_interpret_mode():
            g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, sqk)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, sqk)
        for name, a, b in zip(("q", "k", "v", "sqk"), g_fused, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4,
                err_msg=f"grad d{name} mismatch (qknorm fused)",
            )

    def test_long_sequence_fallback(self):
        """t_pad > fused limit routes through XLA projection + plain flash."""
        from nvit_tpu.ops.flash_attention import flash_attention_qknorm

        q, k, v, sqk = self._setup(t=1100, b=1, h=1, d=16, seed=12)
        scale = 4.0
        with pltpu.force_tpu_interpret_mode():
            out = flash_attention_qknorm(q, k, v, sqk, scale)
        ref = self._ref(q, k, v, sqk, scale)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-3, atol=1e-4)

    def test_block_end_to_end_grads(self):
        """nViT Block value+grad parity: flash(fused qknorm) vs XLA chain."""
        import sys

        from nvit_tpu.configs.schema import ViTConfig
        from nvit_tpu.models.blocks import block_apply, init_block

        att = sys.modules["nvit_tpu.ops.attention"]
        kw = dict(image_size=16, n_layer=1, n_head=2, n_embd=32,
                  local_patch_size=4, global_patch_size=8, use_nvit=True)
        cfg_x = ViTConfig(flash_attn=False, **kw)
        cfg_f = ViTConfig(flash_attn=True, **kw)
        p = init_block(jax.random.PRNGKey(3), cfg_x)
        # move sqk off its constant init so its gradient is non-trivial
        p["sqk"] = p["sqk"] * (1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(4), p["sqk"].shape))
        h = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 32))

        def loss(p, cfg):
            return jnp.sum(jnp.square(block_apply(p, cfg, h)))

        ref_val, ref_grad = jax.value_and_grad(loss)(p, cfg_x)
        orig = att._on_tpu
        att._on_tpu = lambda: True
        try:
            with pltpu.force_tpu_interpret_mode():
                val, grad = jax.value_and_grad(loss)(p, cfg_f)
        finally:
            att._on_tpu = orig
        np.testing.assert_allclose(float(val), float(ref_val), rtol=1e-4)
        for path, a in jax.tree_util.tree_leaves_with_path(grad):
            b = ref_grad
            for k_ in path:
                b = b[k_.key] if hasattr(k_, "key") else b[k_.idx]
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4,
                err_msg=f"block grad mismatch at {jax.tree_util.keystr(path)}",
            )


def test_qknorm_static_modes():
    """mode="bounded"/"rowmax" compile exactly ONE kernel variant (no runtime
    lax.cond → no double-buffered cond operands, VERDICT r2 weak #5) and both
    match the XLA reference in their valid regimes."""
    from nvit_tpu.ops.attention import qknorm_project_xla
    from nvit_tpu.ops.flash_attention import flash_attention_qknorm

    b, h, t, d = 1, 2, 64, 32
    scale = float(np.sqrt(d))
    q, k, v = rand_qkv(21, b=b, h=h, t=t, d=d)
    sqk = 1.0 + 0.05 * jnp.arange(h * d, dtype=jnp.float32).reshape(h, d) / (h * d)
    qh, kh = qknorm_project_xla(q, k, sqk, v.dtype)
    ref = sdpa_xla(qh, kh, v, scale)

    for mode in ("bounded", "rowmax"):
        with pltpu.force_tpu_interpret_mode():
            out = flash_attention_qknorm(q, k, v, sqk, scale, mode=mode)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=3e-4, atol=3e-5, err_msg=mode
        )
        jaxpr = str(jax.make_jaxpr(
            lambda q, k, v, s: flash_attention_qknorm(q, k, v, s, scale, mode=mode)
        )(q, k, v, sqk))
        assert "cond" not in jaxpr, f"static mode {mode} must not emit lax.cond"

    # auto keeps the runtime dispatch
    jaxpr_auto = str(jax.make_jaxpr(
        lambda q, k, v, s: flash_attention_qknorm(q, k, v, s, scale, mode="auto")
    )(q, k, v, sqk))
    assert "cond" in jaxpr_auto

    # rowmax stays correct where bounded's precondition is violated
    sqk_big = 3.0 * sqk
    assert scale * float(jnp.max(sqk_big * sqk_big)) >= 20.0
    with pltpu.force_tpu_interpret_mode():
        out_big = flash_attention_qknorm(q, k, v, sqk_big, scale, mode="rowmax")
    qh, kh = qknorm_project_xla(q, k, sqk_big, v.dtype)
    ref_big = sdpa_xla(qh, kh, v, scale)
    np.testing.assert_allclose(np.asarray(out_big), np.asarray(ref_big), rtol=3e-4, atol=3e-5)


def test_qknorm_bounded_softmax_fallback():
    """The qknorm forward's bounded-softmax fast path must match the row-max
    path bit-for-tolerance in BOTH regimes: small sqk (bound < 20 → scalar
    subtraction) and large sqk (bound ≥ 20 → runtime row-max fallback)."""
    from nvit_tpu.ops.attention import qknorm_project_xla
    from nvit_tpu.ops.flash_attention import flash_attention_qknorm

    b, h, t, d = 1, 2, 64, 32
    scale = float(np.sqrt(d))
    q, k, v = rand_qkv(9, b=b, h=h, t=t, d=d)

    for s_mag, regime in ((1.0, "bounded"), (3.0, "rowmax-fallback")):
        sqk = s_mag * (1.0 + 0.05 * jnp.arange(h * d, dtype=jnp.float32).reshape(h, d) / (h * d))
        bound = scale * float(jnp.max(sqk * sqk))
        assert (bound < 20.0) == (regime == "bounded")
        with pltpu.force_tpu_interpret_mode():
            out = flash_attention_qknorm(q, k, v, sqk, scale)
        qh, kh = qknorm_project_xla(q, k, sqk, v.dtype)
        ref = sdpa_xla(qh, kh, v, scale)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=3e-4, atol=3e-5, err_msg=regime
        )

        # gradients flow through the saved lse identically in both regimes
        def loss(q, k, v, s):
            return jnp.sum(jnp.square(flash_attention_qknorm(q, k, v, s, scale)))

        def loss_ref(q, k, v, s):
            qh, kh = qknorm_project_xla(q, k, s, v.dtype)
            return jnp.sum(jnp.square(sdpa_xla(qh, kh, v, scale)))

        with pltpu.force_tpu_interpret_mode():
            gs = jax.grad(loss, argnums=3)(q, k, v, sqk)
        rs = jax.grad(loss_ref, argnums=3)(q, k, v, sqk)
        np.testing.assert_allclose(np.asarray(gs), np.asarray(rs), rtol=2e-3, atol=2e-4, err_msg=regime)


def test_qknorm_bounded_underflow_clamp():
    """Round-4 soak-NaN regression (BASELINE.md round 4): sqk is learned with
    a 32×-amplified effective LR (stored pre-scaled by base_scale) and drifts
    far past the static-"bounded" mode's old design envelope — the flagship
    soak measured sqk_eff 2.31 at iter 200 and NaN'd ~85 iters later, exactly
    when bound = scale·max(sqk_eff²) crossed the full-row exp-underflow
    threshold (scores ≥ −bound ⇒ min argument −2·bound; TPU flushes fp32
    subnormals, so bound ≳ 44 can zero an entire row → l = 0 → 0/0).

    The _BOUNDED_EXP_FLOOR clamp must make mode="bounded" finite at ANY
    drift, with exact rowmax parity wherever the clamp is inert.
    ≙ /root/reference/nvit/model.py:141-152 (sqk scaling; torch's row-max
    softmax is drift-proof by construction — ours must be too)."""
    from nvit_tpu.ops.attention import qknorm_project_xla
    from nvit_tpu.ops.flash_attention import flash_attention_qknorm

    b, h, t, d = 1, 2, 64, 64
    scale = float(np.sqrt(d))
    q, k, v = rand_qkv(33, b=b, h=h, t=t, d=d)

    # --- full-underflow regime: one dominant sqk dim sets a huge bound while
    # q/k live in its orthogonal complement, so every score is ~0 and the
    # whole row underflows pre-clamp (even through CPU subnormals: the exp
    # argument is below ln(fp32 subnormal min) ≈ −103.9).  Pre-fix this was
    # 0/0 → NaN in forward AND backward.
    q = q.at[..., 0].set(0.0)
    k = k.at[..., 0].set(0.0)
    sqk_drift = jnp.full((h, d), 0.1, jnp.float32).at[:, 0].set(3.7)
    bound = scale * float(jnp.max(sqk_drift * sqk_drift))
    assert bound > 104.0, "construction must exceed the subnormal floor"

    def loss(q, k, v, s_):
        return jnp.sum(jnp.square(flash_attention_qknorm(q, k, v, s_, scale, mode="bounded")))

    with pltpu.force_tpu_interpret_mode():
        out = flash_attention_qknorm(q, k, v, sqk_drift, scale, mode="bounded")
        grads = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, sqk_drift)
    assert bool(jnp.isfinite(out).all()), "bounded fwd must be finite at any sqk drift"
    for i, g in enumerate(grads):
        assert bool(jnp.isfinite(g).all()), f"bounded bwd grad {i} must be finite"
    # the degenerate rows have near-constant scores, so the clamped uniform
    # row is still close to the true softmax
    qh, kh = qknorm_project_xla(q, k, sqk_drift, v.dtype)
    ref = sdpa_xla(qh, kh, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)

    # --- moderate-drift regime (bound ≈ 26 — beyond the old <20 gate, clamp
    # inert because arguments stay ≥ −2·bound > −60): bounded must match the
    # XLA reference exactly as tightly as in the sound regime, fwd and bwd.
    q2, k2, v2 = rand_qkv(34, b=b, h=h, t=t, d=d)
    sqk_mod = jnp.full((h, d), 1.8, jnp.float32)
    bmod = scale * float(jnp.max(sqk_mod * sqk_mod))
    assert 20.0 < bmod and 2 * bmod < 60.0
    with pltpu.force_tpu_interpret_mode():
        out2 = flash_attention_qknorm(q2, k2, v2, sqk_mod, scale, mode="bounded")
        gs = jax.grad(loss, argnums=3)(q2, k2, v2, sqk_mod)
    qh2, kh2 = qknorm_project_xla(q2, k2, sqk_mod, v2.dtype)
    ref2 = sdpa_xla(qh2, kh2, v2, scale)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), rtol=3e-4, atol=3e-5)

    def loss_ref(q, k, v, s_):
        qh, kh = qknorm_project_xla(q, k, s_, v.dtype)
        return jnp.sum(jnp.square(sdpa_xla(qh, kh, v, scale)))

    rs = jax.grad(loss_ref, argnums=3)(q2, k2, v2, sqk_mod)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(rs), rtol=2e-3, atol=2e-4)
