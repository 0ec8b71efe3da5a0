"""Fused gated-MLP kernel tests (interpret mode on CPU): forward and gradient
parity vs the XLA chain, tiling dispatch, bf16 behavior.

≙ reference model.py:148-155 (MLP gate) and model.py:258-262 (cross-attn
gated projection) — the kernel must be numerically interchangeable with the
plain matmul→split→u·silu(v) chain it replaces.

The public ``gated_mlp`` dispatcher only takes the Pallas path on a real TPU
backend (same guard as ops/attention.py), so — mirroring the flash-attention
tests — kernel parity is asserted on ``_gated_core`` directly under
``force_tpu_interpret_mode``; the dispatcher's fallback contract is tested
separately.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from nvit_tpu.ops.gated_mlp import (
    _gated_core,
    _gated_core_b,
    _tileable,
    _xla_gated,
    gated_mlp,
)


def rand(key, n=256, k=128, h2=512, dtype=jnp.float32):
    kx, kw = jax.random.split(jax.random.PRNGKey(key))
    x = jax.random.normal(kx, (n, k), dtype)
    w = 0.1 * jax.random.normal(kw, (k, h2), dtype)
    return x, w


def core(x, w):
    h = w.shape[1] // 2
    return _gated_core(x, w[:, :h], w[:, h:])


def core_b(x, w, b):
    h = w.shape[1] // 2
    return _gated_core_b(x, w[:, :h], w[:, h:], b[:h].reshape(1, h), b[h:].reshape(1, h))


@pytest.mark.parametrize("n,k,h2", [(256, 128, 512), (128, 256, 1024)])
def test_forward_matches_xla(n, k, h2):
    x, w = rand(0, n, k, h2)
    with pltpu.force_tpu_interpret_mode():
        out = core(x, w)
    ref = _xla_gated(x, w, None)
    assert out.shape == (n, h2 // 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6)


def test_gradients_match_xla():
    x, w = rand(2, 256, 128, 512)

    def loss_kernel(x, w):
        return jnp.sum(jnp.square(core(x, w)))

    def loss_ref(x, w):
        return jnp.sum(jnp.square(_xla_gated(x, w, None)))

    with pltpu.force_tpu_interpret_mode():
        gx, gw = jax.grad(loss_kernel, argnums=(0, 1))(x, w)
    rx, rw = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), rtol=3e-5, atol=3e-5)


def test_bf16_dtype_and_tolerance():
    x, w = rand(3, 256, 128, 512, dtype=jnp.bfloat16)
    with pltpu.force_tpu_interpret_mode():
        out = core(x, w)
    ref = _xla_gated(x, w, None)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), rtol=2e-2, atol=2e-2
    )


@pytest.mark.parametrize("n,k,h2", [(256, 128, 512), (128, 256, 1024)])
def test_bias_forward_matches_xla(n, k, h2):
    """Bias variant (≙ reference c_fc bias default, model.py:59-61): the bias
    is folded into the u/v tiles in VMEM."""
    x, w = rand(10, n, k, h2)
    b = 0.1 * jax.random.normal(jax.random.PRNGKey(99), (h2,), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = core_b(x, w, b)
    ref = _xla_gated(x, w, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6)


def test_bias_gradients_match_xla():
    """db must equal the XLA path's bias gradient (column-sum of du/dv)."""
    x, w = rand(11, 256, 128, 512)
    b = 0.1 * jax.random.normal(jax.random.PRNGKey(98), (512,), jnp.float32)

    def loss_kernel(x, w, b):
        return jnp.sum(jnp.square(core_b(x, w, b)))

    def loss_ref(x, w, b):
        return jnp.sum(jnp.square(_xla_gated(x, w, b)))

    with pltpu.force_tpu_interpret_mode():
        gx, gw, gb = jax.grad(loss_kernel, argnums=(0, 1, 2))(x, w, b)
    rx, rw, rb = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w, b)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=3e-5, atol=3e-5)


def test_bias_dispatcher_kernel_path(monkeypatch):
    """The DISPATCHER routes bias configs to the fused kernel on TPU (VERDICT
    r2 weak #4: the reference-default bias=true config must not silently lose
    the kernel), including the grad w.r.t. the original flat [2H] bias."""
    import sys

    gm = sys.modules["nvit_tpu.ops.gated_mlp"]
    monkeypatch.setattr(gm, "_on_tpu", lambda: True)
    x, w = rand(12, 256, 128, 512)
    b = 0.1 * jax.random.normal(jax.random.PRNGKey(97), (512,), jnp.float32)

    with pltpu.force_tpu_interpret_mode():
        out = gated_mlp(x, w, b)
        gb = jax.grad(lambda b: jnp.sum(gated_mlp(x, w, b)))(b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_xla_gated(x, w, b)), rtol=2e-5, atol=2e-6)
    rb = jax.grad(lambda b: jnp.sum(_xla_gated(x, w, b)))(b)
    assert gb.shape == (512,)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(rb), rtol=3e-5, atol=3e-5)


def test_grad_flows_through_weight_scale():
    # suv-style weight-column scaling composes with the custom VJP
    x, w = rand(6, 256, 128, 512)
    s = 1.0 + 0.01 * jnp.arange(w.shape[1], dtype=jnp.float32)

    def loss_kernel(s):
        return jnp.sum(core(x, w * s))

    def loss_ref(s):
        return jnp.sum(_xla_gated(x, w * s, None))

    with pltpu.force_tpu_interpret_mode():
        gs = jax.grad(loss_kernel)(s)
    rs = jax.grad(loss_ref)(s)
    np.testing.assert_allclose(np.asarray(gs), np.asarray(rs), rtol=3e-5, atol=3e-5)


def test_dispatcher_fallback_is_exact_off_tpu():
    """On a non-TPU backend the dispatcher must use the XLA chain bit-for-bit
    for every input class — tileable shapes, non-tileable shapes, bias,
    use_kernel=False, and leading batch dims."""
    x, w = rand(4, n=256, k=128, h2=512)  # tileable → still XLA off-TPU
    np.testing.assert_array_equal(np.asarray(gated_mlp(x, w)), np.asarray(_xla_gated(x, w, None)))

    x3 = x.reshape(2, 128, 128)
    out3 = gated_mlp(x3, w)
    assert out3.shape == (2, 128, 256)
    np.testing.assert_array_equal(np.asarray(out3), np.asarray(_xla_gated(x3, w, None)))

    xq, wq = rand(5, n=100, k=96, h2=120)  # non-tileable
    assert not _tileable(100, 96, 60)
    np.testing.assert_array_equal(np.asarray(gated_mlp(xq, wq)), np.asarray(_xla_gated(xq, wq, None)))

    b = jnp.ones((w.shape[1],), jnp.float32)  # bias off-TPU → XLA path too
    np.testing.assert_array_equal(np.asarray(gated_mlp(x, w, b)), np.asarray(_xla_gated(x, w, b)))

    np.testing.assert_array_equal(
        np.asarray(gated_mlp(x, w, use_kernel=False)), np.asarray(_xla_gated(x, w, None))
    )


def test_nvit_l_row_shapes_tile_and_match():
    """nViT-L at B=12 has n = 12·784 = 9408 = 2^6·3·7² — NO 128-multiple
    divisor, so the old row-tile search silently fell back to XLA for every
    nViT-L bench (round-2 regression found by the loud-fallback log).  Rows
    only need sublane (16) alignment; the generalized search must tile these
    shapes and stay numerically identical."""
    from nvit_tpu.ops.gated_mlp import _pick

    assert _tileable(12 * 784, 1024, 2048)  # the real nViT-L MLP gate
    assert _tileable(12 * 784, 1024, 1024)  # the cross-attn gate
    assert _pick(9408, 512, 16) == 448  # largest 16-multiple divisor ≤ 512

    # same arithmetic class at test scale: n = 336 = 2^4·3·7
    n, k, h2 = 336, 128, 512
    x, w = rand(13, n, k, h2)
    with pltpu.force_tpu_interpret_mode():
        out = core(x, w)
        gx, gw = jax.grad(
            lambda x, w: jnp.sum(jnp.square(core(x, w))), argnums=(0, 1)
        )(x, w)
    ref = _xla_gated(x, w, None)
    rx, rw = jax.grad(
        lambda x, w: jnp.sum(jnp.square(_xla_gated(x, w, None))), argnums=(0, 1)
    )(x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=5e-5, atol=5e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), rtol=5e-5, atol=5e-5)


def test_use_mlp_kernel_resolution():
    """gated_mlp_kernel config knob: 'auto' uses the kernel iff n_embd ≤ 768
    (measured v5e crossover: d=768 +7%, d=1024 −7% — BASELINE.md round 3);
    flash_attn=False gates everything off."""
    from nvit_tpu.configs.schema import ViTConfig
    from nvit_tpu.models.blocks import _use_mlp_kernel

    kw = dict(n_layer=2, n_head=8, image_size=224)
    assert _use_mlp_kernel(ViTConfig(n_embd=768, flash_attn=True, **kw))
    assert not _use_mlp_kernel(ViTConfig(n_embd=1024, n_head=16, flash_attn=True, n_layer=2, image_size=224))
    assert not _use_mlp_kernel(ViTConfig(n_embd=768, flash_attn=False, **kw))
    on = ViTConfig(n_embd=1024, n_head=16, flash_attn=True, gated_mlp_kernel="on", n_layer=2, image_size=224)
    assert _use_mlp_kernel(on)
    off = ViTConfig(n_embd=768, flash_attn=True, gated_mlp_kernel="off", **kw)
    assert not _use_mlp_kernel(off)
    import pytest

    with pytest.raises(ValueError, match="gated_mlp_kernel"):
        ViTConfig(gated_mlp_kernel="bogus").validate()


def test_flagship_shapes_dispatch_to_kernel():
    """Regression guard: the nViT-B/16 flagship MLP ([B·T, d] @ [d, 8d]) and
    cross-attention gate ([B·T, d] @ [d, 2d]) must hit the Pallas kernel on
    TPU, and the flagship sequence length must take the zero-pad path (T=784
    is sublane-aligned for bf16)."""
    from nvit_tpu.ops.flash_attention import _pad_len, _pick_block_q

    assert _tileable(32 * 784, 768, 3072)  # MLP gate
    assert _tileable(32 * 784, 768, 768)  # cross-attn gate
    # attention: no HBM pad at the flagship T, single full-T q-tile
    assert _pad_len(784, jnp.bfloat16) == 784
    assert _pick_block_q(784, cap=1024) == 784
    # long-T still lane-pads for the two-kernel tiled backward
    assert _pad_len(1500, jnp.bfloat16) == 1536


def test_dispatcher_kernel_path(monkeypatch):
    """Exercise the DISPATCHER's kernel branch (leading-dim flatten, w column
    split, reshape back) under interpret mode by forcing the backend probe —
    the same pattern the flash tests use for ops/attention.py."""
    import sys

    # nvit_tpu.ops re-exports the gated_mlp FUNCTION, shadowing the submodule
    # attribute — resolve the module itself via sys.modules
    gm = sys.modules["nvit_tpu.ops.gated_mlp"]
    monkeypatch.setattr(gm, "_on_tpu", lambda: True)
    x, w = rand(9, 256, 128, 512)
    x3 = x.reshape(2, 128, 128)
    with pltpu.force_tpu_interpret_mode():
        out3 = gated_mlp(x3, w)
        out2 = gated_mlp(x, w)
    ref3 = _xla_gated(x3, w, None)
    assert out3.shape == (2, 128, 256)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(ref3), rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(
        np.asarray(out2), np.asarray(ref3.reshape(256, 256)), rtol=2e-5, atol=2e-6
    )
