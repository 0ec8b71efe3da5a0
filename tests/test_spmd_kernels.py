"""Pallas kernels under a multi-device mesh (shard_map dispatch).

Mosaic kernels cannot be partitioned by GSPMD — a multi-device jit that
reaches a bare ``pallas_call`` raises ``NotImplementedError: ... Please wrap
the call in a shard_map`` (jax _src/tpu_custom_call.py:339-352).  The op
dispatchers therefore shard_map the kernels over the ambient mesh
(nvit_tpu/parallel/spmd.py).

The interpret-mode parity checks (kernel-vs-XLA outputs AND gradients on the
8-device CPU mesh, including the dsqk psum across data shards and a full
flash train step) live in tests/spmd_checks.py and run ONE PER SUBPROCESS:
jax's mosaic-interpret machinery simulates devices with io_callback threads
over process-global state, and two such programs in one process deadlock
nondeterministically.  This file runs them via subprocess plus the in-process
dispatch/fallback tests (which never execute a kernel).

≙ reference: flash-attn under DDP is trivially single-device per process
(train.py:434-446); under SPMD one program drives all devices, so this is
the TPU-native equivalent of "flash-attn works multi-GPU".
"""

import os
import subprocess
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import nvit_tpu.ops.attention  # noqa: F401 — the ops package re-exports the
import nvit_tpu.ops.gated_mlp  # noqa: F401   function names, shadowing modules

att_mod = sys.modules["nvit_tpu.ops.attention"]
mlp_mod = sys.modules["nvit_tpu.ops.gated_mlp"]
from nvit_tpu.ops.attention import attention, sdpa_xla
from nvit_tpu.ops.gated_mlp import _xla_gated, gated_mlp
from nvit_tpu.parallel.mesh import make_mesh
from nvit_tpu.parallel.spmd import current_kernel_mesh, kernel_mesh

REPO = Path(__file__).resolve().parents[1]


@pytest.fixture
def force_tpu(monkeypatch):
    # both modules hold their own reference to _on_tpu
    monkeypatch.setattr(att_mod, "_on_tpu", lambda: True)
    monkeypatch.setattr(mlp_mod, "_on_tpu", lambda: True)


def run_check(name: str) -> None:
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "PALLAS_AXON_POOL_IPS": "",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
    })
    r = subprocess.run(
        [sys.executable, str(REPO / "tests" / "spmd_checks.py"), name],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, f"{name} failed:\n{r.stderr[-3000:]}"
    assert f"SPMD_CHECK_OK {name}" in r.stdout


class TestAmbientMesh:
    def test_context_nesting_and_single_device(self):
        m = make_mesh(jax.devices()[:1])
        assert current_kernel_mesh() is None
        with kernel_mesh(m):
            assert current_kernel_mesh() is None  # 1-device mesh → direct lowering
        m8 = make_mesh()
        with kernel_mesh(m8):
            assert current_kernel_mesh() is m8
            with kernel_mesh(None):
                assert current_kernel_mesh() is None
            assert current_kernel_mesh() is m8
        assert current_kernel_mesh() is None


def test_attention_indivisible_heads_falls_back(force_tpu, caplog):
    """h=3 does not divide model=2 → dispatch must fall back to XLA instead
    of shard_mapping (or crashing), and must SAY so once (a multi-chip run
    that silently lost the fused kernels would be an invisible slowdown).
    No kernel executes, so this runs in-process."""
    import logging

    mesh = make_mesh(model_parallel=2)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(k1, (8, 3, 16, 32), jnp.float32)
    k = jax.random.normal(k2, (8, 3, 16, 32), jnp.float32)
    v = jax.random.normal(k3, (8, 3, 16, 32), jnp.float32)
    ref = sdpa_xla(q, k, v, 0.25)
    with kernel_mesh(mesh), caplog.at_level(logging.WARNING, logger="nvit_tpu"):
        out = jax.jit(lambda a, b, c: attention(a, b, c, 0.25, use_flash=True))(q, k, v)
        jax.jit(lambda a, b, c: attention(a, b, c, 0.25, use_flash=True)).lower(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)
    warns = [r for r in caplog.records if "flash kernel requested" in r.message]
    assert len(warns) == 1, [r.message for r in caplog.records]  # once per (shape, mesh)


def test_gated_mlp_tensor_parallel_uses_xla(force_tpu):
    """model axis > 1 → the contiguous u|v column halves are split across
    devices; the dispatcher must use the XLA chain (GSPMD partitions it)."""
    mesh = make_mesh(model_parallel=2)
    x = jax.random.normal(jax.random.PRNGKey(4), (8, 16, 128), jnp.float32)
    w = 0.1 * jax.random.normal(jax.random.PRNGKey(5), (128, 512), jnp.float32)
    ref = _xla_gated(x, w, None)
    with kernel_mesh(mesh):
        out = jax.jit(lambda x, w: gated_mlp(x, w, use_kernel=True))(x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("name", [
    "attention_fwd_dp8",
    "attention_fwd_dp4tp2",
    "qknorm_grads_dp8",
    "qknorm_grads_dp4tp2",
    "gated_mlp_grads",
    "gated_mlp_grads_bias",
    "full_flash_train_step",
    "full_flash_train_step_fsdp",
    "full_flash_train_step_allfeatures",
])
def test_spmd_kernel_check(name):
    run_check(name)
