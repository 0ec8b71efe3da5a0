"""Test configuration: force JAX onto a virtual 8-device CPU platform.

This is the JAX-native "fake backend" for multi-device tests without TPU
hardware (SURVEY.md §4): env vars must be set before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# Neutralize an eagerly-registered TPU plugin (e.g. the axon tunnel in this
# container registers itself from sitecustomize before conftest runs): the
# env var alone is not enough once registration has happened, so force the
# platform through jax.config as well, before any array is created.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# persistent compile cache: the suite compiles hundreds of tiny programs;
# caching them makes repeat runs several times faster
jax.config.update("jax_compilation_cache_dir", str(__import__("pathlib").Path(__file__).parent / ".jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", (
        f"tests must run on the virtual CPU platform, got {jax.default_backend()}"
    )
    assert jax.device_count() >= 8, "multi-device tests need >=8 virtual CPU devices"


import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _isolate_flat_secrets():
    """The flat-secrets store (configs.loader._SECRETS) is process-global
    state fed by load_config; without isolation, a test that loads a
    secrets.yaml leaks its keys into every later get_secret call
    (test_config's s3cret broke test_obs_and_entry's keyless-wandb case)."""
    from nvit_tpu.configs import loader

    saved = dict(loader._SECRETS)
    loader._SECRETS.clear()
    yield
    loader._SECRETS.clear()
    loader._SECRETS.update(saved)
