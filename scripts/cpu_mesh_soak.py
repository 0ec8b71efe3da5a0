"""CLI driver for the all-features CPU-mesh endurance soak.

Runs ``python -m nvit_tpu`` semantics (config from NVIT_* env) on an 8-device
virtual CPU mesh with the Pallas kernel dispatch FORCED (same mechanism as
__graft_entry__.dryrun_multichip topology 3/4: _on_tpu patched in both op
modules, pallas_call under the generic interpreter — the mosaic multi-device
interpreter deadlocks on large replicated operands, see tests/kernel_force.py).

Purpose: long-DURATION evidence for the all-features intersection (dp×tp +
FSDP/ZeRO + SOM + shard_mapped flash kernels in one partitioned program) —
the dryrun proves it compiles and runs ONE step; this trains it for thousands
of iterations across relaunches (driven by scripts/cpu_mesh_soak.sh).

≙ the reference's 24 h relaunch protocol (train.py:857-862, 1074-1079) on the
topology the reference cannot express (it is DDP-only).
"""

from __future__ import annotations

import os
import sys

# must precede any jax import: virtual 8-device CPU platform
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax  # noqa: E402

# the axon sitecustomize plugin overrides JAX_PLATFORMS (CLAUDE.md) — the
# config update is the reliable way to pin cpu before first backend use
jax.config.update("jax_platforms", "cpu")

from jax.experimental import pallas as pl  # noqa: E402

import nvit_tpu.ops.attention as att_mod  # noqa: E402
import nvit_tpu.ops.gated_mlp as mlp_mod  # noqa: E402


def main() -> None:
    assert len(jax.devices()) == 8, (
        f"expected 8 virtual CPU devices, got {len(jax.devices())} — "
        "XLA_FLAGS was set too late (another import initialized the backend?)"
    )
    att_mod._on_tpu = lambda: True
    mlp_mod._on_tpu = lambda: True
    orig_call = pl.pallas_call
    pl.pallas_call = lambda *a, **k: orig_call(*a, **{"interpret": True, **k})

    from nvit_tpu.__main__ import cli

    cli()


if __name__ == "__main__":
    sys.exit(main())
