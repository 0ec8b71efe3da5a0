"""Print XLA's cost/memory analysis for the compiled flagship train step.

Cheap when the program is already in the persistent compile cache. Used to
bound the remaining step-time slack: total HBM bytes accessed / bandwidth
vs measured step time tells whether the program is traffic-bound and how
far from the traffic floor it runs (BASELINE.md round-2 anatomy).
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import flagship_config  # noqa: E402
from nvit_tpu.train.state import create_train_state  # noqa: E402
from nvit_tpu.train.step import make_train_step  # noqa: E402
from nvit_tpu.utils import acquire_tpu_lock  # noqa: E402

# one TPU-touching process at a time: two deadlock on the single-chip
# claim (CLAUDE.md), so every on-chip entry point serializes here
_TPU_LOCK = acquire_tpu_lock()


B = int(sys.argv[1]) if len(sys.argv) > 1 else 32


def report(tag, compiled):
    from nvit_tpu.obs.profiling import xla_cost_analysis

    ca = xla_cost_analysis(compiled)
    gb = ca.get("bytes accessed", 0.0) / 1e9
    tf = ca.get("flops", 0.0) / 1e12
    tr = ca.get("transcendentals", 0.0) / 1e9
    print(f"{tag}: bytes={gb:.1f} GB (floor {gb / 0.819:.1f} ms) "
          f"flops={tf:.2f} TF (floor {tf / 0.197:.1f} ms at 197 TFLOP/s) "
          f"transcendentals={tr:.2f} G", flush=True)
    return gb, tf


def main():
    import os

    from nvit_tpu.train.optim import fused_adamw_renorm_update, init_fused_adamw
    from nvit_tpu.train.step import make_loss_fn

    overrides = {}
    if os.environ.get("NVIT_BENCH_LARGE", "0") == "1":  # nViT-L/16 (bench.py parity)
        overrides.update(n_layer=24, n_head=16, n_embd=1024)
    if os.environ.get("NVIT_BENCH_KOHONEN", "0") == "1":  # n1k1 (bench.py parity)
        overrides.update(use_kohonen=True, kohonen_nodes=512)
    cfg = flagship_config(**overrides)
    state = create_train_state(cfg)
    imgs = jnp.zeros((B, 3, 224, 224), jnp.float32)
    labels = jnp.zeros((B,), jnp.int32)

    step = jax.jit(make_train_step(cfg), donate_argnums=0)
    step_compiled = step.lower(state, imgs, labels).compile()
    report("full_step", step_compiled)

    loss_fn = make_loss_fn(cfg)
    fwd = jax.jit(lambda p, x, y: loss_fn(p, x, y, 0)[0])
    report("fwd_only", fwd.lower(state.params, imgs, labels).compile())

    opt_state = init_fused_adamw(state.params)
    grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
    upd = jax.jit(
        lambda p, g, s: fused_adamw_renorm_update(cfg.optimizer, p, g, s, renorm=True),
        donate_argnums=(0, 2),
    )
    report("update_only", upd.lower(state.params, grads, opt_state).compile())

    try:
        ma = step_compiled.memory_analysis()
        print("peak HBM temp (GB):", ma.temp_size_in_bytes / 1e9)
    except Exception as e:  # noqa: BLE001
        print("memory_analysis unavailable:", e)


if __name__ == "__main__":
    main()
