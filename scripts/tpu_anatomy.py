"""Step-anatomy timing on the real chip: forward / forward+backward /
optimizer-update / full-step, to locate the remaining non-floor time
(BASELINE.md round-2: full step 253 ms at B=32; attention floor ≈ 103 ms,
SLERP floor ≈ 14 ms, matmuls ≈ 28 ms).

Single TPU process; host-value fetches as sync points (tunnel caveat)."""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import flagship_config  # noqa: E402
from nvit_tpu.train.optim import fused_adamw_renorm_update, init_fused_adamw  # noqa: E402
from nvit_tpu.train.state import create_train_state  # noqa: E402
from nvit_tpu.train.step import make_loss_fn, make_train_step  # noqa: E402
from nvit_tpu.utils import acquire_tpu_lock  # noqa: E402

# one TPU-touching process at a time: two deadlock on the single-chip
# claim (CLAUDE.md), so every on-chip entry point serializes here
_TPU_LOCK = acquire_tpu_lock()


B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
STEPS = 15


def timeit(name, fn, *args, sync):
    out = fn(*args)
    float(sync(out))
    out = fn(*args)
    float(sync(out))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    float(sync(out))
    dt = (time.perf_counter() - t0) / STEPS * 1000
    print(f"{name}: {dt:.2f} ms", flush=True)
    return dt


def main():
    import os

    overrides = {}
    if os.environ.get("NVIT_BENCH_LARGE", "0") == "1":  # nViT-L/16 (bench.py parity)
        overrides.update(n_layer=24, n_head=16, n_embd=1024)
    cfg = flagship_config(**overrides)
    state = create_train_state(cfg)
    loss_fn = make_loss_fn(cfg)

    imgs = jax.random.normal(jax.random.PRNGKey(0), (B, 3, 224, 224), jnp.float32)
    labels = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, cfg.model.num_classes)

    fwd = jax.jit(lambda p, x, y: loss_fn(p, x, y, 0)[0])
    timeit("fwd_only", fwd, state.params, imgs, labels, sync=lambda o: o)

    # fwd+bwd is derived as full_step - fwd_only - update_only: timing a
    # standalone grad program queues N undonated 0.5 GB grad outputs and OOMs
    grads = jax.jit(
        lambda p, x, y: jax.grad(lambda pp: loss_fn(pp, x, y, 0)[0])(p)
    )(state.params, imgs, labels)

    upd = jax.jit(
        lambda p, g, s: fused_adamw_renorm_update(cfg.optimizer, p, g, s, renorm=True)
    )
    opt_state = init_fused_adamw(state.params)
    timeit(
        "update_only", upd, state.params, grads, opt_state,
        sync=lambda o: jnp.sum(o[0]["sz"]) if "sz" in o[0] else o[1].count,
    )

    del grads, opt_state  # ~1.4 GB retained from earlier stages — free before the full step

    # full step: donate and CARRY the state like the training loop — undonated
    # timing queues N 1.9 GB state outputs in flight and OOMs
    step = jax.jit(make_train_step(cfg), donate_argnums=0)
    st = state
    st, m = step(st, imgs, labels)
    float(m["total_loss"])
    st, m = step(st, imgs, labels)
    float(m["total_loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        st, m = step(st, imgs, labels)
    float(m["total_loss"])
    dt = (time.perf_counter() - t0) / STEPS * 1000
    print(f"full_step: {dt:.2f} ms", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
