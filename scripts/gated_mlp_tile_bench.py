"""Tile-size sweep for the fused gated-MLP kernel at the nViT-L shape.

Round-3 found the kernel net-NEGATIVE at d=1024 (41.7 vs 45.1 img/s on the
full nViT-L step) with the tile caps tuned for the d=768 flagship
(FWD 512x1024 / BWD 256x1024).  At k=1024 those caps nearly fill VMEM
(x + 2 W tiles + fp32 u/v intermediates + double buffering ~ 15 MB), which
can collapse Mosaic's pipelining.  This microbench times fwd+bwd of JUST the
gated-MLP op (XLA chain vs kernel) across tile configs at
(n, k, h) = (9408, 1024, 4096) — nViT-L/16 at B=12 — to find whether a
smaller tiling flips the kernel positive before re-running the full bench.

Run on the real TPU (single process!):
    nohup python scripts/gated_mlp_tile_bench.py > /tmp/gmlp_tiles.log 2>&1 &
    echo $! > /tmp/tpu.pid
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

from nvit_tpu.utils import acquire_tpu_lock  # noqa: E402

# one TPU-touching process at a time: two deadlock on the single-chip claim
# (CLAUDE.md chip-lock protocol), so every on-chip entry point serializes here
_TPU_LOCK = acquire_tpu_lock()

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import importlib

# nvit_tpu.ops re-exports the gated_mlp FUNCTION, which shadows the submodule
# on ``import ... as`` attribute lookup — resolve the module explicitly
gm = importlib.import_module("nvit_tpu.ops.gated_mlp")

N, K, H = 9408, 1024, 4096
WARMUP, ITERS = 2, 30


def time_fn(tag: str, fn, *args) -> float:
    jitted = jax.jit(fn)
    for _ in range(WARMUP):
        out = jitted(*args)
        float(out)  # host fetch is the only reliable sync on this backend
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = jitted(*args)
    val = float(out)
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{tag:38s} {dt:8.3f} ms   (chk {val:.3e})", flush=True)
    return dt


def main() -> None:
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x2 = jax.device_put(jax.random.normal(k1, (N, K), jnp.bfloat16) * 0.05)
    wu = jax.device_put(jax.random.normal(k2, (K, H), jnp.bfloat16) * 0.02)
    wv = jax.device_put(jax.random.normal(k3, (K, H), jnp.bfloat16) * 0.02)
    g = jax.device_put(jax.random.normal(k4, (N, H), jnp.bfloat16) * 0.05)

    def xla_fb(x2, wu, wv, g):
        w = jnp.concatenate([wu, wv], axis=1)
        out, vjp = jax.vjp(lambda x, w: gm._xla_gated(x, w, None), x2, w)
        dx, dw = vjp(g)
        return (
            jnp.sum(out.astype(jnp.float32))
            + jnp.sum(dx.astype(jnp.float32))
            + jnp.sum(dw.astype(jnp.float32))
        )

    def kern_fb(x2, wu, wv, g):
        out, vjp = jax.vjp(gm._gated_core, x2, wu, wv)
        dx, dwu, dwv = vjp(g)
        return (
            jnp.sum(out.astype(jnp.float32))
            + jnp.sum(dx.astype(jnp.float32))
            + jnp.sum(dwu.astype(jnp.float32))
            + jnp.sum(dwv.astype(jnp.float32))
        )

    print(f"device={jax.devices()[0].device_kind}  shape n={N} k={K} h={H}", flush=True)
    t_xla = time_fn("xla chain (fwd+bwd)", xla_fb, x2, wu, wv, g)

    # (fwd_row, fwd_col, bwd_row, bwd_col) caps; _pick rounds down to divisors
    configs = [
        (512, 1024, 256, 1024),  # current defaults (tuned at d=768)
        (512, 512, 256, 512),    # halve cols: W tiles 1 MB, more x re-reads
        (256, 512, 128, 512),    # halve both
        (256, 1024, 128, 1024),  # halve rows only
        (512, 2048, 256, 2048),  # double cols: fewer x re-reads, 4 MB W tiles
        (96, 2048, 96, 2048),    # wide cols + short rows to stay under VMEM
    ]
    best = (t_xla, "xla")
    for fr, fc, br, bc in configs:
        # The tile caps are served through nvit_tpu.ops.tuning's PEP 562
        # __getattr__, which re-reads NVIT_TUNE_* on every access — so a
        # sweep sets the env vars, not module attributes (which are now
        # zero-arg functions and would shadow the env path).
        os.environ["NVIT_TUNE_GATED_MLP_FWD_ROW"] = str(fr)
        os.environ["NVIT_TUNE_GATED_MLP_FWD_COL"] = str(fc)
        os.environ["NVIT_TUNE_GATED_MLP_BWD_ROW"] = str(br)
        os.environ["NVIT_TUNE_GATED_MLP_BWD_COL"] = str(bc)
        rows = (gm._pick(N, fr, 16), gm._pick(N, br, 16))
        tag = f"kernel f{fr}x{fc} b{br}x{bc} (rows {rows[0]}/{rows[1]})"
        try:
            t = time_fn(tag, kern_fb, x2, wu, wv, g)
        except Exception as e:  # noqa: BLE001 — e.g. VMEM OOM for a config
            print(f"{tag:38s} FAILED: {type(e).__name__}: {e}", flush=True)
            continue
        if t < best[0]:
            best = (t, tag)
    print(f"BEST: {best[1]}  {best[0]:.3f} ms  (xla {t_xla:.3f} ms)", flush=True)


if __name__ == "__main__":
    sys.exit(main())
