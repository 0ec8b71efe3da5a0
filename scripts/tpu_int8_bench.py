"""Int8 (w8a8) vs bf16 serving throughput on the attached TPU chip.

Compares the ``Predictor`` forward on the flagship nViT-B/16 in both
precisions at several batch sizes, device-resident (sync = host value fetch —
tunnel caveat, CLAUDE.md), plus the quantization accuracy proxy (mean |dprob|
and top-1 agreement vs the bf16 path on the same random batch).

v5e int8 MXU peak is 2x bf16 (394 vs 197 TOPS) and int8 halves weight bytes;
attention stays bf16 (flash kernels), so the expected win is on the
projection/MLP-bound fraction of the forward.  Results → BASELINE.md.
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import flagship_config  # noqa: E402
from nvit_tpu.infer import Predictor  # noqa: E402
from nvit_tpu.utils import acquire_tpu_lock  # noqa: E402

# one TPU-touching process at a time: two deadlock on the single-chip
# claim (CLAUDE.md), so every on-chip entry point serializes here
_TPU_LOCK = acquire_tpu_lock()


STEPS = 20


def timed(pred: Predictor, dimgs) -> float:
    float(pred._forward(pred.params, dimgs)[0, 0])  # compile + warm
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = pred._forward(pred.params, dimgs)
    float(out[0, 0])
    return (time.perf_counter() - t0) / STEPS


def main() -> None:
    cfg = flagship_config()
    pred_fp = Predictor.from_config(cfg)
    pred_q = Predictor.from_config(cfg, quantize="int8")

    for batch in (32, 128, 256):
        imgs = np.random.default_rng(0).integers(
            0, 256, (batch, 3, cfg.model.image_size, cfg.model.image_size), dtype=np.uint8
        )
        dimgs = jax.device_put(jnp.asarray(imgs))
        t_fp = timed(pred_fp, dimgs)
        t_q = timed(pred_q, dimgs)

        p_fp = np.asarray(pred_fp._forward(pred_fp.params, dimgs))
        p_q = np.asarray(pred_q._forward(pred_q.params, dimgs))
        agree = float((p_fp.argmax(-1) == p_q.argmax(-1)).mean())
        dprob = float(np.abs(p_fp - p_q).mean())

        print(
            f"batch {batch}: bf16 {batch / t_fp:8.1f} img/s ({t_fp * 1000:6.1f} ms) | "
            f"int8 {batch / t_q:8.1f} img/s ({t_q * 1000:6.1f} ms) | "
            f"speedup {t_fp / t_q:4.2f}x | top1-agree {agree:.3f} | mean|dprob| {dprob:.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
