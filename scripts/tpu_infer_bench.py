"""Inference (serving-path) throughput on the attached TPU chip.

Measures the ``Predictor`` API (nvit_tpu/infer.py) on the flagship
nViT-B/16 at several batch sizes: uint8 [B,C,H,W] in → softmax probs out,
i.e. the full serving forward incl. on-device normalization.  The reference
has no serving surface at all (its only inference path is validate_only,
train.py:179-189), so these are beyond-parity numbers recorded in
BASELINE.md.

Single TPU process; host-value fetch as the sync point (tunnel caveat).
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


def main() -> None:
    cfg = flagship_config()
    pred = Predictor.from_config(cfg)
    for batch in (32, 128, 256):
        imgs = np.random.default_rng(0).integers(
            0, 255, (batch, 3, cfg.model.image_size, cfg.model.image_size), dtype=np.uint8
        )
        probs = pred.predict_probs(imgs)  # compile + warm
        assert probs.shape == (batch, cfg.model.num_classes)

        # end-to-end (host→device→host each call).  Through the axon tunnel
        # the H2D of the uint8 batch runs at ~18 MB/s and dominates; on a
        # TPU-VM host this is a PCIe copy (negligible).
        pred.predict_probs(imgs)
        t0 = time.perf_counter()
        for _ in range(STEPS):
            probs = pred.predict_probs(imgs)
        e2e = (time.perf_counter() - t0) / STEPS

        # device-resident: images already in HBM (a serving frontend keeps
        # the copy off the hot path via prefetch); sync = scalar prob fetch.
        dimgs = jax.device_put(jnp.asarray(imgs))
        float(pred._forward(pred.params, dimgs)[0, 0])
        t0 = time.perf_counter()
        for _ in range(STEPS):
            out = pred._forward(pred.params, dimgs)
        float(out[0, 0])
        dev = (time.perf_counter() - t0) / STEPS

        print(
            f"batch {batch}: device-resident {batch / dev:8.1f} img/s "
            f"({dev * 1000:.1f} ms/batch) | tunnel end-to-end {batch / e2e:7.1f} img/s "
            f"({e2e * 1000:.1f} ms)",
            flush=True,
        )


if __name__ == "__main__":
    main()
