"""On-chip AOT export smoke: flash kernels as serialized TPU custom calls.

Validates the ckpt.aot claims on real hardware (CPU tests can't lower
Mosaic):

1. concrete-batch export of a flash_attn=true model serializes (meta
   attention == "flash"), deserializes, and executes on the chip;
2. its probabilities match the live Predictor on the same batch;
3. the symbolic-batch export (XLA attention swap) also runs and agrees.

Uses a 2-layer flagship-width model (kernel-eligible shapes, small
transfers).  Single TPU process; host value fetches as sync points.
"""

from __future__ import annotations

import dataclasses
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from __graft_entry__ import flagship_config  # noqa: E402
from nvit_tpu.ckpt.aot import export_aot, load_aot  # noqa: E402
from nvit_tpu.ckpt.checkpoint import save_checkpoint  # noqa: E402
from nvit_tpu.infer import Predictor  # noqa: E402
from nvit_tpu.train.state import create_train_state  # noqa: E402
from nvit_tpu.utils import acquire_tpu_lock  # noqa: E402

# one TPU-touching process at a time: two deadlock on the single-chip
# claim (CLAUDE.md), so every on-chip entry point serializes here
_TPU_LOCK = acquire_tpu_lock()


BATCH = 16


def main() -> None:
    cfg = flagship_config()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, n_layer=2))
    assert cfg.model.flash_attn, "smoke requires the kernel path"

    tmp = pathlib.Path(tempfile.mkdtemp(prefix="aot_smoke_"))
    state = create_train_state(cfg)
    save_checkpoint(tmp, "ckpt", state, cfg, metrics={"val/loss": 9.9})
    print("checkpoint saved", flush=True)

    imgs = np.random.default_rng(0).integers(
        0, 256, (BATCH, 3, cfg.model.image_size, cfg.model.image_size), dtype=np.uint8
    )
    ref = Predictor.from_checkpoint(tmp, "ckpt").predict_probs(imgs)
    print("live predictor ok", flush=True)

    import json

    export_aot(tmp, "ckpt", tmp / "flash", batch=BATCH)
    meta = json.loads((tmp / "flash" / "ckpt.aot.json").read_text())
    assert meta["attention"] == "flash", meta
    assert "tpu" in [p.lower() for p in meta["platforms"]], meta
    got = load_aot(tmp / "flash", "ckpt").predict_probs(imgs)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-3)
    print("AOT_SMOKE_OK flash concrete-batch: max|dprob| =",
          float(np.abs(got - ref).max()), flush=True)

    export_aot(tmp, "ckpt", tmp / "sym")
    meta = json.loads((tmp / "sym" / "ckpt.aot.json").read_text())
    assert meta["attention"] == "xla", meta
    got = load_aot(tmp / "sym", "ckpt").predict_probs(imgs)
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-3)
    print("AOT_SMOKE_OK symbolic-batch xla swap: max|dprob| =",
          float(np.abs(got - ref).max()), flush=True)


if __name__ == "__main__":
    main()
