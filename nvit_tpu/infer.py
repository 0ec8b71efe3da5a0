"""Inference API: load a checkpoint, run jitted batched prediction.

The reference's only inference surface is ``validate_only`` (train.py:179-189).
This module adds a first-class serving path: a ``Predictor`` that restores a
checkpoint (with its own stored model config), jit-compiles a bf16 forward
once, and classifies uint8 image batches — suitable for wrapping in any
serving frontend.

Usage::

    from nvit_tpu.infer import Predictor
    p = Predictor.from_checkpoint("out", "checkpoint_best")
    labels, probs = p.predict(images_u8)        # [B,C,H,W] uint8
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from nvit_tpu.configs.schema import Config, ViTConfig
from nvit_tpu.data.augment import normalize
from nvit_tpu.models.vit import vit_apply


class Predictor:
    def __init__(self, params, model_cfg: ViTConfig, *, compute_dtype=jnp.bfloat16):
        self.params = params
        self.cfg = model_cfg

        def forward(p, images_u8: Array) -> Array:
            x = normalize(images_u8)
            out = vit_apply(p, model_cfg, x, step=0, train=False, compute_dtype=compute_dtype)
            return jax.nn.softmax(out.logits.astype(jnp.float32), axis=-1)

        self._forward = jax.jit(forward)

    @classmethod
    def from_checkpoint(cls, out_dir: str | Path, name: str = "checkpoint_best", **kw) -> "Predictor":
        from nvit_tpu.ckpt.checkpoint import restore_for_resume

        state, cfg, _meta = restore_for_resume(out_dir, name)
        return cls(state.params, cfg.model, **kw)

    @classmethod
    def from_export(cls, dest: str | Path, name: str = "checkpoint_best", **kw) -> "Predictor":
        """Load a params-only inference artifact (ckpt.export) — no optimizer
        state is read or constructed."""
        from nvit_tpu.ckpt.export import load_export

        params, model_cfg = load_export(dest, name)
        return cls(params, model_cfg, **kw)

    @classmethod
    def from_config(cls, cfg: Config, seed: int = 0, **kw) -> "Predictor":
        """Fresh-weights predictor (testing / warm-pool prebuild)."""
        from nvit_tpu.models.vit import init_vit

        params = init_vit(jax.random.PRNGKey(seed), cfg.model)
        return cls(params, cfg.model, **kw)

    def predict_probs(self, images_u8) -> np.ndarray:
        """[B, C, H, W] uint8 → softmax probabilities [B, num_classes]."""
        return np.asarray(self._forward(self.params, jnp.asarray(images_u8)))

    def predict(self, images_u8, top_k: int = 1) -> tuple[np.ndarray, np.ndarray]:
        """→ (top-k class indices [B, k], probabilities [B, k])."""
        probs = self.predict_probs(images_u8)
        idx = np.argsort(-probs, axis=-1)[:, :top_k]
        return idx, np.take_along_axis(probs, idx, axis=-1)
