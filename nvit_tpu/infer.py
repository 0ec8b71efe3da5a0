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


def topk_from_probs(probs: np.ndarray, top_k: int) -> tuple[np.ndarray, np.ndarray]:
    """probs [B, C] → (top-k class indices [B, k], probabilities [B, k]) —
    shared by Predictor and ckpt.aot.AotPredictor."""
    idx = np.argsort(-probs, axis=-1)[:, :top_k]
    return idx, np.take_along_axis(probs, idx, axis=-1)


class Predictor:
    def __init__(
        self, params, model_cfg: ViTConfig, *, compute_dtype=jnp.bfloat16,
        data_parallel: bool = False, model_parallel: int = 1,
        quantize: str | None = None,
    ):
        """``data_parallel=True`` shards prediction batches over ALL attached
        devices (params replicated, batch split on the ``data`` mesh axis —
        the serving shape for multi-chip TPU hosts).  Batches are padded to a
        device multiple internally; results are identical to single-device.

        ``model_parallel=N`` shards the transformer trunk over a ``model``
        mesh axis using the SAME Megatron column/row rules as training
        (parallel/mesh.py) — serves a model whose weights exceed one chip's
        HBM.  Composes with ``data_parallel`` (a data×model mesh; without it
        the whole mesh is the model axis).

        ``quantize="int8"`` converts every linear to int8 (w8a8, ops/quant.py):
        2x MXU peak and half the weight bytes on TPU, at a small accuracy
        cost bounded by nViT's hypersphere structure (unit-norm weight
        columns + unit-norm tokens)."""
        self.cfg = model_cfg
        if model_parallel < 1:
            raise ValueError(f"model_parallel must be >= 1, got {model_parallel}")
        if quantize is not None:
            if quantize != "int8":
                raise ValueError(f"unknown quantize mode {quantize!r} (supported: 'int8')")
            if model_parallel > 1:
                # the quantized tree carries per-matrix scale leaves the
                # sharding rules don't describe — refuse (before the full-tree
                # quantization sweep) rather than silently serve replicated
                raise ValueError("model_parallel > 1 is not supported with quantize yet")
            from nvit_tpu.ops.quant import quantize_vit_params

            params = quantize_vit_params(params)
        self._batch_multiple = 1
        mesh = None
        if data_parallel or model_parallel > 1:
            from jax.sharding import NamedSharding, PartitionSpec

            from nvit_tpu.parallel.mesh import make_mesh, shard_params

            n = len(jax.devices())
            if n % model_parallel:
                raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
            # without data_parallel, every device goes to the model axis
            mp = model_parallel if data_parallel else n
            if not data_parallel and model_parallel not in (1, n):
                raise ValueError(
                    f"model_parallel={model_parallel} without data_parallel would idle "
                    f"{n - model_parallel} of {n} devices; pass data_parallel=True"
                )
            mesh = make_mesh(model_parallel=mp)
            self._batch_multiple = mesh.shape["data"]
            self._in_sharding = NamedSharding(mesh, PartitionSpec("data"))
            if mp > 1:
                # trunk weights shard over the model axis (training rules)
                params = shard_params(params, mesh, use_nvit=model_cfg.use_nvit)
            else:
                params = jax.device_put(params, NamedSharding(mesh, PartitionSpec()))
        else:
            self._in_sharding = None
            # device-put ONCE: checkpoint/export loaders return host numpy
            # leaves, and numpy args to a jitted call re-transfer on EVERY
            # call — through a slow host link that dwarfs the forward itself
            params = jax.tree_util.tree_map(jnp.asarray, params)
        self.params = params

        def forward(p, images_u8: Array) -> Array:
            from nvit_tpu.parallel.spmd import kernel_mesh

            # Pallas kernels need shard_map under a multi-device jit
            # (parallel/spmd.py); the ambient mesh makes the op dispatchers
            # wrap them over the data axis
            with kernel_mesh(mesh):
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
        images_u8 = np.asarray(images_u8)
        b = images_u8.shape[0]
        m = self._batch_multiple
        if b % m:  # pad to a device multiple for even batch sharding
            pad = np.zeros((m - b % m, *images_u8.shape[1:]), images_u8.dtype)
            images_u8 = np.concatenate([images_u8, pad], axis=0)
        x = jnp.asarray(images_u8)
        if self._in_sharding is not None:
            x = jax.device_put(x, self._in_sharding)
        return np.asarray(self._forward(self.params, x))[:b]

    def predict(self, images_u8, top_k: int = 1) -> tuple[np.ndarray, np.ndarray]:
        """→ (top-k class indices [B, k], probabilities [B, k])."""
        return topk_from_probs(self.predict_probs(images_u8), top_k)
