"""Inference-only checkpoint export: params, no optimizer state.

A training checkpoint carries the full TrainState — params plus two fp32
AdamW moment trees (and SOM state) — roughly 6× the bf16 parameter bytes.
Serving needs none of that.  ``export_for_inference`` writes a compact
artifact (params-only npz + model-config json, atomic like the trainer's
checkpoints) that ``Predictor.from_export`` / ``load_export`` restore
without constructing an optimizer.  The reference has no deployment story
(its checkpoints are full torch train dicts, train.py:640-650); this is the
TPU-serving completion of that surface.

    python -m nvit_tpu.ckpt.export --checkpoint out --name checkpoint_best --dest deploy/
    # → deploy/checkpoint_best.export.npz + .export.json  (~6× smaller)
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Any

import jax
import numpy as np

EXPORT_FORMAT = "nvit_tpu.ckpt.export.v1"


def export_for_inference(
    out_dir: str | Path,
    name: str,
    dest: str | Path,
    *,
    dtype: str = "bfloat16",
) -> Path:
    """Read a training checkpoint (npz or orbax) and write a params-only
    export artifact to ``dest``.  ``dtype`` is the storage dtype for
    floating-point leaves ('bfloat16' halves the artifact; 'float32' keeps
    the master copy exact)."""
    from nvit_tpu.ckpt.checkpoint import _write_files, restore_for_resume

    if dtype not in ("bfloat16", "float32", "int8"):
        raise ValueError(f"export dtype must be bfloat16, float32 or int8, got {dtype!r}")
    state, cfg, meta = restore_for_resume(out_dir, name)
    params = jax.device_get(state.params)
    if dtype == "int8":
        # w8a8 serving artifact (ops/quant.py): linears become int8 + per-
        # column fp32 scales, everything else stays fp32 — ~12x smaller than
        # the training checkpoint, load-ready for Predictor (no requantize)
        from nvit_tpu.ops.quant import quantize_vit_params

        stored = [np.asarray(x) for x in jax.tree_util.tree_leaves(quantize_vit_params(params))]
    else:
        np_dtype = np.dtype(dtype) if dtype == "float32" else jax.numpy.bfloat16.dtype
        stored = []
        for x in jax.tree_util.tree_leaves(params):
            a = np.asarray(x)
            stored.append(a.astype(np_dtype) if np.issubdtype(a.dtype, np.floating) else a)

    dest = Path(dest)
    dest.mkdir(parents=True, exist_ok=True)
    # atomic npz+json pair via the checkpoint writer (same tmp/replace dance)
    return _write_files(
        dest,
        f"{name}.export",
        stored,
        {
            "format": EXPORT_FORMAT,
            "model": cfg.to_dict()["model"],
            "dtype": dtype,
            "num_leaves": len(stored),
            "source_iter": meta.get("iter_num"),
            "source_metrics": meta.get("metrics", {}),
        },
    )


def load_export(dest: str | Path, name: str) -> tuple[Any, "ViTConfig"]:  # noqa: F821
    """→ (params pytree, ViTConfig) from an export artifact."""
    from nvit_tpu.configs.schema import ViTConfig, merge_dataclass
    from nvit_tpu.models.vit import init_vit

    dest = Path(dest)
    meta = json.loads((dest / f"{name}.export.json").read_text())
    if meta.get("format") != EXPORT_FORMAT:
        raise ValueError(f"not an inference export: format={meta.get('format')!r}")
    model_cfg = merge_dataclass(ViTConfig(), meta["model"])
    # abstract template gives the treedef without running (or compiling) the
    # initializer — matters on the TPU serving path where a throwaway init
    # would be a real compiled program
    def _template_fn(k):
        p = init_vit(k, model_cfg)
        if meta.get("dtype") == "int8":
            from nvit_tpu.ops.quant import quantize_vit_params

            p = quantize_vit_params(p)
        return p

    template = jax.eval_shape(_template_fn, jax.random.PRNGKey(0))
    treedef = jax.tree_util.tree_structure(template)
    with np.load(dest / f"{name}.export.npz") as z:
        stored = [z[f"leaf_{i}"] for i in range(meta["num_leaves"])]
    # npz stores bfloat16 as a 2-byte void dtype — view it back
    import ml_dtypes

    stored = [
        a.view(ml_dtypes.bfloat16) if a.dtype.kind == "V" and a.dtype.itemsize == 2 else a
        for a in stored
    ]
    t_leaves = jax.tree_util.tree_leaves(template)
    if len(t_leaves) != len(stored):
        raise ValueError(f"leaf count mismatch: template {len(t_leaves)} vs stored {len(stored)}")
    params = jax.tree_util.tree_unflatten(treedef, stored)
    return params, model_cfg


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description="Export a params-only inference artifact")
    ap.add_argument("--checkpoint", default="out")
    ap.add_argument("--name", default="checkpoint_best")
    ap.add_argument("--dest", default="deploy")
    ap.add_argument("--dtype", default="bfloat16", choices=["bfloat16", "float32", "int8"])
    args = ap.parse_args(argv)
    path = export_for_inference(args.checkpoint, args.name, args.dest, dtype=args.dtype)
    size_mb = path.stat().st_size / 1e6
    src = Path(args.checkpoint) / f"{args.name}.npz"
    note = f" (train ckpt {src.stat().st_size / 1e6:.1f} MB)" if src.exists() else ""
    print(f"exported {path} ({size_mb:.1f} MB{note})")


if __name__ == "__main__":
    main()
