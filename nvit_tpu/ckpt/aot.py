"""AOT serving artifact via ``jax.export``: StableHLO + params in one bundle.

The params-only export (ckpt/export.py) still re-traces the model at load
time; this module removes even that — ``export_aot`` serializes the FULL
serving computation (normalize → forward → softmax) as portable StableHLO
with a **symbolic batch dimension**, alongside the parameter leaves.
``load_aot`` restores a drop-in ``Predictor``-shaped object that never
traces (or even constructs) the model: the deserialized program is compiled
directly by XLA for whatever batch arrives.  This is the TPU-idiomatic
deployment endpoint — the artifact pins the exact serving semantics at
export time (quantization included), immune to model-code drift between
training and serving fleets.

The reference has no deployment story at all (its checkpoints are full torch
train dicts, train.py:640-650); this completes the serving surface
train→export→serve for the rebuild.

    python -m nvit_tpu.ckpt.aot --checkpoint out --name checkpoint_best --dest deploy/ [--int8]
    python -m nvit_tpu.serve --checkpoint deploy --name checkpoint_best --aot

Notes:
* The artifact is lowered for the platform(s) of the exporting process
  (recorded in the meta json and checked at load) — export on a TPU host for
  TPU serving.  Symbolic-batch exports use the XLA attention path (a Pallas
  launch grid cannot be shape-polymorphic); pass ``--batch N`` to pin a
  concrete batch and serialize the flash kernels as TPU custom calls.
* ``--int8`` composes: the params are quantized first (ops/quant.py), so the
  serialized program contains the int8 MXU matmuls.
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

AOT_FORMAT = "nvit_tpu.ckpt.aot.v1"


def _serving_forward(model_cfg, treedef):
    """The exact serving computation (mirrors infer.Predictor.forward)."""
    from nvit_tpu.data.augment import normalize
    from nvit_tpu.models.vit import vit_apply

    def forward(leaves: list, images_u8):
        p = jax.tree_util.tree_unflatten(treedef, leaves)
        x = normalize(images_u8)
        out = vit_apply(p, model_cfg, x, step=0, train=False, compute_dtype=jnp.bfloat16)
        return jax.nn.softmax(out.logits.astype(jnp.float32), axis=-1)

    return forward


def export_aot(
    out_dir: str | Path,
    name: str,
    dest: str | Path,
    *,
    quantize: str | None = None,
    batch: int | None = None,
) -> Path:
    """Read a training checkpoint and write ``<name>.aot.{bin,npz,json}``.

    ``batch=None`` exports with a SYMBOLIC batch dimension — one artifact for
    every batch size.  The Pallas flash kernels derive their launch grid from
    the batch, which a symbolic dim cannot lower, so symbolic exports use the
    XLA attention path (bit-compatible semantics, parity-tested; only the
    lowering differs).  ``batch=N`` pins a concrete batch and keeps the
    configured attention path — kernels serialize as TPU custom calls — for
    fixed-batch pipelines where peak throughput matters.
    """
    import dataclasses

    from jax import export as jexport

    from nvit_tpu.ckpt.checkpoint import restore_for_resume

    state, cfg, meta = restore_for_resume(out_dir, name)
    params = jax.device_get(state.params)
    if quantize is not None:
        if quantize != "int8":
            raise ValueError(f"unknown quantize mode {quantize!r} (supported: 'int8')")
        from nvit_tpu.ops.quant import quantize_vit_params

        params = quantize_vit_params(params)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    leaves = [np.asarray(x) for x in leaves]

    model_cfg = cfg.model
    if batch is None:
        b = jexport.symbolic_shape("b", scope=jexport.SymbolicScope())[0]
        if model_cfg.flash_attn:
            model_cfg = dataclasses.replace(model_cfg, flash_attn=False)
    else:
        b = int(batch)
    img_spec = jax.ShapeDtypeStruct(
        (b, model_cfg.channels, model_cfg.image_size, model_cfg.image_size), jnp.uint8
    )
    leaf_specs = [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in leaves]
    exp = jexport.export(jax.jit(_serving_forward(model_cfg, treedef)))(leaf_specs, img_spec)

    dest = Path(dest)
    dest.mkdir(parents=True, exist_ok=True)
    # atomic-ish: payloads land under tmp names and rename; the json meta —
    # the validity marker load_aot checks first — is renamed LAST, so a crash
    # mid-export can never leave a "valid" meta next to a torn payload
    import os

    paths = {}
    for ext, write in (
        (".bin", lambda p: p.write_bytes(exp.serialize())),
        # file handle: np.savez APPENDS ".npz" to a bare tmp filename
        (".npz", lambda p: np.savez(p.open("wb"), **{f"leaf_{i}": a for i, a in enumerate(leaves)})),
        (".json", lambda p: p.write_text(json.dumps({
            "format": AOT_FORMAT,
            "model": cfg.to_dict()["model"],
            "quantize": quantize,
            "batch": batch,
            "attention": "flash" if model_cfg.flash_attn else "xla",
            "platforms": list(getattr(exp, "platforms", ())),
            "num_leaves": len(leaves),
            "source_iter": meta.get("iter_num"),
            "source_metrics": meta.get("metrics", {}),
        }, indent=1))),
    ):
        tmp = dest / f".{name}.aot{ext}.tmp"
        write(tmp)
        paths[ext] = tmp
    for ext in (".bin", ".npz", ".json"):
        os.replace(paths[ext], dest / f"{name}.aot{ext}")
    return dest / f"{name}.aot.bin"


class AotPredictor:
    """Predictor-shaped wrapper over a deserialized AOT artifact (drop-in for
    serve.InferenceService: ``.cfg``, ``.predict_probs``, ``.predict``)."""

    def __init__(self, exported, leaves: list, model_cfg, pinned_batch: int | None = None):
        self.cfg = model_cfg
        # concrete-batch artifacts accept exactly this batch size; the serving
        # frontend pads requests up to it (serve.InferenceService)
        self.pinned_batch = pinned_batch
        # device-put ONCE: host numpy leaves passed into a jitted call are
        # re-transferred on EVERY call (no caching) — catastrophic through a
        # slow host link (~27 s/request for nViT-B over the axon tunnel)
        self._leaves = [jnp.asarray(x) for x in leaves]
        # jit gives per-batch-shape compilation caching over the symbolic-
        # batch program (same cache shape as Predictor._forward)
        self._call = jax.jit(lambda ls, imgs: exported.call(ls, imgs))

    def predict_probs(self, images_u8) -> np.ndarray:
        return np.asarray(self._call(self._leaves, jnp.asarray(np.asarray(images_u8))))

    def predict(self, images_u8, top_k: int = 1) -> tuple[np.ndarray, np.ndarray]:
        from nvit_tpu.infer import topk_from_probs

        return topk_from_probs(self.predict_probs(images_u8), top_k)


def load_aot(dest: str | Path, name: str) -> AotPredictor:
    """Restore an AOT artifact — no model construction or tracing."""
    from jax import export as jexport

    from nvit_tpu.configs.schema import ViTConfig, merge_dataclass

    dest = Path(dest)
    meta = json.loads((dest / f"{name}.aot.json").read_text())
    if meta.get("format") != AOT_FORMAT:
        raise ValueError(f"not an AOT export: format={meta.get('format')!r}")
    platforms = [p.lower() for p in meta.get("platforms", [])]
    backend = jax.default_backend().lower()
    if platforms and backend not in platforms:
        raise ValueError(
            f"AOT artifact was lowered for {platforms} but this process runs "
            f"on {backend!r} — re-export on the serving platform"
        )
    exported = jexport.deserialize((dest / f"{name}.aot.bin").read_bytes())
    with np.load(dest / f"{name}.aot.npz") as z:
        leaves = [z[f"leaf_{i}"] for i in range(meta["num_leaves"])]
    model_cfg = merge_dataclass(ViTConfig(), meta["model"])
    return AotPredictor(exported, leaves, model_cfg, pinned_batch=meta.get("batch"))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description="Export an AOT (StableHLO) serving artifact")
    ap.add_argument("--checkpoint", default="out")
    ap.add_argument("--name", default="checkpoint_best")
    ap.add_argument("--dest", default="deploy")
    ap.add_argument("--int8", action="store_true", help="int8-quantize before export (w8a8)")
    ap.add_argument("--batch", type=int, default=None,
                    help="pin a concrete batch size (keeps the Pallas flash kernels); "
                         "default: symbolic batch (XLA attention)")
    args = ap.parse_args(argv)
    path = export_aot(
        args.checkpoint, args.name, args.dest,
        quantize="int8" if args.int8 else None, batch=args.batch,
    )
    total = sum(
        (path.parent / f"{args.name}.aot{ext}").stat().st_size for ext in (".bin", ".npz", ".json")
    )
    print(f"exported {path} (+ .npz/.json, {total / 1e6:.1f} MB total)")


if __name__ == "__main__":
    main()
