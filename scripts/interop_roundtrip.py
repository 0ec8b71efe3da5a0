"""Checkpoint-level top-1 parity via interop round-trips (VERDICT r3 #2).

Makes "top-1 parity" a property of the CHECKPOINT, not just of two separate
training runs:

  direction A (export): a TRAINED nvit_tpu digits checkpoint →
    ckpt/torch_interop.export → reference-format .pt → strict-loaded into the
    reference ViT (/root/reference/nvit/model.py) → evaluated with the
    reference's own eval semantics (argmax over logits, train.py:562-627) on
    the held-out digits split.  Same top-1 as our Predictor on the same
    checkpoint ⇒ the exported weights ARE the model, under the reference's
    own code.

  direction B (import): a reference torch model TRAINED by side A
    (scripts/reference_digits_parity.py, SAVE_DIR=...) → torch_interop.import
    → our Predictor eval.  Same top-1 as the torch eval of the same .pt ⇒
    imported weights are the model under our stack.

Usage:
  python scripts/interop_roundtrip.py [--ours DIR] [--theirs DIR]
    --ours:   digits-matrix output root (default /tmp/ref_parity/ours),
              expects <profile>/out/checkpoint_best.*
    --theirs: SAVE_DIR of reference_digits_parity.py (default /tmp/refpt),
              expects <profile>.pt
Prints one JSON line per direction per profile; exits nonzero on any top-1
mismatch > TOL percentage points (fp32 both sides ⇒ expected exact).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOL = 1e-6  # percentage points; fp32 both sides


def _reference_modules():
    """Import the reference torch model with flash_attn stubbed (CPU)."""
    if "flash_attn" not in sys.modules:
        stub = types.ModuleType("flash_attn")
        stub.flash_attn_func = None
        sys.modules["flash_attn"] = stub
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from nvit.model import ViT, ViTConfig  # type: ignore

    return ViT, ViTConfig


def _torch_eval(model, images_u8, labels) -> float:
    """Reference eval semantics: normalize (x·2/255)−1, argmax logits."""
    import torch

    model.eval()
    preds = []
    with torch.no_grad():
        for i in range(0, len(images_u8), 256):
            x = torch.from_numpy(
                images_u8[i : i + 256].astype(np.float32) * (2.0 / 255.0) - 1.0
            )
            logits, _ = model(x)
            preds.append(logits.argmax(-1).numpy())
    return float((np.concatenate(preds) == labels).mean()) * 100.0


def _ours_eval(out_dir: str, name: str, images_u8, labels) -> float:
    from nvit_tpu.infer import Predictor

    p = Predictor.from_checkpoint(out_dir, name)
    top, _ = p.predict(images_u8)
    return float((top[:, 0] == labels).mean()) * 100.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ours", default="/tmp/ref_parity/ours")
    ap.add_argument("--theirs", default="/tmp/refpt")
    ap.add_argument("--profiles", default="nvit1_k0,nvit1_k1")
    args = ap.parse_args()

    import torch

    from nvit_tpu.ckpt.torch_interop import (
        config_from_reference_checkpoint,
        export_torch_checkpoint,
        import_torch_checkpoint,
    )
    from nvit_tpu.data.datasets import load_digits_dataset

    ViT, _ = _reference_modules()
    va = load_digits_dataset(train=False, image_size=16)
    images, labels = va.images, va.labels.astype(np.int64)

    failures = []
    for profile in args.profiles.split(","):
        # ---- direction A: ours → reference torch --------------------------
        out_dir = os.path.join(args.ours, profile, "out")
        if os.path.exists(os.path.join(out_dir, "checkpoint_best.npz")):
            ours_top1 = _ours_eval(out_dir, "checkpoint_best", images, labels)
            with tempfile.TemporaryDirectory() as td:
                pt = os.path.join(td, f"{profile}.pt")
                export_torch_checkpoint(out_dir, "checkpoint_best", pt)
                ckpt = torch.load(pt, map_location="cpu", weights_only=False)
                cfg = config_from_reference_checkpoint(ckpt)
                rm = ViT(_ref_config_from(cfg.model))
                rm.load_state_dict(
                    {k: torch.as_tensor(np.asarray(v)) for k, v in ckpt["model"].items()},
                    strict=True,
                )
                torch_top1 = _torch_eval(rm, images, labels)
            delta = abs(ours_top1 - torch_top1)
            print(json.dumps({
                "direction": "export(ours→torch)", "profile": profile,
                "ours_top1": round(ours_top1, 4), "torch_top1": round(torch_top1, 4),
                "delta_pts": round(delta, 6), "ok": delta <= TOL,
            }), flush=True)
            if delta > TOL:
                failures.append(("export", profile, delta))
        else:
            print(json.dumps({"direction": "export", "profile": profile,
                              "skipped": f"no checkpoint in {out_dir}"}), flush=True)

        # ---- direction B: reference torch → ours --------------------------
        pt_in = os.path.join(args.theirs, f"{profile}.pt")
        if os.path.exists(pt_in):
            ckpt = torch.load(pt_in, map_location="cpu", weights_only=False)
            rm = ViT(_ref_config_from(
                config_from_reference_checkpoint(ckpt).model))
            rm.load_state_dict(
                {k: torch.as_tensor(np.asarray(v)) for k, v in ckpt["model"].items()},
                strict=True,
            )
            torch_top1 = _torch_eval(rm, images, labels)
            with tempfile.TemporaryDirectory() as td:
                import_torch_checkpoint(pt_in, td, "checkpoint_best")
                ours_top1 = _ours_eval(td, "checkpoint_best", images, labels)
            delta = abs(ours_top1 - torch_top1)
            print(json.dumps({
                "direction": "import(torch→ours)", "profile": profile,
                "torch_top1": round(torch_top1, 4), "ours_top1": round(ours_top1, 4),
                "delta_pts": round(delta, 6), "ok": delta <= TOL,
            }), flush=True)
            if delta > TOL:
                failures.append(("import", profile, delta))
        else:
            print(json.dumps({"direction": "import", "profile": profile,
                              "skipped": f"{pt_in} missing (run side A with SAVE_DIR)"}),
                  flush=True)

    if failures:
        print(f"ROUNDTRIP MISMATCH: {failures}", flush=True)
        return 1
    print("INTEROP_ROUNDTRIP_OK", flush=True)
    return 0


def _ref_config_from(m):
    """nvit_tpu ViTConfig → reference ViTConfig (constructor kwargs subset)."""
    _, RefConfig = _reference_modules()
    return RefConfig(
        image_size=m.image_size, n_layer=m.n_layer, n_head=m.n_head,
        n_embd=m.n_embd, num_classes=m.num_classes,
        local_patch_size=m.local_patch_size, global_patch_size=m.global_patch_size,
        use_nvit=m.use_nvit, use_kohonen=m.use_kohonen,
        kohonen_nodes=m.kohonen_nodes, kohonen_alpha=m.kohonen_alpha,
        dropout=m.dropout, bias=m.bias,
    )


if __name__ == "__main__":
    sys.exit(main())
