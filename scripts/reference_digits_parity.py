"""Head-to-head accuracy parity vs the ACTUAL reference implementation.

Trains the reference torch model (/root/reference/nvit/model.py, CPU torch,
flash_attn stubbed) on the bundled scikit-learn digits set with the
reference's own training-step semantics — loss composition, AdamW param
groups via ``model.configure_optimizers`` (≙ model.py:369-401), warmup+cosine
LR (≙ train.py:1025-1035), grad-clip, per-step ``normalize_matrices``
(≙ train.py:461-480), in-forward SOM updates — using the SAME config geometry,
data split, normalization ((x·2/255)−1) and iteration budget as our digits
matrix (scripts/digits_matrix.sh).  Augmentation is OFF on both sides: the
reference's kornia AutoAugment is not installable here, so the comparable
nvit_tpu numbers come from running the matrix with
NVIT_DATA__AUGMENTATION__ENABLED=false (see scripts/reference_parity_digits.sh).

This is the north star's "top-1 parity" check executed at the only scale a
zero-egress container permits: REAL images, the reference's real code, its
real optimizer, head-to-head.  Prints one JSON line per profile:
  {"profile": ..., "impl": "reference-torch", "best_top1": ..., ...}
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
import types

import numpy as np
import torch
import torch.nn.functional as F

if "flash_attn" not in sys.modules:  # CUDA-only; unused on the SDPA path
    stub = types.ModuleType("flash_attn")
    stub.flash_attn_func = None
    sys.modules["flash_attn"] = stub
if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

from nvit.model import ViT, ViTConfig  # noqa: E402  (reference, torch)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from nvit_tpu.data.datasets import load_digits_dataset  # noqa: E402

ITERS = int(os.environ.get("ITERS", 2000))
# SEED: vary for run-to-run noise estimation (default = the recorded runs).
# SAVE_DIR: if set, torch.save the final model per profile (state_dict +
#   model_args + its final/best top-1) for the interop round-trip evaluation
#   (scripts/interop_roundtrip.py).
# PROFILES: comma-separated subset (e.g. "nvit1_k1") of the 3-profile matrix.
SEED = int(os.environ.get("SEED", 1797))
SAVE_DIR = os.environ.get("SAVE_DIR", "")
PROFILES = [p for p in os.environ.get("PROFILES", "").split(",") if p]
BATCH = 64
EVAL_INTERVAL = 250
# optimizer settings ≙ both settings.yamls (identical defaults)
LR, MIN_LR, WARMUP, WD, BETAS, CLIP = 1e-3, 1e-5, 100, 0.1, (0.9, 0.95), 1.0
CONSISTENCY_W, SMOOTHNESS_W = 0.1, 0.1  # training section defaults


def make_config(use_nvit: bool, use_kohonen: bool) -> ViTConfig:
    """Geometry ≙ scripts/digits_matrix.sh env; everything else = the shared
    settings.yaml defaults (dropout 0.15, bias true, kohonen_alpha 0.02,
    reconstruction 0.5, quant 0.125, scheduler on w/ 1000/10000/0.001)."""
    return ViTConfig(
        image_size=16,
        n_layer=4,
        n_head=4,
        n_embd=128,
        use_nvit=use_nvit,
        use_kohonen=use_kohonen,
        num_classes=10,
        local_patch_size=4,
        global_patch_size=8,
        kohonen_nodes=32,
        kohonen_alpha=0.02,
        dropout=0.15,
        bias=True,
        flash_attn=False,  # CPU: reference dispatches to SDPA
        reconstruction_weight=0.5,
        map_balance_weight=0.25,
        local_quantization_weight=0.125,
        global_quantization_weight=0.125,
        kohonen_scheduler_enabled=True,
        kohonen_scheduler_warmup_steps=1000,
        kohonen_scheduler_decay_steps=10000,
        kohonen_scheduler_min_lr=0.001,
    )


def get_lr(it: int) -> float:
    """≙ reference train.py:1025-1035."""
    if it < WARMUP:
        return LR * it / WARMUP
    if it > ITERS:
        return MIN_LR
    ratio = (it - WARMUP) / (ITERS - WARMUP)
    return MIN_LR + 0.5 * (1.0 + math.cos(math.pi * ratio)) * (LR - MIN_LR)


def normalize_matrices(model: ViT) -> None:
    """≙ reference train.py:461-480 (verbatim semantics, not code)."""

    def justnorm(x: torch.Tensor, idim: int) -> torch.Tensor:
        dtype = x.dtype
        x = x.float()
        return (x / x.norm(p=2, dim=idim, keepdim=True)).to(dtype=dtype)

    for block in model.transformer.h:
        for name, dim in (
            ("query", 1), ("key", 1), ("value", 1), ("att_c_proj", 0),
            ("c_fc", 1), ("mlp_c_proj", 0),
        ):
            w = getattr(block, name).weight
            w.data.copy_(justnorm(w.data, dim))


def total_loss(model: ViT, logits, aux, y) -> torch.Tensor:
    """≙ reference train.py:905-927 loss composition."""
    loss = F.cross_entropy(logits, y)
    if model.config.use_kohonen:
        loss = loss + CONSISTENCY_W * aux["kohonen_consistency"]
        loss = loss + SMOOTHNESS_W * aux["kohonen_smoothness"]
        loss = loss + model.config.local_quantization_weight * aux["local_quantization"]
        loss = loss + model.config.global_quantization_weight * aux["global_quantization"]
        loss = loss + model.config.reconstruction_weight * aux["reconstruction"]
    return loss


def to_torch(images_u8: np.ndarray) -> torch.Tensor:
    """uint8 [N,3,S,S] → fp32 in [-1,1]  (≙ nvit_tpu/data/augment.py:20-21)."""
    return torch.from_numpy(images_u8.astype(np.float32) * (2.0 / 255.0) - 1.0)


@torch.no_grad()
def evaluate(model: ViT, xva: torch.Tensor, yva: np.ndarray) -> float:
    model.eval()
    preds = []
    for i in range(0, len(xva), 256):
        logits, _ = model(xva[i : i + 256])
        preds.append(logits.argmax(-1).numpy())
    model.train()
    return float((np.concatenate(preds) == yva).mean()) * 100.0


def run_profile(name: str, use_nvit: bool, use_kohonen: bool) -> dict:
    torch.manual_seed(SEED)
    np.random.seed(SEED)
    cfg = make_config(use_nvit, use_kohonen)
    model = ViT(cfg)
    model.train()
    if use_nvit:
        normalize_matrices(model)  # reference normalizes at init too (train.py:452)
    opt = model.configure_optimizers(WD, LR, BETAS, "cpu")

    tr = load_digits_dataset(train=True, image_size=16)
    va = load_digits_dataset(train=False, image_size=16)
    xtr_u8, ytr = tr.images, tr.labels.astype(np.int64)
    xva = to_torch(va.images)
    yva = va.labels.astype(np.int64)

    rng = np.random.RandomState(0)
    order = rng.permutation(len(xtr_u8))
    pos, best, t0 = 0, 0.0, time.time()
    for it in range(ITERS):
        if pos + BATCH > len(order):
            order = rng.permutation(len(xtr_u8))
            pos = 0
        idx = order[pos : pos + BATCH]
        pos += BATCH
        x = to_torch(xtr_u8[idx])
        y = torch.from_numpy(ytr[idx])

        lr = get_lr(it)
        for g in opt.param_groups:
            g["lr"] = lr
        logits, aux = model(x)
        loss = total_loss(model, logits, aux, y)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), CLIP)
        opt.step()
        opt.zero_grad(set_to_none=True)
        if use_nvit:
            normalize_matrices(model)

        if (it + 1) % EVAL_INTERVAL == 0 or it + 1 == ITERS:
            acc = evaluate(model, xva, yva)
            best = max(best, acc)
            print(
                f"  [{name}] iter {it + 1}/{ITERS} loss {loss.item():.4f} "
                f"val top-1 {acc:.2f}% (best {best:.2f}%)",
                flush=True,
            )

    final = evaluate(model, xva, yva)
    if SAVE_DIR:
        os.makedirs(SAVE_DIR, exist_ok=True)
        dest = os.path.join(SAVE_DIR, f"{name}.pt")
        # the reference's own checkpoint shape (train.py:673-683): model
        # state_dict + model_args — loadable by ckpt/torch_interop.py import
        torch.save(
            {
                "model": model.state_dict(),
                "model_args": {
                    "image_size": cfg.image_size, "n_layer": cfg.n_layer,
                    "n_head": cfg.n_head, "n_embd": cfg.n_embd,
                    "num_classes": cfg.num_classes,
                    "local_patch_size": cfg.local_patch_size,
                    "global_patch_size": cfg.global_patch_size,
                    "use_nvit": cfg.use_nvit, "use_kohonen": cfg.use_kohonen,
                    "kohonen_nodes": cfg.kohonen_nodes,
                    "kohonen_alpha": cfg.kohonen_alpha,
                    "dropout": cfg.dropout, "bias": cfg.bias,
                },
                "iter_num": ITERS,
                "final_top1": final,
                "best_val_loss": None,
            },
            dest,
        )
        print(f"  [{name}] saved {dest} (final top-1 {final:.2f}%)", flush=True)
    return {
        "profile": name,
        "impl": "reference-torch",
        "best_top1": round(best, 2),
        "final_top1": round(final, 2),
        "seed": SEED,
        "iters": ITERS,
        "train_s": round(time.time() - t0, 1),
    }


def main() -> None:
    results = []
    for name, nv, ko in (
        ("nvit0_k0", False, False),
        ("nvit1_k0", True, False),
        ("nvit1_k1", True, True),
    ):
        if PROFILES and name not in PROFILES:
            continue
        print(f"=== reference-torch {name} (use_nvit={nv} use_kohonen={ko})", flush=True)
        try:
            results.append(run_profile(name, nv, ko))
        except AttributeError as e:
            # Documented reference bug (PARITY.md §2.1 #4): the baseline Block
            # references self.rmsnorm_att, which __init__ only defines under
            # use_nvit (model.py:63-65 vs 95-96) — the reference cannot train
            # its own baseline profile at all.  nvit_tpu fixed this; its
            # baseline numbers have no reference counterpart to compare to.
            print(f"  [{name}] reference crashed: {e}", flush=True)
            results.append({"profile": name, "impl": "reference-torch", "crashed": str(e)})
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
