"""Named model presets — the experiment ladder from BASELINE.json.

The reference exposes exactly one settings.yaml model; these presets cover
the measurement ladder (CIFAR smoke → CIFAR-100 profile matrix → ImageNet
nViT-B/16 → v5p-8 nViT-L/16) with one call:
``ViTConfig(**preset("nvit-b16"), num_classes=1000)``.
"""

from __future__ import annotations

from typing import Any

PRESETS: dict[str, dict[str, Any]] = {
    # CIFAR-scale smoke model (BASELINE.json config 1: nViT-Tiny patch-4 CIFAR-10)
    "nvit-tiny4": dict(
        image_size=32, n_layer=4, n_head=4, n_embd=128,
        local_patch_size=4, global_patch_size=8, use_nvit=True,
    ),
    # reference settings.yaml default scale (CIFAR-100 matrix, configs 2-3)
    "nvit-ref-cifar": dict(
        image_size=32, n_layer=2, n_head=2, n_embd=64,
        local_patch_size=8, global_patch_size=16, use_nvit=True,
    ),
    "nvit-s16": dict(
        image_size=224, n_layer=12, n_head=6, n_embd=384,
        local_patch_size=8, global_patch_size=16, use_nvit=True, flash_attn=True,
    ),
    # flagship (BASELINE.json config 4)
    "nvit-b16": dict(
        image_size=224, n_layer=12, n_head=12, n_embd=768,
        local_patch_size=8, global_patch_size=16, use_nvit=True, flash_attn=True,
    ),
    # v5p-8 scale (BASELINE.json config 5)
    "nvit-l16": dict(
        image_size=224, n_layer=24, n_head=16, n_embd=1024,
        local_patch_size=8, global_patch_size=16, use_nvit=True, flash_attn=True,
    ),
}


def preset(name: str) -> dict[str, Any]:
    key = name.lower()
    if key not in PRESETS:
        raise KeyError(f"unknown preset '{name}'; available: {sorted(PRESETS)}")
    return dict(PRESETS[key])
