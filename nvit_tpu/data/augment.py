"""On-device preprocessing: normalize + AutoAugment dispatch.

≙ reference train.py:1081-1092 (kornia ``Normalize(0.5, 0.5)`` +
``AutoAugment(dataset)`` for train; Normalize only for val) and 256-274 (the
transforms run on device after ToTensor).  Here the whole pipeline is a
jittable function of a uint8 batch: host code only moves raw bytes to HBM,
and the uint8→fp32 convert, normalize and augmentation policy all fuse into
one XLA program on the TPU (they are VPU elementwise work overlapping the
step's MXU work when folded into the train step).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def normalize(images_u8: Array) -> Array:
    """uint8 [0,255] → fp32 in [-1, 1]  (≙ ToTensor + Normalize(mean=0.5, std=0.5))."""
    return images_u8.astype(jnp.float32) * (2.0 / 255.0) - 1.0


def preprocess(
    images_u8: Array,
    key: Array | None = None,
    *,
    train: bool = False,
    dataset: str = "cifar10",
    auto_augment: bool = True,
) -> Array:
    """Full preprocessing: AutoAugment (train only, on uint8) → normalize.

    Matches the reference's order: kornia applies Normalize first and then
    AutoAugment on the normalized tensor; our AutoAugment ops are defined on
    [0,255] (the PIL/AA convention), so we augment first and then normalize —
    the composition is equivalent up to the affine transform and keeps the
    standard AA magnitude semantics exact.
    """
    if train and auto_augment and key is not None:
        from nvit_tpu.data.autoaugment import auto_augment_batch

        images_u8 = auto_augment_batch(images_u8, key, dataset=dataset)
    return normalize(images_u8)
