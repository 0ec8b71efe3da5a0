"""AutoAugment in pure JAX: the learned CIFAR-10 / ImageNet policies.

≙ reference train.py:1083 (``kornia.augmentation.auto.AutoAugment(dataset)``)
— rebuilt as a jittable, vmapped transform over uint8 CHW batches so the
whole augmentation runs on device (VPU) fused with the input pipeline, not in
host Python like the torch/kornia GPU-op path.

Policies are the published AutoAugment search results (Cubuk et al., 2019;
the same tables torchvision/kornia ship): 25 sub-policies of 2 (op, prob,
magnitude) stages each.  Sub-policy choice, application coin-flips and
magnitude signs are driven by an explicit PRNG key (SURVEY.md §7 translation
#5 — no global RNG).

Implementation notes:
* per-image op dispatch is a ``lax.switch`` under ``vmap`` — XLA lowers this
  to compute-all-branches + select, which is fully vectorized (no
  data-dependent control flow) at the cost of evaluating every op; the op set
  is cheap elementwise/gather work compared to the model step.
* geometry ops (shear/translate/rotate) share one inverse-affine warp with
  nearest-neighbor sampling and zero fill (the AA convention).
* Equalize follows PIL's LUT algorithm exactly (step = (npix − last occupied
  bin) // 255); histograms are one-hot matmuls (MXU-friendly).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

# --- op ids -----------------------------------------------------------------
(
    OP_IDENTITY,
    OP_SHEAR_X,
    OP_SHEAR_Y,
    OP_TRANSLATE_X,
    OP_TRANSLATE_Y,
    OP_ROTATE,
    OP_BRIGHTNESS,
    OP_COLOR,
    OP_CONTRAST,
    OP_SHARPNESS,
    OP_POSTERIZE,
    OP_SOLARIZE,
    OP_AUTOCONTRAST,
    OP_EQUALIZE,
    OP_INVERT,
) = range(15)

_NAME_TO_OP = {
    "identity": OP_IDENTITY,
    "shearx": OP_SHEAR_X,
    "sheary": OP_SHEAR_Y,
    "translatex": OP_TRANSLATE_X,
    "translatey": OP_TRANSLATE_Y,
    "rotate": OP_ROTATE,
    "brightness": OP_BRIGHTNESS,
    "color": OP_COLOR,
    "contrast": OP_CONTRAST,
    "sharpness": OP_SHARPNESS,
    "posterize": OP_POSTERIZE,
    "solarize": OP_SOLARIZE,
    "autocontrast": OP_AUTOCONTRAST,
    "equalize": OP_EQUALIZE,
    "invert": OP_INVERT,
}

_SIGNED = {OP_SHEAR_X, OP_SHEAR_Y, OP_TRANSLATE_X, OP_TRANSLATE_Y, OP_ROTATE,
           OP_BRIGHTNESS, OP_COLOR, OP_CONTRAST, OP_SHARPNESS}

# --- published policies (Cubuk et al. 2019, Table 7/8) ----------------------
CIFAR10_POLICY = [
    (("invert", 0.1, 7), ("contrast", 0.2, 6)),
    (("rotate", 0.7, 2), ("translatex", 0.3, 9)),
    (("sharpness", 0.8, 1), ("sharpness", 0.9, 3)),
    (("sheary", 0.5, 8), ("translatey", 0.7, 9)),
    (("autocontrast", 0.5, 8), ("equalize", 0.9, 2)),
    (("sheary", 0.2, 7), ("posterize", 0.3, 7)),
    (("color", 0.4, 3), ("brightness", 0.6, 7)),
    (("sharpness", 0.3, 9), ("brightness", 0.7, 9)),
    (("equalize", 0.6, 5), ("equalize", 0.5, 1)),
    (("contrast", 0.6, 7), ("sharpness", 0.6, 5)),
    (("color", 0.7, 7), ("translatex", 0.5, 8)),
    (("equalize", 0.3, 7), ("autocontrast", 0.4, 8)),
    (("translatey", 0.4, 3), ("sharpness", 0.2, 6)),
    (("brightness", 0.9, 6), ("color", 0.2, 8)),
    (("solarize", 0.5, 2), ("invert", 0.0, 3)),
    (("equalize", 0.2, 0), ("autocontrast", 0.6, 0)),
    (("equalize", 0.2, 8), ("equalize", 0.6, 4)),
    (("color", 0.9, 9), ("equalize", 0.6, 6)),
    (("autocontrast", 0.8, 4), ("solarize", 0.2, 8)),
    (("brightness", 0.1, 3), ("color", 0.7, 0)),
    (("solarize", 0.4, 5), ("autocontrast", 0.9, 3)),
    (("translatey", 0.9, 9), ("translatey", 0.7, 9)),
    (("autocontrast", 0.9, 2), ("solarize", 0.8, 3)),
    (("equalize", 0.8, 8), ("invert", 0.1, 3)),
    (("translatey", 0.7, 9), ("autocontrast", 0.9, 1)),
]

IMAGENET_POLICY = [
    (("posterize", 0.4, 8), ("rotate", 0.6, 9)),
    (("solarize", 0.6, 5), ("autocontrast", 0.6, 5)),
    (("equalize", 0.8, 8), ("equalize", 0.6, 3)),
    (("posterize", 0.6, 7), ("posterize", 0.6, 6)),
    (("equalize", 0.4, 7), ("solarize", 0.2, 4)),
    (("equalize", 0.4, 4), ("rotate", 0.8, 8)),
    (("solarize", 0.6, 3), ("equalize", 0.6, 7)),
    (("posterize", 0.8, 5), ("equalize", 1.0, 2)),
    (("rotate", 0.2, 3), ("solarize", 0.6, 8)),
    (("equalize", 0.6, 8), ("posterize", 0.4, 6)),
    (("rotate", 0.8, 8), ("color", 0.4, 0)),
    (("rotate", 0.4, 9), ("equalize", 0.6, 2)),
    (("equalize", 0.0, 7), ("equalize", 0.8, 8)),
    (("invert", 0.6, 4), ("equalize", 1.0, 8)),
    (("color", 0.6, 4), ("contrast", 1.0, 8)),
    (("rotate", 0.8, 8), ("color", 1.0, 2)),
    (("color", 0.8, 8), ("solarize", 0.8, 7)),
    (("sharpness", 0.4, 7), ("invert", 0.6, 8)),
    (("shearx", 0.6, 5), ("equalize", 1.0, 9)),
    (("color", 0.4, 0), ("equalize", 0.6, 3)),
    (("equalize", 0.4, 7), ("solarize", 0.2, 4)),
    (("solarize", 0.6, 5), ("autocontrast", 0.6, 5)),
    (("invert", 0.6, 4), ("equalize", 1.0, 8)),
    (("color", 0.6, 4), ("contrast", 1.0, 8)),
    (("equalize", 0.8, 8), ("equalize", 0.6, 3)),
]

_POLICIES = {"cifar10": CIFAR10_POLICY, "cifar100": CIFAR10_POLICY, "imagenet": IMAGENET_POLICY,
             "synthetic": CIFAR10_POLICY, "digits": CIFAR10_POLICY}


def _policy_arrays(policy) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    ops = np.array([[_NAME_TO_OP[a[0]], _NAME_TO_OP[b[0]]] for a, b in policy], np.int32)
    probs = np.array([[a[1], b[1]] for a, b in policy], np.float32)
    mags = np.array([[a[2], b[2]] for a, b in policy], np.int32)
    return ops, probs, mags


# --- magnitude tables (10 bins, torchvision/kornia convention) --------------
def _magnitude(op_id: Array, mag_bin: Array, size: int) -> Array:
    """Map (op, bin) → continuous magnitude (unsigned)."""
    bins = jnp.arange(10, dtype=jnp.float32) / 9.0
    shear = 0.3 * bins
    translate = (150.0 / 331.0) * size * bins
    rotate = 30.0 * bins
    enhance = 0.9 * bins
    posterize = 8.0 - jnp.round(4.0 * bins)  # bits 8..4
    solarize = 255.0 * (1.0 - bins)  # threshold 255..0
    zero = jnp.zeros(10, jnp.float32)
    table = jnp.stack(
        [
            zero,  # identity
            shear, shear,
            translate, translate,
            rotate,
            enhance, enhance, enhance, enhance,  # brightness,color,contrast,sharpness
            posterize,
            solarize,
            zero, zero, zero,  # autocontrast, equalize, invert
        ]
    )  # [15, 10]
    return table[op_id, mag_bin]


# --- single-image ops (float32, range [0, 255], CHW) ------------------------
def _affine_warp(img: Array, inv: Array) -> Array:
    """Apply inverse affine ``inv`` (2x3, center-origin) with NN sampling, 0-fill."""
    c, h, w = img.shape
    ys = jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2.0
    xs = jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2.0
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    src_x = inv[0, 0] * xx + inv[0, 1] * yy + inv[0, 2] + (w - 1) / 2.0
    src_y = inv[1, 0] * xx + inv[1, 1] * yy + inv[1, 2] + (h - 1) / 2.0
    coords = jnp.stack([src_y, src_x])

    def warp_channel(ch):
        return jax.scipy.ndimage.map_coordinates(ch, coords, order=0, mode="constant", cval=0.0)

    return jax.vmap(warp_channel)(img)


def _shear_x(img, v):
    return _affine_warp(img, jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]).at[0, 1].set(v))


def _shear_y(img, v):
    return _affine_warp(img, jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]).at[1, 0].set(v))


def _translate_x(img, v):
    return _affine_warp(img, jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]).at[0, 2].set(-v))


def _translate_y(img, v):
    return _affine_warp(img, jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]).at[1, 2].set(-v))


def _rotate(img, deg):
    rad = deg * math.pi / 180.0
    cos, sin = jnp.cos(rad), jnp.sin(rad)
    inv = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    inv = inv.at[0, 0].set(cos).at[0, 1].set(sin).at[1, 0].set(-sin).at[1, 1].set(cos)
    return _affine_warp(img, inv)


def _grayscale(img):
    # ITU-R 601-2 luma (PIL convert("L"))
    r, g, b = img[0], img[1], img[2]
    return 0.299 * r + 0.587 * g + 0.114 * b


def _blend(a, b, factor):
    """PIL-enhance blend: b + factor·(a − b), clipped."""
    return jnp.clip(b + factor * (a - b), 0.0, 255.0)


def _brightness(img, v):
    return _blend(img, jnp.zeros_like(img), 1.0 + v)


def _color(img, v):
    gray = _grayscale(img)[None, :, :].repeat(3, axis=0)
    return _blend(img, gray, 1.0 + v)


def _contrast(img, v):
    # PIL Contrast: blend with the mean of the grayscale image
    mean = jnp.mean(jnp.round(_grayscale(img)))
    return _blend(img, jnp.full_like(img, mean), 1.0 + v)


def _sharpness(img, v):
    # PIL SMOOTH kernel; border pixels keep original values
    kernel = jnp.array([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]) / 13.0

    def smooth_channel(ch):
        return jax.scipy.signal.convolve2d(ch, kernel, mode="same")

    smooth = jax.vmap(smooth_channel)(img)
    c, h, w = img.shape
    interior = jnp.zeros((h, w), bool).at[1:-1, 1:-1].set(True)
    smooth = jnp.where(interior, smooth, img)
    return _blend(img, smooth, 1.0 + v)


def _posterize(img, bits):
    q = 2.0 ** (8.0 - bits)
    return jnp.clip(jnp.floor(img / q) * q, 0.0, 255.0)


def _solarize(img, thr):
    return jnp.where(img >= thr, 255.0 - img, img)


def _autocontrast(img, _v):
    lo = jnp.min(img, axis=(1, 2), keepdims=True)
    hi = jnp.max(img, axis=(1, 2), keepdims=True)
    scale = 255.0 / jnp.maximum(hi - lo, 1e-6)
    out = (img - lo) * scale
    return jnp.where(hi > lo, jnp.clip(out, 0.0, 255.0), img)


def _equalize(img, _v):
    """PIL ImageOps.equalize, per channel."""

    def eq_channel(ch):
        vals = jnp.clip(jnp.round(ch), 0, 255).astype(jnp.int32).reshape(-1)
        hist = jnp.zeros(256, jnp.int32).at[vals].add(1)
        nonzero = hist > 0
        idx = jnp.arange(256)
        last_idx = jnp.max(jnp.where(nonzero, idx, -1))
        last_count = hist[last_idx]
        step = (jnp.sum(hist) - last_count) // 255
        cum = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(hist)[:-1]])
        lut = (step // 2 + cum) // jnp.maximum(step, 1)
        lut = jnp.clip(lut, 0, 255).astype(jnp.float32)
        eq = lut[vals].reshape(ch.shape)
        return jnp.where(step == 0, ch, eq)

    return jax.vmap(eq_channel)(img)


def _invert(img, _v):
    return 255.0 - img


def _apply_op(img: Array, op_id: Array, magnitude: Array) -> Array:
    branches = [
        lambda im, v: im,  # identity
        _shear_x,
        _shear_y,
        _translate_x,
        _translate_y,
        _rotate,
        _brightness,
        _color,
        _contrast,
        _sharpness,
        _posterize,
        _solarize,
        _autocontrast,
        _equalize,
        _invert,
    ]
    return jax.lax.switch(op_id, branches, img, magnitude)


def _augment_one(img_u8: Array, key: Array, ops, probs, mags, size: int) -> Array:
    """Apply one randomly-chosen sub-policy (2 stages) to a single image."""
    k_pol, k_coin, k_sign = jax.random.split(key, 3)
    pol = jax.random.randint(k_pol, (), 0, ops.shape[0])
    coins = jax.random.uniform(k_coin, (2,))
    signs = jnp.where(jax.random.bernoulli(k_sign, 0.5, (2,)), 1.0, -1.0)

    img = img_u8.astype(jnp.float32)
    for stage in range(2):
        op = ops[pol, stage]
        mag = _magnitude(op, mags[pol, stage], size)
        is_signed = jnp.isin(op, jnp.array(sorted(_SIGNED)))
        mag = jnp.where(is_signed, signs[stage] * mag, mag)
        apply = coins[stage] < probs[pol, stage]
        op_eff = jnp.where(apply, op, OP_IDENTITY)
        img = _apply_op(img, op_eff, mag)
    return jnp.clip(jnp.round(img), 0, 255).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("dataset",))
def auto_augment_batch(images_u8: Array, key: Array, *, dataset: str = "cifar10") -> Array:
    """AutoAugment a uint8 [B, C, H, W] batch with the dataset's policy."""
    policy = _POLICIES[dataset.lower()]
    ops, probs, mags = (jnp.asarray(a) for a in _policy_arrays(policy))
    size = images_u8.shape[-1]
    keys = jax.random.split(key, images_u8.shape[0])
    return jax.vmap(lambda im, k: _augment_one(im, k, ops, probs, mags, size))(images_u8, keys)
