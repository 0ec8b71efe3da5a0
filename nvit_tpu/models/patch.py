"""Dual patch embedding: local (non-overlapping) and global (overlapping).

≙ reference nvit/model.py:286-304.  The reference uses cuDNN convs; on TPU we
reformulate both as matmuls so they land on the MXU:

* local: stride == kernel ⇒ space-to-depth reshape + one matmul.
* global: kernel 2× stride with centered reflection padding ⇒ im2col patch
  extraction (`conv_general_dilated_patches`, channel-major (C, kh, kw) order
  — the same layout as a torch conv weight) + one matmul.

Both streams produce the same (image_size/local_patch)² token grid, aligned
and centered (the reflection pad of (global−local)/2 centers each global
patch on its local patch).

Images are NCHW fp32, matching the reference's data pipeline.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax, Array


def space_to_depth(img: Array, patch: int) -> Array:
    """[B, C, H, W] → [B, T, C·p·p] with per-token layout (C, ph, pw).

    The token layout matches torch's ``unfold(2,p,p).unfold(3,p,p)
    .permute(0,2,3,1,4,5).reshape(...)`` used for the reconstruction target
    (≙ reference model.py:460-463), so one function serves both the local
    patch embed and the reconstruction target.
    """
    b, c, h, w = img.shape
    gh, gw = h // patch, w // patch
    x = img.reshape(b, c, gh, patch, gw, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # [B, gh, gw, C, p, p]
    return x.reshape(b, gh * gw, c * patch * patch)


def extract_overlapping_patches(img: Array, kernel: int, stride: int) -> Array:
    """[B, C, H, W] → [B, T, C·k·k] overlapping patches.

    For the k = 2·s case this model uses (global 16 / stride 8), each window
    is exactly a 2×2 group of neighboring s×s space-to-depth blocks, so the
    extraction is slices + one concat — no gather in the forward and no
    scatter in the backward (XLA lowers the transpose of a slice to a pad).
    The TPU-unfriendly im2col (`conv_general_dilated_patches`) is only the
    general-case fallback.

    Feature layout: 2×2 block-major, each block (C, s, s).  This is a fixed
    permutation of the torch conv's (C, kh, kw) fan-in layout; training from
    scratch, the two layouts are exactly equivalent up to a row permutation
    of the embedding weight (models are identical as functions).
    """
    b = img.shape[0]
    if kernel == 2 * stride:
        x = space_to_depth(img, stride)  # [B, gh*gw, C·s·s]
        gh = img.shape[2] // stride
        gw = img.shape[3] // stride
        x = x.reshape(b, gh, gw, -1)
        g = jnp.concatenate(
            [x[:, :-1, :-1], x[:, :-1, 1:], x[:, 1:, :-1], x[:, 1:, 1:]], axis=-1
        )  # [B, gh-1, gw-1, 4·C·s·s]
        return g.reshape(b, (gh - 1) * (gw - 1), -1)

    patches = lax.conv_general_dilated_patches(
        img,
        filter_shape=(kernel, kernel),
        window_strides=(stride, stride),
        padding="VALID",
    )  # [B, C*k*k, gh, gw]
    feat = patches.shape[1]
    return patches.reshape(b, feat, -1).transpose(0, 2, 1)


def reflect_pad(img: Array, pad: int) -> Array:
    """Reflection-pad H and W (≙ torch nn.ReflectionPad2d, model.py:297)."""
    if pad == 0:
        return img
    return jnp.pad(img, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="reflect")
