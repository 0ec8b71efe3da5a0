"""The ViT / nViT top model: init + pure apply.

≙ reference nvit/model.py:278-470.  Key idiomatic translations (SURVEY.md §7):

* The reference forward is stateful — it increments ``self.step`` and mutates
  the SOM codebooks in-place during the forward (model.py:404-405, 428-430).
  Here ``step`` is an explicit (traceable) input and the SOM Hebbian updates
  are returned as deltas in the output for the train step to apply — the
  apply function is pure.
* Patch embeds are matmuls (space-to-depth / im2col), not convs — see
  models/patch.py.
* ``transformer.drop`` exists in the reference but is never applied
  (model.py:336); we do not create it.  ``map_balance`` is created but never
  read (model.py:323); we create it for optimizer/parameter parity.
* Dual ViT/nViT modes both run (the reference's pure-baseline mode crashes on
  a latent RMSNorm bug; fixed here — see models/blocks.py).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from nvit_tpu.configs.schema import ViTConfig
from nvit_tpu.core.layers import init_conv_patch, init_linear, linear
from nvit_tpu.core.norms import layer_norm
from nvit_tpu.core.residual import norm_skip
from nvit_tpu.models import losses as L
from nvit_tpu.models.blocks import (
    block_apply,
    cross_attention_apply,
    init_block,
    init_cross_attention,
)
from nvit_tpu.models.patch import extract_overlapping_patches, reflect_pad, space_to_depth
from nvit_tpu.models.schedules import kohonen_lr
from nvit_tpu.som import kohonen as som

Params = dict[str, Any]


class VitOutput(NamedTuple):
    logits: Array
    aux_losses: dict[str, Array]
    som_info: dict[str, Array]


def kohonen_spec(cfg: ViTConfig) -> som.KohonenSpec:
    """Each of the two maps gets half the configured node budget
    (≙ reference model.py:313-322: ``kohonen_nodes // 2`` per map).

    When the Kohonen LR scheduler is enabled the map's base alpha is
    ``kohonen_scheduler_min_lr`` — the scheduler output multiplies it, so the
    effective Hebbian strength is sched(step)·min_lr (≙ model.py:313-322's
    conditional constructor argument), NOT sched(step)·kohonen_alpha."""
    alpha = cfg.kohonen_scheduler_min_lr if cfg.kohonen_scheduler_enabled else cfg.kohonen_alpha
    return som.make_spec(cfg.n_embd, cfg.kohonen_nodes // 2, alpha=alpha)


def init_vit(key: Array, cfg: ViTConfig) -> Params:
    cfg.validate()
    keys = jax.random.split(key, 16)
    n_patches = cfg.n_patches
    d = cfg.n_embd

    params: Params = {
        "local_patch_embed": init_conv_patch(keys[0], cfg.channels, cfg.local_patch_size, d),
        "global_patch_embed": init_conv_patch(keys[1], cfg.channels, cfg.global_patch_size, d),
        "local_pos_embed": jnp.zeros((1, n_patches, d), dtype=jnp.float32),
        "global_pos_embed": jnp.zeros((1, n_patches, d), dtype=jnp.float32),
        "cross_attention": init_cross_attention(keys[2], cfg),
        # reconstruction head: Linear + Tanh (≙ model.py:329-332; torch Linear
        # default bias=True regardless of cfg.bias)
        "reconstruction_head": init_linear(
            keys[3], d, cfg.local_patch_size * cfg.local_patch_size * cfg.channels, bias=True
        ),
        "blocks": [
            init_block(k, cfg) for k in jax.random.split(keys[4], cfg.n_layer)
        ],
        # classification head: LayerNorm + Linear (≙ model.py:341-344)
        "head_norm": {"w": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)},
        "head": init_linear(keys[5], d, cfg.num_classes, bias=True),
    }
    if cfg.use_kohonen:
        spec = kohonen_spec(cfg)
        params["local_kohonen"] = {"nodes": som.init_nodes(keys[6], spec)}
        params["global_kohonen"] = {"nodes": som.init_nodes(keys[7], spec)}
        # created-but-unused in the reference (model.py:323); kept for parity
        params["map_balance"] = jnp.asarray(cfg.map_balance_weight, dtype=jnp.float32)
    if cfg.use_nvit:
        # ≙ model.py:346-349 + the _init_weights constant fill (model.py:366-367)
        params["sz"] = cfg.sz_init_value * jnp.ones((cfg.num_classes,), dtype=jnp.float32)
    return params


def embed_patches(params: Params, cfg: ViTConfig, img: Array, *, compute_dtype: Any = None) -> tuple[Array, Array]:
    """Dual patch embedding + learned position embeddings → ([B,T,d], [B,T,d])."""
    local_px = space_to_depth(img, cfg.local_patch_size)
    local = linear(params["local_patch_embed"], local_px, compute_dtype=compute_dtype)

    pad = (cfg.global_patch_size - cfg.local_patch_size) // 2
    global_px = extract_overlapping_patches(
        reflect_pad(img, pad), cfg.global_patch_size, cfg.local_patch_size
    )
    global_ = linear(params["global_patch_embed"], global_px, compute_dtype=compute_dtype)

    local = local + params["local_pos_embed"].astype(local.dtype)
    global_ = global_ + params["global_pos_embed"].astype(global_.dtype)
    return local, global_


def vit_apply(
    params: Params,
    cfg: ViTConfig,
    img: Array,
    *,
    step: Array | int = 0,
    train: bool = False,
    compute_dtype: Any = None,
    remat: bool = False,
    remat_skip: int = 0,
) -> VitOutput:
    """Forward pass: img [B, C, H, W] → (logits [B, classes], aux_losses, som_info).

    ≙ reference model.py:403-470.  ``som_info`` carries the BMU indices and —
    when ``train=True`` — the Hebbian node deltas for the train step to apply
    (and, under data parallelism, to psum across shards).
    """
    dt = compute_dtype
    local, global_ = embed_patches(params, cfg, img, compute_dtype=dt)

    def _cross(cp, a, b_):
        return cross_attention_apply(cp, cfg, a, b_, compute_dtype=dt)

    if remat:
        _cross = jax.checkpoint(
            _cross, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable
        )

    aux: dict[str, Array] = {}
    som_info: dict[str, Array] = {}

    if cfg.use_kohonen:
        spec = kohonen_spec(cfg)
        lr = kohonen_lr(cfg, step)
        local_nodes = params["local_kohonen"]["nodes"]
        global_nodes = params["global_kohonen"]["nodes"]

        local_repr, local_idx = som.bmu(local_nodes, local)
        global_repr, global_idx = som.bmu(global_nodes, global_)
        som_info["local_indices"] = local_idx
        som_info["global_indices"] = global_idx

        if train and cfg.kohonen_hebbian != "off":
            kernel = som.neighborhood_kernel(spec)
            # "reference": normalize the all-sample batch delta by T so the
            # per-step Hebbian magnitude matches the reference's B-iteration
            # update loop (kohonen.py:138 zips B·T BMUs against B images);
            # see configs/schema.py:kohonen_hebbian for the full rationale.
            heb_lr = lr / local.shape[-2] if cfg.kohonen_hebbian == "reference" else lr
            som_info["local_delta"] = som.hebbian_delta(
                local_nodes, kernel, local, local_idx, heb_lr, spec.alpha
            )
            som_info["global_delta"] = som.hebbian_delta(
                global_nodes, kernel, global_, global_idx, heb_lr, spec.alpha
            )

        local_repr = local_repr.astype(local.dtype)
        global_repr = global_repr.astype(global_.dtype)

        # one SHARED cross-attention block reused for all three fusions
        # (≙ model.py:326, 433-444)
        local_new = _cross(params["cross_attention"], local_repr, local)
        global_new = _cross(params["cross_attention"], global_repr, global_)

        aux["kohonen_consistency"] = L.consistency_loss(local_repr, global_repr)
        aux["kohonen_smoothness"] = L.smoothness_loss(
            local_nodes, local_idx, global_nodes, global_idx, spec.m, spec.n
        )
        aux["local_quantization"] = L.huber_loss(local_repr, local)
        aux["global_quantization"] = L.huber_loss(global_repr, global_)

        patches = _cross(params["cross_attention"], local_new, global_new)
    else:
        patches = _cross(params["cross_attention"], local, global_)

    # transformer trunk with the outer normalized skip (double residual,
    # ≙ model.py:450-452).  Under remat each block's activations are
    # recomputed in the backward pass (jax.checkpoint) — the standard TPU
    # HBM/FLOPs trade.  ``remat_skip`` exempts the LAST n blocks: their saved
    # activations have the shortest live range (end of fwd → start of bwd),
    # so spending spare HBM there buys back recompute FLOPs cheapest.
    def _block(bp, h):
        return block_apply(bp, cfg, h, compute_dtype=dt)

    _block_remat = (
        jax.checkpoint(_block, policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)
        if remat
        else _block
    )
    n_layer = len(params["blocks"])
    for i, bp in enumerate(params["blocks"]):
        f = _block if (remat and i >= n_layer - remat_skip) else _block_remat
        patches_new = f(bp, patches)
        patches = norm_skip(patches_new, patches, bp["skip_param"])

    x = jnp.mean(patches, axis=1)
    logits = linear(params["head"], layer_norm(x, params["head_norm"]["w"], params["head_norm"]["b"]))

    # reconstruction vs raw pixel patches (≙ model.py:459-464); computed in
    # both modes, only *weighted into the loss* when use_kohonen (train.py:909-926)
    reconstructed = jnp.tanh(linear(params["reconstruction_head"], patches, compute_dtype=dt))
    target = space_to_depth(img, cfg.local_patch_size)
    aux["reconstruction"] = L.mse_loss(reconstructed, target)

    if cfg.use_nvit:
        sz_eff = params["sz"] * (cfg.sz_init_value / cfg.sz_init_scaling)
        logits = logits.astype(jnp.float32) * sz_eff

    return VitOutput(logits=logits, aux_losses=aux, som_info=som_info)


def total_loss(
    cfg: ViTConfig,
    consistency_weight: float,
    smoothness_weight: float,
    logits: Array,
    labels: Array,
    aux: dict[str, Array],
) -> tuple[Array, dict[str, Array]]:
    """CE + weighted aux losses (≙ reference train.py:906-926).

    Aux terms — including reconstruction — are only added when
    ``use_kohonen=True``, matching the reference's training loop exactly.
    """
    class_loss = L.cross_entropy(logits, labels)
    loss = class_loss
    terms = {"class_loss": class_loss}
    if cfg.use_kohonen:
        loss = loss + consistency_weight * aux["kohonen_consistency"]
        loss = loss + smoothness_weight * aux["kohonen_smoothness"]
        loss = loss + cfg.local_quantization_weight * aux["local_quantization"]
        loss = loss + cfg.global_quantization_weight * aux["global_quantization"]
        loss = loss + cfg.reconstruction_weight * aux["reconstruction"]
        terms.update(aux)
    else:
        terms["reconstruction"] = aux["reconstruction"]
    terms["total_loss"] = loss
    return loss, terms


def num_params(params: Params) -> int:
    """≙ reference model.py:472-475."""
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


def estimate_flops_per_iter(cfg: ViTConfig, n_params: int, fwdbwd_per_iter: int = 1) -> float:
    """FLOPs-per-iteration model (≙ reference estimate_mfu, model.py:387-401):
    flops/token = 6N + 12·L·H·Q·T, flops/iter = flops/token · T · fwdbwd."""
    L_, H, Q = cfg.n_layer, cfg.n_head, cfg.head_dim
    T = cfg.n_patches
    flops_per_token = 6 * n_params + 12 * L_ * H * Q * T
    return float(flops_per_token * T * fwdbwd_per_iter)
