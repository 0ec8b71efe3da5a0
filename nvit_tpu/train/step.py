"""The jitted train and eval steps.

≙ reference train.py:805-1023 (hot loop), re-designed SPMD-first
(SURVEY.md §7 translations):

* forward, weighted loss, gradient, AdamW update, nViT weight renorm and the
  SOM Hebbian update ALL live inside one jitted function — one XLA program
  per step, no host round-trips;
* gradient accumulation is a ``lax.scan`` over micro-batches with a single
  averaged update (the reference re-ran the SAME batch per micro-step under
  DDP ``no_sync``, train.py:898-933 — a quirk that wastes compute without
  changing the gradient; we accumulate over distinct micro-batches);
* under data parallelism the step is jitted with the batch sharded over the
  mesh's ``data`` axis — XLA's SPMD partitioner inserts the gradient
  all-reduce (≙ DDP/NCCL bucket all-reduce) and the SOM-delta reduction
  automatically (see parallel/mesh.py);
* no GradScaler: bf16 on TPU needs no loss scaling.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import Array

from nvit_tpu.configs.schema import Config
from nvit_tpu.models.losses import topk_accuracy
from nvit_tpu.models.schedules import cosine_lr
from nvit_tpu.models.vit import total_loss, vit_apply
from nvit_tpu.parallel.spmd import kernel_mesh
from nvit_tpu.train.optim import fused_adamw_renorm_update
from nvit_tpu.train.state import TrainState, compute_dtype_of

Metrics = dict[str, Array]


def global_norm(tree: Any) -> Array:
    leaves = [jnp.sum(jnp.square(x.astype(jnp.float32))) for x in jax.tree_util.tree_leaves(tree)]
    return jnp.sqrt(sum(leaves))


def make_loss_fn(cfg: Config):
    mcfg = cfg.model
    dt = compute_dtype_of(cfg)

    def loss_fn(params, images: Array, labels: Array, step: Array):
        out = vit_apply(
            params, mcfg, images, step=step, train=True, compute_dtype=dt,
            remat=cfg.system.remat, remat_skip=cfg.system.remat_skip_blocks,
        )
        loss, terms = total_loss(
            mcfg,
            cfg.training.consistency_weight,
            cfg.training.smoothness_weight,
            out.logits,
            labels,
            out.aux_losses,
        )
        return loss, (terms, out.som_info)

    return loss_fn


def make_train_step(
    cfg: Config, log_norms: bool | None = None, mesh=None, log_histograms: bool = False
) -> Callable[[TrainState, Array, Array], tuple[TrainState, Metrics]]:
    """Build the (jittable) train step: (state, images, labels) → (state', metrics).

    ``images``: [B, C, H, W] fp32 (already normalized/augmented);
    ``labels``: [B] int32.  With gradient_accumulation_steps=k, B must be
    divisible by k and the step scans over k micro-batches of B/k.

    ``log_norms`` overrides whether grad/param norms are computed in-step
    (default: ``cfg.system.log_gpu_stats``).  The norms cost ~1 GB of fp32
    tree reductions on an HBM-bound step; the Trainer compiles TWO variants
    and runs the norms one only on log-interval iterations, so the default
    config keeps the per-component norm metrics without paying for them on
    every hot step (≙ reference: norms are eval-time, train.py:749-751).

    ``mesh``: the SPMD device mesh the step will be jitted over, when
    multi-device.  Pallas kernels cannot be partitioned by GSPMD; the mesh
    is made ambient during tracing so the op dispatchers shard_map them
    (parallel/spmd.py).  Plain XLA ops ignore it.

    ``log_histograms`` additionally emits per-tensor downsampled gradient
    histograms (``gradhist/<path>`` int32[64] — obs/grad_hist.py; ≙
    wandb.watch(gradients), train.py:531-546).  The Trainer compiles this
    variant only when ``system.log_grad_histograms`` is on and runs it only
    on eval-cadence iterations, so the hot step never pays for it.
    """
    mcfg = cfg.model
    accum = max(1, cfg.training.gradient_accumulation_steps)
    want_norms = cfg.system.log_gpu_stats if log_norms is None else log_norms
    loss_fn = make_loss_fn(cfg)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def compute_grads(params, images, labels, step):
        if accum == 1:
            (_, (terms, som_info)), grads = grad_fn(params, images, labels, step)
            return grads, terms, som_info

        b = images.shape[0]
        if b % accum != 0:  # shapes are static under jit → clear trace-time error
            raise ValueError(
                f"batch size {b} not divisible by gradient_accumulation_steps={accum}"
            )
        micro = b // accum
        images = images.reshape(accum, micro, *images.shape[1:])
        labels = labels.reshape(accum, micro)

        def micro_fn(imgs, labs):
            (_, (terms, som_info)), grads = grad_fn(params, imgs, labs, step)
            deltas = {k: v for k, v in som_info.items() if k.endswith("_delta")}
            return grads, terms, deltas

        def body(carry, xs):
            g_acc, t_acc, s_acc = carry
            grads, terms, deltas = micro_fn(*xs)
            g_acc = jax.tree_util.tree_map(jnp.add, g_acc, grads)
            t_acc = jax.tree_util.tree_map(jnp.add, t_acc, terms)
            # Hebbian deltas are computed against the pre-step nodes each
            # micro-batch, so the batch total is the SUM of micro deltas.
            s_acc = jax.tree_util.tree_map(jnp.add, s_acc, deltas)
            return (g_acc, t_acc, s_acc), None

        # zero-init carry via eval_shape (no extra compute in the program)
        shapes = jax.eval_shape(micro_fn, images[0], labels[0])
        zeros = jax.tree_util.tree_map(lambda sd: jnp.zeros(sd.shape, sd.dtype), shapes)
        (g, t, s), _ = jax.lax.scan(body, zeros, (images, labels))
        grads = jax.tree_util.tree_map(lambda x: x / accum, g)
        terms = jax.tree_util.tree_map(lambda x: x / accum, t)
        return grads, terms, s

    def train_step(state: TrainState, images: Array, labels: Array) -> tuple[TrainState, Metrics]:
        with kernel_mesh(mesh):
            return _train_step_body(state, images, labels)

    def _train_step_body(state, images, labels):
        grads, terms, som_info = compute_grads(state.params, images, labels, state.step)

        # one fused sweep: clip → AdamW → apply → (nViT) renorm per leaf
        # (≙ optimizer step + normalize_matrices, train.py:940-946, 989-990)
        params, opt_state = fused_adamw_renorm_update(
            cfg.optimizer, state.params, grads, state.opt_state, renorm=mcfg.use_nvit
        )

        if mcfg.use_kohonen and mcfg.kohonen_hebbian != "off":
            # non-gradient Hebbian channel (≙ in-forward update_nodes,
            # model.py:428-430) applied as an explicit post-step delta
            params = dict(params)
            for name, dkey in (("local_kohonen", "local_delta"), ("global_kohonen", "global_delta")):
                nodes = params[name]["nodes"]
                params[name] = {"nodes": nodes + som_info[dkey].astype(nodes.dtype)}

        rng, _ = jax.random.split(state.rng)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1, rng=rng)

        metrics: Metrics = dict(terms)
        metrics["learning_rate"] = cosine_lr(cfg.optimizer, state.step)
        if log_histograms:
            from nvit_tpu.obs.grad_hist import tree_grad_histograms

            metrics.update(tree_grad_histograms(grads))
        if want_norms:
            metrics["grad_norm"] = global_norm(grads)
            metrics["param_norm"] = global_norm(params)
            # per-group gradient norms (≙ wandb.watch gradient monitoring,
            # train.py:531-546 — histograms per tensor are HBM-prohibitive on
            # TPU; per-component norms are the SPMD-sane equivalent, computed
            # in-step as replicated scalars)
            for i, bp in enumerate(grads.get("blocks", [])):
                metrics[f"blocks.{i}_grad_norm"] = global_norm(bp)
            for group in ("cross_attention", "local_patch_embed", "global_patch_embed", "head"):
                if group in grads:
                    metrics[f"{group}_grad_norm"] = global_norm(grads[group])
        return new_state, metrics

    return train_step


def make_eval_step(cfg: Config, mesh=None) -> Callable[[Any, Array, Array], Metrics]:
    """Eval step: (params, images, labels) → per-batch metrics.

    ≙ reference validate() inner loop (train.py:590-608): full weighted loss,
    per-term breakdown, top-1/top-5 accuracy.  ``mesh`` as in
    make_train_step (shard_maps the Pallas kernels under multi-device jit).
    """
    mcfg = cfg.model
    dt = compute_dtype_of(cfg)

    def eval_step(params, images: Array, labels: Array) -> Metrics:
        with kernel_mesh(mesh):
            return _eval_body(params, images, labels)

    def _eval_body(params, images, labels):
        out = vit_apply(params, mcfg, images, step=0, train=False, compute_dtype=dt)
        loss, terms = total_loss(
            mcfg,
            cfg.training.consistency_weight,
            cfg.training.smoothness_weight,
            out.logits,
            labels,
            out.aux_losses,
        )
        top1, top5 = topk_accuracy(out.logits, labels)
        metrics: Metrics = dict(terms)
        metrics["loss"] = loss
        metrics["top1_accuracy"] = top1
        metrics["top5_accuracy"] = top5
        return metrics

    return eval_step
