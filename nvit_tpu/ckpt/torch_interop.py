"""Torch-checkpoint interop: migrate reference checkpoints in, export ours out.

≙ /root/reference/nvit/train.py:629-709 (checkpoint dict layout) and
model.py:278-356 (state_dict key layout).  A user of the reference can bring
an existing ``checkpoint_{latest,best}.pt`` here and continue training
(``import``), or take a model trained here back to the torch reference as a
strict-loadable ``state_dict`` (``export``):

    python -m nvit_tpu.ckpt.torch_interop import  --pt out/checkpoint_best.pt --dest out_tpu
    python -m nvit_tpu.ckpt.torch_interop export --checkpoint out_tpu --name checkpoint_best \
        --dest out/checkpoint_from_tpu.pt

The tensor mapping is the same one the cross-framework golden-parity suite
validates leaf-by-leaf against torch autograd (tests/test_reference_parity.py
imports these functions), so import/export round-trips are exact:

* torch ``nn.Linear`` weights are ``[out, in]``; ours are ``[in, out]``
  (``y = x @ w``) — transposed both ways.
* the local patch embed is a ``Conv2d(C, d, k=p, s=p)``; ours is a matmul over
  space-to-depth patches whose ``(C, ph, pw)`` fan-in order equals the torch
  flattened kernel — ``reshape(d, -1).T``.
* the global patch embed is a ``Conv2d(C, d, k=16, s=8)`` over a reflection
  pad; ours is a matmul over 2×2-block-major overlapping patches
  (models/patch.py) — a fixed row permutation of the torch kernel fan-in.
* reference-quirk keys are reconciled: nViT-mode reference blocks construct
  (but never use) ``rmsnorm_att/mlp`` — import ignores them, export emits
  unit weights so ``load_state_dict(strict=True)`` succeeds; baseline-mode
  reference blocks do NOT construct them (the upstream crash bug, PARITY.md)
  while ours do — export drops ours with a warning.
* Kohonen ``locations``/``offsets`` buffers are deterministic grid geometry —
  recomputed on export, ignored on import.

No torch import happens at module import time: the pure-numpy mapping is
usable without torch; only the ``.pt`` read/write helpers require it.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from pathlib import Path
from typing import Any, Mapping

import numpy as np

from nvit_tpu.configs.schema import Config, ViTConfig, merge_dataclass

logger = logging.getLogger(__name__)

# Reference ViTConfig field names (model.py:13-40) — the model_args contract.
REFERENCE_MODEL_ARGS = (
    "image_size", "n_layer", "n_head", "n_embd", "base_scale", "use_nvit",
    "flash_attn", "sz_init_value", "sz_init_scaling", "dropout", "bias",
    "channels", "num_classes", "local_patch_size", "global_patch_size",
    "kohonen_nodes", "kohonen_alpha", "use_kohonen", "reconstruction_weight",
    "map_balance_weight", "kohonen_scheduler_enabled",
    "kohonen_scheduler_warmup_steps", "kohonen_scheduler_decay_steps",
    "kohonen_scheduler_min_lr", "local_quantization_weight",
    "global_quantization_weight",
)


def _torch_from(a: Any) -> "Any":
    """numpy → torch tensor, preserving rank: np.ascontiguousarray promotes
    0-d to (1,) (torch's load_state_dict shims that legacy case, AdamW's step
    does not) — np.array(..., order="C") copies contiguously WITHOUT the
    promotion."""
    import torch

    return torch.from_numpy(np.array(a, order="C"))


def _np(t: Any) -> np.ndarray:
    """Tensor-or-array → detached fp-preserving numpy COPY (a torch tensor
    mutated in place afterwards must not alias the mapped tree)."""
    if hasattr(t, "detach"):  # torch.Tensor without importing torch
        t = t.detach().cpu().numpy()
    return np.array(t)


def global_embed_permutation(channels: int, kernel: int, stride: int) -> np.ndarray:
    """Row permutation mapping a torch conv's flattened ``(C, kh, kw)`` fan-in
    onto extract_overlapping_patches' feature layout (models/patch.py).
    ``perm[our_row] = torch_flat_index``.

    The 2×2-block-major slice-concat layout only applies to the
    ``kernel == 2·stride`` fast path; every other shape goes through the
    im2col fallback (conv_general_dilated_patches), whose ``(C, kh, kw)``
    feature order already equals the torch fan-in — identity."""
    if kernel != 2 * stride:
        return np.arange(channels * kernel * kernel, dtype=np.int64)
    s = stride
    perm = np.empty(channels * kernel * kernel, dtype=np.int64)
    for i in range(2):
        for j in range(2):
            blk = 2 * i + j
            for c in range(channels):
                for ph in range(s):
                    for pw in range(s):
                        our = ((blk * channels + c) * s + ph) * s + pw
                        perm[our] = c * kernel * kernel + (i * s + ph) * kernel + (j * s + pw)
    return perm


# ---------------------------------------------------------------------------
# torch state_dict → nvit_tpu parameter tree
# ---------------------------------------------------------------------------


def _map_linear(sd: Mapping[str, Any], prefix: str) -> dict:
    p = {"w": _np(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        p["b"] = _np(sd[f"{prefix}.bias"])
    return p


def _map_block(sd: Mapping[str, Any], prefix: str, use_nvit: bool) -> dict:
    p = {
        name: _map_linear(sd, f"{prefix}.{name}")
        for name in ("query", "key", "value", "att_c_proj", "c_fc", "mlp_c_proj")
    }
    p["skip_param"] = _np(sd[f"{prefix}.skip_param"])
    if use_nvit:
        for name in ("attn_alpha", "mlp_alpha", "sqk", "suv"):
            p[name] = _np(sd[f"{prefix}.{name}"])
        # reference nViT blocks also carry rmsnorm_att/mlp weights it never
        # uses (model.py:63-65 vs 95-96) — deliberately not mapped
    else:
        # the reference never constructs these in baseline mode (its crash
        # bug); our working baseline blocks need unit weights
        d = p["query"]["w"].shape[0]
        p["rmsnorm_att"] = np.ones((d,), dtype=np.float32)
        p["rmsnorm_mlp"] = np.ones((d,), dtype=np.float32)
    return p


def _map_cross_attention(sd: Mapping[str, Any], prefix: str, use_nvit: bool) -> dict:
    p = {
        name: _map_linear(sd, f"{prefix}.{name}")
        for name in ("q_local", "k_global", "v_global", "proj", "out_proj")
    }
    if use_nvit:
        p["attn_alpha"] = _np(sd[f"{prefix}.attn_alpha"])
        p["sqk"] = _np(sd[f"{prefix}.sqk"])
    else:
        p["local_norm"] = _np(sd[f"{prefix}.local_norm.weight"])
        p["global_norm"] = _np(sd[f"{prefix}.global_norm.weight"])
    return p


def params_from_state_dict(sd: Mapping[str, Any], cfg: ViTConfig) -> dict:
    """Full torch ViT ``state_dict`` → nvit_tpu parameter tree (numpy leaves).

    ``sd`` values may be torch tensors or numpy arrays; the same key layout the
    reference's ``ViT.state_dict()`` produces (model.py:278-356) is expected.
    Also used by tests/test_reference_parity.py to push torch GRADIENTS through
    the identical axis transforms.
    """
    d = cfg.n_embd

    lw = _np(sd["local_patch_embed.weight"])  # [d, C, p, p]
    local_embed = {
        "w": lw.reshape(d, -1).T,
        "b": _np(sd["local_patch_embed.bias"]),
    }

    gw = _np(sd["global_patch_embed.1.weight"]).reshape(d, -1)  # [d, C*k*k]
    perm = global_embed_permutation(cfg.channels, cfg.global_patch_size, cfg.local_patch_size)
    global_embed = {"w": gw[:, perm].T, "b": _np(sd["global_patch_embed.1.bias"])}

    params = {
        "local_patch_embed": local_embed,
        "global_patch_embed": global_embed,
        "local_pos_embed": _np(sd["local_pos_embed"]),
        "global_pos_embed": _np(sd["global_pos_embed"]),
        "cross_attention": _map_cross_attention(sd, "cross_attention", cfg.use_nvit),
        "reconstruction_head": _map_linear(sd, "reconstruction_head.0"),
        "blocks": [
            _map_block(sd, f"transformer.h.{i}", cfg.use_nvit) for i in range(cfg.n_layer)
        ],
        "head_norm": {"w": _np(sd["mlp_head.0.weight"]), "b": _np(sd["mlp_head.0.bias"])},
        "head": _map_linear(sd, "mlp_head.1"),
    }
    if cfg.use_kohonen:
        params["local_kohonen"] = {"nodes": _np(sd["local_kohonen.nodes"])}
        params["global_kohonen"] = {"nodes": _np(sd["global_kohonen.nodes"])}
        params["map_balance"] = _np(sd["map_balance"])
    if cfg.use_nvit:
        params["sz"] = _np(sd["sz"])
    return params


# ---------------------------------------------------------------------------
# nvit_tpu parameter tree → torch state_dict
# ---------------------------------------------------------------------------


def _unmap_linear(p: Mapping[str, Any], prefix: str, out: dict) -> None:
    out[f"{prefix}.weight"] = _np(p["w"]).T
    if "b" in p:
        out[f"{prefix}.bias"] = _np(p["b"])


def _som_grid_buffers(num_nodes: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic KohonenMap buffers (≙ kohonen.py:52-78): the model's own
    grid geometry (som/kohonen.py is the single source of truth for m×n) plus
    the reference's 8 periodic wrap offsets."""
    from nvit_tpu.som.kohonen import grid_locations, make_spec

    spec = make_spec(input_dim=1, num_nodes=num_nodes)
    m, n = spec.m, spec.n
    offsets = np.array(
        [[-m, -n], [m, n], [-m, 0], [m, 0], [0, -n], [0, n], [-m, n], [m, -n]],
        dtype=np.int64,
    )  # ≙ kohonen.py:71-78 (registration order matters for state_dict parity)
    return grid_locations(spec), offsets


def state_dict_from_params(
    params: Mapping[str, Any], cfg: ViTConfig, *, warn_dropped: bool = True
) -> dict[str, np.ndarray]:
    """nvit_tpu parameter tree → reference-layout ``state_dict`` (numpy).

    The result loads into ``/root/reference/nvit/model.py::ViT(config)`` with
    ``strict=True``: unused-but-constructed reference parameters (nViT
    ``rmsnorm_att/mlp``) are emitted at their init values, and the
    deterministic Kohonen ``locations``/``offsets`` buffers are recomputed.
    Our baseline-mode ``rmsnorm_att/mlp`` weights have no reference slot (the
    upstream baseline crash bug) and are dropped with a warning if they have
    been trained away from init.
    """
    d = cfg.n_embd
    sd: dict[str, np.ndarray] = {}

    lw = _np(params["local_patch_embed"]["w"])  # [C*p*p, d]
    sd["local_patch_embed.weight"] = lw.T.reshape(
        d, cfg.channels, cfg.local_patch_size, cfg.local_patch_size
    )
    sd["local_patch_embed.bias"] = _np(params["local_patch_embed"]["b"])

    perm = global_embed_permutation(cfg.channels, cfg.global_patch_size, cfg.local_patch_size)
    inv = np.argsort(perm)
    gw = _np(params["global_patch_embed"]["w"]).T  # [d, C*k*k] in OUR column order
    sd["global_patch_embed.1.weight"] = gw[:, inv].reshape(
        d, cfg.channels, cfg.global_patch_size, cfg.global_patch_size
    )
    sd["global_patch_embed.1.bias"] = _np(params["global_patch_embed"]["b"])

    sd["local_pos_embed"] = _np(params["local_pos_embed"])
    sd["global_pos_embed"] = _np(params["global_pos_embed"])

    ca = params["cross_attention"]
    for name in ("q_local", "k_global", "v_global", "proj", "out_proj"):
        _unmap_linear(ca[name], f"cross_attention.{name}", sd)
    if cfg.use_nvit:
        sd["cross_attention.attn_alpha"] = _np(ca["attn_alpha"])
        sd["cross_attention.sqk"] = _np(ca["sqk"])
    else:
        sd["cross_attention.local_norm.weight"] = _np(ca["local_norm"])
        sd["cross_attention.global_norm.weight"] = _np(ca["global_norm"])

    _unmap_linear(params["reconstruction_head"], "reconstruction_head.0", sd)

    for i, blk in enumerate(params["blocks"]):
        prefix = f"transformer.h.{i}"
        for name in ("query", "key", "value", "att_c_proj", "c_fc", "mlp_c_proj"):
            _unmap_linear(blk[name], f"{prefix}.{name}", sd)
        sd[f"{prefix}.skip_param"] = _np(blk["skip_param"])
        if cfg.use_nvit:
            for name in ("attn_alpha", "mlp_alpha", "sqk", "suv"):
                sd[f"{prefix}.{name}"] = _np(blk[name])
            # constructed-but-unused in the reference (model.py:63-65):
            # strict load demands them; init value is ones
            sd[f"{prefix}.rmsnorm_att.weight"] = np.ones((d,), dtype=np.float32)
            sd[f"{prefix}.rmsnorm_mlp.weight"] = np.ones((d,), dtype=np.float32)
        else:
            for name in ("rmsnorm_att", "rmsnorm_mlp"):
                w = _np(blk[name])
                if warn_dropped and not np.allclose(w, 1.0):
                    logger.warning(
                        "dropping trained %s.%s (reference baseline blocks do "
                        "not construct RMSNorms — upstream bug, PARITY.md)",
                        prefix, name,
                    )

    sd["mlp_head.0.weight"] = _np(params["head_norm"]["w"])
    sd["mlp_head.0.bias"] = _np(params["head_norm"]["b"])
    _unmap_linear(params["head"], "mlp_head.1", sd)

    if cfg.use_kohonen:
        for stream in ("local", "global"):
            nodes = _np(params[f"{stream}_kohonen"]["nodes"])
            sd[f"{stream}_kohonen.nodes"] = nodes
            locs, offsets = _som_grid_buffers(cfg.kohonen_nodes // 2)
            sd[f"{stream}_kohonen.locations"] = locs
            sd[f"{stream}_kohonen.offsets"] = offsets
        sd["map_balance"] = _np(params["map_balance"])
    if cfg.use_nvit:
        sd["sz"] = _np(params["sz"])
    return sd


# ---------------------------------------------------------------------------
# config mapping
# ---------------------------------------------------------------------------


def vit_config_from_model_args(model_args: Mapping[str, Any]) -> ViTConfig:
    """Reference ``model_args`` (asdict of its ViTConfig, train.py:643) →
    our ViTConfig.  Unknown keys are ignored (ours is a superset; theirs may
    gain fields)."""
    ours = {f.name for f in dataclasses.fields(ViTConfig)}
    known = {k: v for k, v in model_args.items() if k in ours}
    dropped = sorted(set(model_args) - set(known))
    if dropped:
        logger.info("ignoring unknown model_args keys: %s", dropped)
    return merge_dataclass(ViTConfig(), known)


def model_args_from_config(cfg: ViTConfig) -> dict[str, Any]:
    """Our ViTConfig → reference ``model_args`` dict (exactly the reference's
    field set, so ``ref.ViTConfig(**model_args)`` constructs)."""
    return {name: getattr(cfg, name) for name in REFERENCE_MODEL_ARGS}


def _lenient_merge(obj: Any, overrides: Mapping[str, Any]) -> Any:
    """merge_dataclass, but unknown keys/sections are dropped with a log line
    instead of raising — reference settings dicts may carry torch-only keys
    (system.backend etc.) that have no slot here."""
    fields = {f.name for f in dataclasses.fields(obj)}
    kept: dict[str, Any] = {}
    for key, value in overrides.items():
        lk = key.lower()
        if lk not in fields:
            logger.info("ignoring unknown config key '%s'", key)
            continue
        current = getattr(obj, lk)
        if dataclasses.is_dataclass(current) and isinstance(value, dict):
            kept[lk] = dataclasses.asdict(_lenient_merge(current, value))
        else:
            kept[lk] = value
    return merge_dataclass(obj, kept)


def config_from_reference_checkpoint(ckpt: Mapping[str, Any]) -> Config:
    """Rebuild a full Config from a reference checkpoint dict: the stored
    settings tree (lenient — torch-only keys dropped) with ``model_args``
    taking precedence for the model section (≙ our resume rule: the
    checkpoint's model config wins)."""
    cfg = Config()
    settings = ckpt.get("config")
    if isinstance(settings, Mapping):
        cfg = _lenient_merge(cfg, {k: v for k, v in settings.items()})
    model_args = ckpt.get("model_args")
    if isinstance(model_args, Mapping):
        cfg = dataclasses.replace(cfg, model=vit_config_from_model_args(model_args))
    return cfg


# ---------------------------------------------------------------------------
# optimizer-moment migration
# ---------------------------------------------------------------------------


def reference_state_dict_order(cfg: ViTConfig) -> list[str]:
    """Key order of the reference ViT's ``state_dict()`` — torch's module-DFS
    (direct parameters before child modules, children in registration order,
    model.py:278-356).  The AdamW param enumeration derives from this, so it
    must NOT depend on any python-dict insertion order of OUR making; the
    test suite pins it against the actual reference model in both modes."""
    keys = ["local_pos_embed", "global_pos_embed"]
    if cfg.use_kohonen:
        keys.append("map_balance")
    if cfg.use_nvit:
        keys.append("sz")
    keys += [
        "local_patch_embed.weight", "local_patch_embed.bias",
        "global_patch_embed.1.weight", "global_patch_embed.1.bias",
    ]
    if cfg.use_kohonen:
        for s in ("local", "global"):
            keys += [f"{s}_kohonen.nodes", f"{s}_kohonen.locations", f"{s}_kohonen.offsets"]
    ca = "cross_attention"
    if cfg.use_nvit:
        keys += [f"{ca}.attn_alpha", f"{ca}.sqk"]
    else:
        keys += [f"{ca}.local_norm.weight", f"{ca}.global_norm.weight"]
    for name in ("q_local", "k_global", "v_global", "proj", "out_proj"):
        keys.append(f"{ca}.{name}.weight")
        if cfg.bias:
            keys.append(f"{ca}.{name}.bias")
    keys += ["reconstruction_head.0.weight", "reconstruction_head.0.bias"]
    for i in range(cfg.n_layer):
        p = f"transformer.h.{i}"
        keys.append(f"{p}.skip_param")
        if cfg.use_nvit:
            keys += [f"{p}.attn_alpha", f"{p}.mlp_alpha", f"{p}.sqk", f"{p}.suv"]
        # children registration order: key BEFORE query (model.py:50-55)
        for name in ("key", "query", "value", "att_c_proj", "c_fc", "mlp_c_proj"):
            keys.append(f"{p}.{name}.weight")
            if cfg.bias:
                keys.append(f"{p}.{name}.bias")
        if cfg.use_nvit:
            keys += [f"{p}.rmsnorm_att.weight", f"{p}.rmsnorm_mlp.weight"]
    keys += ["mlp_head.0.weight", "mlp_head.0.bias", "mlp_head.1.weight", "mlp_head.1.bias"]
    return keys


def _reference_param_groups(model_sd: Mapping[str, Any], cfg: ViTConfig) -> list[list[str]]:
    """Reconstruct the reference's AdamW param groups (model.py:369-385):
    [decay(dim≥2), no-decay(dim<2), (nViT) sz], filtered from the canonical
    named_parameters order (buffers dropped)."""
    names = [
        k for k in reference_state_dict_order(cfg)
        if not k.endswith((".locations", ".offsets"))
    ]
    missing = [n for n in names if n not in model_sd]
    if missing:
        raise KeyError(f"state_dict missing expected reference keys: {missing[:4]}…")
    # rank via .shape, no _np: copying every tensor just to read its rank
    # would materialize the whole model again (review r3 #5)
    dims = {k: len(model_sd[k].shape) for k in names}
    if cfg.use_nvit:
        return [
            [n for n in names if "sz" not in n and dims[n] >= 2],
            [n for n in names if "sz" not in n and dims[n] < 2],
            ["sz"],
        ]
    return [
        [n for n in names if dims[n] >= 2],
        [n for n in names if dims[n] < 2],
    ]


def _reference_param_order(model_sd: Mapping[str, Any], cfg: ViTConfig) -> list[str]:
    """Flat parameter enumeration the reference's AdamW state_dict indexes."""
    return [n for g in _reference_param_groups(model_sd, cfg) for n in g]


def moment_trees_from_torch(
    opt_sd: Mapping[str, Any], model_sd: Mapping[str, Any], cfg: ViTConfig
) -> tuple[dict, dict, int] | None:
    """torch AdamW ``optimizer.state_dict()`` → (mu, nu, count) matching our
    FusedAdamWState layout, pushed through the SAME tensor transforms as the
    weights (moments are per-element, so index maps apply unchanged).

    Returns None (caller falls back to fresh moments) when the optimizer dict
    is absent/foreign-shaped.  Params torch never stepped (the reference's
    constructed-but-unused leaves get no grads, hence no state entry) start at
    zero — exactly what fresh AdamW would hold for them.
    """
    if not isinstance(opt_sd, Mapping) or not opt_sd.get("param_groups"):
        return None
    order = _reference_param_order(model_sd, cfg)
    indices = [i for g in opt_sd["param_groups"] for i in g.get("params", ())]
    if len(indices) != len(order):
        logger.warning(
            "optimizer param count %d != model param count %d — "
            "not a reference AdamW state, starting moments fresh",
            len(indices), len(order),
        )
        return None
    state = opt_sd.get("state", {})
    mu_sd: dict[str, np.ndarray] = {}
    nu_sd: dict[str, np.ndarray] = {}
    steps = [0]
    for idx, name in zip(indices, order):
        ent = state.get(idx, state.get(str(idx)))
        if ent is None:
            shape = tuple(model_sd[name].shape)
            mu_sd[name] = np.zeros(shape, np.float32)
            nu_sd[name] = np.zeros(shape, np.float32)
            continue
        mu_sd[name] = _np(ent["exp_avg"]).astype(np.float32)
        nu_sd[name] = _np(ent["exp_avg_sq"]).astype(np.float32)
        steps.append(int(ent["step"]))
    mu = params_from_state_dict(mu_sd, cfg)
    nu = params_from_state_dict(nu_sd, cfg)
    if not cfg.use_nvit:
        # params_from_state_dict fills the reference-missing baseline RMSNorm
        # weights with ones (correct for WEIGHTS); their moments start at zero
        for tree in (mu, nu):
            for blk in tree["blocks"]:
                blk["rmsnorm_att"] = np.zeros_like(blk["rmsnorm_att"])
                blk["rmsnorm_mlp"] = np.zeros_like(blk["rmsnorm_mlp"])
    return mu, nu, max(steps)


def torch_optimizer_state_dict(
    mu: Mapping[str, Any],
    nu: Mapping[str, Any],
    count: int,
    cfg: ViTConfig,
    model_sd: Mapping[str, Any],
    opt_cfg: Any,
) -> dict[str, Any]:
    """Our FusedAdamWState moments → a torch ``AdamW.state_dict()`` the
    reference's ``configure_optimizers(...)`` result loads — the inverse of
    :func:`moment_trees_from_torch`, so moments migrate in BOTH directions.

    ``mu``/``nu`` are our moment trees (params layout); ``model_sd`` the
    already-exported reference state_dict (fixes the param enumeration).
    The constructed-but-unused reference slots (nViT rmsnorm weights) get
    zero moments — what torch AdamW would hold for never-stepped params.
    """
    import torch

    sd_mu = state_dict_from_params(mu, cfg, warn_dropped=False)
    sd_nu = state_dict_from_params(nu, cfg, warn_dropped=False)
    groups = _reference_param_groups(model_sd, cfg)
    state: dict[int, dict[str, Any]] = {}
    idx = 0
    param_groups = []
    for gi, names in enumerate(groups):
        ids = []
        for name in names:
            a = sd_mu.get(name)
            b = sd_nu.get(name)
            if a is None or name.endswith((".rmsnorm_att.weight", ".rmsnorm_mlp.weight")):
                shape = tuple(model_sd[name].shape)
                a = np.zeros(shape, np.float32)
                b = np.zeros(shape, np.float32)
            state[idx] = {
                "step": torch.tensor(float(count)),
                "exp_avg": _torch_from(np.asarray(a, np.float32)),
                "exp_avg_sq": _torch_from(np.asarray(b, np.float32)),
            }
            ids.append(idx)
            idx += 1
        param_groups.append(
            {
                "params": ids,
                "lr": float(opt_cfg.learning_rate),
                "betas": (float(opt_cfg.beta1), float(opt_cfg.beta2)),
                "eps": 1e-8,
                # group 0 is the decay group; the rest are no-decay
                # (≙ model.py:372-383)
                "weight_decay": float(opt_cfg.weight_decay) if gi == 0 else 0.0,
                "amsgrad": False,
                "maximize": False,
                "foreach": None,
                "capturable": False,
                "differentiable": False,
                "fused": False,
            }
        )
    return {"state": state, "param_groups": param_groups}


# ---------------------------------------------------------------------------
# CLI entry points (torch required here)
# ---------------------------------------------------------------------------


def import_torch_checkpoint(
    pt_path: str | Path,
    dest: str | Path,
    name: str = "checkpoint_latest",
    seed: int = 0,
) -> Path:
    """Reference ``.pt`` checkpoint → resumable nvit_tpu checkpoint.

    Accepts the full reference checkpoint dict (train.py:640-650); a bare
    ``state_dict`` without model_args is rejected — the dict carries the
    model_args needed to interpret the tensors.  AdamW moments migrate too
    (the torch flat param enumeration is reconstructed from the reference's
    param-group construction, then each moment tensor goes through the same
    index maps as its weight); if the optimizer dict is absent or foreign,
    moments start fresh with a warning.  Resumes with ``init_from: resume``.
    """
    import torch  # local: the numpy mapping above must not require torch

    import jax
    import jax.numpy as jnp

    from nvit_tpu.ckpt.checkpoint import save_checkpoint
    from nvit_tpu.train.optim import init_fused_adamw
    from nvit_tpu.train.state import TrainState

    # trusted local artifact: the reference dict contains plain python/numpy
    # objects (settings tree, numpy RNG state) that weights_only rejects
    ckpt = torch.load(str(pt_path), map_location="cpu", weights_only=False)
    if "model" not in ckpt or "model_args" not in ckpt:
        raise ValueError(
            f"{pt_path} is not a reference trainer checkpoint "
            "(expected keys 'model' and 'model_args', train.py:640-650)"
        )
    cfg = config_from_reference_checkpoint(ckpt)
    sd = {k: _np(v) for k, v in ckpt["model"].items()}
    params = jax.tree_util.tree_map(jnp.asarray, params_from_state_dict(sd, cfg.model))

    opt_state = init_fused_adamw(params)
    moments = moment_trees_from_torch(ckpt.get("optimizer") or {}, sd, cfg.model)
    if moments is not None:
        mu, nu, count = moments
        lift = lambda t: jax.tree_util.tree_map(jnp.asarray, t)  # noqa: E731
        opt_state = opt_state._replace(
            mu=lift(mu), nu=lift(nu), count=jnp.asarray(count, jnp.int32)
        )
        logger.info("migrated AdamW moments (count=%d)", count)
    else:
        logger.warning("no usable optimizer state in %s — moments start fresh", pt_path)

    state = TrainState(
        params=params,
        opt_state=opt_state,
        step=jnp.asarray(int(ckpt.get("iter_num", 0)), dtype=jnp.int32),
        rng=jax.random.PRNGKey(seed),
    )
    metrics = {
        k: float(v)
        for k, v in (ckpt.get("metrics") or {}).items()
        if isinstance(v, (int, float))
    }
    trainer_state = {}
    if "val/loss" in metrics:
        # seed the relaunch protocol so the first eval here can't overwrite
        # checkpoint_best with a worse model than the imported one
        trainer_state["best_val_loss"] = metrics["val/loss"]
    path = save_checkpoint(dest, name, state, cfg, metrics, trainer_state)
    logger.info("imported %s → %s (iter %d)", pt_path, path, int(state.step))
    return path


def export_torch_checkpoint(
    checkpoint_dir: str | Path,
    name: str,
    dest: str | Path,
) -> Path:
    """nvit_tpu checkpoint → reference-format ``.pt``.

    The output dict carries every key the reference's save_checkpoint writes
    and its load_checkpoint reads (train.py:375-393, 640-650): ``model``
    state_dict (loads into the reference ``ViT`` with ``strict=True``), a
    torch-format ``optimizer`` state_dict with the AdamW moments mapped back
    (loads into the reference ``configure_optimizers`` result), ``model_args``,
    ``iter_num``, ``metrics``, ``config``, and both RNG states.  Note the
    reference's own resume path has an ordering bug (it loads the optimizer
    before creating it, train.py:381 vs 124 — PARITY.md); the dict is
    complete regardless, and loads fine through its save_checkpoint contract.
    """
    import torch

    import jax

    from nvit_tpu.ckpt.checkpoint import restore_for_resume

    state, cfg, meta = restore_for_resume(checkpoint_dir, name)
    sd_np = state_dict_from_params(state.params, cfg.model)
    sd = {k: _torch_from(v) for k, v in sd_np.items()}
    opt_sd = torch_optimizer_state_dict(
        jax.tree_util.tree_map(np.asarray, state.opt_state.mu),
        jax.tree_util.tree_map(np.asarray, state.opt_state.nu),
        int(state.opt_state.count),
        cfg.model,
        sd,
        cfg.optimizer,
    )
    out = {
        "model": sd,
        "optimizer": opt_sd,
        "model_args": model_args_from_config(cfg.model),
        "iter_num": int(state.step),
        "metrics": meta.get("metrics", {}),
        "config": cfg.to_dict(),
        "rng_state_pytorch": torch.get_rng_state(),
        "rng_state_numpy": np.random.get_state(),
        "timestamp": time.strftime("%d_%m_%Y-%Hh%Mm"),
        "format": "nvit_tpu.torch_interop.v1",
    }
    dest = Path(dest)
    dest.parent.mkdir(parents=True, exist_ok=True)
    torch.save(out, dest)
    logger.info("exported %s/%s → %s (iter %d)", checkpoint_dir, name, dest, int(state.step))
    return dest


def main(argv: list[str] | None = None) -> None:
    import argparse

    parser = argparse.ArgumentParser(
        prog="python -m nvit_tpu.ckpt.torch_interop", description=__doc__
    )
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_imp = sub.add_parser("import", help="reference .pt → resumable nvit_tpu checkpoint")
    p_imp.add_argument("--pt", required=True, help="path to reference checkpoint_*.pt")
    p_imp.add_argument("--dest", required=True, help="output checkpoint directory")
    p_imp.add_argument("--name", default="checkpoint_latest")
    p_imp.add_argument("--seed", type=int, default=0)

    p_exp = sub.add_parser("export", help="nvit_tpu checkpoint → reference-format .pt")
    p_exp.add_argument("--checkpoint", required=True, help="nvit_tpu checkpoint directory")
    p_exp.add_argument("--name", default="checkpoint_best")
    p_exp.add_argument("--dest", required=True, help="output .pt path")

    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(message)s")
    if args.cmd == "import":
        import_torch_checkpoint(args.pt, args.dest, args.name, args.seed)
    else:
        export_torch_checkpoint(args.checkpoint, args.name, args.dest)


if __name__ == "__main__":
    main()
