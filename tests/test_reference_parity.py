"""Cross-framework golden parity vs the ACTUAL torch reference.

Imports /root/reference/nvit/model.py on CPU torch (flash_attn stubbed — the
SDPA path at model.py:121-124 needs no CUDA), maps the torch ``[out, in]``
weights onto this repo's ``[in, out]`` JAX parameter trees, and asserts the
forwards agree to fp32 tolerance.  This is the one check that can falsify the
"capabilities match" claim (VERDICT round-1 #1).

Coverage:
* primitives: justnorm, RMSNorm                    (≙ model.py:43-44, 172-184)
* Block nViT mode (+ norm_skip)                    (≙ model.py:47-169, 84-87)
* CrossAttentionBlock, both modes                  (≙ model.py:187-275)
* KohonenMap.forward (BMU repr + indices)          (≙ kohonen.py:100-119)
* Kohonen LR schedule                              (≙ model.py:563-581)
* FULL ViT forward, nvit1_k0 and nvit1_k1 profiles (≙ model.py:403-470)
* total-loss composition                           (≙ train.py:906-926)
* documented reference crash: pure-baseline Block  (≙ model.py:63-65 vs 95-96)

The reference's buggy paths we deliberately fixed (baseline-Block RMSNorm,
SOM update_nodes zip truncation, non-square smoothness grids) are parity-
tested at the sub-module level or asserted-to-crash; see PARITY.md.
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
ref_kohonen = pytest.importorskip("nvit.kohonen")

import jax
import jax.numpy as jnp

from nvit_tpu.configs.schema import ViTConfig
from nvit_tpu.core.norms import justnorm, rms_norm
from nvit_tpu.core.residual import norm_skip
from nvit_tpu.models.blocks import block_apply, cross_attention_apply
from nvit_tpu.models.schedules import kohonen_lr
from nvit_tpu.models.vit import total_loss, vit_apply
from nvit_tpu.som import kohonen as som

ATOL = 2e-5
RTOL = 1e-5


def tiny_cfgs(**kw):
    """Matched (reference torch config, nvit_tpu config) pair."""
    base = dict(
        image_size=16, n_layer=2, n_head=2, n_embd=32, num_classes=10,
        local_patch_size=4, global_patch_size=8, kohonen_nodes=32,
        bias=False, flash_attn=False, dropout=0.0,
    )
    base.update(kw)
    return ref_model.ViTConfig(**base), ViTConfig(**base)


def t2j(t: torch.Tensor) -> jnp.ndarray:
    # np.array(copy) is load-bearing: jnp.asarray can zero-copy ALIAS a CPU
    # numpy buffer, so an in-place torch mutation afterwards (optimizer.step,
    # normalize_matrices) would silently change the mapped JAX tree
    return jnp.asarray(np.array(t.detach().cpu().numpy()))


# The state_dict <-> param-tree mapping is SHIPPED code now
# (nvit_tpu/ckpt/torch_interop.py powers the torch-checkpoint import/export
# CLI); this suite validates that exact implementation leaf-by-leaf against
# torch autograd.  The wrappers below just lift numpy leaves to jnp.
from nvit_tpu.ckpt.torch_interop import (  # noqa: E402
    _map_block,
    _map_cross_attention,
    global_embed_permutation,  # noqa: F401  (re-exported for other tests)
    params_from_state_dict,
)


def _lift(tree):
    return jax.tree_util.tree_map(jnp.asarray, tree)


def map_block(sd, prefix: str, use_nvit: bool) -> dict:
    return _lift(_map_block(sd, prefix, use_nvit))


def map_cross_attention(sd, prefix: str, use_nvit: bool) -> dict:
    return _lift(_map_cross_attention(sd, prefix, use_nvit))


def map_vit_params(model: "ref_model.ViT", cfg: ViTConfig, sd: dict | None = None) -> dict:
    """Full torch ViT state_dict → nvit_tpu parameter tree.

    ``sd`` overrides the tensors to map (same key layout) — used to push the
    torch GRADIENTS through the identical axis transforms for grad parity."""
    sd = model.state_dict() if sd is None else sd
    return _lift(params_from_state_dict(sd, cfg))


def rand_img(b=2, c=3, s=16, seed=0) -> np.ndarray:
    return np.random.RandomState(seed).rand(b, c, s, s).astype(np.float32) * 2 - 1


# --------------------------------------------------------------- primitives
class TestPrimitives:
    def test_justnorm(self):
        x = np.random.RandomState(1).randn(4, 7).astype(np.float32)
        ref = ref_model.justnorm(torch.from_numpy(x)).numpy()
        ours = np.asarray(justnorm(jnp.asarray(x)))
        np.testing.assert_allclose(ours, ref, atol=ATOL, rtol=RTOL)

    def test_rmsnorm(self):
        x = np.random.RandomState(2).randn(3, 5, 8).astype(np.float32)
        m = ref_model.RMSNorm(8)
        with torch.no_grad():
            m.weight.mul_(1.7)
        ref = m(torch.from_numpy(x)).detach().numpy()
        ours = np.asarray(rms_norm(jnp.asarray(x), t2j(m.weight)))
        np.testing.assert_allclose(ours, ref, atol=ATOL, rtol=RTOL)


# -------------------------------------------------------------------- blocks
class TestBlocks:
    def test_block_nvit_with_norm_skip(self):
        rcfg, jcfg = tiny_cfgs(use_nvit=True)
        torch.manual_seed(0)
        blk = ref_model.Block(rcfg).eval()
        # perturb the learned scales off their constant init
        with torch.no_grad():
            for p_ in (blk.sqk, blk.attn_alpha, blk.mlp_alpha, blk.suv, blk.skip_param):
                p_.add_(0.01 * torch.randn_like(p_))
        h = np.random.RandomState(3).randn(2, 9, 32).astype(np.float32)
        ht = torch.from_numpy(h)
        with torch.no_grad():
            out_ref = blk(ht)
            skip_ref = blk.norm_skip(out_ref, ht).numpy()
            out_ref = out_ref.numpy()

        p = map_block({f"b.{k}": v for k, v in blk.state_dict().items()}, "b", use_nvit=True)
        out = block_apply(p, jcfg, jnp.asarray(h))
        np.testing.assert_allclose(np.asarray(out), out_ref, atol=ATOL, rtol=RTOL)
        skip = norm_skip(out, jnp.asarray(h), p["skip_param"])
        np.testing.assert_allclose(np.asarray(skip), skip_ref, atol=ATOL, rtol=RTOL)

    def test_reference_baseline_block_crashes(self):
        """Documents the reference bug we fixed: baseline mode constructs no
        RMSNorms (model.py:63-65) but calls them (model.py:95-96)."""
        rcfg, _ = tiny_cfgs(use_nvit=False)
        blk = ref_model.Block(rcfg).eval()
        with pytest.raises(AttributeError, match="rmsnorm"):
            with torch.no_grad():
                blk(torch.zeros(1, 4, 32))

    @pytest.mark.parametrize("use_nvit", [False, True])
    def test_cross_attention_both_modes(self, use_nvit):
        rcfg, jcfg = tiny_cfgs(use_nvit=use_nvit)
        torch.manual_seed(1)
        ca = ref_model.CrossAttentionBlock(rcfg).eval()
        if use_nvit:
            with torch.no_grad():
                ca.sqk.add_(0.01 * torch.randn_like(ca.sqk))
                ca.attn_alpha.add_(0.01 * torch.randn_like(ca.attn_alpha))
        rs = np.random.RandomState(4)
        local = rs.randn(2, 9, 32).astype(np.float32)
        global_ = rs.randn(2, 9, 32).astype(np.float32)
        with torch.no_grad():
            ref = ca(torch.from_numpy(local), torch.from_numpy(global_)).numpy()
        p = map_cross_attention(
            {f"c.{k}": v for k, v in ca.state_dict().items()}, "c", use_nvit
        )
        ours = cross_attention_apply(p, jcfg, jnp.asarray(local), jnp.asarray(global_))
        np.testing.assert_allclose(np.asarray(ours), ref, atol=ATOL, rtol=RTOL)


# ----------------------------------------------------------------------- SOM
class TestKohonen:
    def test_bmu_forward_parity(self):
        torch.manual_seed(2)
        kmap = ref_kohonen.KohonenMap(8, 16, alpha=0.01).eval()
        x = np.random.RandomState(5).randn(3, 7, 8).astype(np.float32)
        with torch.no_grad():
            repr_ref, idx_ref = kmap(torch.from_numpy(x))
        nodes = t2j(kmap.nodes)
        repr_ours, idx_ours = som.bmu(nodes, jnp.asarray(x))
        np.testing.assert_array_equal(np.asarray(idx_ours), idx_ref.numpy())
        np.testing.assert_allclose(np.asarray(repr_ours), repr_ref.numpy(), atol=ATOL, rtol=RTOL)

    def test_kohonen_lr_schedule_parity(self):
        rcfg, jcfg = tiny_cfgs(
            use_nvit=True, use_kohonen=True,
            kohonen_alpha=0.02, kohonen_scheduler_enabled=True,
            kohonen_scheduler_warmup_steps=10, kohonen_scheduler_decay_steps=100,
            kohonen_scheduler_min_lr=0.001,
        )
        model = ref_model.ViT(rcfg)
        for step in (0, 3, 10, 55, 100, 500):
            np.testing.assert_allclose(
                float(kohonen_lr(jcfg, step)), model.get_kohonen_lr(step), rtol=1e-6
            )
        # disabled → constant alpha
        rcfg2, jcfg2 = tiny_cfgs(use_nvit=True, use_kohonen=True, kohonen_alpha=0.02)
        model2 = ref_model.ViT(rcfg2)
        np.testing.assert_allclose(
            float(kohonen_lr(jcfg2, 1234)), model2.get_kohonen_lr(1234), rtol=1e-6
        )


# ------------------------------------------------------------------ full ViT
def run_both(rcfg, jcfg, seed_model=0, seed_img=6):
    torch.manual_seed(seed_model)
    model = ref_model.ViT(rcfg).eval()
    # move learned scales off their constant init so parity isn't vacuous
    with torch.no_grad():
        for name, p_ in model.named_parameters():
            if p_.dim() < 2 and "kohonen" not in name:
                p_.add_(0.01 * torch.randn_like(p_))
    img = rand_img(seed=seed_img, s=rcfg.image_size)
    with torch.no_grad():
        logits_ref, aux_ref = model(torch.from_numpy(img))
    params = map_vit_params(model, jcfg)
    out = vit_apply(params, jcfg, jnp.asarray(img), step=0, train=False)
    return model, (logits_ref.numpy(), {k: float(v) for k, v in aux_ref.items()}), out


class TestFullViT:
    def test_nvit_no_kohonen(self):
        """nvit1_k0 profile: exact forward parity."""
        rcfg, jcfg = tiny_cfgs(use_nvit=True, use_kohonen=False)
        _, (logits_ref, aux_ref), out = run_both(rcfg, jcfg)
        np.testing.assert_allclose(np.asarray(out.logits), logits_ref, atol=ATOL, rtol=RTOL)
        np.testing.assert_allclose(
            float(out.aux_losses["reconstruction"]), aux_ref["reconstruction"], atol=ATOL, rtol=RTOL
        )

    def test_nvit_kohonen(self):
        """nvit1_k1 profile (eval mode — the reference mutates SOM nodes
        in-forward when training): logits + ALL aux losses."""
        rcfg, jcfg = tiny_cfgs(use_nvit=True, use_kohonen=True, kohonen_nodes=32)
        _, (logits_ref, aux_ref), out = run_both(rcfg, jcfg, seed_model=1)
        np.testing.assert_allclose(np.asarray(out.logits), logits_ref, atol=ATOL, rtol=RTOL)
        for key in (
            "kohonen_consistency", "kohonen_smoothness",
            "local_quantization", "global_quantization", "reconstruction",
        ):
            np.testing.assert_allclose(
                float(out.aux_losses[key]), aux_ref[key], atol=ATOL, rtol=RTOL, err_msg=key
            )

    def test_total_loss_composition(self):
        """≙ train.py:906-926 loss weighting."""
        rcfg, jcfg = tiny_cfgs(use_nvit=True, use_kohonen=True, kohonen_nodes=32)
        _, (logits_ref, aux_ref), out = run_both(rcfg, jcfg, seed_model=2)
        labels = np.array([3, 7])
        cw, sw = 0.1, 0.1
        ref_total = float(
            torch.nn.functional.cross_entropy(
                torch.from_numpy(logits_ref), torch.from_numpy(labels)
            )
        )
        ref_total += cw * aux_ref["kohonen_consistency"] + sw * aux_ref["kohonen_smoothness"]
        ref_total += rcfg.local_quantization_weight * aux_ref["local_quantization"]
        ref_total += rcfg.global_quantization_weight * aux_ref["global_quantization"]
        ref_total += rcfg.reconstruction_weight * aux_ref["reconstruction"]

        ours, terms = total_loss(jcfg, cw, sw, out.logits, jnp.asarray(labels), out.aux_losses)
        np.testing.assert_allclose(float(ours), ref_total, atol=1e-4, rtol=1e-5)
        assert float(terms["total_loss"]) == float(ours)


# ------------------------------------------------------------- gradient parity
class TestGradientParity:
    """End-to-end GRADIENT parity vs torch autograd: map the torch parameter
    gradients through the identical axis transforms as the weights and compare
    against jax.grad of the same loss (≙ reference train.py:930-933 backward).
    This covers every custom VJP in the stack (flash/gated kernels fall back
    to XLA on CPU, but the SLERP/norm_skip custom VJPs, the one-hot BMU
    gather, and the smoothness-table reformulation are all on the path)."""

    @staticmethod
    def _torch_grad_sd(model):
        sd = {}
        for k, p_ in model.named_parameters():
            sd[k] = torch.zeros_like(p_) if p_.grad is None else p_.grad
        # buffers (e.g. SOM locations) carry no grad; mapping never reads them
        return sd

    def _compare(self, gref, gours, path=""):
        if isinstance(gours, dict):
            for k in gours:
                self._compare(gref[k], gours[k], f"{path}.{k}")
        elif isinstance(gours, list):
            for i, (a, b) in enumerate(zip(gref, gours)):
                self._compare(a, b, f"{path}[{i}]")
        else:
            np.testing.assert_allclose(
                np.asarray(gours), np.asarray(gref), atol=7e-5, rtol=2e-4, err_msg=path
            )

    def test_grads_nvit_no_kohonen(self):
        """nvit1_k0: CE-only loss (the reference's training loss for k0)."""
        rcfg, jcfg = tiny_cfgs(use_nvit=True, use_kohonen=False)
        torch.manual_seed(3)
        model = ref_model.ViT(rcfg).eval()
        with torch.no_grad():
            for name, p_ in model.named_parameters():
                if p_.dim() < 2 and "kohonen" not in name:
                    p_.add_(0.01 * torch.randn_like(p_))
        img = rand_img(seed=7, s=rcfg.image_size)
        labels = np.array([1, 8])

        logits_ref, _aux = model(torch.from_numpy(img))
        loss_ref = torch.nn.functional.cross_entropy(logits_ref, torch.from_numpy(labels))
        loss_ref.backward()

        params = map_vit_params(model, jcfg)

        def loss_fn(p):
            out = vit_apply(p, jcfg, jnp.asarray(img), step=0, train=False)
            return total_loss(jcfg, 0.1, 0.1, out.logits, jnp.asarray(labels), out.aux_losses)[0]

        loss_ours, grads = jax.value_and_grad(loss_fn)(params)
        np.testing.assert_allclose(float(loss_ours), float(loss_ref), atol=1e-4, rtol=1e-5)
        gref = map_vit_params(model, jcfg, sd=self._torch_grad_sd(model))
        self._compare(gref, grads)

    def test_grads_nvit_kohonen_full_loss(self):
        """nvit1_k1: the FULL weighted loss (CE + consistency + smoothness +
        quantization + reconstruction, ≙ train.py:906-926) — exercises the
        SOM gradient channel (BMU gather into nodes, smoothness table) and
        every aux-loss backward."""
        rcfg, jcfg = tiny_cfgs(use_nvit=True, use_kohonen=True, kohonen_nodes=32)
        torch.manual_seed(4)
        model = ref_model.ViT(rcfg).eval()
        with torch.no_grad():
            for name, p_ in model.named_parameters():
                if p_.dim() < 2 and "kohonen" not in name:
                    p_.add_(0.01 * torch.randn_like(p_))
        img = rand_img(seed=8, s=rcfg.image_size)
        labels = np.array([2, 5])
        cw, sw = 0.1, 0.1

        logits_ref, aux_ref = model(torch.from_numpy(img))
        loss_ref = torch.nn.functional.cross_entropy(logits_ref, torch.from_numpy(labels))
        loss_ref = loss_ref + cw * aux_ref["kohonen_consistency"] + sw * aux_ref["kohonen_smoothness"]
        loss_ref = loss_ref + rcfg.local_quantization_weight * aux_ref["local_quantization"]
        loss_ref = loss_ref + rcfg.global_quantization_weight * aux_ref["global_quantization"]
        loss_ref = loss_ref + rcfg.reconstruction_weight * aux_ref["reconstruction"]
        loss_ref.backward()

        params = map_vit_params(model, jcfg)

        def loss_fn(p):
            out = vit_apply(p, jcfg, jnp.asarray(img), step=0, train=False)
            return total_loss(jcfg, cw, sw, out.logits, jnp.asarray(labels), out.aux_losses)[0]

        loss_ours, grads = jax.value_and_grad(loss_fn)(params)
        np.testing.assert_allclose(float(loss_ours), float(loss_ref), atol=1e-4, rtol=1e-5)
        gref = map_vit_params(model, jcfg, sd=self._torch_grad_sd(model))
        self._compare(gref, grads)


# ------------------------------------------------------- optimizer-step parity
class TestOptimizerParity:
    """One (and two) full AdamW+renorm update steps vs the reference's own
    ``configure_optimizers`` (model.py:369-385) + ``normalize_matrices``
    (train.py:461-480), fed IDENTICAL synthetic gradients on both sides
    (step-1 AdamW is a near-sign update, so per-side autograd noise would
    amplify; gradient equality itself is covered by TestGradientParity)."""

    @staticmethod
    def _ref_normalize_matrices(model):
        # ≙ train.py:461-480 verbatim semantics (blocks only, fp32, in-place)
        def jn(x, idim):
            return (x.float() / x.float().norm(p=2, dim=idim, keepdim=True)).to(x.dtype)

        with torch.no_grad():
            for block in model.transformer.h:
                for name, dim in (
                    ("query", 1), ("key", 1), ("value", 1), ("c_fc", 1),
                    ("att_c_proj", 0), ("mlp_c_proj", 0),
                ):
                    w = getattr(block, name).weight
                    w.data.copy_(jn(w.data, dim))

    def test_adamw_renorm_step_parity(self):
        from nvit_tpu.configs.schema import OptimizerConfig
        from nvit_tpu.train.optim import fused_adamw_renorm_update, init_fused_adamw

        rcfg, jcfg = tiny_cfgs(use_nvit=True, use_kohonen=False)
        torch.manual_seed(5)
        model = ref_model.ViT(rcfg)
        lr, wd, betas = 1e-3, 0.1, (0.9, 0.95)
        opt = model.configure_optimizers(wd, lr, betas, device_type="cpu")

        params = map_vit_params(model, jcfg)
        opt_cfg = OptimizerConfig(
            learning_rate=lr, weight_decay=wd, beta1=betas[0], beta2=betas[1],
            grad_clip=0.0, warmup_iters=0, lr_decay_iters=10_000, min_lr=lr,
        )
        state = init_fused_adamw(params)

        for step_seed in (11, 12):  # two steps: t=1 and the t=2 bias correction
            gen = torch.Generator().manual_seed(step_seed)
            grads_t = {
                n: 0.02 * torch.randn(p_.shape, generator=gen)
                for n, p_ in model.named_parameters()
            }
            for n, p_ in model.named_parameters():
                p_.grad = grads_t[n].clone()
            grads_j = map_vit_params(model, jcfg, sd=grads_t)

            opt.step()
            opt.zero_grad(set_to_none=True)
            self._ref_normalize_matrices(model)

            params, state = fused_adamw_renorm_update(
                opt_cfg, params, grads_j, state, renorm=True
            )

        want = map_vit_params(model, jcfg)

        def cmp(a, b, path=""):
            if isinstance(b, dict):
                for k in b:
                    cmp(a[k], b[k], f"{path}.{k}")
            elif isinstance(b, list):
                for i, (x, y) in enumerate(zip(a, b)):
                    cmp(x, y, f"{path}[{i}]")
            else:
                np.testing.assert_allclose(
                    np.asarray(b), np.asarray(a), atol=2e-5, rtol=1e-4, err_msg=path
                )

        cmp(want, params)
