"""Debug / visualization CLI — the de-facto smoke test.

≙ reference nvit/debug.py:234-310 (``debug_model``): build the model from
settings, run a large-batch forward on a fixture image, log shapes / aux
losses / parameter count, and render patch-grid and Kohonen-map
visualizations with matplotlib.

Differences: the fixture image is procedurally generated (a synthetic
"cat-like" radial+stripe pattern — this repo ships no binary assets), and the
figures are saved under ``out/debug/`` instead of shown interactively.

Run: ``python -m nvit_tpu.debug``.
"""

from __future__ import annotations

import logging
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from nvit_tpu.configs.loader import load_config
from nvit_tpu.data.augment import normalize
from nvit_tpu.models.patch import space_to_depth
from nvit_tpu.models.vit import init_vit, kohonen_spec, num_params, vit_apply

logger = logging.getLogger("nvit_tpu.debug")


def fixture_image(size: int = 32, channels: int = 3) -> np.ndarray:
    """Test image (≙ the reference's cat.png fixture, debug.py:274).

    Prefers a REAL photograph — scikit-learn's bundled sample images need no
    downloads (zero-egress-safe), and a natural image gives the patch grid,
    reconstructions and SOM activations realistic statistics like the
    reference's cat.  Falls back to a deterministic procedural image
    (radial gradient + stripes + per-channel phase) when sklearn or an RGB
    request is unavailable."""
    if channels == 3:
        try:
            from sklearn.datasets import load_sample_images

            photo = load_sample_images().images[0]  # china.jpg, [H, W, 3] uint8
            h, w = photo.shape[:2]
            crop = min(h, w)
            photo = photo[(h - crop) // 2 : (h + crop) // 2, (w - crop) // 2 : (w + crop) // 2]
            # nearest-neighbor resize to [C, size, size] (no PIL dependency)
            sel = (np.arange(size) * crop // size).astype(np.int64)
            return photo[sel][:, sel].transpose(2, 0, 1).astype(np.uint8).copy()
        except ImportError:
            pass
    ys, xs = np.mgrid[0:size, 0:size].astype(np.float32) / size
    img = np.zeros((channels, size, size), dtype=np.float32)
    for c in range(channels):
        radial = np.hypot(ys - 0.5, xs - 0.5) * 2.0
        stripes = 0.5 + 0.5 * np.sin((xs * 8 + ys * 3 + c / 3) * np.pi)
        img[c] = np.clip(255 * (0.6 * (1 - radial) + 0.4 * stripes), 0, 255)
    return img.astype(np.uint8)


def visualize_patches(img_u8: np.ndarray, patch: int, out_path: Path) -> None:
    """Patch-grid figure (≙ debug.py:50-103 visualize_patch_grid)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    tokens = np.asarray(space_to_depth(jnp.asarray(img_u8[None], jnp.float32), patch))[0]
    g = img_u8.shape[-1] // patch
    fig, axes = plt.subplots(g, g, figsize=(6, 6))
    for i in range(g):
        for j in range(g):
            p = tokens[i * g + j].reshape(img_u8.shape[0], patch, patch).transpose(1, 2, 0)
            axes[i, j].imshow(p.astype(np.uint8))
            axes[i, j].axis("off")
    fig.suptitle(f"{g}x{g} local patches ({patch}px)")
    fig.savefig(out_path, dpi=100)
    plt.close(fig)


def visualize_kohonen(params: dict, cfg, indices: dict, out_path: Path) -> None:
    """SOM activation maps + node-similarity matrices (≙ debug.py:106-231)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    spec = kohonen_spec(cfg)
    fig, axes = plt.subplots(2, 2, figsize=(10, 8))
    for col, name in enumerate(("local", "global")):
        idx = np.asarray(indices[f"{name}_indices"]).reshape(-1)
        counts = np.bincount(idx, minlength=spec.num_nodes).astype(np.float64)
        act = np.zeros(spec.m * spec.n)
        act[: len(counts)] = counts
        axes[0, col].imshow(act.reshape(spec.m, spec.n), cmap="viridis")
        axes[0, col].set_title(f"{name} BMU activation counts")

        nodes = np.asarray(params[f"{name}_kohonen"]["nodes"], dtype=np.float32)
        norm = nodes / np.maximum(np.linalg.norm(nodes, axis=1, keepdims=True), 1e-8)
        axes[1, col].imshow(norm @ norm.T, cmap="coolwarm", vmin=-1, vmax=1)
        axes[1, col].set_title(f"{name} node cosine similarity")
    fig.tight_layout()
    fig.savefig(out_path, dpi=100)
    plt.close(fig)


def debug_model(batch_size: int = 256) -> dict:
    """Forward smoke test (≙ debug.py:234-310)."""
    logging.basicConfig(level=logging.INFO, format="%(asctime)s - %(name)s - %(message)s")
    cfg = load_config()
    out_dir = Path(cfg.data.out_dir) / "debug"
    out_dir.mkdir(parents=True, exist_ok=True)

    logger.info("Building model: nvit=%s kohonen=%s d=%d L=%d",
                cfg.model.use_nvit, cfg.model.use_kohonen, cfg.model.n_embd, cfg.model.n_layer)
    params = init_vit(jax.random.PRNGKey(0), cfg.model)
    logger.info("Parameter count: %.3fM", num_params(params) / 1e6)

    img_u8 = fixture_image(cfg.model.image_size, cfg.model.channels)
    batch_u8 = jnp.asarray(np.repeat(img_u8[None], batch_size, axis=0))
    batch = normalize(batch_u8)
    logger.info("Input batch: %s (%s)", batch.shape, batch.dtype)

    out = jax.jit(
        lambda p, x: vit_apply(p, cfg.model, x, step=0, train=False, compute_dtype=jnp.bfloat16)
    )(params, batch)
    logger.info("Logits: %s", out.logits.shape)
    for k, v in out.aux_losses.items():
        logger.info("aux %s = %.6f", k, float(v))

    visualize_patches(img_u8, cfg.model.local_patch_size, out_dir / "patches.png")
    logger.info("Wrote %s", out_dir / "patches.png")
    if cfg.model.use_kohonen:
        visualize_kohonen(params, cfg.model, out.som_info, out_dir / "kohonen.png")
        logger.info("Wrote %s", out_dir / "kohonen.png")

    return {
        "logits_shape": tuple(out.logits.shape),
        "aux_losses": {k: float(v) for k, v in out.aux_losses.items()},
        "num_params": num_params(params),
    }


if __name__ == "__main__":
    debug_model()
