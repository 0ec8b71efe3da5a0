"""Checkpoint save/restore: full train state + config + metrics + RNG.

≙ reference train.py:360-393, 629-709: the checkpoint carries model +
optimizer state, model_args, iter_num, metrics, the full settings tree, RNG
state and a timestamp; ``checkpoint_latest`` is written every save and
``checkpoint_best`` on val-loss improvement.

Rebuild notes:
* The whole TrainState (params, optimizer state, step, PRNGKey) is one pytree
  → serialization is a flatten + npz write; restore is loading into the
  template structure produced by ``create_train_state`` from the SAVED config
  — which fixes the reference's resume-ordering bug (train.py:381 loads
  optimizer state before the optimizer exists; SURVEY.md §2 #20).
* Data-order RNG needs no separate state: epoch shuffles are pure functions
  of (seed, epoch) and augmentation keys of (PRNGKey in state, step).
* Files are written atomically (tmp + rename) so preemption mid-save never
  corrupts ``checkpoint_latest`` — the TPU-preemption-safe equivalent of the
  reference's signal-handler save.
"""

from __future__ import annotations

import json
import threading
import time
from pathlib import Path
from typing import Any

import jax
import numpy as np

from nvit_tpu.configs.schema import Config
from nvit_tpu.train.state import TrainState


def _flatten(state: TrainState) -> list[np.ndarray]:
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(state)]


def _write_files(
    out_dir: Path, name: str, leaves: list[np.ndarray], meta: dict[str, Any]
) -> Path:
    arrays_path = out_dir / f"{name}.npz"
    meta_path = out_dir / f"{name}.json"
    tmp_arrays = arrays_path.with_suffix(".npz.tmp")
    tmp_meta = meta_path.with_suffix(".json.tmp")

    with open(tmp_arrays, "wb") as f:  # handle, so numpy can't append ".npz"
        np.savez(f, **{f"leaf_{i}": a for i, a in enumerate(leaves)})
    tmp_meta.write_text(json.dumps(meta, indent=2))
    tmp_arrays.replace(arrays_path)
    tmp_meta.replace(meta_path)
    return arrays_path


def _snapshot(
    state: TrainState,
    config: Config,
    metrics: dict[str, float] | None,
    trainer_state: dict[str, Any] | None = None,
) -> tuple[list[np.ndarray], dict[str, Any]]:
    """Synchronous host snapshot.  device_get must stay on the calling thread:
    the train step donates its input buffers, so the copy must complete before
    the next step dispatches — only the FILE IO is safe to defer."""
    state = jax.device_get(state)
    leaves = _flatten(state)
    meta = {
        "iter_num": int(state.step),
        # scalars only: array-valued metrics (gradhist/* bin counts) live in
        # metrics.jsonl, not checkpoint meta
        "metrics": {k: float(v) for k, v in (metrics or {}).items()
                    if np.ndim(v) == 0},
        # host-side Trainer protocol state (best_val_loss, patience counter) so
        # relaunches continue the early-stop/best-checkpoint protocol instead of
        # resetting it (≙ reference best_val_loss in the ckpt dict, train.py:650)
        "trainer": dict(trainer_state or {}),
        "config": config.to_dict(),
        "timestamp": time.strftime("%d_%m_%Y-%Hh%Mm"),
        "num_leaves": len(leaves),
        "format": "nvit_tpu.ckpt.v1",
    }
    return leaves, meta


def save_checkpoint(
    out_dir: str | Path,
    name: str,
    state: TrainState,
    config: Config,
    metrics: dict[str, float] | None = None,
    trainer_state: dict[str, Any] | None = None,
) -> Path:
    """Write ``<out_dir>/<name>.npz`` + ``<name>.json`` atomically."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    leaves, meta = _snapshot(state, config, metrics, trainer_state)
    return _write_files(out_dir, name, leaves, meta)


def save_checkpoint_async(
    out_dir: str | Path,
    name: str,
    state: TrainState,
    config: Config,
    metrics: dict[str, float] | None = None,
    trainer_state: dict[str, Any] | None = None,
) -> threading.Thread:
    """Snapshot synchronously, write the files on a background thread.

    Moves the ~GB npz serialization off the training hot path (VERDICT
    round-1 #10).  The caller must join the returned thread before writing
    the same checkpoint name again (the Trainer serializes saves)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    leaves, meta = _snapshot(state, config, metrics, trainer_state)

    # capture write failures (disk full, permissions) on the thread object —
    # a bare daemon thread would swallow them and the trainer would log the
    # save as successful while the on-disk checkpoint silently goes stale;
    # Trainer._join_pending_saves re-raises from the box
    errbox: list[BaseException] = []

    def run() -> None:
        try:
            _write_files(out_dir, name, leaves, meta)
        except BaseException as e:  # noqa: BLE001 - surfaced at join
            errbox.append(e)

    t = threading.Thread(target=run, daemon=True)
    t.error_box = errbox  # type: ignore[attr-defined]
    t.start()
    return t


def load_checkpoint_meta(out_dir: str | Path, name: str) -> dict[str, Any]:
    return json.loads((Path(out_dir) / f"{name}.json").read_text())


def load_checkpoint(out_dir: str | Path, name: str, template: TrainState) -> tuple[TrainState, dict[str, Any]]:
    """Restore a TrainState into ``template``'s structure (bit-exact)."""
    meta = load_checkpoint_meta(out_dir, name)
    with np.load(Path(out_dir) / f"{name}.npz") as data:
        leaves = [data[f"leaf_{i}"] for i in range(meta["num_leaves"])]
    treedef = jax.tree_util.tree_structure(template)
    t_leaves = jax.tree_util.tree_leaves(template)
    if len(t_leaves) != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves but template has {len(t_leaves)} — "
            f"config mismatch? (checkpoint config: {meta['config']['model']})"
        )
    for i, (a, t) in enumerate(zip(leaves, t_leaves)):
        if tuple(a.shape) != tuple(t.shape):
            raise ValueError(
                f"checkpoint leaves mismatch template at index {i}: {a.shape} vs {t.shape} — "
                f"config mismatch? (checkpoint config: {meta['config']['model']})"
            )
    # npz round-trips ml_dtypes (bf16 moments) as raw void records — view
    # them back through the template dtype before the cast
    leaves = [
        a.view(t.dtype) if a.dtype.kind == "V" and a.dtype.itemsize == t.dtype.itemsize else a
        for a, t in zip(leaves, t_leaves)
    ]
    typed = [np.asarray(a, dtype=t.dtype) for a, t in zip(leaves, t_leaves)]
    state = jax.tree_util.tree_unflatten(treedef, typed)
    return state, meta


def restore_for_resume(out_dir: str | Path, name: str) -> tuple[TrainState, Config, dict[str, Any]]:
    """Full resume path: rebuild the Config (and therefore the model/optimizer
    structure) from the checkpoint's own stored settings, then load into it.
    ≙ reference load_checkpoint's ``ViT(ViTConfig(**checkpoint['model_args']))``
    (train.py:378-379) — but with the optimizer created first, fixing the
    ordering bug."""
    from nvit_tpu.configs.schema import Config as _C, merge_dataclass
    from nvit_tpu.train.state import create_train_state

    meta = load_checkpoint_meta(out_dir, name)
    cfg = merge_dataclass(_C(), meta["config"])
    if meta.get("format", "").startswith("nvit_tpu.ckpt.orbax"):
        from nvit_tpu.ckpt.orbax_backend import load_checkpoint_orbax

        # orbax restore consumes the template's concrete arrays/shardings
        state, meta = load_checkpoint_orbax(out_dir, name, create_train_state(cfg))
    else:
        # npz only needs shapes/dtypes/treedef: an abstract template skips the
        # throwaway on-device init + optimizer-zeros allocation (on the
        # remote-compile TPU backend a real init is a compiled program costing
        # minutes per resume) — same technique as export.load_export
        template = jax.eval_shape(lambda: create_train_state(cfg))
        state, meta = load_checkpoint(out_dir, name, template)
    return state, cfg, meta


def checkpoint_exists(out_dir: str | Path, name: str) -> bool:
    return (Path(out_dir) / f"{name}.npz").exists() and (Path(out_dir) / f"{name}.json").exists()
