"""Optional orbax-checkpoint backend.

The default backend (ckpt/checkpoint.py) is a dependency-free atomic npz —
simple, bit-exact, and sufficient for single-host runs where parameters are
replicated or fully addressable.  This backend (``data.checkpoint_backend:
orbax``) delegates tensor IO to orbax's PyTree checkpointer, which:

* writes each host's addressable shards (multi-host tensor-parallel states
  save without a host gather — the npz path's ``jax.device_get`` requires
  fully-addressable arrays);
* restores with octal-renamed atomic directories (preemption-safe, like the
  npz tmp+rename).

The metadata sidecar (``<name>.json``: iter_num, metrics, full config,
format tag) is shared with the npz backend so `restore_for_resume` and the
Trainer treat both backends uniformly.  ≙ reference checkpoint dict contents
(train.py:640-650).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any

import jax

from nvit_tpu.configs.schema import Config
from nvit_tpu.train.state import TrainState

_FORMAT = "nvit_tpu.ckpt.orbax.v1"


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint_orbax(
    out_dir: str | Path,
    name: str,
    state: TrainState,
    config: Config,
    metrics: dict[str, float] | None = None,
    trainer_state: dict[str, Any] | None = None,
) -> Path:
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    ckpt_dir = (out_dir / f"{name}.orbax").resolve()
    # COLLECTIVE under multi-host: every process calls save() and writes its
    # own addressable shards; only the master writes the json sidecar (the
    # step is replicated, so its value is identical everywhere)
    _checkpointer().save(ckpt_dir, state._asdict(), force=True)
    if jax.process_index() == 0:
        meta = {
            "iter_num": int(jax.device_get(state.step)),
            "metrics": {k: float(v) for k, v in (metrics or {}).items()},
            "trainer": dict(trainer_state or {}),
            "config": config.to_dict(),
            "timestamp": time.strftime("%d_%m_%Y-%Hh%Mm"),
            "format": _FORMAT,
        }
        tmp_meta = out_dir / f"{name}.json.tmp"
        tmp_meta.write_text(json.dumps(meta, indent=2))
        tmp_meta.replace(out_dir / f"{name}.json")
    if jax.process_count() > 1:
        # barrier AFTER the sidecar write: orbax's own barriers only cover the
        # tensor commit, so without this a non-master process can return, race
        # ahead to a resume, and read a json that does not exist yet
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(f"nvit_ckpt_meta:{name}")
    return ckpt_dir


def load_checkpoint_orbax(
    out_dir: str | Path, name: str, template: TrainState
) -> tuple[TrainState, dict[str, Any]]:
    out_dir = Path(out_dir)
    meta = json.loads((out_dir / f"{name}.json").read_text())
    if meta.get("format") != _FORMAT:
        raise ValueError(f"not an orbax checkpoint: {meta.get('format')}")
    restored = _checkpointer().restore(
        (out_dir / f"{name}.orbax").resolve(), item=template._asdict()
    )
    return TrainState(**restored), meta


def orbax_checkpoint_exists(out_dir: str | Path, name: str) -> bool:
    out_dir = Path(out_dir)
    return (out_dir / f"{name}.orbax").exists() and (out_dir / f"{name}.json").exists()
