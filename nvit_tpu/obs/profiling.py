"""Profiling + numerical-debug hooks.

≙ SURVEY.md §5 tracing/race-detection rows: the reference's tracing is a
per-iteration wall-clock plus CUDA memory counters; on TPU the first-class
tool is ``jax.profiler`` (XPlane traces viewable in TensorBoard/Perfetto),
and the "sanitizer" equivalents are ``jax_debug_nans`` and disable-jit mode
(the reference's NCCL_DEBUG has no analogue — SPMD has no user-visible
collective races by construction).
"""

from __future__ import annotations

import contextlib
import logging
from pathlib import Path

import jax

logger = logging.getLogger("nvit_tpu.obs")


@contextlib.contextmanager
def maybe_trace(out_dir: str | Path, enabled: bool):
    """Capture a device trace into ``<out_dir>/profile`` while active."""
    if not enabled:
        yield
        return
    path = str(Path(out_dir) / "profile")
    logger.info("capturing jax.profiler trace to %s", path)
    with jax.profiler.trace(path):
        yield
    logger.info("trace written; view with tensorboard --logdir %s", path)


def apply_debug_flags(*, debug_nans: bool = False, disable_jit: bool = False) -> None:
    """Numerical sanitizers (≙ SURVEY.md §5: jax_debug_nans / disable-jit)."""
    if debug_nans:
        jax.config.update("jax_debug_nans", True)
    if disable_jit:
        jax.config.update("jax_disable_jit", True)


def xla_cost_analysis(compiled) -> dict:
    """Normalize ``Compiled.cost_analysis()`` across JAX versions.

    Older JAX returns a one-element list of dicts, newer returns the dict
    directly; callers (bench.py, scripts/tpu_cost_analysis.py) share this
    shim so a future shape change is fixed in one place.
    """
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0] if ca else {}
    return ca or {}
