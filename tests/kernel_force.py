"""Shared test helpers that force the Pallas-kernel dispatch on CPU.

Two pieces, used together by the SPMD/kernel tests (tests/spmd_checks.py,
tests/test_infer_presets.py, tests/mp_worker.py; __graft_entry__ keeps a
self-contained copy because the driver entry must not depend on tests/):

* ``force_on_tpu()`` — monkeypatch ``_on_tpu`` to True in BOTH op modules
  (ops/gated_mlp.py holds its own imported reference to ops/attention's
  function, so patching one module is not enough).
* ``generic_interpret_mode()`` — run every pallas_call through the GENERIC
  Pallas interpreter (``interpret=True`` — plain jax ops, no simulated-device
  threads).  The mosaic multi-device interpreter
  (``pltpu.force_tpu_interpret_mode``) deadlocks when a shard_map-replicated
  operand larger than ~1 KB feeds a kernel: every simulated-device
  io_callback thread blocks fetching the operand value in
  ``interpret_pallas_call._allocate_buffer`` (np.array of a pending
  replicated buffer) while the main thread waits on the result — reproduced
  at [128, 512] f32 and absent at [4, 32] on jax 0.8 with 2-8 CPU devices.
  Numerics are identical either way, and the real Mosaic lowering is covered
  on-chip by scripts/tpu_shardmap_smoke.py + scripts/tpu_flash_parity.py.
"""

from __future__ import annotations

import sys
from contextlib import contextmanager

from jax.experimental import pallas as pl


@contextmanager
def force_on_tpu():
    """_on_tpu → True in both op modules; restores the originals on exit."""
    import nvit_tpu.ops.attention  # noqa: F401 — package re-exports shadow
    import nvit_tpu.ops.gated_mlp  # noqa: F401   the module names

    att_mod = sys.modules["nvit_tpu.ops.attention"]
    mlp_mod = sys.modules["nvit_tpu.ops.gated_mlp"]
    saved = (att_mod._on_tpu, mlp_mod._on_tpu)
    att_mod._on_tpu = lambda: True
    mlp_mod._on_tpu = lambda: True
    try:
        yield
    finally:
        att_mod._on_tpu, mlp_mod._on_tpu = saved


@contextmanager
def generic_interpret_mode():
    """Every pallas_call runs the generic interpreter (see module docstring)."""
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs.setdefault("interpret", True)
        return orig(*args, **kwargs)

    pl.pallas_call = patched
    try:
        yield
    finally:
        pl.pallas_call = orig
