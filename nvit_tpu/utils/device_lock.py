"""Cross-process exclusive lock for the single attached TPU chip.

Two TPU-touching python processes deadlock on the tunneled single-chip
claim: neither errors, both hang until killed (see CLAUDE.md).  Every
on-chip entry point in this repo (bench.py, scripts/tpu_*.py) therefore
takes this flock BEFORE its first backend use, so queued evidence runs,
ad-hoc benchmarks, and an external driver invoking bench.py serialize
through the chip instead of deadlocking each other.

The lock is advisory (flock on a well-known path): it protects cooperating
processes in this repo, which is exactly the population that can collide.
It is a no-op hazard-wise on multi-chip or CPU runs — holding a file lock
around device use is harmless there.

No reference counterpart: the reference assumes exclusive GPU ownership per
rank via torchrun (/root/reference/launcher.sh); single-chip tunnel
arbitration is a TPU-deployment concern.
"""

from __future__ import annotations

import fcntl
import os
import sys
import time
from typing import IO

DEFAULT_LOCK_PATH = "/tmp/nvit_tpu.lock"


def acquire_tpu_lock(
    timeout_s: float = 7200.0,
    poll_s: float = 5.0,
    path: str | None = None,
) -> IO[str]:
    """Block until the chip lock is ours; return the handle that holds it.

    Keep the returned handle alive for the duration of device use — the
    lock releases when it is closed or the process exits (including on
    SIGKILL: flock is kernel-held, so a dead holder never wedges the lock).
    Raises ``TimeoutError`` after ``timeout_s`` so a caller running under a
    watchdog fails fast and gets retried rather than silently queueing
    forever.  The holder's pid/argv are written into the lock file for
    debuggability (``cat /tmp/nvit_tpu.lock``).
    """
    path = path or os.environ.get("NVIT_TPU_LOCK", DEFAULT_LOCK_PATH)
    f = open(path, "a+")
    deadline = time.monotonic() + timeout_s
    informed = False
    while True:
        try:
            fcntl.flock(f.fileno(), fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            if time.monotonic() >= deadline:
                f.close()
                raise TimeoutError(
                    f"TPU lock {path} held by another process for >{timeout_s:.0f}s "
                    f"(holder: {_read_holder(path)!r})"
                )
            if not informed:
                print(
                    f"[tpu-lock] waiting for {path} "
                    f"(holder: {_read_holder(path)!r})",
                    file=sys.stderr,
                    flush=True,
                )
                informed = True
            time.sleep(poll_s)
            continue
        # ours: record the holder (after acquisition — never scribble on a
        # live holder's record)
        f.seek(0)
        f.truncate()
        f.write(f"pid={os.getpid()} argv={' '.join(sys.argv[:4])}\n")
        f.flush()
        return f


def _read_holder(path: str) -> str:
    try:
        with open(path) as g:
            return g.read().strip()
    except OSError:
        return "<unknown>"
