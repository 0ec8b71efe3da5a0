"""Chip-lock protocol (nvit_tpu/utils/device_lock.py): every on-chip entry
point serializes through one flock so two TPU-touching processes can never
deadlock on the single-chip claim (CLAUDE.md hazard; no reference
counterpart — torchrun gives each rank its own GPU)."""

import subprocess
import sys
import time

import pytest

from nvit_tpu.utils import acquire_tpu_lock

CHILD = """
import sys
from nvit_tpu.utils import acquire_tpu_lock
try:
    lock = acquire_tpu_lock(timeout_s=float(sys.argv[2]), poll_s=0.05, path=sys.argv[1])
except TimeoutError as e:
    print("TIMEOUT", e)
    sys.exit(3)
print("ACQUIRED")
"""


def _child(path, timeout_s):
    return subprocess.run(
        [sys.executable, "-c", CHILD, str(path), str(timeout_s)],
        capture_output=True, text=True, timeout=60,
    )


class TestDeviceLock:
    def test_acquire_release_reacquire(self, tmp_path):
        p = tmp_path / "chip.lock"
        lock = acquire_tpu_lock(timeout_s=1, path=str(p))
        assert "pid=" in p.read_text()  # holder recorded for debuggability
        lock.close()
        lock2 = acquire_tpu_lock(timeout_s=1, path=str(p))
        lock2.close()

    def test_contender_times_out_while_held(self, tmp_path):
        p = tmp_path / "chip.lock"
        lock = acquire_tpu_lock(timeout_s=1, path=str(p))
        try:
            r = _child(p, 0.3)
            assert r.returncode == 3 and "TIMEOUT" in r.stdout
            # the failed contender names the holder so the operator can act
            # (the TimeoutError message carries the lock file's holder record)
            assert "pid=" in r.stdout, r.stdout
        finally:
            lock.close()

    def test_contender_proceeds_after_release(self, tmp_path):
        p = tmp_path / "chip.lock"
        lock = acquire_tpu_lock(timeout_s=1, path=str(p))
        proc = subprocess.Popen(
            [sys.executable, "-c", CHILD, str(p), "30"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        time.sleep(0.5)
        assert proc.poll() is None  # still waiting on the lock
        lock.close()
        out, _ = proc.communicate(timeout=30)
        assert proc.returncode == 0 and "ACQUIRED" in out

    def test_lock_survives_holder_crash(self, tmp_path):
        """flock is kernel-held: a killed holder releases, never wedges."""
        p = tmp_path / "chip.lock"
        hold = subprocess.Popen(
            [sys.executable, "-c", CHILD + "\nimport time; time.sleep(60)", str(p), "5"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        deadline = time.monotonic() + 10
        while time.monotonic() < deadline:  # wait for the child to hold it
            try:
                acquire_tpu_lock(timeout_s=0.01, poll_s=0.01, path=str(p)).close()
            except TimeoutError:
                break
            time.sleep(0.05)
        else:
            hold.kill()
            pytest.fail("child never acquired the lock")
        hold.kill()
        hold.wait(timeout=10)
        lock = acquire_tpu_lock(timeout_s=5, poll_s=0.05, path=str(p))
        lock.close()
