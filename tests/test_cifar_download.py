"""Guarded CIFAR auto-download (data.download=true) against a LOCAL HTTP
fixture serving a miniature CIFAR archive — end-to-end: fetch → sha256
verify → atomic rename → extract → load.  No real egress involved.

≙ reference train.py:283-301 (torchvision ``download=master_process``);
VERDICT r4 next #3.
"""

from __future__ import annotations

import hashlib
import http.server
import io
import pickle
import tarfile
import threading

import numpy as np
import pytest

from nvit_tpu.data.datasets import (
    cifar_ready,
    download_cifar,
    load_cifar,
    wait_for_cifar,
)


def _mini_cifar10_targz() -> bytes:
    """A tiny but format-correct cifar-10-python.tar.gz (4 images/batch)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:gz") as tf:
        def add(name, obj):
            data = pickle.dumps(obj)
            info = tarfile.TarInfo(f"cifar-10-batches-py/{name}")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))

        rng = np.random.RandomState(0)
        for i in range(1, 6):
            add(f"data_batch_{i}", {
                b"data": rng.randint(0, 256, (4, 3072), dtype=np.uint8).reshape(4, -1),
                b"labels": [int(x) for x in rng.randint(0, 10, 4)],
            })
        add("test_batch", {
            b"data": rng.randint(0, 256, (4, 3072), dtype=np.uint8).reshape(4, -1),
            b"labels": [int(x) for x in rng.randint(0, 10, 4)],
        })
    return buf.getvalue()


@pytest.fixture(scope="module")
def archive_server():
    payload = _mini_cifar10_targz()
    sha = hashlib.sha256(payload).hexdigest()

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):  # silence
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/cifar-10-python.tar.gz", sha
    srv.shutdown()


def test_download_extract_load_end_to_end(archive_server, tmp_path):
    url, sha = archive_server
    ds = load_cifar(tmp_path, variant="cifar10", train=True, download=True, url=url, sha256=sha)
    assert ds.images.shape == (20, 3, 32, 32) and ds.images.dtype == np.uint8
    assert ds.num_classes == 10
    assert (tmp_path / "cifar-10-python.tar.gz").exists()
    assert not (tmp_path / "cifar-10-python.tar.gz.part").exists()
    assert cifar_ready(tmp_path, "cifar10")
    # test split too, now served from disk (no second fetch needed)
    assert len(load_cifar(tmp_path, variant="cifar10", train=False, download=True, url=url, sha256=sha)) == 4


def test_download_is_idempotent(archive_server, tmp_path):
    url, sha = archive_server
    p1 = download_cifar(tmp_path, "cifar10", url=url, sha256=sha)
    mtime = (tmp_path / "cifar-10-python.tar.gz").stat().st_mtime_ns
    p2 = download_cifar(tmp_path, "cifar10", url="http://127.0.0.1:1/unreachable", sha256=sha)
    assert p1 == p2
    assert (tmp_path / "cifar-10-python.tar.gz").stat().st_mtime_ns == mtime


def test_checksum_mismatch_refuses_and_cleans_up(archive_server, tmp_path):
    url, _ = archive_server
    with pytest.raises(RuntimeError, match="checksum"):
        download_cifar(tmp_path, "cifar10", url=url, sha256="0" * 64)
    assert not (tmp_path / "cifar-10-python.tar.gz").exists()
    assert not (tmp_path / "cifar-10-python.tar.gz.part").exists()
    assert not cifar_ready(tmp_path, "cifar10")


def test_download_off_still_raises_helpfully(tmp_path):
    with pytest.raises(FileNotFoundError, match="data.download=true"):
        load_cifar(tmp_path, variant="cifar10", train=True)


def test_wait_for_cifar_times_out_then_succeeds(archive_server, tmp_path):
    with pytest.raises(TimeoutError):
        wait_for_cifar(tmp_path, "cifar10", timeout=0.05)
    url, sha = archive_server
    download_cifar(tmp_path, "cifar10", url=url, sha256=sha)
    wait_for_cifar(tmp_path, "cifar10", timeout=1.0)  # returns immediately


def test_incomplete_extract_is_repaired(archive_server, tmp_path):
    """A crash mid-extract used to leave member_dir present → _maybe_extract
    no-oped forever and every relaunch died on FileNotFoundError (review
    finding, round 5).  Completeness now gates the no-op and the incomplete
    dir is replaced atomically from the verified archive."""
    url, sha = archive_server
    download_cifar(tmp_path, "cifar10", url=url, sha256=sha)
    # simulate the interrupted extract: one batch file missing
    (tmp_path / "cifar-10-batches-py" / "data_batch_5").unlink()
    assert not cifar_ready(tmp_path, "cifar10")
    # a stale temp dir from the crashed process must be swept too
    stale = tmp_path / "cifar-10-batches-py.extract-99999"
    stale.mkdir()
    download_cifar(tmp_path, "cifar10", url="http://127.0.0.1:1/unreachable", sha256=sha)
    assert cifar_ready(tmp_path, "cifar10")
    assert not stale.exists()
    assert len(load_cifar(tmp_path, variant="cifar10", train=True)) == 20


def test_preexisting_corrupt_archive_refused(tmp_path):
    """A truncated earlier fetch or corrupt pre-staged tarball must not be
    silently extracted: existing archives are checksum-verified too
    (≙ torchvision check_integrity on the cached file)."""
    (tmp_path / "cifar-10-python.tar.gz").write_bytes(b"corrupt garbage")
    with pytest.raises(RuntimeError, match="existing archive"):
        download_cifar(tmp_path, "cifar10", url="http://127.0.0.1:1/unused", sha256="a" * 64)
    # the user's file is left in place for inspection, with a clear remedy
    assert (tmp_path / "cifar-10-python.tar.gz").exists()


def test_wait_timeout_env_override(tmp_path, monkeypatch):
    monkeypatch.setenv("NVIT_CIFAR_WAIT_S", "0.05")
    with pytest.raises(TimeoutError, match="0.05"):
        wait_for_cifar(tmp_path, "cifar10")


def test_env_override_pin(archive_server, tmp_path, monkeypatch):
    url, sha = archive_server
    monkeypatch.setenv("NVIT_CIFAR10_SHA256", sha)
    ds = load_cifar(tmp_path, variant="cifar10", train=True, download=True, url=url)
    assert len(ds) == 20
