"""HTTP serving frontend: real server thread + http.client round-trips."""

import http.client
import json
import threading
import time

import numpy as np
import pytest

from nvit_tpu.configs.schema import Config, ViTConfig
from nvit_tpu.infer import Predictor
from nvit_tpu.serve import InferenceService, _pad_batch, make_handler


def _tiny_cfg() -> Config:
    return Config(
        model=ViTConfig(
            image_size=16, n_layer=1, n_head=2, n_embd=32, num_classes=10,
            local_patch_size=4, global_patch_size=8, use_nvit=True,
            use_kohonen=False, flash_attn=False,
        )
    )


@pytest.fixture(scope="module")
def server():
    from http.server import ThreadingHTTPServer

    service = InferenceService(Predictor.from_config(_tiny_cfg()), max_batch=8)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address
    srv.shutdown()


@pytest.fixture()
def server_failing():
    from http.server import ThreadingHTTPServer

    service = InferenceService(_FakePredictor(fail=True), max_batch=8)
    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address
    srv.shutdown()


def _request(addr, method, path, body=None, content_type="application/json"):
    conn = http.client.HTTPConnection(*addr, timeout=30)
    headers = {"Content-Type": content_type} if body is not None else {}
    conn.request(method, path, body=body, headers=headers)
    resp = conn.getresponse()
    payload = json.loads(resp.read())
    conn.close()
    return resp.status, payload


class TestPadBatch:
    def test_pads_to_power_of_two(self):
        imgs = np.zeros((3, 3, 16, 16), np.uint8)
        padded, b = _pad_batch(imgs, 64)
        assert padded.shape[0] == 4 and b == 3

    def test_exact_power_untouched(self):
        imgs = np.zeros((4, 3, 16, 16), np.uint8)
        padded, b = _pad_batch(imgs, 64)
        assert padded is imgs and b == 4

    def test_over_max_raises(self):
        with pytest.raises(ValueError, match="max_batch"):
            _pad_batch(np.zeros((9, 3, 16, 16), np.uint8), 8)


class TestEndpoints:
    def test_healthz(self, server):
        status, payload = _request(server, "GET", "/healthz")
        assert status == 200
        assert payload["status"] == "ok"
        assert payload["model"]["num_classes"] == 10

    def test_predict_json_batch(self, server):
        imgs = np.random.RandomState(0).randint(0, 256, (3, 3, 16, 16)).tolist()
        status, payload = _request(
            server, "POST", "/predict", json.dumps({"images": imgs, "top_k": 5})
        )
        assert status == 200
        labels = np.asarray(payload["labels"])
        probs = np.asarray(payload["probs"])
        assert labels.shape == (3, 5) and probs.shape == (3, 5)
        assert (probs >= 0).all() and (probs <= 1).all()
        # top-k probs are sorted descending per image
        assert (np.diff(probs, axis=1) <= 1e-6).all()

    def test_predict_raw_bytes(self, server):
        body = np.random.RandomState(1).randint(0, 256, 3 * 16 * 16).astype(np.uint8).tobytes()
        status, payload = _request(
            server, "POST", "/predict", body, content_type="application/octet-stream"
        )
        assert status == 200
        assert len(payload["labels"]) == 1

    def test_padding_does_not_change_results(self, server):
        """A batch of 3 (padded to 4) must predict the same as one-by-one."""
        rng = np.random.RandomState(2)
        imgs = rng.randint(0, 256, (3, 3, 16, 16))
        _, batch = _request(server, "POST", "/predict", json.dumps({"images": imgs.tolist()}))
        for i in range(3):
            _, single = _request(
                server, "POST", "/predict", json.dumps({"images": imgs[i].tolist()})
            )
            assert single["labels"][0] == batch["labels"][i]
            assert single["probs"][0][0] == pytest.approx(batch["probs"][i][0], rel=1e-4)

    def test_bad_shape_400(self, server):
        status, payload = _request(
            server, "POST", "/predict", json.dumps({"images": [[[0] * 8] * 8] * 3})
        )
        assert status == 400 and "images must be" in payload["error"]

    def test_bad_json_400(self, server):
        status, payload = _request(server, "POST", "/predict", "not json{")
        assert status == 400

    def test_non_object_json_400(self, server):
        status, payload = _request(server, "POST", "/predict", "[1, 2]")
        assert status == 400 and "images" in payload["error"]

    def test_bad_top_k_400(self, server):
        img = np.zeros((3, 16, 16), np.uint8).tolist()
        for bad in (-1, 0, 99, None, "5", True):
            status, payload = _request(
                server, "POST", "/predict", json.dumps({"images": img, "top_k": bad})
            )
            assert status == 400 and "top_k" in payload["error"], bad

    def test_non_numeric_images_400(self, server):
        img = [[["x"] * 16] * 16] * 3
        status, payload = _request(server, "POST", "/predict", json.dumps({"images": img}))
        assert status == 400

    def test_nan_pixels_400(self, server):
        """json.loads accepts the NaN/Infinity literals, and NaN passes both
        range comparisons (nan<0 and nan>255 are False) — the hardened path
        must reject non-finite pixels, not cast them to garbage uint8."""
        img = np.zeros((3, 16, 16), np.float64)
        body = json.dumps({"images": img.tolist()}).replace("0.0", "NaN", 1)
        status, payload = _request(server, "POST", "/predict", body)
        assert status == 400 and "finite" in payload["error"]
        body = json.dumps({"images": img.tolist()}).replace("0.0", "Infinity", 1)
        status, payload = _request(server, "POST", "/predict", body)
        assert status == 400

    def test_float_pixels_rounded_not_truncated(self, server):
        base = np.full((3, 16, 16), 100, np.uint8)
        _, p_int = _request(server, "POST", "/predict", json.dumps({"images": base.tolist()}))
        _, p_flt = _request(
            server, "POST", "/predict", json.dumps({"images": (base + 0.4).tolist()})
        )
        assert p_int["probs"][0][0] == pytest.approx(p_flt["probs"][0][0], rel=1e-6)

    def test_oversize_body_413(self, server):
        conn = http.client.HTTPConnection(*server, timeout=30)
        conn.request(
            "POST", "/predict", body=b"", headers={"Content-Length": str(1 << 31)}
        )
        resp = conn.getresponse()
        assert resp.status == 413
        conn.close()

    def test_negative_content_length_400(self, server):
        """A negative Content-Length must be rejected up front — rfile.read(-1)
        would block until the peer closes, pinning the handler thread (and the
        graceful drain) for as long as the client cares to hold the socket."""
        conn = http.client.HTTPConnection(*server, timeout=30)
        conn.request("POST", "/predict", body=b"", headers={"Content-Length": "-1"})
        resp = conn.getresponse()
        assert resp.status == 400
        conn.close()

    def test_device_failure_returns_500_not_reset(self, server_failing):
        """A device/runtime failure inside the forward must surface as an HTTP
        500 with a JSON error — not an aborted connection (every rider of a
        coalesced batch reads this response)."""
        img = np.zeros((1, 3, 16, 16), dtype=np.uint8)
        status, payload = _request(
            server_failing, "POST", "/predict", json.dumps({"images": img.tolist()})
        )
        assert status == 500 and "error" in payload

    def test_unknown_path_404(self, server):
        status, _ = _request(server, "GET", "/nope")
        assert status == 404


class _FakePredictor:
    """Deterministic predictor double: probs one-hot on (first pixel % 4),
    records every device-call batch size, optional gate/failure injection."""

    def __init__(self, gate=None, fail=False):
        import types

        self.cfg = types.SimpleNamespace(
            image_size=16, num_classes=4, n_layer=1, n_embd=32,
            use_nvit=True, use_kohonen=False,
        )
        self.calls: list[int] = []
        self.gate = gate  # (started_event, release_event) applied to call #1
        self.fail = fail

    def predict_probs(self, images):
        self.calls.append(images.shape[0])
        if self.gate is not None and len(self.calls) == 1:
            started, release = self.gate
            started.set()
            assert release.wait(timeout=10)
        if self.fail:
            raise RuntimeError("device exploded")
        probs = np.zeros((images.shape[0], 4), np.float32)
        probs[np.arange(images.shape[0]), images[:, 0, 0, 0].astype(int) % 4] = 1.0
        return probs


class TestDynamicBatching:
    def _img(self, tag: int) -> np.ndarray:
        img = np.zeros((1, 3, 16, 16), np.uint8)
        img[0, 0, 0, 0] = tag
        return img

    def test_coalesces_concurrent_requests(self):
        """Requests queued while a forward is in flight ride ONE next program."""
        import concurrent.futures

        started, release = threading.Event(), threading.Event()
        fake = _FakePredictor(gate=(started, release))
        svc = InferenceService(fake, max_batch=2, batch_window_ms=200.0)
        try:
            with concurrent.futures.ThreadPoolExecutor(3) as ex:
                fut_a = ex.submit(svc.predict, self._img(1))
                assert started.wait(timeout=10)  # call #1 on the device, gated
                fut_b = ex.submit(svc.predict, self._img(2))
                fut_c = ex.submit(svc.predict, self._img(3))
                while len(svc._batcher._queue) < 2:  # b+c enqueued behind the gate
                    time.sleep(0.001)
                release.set()
                a, b, c = fut_a.result(30), fut_b.result(30), fut_c.result(30)
            # routing: each request got its own one-hot class back
            assert (a["labels"], b["labels"], c["labels"]) == ([[1]], [[2]], [[3]])
            # coalescing: first request alone, then b+c in ONE program
            # (batch 2 == max_batch fills the window instantly)
            assert fake.calls == [1, 2]
        finally:
            release.set()
            svc.close()

    def test_batched_results_match_direct(self):
        """Concurrent batched-path responses equal the direct path exactly."""
        import concurrent.futures

        predictor = Predictor.from_config(_tiny_cfg())
        direct = InferenceService(predictor, max_batch=8)
        batched = InferenceService(predictor, max_batch=8, batch_window_ms=25.0)
        rng = np.random.RandomState(3)
        batches = [rng.randint(0, 256, (n, 3, 16, 16)).astype(np.uint8) for n in (1, 2, 1, 3)]
        try:
            with concurrent.futures.ThreadPoolExecutor(4) as ex:
                got = list(ex.map(lambda im: batched.predict(im, top_k=3), batches))
            for imgs, out in zip(batches, got):
                want = direct.predict(imgs, top_k=3)
                assert out["labels"] == want["labels"]
                # coalescing runs a DIFFERENT batch shape through the bf16
                # forward (e.g. 1+2+1+3 → one padded-8 program vs a padded-1
                # program) — XLA fuses/reduces per shape, so probs agree only
                # to bf16 noise, not bitwise
                np.testing.assert_allclose(out["probs"], want["probs"], rtol=2e-3, atol=1e-4)
        finally:
            batched.close()

    def test_device_failure_fails_every_rider(self):
        import concurrent.futures

        svc = InferenceService(_FakePredictor(fail=True), max_batch=8, batch_window_ms=20.0)
        try:
            with concurrent.futures.ThreadPoolExecutor(2) as ex:
                futs = [ex.submit(svc.predict, self._img(i)) for i in range(2)]
                for f in futs:
                    with pytest.raises(RuntimeError, match="device exploded"):
                        f.result(30)
        finally:
            svc.close()

    def test_close_rejects_new_flushes_pending(self):
        fake = _FakePredictor()
        svc = InferenceService(fake, max_batch=8, batch_window_ms=5.0)
        assert svc.predict(self._img(2))["labels"] == [[2]]
        svc.close()
        with pytest.raises(RuntimeError, match="closed"):
            svc.predict(self._img(1))

    def test_window_off_by_default(self):
        svc = InferenceService(_FakePredictor(), max_batch=8)
        assert svc._batcher is None
        assert svc.predict(self._img(3))["labels"] == [[3]]


class TestStats:
    def test_stats_endpoint_over_http(self, server):
        """/stats reports request/image/error counts and latency percentiles
        after real traffic (the fixture's warmup-free service)."""
        img = np.zeros((2, 3, 16, 16), np.uint8).tolist()
        status, _ = _request(server, "POST", "/predict", json.dumps({"images": img}))
        assert status == 200
        status, _ = _request(server, "POST", "/predict", b"not json")
        assert status == 400
        status, stats = _request(server, "GET", "/stats")
        assert status == 200
        assert stats["requests"] >= 1 and stats["images"] >= 2
        assert stats["errors"] >= 1
        assert stats["device_programs"] >= 1
        assert stats["latency_ms"]["p50"] > 0
        assert stats["latency_ms"]["p99"] >= stats["latency_ms"]["p50"]

    def test_coalescing_factor_reflects_batching(self):
        """With dynamic batching, images/program > 1 once riders coalesce;
        padding overhead accounts for the power-of-two pad on the device."""
        import concurrent.futures

        started, release = threading.Event(), threading.Event()
        fake = _FakePredictor(gate=(started, release))
        svc = InferenceService(fake, max_batch=4, batch_window_ms=200.0)
        try:
            with concurrent.futures.ThreadPoolExecutor(3) as ex:
                fut_a = ex.submit(svc.predict, np.zeros((1, 3, 16, 16), np.uint8))
                assert started.wait(timeout=10)
                futs = [
                    ex.submit(svc.predict, np.zeros((3, 3, 16, 16), np.uint8)),
                    ex.submit(svc.predict, np.zeros((1, 3, 16, 16), np.uint8)),
                ]
                while len(svc._batcher._queue) < 2:
                    time.sleep(0.001)
                release.set()
                fut_a.result(30)
                for f in futs:
                    f.result(30)
            s = svc.stats.snapshot()
            # program 1: 1 row; program 2: 3+1=4 rows coalesced → 5/2
            assert s["device_programs"] == 2
            assert s["coalesced_images_per_program"] == 2.5
            # 5 real rows → programs padded to 1 and 4: zero pad overhead here
            assert s["padding_overhead"] == 0.0
            assert s["requests"] == 3 and s["images"] == 5
        finally:
            release.set()
            svc.close()

    def test_device_failure_counts_as_error(self):
        svc = InferenceService(_FakePredictor(fail=True), max_batch=8)
        with pytest.raises(RuntimeError):
            svc.predict(np.zeros((1, 3, 16, 16), np.uint8))
        assert svc.stats.snapshot()["errors"] == 1


class TestGracefulDrain:
    def test_sigterm_drains_in_flight_request(self, tmp_path):
        """Kill `python -m nvit_tpu.serve` while a request sits in the batch
        window: the accepted request still gets its 200 and the process
        exits 0 after the drain (rolling restarts never drop requests)."""
        import os
        import signal
        import socket
        import subprocess
        import sys
        from pathlib import Path

        from nvit_tpu.ckpt.checkpoint import save_checkpoint
        from nvit_tpu.configs.schema import Config as _Config
        from nvit_tpu.train.state import create_train_state

        cfg = _tiny_cfg()
        save_checkpoint(tmp_path, "checkpoint_best", create_train_state(cfg), cfg)

        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        env = dict(os.environ)
        env.update(PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
                   PYTHONPATH=str(Path(__file__).resolve().parents[1]))
        proc = subprocess.Popen(
            [sys.executable, "-m", "nvit_tpu.serve", "--checkpoint", str(tmp_path),
             "--port", str(port), "--batch-window-ms", "1500"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        try:
            for line in proc.stdout:  # wait for bind
                if line.startswith("serving"):
                    break
            else:
                pytest.fail("server exited before serving")

            result = {}

            def slow_request():
                img = np.zeros((1, 3, 16, 16), np.uint8).tolist()
                conn = http.client.HTTPConnection("127.0.0.1", port, timeout=60)
                conn.request("POST", "/predict", json.dumps({"images": img}),
                             {"Content-Type": "application/json"})
                result["status"] = conn.getresponse().status
                conn.close()

            t = threading.Thread(target=slow_request)
            t.start()
            time.sleep(0.5)  # request is inside the 1.5 s batch window
            proc.send_signal(signal.SIGTERM)
            t.join(timeout=60)
            out, _ = proc.communicate(timeout=60)
        finally:
            if proc.poll() is None:
                proc.kill()
                proc.wait()
        assert result.get("status") == 200, (result, out[-2000:])
        assert proc.returncode == 0, out[-2000:]
        assert "drained; exiting" in out


class TestConcurrency:
    def test_parallel_clients_all_succeed(self, server):
        """ThreadingHTTPServer + the service lock: 8 concurrent predicts all
        return 200 with per-request results (no interleaving corruption)."""
        import concurrent.futures

        rng = np.random.RandomState(7)
        batches = [rng.randint(0, 256, (2, 3, 16, 16)) for _ in range(8)]

        def one(imgs):
            status, payload = _request(
                server, "POST", "/predict", json.dumps({"images": imgs.tolist()})
            )
            return status, payload

        with concurrent.futures.ThreadPoolExecutor(8) as ex:
            results = list(ex.map(one, batches))
        assert all(s == 200 for s, _ in results)
        # each response matches a serial run of the same batch
        for (status, payload), imgs in zip(results, batches):
            serial = _request(
                server, "POST", "/predict", json.dumps({"images": imgs.tolist()})
            )[1]
            assert payload["labels"] == serial["labels"]


class TestHotReload:
    def test_reload_swaps_model_and_counts(self):
        """reload() builds+warms the replacement, swaps it in, and /stats
        counts it; predictions switch to the new model's outputs."""
        old = _FakePredictor()
        svc = InferenceService(old, max_batch=8, builder=None)

        new = _FakePredictor()
        orig = new.predict_probs

        def shifted(images):
            probs = orig(images)
            return probs[:, ::-1]  # distinguishable outputs

        new.predict_probs = shifted
        img = np.zeros((1, 3, 16, 16), dtype=np.uint8)
        before = svc.predict(img)["labels"][0][0]
        svc.reload(builder=lambda: new)
        after = svc.predict(img)["labels"][0][0]
        assert before != after
        assert svc.stats.snapshot()["reloads"] == 1
        assert new.calls, "replacement was not warmed before the swap"

    def test_reload_without_builder_raises(self):
        svc = InferenceService(_FakePredictor(), max_batch=8)
        with pytest.raises(RuntimeError, match="builder"):
            svc.reload()

    def test_reload_pinned_batch_mismatch_refused(self):
        old = _FakePredictor()
        old.pinned_batch = 4
        svc = InferenceService(old, max_batch=8, builder=None)
        new = _FakePredictor()  # no pin
        with pytest.raises(ValueError, match="pins batch"):
            svc.reload(builder=lambda: new)

    def test_reload_failure_keeps_old_model(self):
        svc = InferenceService(_FakePredictor(), max_batch=8)
        img = np.zeros((1, 3, 16, 16), dtype=np.uint8)
        before = svc.predict(img)

        def boom():
            raise OSError("checkpoint gone")

        with pytest.raises(OSError):
            svc.reload(builder=boom)
        after = svc.predict(img)
        assert before["labels"] == after["labels"]
        assert svc.stats.snapshot()["reloads"] == 0

    def test_reload_geometry_change_refused(self):
        import types

        svc = InferenceService(_FakePredictor(), max_batch=8)
        new = _FakePredictor()
        new.cfg = types.SimpleNamespace(
            image_size=32, num_classes=4, n_layer=1, n_embd=32,
            use_nvit=True, use_kohonen=False,
        )
        with pytest.raises(ValueError, match="geometry"):
            svc.reload(builder=lambda: new)

    def test_reload_refreshes_healthz_model_info(self):
        import types

        svc = InferenceService(_FakePredictor(), max_batch=8)
        new = _FakePredictor()
        new.cfg = types.SimpleNamespace(
            image_size=16, num_classes=4, n_layer=7, n_embd=128,
            use_nvit=False, use_kohonen=True,
        )
        svc.reload(builder=lambda: new)
        assert svc.model_info["n_layer"] == 7 and svc.model_info["n_embd"] == 128

    def test_concurrent_reloads_serialized(self):
        """Two overlapping reload() calls must not build concurrently — the
        build that read an older checkpoint could otherwise swap in LAST."""
        svc = InferenceService(_FakePredictor(), max_batch=8)
        intervals = []

        def slow_builder():
            t0 = time.monotonic()
            time.sleep(0.3)
            intervals.append((t0, time.monotonic()))
            return _FakePredictor()

        threads = [
            threading.Thread(target=svc.reload, kwargs={"builder": slow_builder})
            for _ in range(2)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=10)
        assert len(intervals) == 2
        (a0, a1), (b0, b1) = sorted(intervals)
        assert b0 >= a1, "second reload built while the first was mid-swap"
        assert svc.stats.snapshot()["reloads"] == 2
