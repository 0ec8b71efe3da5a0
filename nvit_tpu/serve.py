"""Minimal production-style HTTP serving frontend for the Predictor API.

The reference has no serving surface at all (its only inference path is
``validate_only``, train.py:179-189); ``nvit_tpu.infer.Predictor`` added a
first-class batched predictor, and this module wraps it in a dependency-free
HTTP server so a checkpoint can be served with one command:

    python -m nvit_tpu.serve --checkpoint out --name checkpoint_best --port 8321

Endpoints:

* ``GET  /healthz``  → ``{"status": "ok", "model": {...}}``
* ``GET  /stats``    → serving counters: requests/images/errors, latency
  percentiles over the last 1024 requests, device-program count, realized
  coalescing factor and padding overhead (ServingStats)
* ``POST /predict``  → body is either
    - raw uint8 bytes of one [C, H, W] image (Content-Type: application/octet-stream), or
    - JSON ``{"images": [[[...]]], "top_k": 5}`` with one [C,H,W] or a
      [B,C,H,W] batch of 0-255 ints;
  response ``{"labels": [[...]], "probs": [[...]]}`` (top-k per image).

Design notes (TPU serving):

* One Predictor per process — the jitted forward holds the chip; requests are
  serialized through a lock (XLA executes one program at a time per device
  anyway, so a queue in front of the device is the correct shape; run more
  processes for more chips).
* Requests are padded up to the next power-of-two batch (≤ max_batch) so the
  server compiles a handful of programs total instead of one per batch size —
  recompilation on an unseen shape would stall the serving path for seconds.
* ``--batch-window-ms N`` enables dynamic batching: concurrent requests that
  arrive within an N-ms window are coalesced into ONE device program
  (DynamicBatcher).  At B=1 the MXU is utilization-bound — a batch of 32
  costs ~2x a batch of 1, not 32x — so under concurrent load a 2-5 ms window
  multiplies throughput for a bounded latency cost.
* SIGHUP hot-reloads the checkpoint (build + warm off-path, swap under the
  lock) — rolling weight updates with zero downtime; on failure the old
  model keeps serving.
* stdlib-only (http.server): deploys anywhere the framework runs; any real
  frontend (gunicorn/envoy/…) can sit in front, or import ``make_handler``
  — call ``service.warmup()`` before serving traffic (``main`` does), or the
  first /predict pays the full jit compile while holding the service lock.
"""

from __future__ import annotations

import argparse
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from nvit_tpu.infer import Predictor, topk_from_probs


def _pad_batch(images: np.ndarray, max_batch: int) -> tuple[np.ndarray, int]:
    """Pad [B, C, H, W] up to the next power of two (≤ max_batch) so the jit
    cache stays small; returns (padded, real_batch)."""
    b = images.shape[0]
    if b > max_batch:
        raise ValueError(f"batch {b} exceeds max_batch {max_batch}")
    padded = 1
    while padded < b:
        padded *= 2
    padded = min(padded, max_batch)
    if padded == b:
        return images, b
    pad = np.zeros((padded - b, *images.shape[1:]), dtype=images.dtype)
    return np.concatenate([images, pad], axis=0), b


class DynamicBatcher:
    """Coalesce concurrent prediction requests into one device program.

    TPU serving economics: a single program over a batch of 32 is ~10x the
    throughput of 32 single-image programs (the MXU is utilization-bound at
    tiny batches), so under concurrent load the right shape is a short
    collection window in front of the device, not per-request dispatch.
    A worker thread drains the queue: the first waiting request opens a
    window of ``window_s``; everything that arrives before it closes (up to
    ``max_batch`` total rows) rides the same forward pass.  An idle server
    adds at most ``window_s`` of latency to a lone request; a saturated one
    runs back-to-back full batches.

    ``run`` is called with the coalesced [B, C, H, W] batch and must return
    [B, num_classes] probabilities; per-request top-k happens host-side.
    """

    def __init__(self, run, max_batch: int, window_s: float):
        self._run = run
        self.max_batch = max_batch
        self.window_s = window_s
        self._cv = threading.Condition()
        self._queue: list[dict] = []
        self._closed = False
        self._thread = threading.Thread(target=self._loop, daemon=True, name="nvit-batcher")
        self._thread.start()

    def submit(self, images: np.ndarray) -> np.ndarray:
        """Block until this request's rows come back: → probs [b, classes]."""
        item = {"images": images, "event": threading.Event(), "result": None, "error": None}
        with self._cv:
            if self._closed:
                raise RuntimeError("batcher is closed")
            self._queue.append(item)
            self._cv.notify_all()
        item["event"].wait()
        if item["error"] is not None:
            raise item["error"]
        return item["result"]

    def close(self) -> None:
        with self._cv:
            self._closed = True
            self._cv.notify_all()
        self._thread.join(timeout=5)

    def _loop(self) -> None:
        while True:
            with self._cv:
                while not self._queue and not self._closed:
                    self._cv.wait()
                if not self._queue:  # closed and drained
                    return
                # collection window: wait for co-arrivals until it expires,
                # the batch fills, or close() flushes everything pending
                deadline = time.monotonic() + self.window_s
                while not self._closed:
                    total = sum(i["images"].shape[0] for i in self._queue)
                    remaining = deadline - time.monotonic()
                    if total >= self.max_batch or remaining <= 0:
                        break
                    self._cv.wait(timeout=remaining)
                batch: list[dict] = [self._queue.pop(0)]
                taken = batch[0]["images"].shape[0]
                while self._queue and taken + self._queue[0]["images"].shape[0] <= self.max_batch:
                    item = self._queue.pop(0)
                    batch.append(item)
                    taken += item["images"].shape[0]
            try:
                imgs = (
                    np.concatenate([i["images"] for i in batch], axis=0)
                    if len(batch) > 1
                    else batch[0]["images"]
                )
                probs = self._run(imgs)
                ofs = 0
                for item in batch:
                    n = item["images"].shape[0]
                    item["result"] = probs[ofs : ofs + n]
                    ofs += n
            except Exception as e:  # fail every rider, keep serving the queue
                for item in batch:
                    item["error"] = e
            finally:
                for item in batch:
                    item["event"].set()


class ServingStats:
    """Thread-safe serving counters + latency reservoir for ``GET /stats``.

    What an operator needs to run this server: request/image counts, error
    count, end-to-end latency percentiles (ring buffer of the last 1024
    requests — bounded memory, recent-window percentiles), and device-program
    counts.  With dynamic batching on, ``images / device_programs`` is the
    realized coalescing factor — the number that tells you whether the batch
    window is actually buying throughput, and ``padded_images`` vs ``images``
    shows how much device work the power-of-two padding adds on top.
    """

    WINDOW = 1024

    def __init__(self):
        self._lock = threading.Lock()
        self.requests = 0
        self.images = 0
        self.errors = 0
        self.device_programs = 0
        self.device_images = 0
        self.padded_images = 0
        self.reloads = 0
        self._lat_ms: list[float] = []

    def record_request(self, rows: int, latency_ms: float) -> None:
        with self._lock:
            self.requests += 1
            self.images += rows
            self._lat_ms.append(latency_ms)
            if len(self._lat_ms) > self.WINDOW:
                del self._lat_ms[: -self.WINDOW]

    def record_error(self) -> None:
        with self._lock:
            self.errors += 1

    def record_reload(self) -> None:
        with self._lock:
            self.reloads += 1

    def record_program(self, rows: int, padded_rows: int) -> None:
        with self._lock:
            self.device_programs += 1
            self.device_images += rows
            self.padded_images += padded_rows

    def snapshot(self) -> dict:
        with self._lock:
            lat = sorted(self._lat_ms)
            out = {
                "requests": self.requests,
                "images": self.images,
                "errors": self.errors,
                "device_programs": self.device_programs,
                "reloads": self.reloads,
                "coalesced_images_per_program": (
                    round(self.device_images / self.device_programs, 3)
                    if self.device_programs
                    else None
                ),
                "padding_overhead": (
                    round(self.padded_images / self.device_images - 1.0, 3)
                    if self.device_images
                    else None
                ),
            }
        if lat:
            out["latency_ms"] = {
                "window": len(lat),
                "p50": round(lat[len(lat) // 2], 2),
                "p99": round(lat[min(len(lat) - 1, int(len(lat) * 0.99))], 2),
                "max": round(lat[-1], 2),
            }
        return out


class InferenceService:
    """Thread-safe top-k prediction on a Predictor (shared by all handlers).

    ``batch_window_ms > 0`` enables dynamic batching (DynamicBatcher):
    concurrent requests that arrive within the window share one device
    program.  2-5 ms is a good setting under concurrent load; 0 (default)
    dispatches each request immediately.
    """

    def __init__(self, predictor: Predictor, *, max_batch: int = 64,
                 batch_window_ms: float = 0.0, builder=None):
        self.predictor = predictor
        # zero-arg factory re-creating the predictor from its source-of-truth
        # checkpoint — enables hot reload (SIGHUP in main(), or reload())
        self._builder = builder
        self._warm_all = False
        self._reload_lock = threading.Lock()  # serializes concurrent SIGHUPs
        # a concrete-batch AOT artifact accepts exactly one batch size —
        # every request is padded up to it and it caps the accepted batch
        self._pinned = getattr(predictor, "pinned_batch", None)
        self.max_batch = self._pinned if self._pinned else max_batch
        self._lock = threading.Lock()
        self.stats = ServingStats()
        self._batcher = (
            DynamicBatcher(self._padded_probs, self.max_batch, batch_window_ms / 1e3)
            if batch_window_ms > 0
            else None
        )
        c = predictor.cfg
        self.model_info = {
            "image_size": c.image_size, "num_classes": c.num_classes,
            "n_layer": c.n_layer, "n_embd": c.n_embd,
            "use_nvit": c.use_nvit, "use_kohonen": c.use_kohonen,
        }
        self._shape = (3, c.image_size, c.image_size)

    def warmup(self, all_buckets: bool = False) -> None:
        """Pay jit compiles before traffic.  ``all_buckets`` compiles every
        power-of-two batch bucket up to max_batch (seconds per bucket on a
        fresh cache) so no live request — including a coalesced batch from
        the dynamic batcher — ever stalls on a first-seen shape."""
        self._warm_all = bool(all_buckets)
        self.predict(np.zeros((1, *self._shape), dtype=np.uint8))
        for b in self._bucket_sizes():
            if b > 1:
                self._padded_probs(np.zeros((b, *self._shape), dtype=np.uint8))
        # warmup compiles would dominate the latency percentiles — /stats
        # should describe live traffic only
        self.stats = ServingStats()

    def _bucket_sizes(self) -> list[int]:
        """Every batch shape the serving path can dispatch (one jit program
        each): the pinned batch for AOT artifacts, else bucket 1 plus — when
        the service was warmed with all_buckets — the power-of-two ladder and
        max_batch itself (_pad_batch clamps its top bucket to max_batch, so
        that shape is live whether or not it is a power of two)."""
        if self._pinned:
            return [self._pinned]
        buckets = [1]
        if self._warm_all:
            b = 2
            while b < self.max_batch:
                buckets.append(b)
                b *= 2
            if self.max_batch > 1:
                buckets.append(self.max_batch)
        return buckets

    def reload(self, builder=None) -> None:
        """Hot-swap the model with a freshly built predictor (zero downtime).

        The replacement is built and warmed OFF the serving path — same
        bucket set the live service was warmed with, so no request after the
        swap pays a first-seen-shape compile — then swapped under the lock.
        On any failure the old model keeps serving (the exception propagates
        to the caller; main()'s SIGHUP thread logs it).  ≙ a rolling weight
        update without dropping the listener — no reference counterpart
        (its only inference surface is validate_only).
        """
        builder = builder or self._builder
        if builder is None:
            raise RuntimeError(
                "no builder recorded — construct InferenceService(builder=...) "
                "or pass reload(builder=...)"
            )
        with self._reload_lock:
            self._reload_locked(builder)

    def _reload_locked(self, builder) -> None:
        # serialized: two concurrent SIGHUPs would otherwise race their swaps
        # (the build that read the OLDER checkpoint could land last) and hold
        # two extra param copies in device memory
        new = builder()
        if getattr(new, "pinned_batch", None) != self._pinned:
            raise ValueError(
                f"reloaded artifact pins batch {getattr(new, 'pinned_batch', None)} "
                f"but the service was built for {self._pinned}"
            )
        if (new.cfg.image_size, new.cfg.num_classes) != (
            self.model_info["image_size"], self.model_info["num_classes"]
        ):
            # a geometry change would invalidate every client contract
            # (request shape, top_k bounds) mid-flight — that's a redeploy,
            # not a reload
            raise ValueError(
                f"reloaded model geometry ({new.cfg.image_size}px, "
                f"{new.cfg.num_classes} classes) differs from the serving "
                f"contract ({self.model_info['image_size']}px, "
                f"{self.model_info['num_classes']} classes)"
            )
        # warm the replacement before it takes traffic (XLA serializes device
        # programs, so this only competes for compute, never deadlocks)
        for b in self._bucket_sizes():
            new.predict_probs(np.zeros((b, *self._shape), dtype=np.uint8))
        c = new.cfg
        with self._lock:
            self.predictor = new
            # /healthz must describe the model actually serving (n_layer etc.
            # may legitimately change within the same geometry)
            self.model_info = {
                "image_size": c.image_size, "num_classes": c.num_classes,
                "n_layer": c.n_layer, "n_embd": c.n_embd,
                "use_nvit": c.use_nvit, "use_kohonen": c.use_kohonen,
            }
        self.stats.record_reload()

    def parse(self, body: bytes, content_type: str) -> tuple[np.ndarray, int]:
        """→ (images uint8 [B, C, H, W], top_k)."""
        if content_type.startswith("application/octet-stream"):
            expect = int(np.prod(self._shape))
            if len(body) != expect:
                raise ValueError(f"raw body must be {expect} bytes ({self._shape} uint8), got {len(body)}")
            return np.frombuffer(body, dtype=np.uint8).reshape(1, *self._shape), 1
        req = json.loads(body)
        if not isinstance(req, dict) or "images" not in req:
            raise ValueError('JSON body must be an object with an "images" field')
        try:
            images = np.asarray(req["images"], dtype=np.float32)
        except (TypeError, ValueError) as e:
            raise ValueError(f"images must be a numeric array: {e}") from e
        if images.ndim == 3:
            images = images[None]
        if images.ndim != 4 or images.shape[1:] != self._shape:
            raise ValueError(f"images must be [B,{','.join(map(str, self._shape))}], got {images.shape}")
        # isfinite first: json.loads accepts the NaN/Infinity literals, and
        # NaN passes both range comparisons (nan<0 and nan>255 are False) —
        # then np.rint(nan).astype(uint8) is undefined-behavior garbage
        if images.size == 0 or not np.isfinite(images).all():
            raise ValueError("pixel values must be finite numbers in 0..255")
        if images.min() < 0 or images.max() > 255:
            raise ValueError("pixel values must be 0..255")
        top_k = req.get("top_k", 1)
        if not isinstance(top_k, int) or isinstance(top_k, bool) or not (
            1 <= top_k <= self.model_info["num_classes"]
        ):
            raise ValueError(f"top_k must be an int in 1..{self.model_info['num_classes']}, got {top_k!r}")
        return np.rint(images).astype(np.uint8), top_k

    def _padded_probs(self, images: np.ndarray) -> np.ndarray:
        """One device forward over a (possibly coalesced) batch → probs for
        exactly the input rows.  Pads to the artifact's pinned batch or the
        next power of two (small jit cache); serialized through the lock."""
        b = images.shape[0]
        if self._pinned:
            if b < self._pinned:
                pad = np.zeros((self._pinned - b, *images.shape[1:]), dtype=images.dtype)
                images = np.concatenate([images, pad], axis=0)
        else:
            images, _ = _pad_batch(images, self.max_batch)
        with self._lock:
            probs = np.asarray(self.predictor.predict_probs(images))
        # the Predictor pads AGAIN to a device multiple under --data-parallel
        # (infer.py::predict_probs) — count those rows too, or the padding
        # metric reads 0 while the device runs n_devices× the request
        m = getattr(self.predictor, "_batch_multiple", 1)
        device_rows = -(-images.shape[0] // m) * m
        self.stats.record_program(b, device_rows)
        return probs[:b]

    def predict(self, images: np.ndarray, top_k: int = 1) -> dict:
        # every failure in predict() is recorded here (the HTTP handler
        # counts only its OWN read/parse failures — split accounting, no
        # double counting)
        if images.shape[0] > self.max_batch:
            self.stats.record_error()
            if self._pinned:
                raise ValueError(
                    f"batch {images.shape[0]} exceeds the artifact's pinned batch {self._pinned}"
                )
            raise ValueError(f"batch {images.shape[0]} exceeds max_batch {self.max_batch}")
        t0 = time.perf_counter()
        try:
            probs = (
                self._batcher.submit(images)
                if self._batcher is not None
                else self._padded_probs(images)
            )
        except Exception:
            self.stats.record_error()
            raise
        self.stats.record_request(images.shape[0], (time.perf_counter() - t0) * 1e3)
        labels, top_probs = topk_from_probs(probs, top_k)
        return {"labels": labels.tolist(), "probs": top_probs.tolist()}

    def close(self) -> None:
        """Stop the batching worker (if any); in-flight requests complete."""
        if self._batcher is not None:
            self._batcher.close()


def make_handler(service: InferenceService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # route through logging, not stderr
            import logging

            logging.getLogger("nvit_tpu.serve").debug(fmt, *args)

        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok", "model": service.model_info})
            elif self.path == "/stats":
                self._reply(200, service.stats.snapshot())
            else:
                self._reply(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):
            if self.path != "/predict":
                self._reply(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                # bound the allocation BEFORE reading: JSON encodes a pixel in
                # ≤4 bytes, so anything past this cannot be a valid max_batch
                # request — reject without buffering it.  A NEGATIVE length
                # must also be rejected: rfile.read(-1) reads until EOF,
                # pinning this handler thread for as long as the client keeps
                # the socket open
                limit = service.max_batch * int(np.prod(service._shape)) * 8 + 65536
                if length <= 0 or length > limit:
                    self._reply(
                        413 if length > limit else 400,
                        {"error": f"Content-Length must be in 1..{limit}, got {length}"},
                    )
                    return
                body = self.rfile.read(length)
                images, top_k = service.parse(body, self.headers.get("Content-Type", ""))
            except (ValueError, TypeError, KeyError, json.JSONDecodeError) as e:
                service.stats.record_error()
                self._reply(400, {"error": str(e)})
                return
            except Exception as e:  # read failure (socket error) — count it too
                service.stats.record_error()
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})
                return
            try:
                result = service.predict(images, top_k)
            except (ValueError, TypeError, KeyError) as e:
                # predict() recorded the error already
                self._reply(400, {"error": str(e)})
                return
            except Exception as e:  # device/runtime failure → 500, not a TCP
                # reset: every rider of a coalesced batch reads this response.
                # predict() recorded the error already
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})
                return
            # outside every except: a failure WRITING the 200 (client hung
            # up mid-response) must propagate to http.server, not trigger a
            # second status line on the same stream
            self._reply(200, result)

    return Handler


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description="Serve an nvit_tpu checkpoint over HTTP")
    ap.add_argument("--checkpoint", default="out", help="checkpoint directory")
    ap.add_argument("--name", default="checkpoint_best", help="checkpoint name")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8321)
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--batch-window-ms", type=float, default=0.0,
                    help="dynamic-batching window: concurrent requests arriving within "
                         "this many ms share one device program (0 = off; 2-5 ms is a "
                         "good setting under concurrent load)")
    ap.add_argument("--export", action="store_true",
                    help="load a params-only inference export (ckpt.export) instead of a training checkpoint")
    ap.add_argument("--data-parallel", action="store_true",
                    help="shard prediction batches over all attached devices (multi-chip hosts)")
    ap.add_argument("--model-parallel", type=int, default=1,
                    help="tensor-parallel the transformer trunk over N devices (serves "
                         "models bigger than one chip's HBM; composes with --data-parallel)")
    ap.add_argument("--int8", action="store_true",
                    help="int8-quantize the model for serving (w8a8, ops/quant.py)")
    ap.add_argument("--aot", action="store_true",
                    help="load an AOT StableHLO artifact (ckpt.aot) — no model tracing; "
                         "--int8/--data-parallel are baked in at export time")
    ap.add_argument("--warm-buckets", action="store_true",
                    help="compile every power-of-two batch bucket at startup (slower "
                         "start, no first-seen-shape stall on any live request)")
    args = ap.parse_args(argv)

    if args.aot:
        if args.int8 or args.data_parallel or args.export or args.model_parallel > 1:
            # fail fast: these are export-time properties of an AOT artifact —
            # accepting them here would silently serve something else
            ap.error("--aot is exclusive: bake --int8 into the artifact via "
                     "ckpt.aot, and --export/--data-parallel/--model-parallel do not apply")
        from nvit_tpu.ckpt.aot import load_aot

        def build():
            return load_aot(args.checkpoint, args.name)
    else:
        def build():
            load = Predictor.from_export if args.export else Predictor.from_checkpoint
            return load(args.checkpoint, args.name, data_parallel=args.data_parallel,
                        model_parallel=args.model_parallel,
                        quantize="int8" if args.int8 else None)

    service = InferenceService(
        build(), max_batch=args.max_batch, batch_window_ms=args.batch_window_ms,
        builder=build,
    )
    service.warmup(all_buckets=args.warm_buckets)

    class DrainingHTTPServer(ThreadingHTTPServer):
        # non-daemon handler threads: server_close() joins them, so every
        # request accepted before shutdown gets its response before exit
        daemon_threads = False

    server = DrainingHTTPServer((args.host, args.port), make_handler(service))

    # graceful drain on SIGTERM/SIGINT (≙ the trainer's signal protocol,
    # reference train.py:113-116): stop accepting, let in-flight requests
    # finish (server_close joins the handler threads), flush the batcher,
    # then exit 0 so an orchestrator's rolling restart never drops accepted
    # requests.  A second signal force-exits, matching the trainer's escape
    # hatch for a wedged drain.
    import signal

    def _drain(signum, frame):
        signal.signal(signal.SIGTERM, signal.SIG_DFL)
        signal.signal(signal.SIGINT, signal.SIG_DFL)
        print(f"signal {signum}: draining in-flight requests", flush=True)
        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _drain)
    signal.signal(signal.SIGINT, _drain)

    # SIGHUP → hot weight reload (rolling model update, zero downtime): the
    # replacement builds + warms on a background thread while the old model
    # keeps serving, then swaps; on failure the old model stays
    def _reload_safe():
        try:
            service.reload()
            print(f"reloaded {args.checkpoint}/{args.name}", flush=True)
        except Exception as e:
            print(f"reload failed (still serving the previous model): {e}", flush=True)

    def _hup(signum, frame):
        print("SIGHUP: reloading model", flush=True)
        threading.Thread(target=_reload_safe, daemon=True).start()

    if hasattr(signal, "SIGHUP"):  # not on Windows
        signal.signal(signal.SIGHUP, _hup)

    print(f"serving {args.checkpoint}/{args.name} on http://{args.host}:{args.port}", flush=True)
    server.serve_forever()
    server.server_close()
    service.close()
    print("drained; exiting", flush=True)


if __name__ == "__main__":
    main()
