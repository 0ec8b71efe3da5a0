"""Serving-throughput benchmark: dynamic batching vs per-request dispatch.

Measures aggregate requests/sec and latency percentiles for N concurrent
clients issuing single-image predictions through InferenceService, with the
batch window off (per-request device programs) and on (coalesced programs).
On a TPU the MXU is utilization-bound at B=1, so the window multiplies
throughput under concurrent load — this script produces that evidence as one
JSON line per configuration.

No reference counterpart (the reference has no serving stack); this
benchmarks the beyond-parity serving surface (nvit_tpu/serve.py).

Usage:
  python scripts/serve_bench.py                       # flagship config, synthetic params
  python scripts/serve_bench.py --checkpoint out --name checkpoint_best
  python scripts/serve_bench.py --clients 32 --requests 8 --window-ms 3
"""

from __future__ import annotations

import argparse
import concurrent.futures
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402

from nvit_tpu.infer import Predictor  # noqa: E402
from nvit_tpu.serve import InferenceService  # noqa: E402
from nvit_tpu.utils import acquire_tpu_lock  # noqa: E402

# one TPU-touching process at a time: two deadlock on the single-chip
# claim (CLAUDE.md), so every on-chip entry point serializes here
_TPU_LOCK = acquire_tpu_lock()


def _bench(service: InferenceService, clients: int, requests: int,
           image_size: int) -> dict:
    rng = np.random.RandomState(0)
    imgs = [rng.randint(0, 256, (1, 3, image_size, image_size), dtype=np.uint8)
            for _ in range(clients)]
    lat: list[float] = []
    lat_lock = __import__("threading").Lock()

    def client(i: int) -> None:
        for _ in range(requests):
            t0 = time.perf_counter()
            service.predict(imgs[i])
            dt = time.perf_counter() - t0
            with lat_lock:
                lat.append(dt)

    # steady-state measurement: every batch bucket compiled before timing
    service.warmup(all_buckets=True)
    t0 = time.perf_counter()
    with concurrent.futures.ThreadPoolExecutor(clients) as ex:
        list(ex.map(client, range(clients)))
    wall = time.perf_counter() - t0
    lat.sort()
    n = clients * requests
    return {
        "requests_per_sec": round(n / wall, 2),
        "p50_ms": round(lat[n // 2] * 1e3, 2),
        "p99_ms": round(lat[min(n - 1, int(n * 0.99))] * 1e3, 2),
        "stats": service.stats.snapshot(),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--checkpoint", default=None, help="checkpoint dir (default: synthetic flagship params)")
    ap.add_argument("--name", default="checkpoint_best")
    ap.add_argument("--clients", type=int, default=32)
    ap.add_argument("--requests", type=int, default=8, help="requests per client")
    ap.add_argument("--window-ms", type=float, default=3.0)
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--int8", action="store_true")
    args = ap.parse_args()

    if args.checkpoint:
        predictor = Predictor.from_checkpoint(
            args.checkpoint, args.name, quantize="int8" if args.int8 else None)
        cfg = predictor.cfg
    else:
        from __graft_entry__ import flagship_config

        full = flagship_config()
        predictor = Predictor.from_config(full, quantize="int8" if args.int8 else None)
        cfg = full.model

    for window in (0.0, args.window_ms):
        service = InferenceService(predictor, max_batch=args.max_batch,
                                   batch_window_ms=window)
        try:
            r = _bench(service, args.clients, args.requests, cfg.image_size)
        finally:
            service.close()
        print(json.dumps({
            "metric": "serve_requests_per_sec",
            "window_ms": window,
            "clients": args.clients,
            **r,
        }), flush=True)


if __name__ == "__main__":
    main()
