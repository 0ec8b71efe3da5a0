"""Native JPEG-decoder thread-scaling bench (VERDICT r2 next #8).

Measures nvit_loader's threaded libjpeg decode throughput as a function of
``num_threads`` (≙ the reference's DataLoader ``num_workers`` knob,
train.py:334-352).  The ImageNet-rate claim in BASELINE.md rests on the pool
scaling with cores: on a many-core TPU-VM host each thread decodes
independently (no GIL, no shared state besides the work queue), so throughput
is expected ~linear in min(threads, cores).  On a 1-core container the sweep
instead validates that oversubscription does NOT regress throughput (pool
overhead is negligible).

Usage:  python scripts/decode_bench.py [n_images] [image_px]
Prints a table and one JSON line per thread count.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from nvit_tpu.data.native import available, decode_jpeg_batch  # noqa: E402


def make_jpegs(dirpath: Path, n: int, px: int) -> list[str]:
    """n synthetic quality-85 JPEGs with photographic-ish content (smooth
    gradients + noise — compresses like a real photo, unlike flat color)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    paths = []
    yy, xx = np.mgrid[0:px, 0:px].astype(np.float32) / px
    for i in range(n):
        base = np.stack(
            [
                127 + 120 * np.sin(6.28 * (xx * (1 + i % 3) + i * 0.1)),
                127 + 120 * np.cos(6.28 * (yy * (2 + i % 2))),
                127 + 120 * np.sin(6.28 * (xx + yy)),
            ],
            axis=-1,
        )
        noise = rng.normal(0, 12, base.shape)
        img = np.clip(base + noise, 0, 255).astype(np.uint8)
        p = dirpath / f"img_{i:05d}.jpg"
        Image.fromarray(img).save(p, quality=85)
        paths.append(str(p))
    return paths


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    px = int(sys.argv[2]) if len(sys.argv) > 2 else 256  # typical ImageNet source size
    target = 224
    if not available():
        print("native loader unavailable; nothing to bench")
        return
    cores = os.cpu_count() or 1
    with tempfile.TemporaryDirectory() as td:
        paths = make_jpegs(Path(td), n, px)
        # warmup (page cache + pool init)
        decode_jpeg_batch(paths[:32], target, num_threads=1)

        sweep = sorted({1, 2, 4, 8, cores, 2 * cores})
        print(f"cores={cores}  images={n}  {px}px → {target}px center-crop CHW")
        print(f"{'threads':>8} {'img/s':>10} {'ms/batch':>10}")
        for t in sweep:
            t0 = time.perf_counter()
            out, ok = decode_jpeg_batch(paths, target, num_threads=t)
            dt = time.perf_counter() - t0
            assert ok.all() and out.shape == (n, 3, target, target)
            rate = n / dt
            print(f"{t:>8} {rate:>10.1f} {dt * 1000:>10.1f}")
            print(json.dumps({
                "metric": "decode_img_per_s", "threads": t, "cores": cores,
                "value": round(rate, 1), "unit": "img/s",
            }))


if __name__ == "__main__":
    main()
