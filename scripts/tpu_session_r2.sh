#!/bin/bash
# Round-2 TPU session: real-chip flash parity, then bench (no-kohonen + kohonen).
# Single TPU process at a time (sequential).
set -x
cd /root/repo
echo "=== parity ==="
python scripts/tpu_flash_parity.py
echo "parity_rc=$?"
echo "=== bench default (fused qknorm + fused optimizer) ==="
python bench.py 32 30
echo "=== bench kohonen ==="
NVIT_BENCH_KOHONEN=1 python bench.py 32 20
echo "DONE"
