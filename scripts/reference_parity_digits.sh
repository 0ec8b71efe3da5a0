#!/usr/bin/env bash
# Accuracy parity vs the ACTUAL reference implementation, head-to-head on the
# bundled digits set (the only real dataset in a zero-egress container):
#   side A: reference torch model + reference step semantics
#           (scripts/reference_digits_parity.py, CPU torch)
#   side B: nvit_tpu via the digits matrix with augmentation DISABLED
#           (the reference's kornia AutoAugment is not installable here, so
#           the fair comparison is no-aug vs no-aug)
# Both sides: same geometry (4L/4H/128d, 16px), same 80/20 split, same
# (x·2/255)−1 normalization, same optimizer settings, same 2000-iter budget.
# ~1 h total on CPU.  Results: /tmp/ref_parity/{reference.log,ours/...}.
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=${1:-/tmp/ref_parity}
mkdir -p "$OUT"
export ITERS=${ITERS:-2000}

echo "=== side A: reference torch (log: $OUT/reference.log)"
env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH="$PWD" \
  python scripts/reference_digits_parity.py 2>&1 | tee "$OUT/reference.log"

echo "=== side B: nvit_tpu, augmentation off (log: $OUT/ours.log)"
AUG=false bash scripts/digits_matrix.sh "$OUT/ours" 2>&1 | tee "$OUT/ours.log"

echo "=== PARITY SUMMARY (best held-out top-1, no augmentation, $ITERS iters) ==="
grep '"impl"' "$OUT/reference.log" || true
grep "best val top-1" "$OUT/ours.log" || true
