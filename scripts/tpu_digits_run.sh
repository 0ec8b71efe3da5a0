#!/usr/bin/env bash
# REAL-data training on the REAL chip: the nvit1_k1 flagship profile of the
# digits matrix (scikit-learn's bundled UCI scans — the only real dataset in
# a zero-egress container) trained end-to-end on the tunneled TPU v5e.
# Complements scripts/digits_matrix.sh (same config, CPU): same model, same
# data, same iteration budget — so the held-out top-1 is directly comparable
# to the CPU matrix row (96.97% for nvit1_k1).
#
# Serializes against other on-chip work via the repo chip lock (flock on
# /tmp/nvit_tpu.lock — see CLAUDE.md CHIP-LOCK PROTOCOL).  Remote compiles
# for the small digits programs are fresh (not in .jax_cache) — expect
# ~10-20 min of compile before the first step.
#
# Usage: bash scripts/tpu_digits_run.sh [outdir] ; log lands in $OUT/run.log
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=${1:-/tmp/digits_tpu}
ITERS=${ITERS:-2000}
# Idempotent AND safe: a dir carrying our marker (a prior run of THIS
# script, possibly partial) is wiped and redone — watchdog retries must
# converge.  A non-empty dir WITHOUT the marker is refused: a mistyped
# first arg must never delete anything we didn't create.
MARKER=".tpu_digits_run"
if [ -d "$OUT" ] && [ -n "$(ls -A "$OUT" 2>/dev/null)" ]; then
  if [ -f "$OUT/$MARKER" ]; then
    rm -rf "$OUT"
  else
    echo "refusing to touch non-empty $OUT (no $MARKER marker) — pass a fresh directory" >&2
    exit 1
  fi
fi
mkdir -p "$OUT"
touch "$OUT/$MARKER"

# keep the axon plugin's sitecustomize entry on PYTHONPATH (CLAUDE.md)
env PYTHONPATH="$PWD:/root/.axon_site" \
  NVIT_DATA__DATASET=digits "NVIT_DATA__OUT_DIR=$OUT/out" "NVIT_DATA__DATA_DIR=$OUT/data" \
  NVIT_MODEL__IMAGE_SIZE=16 NVIT_MODEL__N_LAYER=4 NVIT_MODEL__N_HEAD=4 NVIT_MODEL__N_EMBD=128 \
  NVIT_MODEL__NUM_CLASSES=10 NVIT_MODEL__LOCAL_PATCH_SIZE=4 NVIT_MODEL__GLOBAL_PATCH_SIZE=8 \
  NVIT_MODEL__USE_NVIT=true NVIT_MODEL__USE_KOHONEN=true NVIT_MODEL__KOHONEN_NODES=32 \
  NVIT_TRAINING__BATCH_SIZE=64 NVIT_TRAINING__MAX_ITERS="$ITERS" NVIT_TRAINING__EVAL_INTERVAL=250 \
  NVIT_TRAINING__LOG_INTERVAL=250 NVIT_TRAINING__EVAL_ITERS=5 NVIT_TRAINING__EARLY_STOPPING_PATIENCE=100 \
  NVIT_OPTIMIZER__LEARNING_RATE=0.001 NVIT_OPTIMIZER__WARMUP_ITERS=100 NVIT_OPTIMIZER__LR_DECAY_ITERS="$ITERS" \
  NVIT_SYSTEM__USE_DDP=false NVIT_SYSTEM__USE_TQDM=false NVIT_SYSTEM__DTYPE=float32 NVIT_SYSTEM__USE_AMP=false \
  NVIT_DATA__AUGMENTATION__ENABLED=true \
  flock -w 7200 /tmp/nvit_tpu.lock timeout 3600 python -m nvit_tpu > "$OUT/run.log" 2>&1

echo "=== tpu digits run: best held-out top-1 over evals ==="
grep top1 "$OUT/out/metrics.jsonl" | \
  python -c "import sys, json; print(max(json.loads(l)['val/top1_accuracy'] for l in sys.stdin))"
