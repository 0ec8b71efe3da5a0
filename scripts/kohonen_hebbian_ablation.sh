#!/bin/bash
# Root-cause ablation for the head-to-head Kohonen gap (BASELINE.md round 4):
# the reference's k1 beats its k0 while ours trails it.  Hypothesis: our
# batch-SOM Hebbian delta sums over all B*T token samples (the reference's
# zip-truncated loop applies only B updates/step), a T-times-stronger pull
# that collapses the small digits codebook toward the global patch mean.
#
# Runs the nvit1_k1 digits profile (no aug, identical to side B of
# scripts/reference_parity_digits.sh) under model.kohonen_hebbian =
#   sum        — round-<=3 behavior (side B recorded 96.28%)
#   reference  — batch delta / T (per-step magnitude parity with the ref loop)
#   off        — gradient-only codebook
# plus a reseeded "sum" to gauge run-to-run noise.  CPU, ~25 min total.
#
# Deliberately NOT set -e: one variant timing out must not discard the
# completed ones — failures are reported per-row in the summary instead.
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/hebbian_ablation}
ITERS=${ITERS:-2000}

run_variant() { # name hebbian_mode seed
  local name=$1 mode=$2 seed=$3
  echo "=== $name (kohonen_hebbian=$mode seed=$seed) ==="
  mkdir -p "$OUT/$name"
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH="$PWD" \
    NVIT_DATA__DATASET=digits NVIT_DATA__OUT_DIR="$OUT/$name/out" NVIT_DATA__DATA_DIR="$OUT/$name/data" \
    NVIT_MODEL__IMAGE_SIZE=16 NVIT_MODEL__N_LAYER=4 NVIT_MODEL__N_HEAD=4 NVIT_MODEL__N_EMBD=128 \
    NVIT_MODEL__NUM_CLASSES=10 NVIT_MODEL__LOCAL_PATCH_SIZE=4 NVIT_MODEL__GLOBAL_PATCH_SIZE=8 \
    NVIT_MODEL__USE_NVIT=true NVIT_MODEL__USE_KOHONEN=true NVIT_MODEL__KOHONEN_NODES=32 \
    NVIT_MODEL__KOHONEN_HEBBIAN=$mode \
    NVIT_TRAINING__BATCH_SIZE=64 NVIT_TRAINING__MAX_ITERS=$ITERS NVIT_TRAINING__EVAL_INTERVAL=250 \
    NVIT_TRAINING__LOG_INTERVAL=250 NVIT_TRAINING__EVAL_ITERS=5 NVIT_TRAINING__EARLY_STOPPING_PATIENCE=100 \
    NVIT_OPTIMIZER__LEARNING_RATE=0.001 NVIT_OPTIMIZER__WARMUP_ITERS=100 NVIT_OPTIMIZER__LR_DECAY_ITERS=$ITERS \
    NVIT_SYSTEM__USE_DDP=false NVIT_SYSTEM__USE_TQDM=false NVIT_SYSTEM__DTYPE=float32 NVIT_SYSTEM__USE_AMP=false \
    NVIT_TRAINING__SEED=$seed \
    NVIT_DATA__AUGMENTATION__ENABLED=false \
    timeout 4500 python -m nvit_tpu > "$OUT/$name/run.log" 2>&1 \
    || echo "WARNING: $name exited rc=$? (see $OUT/$name/run.log)" >&2
}

run_variant heb_reference reference 42
run_variant heb_off       off       42
run_variant heb_sum_s43   sum       43
run_variant heb_ref_s43   reference 43

echo "=== kohonen_hebbian ablation (nvit1_k1, digits, no aug, $ITERS iters) ==="
echo "heb_sum seed42 (side B, prior run): 96.28"
for name in heb_reference heb_off heb_sum_s43 heb_ref_s43; do
  best=$(grep top1 "$OUT/$name/out/metrics.jsonl" 2>/dev/null | \
    python -c "import sys, json; ls=[json.loads(l)['val/top1_accuracy'] for l in sys.stdin]; print(max(ls) if ls else 'FAILED')")
  echo "$name: best val top-1 = $best %"
done
