#!/bin/bash
# Real-data ablation matrix on the bundled scikit-learn digits set: the
# reference's 3-profile experiment (baseline ViT / nViT / nViT+Kohonen,
# ≙ profiles/nvit{0,1}_k{0,1}.env) run end-to-end on REAL images — the only
# real dataset reachable in a zero-egress container.  CPU, ~10 min total.
# Results land in $OUT/<profile>/out/metrics.jsonl; a summary prints at the end.
set -e
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/digits_matrix}
ITERS=${ITERS:-2000}

run_profile() { # name use_nvit use_kohonen
  local name=$1 nvit=$2 koh=$3
  echo "=== $name (use_nvit=$nvit use_kohonen=$koh) ==="
  mkdir -p "$OUT/$name"
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH="$PWD" \
    NVIT_DATA__DATASET=digits NVIT_DATA__OUT_DIR="$OUT/$name/out" NVIT_DATA__DATA_DIR="$OUT/$name/data" \
    NVIT_MODEL__IMAGE_SIZE=16 NVIT_MODEL__N_LAYER=4 NVIT_MODEL__N_HEAD=4 NVIT_MODEL__N_EMBD=128 \
    NVIT_MODEL__NUM_CLASSES=10 NVIT_MODEL__LOCAL_PATCH_SIZE=4 NVIT_MODEL__GLOBAL_PATCH_SIZE=8 \
    NVIT_MODEL__USE_NVIT=$nvit NVIT_MODEL__USE_KOHONEN=$koh NVIT_MODEL__KOHONEN_NODES=32 \
    NVIT_TRAINING__BATCH_SIZE=64 NVIT_TRAINING__MAX_ITERS=$ITERS NVIT_TRAINING__EVAL_INTERVAL=250 \
    NVIT_TRAINING__LOG_INTERVAL=250 NVIT_TRAINING__EVAL_ITERS=5 NVIT_TRAINING__EARLY_STOPPING_PATIENCE=100 \
    NVIT_OPTIMIZER__LEARNING_RATE=0.001 NVIT_OPTIMIZER__WARMUP_ITERS=100 NVIT_OPTIMIZER__LR_DECAY_ITERS=$ITERS \
    NVIT_SYSTEM__USE_DDP=false NVIT_SYSTEM__USE_TQDM=false NVIT_SYSTEM__DTYPE=float32 NVIT_SYSTEM__USE_AMP=false \
    NVIT_DATA__AUGMENTATION__ENABLED="${AUG:-true}" \
    timeout 1800 python -m nvit_tpu > "$OUT/$name/run.log" 2>&1
}

run_profile nvit0_k0 false false
run_profile nvit1_k0 true  false
run_profile nvit1_k1 true  true

echo "=== digits matrix summary (best held-out top-1 over evals) ==="
for name in nvit0_k0 nvit1_k0 nvit1_k1; do
  best=$(grep top1 "$OUT/$name/out/metrics.jsonl" | \
    python -c "import sys, json; print(max(json.loads(l)['val/top1_accuracy'] for l in sys.stdin))")
  echo "$name: best val top-1 = $best %"
done

echo "=== int8 serving accuracy (checkpoint_best, fp vs w8a8 Predictor) ==="
for name in nvit0_k0 nvit1_k0 nvit1_k1; do
  env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH="$PWD" OUTDIR="$OUT/$name/out" NAME="$name" \
  python - <<'EOF'
import os
import numpy as np
from nvit_tpu.data.datasets import load_digits_dataset
from nvit_tpu.infer import Predictor

va = load_digits_dataset(train=False, image_size=16)
out = os.environ["OUTDIR"]
acc = {}
for mode in (None, "int8"):
    p = Predictor.from_checkpoint(out, "checkpoint_best", quantize=mode)
    acc[mode or "fp"] = float((p.predict(va.images)[0][:, 0] == va.labels).mean()) * 100
print(f"{os.environ['NAME']}: held-out top-1 fp={acc['fp']:.2f}% int8={acc['int8']:.2f}%")
EOF
done
