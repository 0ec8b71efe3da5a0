#!/usr/bin/env bash
# Real-TPU two-launch flagship run (VERDICT r2 next #1 "Done" criterion):
# launch 1 trains nViT-B/16 for N iters and checkpoints; launch 2 resumes and
# must log the RESTORED best_val_loss/patience (not reset them), continue to
# 2N, and never overwrite checkpoint_best unless a real improvement happens.
# Single TPU process at a time — run from an idle session only.
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=${1:-/tmp/r3_relaunch}
ITERS=${2:-60}
# Idempotent AND safe: a dir carrying our marker (a prior run of THIS
# script, possibly partial) is wiped and redone — watchdog retries must
# converge.  A non-empty dir WITHOUT the marker is refused: a mistyped
# first arg must never delete anything we didn't create.
MARKER=".tpu_relaunch_evidence"
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

common=(
    NVIT_DATA__DATASET=synthetic "NVIT_DATA__OUT_DIR=$OUT" "NVIT_DATA__DATA_DIR=$OUT/data"
    NVIT_MODEL__IMAGE_SIZE=224 NVIT_MODEL__N_LAYER=12 NVIT_MODEL__N_HEAD=12
    NVIT_MODEL__N_EMBD=768 NVIT_MODEL__NUM_CLASSES=1000 NVIT_MODEL__USE_NVIT=true
    NVIT_MODEL__USE_KOHONEN=false NVIT_MODEL__FLASH_ATTN=true NVIT_MODEL__BIAS=false
    NVIT_TRAINING__BATCH_SIZE=32 NVIT_TRAINING__EVAL_INTERVAL=20
    NVIT_TRAINING__LOG_INTERVAL=20 NVIT_TRAINING__EVAL_ITERS=1
    NVIT_SYSTEM__QUICK_VALIDATION_SIZE=64 NVIT_SYSTEM__REMAT=false
    NVIT_SYSTEM__USE_TQDM=false NVIT_SYSTEM__LOG_GPU_STATS=false
)

echo "=== launch 1 (scratch → $ITERS iters) ==="
env "${common[@]}" NVIT_TRAINING__MAX_ITERS="$ITERS" python -m nvit_tpu

python - "$OUT" <<'EOF'
import json, sys
m = json.load(open(sys.argv[1] + "/checkpoint_latest.json"))
print("launch-1 trainer meta:", m["trainer"], "iter:", m["iter_num"])
assert m["trainer"]["best_val_loss"] is not None
EOF

echo "=== launch 2 (resume → $((2 * ITERS)) iters) ==="
env "${common[@]}" NVIT_TRAINING__MAX_ITERS="$((2 * ITERS))" \
    NVIT_TRAINING__INIT_FROM=resume "NVIT_DATA__CHECKPOINT_DIR=$OUT" \
    python -m nvit_tpu

grep "Resumed from iteration" "$OUT/training.log"
python - "$OUT" "$ITERS" <<'EOF'
import json, sys
out, iters = sys.argv[1], int(sys.argv[2])
m = json.load(open(out + "/checkpoint_latest.json"))
print("launch-2 trainer meta:", m["trainer"], "iter:", m["iter_num"])
assert m["iter_num"] == 2 * iters
b = json.load(open(out + "/checkpoint_best.json"))
print("checkpoint_best: iter", b["iter_num"], "val/loss", b["metrics"].get("val/loss"))
# best must carry a val loss ≤ every eval both launches logged (strict-improvement
# protocol survived the relaunch)
evals = [json.loads(l) for l in open(out + "/metrics.jsonl") if "val/loss" in l]
assert b["metrics"]["val/loss"] <= min(e["val/loss"] for e in evals) + 1e-9
print("RELAUNCH_EVIDENCE_OK")
EOF
