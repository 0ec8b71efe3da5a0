#!/usr/bin/env bash
# All-features ENDURANCE soak on the 8-device virtual CPU mesh: dp4×tp2 +
# FSDP (ZeRO-3) + SOM + shard_mapped flash kernels in ONE partitioned
# program, trained for ITERS iterations across multiple time-limited
# relaunches with one mid-run SIGTERM (preemption path) — the long-duration
# complement to the one-step all-features dryrun topology
# (__graft_entry__.dryrun_multichip) and to the single-chip TPU soak
# (scripts/tpu_soak.sh).  No chip lock needed: pure CPU.
#
# Evidence lands in $OUT/soak_summary.json via scripts/soak_report.py
# (same launch markers / metrics.jsonl contract as tpu_soak.sh).
set -uo pipefail
cd "$(dirname "$0")/.."

OUT=${1:-/tmp/cpu_mesh_soak}
ITERS=${ITERS:-4000}
LAUNCH_LIMIT_S=${LAUNCH_LIMIT_S:-900}
SIGTERM_LAUNCH=${SIGTERM_LAUNCH:-2}
SIGTERM_AFTER_S=${SIGTERM_AFTER_S:-200}
MAX_LAUNCHES=${MAX_LAUNCHES:-12}
mkdir -p "$OUT"

# digits-profile geometry (16px, 4L/4H/128d) on synthetic data: H=4 divides
# tp=2, batch 32 divides dp=4; small enough that the generic-interpreter
# kernels keep a useful step rate on one host core
common=(
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu PYTHONPATH="$PWD"
    XLA_FLAGS=--xla_force_host_platform_device_count=8
    NVIT_DATA__DATASET=synthetic "NVIT_DATA__OUT_DIR=$OUT" "NVIT_DATA__DATA_DIR=$OUT/data"
    NVIT_MODEL__IMAGE_SIZE=16 NVIT_MODEL__N_LAYER=4 NVIT_MODEL__N_HEAD=4 NVIT_MODEL__N_EMBD=128
    NVIT_MODEL__NUM_CLASSES=10 NVIT_MODEL__LOCAL_PATCH_SIZE=4 NVIT_MODEL__GLOBAL_PATCH_SIZE=8
    NVIT_MODEL__USE_NVIT=true NVIT_MODEL__USE_KOHONEN=true NVIT_MODEL__KOHONEN_NODES=32
    NVIT_MODEL__FLASH_ATTN=true
    NVIT_SYSTEM__USE_DDP=true NVIT_SYSTEM__MODEL_PARALLEL=2 NVIT_SYSTEM__FSDP=true
    NVIT_TRAINING__BATCH_SIZE=32 NVIT_TRAINING__MAX_ITERS="$ITERS"
    NVIT_TRAINING__EVAL_INTERVAL=250 NVIT_TRAINING__LOG_INTERVAL=50
    NVIT_TRAINING__EVAL_ITERS=2 NVIT_TRAINING__EARLY_STOPPING_PATIENCE=100000
    NVIT_TRAINING__TIME_LIMIT_SECONDS="$LAUNCH_LIMIT_S"
    NVIT_OPTIMIZER__WARMUP_ITERS=200 "NVIT_OPTIMIZER__LR_DECAY_ITERS=$ITERS"
    NVIT_SYSTEM__QUICK_VALIDATION_SIZE=64
    NVIT_SYSTEM__USE_TQDM=false NVIT_SYSTEM__DTYPE=float32 NVIT_SYSTEM__USE_AMP=false
    NVIT_SYSTEM__LOG_MEMORY=true
    # relaunches reload the mesh program from cache instead of recompiling
    "NVIT_SYSTEM__COMPILATION_CACHE_DIR=$OUT/jax_cache"
)

launch=0
while [ ! -f "$OUT/finished" ] && [ "$launch" -lt "$MAX_LAUNCHES" ]; do
    launch=$((launch + 1))
    extra=()
    if [ -f "$OUT/checkpoint_latest.json" ]; then
        extra=(NVIT_TRAINING__INIT_FROM=resume "NVIT_DATA__CHECKPOINT_DIR=$OUT")
    fi
    echo "=== soak launch $launch start $(date -u +%H:%M:%S) ===" | tee -a "$OUT/soak.log"
    env "${common[@]}" "${extra[@]}" python scripts/cpu_mesh_soak.py >> "$OUT/soak.log" 2>&1 &
    pid=$!
    if [ "$launch" -eq "$SIGTERM_LAUNCH" ]; then
        ( sleep "$SIGTERM_AFTER_S"; echo "=== SIGTERM launch $launch ($(date -u +%H:%M:%S))" | tee -a "$OUT/soak.log"; kill -TERM "$pid" 2>/dev/null ) &
    fi
    wait "$pid"
    rc=$?
    iter=$(python -c "import json;print(json.load(open('$OUT/checkpoint_latest.json'))['iter_num'])" 2>/dev/null || echo "?")
    echo "=== soak launch $launch exit rc=$rc iter=$iter $(date -u +%H:%M:%S) ===" | tee -a "$OUT/soak.log"
    sleep 2
done
echo "=== soak loop done after $launch launches ===" | tee -a "$OUT/soak.log"

python scripts/soak_report.py "$OUT" | tee "$OUT"/soak_summary.json
