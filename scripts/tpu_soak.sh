#!/usr/bin/env bash
# Long-duration stability soak on the real chip (VERDICT r3 next #3):
# the Kohonen flagship (nViT-B/16 + 512-node SOM, batch 32, synthetic data)
# trained to ITERS iterations across MULTIPLE relaunches, each launch bounded
# by training.time_limit_seconds — the reference's 24 h-launch relaunch
# protocol (train.py:857-862, 1074-1079) exercised in anger at flagship
# scale.  One launch is killed with SIGTERM mid-run (preemption path).
#
# Evidence recorded to $OUT/soak_summary.json:
#   per-launch step-time mean (first vs last quartile → drift),
#   host RSS at each log point (growth), eval-loss continuity across
#   relaunch boundaries, checkpoint cadence, relaunch count.
# Holds the chip flock for the whole soak so driver bench runs queue
# instead of deadlocking the tunnel claim.
set -uo pipefail
cd "$(dirname "$0")/.."

OUT=${1:-/tmp/r4_soak}
ITERS=${ITERS:-20000}
LAUNCH_LIMIT_S=${LAUNCH_LIMIT_S:-1500}
SIGTERM_LAUNCH=${SIGTERM_LAUNCH:-2}   # which launch gets killed mid-run
SIGTERM_AFTER_S=${SIGTERM_AFTER_S:-400}
MAX_LAUNCHES=${MAX_LAUNCHES:-30}
mkdir -p "$OUT"

common=(
    NVIT_DATA__DATASET=synthetic "NVIT_DATA__OUT_DIR=$OUT" "NVIT_DATA__DATA_DIR=$OUT/data"
    NVIT_MODEL__IMAGE_SIZE=224 NVIT_MODEL__N_LAYER=12 NVIT_MODEL__N_HEAD=12
    NVIT_MODEL__N_EMBD=768 NVIT_MODEL__NUM_CLASSES=1000 NVIT_MODEL__USE_NVIT=true
    NVIT_MODEL__USE_KOHONEN=true NVIT_MODEL__KOHONEN_NODES=512
    # reference-magnitude Hebbian: the raw 'sum' magnitude collapses the
    # codebook at flagship B*T (round-4 NaN root cause; losses are guarded
    # now, but a collapsed SOM is not a configuration worth soaking)
    NVIT_MODEL__KOHONEN_HEBBIAN=reference
    NVIT_MODEL__FLASH_ATTN=true NVIT_MODEL__BIAS=false
    NVIT_TRAINING__BATCH_SIZE=32 NVIT_TRAINING__MAX_ITERS="$ITERS"
    NVIT_TRAINING__EVAL_INTERVAL=500 NVIT_TRAINING__LOG_INTERVAL=100
    NVIT_TRAINING__EVAL_ITERS=2 NVIT_TRAINING__EARLY_STOPPING_PATIENCE=100000
    NVIT_TRAINING__TIME_LIMIT_SECONDS="$LAUNCH_LIMIT_S"
    # the packaged warmup 500 / decay 1000 mirrors the reference's defaults
    # (a parity quirk — degenerate for a 20k-iter run: LR pins at min_lr from
    # iter 1000); the soak uses a schedule proportioned to its budget
    NVIT_OPTIMIZER__WARMUP_ITERS=1000 "NVIT_OPTIMIZER__LR_DECAY_ITERS=$ITERS"
    NVIT_SYSTEM__QUICK_VALIDATION_SIZE=64 NVIT_SYSTEM__REMAT=false
    NVIT_SYSTEM__USE_TQDM=false NVIT_SYSTEM__LOG_GPU_STATS=false
    NVIT_SYSTEM__LOG_MEMORY=true
    # persistent compile cache: launch 1 pays the remote compile ONCE; every
    # relaunch after that loads the program in seconds (system config knob)
    NVIT_SYSTEM__COMPILATION_CACHE_DIR=/root/repo/.jax_cache
    PYTHONPATH=/root/repo:/root/.axon_site
)

soak_loop() {
    launch=0
    while [ ! -f "$OUT/finished" ] && [ "$launch" -lt "$MAX_LAUNCHES" ]; do
        launch=$((launch + 1))
        extra=()
        if [ -f "$OUT/checkpoint_latest.json" ]; then
            extra=(NVIT_TRAINING__INIT_FROM=resume "NVIT_DATA__CHECKPOINT_DIR=$OUT")
        fi
        echo "=== soak launch $launch start $(date -u +%H:%M:%S) ===" | tee -a "$OUT/soak.log"
        env "${common[@]}" "${extra[@]}" python -m nvit_tpu >> "$OUT/soak.log" 2>&1 &
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
}

# hold the chip lock for the whole soak (advisory flock; same file as
# nvit_tpu/utils/device_lock.py — competing evidence runs queue behind us)
exec 9>>/tmp/nvit_tpu.lock
flock -x 9
echo "pid=$$ argv=scripts/tpu_soak.sh" > /tmp/nvit_tpu.lock

soak_loop

python scripts/soak_report.py "$OUT" | tee "$OUT"/soak_summary.json
