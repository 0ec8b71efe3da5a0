#!/bin/bash
# Round-5 reconciliation probes (VERDICT r4 next #1a): why does the 20k soak
# end at chance-level class loss (6.8 ~= ln 1000) when round-2's flagship
# n1k1 memorized synthetic data to 0.25 in 600 iters?
#
# Probe A already exists: the round-4 NaN re-probe (kohonen_hebbian=reference,
# 700 iters, loss 15.0 -> 7.3 — BASELINE.md round 4).  These three runs are
# IDENTICAL to it except for exactly one knob each:
#   B  kohonen_hebbian=sum        (the round-2-era default — its Hebbian
#                                  magnitude collapses the SOM at flagship
#                                  B*T, disabling the regularizer)
#   C  use_kohonen=false          (control: plain flagship — if THIS fails
#                                  to memorize, HEAD has a real regression)
#   E  reference + AutoAugment off (is memorization blocked by the live SOM
#                                  or by per-epoch augmentation views?)
#
# Chip-locked (single-chip tunnel). Results -> /tmp/r5_probes.log; record
# the reconciliation in BASELINE.md round 5.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=${LOG:-/tmp/r5_probes.log}

base_env=(
    NVIT_DATA__DATASET=synthetic
    NVIT_MODEL__IMAGE_SIZE=224 NVIT_MODEL__N_LAYER=12 NVIT_MODEL__N_HEAD=12
    NVIT_MODEL__N_EMBD=768 NVIT_MODEL__NUM_CLASSES=1000 NVIT_MODEL__USE_NVIT=true
    NVIT_MODEL__FLASH_ATTN=true NVIT_MODEL__BIAS=false
    NVIT_TRAINING__BATCH_SIZE=32 NVIT_TRAINING__MAX_ITERS=700
    NVIT_TRAINING__EVAL_INTERVAL=100 NVIT_TRAINING__LOG_INTERVAL=10
    NVIT_TRAINING__EVAL_ITERS=1 NVIT_TRAINING__EARLY_STOPPING_PATIENCE=100000
    NVIT_OPTIMIZER__WARMUP_ITERS=250 NVIT_OPTIMIZER__LR_DECAY_ITERS=700
    NVIT_SYSTEM__QUICK_VALIDATION_SIZE=32 NVIT_SYSTEM__REMAT=false
    NVIT_SYSTEM__USE_TQDM=false NVIT_SYSTEM__LOG_GPU_STATS=true
    NVIT_SYSTEM__COMPILATION_CACHE_DIR=/root/repo/.jax_cache
)

run_probe() { # name extra_env...
    local name=$1; shift
    local out=/tmp/r5_probe_$name
    rm -rf "$out"
    echo "=== probe $name start $(date -u +%H:%M:%S)" | tee -a "$LOG"
    env "${base_env[@]}" "NVIT_DATA__OUT_DIR=$out" "$@" \
        timeout 4200 python -m nvit_tpu >> "$LOG" 2>&1
    echo "=== probe $name rc=$? $(date -u +%H:%M:%S)" | tee -a "$LOG"
    python - "$out" "$name" <<'PYEOF' | tee -a "$LOG"
import json, sys
out, name = sys.argv[1], sys.argv[2]
rows = [json.loads(l) for l in open(f"{out}/metrics.jsonl") if l.strip()]
tr = [r for r in rows if "train/class_loss" in r]
if tr:
    f, l = tr[0], tr[-1]
    print(f"[{name}] iters {f['_step']}->{l['_step']}  total {f['train/total_loss']:.3f}->{l['train/total_loss']:.3f}  class {f['train/class_loss']:.3f}->{l['train/class_loss']:.3f}")
else:
    print(f"[{name}] NO TRAIN LOGS")
PYEOF
}

exec 9>>/tmp/nvit_tpu.lock
flock -x 9
echo "pid=$$ argv=scripts/r5_memorization_probes.sh" > /tmp/nvit_tpu.lock

run_probe sum   NVIT_MODEL__USE_KOHONEN=true  NVIT_MODEL__KOHONEN_NODES=512 NVIT_MODEL__KOHONEN_HEBBIAN=sum
run_probe n1k0  NVIT_MODEL__USE_KOHONEN=false
run_probe noaug NVIT_MODEL__USE_KOHONEN=true  NVIT_MODEL__KOHONEN_NODES=512 NVIT_MODEL__KOHONEN_HEBBIAN=reference \
                NVIT_DATA__AUGMENTATION__ENABLED=false
echo "=== R5 PROBES DONE $(date -u +%H:%M:%S)" | tee -a "$LOG"
