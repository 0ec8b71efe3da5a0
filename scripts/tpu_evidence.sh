#!/bin/bash
# On-chip evidence queue: every real-TPU check the repo's claims rest on,
# run sequentially (NEVER in parallel — two TPU-touching processes deadlock
# on the single-chip claim, see CLAUDE.md).  Usage:
#
#   bash scripts/tpu_evidence.sh [logfile]
#
# Probes the tunnel first (the axon backend can be down for hours); retries
# the probe every 10 min for up to 10 h, then runs the queue once.  Each
# item's rc is logged; re-run after a partial failure — every script is
# idempotent and the persistent jit cache (.jax_cache) makes repeats fast.
set -u
LOG=${1:-/tmp/tpu_evidence.log}
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site  # keep the axon plugin entry

echo "=== tpu_evidence start $(date)" | tee -a "$LOG"
# the probe takes the repo chip lock first (nvit_tpu.utils.device_lock):
# probing while another process holds the chip would deadlock BOTH
PROBE='from nvit_tpu.utils import acquire_tpu_lock
l = acquire_tpu_lock(timeout_s=300)
import jax
print(jax.devices())'
for i in $(seq 1 60); do
  if timeout 600 python -c "$PROBE" >> "$LOG" 2>&1; then
    echo "=== tunnel up $(date)" | tee -a "$LOG"; break
  fi
  echo "=== probe $i failed $(date)" | tee -a "$LOG"
  [ "$i" -eq 60 ] && { echo "=== tunnel never came up" | tee -a "$LOG"; exit 1; }
  sleep 600
done

run() { # name script timeout
  echo "=== $1 start $(date)" >> "$LOG"
  # bench.py's internal backend-wait (NVIT_BENCH_WAIT_S, default 2 h) must
  # stay inside the wrapping timeout, or a mid-run tunnel drop ends as an
  # opaque rc=124 kill instead of bench's clean "unreachable" exit 2; the
  # queue itself is the retry layer, so keep the in-process wait short
  NVIT_BENCH_WAIT_S=600 timeout "$3" python "$2" >> "$LOG" 2>&1
  echo "=== $1 rc=$? $(date)" | tee -a "$LOG"
}

run shardmap_smoke scripts/tpu_shardmap_smoke.py 2400   # manual shard_map lowering on-chip
run flash_parity   scripts/tpu_flash_parity.py   3600   # 21 kernel-vs-XLA checks
run bench          bench.py                      3600   # headline throughput JSON
run int8_bench     scripts/tpu_int8_bench.py     5400   # w8a8 serving throughput
run aot_smoke      scripts/tpu_aot_smoke.py      3600   # StableHLO artifact round-trip
echo "=== QUEUE DONE $(date)" | tee -a "$LOG"
