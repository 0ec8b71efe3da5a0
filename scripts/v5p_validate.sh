#!/bin/bash
# v5p day-one checklist (VERDICT r4 next #6): everything to run, in order,
# in the first hour on a new TPU pod (BASELINE.json config 5 target:
# v5p-8 nViT-L/16 dp8) — scripted so bring-up is a checklist, not an
# improvisation.  Every check is hardware-agnostic and the whole script
# runs green on the single tunneled v5e this repo develops against.
#
#   1. chip probe      — device count/kind/HBM under the chip lock; loud
#                        warning + override-env pointers when the kernel
#                        tuning constants were measured on a different
#                        generation (ops/tuning.py is v5e-measured).
#   2. kernel parity   — scripts/tpu_flash_parity.py: all Pallas kernels
#                        (flash fwd/bwd, fused QK-norm incl. dsqk, fused
#                        gated-MLP fwd/dx/dwu/dwv) vs the XLA reference
#                        path ON THIS CHIP (21 checks on v5e).
#   3. bench           — bench.py headline JSON (img/s/chip, MFU, HBM
#                        traffic floor); compare against BASELINE.md.
#   4. real-device dryrun — the full train step jitted over a Mesh of ALL
#                        visible chips (dp=N, tp=2 when N%2==0 and N>=4)
#                        with post-step invariants (unit renorm norms, SOM
#                        codebook consistency).  On one chip this is a
#                        dp1 mesh — still a real-hardware mesh execution.
#
# After this script is green: scripts/scale_run.sh [iters] for the first
# real training run (FSDP on by default), then scripts/tpu_soak.sh for
# endurance.  Usage:
#
#   bash scripts/v5p_validate.sh [logfile]
#
# Idempotent; the persistent jit cache (.jax_cache) makes re-runs fast.
set -u
LOG=${1:-/tmp/v5p_validate.log}
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site  # keep the axon plugin entry
FAILED=0

step() { # name cmd... — serialized by the in-process chip lock each step takes
  local name=$1 rc
  shift
  echo "=== [$name] start $(date -u +%FT%TZ)" | tee -a "$LOG"
  "$@" >> "$LOG" 2>&1
  rc=$?
  if [ "$rc" -eq 0 ]; then
    echo "=== [$name] OK $(date -u +%FT%TZ)" | tee -a "$LOG"
  else
    echo "=== [$name] FAILED rc=$rc — see $LOG" | tee -a "$LOG"
    FAILED=1
  fi
}

# ---- 1. chip probe (count, kind, HBM, tuning-generation warning) ----------
step probe timeout 900 python - <<'EOF'
from nvit_tpu.utils import acquire_tpu_lock

lock = acquire_tpu_lock(timeout_s=600)
import jax

devices = jax.devices()
kind = devices[0].device_kind
print(f"devices={len(devices)} kind={kind!r} platform={devices[0].platform}")
for d in devices:
    stats = {}
    try:
        stats = d.memory_stats() or {}
    except Exception:
        pass
    lim = stats.get("bytes_limit")
    print(f"  {d.id}: hbm_limit={lim / 2**30:.2f} GiB" if lim else f"  {d.id}: (no memory_stats)")
# Kernel tile constants + dispatch crossovers are v5e-MEASURED; any other
# generation should sweep them before trusting bench numbers.
if "v5 lite" not in kind and "v5e" not in kind:
    print(
        f"WARNING: tuning constants in nvit_tpu/ops/tuning.py were measured on "
        f"v5e, this is {kind!r}.  Override via NVIT_TUNE_* envs (set BEFORE the "
        f"first nvit_tpu import) and re-sweep: scripts/gated_mlp_tile_bench.py, "
        f"scripts/attn_bwd_split_bench.py; roofline constants: NVIT_CHIP_* "
        f"(docs/PERFORMANCE.md 'What changes on v5p')."
    )
EOF

# ---- 2. kernel parity on this chip ----------------------------------------
step parity env NVIT_BENCH_WAIT_S=600 timeout 3600 python scripts/tpu_flash_parity.py

# ---- 3. headline bench ------------------------------------------------------
step bench env NVIT_BENCH_WAIT_S=600 timeout 3600 python bench.py

# ---- 4. one dryrun topology on REAL devices --------------------------------
step dryrun timeout 1800 python - <<'EOF'
from nvit_tpu.utils import acquire_tpu_lock

lock = acquire_tpu_lock(timeout_s=600)
import dataclasses

import jax

import __graft_entry__ as ge

devices = jax.devices()
n = len(devices)
tp = 2 if n % 2 == 0 and n >= 4 else 1
# nViT-L-proportioned tiny shapes (XLA attention path — kernel lowering is
# step 2's job; this step validates the PARTITIONED step program on real ICI)
cfg = ge.flagship_config(
    image_size=32, n_layer=4, n_head=4, n_embd=64, num_classes=16,
    local_patch_size=4, global_patch_size=8,
    use_kohonen=(tp > 1), kohonen_nodes=18, flash_attn=False,
)
cfg = dataclasses.replace(
    cfg, training=dataclasses.replace(cfg.training, batch_size=2 * n)
)
topo = f"dp{n // tp}xtp{tp}" + ("+som" if tp > 1 else "")
ge._dryrun_one(devices, tp, cfg, topo)
print(f"real-device dryrun OK: {topo} over {n}x {devices[0].device_kind}")
EOF

echo "=== v5p_validate done FAILED=$FAILED $(date -u +%FT%TZ)" | tee -a "$LOG"
exit $FAILED
