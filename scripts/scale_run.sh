#!/bin/bash
# BASELINE.json config 5, pre-staged: nViT-L/16 data-parallel training with
# the sharded in-step weight renorm, ready to launch the moment multi-chip
# hardware is attached (this container tunnels exactly ONE v5e chip, so the
# script exits 2 with instructions when it can't see >=2 devices).
#
# The same topology is already validated without hardware:
#   * __graft_entry__.dryrun_multichip — dp8 nViT-L-proportioned step on an
#     8-device CPU mesh, post-step invariants asserted (MULTICHIP_r0N.json)
#   * tests/test_multiprocess.py — 2-process x 2-device training ≡ 1x4
#   * tests/test_spmd_kernels.py — the Pallas kernels shard_mapped dp8/dp4xtp2
#
# Usage: scripts/scale_run.sh [iters]   (default 200 — enough for a steady
# images/sec/chip reading; raise for a real training run)
set -euo pipefail
cd "$(dirname "$0")/.."

ITERS="${1:-200}"

# One probe process, under the chip lock (CLAUDE.md CHIP-LOCK PROTOCOL —
# every backend init on a tunneled chip must serialize): counts chips AND
# runs the tuning pre-flight.  The kernel tile constants and dispatch
# crossovers are v5e-MEASURED (ops/tuning.py); on any other chip generation
# warn loudly (stderr) and name the override envs + the roofline table
# coverage instead of silently inheriting v5e heuristics
# (docs/PERFORMANCE.md "What changes on v5p").  Stdout is ONLY the count.
NCHIPS=$(flock -w 7200 /tmp/nvit_tpu.lock python - <<'EOF'
import sys

import jax

try:
    devices = jax.devices()
except Exception:
    print(0)
    sys.exit(0)
print(len(devices))

kind = devices[0].device_kind
known = ("v5 lite", "v5e", "v5p", "v4", "v6")
if not any(k in kind.lower() for k in known):
    print(f"scale_run PRE-FLIGHT: device kind {kind!r} missing from the "
          "PEAK_BF16/HBM_BW tables (bench.py) — MFU/traffic readouts will "
          "assume v5e. Add the chip there first.", file=sys.stderr)
if "v5 lite" not in kind.lower() and "v5e" not in kind.lower():
    import nvit_tpu.ops.tuning as t
    print(f"scale_run PRE-FLIGHT: {kind}: kernel tuning constants are "
          "v5e-measured. Review before a production run (NVIT_TUNE_* envs):",
          file=sys.stderr)
    print(f"  FUSED_BWD_MAX_T={t.FUSED_BWD_MAX_T} BLOCK_Q_CAP_FWD={t.BLOCK_Q_CAP_FWD} "
          f"BLOCK_Q_CAP_BWD={t.BLOCK_Q_CAP_BWD}", file=sys.stderr)
    print(f"  GATED_MLP tiles fwd=({t.GATED_MLP_FWD_ROW},{t.GATED_MLP_FWD_COL}) "
          f"bwd=({t.GATED_MLP_BWD_ROW},{t.GATED_MLP_BWD_COL}) "
          f"auto_max_embd={t.GATED_MLP_AUTO_MAX_EMBD}", file=sys.stderr)
EOF
)

if [ "${NCHIPS}" -lt 2 ]; then
  echo "scale_run: need >=2 TPU chips, found ${NCHIPS}." >&2
  echo "This container tunnels a single v5e chip; run this script on a" >&2
  echo "v5p-8 (or any multi-chip) host. Per-host batch below assumes 8" >&2
  echo "chips at the single-chip operating point (12 imgs/chip)." >&2
  exit 2
fi

OUT="out/scale_nvitl_dp${NCHIPS}"
echo "scale_run: nViT-L/16 dp${NCHIPS} (fsdp on by default: ZeRO-sharded params+moments free ~4.3 GB/chip at this scale), batch $((12 * NCHIPS)), ${ITERS} iters -> ${OUT}"

# every knob is an overridable default so the same launch path can be
# smoke-tested with a small model (e.g. tests on the virtual CPU mesh)
NVIT_MODEL__N_LAYER="${NVIT_MODEL__N_LAYER:-24}" \
NVIT_MODEL__N_HEAD="${NVIT_MODEL__N_HEAD:-16}" \
NVIT_MODEL__N_EMBD="${NVIT_MODEL__N_EMBD:-1024}" \
NVIT_MODEL__IMAGE_SIZE="${NVIT_MODEL__IMAGE_SIZE:-224}" \
NVIT_MODEL__NUM_CLASSES="${NVIT_MODEL__NUM_CLASSES:-1000}" \
NVIT_MODEL__LOCAL_PATCH_SIZE="${NVIT_MODEL__LOCAL_PATCH_SIZE:-8}" \
NVIT_MODEL__GLOBAL_PATCH_SIZE="${NVIT_MODEL__GLOBAL_PATCH_SIZE:-16}" \
NVIT_MODEL__USE_NVIT=true NVIT_MODEL__USE_KOHONEN=false \
NVIT_MODEL__FLASH_ATTN="${NVIT_MODEL__FLASH_ATTN:-true}" \
NVIT_MODEL__BIAS=false \
NVIT_TRAINING__BATCH_SIZE="${NVIT_TRAINING__BATCH_SIZE:-$((12 * NCHIPS))}" \
NVIT_TRAINING__MAX_ITERS="${ITERS}" \
NVIT_TRAINING__EVAL_INTERVAL=100 NVIT_TRAINING__LOG_INTERVAL=10 \
NVIT_TRAINING__EVAL_ITERS=8 \
NVIT_SYSTEM__USE_DDP=true NVIT_SYSTEM__USE_TQDM=false \
NVIT_SYSTEM__REMAT=false \
NVIT_SYSTEM__FSDP="${NVIT_SYSTEM__FSDP:-true}" \
NVIT_SYSTEM__MODEL_PARALLEL="${NVIT_SYSTEM__MODEL_PARALLEL:-1}" \
NVIT_DATA__DATASET="${NVIT_DATA__DATASET:-synthetic}" \
NVIT_DATA__OUT_DIR="${OUT}" \
python -m nvit_tpu

echo "scale_run: done — see ${OUT}/metrics.jsonl (train/batch_time_ms, train/mfu)"
