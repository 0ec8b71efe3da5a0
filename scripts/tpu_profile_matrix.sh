#!/bin/bash
# Round-2 on-chip evidence: the 3-profile CIFAR-100-scale matrix trains
# end-to-end on the real chip AFTER the fusion work (fused QK-norm kernels,
# custom-VJP residuals, fused AdamW+renorm, Kohonen diet).
# Short runs: 300 iters, batch 256, synthetic 32px data.
set -x
cd /root/repo
common=(
  NVIT_DATA__DATASET=synthetic NVIT_DATA__DATA_DIR=/tmp/pm_data
  NVIT_MODEL__IMAGE_SIZE=32 NVIT_MODEL__N_LAYER=2 NVIT_MODEL__N_HEAD=2
  NVIT_MODEL__N_EMBD=64 NVIT_MODEL__NUM_CLASSES=100
  NVIT_MODEL__LOCAL_PATCH_SIZE=8 NVIT_MODEL__GLOBAL_PATCH_SIZE=16
  NVIT_MODEL__FLASH_ATTN=true
  NVIT_TRAINING__BATCH_SIZE=256 NVIT_TRAINING__MAX_ITERS=300
  NVIT_TRAINING__EVAL_INTERVAL=150 NVIT_TRAINING__LOG_INTERVAL=50
  NVIT_TRAINING__EVAL_ITERS=4 NVIT_SYSTEM__USE_TQDM=false
  NVIT_SYSTEM__USE_DDP=false NVIT_DATA__AUGMENTATION__ENABLED=false
)
for prof in nvit0_k0 nvit1_k0 nvit1_k1; do
  echo "=== profile $prof ==="
  out="/root/repo/out_pm_$prof"
  rm -rf "$out"
  set -a; . "profiles/$prof.env"; set +a
  env "${common[@]}" NVIT_DATA__OUT_DIR="$out" python -m nvit_tpu
done
echo DONE
