#!/bin/bash
# Open an interactive shell in the training image with the repo mounted
# (≙ reference docker/run.sh/run.ps1; --privileged exposes the TPU chips
# instead of --gpus all).
set -euo pipefail
cd "$(dirname "$0")/.."
exec docker run --rm -it \
    --privileged \
    --net=host \
    -v "$PWD:/app" \
    -w /app \
    nvit-tpu:latest \
    /bin/bash
