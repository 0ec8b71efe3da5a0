#!/bin/bash
# Containerized launcher (≙ reference docker_launcher.sh): parses the same
# flags, mounts data/out, passes NVIT_* env through, runs with TPU devices.
set -euo pipefail
cd "$(dirname "$0")/.."

remove_container="--rm"
extra_env=()
while [[ $# -gt 0 ]]; do
    case $1 in
        --no-rm) remove_container=""; shift ;;
        --env) extra_env+=("-e" "$2"); shift 2 ;;
        *) echo "Unknown argument: $1"; exit 1 ;;
    esac
done

docker run $remove_container --privileged \
    -v "$PWD/data:/app/data" -v "$PWD/out:/app/out" \
    --env-file <(env | grep '^NVIT_' || true) "${extra_env[@]}" \
    nvit-tpu:latest
