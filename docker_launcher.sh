#!/bin/bash
# Dockerized training launcher (≙ reference docker_launcher.sh: parses
# flags, loads .env, then launches training inside the container).  On TPU
# there is no per-GPU process spawn — one container process drives all local
# chips via SPMD — so --num-devices is informational and NCCL env becomes
# the JAX coordinator env for multi-host runs.
#
# Usage: ./docker_launcher.sh [--detached] [--hosts N] [--host-id I \
#          --coordinator ADDR:PORT] [extra docker args...]
set -euo pipefail
cd "$(dirname "$0")"

DETACHED=""
HOSTS=1
HOST_ID=0
COORD=""
while [[ $# -gt 0 ]]; do
    case "$1" in
        --detached) DETACHED="-d"; shift ;;
        --hosts) HOSTS="$2"; shift 2 ;;
        --host-id) HOST_ID="$2"; shift 2 ;;
        --coordinator) COORD="$2"; shift 2 ;;
        *) break ;;
    esac
done

# Load .env into the environment (≙ reference lines 5-12)
if [[ -f .env ]]; then
    set -a
    # shellcheck disable=SC1091
    source .env
    set +a
fi

mkdir -p out

MULTIHOST_ENV=()
if [[ "$HOSTS" -gt 1 ]]; then
    [[ -n "$COORD" ]] || { echo "--coordinator required when --hosts > 1" >&2; exit 1; }
    MULTIHOST_ENV=(
        -e NVIT_MULTIHOST=1
        -e "JAX_COORDINATOR_ADDRESS=$COORD"
        -e "JAX_NUM_PROCESSES=$HOSTS"
        -e "JAX_PROCESS_ID=$HOST_ID"
    )
fi

exec docker run --rm $DETACHED \
    --privileged \
    --net=host \
    -v "$PWD:/app" \
    -w /app \
    -e HOME=/app \
    -e JAX_COMPILATION_CACHE_DIR=/app/.jax_cache \
    "${MULTIHOST_ENV[@]}" \
    --env-file <(env | grep '^NVIT_' || true) \
    "$@" \
    nvit-tpu:latest \
    python -m nvit_tpu
