#!/bin/bash
# Local launcher (≙ reference launcher.sh's torchrun invocation — on TPU a
# single process drives every local chip via SPMD, so no per-device process
# spawn or rendezvous endpoint is needed).
#
# Usage: ./launcher.sh [num_hosts]   (num_hosts kept for interface parity;
# multi-host runs execute this same script on each host with
# JAX_COORDINATOR_ADDRESS etc. set — see nvit_tpu/__main__.py)

set -euo pipefail
cd "$(dirname "$0")"
exec python -m nvit_tpu "$@"
