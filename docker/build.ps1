# Build the Docker image from the parent directory context
# (≙ reference docker/build.ps1; the TPU base needs no CUDA build context).
$SCRIPT_DIR = Split-Path -Parent $MyInvocation.MyCommand.Path
$env:DOCKER_BUILDKIT = 1
docker build -f "$SCRIPT_DIR/Dockerfile" -t nvit-tpu:latest "$SCRIPT_DIR/.."
