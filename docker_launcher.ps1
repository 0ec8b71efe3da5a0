# Dockerized training launcher, PowerShell variant (≙ reference
# docker_launcher.ps1).  TPU flavor: one container process drives all local
# chips via SPMD; multi-host uses the JAX coordinator env instead of NCCL.
param(
    [int]$hosts = 1,
    [int]$host_id = 0,
    [string]$coordinator = "",
    [switch]$detached = $false
)

# Load environment variables from .env file if it exists (≙ reference)
if (Test-Path .env) {
    Get-Content .env | ForEach-Object {
        if ($_ -match '^([^=#]+)=(.*)$') {
            [Environment]::SetEnvironmentVariable($matches[1].Trim(), $matches[2].Trim())
        }
    }
}

New-Item -ItemType Directory -Force -Path "out" | Out-Null

$docker_cmd = "docker run --rm"
if ($detached) { $docker_cmd = "$docker_cmd -d" }

$multihost = ""
if ($hosts -gt 1) {
    if (-not $coordinator) { throw "-coordinator required when -hosts > 1" }
    $multihost = "-e NVIT_MULTIHOST=1 -e JAX_COORDINATOR_ADDRESS=$coordinator " +
                 "-e JAX_NUM_PROCESSES=$hosts -e JAX_PROCESS_ID=$host_id"
}

Invoke-Expression "$docker_cmd ``
    --privileged ``
    --net=host ``
    -v ${PWD}:/app ``
    -w /app ``
    -e HOME=/app ``
    -e JAX_COMPILATION_CACHE_DIR=/app/.jax_cache ``
    $multihost ``
    nvit-tpu:latest ``
    python -m nvit_tpu"
