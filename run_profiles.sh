#!/bin/bash
# Sequential sweep over profiles/*.env (≙ reference run_profiles.sh:8-53):
# each profile's NVIT_* overrides are merged with the root .env (profile wins)
# and a fresh training run is launched; runs are sequential and isolated.

set -euo pipefail
orig_pwd="$PWD"
cd "$(dirname "$0")"

profiles_dir="profiles"
while [[ $# -gt 0 ]]; do
    case $1 in
        --profiles-dir) profiles_dir="$2"; shift 2 ;;
        *) echo "Unknown argument: $1"; exit 1 ;;
    esac
done

# resolve a relative --profiles-dir against the caller's cwd, falling back to
# the repo's own profiles/ when absent there
case "$profiles_dir" in
    /*) ;;
    *) [ -d "$orig_pwd/$profiles_dir" ] && profiles_dir="$orig_pwd/$profiles_dir" ;;
esac

shopt -s nullglob
env_files=("$profiles_dir"/*.env)
if [ ${#env_files[@]} -eq 0 ]; then
    echo "No profile .env files found in $profiles_dir"
    exit 1
fi

for env_file in "${env_files[@]}"; do
    name="$(basename "$env_file" .env)"
    echo "=== Running profile: $name ==="
    (
        set -a
        [ -f .env ] && . ./.env
        . "$env_file"
        set +a
        # per-profile output dir (relative to the caller's cwd) so sweeps
        # don't clobber each other
        export NVIT_DATA__OUT_DIR="${NVIT_DATA__OUT_DIR:-$orig_pwd/out/$name}"
        python -m nvit_tpu
    )
done
