#!/bin/sh
# ≙ reference docker/entrypoint.sh: install the mounted project (editable)
# for development containers, then exec the passed command.
set -xeu

if [ -f /app/requirements.txt ]; then
    pip install --no-deps --user --root-user-action ignore -r /app/requirements.txt || true
fi

exec "$@"
