# Open an interactive shell in the training image with the repo mounted
# (≙ reference docker/run.ps1; --privileged exposes TPU chips).
docker run --rm -it `
    --privileged `
    --net=host `
    -v "${PWD}:/app" `
    -w /app `
    nvit-tpu:latest `
    /bin/bash
