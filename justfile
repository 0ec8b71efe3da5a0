#!/usr/bin/env just --justfile
# Task runner (≙ reference justfile surface: train-local / train / run-profiles
# / attach / clean, with optional tmux detach via -d/--detach).

session := env_var_or_default("SESSION", "nvit")

default:
    @just --list

# Train on the local TPU host. Pass -d/--detach to run inside tmux.
train-local *ARGS:
    #!/usr/bin/env bash
    use_tmux=false; args=""
    for arg in {{ARGS}}; do
        if [ "$arg" = "-d" ] || [ "$arg" = "--detach" ]; then use_tmux=true; else args="$args $arg"; fi
    done
    if [ "$use_tmux" = true ]; then
        tmux has-session -t {{session}} 2>/dev/null || tmux new-session -d -s {{session}}
        tmux send-keys -t {{session}} "./launcher.sh $args" Enter
        echo "Training started in tmux session '{{session}}'. Use 'just attach' to view (Ctrl+B, D to detach)."
    else
        ./launcher.sh $args
    fi

# Containerized training (TPU VM image).
docker-build:
    cd docker && ./build.sh

train *ARGS:
    #!/usr/bin/env bash
    use_tmux=false; args=""
    for arg in {{ARGS}}; do
        if [ "$arg" = "-d" ] || [ "$arg" = "--detach" ]; then use_tmux=true; else args="$args $arg"; fi
    done
    cmd="./docker/docker_launcher.sh $args"
    if [ "$use_tmux" = true ]; then
        tmux has-session -t {{session}} 2>/dev/null || tmux new-session -d -s {{session}}
        tmux send-keys -t {{session}} "$cmd" Enter
        echo "Training started in tmux session '{{session}}'. Use 'just attach' to view (Ctrl+B, D to detach)."
    else
        $cmd
    fi

# Run the experiment matrix in profiles/*.env sequentially.
run-profiles *ARGS:
    #!/usr/bin/env bash
    use_tmux=false; args=""
    for arg in {{ARGS}}; do
        if [ "$arg" = "-d" ] || [ "$arg" = "--detach" ]; then use_tmux=true; else args="$args $arg"; fi
    done
    if [ "$use_tmux" = true ]; then
        tmux has-session -t {{session}} 2>/dev/null || tmux new-session -d -s {{session}}
        tmux send-keys -t {{session}} "./run_profiles.sh $args" Enter
        echo "Profile sweep started in tmux session '{{session}}'."
    else
        ./run_profiles.sh $args
    fi

# Smoke-test / visualization CLI (≙ python -m nvit.debug).
debug:
    python -m nvit_tpu.debug

# HTTP serving over a trained checkpoint (beyond-parity surface; pass
# --int8 for w8a8 quantized serving, --export to load a deploy artifact).
serve *ARGS:
    python -m nvit_tpu.serve {{ARGS}}

# Params-only deploy artifact (--dtype bfloat16|float32|int8).
export *ARGS:
    python -m nvit_tpu.ckpt.export {{ARGS}}

# Migrate checkpoints across frameworks: `import --pt ref.pt --dest out/`
# brings a reference torch checkpoint here (resumable); `export --checkpoint
# out --name checkpoint_best --dest back.pt` produces a strict-loadable
# reference-format .pt from a model trained here.
torch-interop *ARGS:
    python -m nvit_tpu.ckpt.torch_interop {{ARGS}}

# Real-dataset accuracy-parity matrix: runs the CIFAR-100 3-profile matrix
# and/or the ImageNet nViT-B/16 run the moment a dataset is staged in ./data
# (zero-egress container: exits 2 with staging instructions if none found).
accuracy-parity:
    ./scripts/accuracy_parity.sh

# Real-data ablation matrix on the BUNDLED digits set (no downloads needed):
# baseline ViT / nViT / nViT+Kohonen, held-out top-1 summary at the end.
digits-matrix:
    ./scripts/digits_matrix.sh

# Head-to-head accuracy parity vs the ACTUAL reference implementation (torch
# CPU) on the bundled digits set: same geometry/split/optimizer/budget, both
# sides without augmentation.  ~1 h CPU; summary table at the end.
reference-parity:
    ./scripts/reference_parity_digits.sh

# The digits flagship profile (nvit1_k1) trained end-to-end on the REAL TPU
# chip — real data through the real compile+train path (chip-lock serialized).
tpu-digits:
    ./scripts/tpu_digits_run.sh

# BASELINE config 5 pre-staged: nViT-L/16 data-parallel on a multi-chip host
# (exits 2 with instructions on this single-chip container).
scale-run *ARGS:
    ./scripts/scale_run.sh {{ARGS}}

test:
    python -m pytest tests/ -x -q

# Fast core tier (~4 min on one core vs ~23 min for the full suite): model/
# kernel/step/config correctness incl. torch golden parity — the subset to
# re-run after every edit; the full suite still gates merges (just ci).
test-fast:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest -q \
        tests/test_core.py tests/test_model.py tests/test_som.py \
        tests/test_train_step.py tests/test_config.py \
        tests/test_flash_attention.py tests/test_gated_mlp.py \
        tests/test_reference_parity.py \
        tests/test_cifar_download.py tests/test_soak_report.py \
        tests/test_grad_histograms.py

# Full CI gate: hermetic CPU suite + the single-chip jit compile check +
# the 8-device virtual-mesh dryrun of the multi-chip train step.
ci:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -m pytest tests/ -q
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -c "import jax; jax.config.update('jax_platforms','cpu'); import __graft_entry__ as g; fn, a = g.entry(); jax.jit(fn)(*a); print('entry OK')"
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

bench *ARGS:
    python bench.py {{ARGS}}

# Full on-chip evidence queue (real TPU): shard_map smoke, kernel parity,
# bench, int8 serving bench, AOT artifact smoke — sequential, tunnel-probing.
tpu-evidence *ARGS:
    bash scripts/tpu_evidence.sh {{ARGS}}

# All-features endurance soak (no TPU needed): dp4×tp2 + FSDP + SOM +
# shard_mapped flash kernels trained across relaunches on the 8-device
# virtual CPU mesh; summary in <outdir>/soak_summary.json.
cpu-mesh-soak *ARGS:
    bash scripts/cpu_mesh_soak.sh {{ARGS}}

clean:
    rm -rf .cache .pytest_cache .jax_cache
    find . -type d -name "__pycache__" -exec rm -rf {} +
    find . -type f -name "*.pyc" -delete

attach:
    tmux attach -t {{session}}
