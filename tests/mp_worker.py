"""Worker script for the multi-process SPMD test (tests/test_multiprocess.py).

Runs the full Trainer under jax.distributed with N CPU processes
(≙ reference torchrun spawning one process per GPU, launcher.sh:9,
train.py:220-231).  Invoked as:

    python tests/mp_worker.py <rank> <nproc> <port> <outdir> [mode]

mode = "train" (default) runs 4 iters and exits; "orbax" trains with the
orbax checkpoint backend (a COLLECTIVE multi-host save — every process
writes its addressable shards), then resumes from it in-process and trains
2 more iters (VERDICT r2 next #2); "fsdp" trains with system.fsdp over the
cross-process mesh while CONFIGURED for npz — the trainer must auto-select
orbax (npz cannot gather non-addressable FSDP shards), keep the ZeRO layout
(asserted per-device), save collectively, and resume; "flash" forces the Pallas-kernel
dispatch (flash_attn=true, _on_tpu monkeypatched, kernels run under the
generic interpreter) so the shard_map kernel wrap (parallel/spmd.py) is
exercised over a mesh that SPANS PROCESS BOUNDARIES — each process
executes its addressable shards of the shard_mapped kernels.

The parent sets JAX_PLATFORMS=cpu / PALLAS_AXON_POOL_IPS= /
XLA_FLAGS=--xla_force_host_platform_device_count=K in the environment.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    rank, nproc, port, outdir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
    mode = sys.argv[5] if len(sys.argv) > 5 else "train"
    if nproc > 1:
        jax.distributed.initialize(f"localhost:{port}", num_processes=nproc, process_id=rank)

    if mode == "flash":
        # force the kernel dispatch on CPU under the generic interpreter
        # (rationale in tests/kernel_force.py); the whole worker lifetime
        # runs patched, so enter without a with-block
        from tests.kernel_force import force_on_tpu, generic_interpret_mode

        force_on_tpu().__enter__()
        generic_interpret_mode().__enter__()

    import dataclasses

    from nvit_tpu.configs.schema import (
        AugmentationConfig, Config, DataConfig, OptimizerConfig,
        SystemConfig, TrainingConfig, ViTConfig,
    )
    from nvit_tpu.train.trainer import Trainer

    cfg = Config(
        model=ViTConfig(
            image_size=16, n_layer=1, n_head=2, n_embd=32, num_classes=10,
            local_patch_size=4, global_patch_size=8, use_nvit=True,
            use_kohonen=True, kohonen_nodes=18, bias=True,
            flash_attn=(mode == "flash"),
        ),
        training=TrainingConfig(
            batch_size=16, max_iters=4, max_iters_per_launch=100,
            eval_interval=1000, log_interval=2, eval_iters=1,
        ),
        optimizer=OptimizerConfig(learning_rate=1e-3, warmup_iters=2, lr_decay_iters=100),
        system=SystemConfig(
            use_ddp=True, use_tqdm=False, dtype="float32", use_amp=False,
            fsdp=(mode == "fsdp"),
        ),
        data=DataConfig(
            out_dir=outdir, dataset="synthetic", data_dir=outdir + "/data",
            # "fsdp" deliberately configures npz: the trainer must auto-select
            # orbax (npz cannot gather non-addressable cross-host shards)
            checkpoint_backend="orbax" if mode == "orbax" else "npz",
            augmentation=AugmentationConfig(enabled=False),
        ),
    )
    t = Trainer(config=cfg)
    assert jax.process_count() == nproc, (jax.process_count(), nproc)
    if mode == "fsdp":
        assert t.cfg.data.checkpoint_backend == "orbax", t.cfg.data.checkpoint_backend
    t.train()
    assert t.iter_num == 4, t.iter_num
    if mode == "fsdp":
        # ZeRO layout held through training: this process's addressable shard
        # of a trunk weight is 1/(total devices) of the columns
        w = t.state.params["blocks"][0]["c_fc"]["w"]
        got = w.addressable_shards[0].data.shape[1]
        want = w.shape[1] // jax.device_count()
        assert got == want, (got, want, w.sharding)
        mu = t.state.opt_state.mu["blocks"][0]["c_fc"]["w"]
        assert mu.addressable_shards[0].data.shape[1] == want, mu.sharding
        print(f"RANK{rank}_FSDP_SHARDED", flush=True)
    print(f"RANK{rank}_DONE iter={t.iter_num}", flush=True)

    if mode in ("orbax", "fsdp"):
        # every process resumes from the collectively-written orbax checkpoint
        cfg2 = dataclasses.replace(
            cfg,
            training=dataclasses.replace(cfg.training, init_from="resume", max_iters=6),
            data=dataclasses.replace(cfg.data, checkpoint_dir=outdir),
        )
        t2 = Trainer(config=cfg2)
        assert t2.iter_num == 4, t2.iter_num
        t2.train()
        assert t2.iter_num == 6, t2.iter_num
        print(f"RANK{rank}_ORBAX_RESUMED iter={t2.iter_num}", flush=True)

    if nproc > 1:
        # absorb inter-rank drift (CPU-contended CI: the two workers share
        # cores and can finish minutes apart) at a long-timeout collective
        # exit barrier so both ranks tear down together; NOTE it uses the
        # coordination service's DEFAULT barrier timeout (sync_global_devices
        # takes none) — if ranks drift past that on a loaded host, the fast
        # rank raises a barrier timeout and the test fails loudly rather
        # than hanging
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("mp_worker_exit")


if __name__ == "__main__":
    main()
