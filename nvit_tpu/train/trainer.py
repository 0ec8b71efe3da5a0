"""Trainer: the host-side orchestration loop.

≙ reference train.py `Trainer` (SURVEY.md §2 #12-#23): config load, output
folder, logging, distributed setup, model/optimizer init (scratch or resume),
training loop with eval/checkpoint/early-stop/stat-file/relaunch protocol,
validation-only mode, signal-safe cleanup, and observability.

TPU-native differences (SURVEY.md §7):
* no process groups, barriers or ``no_sync`` — distributed setup is a device
  mesh; the jitted step is SPMD (parallel/mesh.py);
* no GradScaler — bf16 needs no loss scaling;
* all hot-loop state lives in the jitted TrainState; the Python loop only
  feeds batches, logs, evaluates and checkpoints;
* the per-iteration seed gymnastics (train.py:867-871) become deterministic
  key derivation: augmentation key = fold_in(state.rng, step).
"""

from __future__ import annotations

import dataclasses
import signal
import sys
import time
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from nvit_tpu.configs.loader import load_config
from nvit_tpu.configs.schema import Config
from nvit_tpu.ckpt.checkpoint import (
    restore_for_resume,
    save_checkpoint,
    save_checkpoint_async,
)
from nvit_tpu.data.augment import preprocess
from nvit_tpu.data.datasets import load_dataset
from nvit_tpu.data.pipeline import device_prefetch, make_epoch_iterator
from nvit_tpu.models.blocks import SQK_INIT_VALUE
from nvit_tpu.models.schedules import cosine_lr
from nvit_tpu.models.vit import estimate_flops_per_iter, num_params
from nvit_tpu.obs.metrics import (
    MetricsWriter,
    StepTimer,
    memory_stats,
    setup_logging,
    write_stat_line,
)
from nvit_tpu.parallel.mesh import batch_spec, make_mesh, shard_opt_state, shard_params
from nvit_tpu.train.state import TrainState, create_train_state
from nvit_tpu.train.step import make_eval_step, make_train_step


class Trainer:
    def __init__(self, config: Config | None = None, settings_file: str | None = "settings.yaml"):
        self.cfg = config if config is not None else load_config(settings_file)
        cfg = self.cfg

        self.out_dir = Path(cfg.data.out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)  # ≙ prep_folder
        self.logger = setup_logging(
            self.out_dir, level=cfg.system.log_level,
            # file sink is master-only (≙ train.py:138-151) — two processes
            # appending to one training.log interleave corruptly
            to_file=cfg.system.log_to_file and jax.process_index() == 0,
        )

        from nvit_tpu.obs.profiling import apply_debug_flags

        apply_debug_flags(debug_nans=cfg.system.debug_nans, disable_jit=not cfg.system.jit)

        if cfg.system.compilation_cache_dir:
            # persistent XLA compile cache: flagship programs cost minutes of
            # (remote) TPU compile, and the time_limit_seconds relaunch
            # protocol re-pays it every launch without this (schema.py).
            try:
                cache = Path(cfg.system.compilation_cache_dir).expanduser()
                if not cache.is_absolute():
                    # anchor relative defaults (".jax_cache") to the repo
                    # root, not the CWD — launching from elsewhere would
                    # silently create a stray cache and re-pay the 4-8 min
                    # remote compile the knob exists to avoid (ADVICE r4)
                    cache = Path(__file__).resolve().parents[2] / cache
                jax.config.update("jax_compilation_cache_dir", str(cache))
            except Exception as e:  # never let cache plumbing kill a run
                self.logger.warning("compilation cache unavailable: %s", e)

        # --- distributed setup (≙ setup_distributed, train.py:197-243) ------
        self.mesh = None
        if cfg.system.use_ddp and jax.device_count() > 1:
            self.mesh = make_mesh(model_parallel=cfg.system.model_parallel)
            self.logger.info(
                "SPMD mesh initialized: %s devices (data=%d, model=%d%s)",
                jax.device_count(), self.mesh.shape["data"], self.mesh.shape["model"],
                ", fsdp" if cfg.system.fsdp else "",
            )
        if self.mesh is None and cfg.system.model_parallel > 1:
            raise ValueError(
                f"model_parallel={cfg.system.model_parallel} requires a multi-device "
                f"mesh ({jax.device_count()} device(s) visible, use_ddp="
                f"{cfg.system.use_ddp})"
            )
        if self.mesh is None and cfg.system.fsdp:
            # not an error (fsdp on one device is a no-op, and configs are
            # shared across host sizes) — but the user enabled it for memory
            # savings they will NOT get, so say so loudly
            self.logger.warning(
                "system.fsdp requested but no multi-device mesh formed "
                "(%d device(s), use_ddp=%s) — training with fully replicated "
                "params/moments", jax.device_count(), cfg.system.use_ddp,
            )
        self.batch_sharding = (
            jax.sharding.NamedSharding(self.mesh, batch_spec()) if self.mesh is not None else None
        )

        if cfg.data.checkpoint_backend not in ("npz", "orbax"):
            raise ValueError(
                f"checkpoint_backend must be 'npz' or 'orbax', got {cfg.data.checkpoint_backend!r}"
            )
        # npz snapshots require fully-addressable arrays (jax.device_get of the
        # whole state on the master); with the model axis sharded ACROSS HOSTS
        # that fetch raises at the first save.  Auto-select orbax — it writes
        # each host's addressable shards — or fail up front with a clear error
        # instead of at iteration eval_interval.  (≙ reference checkpoint
        # contract train.py:629-709; VERDICT r2 weak #3.)
        if (
            cfg.data.checkpoint_backend == "npz"
            and jax.process_count() > 1
            and self.mesh is not None
            and (self.mesh.shape["model"] > 1 or cfg.system.fsdp)
        ):
            try:
                import orbax.checkpoint  # noqa: F401
            except ImportError as e:
                raise ValueError(
                    "checkpoint_backend='npz' cannot save model-parallel/FSDP state "
                    "that spans hosts (arrays are not fully addressable); set "
                    "data.checkpoint_backend='orbax' (orbax-checkpoint not importable)"
                ) from e
            self.logger.warning(
                "multi-host model-parallel/FSDP run: npz checkpoints cannot gather "
                "non-addressable shards — auto-selecting the orbax backend"
            )
            cfg = dataclasses.replace(
                cfg, data=dataclasses.replace(cfg.data, checkpoint_backend="orbax")
            )
            self.cfg = cfg

        # multi-host SPMD: process 0 is the master for checkpoint/metric IO
        # (≙ reference master_process = rank==0, train.py:227-228); every
        # process loads a strided 1/P shard of each global batch
        self.is_master = jax.process_index() == 0
        nproc = jax.process_count()
        if nproc > 1 and cfg.training.batch_size % nproc != 0:
            raise ValueError(
                f"batch_size={cfg.training.batch_size} not divisible by "
                f"process count {nproc}"
            )

        # batch divisibility up front (≙ reference's grad-accum assertion,
        # train.py:238) — clear errors instead of cryptic XLA reshape failures
        accum = max(1, cfg.training.gradient_accumulation_steps)
        if cfg.training.batch_size % accum != 0:
            raise ValueError(
                f"batch_size={cfg.training.batch_size} not divisible by "
                f"gradient_accumulation_steps={accum}"
            )
        if self.mesh is not None:
            data_shards = self.mesh.shape["data"]
            micro = cfg.training.batch_size // accum
            if micro % data_shards != 0:
                raise ValueError(
                    f"per-micro-batch size {micro} (batch_size/grad_accum) not divisible "
                    f"by the mesh data axis ({data_shards} shards)"
                )

        # --- model/optimizer init (≙ initialize_model, train.py:395-459) ----
        self.iter_num = 0
        self.finished = False
        self._time_up = False
        self.best_val_loss: float | None = None
        self.early_stopping_counter = 0
        self._eval_count = 0
        self._abnormal_exit = False  # gates the final COLLECTIVE save (see cleanup)
        self.last_metrics: dict[str, float] = {}

        init_from = cfg.training.init_from
        if init_from == "scratch":
            self.state = create_train_state(cfg)
        elif init_from in ("resume", "wandb"):
            if init_from == "wandb":
                ckpt_dir, name = self._download_wandb_artifact(cfg.wandb.artifact_name)
            else:
                ckpt_dir = cfg.data.checkpoint_dir
                name = cfg.data.checkpoint_file.removesuffix(".npz")
            state, saved_cfg, meta = restore_for_resume(ckpt_dir, name)
            # current run settings win for training/optimizer; the MODEL comes
            # from the checkpoint (≙ reference model_args reconstruction,
            # train.py:378-379: the model is rebuilt from stored model_args)
            if saved_cfg.model != cfg.model:
                self.logger.warning("checkpoint model config differs from settings; using checkpoint's")
                cfg = dataclasses.replace(cfg, model=saved_cfg.model)
                self.cfg = cfg
            self.state = state
            self.iter_num = meta["iter_num"]
            # continue the early-stop/best-checkpoint protocol across launches:
            # without this every relaunch "improves" on best=None at its first
            # eval (overwriting checkpoint_best with a possibly-worse model) and
            # resets patience so a launch-bounded run can never early-stop
            # (≙ reference best_val_loss persisted at train.py:650, 711-726)
            tmeta = meta.get("trainer") or {}
            if tmeta.get("best_val_loss") is not None:
                self.best_val_loss = float(tmeta["best_val_loss"])
            self.early_stopping_counter = int(tmeta.get("early_stopping_counter", 0))
            # the full_eval_interval cadence phase must survive relaunches too:
            # with max_iters_per_launch < full_eval_interval·eval_interval a
            # reset counter would mean the full val pass NEVER fires
            self._eval_count = int(tmeta.get("eval_count", 0))
            self.logger.info(
                "Resumed from iteration %d (best_val_loss=%s, patience=%d)",
                self.iter_num, self.best_val_loss, self.early_stopping_counter,
            )
        else:
            raise ValueError(f"Invalid init_from value: {init_from}")

        if self.mesh is not None:
            self.state = self.state._replace(
                params=shard_params(
                    self.state.params, self.mesh, cfg.model.use_nvit,
                    fsdp=cfg.system.fsdp,
                ),
                # moments follow the param layout (ZeRO under fsdp; explicit
                # placement instead of propagation-chosen either way)
                opt_state=shard_opt_state(
                    self.state.opt_state, self.mesh, cfg.model.use_nvit,
                    fsdp=cfg.system.fsdp,
                ),
            )

        # jitted steps (≙ torch.compile; jit=False is the debug escape hatch).
        # Two train-step programs when log_gpu_stats: the hot one omits the
        # in-step grad/param norm reductions (~1 GB of fp32 tree reads on an
        # HBM-bound step); the norms variant runs only on iterations whose
        # metrics are actually logged, so the default config keeps the
        # per-component norms without paying for them every step
        step_plain = make_train_step(cfg, log_norms=False, mesh=self.mesh)
        step_norms = (
            make_train_step(cfg, log_norms=True, mesh=self.mesh)
            if cfg.system.log_gpu_stats
            else step_plain
        )
        # third variant, eval-cadence only: + per-tensor grad histograms
        # (≙ wandb.watch(gradients), train.py:531-546; obs/grad_hist.py)
        step_hist = (
            make_train_step(cfg, log_norms=cfg.system.log_gpu_stats, mesh=self.mesh,
                            log_histograms=True)
            if cfg.system.log_grad_histograms
            else None
        )
        self._eval_step = make_eval_step(cfg, mesh=self.mesh)
        if cfg.system.jit:
            jit_plain = jax.jit(step_plain, donate_argnums=0)
            jit_norms = (
                jax.jit(step_norms, donate_argnums=0) if step_norms is not step_plain else jit_plain
            )
            self._train_step, self._train_step_norms = jit_plain, jit_norms
            self._train_step_hist = (
                jax.jit(step_hist, donate_argnums=0) if step_hist is not None else None
            )
            self._eval_step = jax.jit(self._eval_step)
        else:
            self._train_step, self._train_step_norms = step_plain, step_norms
            self._train_step_hist = step_hist
        self._pending_grad_hists: dict | None = None

        self.metrics_writer: MetricsWriter | None = None
        self._pending_saves: list = []
        self._in_step = False  # True while the donating train step is on the stack
        self._deferred_signal: int | None = None
        self._cleaned = False  # cleanup() idempotence (signal paths enter twice)
        self._skip_final_save = False  # second signal mid-step: state is donated
        self._install_signal_handlers()

        n = num_params(self.state.params)
        self.logger.info("Model: %.2fM params | nvit=%s kohonen=%s | %s", n / 1e6,
                         cfg.model.use_nvit, cfg.model.use_kohonen, cfg.data.dataset)
        if cfg.system.quick_validation and cfg.training.full_eval_interval == 0:
            # the reference's evaluate() always runs the full val pass
            # (train.py:728-766); with quick_validation and no full-eval
            # cadence, best-checkpoint selection and early stopping only ever
            # see a quick_validation_size-capped subset — allowed, but loud.
            self.logger.warning(
                "quick_validation is on with full_eval_interval=0: every eval "
                "(incl. best-checkpoint selection) runs on a %d-example subset; "
                "set training.full_eval_interval=N to run the full val pass "
                "every Nth eval", cfg.system.quick_validation_size,
            )
        self._flops_per_iter = estimate_flops_per_iter(cfg.model, n) * cfg.training.batch_size

    def _download_wandb_artifact(self, artifact_name: str) -> tuple[str, str]:
        """init_from="wandb": download the checkpoint artifact and return its
        (dir, checkpoint-name).  ≙ reference load_from_wandb (train.py:360-373)
        — which also required online wandb; here the import itself is gated."""
        if self.cfg.wandb.mode != "online":
            raise ValueError("Wandb must be enabled and online to load from artifacts")
        try:
            import wandb  # type: ignore
        except ImportError as e:
            raise ValueError("init_from='wandb' requires the wandb package") from e
        artifact = wandb.Api().artifact(artifact_name, type="model")
        artifact_dir = artifact.download()
        if not (Path(artifact_dir) / "checkpoint_best.npz").exists():
            raise FileNotFoundError(f"Checkpoint not found in artifact: {artifact_dir}")
        return artifact_dir, "checkpoint_best"

    # ------------------------------------------------------------------ data
    def _load_data(self):
        cfg = self.cfg
        # download is master-only (≙ reference download=master_process,
        # train.py:283-301); other hosts wait for the shared-FS extract
        if cfg.data.download and cfg.data.dataset in ("cifar10", "cifar100") and not self.is_master:
            from nvit_tpu.data.datasets import wait_for_cifar

            wait_for_cifar(cfg.data.data_dir, cfg.data.dataset)
        self.trainset = load_dataset(
            cfg.data.dataset, cfg.data.data_dir, train=True,
            image_size=cfg.model.image_size, num_classes=cfg.model.num_classes,
            download=cfg.data.download and self.is_master,
        )
        self.valset = load_dataset(
            cfg.data.dataset, cfg.data.data_dir, train=False,
            image_size=cfg.model.image_size, num_classes=cfg.model.num_classes,
            download=cfg.data.download and self.is_master,
        )
        self.steps_per_epoch = max(1, len(self.trainset) // cfg.training.batch_size)

    def _epoch_iter(self, ds, *, epoch: int, shuffle: bool, drop_last: bool = True,
                    start_batch: int = 0):
        nproc = jax.process_count()
        it = make_epoch_iterator(
            # multi-host: each process loads a strided 1/P shard of each
            # GLOBAL batch (≙ DistributedSampler rank/num_replicas,
            # train.py:310-320); device_prefetch assembles the global array
            ds, batch_size=self.cfg.training.batch_size // nproc, epoch=epoch,
            seed=self.cfg.training.seed, shuffle=shuffle,
            # ragged last batches would desync hosts → always drop under SPMD
            drop_last=drop_last or nproc > 1,
            num_workers=self.cfg.data.num_workers,
            shard_index=jax.process_index(), shard_count=nproc,
            start_batch=start_batch,
        )
        return device_prefetch(it, size=self.cfg.data.prefetch, sharding=self.batch_sharding)

    def _stat_params(self) -> dict:
        """Host copy of ONLY the scale leaves ``hparams_str`` reads (sz +
        per-block sqk/alphas/suv — a few KB), NOT the full params tree: a
        full ``device_get`` per stat line is ~0.35-1.6 GB of dead transfer."""
        if not self.cfg.model.use_nvit:
            return {}
        p = self.state.params
        sub = {
            "sz": p["sz"],
            "blocks": [
                {k: bp[k] for k in ("sqk", "attn_alpha", "mlp_alpha", "suv")}
                for bp in p["blocks"]
            ],
        }
        return jax.device_get(sub)

    def _sqk_drift_metrics(self) -> dict[str, float]:
        """Learned-sqk drift watch (round 4).  sqk is stored pre-scaled by
        base_scale, so AdamW moves its EFFECTIVE value 1/base_scale ≈ 32×
        faster than other params — the flagship soak measured sqk_eff past
        2.3 within 200 iters of the LR peak.  ``scales/attn_bound`` =
        softmax_scale·max(sqk_eff²) is the bounded-softmax stabilizer's
        shift; since the round-4 underflow clamp it can no longer NaN, but
        a row whose max score trails the bound by >60 degrades to uniform
        attention — surface the drift at every eval so it is visible long
        before that.  One scalar fetch (the max folds on device)."""
        if not self.cfg.model.use_nvit:
            return {}
        p = self.state.params
        leaves = [bp["sqk"] for bp in p["blocks"]]
        if isinstance(p.get("cross_attention"), dict) and "sqk" in p["cross_attention"]:
            leaves.append(p["cross_attention"]["sqk"])
        m = self.cfg.model
        eff_max = float(
            jnp.max(jnp.stack([jnp.max(jnp.abs(x)) for x in leaves]))
        ) * (SQK_INIT_VALUE / m.base_scale)
        bound = float(np.sqrt(m.n_embd // m.n_head)) * eff_max * eff_max
        # only the static "bounded" stabilizer degrades under drift —
        # "rowmax" (the round-5 default) is exact at any drift and "auto"
        # self-routes to rowmax past the gate (BASELINE.md r5 reconciliation)
        if (
            bound > 40.0
            and m.bounded_softmax == "bounded"
            and not getattr(self, "_sqk_drift_warned", False)
        ):
            self._sqk_drift_warned = True
            self.logger.warning(
                "sqk_eff drifted to %.2f (bounded-softmax shift %.1f): rows "
                "whose max score trails it by >60 degrade to uniform "
                "attention; switch model.bounded_softmax=rowmax", eff_max, bound,
            )
        return {"scales/sqk_eff_max": eff_max, "scales/attn_bound": bound}

    def _time_limit_reached(self, tlaunch: float) -> bool:
        """Launch-time-limit predicate, safe under multi-host SPMD.

        The wall clock is PER-HOST state: if every host consulted its own
        ``time.time()``, clocks milliseconds apart would make hosts exit the
        lockstep train loop at different iterations — the surviving hosts'
        next gradient all-reduce (or the leavers' collective orbax save)
        would then hang forever.  Multi-host runs therefore take host 0's
        verdict, refreshed via a broadcast at a LOCKSTEP program point
        (every log_interval-th iteration — iteration counts are identical
        on all hosts, so every host executes the same collective sequence).
        Single-host keeps the reference's exact per-iteration check
        (≙ train.py:857-862)."""
        limit = self.cfg.training.time_limit_seconds
        if self._time_up:
            return True
        if jax.process_count() <= 1:
            self._time_up = time.time() - tlaunch >= limit
        elif self.iter_num % self.cfg.training.log_interval == 0:
            from jax.experimental import multihost_utils

            self._time_up = bool(
                multihost_utils.broadcast_one_to_all(
                    np.int32(time.time() - tlaunch >= limit)
                )
            )
        return self._time_up

    def _preprocess(self, imgs_u8, *, train: bool, step: int | None = None):
        step = self.iter_num if step is None else step
        key = jax.random.fold_in(self.state.rng, step) if train else None
        return preprocess(
            imgs_u8, key, train=train, dataset=self.cfg.data.dataset,
            auto_augment=self.cfg.data.augmentation.enabled and self.cfg.data.augmentation.auto_augment,
        )

    # ----------------------------------------------------------------- train
    def train(self) -> None:
        """Main training loop (≙ train.py:805-1023)."""
        cfg = self.cfg
        try:
            tlaunch = time.time()
            self._time_up = False  # see _time_limit_reached
            self._cleaned = False  # re-arm cleanup for this launch
            self._load_data()
            # drop_last means a trainset smaller than one global batch yields
            # ZERO batches per epoch: the loop would spin forever while
            # `epoch` advances (and the mid-epoch start_batch arithmetic
            # would go negative) — reject the config up front
            nproc = jax.process_count()
            if len(self.trainset) // nproc < cfg.training.batch_size // nproc:
                raise ValueError(
                    f"training dataset ({len(self.trainset)} examples) is smaller "
                    f"than one batch ({cfg.training.batch_size}) — every epoch "
                    f"would yield zero batches (drop_last)"
                )
            if self.is_master:  # metric sinks are master-only (≙ train.py:817)
                self.metrics_writer = MetricsWriter(
                    self.out_dir, wandb_mode=cfg.wandb.mode, run_name=cfg.wandb.run_name,
                    project=cfg.wandb.project, config=cfg.to_dict(),
                )
            sentinel = self.out_dir / "finished"
            if sentinel.exists() and cfg.training.init_from == "resume":
                # "max_iters:N" sentinels are clearable: resuming with a
                # RAISED max_iters is a deliberate run extension.  Early-stop
                # sentinels are final (patience was exhausted).  The decision
                # is a pure function of (sentinel text, cfg) so every host
                # reaches it identically; only the master unlinks — and a
                # peer whose read races that unlink (shared filesystem)
                # treats it as already-cleared, which IS the master's verdict.
                try:
                    text = sentinel.read_text().strip()
                except FileNotFoundError:
                    text = "max_iters:-1"  # cleared by master: always extend
                done_at = None
                if text.startswith("max_iters:"):
                    try:
                        done_at = int(text.split(":", 1)[1])
                    except ValueError:
                        done_at = None
                if done_at is not None and cfg.training.max_iters > done_at:
                    self.logger.info(
                        "finished sentinel from a completed max_iters=%d run; "
                        "extending to max_iters=%d", done_at, cfg.training.max_iters,
                    )
                    if self.is_master:
                        sentinel.unlink(missing_ok=True)
                else:
                    self.logger.info("finished sentinel present; not relaunching")
                    return

            pbar = None
            if cfg.system.use_tqdm:
                try:
                    from tqdm import tqdm

                    pbar = tqdm(total=cfg.training.max_iters, initial=self.iter_num, desc="Training")
                except ImportError:
                    pass

            if self.iter_num == 0 and cfg.training.init_from == "scratch" and self.is_master:
                write_stat_line(
                    self.out_dir, iter_num=0, lr=0.0, train_loss=0.0, val_loss=0.0,
                    params=self._stat_params(), cfg=cfg, append=False,
                )

            timer = StepTimer(self._flops_per_iter, _chip_peak_flops())
            local_iter = 0
            epoch = self.iter_num // self.steps_per_epoch

            while (
                local_iter < cfg.training.max_iters_per_launch
                and self.iter_num < cfg.training.max_iters
                and not self._time_limit_reached(tlaunch)
                and not self.finished
            ):
                # mid-epoch resume: skip the batches the interrupted launch
                # already trained on, so the batch sequence is a pure
                # function of iter_num across relaunches (the reference
                # replays the epoch from its start on every launch)
                # max(0, …) is defensive: the trainset-size guard above makes
                # per-epoch yields equal steps_per_epoch, so the offset is in
                # [0, steps_per_epoch) — a negative value would turn into
                # wraparound slices in the iterator
                for imgs_u8, labels in self._epoch_iter(
                    self.trainset, epoch=epoch, shuffle=True,
                    start_batch=max(0, self.iter_num - epoch * self.steps_per_epoch),
                ):
                    if (
                        local_iter >= cfg.training.max_iters_per_launch
                        or self.iter_num >= cfg.training.max_iters
                        or self._time_limit_reached(tlaunch)
                        or self.finished
                    ):
                        break

                    if self.iter_num % cfg.training.eval_interval == 0:
                        eval_metrics = self.evaluate()
                        if self.is_master:
                            write_stat_line(
                                self.out_dir,
                                iter_num=self.iter_num,
                                lr=float(cosine_lr(cfg.optimizer, self.iter_num)),
                                train_loss=eval_metrics["train/loss"],
                                val_loss=eval_metrics["val/loss"],
                                params=self._stat_params(),
                                cfg=cfg,
                            )

                    # jax.profiler trace of steps [1, 1+profile_steps) — step 0
                    # is compile (≙ SURVEY §5 tracing row; view in TensorBoard)
                    if cfg.system.profile_steps > 0 and local_iter == 1:
                        jax.profiler.start_trace(str(self.out_dir / "profile"))
                    images = self._preprocess(imgs_u8, train=True)
                    # norms variant only on iterations whose metrics get
                    # logged (this step becomes iter_num+1, the value the
                    # log-interval check below sees)
                    step_fn = (
                        self._train_step_norms
                        if (self.iter_num + 1) % cfg.training.log_interval == 0
                        else self._train_step
                    )
                    # histogram variant on the step feeding an eval (the
                    # evaluate() at the top of the next loop iteration
                    # fetches and logs the stash — one transfer, ~40 KB).
                    # The step reaching max_iters exits the loop before that
                    # eval, so its stash would be dropped — skip the variant.
                    if (
                        self._train_step_hist is not None
                        and (self.iter_num + 1) % cfg.training.eval_interval == 0
                        and (self.iter_num + 1) < cfg.training.max_iters
                    ):
                        step_fn = self._train_step_hist
                    # the step DONATES self.state: a signal handler firing
                    # while the call is on the stack would try to checkpoint
                    # donated (deleted) buffers, so the handler defers to this
                    # boundary (see _install_signal_handlers)
                    self._in_step = True
                    self.state, step_metrics = step_fn(self.state, images, labels)
                    self._in_step = False
                    self.iter_num += 1
                    if step_fn is self._train_step_hist and step_fn is not None:
                        self._pending_grad_hists = {
                            k: v for k, v in step_metrics.items() if k.startswith("gradhist/")
                        }
                    local_iter += 1
                    if self._deferred_signal is not None:
                        self.logger.info(
                            "Handling deferred signal %s at step boundary",
                            self._deferred_signal,
                        )
                        if jax.process_count() > 1:
                            self._abnormal_exit = True
                        self.cleanup()
                        sys.exit(0)
                    if cfg.system.profile_steps > 0 and local_iter == 1 + cfg.system.profile_steps:
                        # host VALUE fetch, not block_until_ready: on the
                        # tunneled backend only a fetch is a true sync point
                        # (CLAUDE.md) — else the trace stops mid-execution
                        float(step_metrics["total_loss"])
                        jax.profiler.stop_trace()

                    if self.iter_num % cfg.training.log_interval == 0:
                        # ONE host transfer for all step metrics (scalar-by-
                        # scalar fetches cost a device round-trip each)
                        step_metrics = jax.device_get(step_metrics)
                        loss = float(step_metrics["total_loss"])  # sync point
                        dt, mfu = timer.tick()
                        dt /= cfg.training.log_interval
                        mfu *= cfg.training.log_interval
                        train_metrics = {
                            "train/iter": self.iter_num,
                            "train/batch_loss": loss,
                            "train/batch_time_ms": dt * 1000,
                            "train/mfu": mfu,
                            "optimizer/learning_rate": float(step_metrics["learning_rate"]),
                            **{f"train/{k}": float(v) for k, v in step_metrics.items()
                               if k.endswith("_loss") or k.endswith("_norm")},
                            **{f"system/{k}": v for k, v in memory_stats(cfg.system.log_memory).items()},
                        }
                        if self.metrics_writer is not None:
                            self.metrics_writer.log(train_metrics, step=self.iter_num)
                        if pbar is None:
                            self.logger.info(
                                "Iter: %d/%d Loss: %.4f LR: %.4e Time: %.1fms",
                                self.iter_num, cfg.training.max_iters, loss,
                                float(step_metrics["learning_rate"]), dt * 1000,
                            )
                    if pbar is not None:
                        pbar.update(1)

                epoch += 1

            # a run that reached max_iters is DONE — write the relaunch
            # sentinel so supervisors stop instead of burning no-op
            # relaunches (the reference only writes it on early stop,
            # train.py:757-760, so its relauncher loops on completed runs
            # until its own cap — PARITY.md).  Time-limit and
            # max_iters_per_launch exits must NOT mark finished.
            if self.iter_num >= cfg.training.max_iters and not self.finished:
                self.logger.info(
                    "Reached max_iters (%d); writing finished sentinel",
                    cfg.training.max_iters,
                )
                self.mark_training_finished(f"max_iters:{cfg.training.max_iters}")

            if pbar is not None:
                pbar.close()
        except Exception as e:
            # mark abnormal BEFORE cleanup: under multi-host orbax a final
            # collective save from one crashed rank would hang at the barrier
            # while the peers are still training (see cleanup())
            self._abnormal_exit = True
            self._handle_error(e)
            raise
        finally:
            self.cleanup()

    # ------------------------------------------------------------------ eval
    def estimate_loss(self) -> dict[str, float]:
        """Mean full weighted loss over eval_iters batches of both splits
        (≙ train.py:482-506).  The train split is measured UNDER the training
        distribution — augmented, like the reference's loader-transformed train
        batches — so the logged train/val gap is meaningful (VERDICT r2 #6)."""
        out = {}
        for split, ds in (("train", self.trainset), ("val", self.valset)):
            losses = []
            # rotate the sampled train batches by step (≙ the reference drawing
            # FRESH loader batches each eval); val stays deterministic
            train = split == "train"
            epoch = self.iter_num if train else 0
            for k, (imgs_u8, labels) in enumerate(
                self._epoch_iter(ds, epoch=epoch, shuffle=train, drop_last=False)
            ):
                if k >= self.cfg.training.eval_iters:
                    break
                # per-batch aug key (fold_in step+k) ≙ fresh loader randomness
                imgs = self._preprocess(imgs_u8, train=train, step=self.iter_num + k)
                m = self._eval_step(self.state.params, imgs, labels)
                losses.append(m["loss"])
            # ONE host transfer for the whole split, not one per batch
            out[split] = float(np.mean(jax.device_get(losses))) if losses else float("nan")
        return out

    def validate(self, *, quick: bool = False) -> dict[str, float]:
        """Full validation pass with top-1/top-5 and per-loss breakdown
        (≙ train.py:577-627).  ``quick=True`` caps the pass at
        ``quick_validation_size`` examples — the reference DEFINED this
        (get_validation_subset, train.py:1182-1200 + settings quick_validation)
        but never wired it in; here the periodic in-training eval uses it."""
        cfg = self.cfg
        max_batches = None
        if quick and cfg.system.quick_validation:
            max_batches = max(1, cfg.system.quick_validation_size // cfg.training.batch_size)
        keep = [("loss", "loss"), ("top1_accuracy", "top1_accuracy"), ("top5_accuracy", "top5_accuracy")]
        if cfg.model.use_kohonen:
            keep += [
                ("kohonen_consistency", "consistency_loss"),
                ("kohonen_smoothness", "smoothness_loss"),
                ("local_quantization", "local_quantization_loss"),
                ("global_quantization", "global_quantization_loss"),
            ]
        collected: list[dict[str, Any]] = []
        for imgs_u8, labels in self._epoch_iter(self.valset, epoch=0, shuffle=False, drop_last=False):
            if max_batches is not None and len(collected) >= max_batches:
                break
            m = self._eval_step(self.state.params, self._preprocess(imgs_u8, train=False), labels)
            collected.append({src: m[src] for src, _ in keep})
        # ONE host transfer for the whole pass (device scalars are tiny; the
        # per-batch float() round-trips were the eval bottleneck)
        if not collected:
            # surface a config error instead of a KeyError at the caller: the
            # per-host val shard can be smaller than the per-host batch (SPMD
            # forces drop_last), yielding an empty pass
            raise ValueError(
                "validation produced zero batches: val set has "
                f"{len(self.valset)} examples for per-host batch "
                f"{self.cfg.training.batch_size // jax.process_count()} "
                f"across {jax.process_count()} host(s) (SPMD drops ragged "
                "batches) — lower batch_size or enlarge the val split"
            )
        collected = jax.device_get(collected)
        n_batches = len(collected)
        metrics = {
            f"val/{dst}": float(sum(b[src] for b in collected)) / n_batches
            for src, dst in keep
        }
        return metrics

    def validate_only(self) -> dict[str, float]:
        """≙ train.py:179-189."""
        self.logger.info("Running in validation-only mode")
        if self.cfg.training.init_from != "resume":
            raise ValueError("Must provide a checkpoint to run validation-only mode")
        self._load_data()
        metrics = self.validate()
        self.logger.info("Validation metrics: %s", metrics)
        return metrics

    def evaluate(self) -> dict[str, float]:
        """Periodic eval: validate + estimate_loss + early-stop + checkpoint
        (≙ train.py:728-766)."""
        cfg = self.cfg
        self._eval_count += 1
        # every Nth eval runs the full un-capped val pass (VERDICT r2 missing
        # #3; ≙ reference full pass each eval, train.py:728-766)
        full = (
            cfg.training.full_eval_interval > 0
            and self._eval_count % cfg.training.full_eval_interval == 0
        )
        val_metrics = self.validate(quick=not full)
        train_loss = self.estimate_loss()["train"]
        metrics = {
            "train/loss": train_loss,
            **val_metrics,
            "optimizer/learning_rate": float(cosine_lr(cfg.optimizer, self.iter_num)),
            "training/global_step": self.iter_num,
            **self._sqk_drift_metrics(),
        }
        if self._pending_grad_hists:
            # stashed by the eval-cadence histogram step variant; ONE host
            # fetch of ~40 KB of int32 counts (≙ wandb.watch cadence without
            # per-step transfers — PARITY.md #22 closed)
            fetched = jax.device_get(self._pending_grad_hists)
            metrics.update({k: np.asarray(v).tolist() for k, v in fetched.items()})
            self._pending_grad_hists = None
        self.last_metrics = dict(metrics)
        if self.metrics_writer is not None:
            self.metrics_writer.log(metrics, step=self.iter_num)

        # strict improvement must be read BEFORE _should_stop_early updates it
        val_loss = metrics["val/loss"]
        improved = self.best_val_loss is None or val_loss < self.best_val_loss
        if self._should_stop_early(val_loss):
            self.logger.info("Early stopping triggered!")
            self.mark_training_finished()

        if self.iter_num > 0:
            if cfg.training.always_save_checkpoint:
                self.save(metrics)
            if improved:
                # best is saved on improvement INDEPENDENT of
                # always_save_checkpoint (≙ train.py:653-665), and ONLY here —
                # never from cleanup/signal paths, so stale post-eval weights
                # cannot overwrite it
                self.save_best(metrics)
        return metrics

    def _should_stop_early(self, val_loss: float) -> bool:
        """≙ train.py:711-726."""
        if self.best_val_loss is None:
            self.best_val_loss = float("inf")
        if val_loss < self.best_val_loss:
            self.best_val_loss = val_loss
            self.early_stopping_counter = 0
        else:
            self.early_stopping_counter += 1
        return self.early_stopping_counter >= self.cfg.training.early_stopping_patience

    # ------------------------------------------------------------ checkpoint
    def _join_pending_saves(self) -> None:
        """Serialize checkpoint writes: a new save to a name must not race the
        previous write of the same file.  Re-raises background write failures
        (disk full, permissions) — otherwise the run would keep logging
        successful saves while the on-disk checkpoint silently goes stale and
        a later relaunch resumes from hours-old state.  (The cleanup path
        catches and logs via its never-raise-during-teardown guard.)"""
        pending, self._pending_saves = getattr(self, "_pending_saves", []), []
        for t in pending:
            t.join()
            box = getattr(t, "error_box", None)
            if box:
                raise RuntimeError(f"async checkpoint write failed: {box[0]}") from box[0]

    def _trainer_meta(self) -> dict[str, Any]:
        """Host-side protocol state persisted in the checkpoint sidecar so
        relaunches resume the early-stop/best-checkpoint protocol (VERDICT r2
        weak #2; ≙ reference best_val_loss in the ckpt dict, train.py:650)."""
        return {
            "best_val_loss": self.best_val_loss,
            "early_stopping_counter": self.early_stopping_counter,
            "eval_count": self._eval_count,
        }

    def _save_one(self, name: str, metrics: dict[str, float] | None) -> None:
        """Dispatch to the configured checkpoint backend (npz async | orbax)."""
        if self.cfg.data.checkpoint_backend == "orbax":
            from nvit_tpu.ckpt.orbax_backend import save_checkpoint_orbax

            save_checkpoint_orbax(
                self.out_dir, name, self.state, self.cfg, metrics, self._trainer_meta()
            )
        else:
            self._pending_saves.append(
                save_checkpoint_async(
                    self.out_dir, name, self.state, self.cfg, metrics, self._trainer_meta()
                )
            )

    def _save_is_collective(self) -> bool:
        """orbax multi-host saves are COLLECTIVE: every process writes its own
        addressable shards, so non-master processes must participate (only the
        json sidecar is master-only, handled inside the backend)."""
        return self.cfg.data.checkpoint_backend == "orbax" and jax.process_count() > 1

    def save(self, metrics: dict[str, float] | None = None) -> None:
        """checkpoint_latest (+ optional numbered) — ≙ train.py:629-654.
        Master-only for npz (≙ train.py:631-633); collective for multi-host
        orbax.  The device snapshot is synchronous (donation safety); the npz
        file write happens on a background thread so the step loop resumes
        immediately (VERDICT round-1 #10)."""
        if not self.is_master and not self._save_is_collective():
            return
        self._join_pending_saves()
        t0 = time.time()
        metrics = metrics or self.last_metrics
        self._save_one("checkpoint_latest", metrics)
        if self.cfg.training.save_numbered_checkpoints:
            self._save_one(f"checkpoint_{self.iter_num:07d}", metrics)
        self.logger.info("Checkpoint snapshot time: %.2f sec", time.time() - t0)

    def save_best(self, metrics: dict[str, float]) -> None:
        """checkpoint_best, written only on a fresh strict val-loss improvement
        (≙ train.py:657-665).  Called exclusively from evaluate() so the saved
        weights are exactly the ones that achieved the improvement."""
        if not self.is_master and not self._save_is_collective():
            return
        self._join_pending_saves()
        self._save_one("checkpoint_best", metrics)
        self._maybe_log_artifact()

    def _maybe_log_artifact(self) -> None:
        """wandb artifact versioning with old-version deletion
        (≙ train.py:668-707); no-op when wandb is unavailable."""
        mw = self.metrics_writer
        if mw is None or mw.wandb is None or not self.cfg.wandb.save_artifacts:
            return
        self._join_pending_saves()  # artifact reads the files — wait for the write
        wandb = mw.wandb
        timestamp = time.strftime("%d_%m_%Y-%Hh%Mm")
        kind = "nvit" if self.cfg.model.use_nvit else "vit"
        name = f"model-{self.cfg.wandb.run_name}-{kind}-{timestamp}"
        try:
            artifact = wandb.Artifact(
                name=name, type="model",
                metadata={"iter_num": self.iter_num, "metrics": self.last_metrics,
                          "using_nvit": self.cfg.model.use_nvit},
            )
            if self.cfg.data.checkpoint_backend == "orbax":
                # orbax writes a DIRECTORY of shard files, not a single npz
                artifact.add_dir(
                    str(self.out_dir / "checkpoint_best.orbax"), name="checkpoint_best.orbax"
                )
            else:
                artifact.add_file(str(self.out_dir / "checkpoint_best.npz"))
            artifact.add_file(str(self.out_dir / "checkpoint_best.json"))
            wandb.log_artifact(artifact)
            prev = getattr(self, "_last_artifact", None)
            if prev:
                try:
                    wandb.Api().artifact(f"{wandb.run.entity}/{wandb.run.project}/{prev}").delete()
                except Exception as e:
                    self.logger.info("Failed to delete old artifact: %s", e)
            self._last_artifact = name
        except Exception as e:
            self.logger.warning("artifact logging failed: %s", e)

    def mark_training_finished(self, reason: str = "early_stop") -> None:
        """Sentinel for the relaunch protocol (≙ train.py:1074-1079).
        All processes stop (the early-stop decision is identical everywhere —
        same replicated metrics); only the master writes the sentinel.

        The file records WHY the run finished: ``early_stop`` is final, while
        ``max_iters:N`` lets a later resume with a RAISED max_iters clear the
        sentinel and extend the run (see train())."""
        self.finished = True
        if self.is_master:
            (self.out_dir / "finished").write_text(reason)

    # --------------------------------------------------------------- cleanup
    def _install_signal_handlers(self) -> None:
        """SIGINT/SIGTERM → save + cleanup + exit (≙ train.py:113-116, 1175-1180)."""

        def handler(signum, frame):
            if self._in_step:
                if self._deferred_signal is not None:
                    # second signal while a step is STILL in flight: the step
                    # is likely hung (backend outage, multi-minute remote
                    # compile) — stay interruptible.  No final save (state is
                    # donated); sinks still tear down; resume uses the last
                    # periodic checkpoint.
                    self.logger.warning(
                        "Second signal %s while a step is in flight — forcing "
                        "exit without a final save (resume from the last "
                        "periodic checkpoint)", signum,
                    )
                    self._skip_final_save = True
                    if jax.process_count() > 1:
                        self._abnormal_exit = True
                    self.cleanup()
                    sys.exit(1)
                # the train step donates its input state: while the call is
                # on the stack, self.state references donated buffers and a
                # checkpoint from this frame would raise (and be swallowed by
                # cleanup's teardown guard, exiting 0 with NO final save).
                # Defer to the step boundary, where self.state is valid.
                self._deferred_signal = signum
                self.logger.info(
                    "Received signal %s mid-step; deferring cleanup to the "
                    "step boundary", signum,
                )
                return
            self.logger.info("Received signal %s. Performing cleanup...", signum)
            # a signal is delivered per-process: under multi-host we cannot
            # know the peers got it too, so treat it as an abnormal exit and
            # skip the collective save rather than risk hanging the barrier
            if jax.process_count() > 1:
                self._abnormal_exit = True
            self.cleanup()
            sys.exit(0)

        try:
            signal.signal(signal.SIGINT, handler)
            signal.signal(signal.SIGTERM, handler)
        except ValueError:
            pass  # not in main thread (tests)

    def cleanup(self) -> None:
        """Final checkpoint + sink teardown (≙ train.py:153-177).

        Saves only checkpoint_latest — checkpoint_best belongs to evaluate()
        (the weights here may have trained past the eval that earned 'best').

        Under multi-host orbax, saves are COLLECTIVE — entering one from a
        path only THIS rank is on (an exception, a single-rank signal) would
        block at the commit barrier until the distributed timeout, masking
        the original error.  Those paths skip the final save and rely on the
        last periodic checkpoint; normal completion (all ranks reach the
        same point) still saves.

        Idempotent: signal exits reach here twice (handler/boundary path,
        then train()'s finally) — the second entry must not rewrite the
        final checkpoint."""
        if self._cleaned:
            return
        self._cleaned = True
        try:
            skip_collective = self._save_is_collective() and self._abnormal_exit
            if skip_collective:
                self.logger.warning(
                    "Skipping final collective checkpoint from an abnormal-exit "
                    "path (multi-host orbax); resume from the last periodic save"
                )
            elif self._skip_final_save:
                # forced exit with a step in flight: self.state references
                # donated buffers — a save would raise
                pass
            elif self.iter_num > 0:
                self.save(self.last_metrics)
            self._join_pending_saves()  # don't exit while a write is in flight
            if self.metrics_writer is not None:
                self.metrics_writer.finish()
                self.metrics_writer = None
        except Exception as e:  # never raise during teardown
            self.logger.error("Error during cleanup: %s", e)

    def _handle_error(self, error: Exception) -> None:
        """Actionable advice for common failures (≙ train.py:1154-1173)."""
        msg = str(error)
        if "RESOURCE_EXHAUSTED" in msg or "out of memory" in msg.lower():
            self.logger.error(
                "DEVICE OUT OF MEMORY!\nTry:\n\t1. Reducing batch size\n\t2. Reducing model size\n"
                "\t3. Using gradient accumulation\n\t4. Enabling remat (system.remat=true)"
            )
        elif isinstance(error, ValueError):
            self.logger.error("Configuration error: %s", error)
        else:
            self.logger.error("Unknown error: %s", error)


def _chip_peak_flops() -> float:
    kind = jax.devices()[0].device_kind.lower()
    table = {"v5p": 459e12, "v5": 197e12, "v4": 275e12, "v6": 918e12}
    for k, v in table.items():
        if k in kind:
            return v
    return 197e12


def main(argv: list[str] | None = None) -> None:
    """≙ reference train.py:1203-1212 main()."""
    trainer = Trainer()
    if trainer.cfg.training.eval_only:
        trainer.validate_only()
    else:
        trainer.train()


if __name__ == "__main__":
    main()
