"""Integration tests: Trainer end-to-end on synthetic data (CPU), checkpoint
save/resume roundtrip, validate_only, early stopping, relaunch protocol."""

import jax
import dataclasses
import json

import numpy as np
import pytest

from nvit_tpu.configs.schema import (
    AugmentationConfig,
    Config,
    DataConfig,
    OptimizerConfig,
    SystemConfig,
    TrainingConfig,
    ViTConfig,
)
from nvit_tpu.ckpt.checkpoint import (
    checkpoint_exists,
    load_checkpoint,
    restore_for_resume,
    save_checkpoint,
)
from nvit_tpu.train.state import create_train_state
from nvit_tpu.train.trainer import Trainer


def make_cfg(tmp_path, **overrides) -> Config:
    cfg = Config(
        model=ViTConfig(
            image_size=16, n_layer=1, n_head=2, n_embd=32, num_classes=10,
            local_patch_size=4, global_patch_size=8, kohonen_nodes=18,
            use_nvit=True, use_kohonen=True, bias=True, flash_attn=False,
        ),
        training=TrainingConfig(
            batch_size=16, max_iters=6, max_iters_per_launch=100, eval_interval=3,
            log_interval=2, eval_iters=2, early_stopping_patience=10,
        ),
        optimizer=OptimizerConfig(learning_rate=1e-3, warmup_iters=2, lr_decay_iters=100),
        system=SystemConfig(use_ddp=False, use_tqdm=False, dtype="float32", use_amp=False),
        data=DataConfig(
            out_dir=str(tmp_path / "out"), dataset="synthetic", data_dir=str(tmp_path / "data"),
            augmentation=AugmentationConfig(enabled=False),
        ),
    )
    for k, v in overrides.items():
        cfg = dataclasses.replace(cfg, **{k: v})
    return cfg


class TestCheckpoint:
    def test_roundtrip_bit_exact(self, tmp_path):
        cfg = make_cfg(tmp_path)
        state = create_train_state(cfg)
        save_checkpoint(tmp_path, "ck", state, cfg, {"val/loss": 1.25})
        template = create_train_state(cfg, seed=999)  # different values, same shape
        restored, meta = load_checkpoint(tmp_path, "ck", template)
        for a, b in zip(
            __import__("jax").tree_util.tree_leaves(state),
            __import__("jax").tree_util.tree_leaves(restored),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert meta["metrics"]["val/loss"] == 1.25
        assert meta["iter_num"] == 0

    def test_async_write_failure_surfaces_at_join(self, tmp_path, monkeypatch):
        """A background write failure (disk full, permissions) must raise at
        the trainer's join, not be swallowed by the daemon thread — otherwise
        the run logs successful saves while the on-disk checkpoint goes stale."""
        import nvit_tpu.ckpt.checkpoint as C

        def boom(*a, **k):
            raise OSError("No space left on device")

        monkeypatch.setattr(C, "_write_files", boom)
        cfg = make_cfg(tmp_path)
        state = create_train_state(cfg)
        t = C.save_checkpoint_async(tmp_path, "ck_fail", state, cfg)
        t.join()
        assert t.error_box and "No space left" in str(t.error_box[0])

        trainer = Trainer(config=cfg)
        trainer._pending_saves = [t]
        with pytest.raises(RuntimeError, match="async checkpoint write failed"):
            trainer._join_pending_saves()

    def test_restore_for_resume_rebuilds_from_saved_config(self, tmp_path):
        cfg = make_cfg(tmp_path)
        state = create_train_state(cfg)
        save_checkpoint(tmp_path, "ck", state, cfg, {})
        restored, cfg2, meta = restore_for_resume(tmp_path, "ck")
        assert cfg2.model.n_embd == 32
        assert len(restored.params["blocks"]) == 1

    def test_mismatched_config_raises(self, tmp_path):
        cfg = make_cfg(tmp_path)
        state = create_train_state(cfg)
        save_checkpoint(tmp_path, "ck", state, cfg, {})
        other = make_cfg(tmp_path)
        other = dataclasses.replace(other, model=dataclasses.replace(other.model, n_layer=2))
        with pytest.raises(ValueError, match="leaves"):
            load_checkpoint(tmp_path, "ck", create_train_state(other))

    def test_exists(self, tmp_path):
        assert not checkpoint_exists(tmp_path, "nope")


class TestTrainerEndToEnd:
    def test_short_train_run(self, tmp_path):
        cfg = make_cfg(tmp_path)
        t = Trainer(config=cfg)
        t.train()
        assert t.iter_num == 6
        out = tmp_path / "out"
        assert (out / "checkpoint_latest.npz").exists()
        assert (out / "training.log").exists()
        assert (out / "stat").exists()
        assert (out / "metrics.jsonl").exists()
        # stat file has the init line + eval lines, with nViT hparam columns
        lines = (out / "stat").read_text().strip().splitlines()
        assert len(lines) >= 2
        assert len(lines[-1].split()) == 13 + 1 + 4 * cfg.model.n_layer

    def test_metrics_jsonl_contents(self, tmp_path):
        cfg = make_cfg(tmp_path)
        Trainer(config=cfg).train()
        rows = [json.loads(l) for l in (tmp_path / "out" / "metrics.jsonl").read_text().splitlines()]
        train_rows = [r for r in rows if "train/batch_loss" in r]
        eval_rows = [r for r in rows if "val/loss" in r]
        assert train_rows and eval_rows
        assert "val/top1_accuracy" in eval_rows[0]
        assert "val/consistency_loss" in eval_rows[0]  # kohonen breakdown
        # round-4 sqk drift watch: effective sqk max + the bounded-softmax
        # shift it implies, near init values at iter 0 (sqk_eff = 1)
        assert abs(eval_rows[0]["scales/sqk_eff_max"] - 1.0) < 0.2
        d_head = cfg.model.n_embd // cfg.model.n_head
        assert eval_rows[0]["scales/attn_bound"] == pytest.approx(
            np.sqrt(d_head) * eval_rows[0]["scales/sqk_eff_max"] ** 2
        )

    def test_resume_continues(self, tmp_path):
        cfg = make_cfg(tmp_path)
        t1 = Trainer(config=cfg)
        t1.train()
        assert t1.iter_num == 6

        cfg2 = dataclasses.replace(
            cfg,
            training=dataclasses.replace(cfg.training, init_from="resume", max_iters=10),
            data=dataclasses.replace(cfg.data, checkpoint_dir=str(tmp_path / "out")),
        )
        t2 = Trainer(config=cfg2)
        assert t2.iter_num == 6
        t2.train()
        assert t2.iter_num == 10

    def test_resume_with_changed_model_config_uses_checkpoints(self, tmp_path):
        """Resuming under DIFFERENT model settings must adopt the checkpoint's
        model config (≙ reference rebuilding from stored model_args,
        train.py:378-379) — round-1 bug: the current config silently won and
        the step was built for the wrong model shape."""
        cfg = make_cfg(tmp_path)
        t1 = Trainer(config=cfg)
        t1.train()

        changed_model = dataclasses.replace(cfg.model, n_layer=3, n_embd=64, n_head=4)
        cfg2 = dataclasses.replace(
            cfg,
            model=changed_model,
            training=dataclasses.replace(cfg.training, init_from="resume", max_iters=8),
            data=dataclasses.replace(cfg.data, checkpoint_dir=str(tmp_path / "out")),
        )
        t2 = Trainer(config=cfg2)
        # checkpoint's model config wins
        assert t2.cfg.model.n_layer == 1 and t2.cfg.model.n_embd == 32
        # and training actually runs with the restored params
        t2.train()
        assert t2.iter_num == 8

    def test_best_checkpoint_saved_on_improvement_without_always_save(self, tmp_path):
        """checkpoint_best is written on val-loss improvement even when
        always_save_checkpoint=False (≙ train.py:653-665)."""
        cfg = make_cfg(tmp_path)
        cfg = dataclasses.replace(
            cfg, training=dataclasses.replace(cfg.training, always_save_checkpoint=False)
        )
        t = Trainer(config=cfg)
        t.train()
        out = tmp_path / "out"
        assert (out / "checkpoint_best.npz").exists()
        # cleanup still writes latest
        assert (out / "checkpoint_latest.npz").exists()

    def test_signal_mid_step_defers_cleanup(self, tmp_path):
        """The train step DONATES self.state: a handler firing while the call
        is on the stack must defer (checkpointing donated buffers raises, and
        cleanup's teardown guard would swallow it — exit 0 with NO final
        save).  At a step boundary the inline path runs as before."""
        import signal as _signal

        cfg = make_cfg(tmp_path)
        t = Trainer(config=cfg)
        t._load_data()
        t.metrics_writer = None
        t.iter_num = 5
        t.last_metrics = {"val/loss": 0.5}
        handler = _signal.getsignal(_signal.SIGTERM)

        t._in_step = True
        handler(_signal.SIGTERM, None)  # must NOT raise SystemExit
        assert t._deferred_signal == _signal.SIGTERM
        assert not (tmp_path / "out" / "checkpoint_latest.npz").exists()

        t._in_step = False
        with pytest.raises(SystemExit):
            handler(_signal.SIGTERM, None)
        assert (tmp_path / "out" / "checkpoint_latest.npz").exists()

    def test_second_signal_mid_step_forces_exit(self, tmp_path):
        """A step can hang for minutes (remote compile, backend outage): the
        SECOND signal while one is still in flight must force exit — no final
        save (state is donated), sinks torn down, nonzero exit code."""
        import signal as _signal

        cfg = make_cfg(tmp_path)
        t = Trainer(config=cfg)
        t._load_data()
        t.metrics_writer = None
        t.iter_num = 5
        t.last_metrics = {"val/loss": 0.5}
        handler = _signal.getsignal(_signal.SIGTERM)

        t._in_step = True
        handler(_signal.SIGTERM, None)  # first: deferred
        with pytest.raises(SystemExit) as e:
            handler(_signal.SIGTERM, None)  # second: forced exit
        assert e.value.code == 1
        assert t._cleaned
        # no final checkpoint — self.state references donated buffers
        assert not (tmp_path / "out" / "checkpoint_latest.npz").exists()

    def test_cleanup_does_not_overwrite_best(self, tmp_path):
        """cleanup()/signal paths save only checkpoint_latest — the best file
        keeps the weights from the eval that earned it (advisor round-1)."""
        cfg = make_cfg(tmp_path)
        t = Trainer(config=cfg)
        t._load_data()
        t.metrics_writer = None
        t.iter_num = 5
        t.last_metrics = {"val/loss": 0.5}
        t.best_val_loss = 0.1  # pretend an earlier eval was better
        t.cleanup()
        out = tmp_path / "out"
        assert (out / "checkpoint_latest.npz").exists()
        assert not (out / "checkpoint_best.npz").exists()

    def test_full_eval_interval(self, tmp_path):
        """Every Nth periodic eval runs the FULL (quick=False) val pass
        (VERDICT r2 missing #3; ≙ reference full pass each eval,
        train.py:728-766)."""
        cfg = make_cfg(tmp_path)
        cfg = dataclasses.replace(
            cfg,
            training=dataclasses.replace(
                cfg.training, full_eval_interval=2, eval_interval=2, max_iters=8
            ),
        )
        t = Trainer(config=cfg)
        quicks = []
        orig = t.validate

        def spy(quick=False):
            quicks.append(quick)
            return orig(quick=quick)

        t.validate = spy
        t.train()
        # evals fire at iters 0,2,4,6 → every 2nd one is the full pass
        assert quicks == [True, False, True, False]

    def test_batch_not_divisible_by_grad_accum_raises(self, tmp_path):
        cfg = make_cfg(tmp_path)
        cfg = dataclasses.replace(
            cfg, training=dataclasses.replace(cfg.training, gradient_accumulation_steps=3)
        )
        with pytest.raises(ValueError, match="divisible"):
            Trainer(config=cfg)

    def test_validate_only(self, tmp_path):
        cfg = make_cfg(tmp_path)
        Trainer(config=cfg).train()
        cfg2 = dataclasses.replace(
            cfg,
            training=dataclasses.replace(cfg.training, init_from="resume", eval_only=True),
            data=dataclasses.replace(cfg.data, checkpoint_dir=str(tmp_path / "out")),
        )
        m = Trainer(config=cfg2).validate_only()
        assert "val/loss" in m and "val/top1_accuracy" in m

    def test_validate_only_requires_resume(self, tmp_path):
        cfg = make_cfg(tmp_path)
        t = Trainer(config=cfg)
        with pytest.raises(ValueError, match="checkpoint"):
            t.validate_only()

    def test_finished_sentinel_written_on_early_stop(self, tmp_path):
        cfg = make_cfg(tmp_path)
        t = Trainer(config=cfg)
        t._load_data()
        t.best_val_loss = 0.0  # nothing will improve on this
        t.early_stopping_counter = cfg.training.early_stopping_patience - 1
        assert t._should_stop_early(1.0) is True
        t.mark_training_finished()
        assert (tmp_path / "out" / "finished").exists()
        assert t.finished

    def _resume(self, cfg, tmp_path, **tr):
        return dataclasses.replace(
            cfg,
            training=dataclasses.replace(cfg.training, init_from="resume", **tr),
            data=dataclasses.replace(cfg.data, checkpoint_dir=str(tmp_path / "out")),
        )

    def test_finished_sentinel_written_at_max_iters(self, tmp_path):
        """A run that reached max_iters is DONE: the sentinel stops relaunch
        supervisors from burning no-op relaunches (the reference only writes
        it on early stop, train.py:757-760 — PARITY.md)."""
        cfg = make_cfg(tmp_path)
        t = Trainer(config=cfg)
        t.train()
        assert t.iter_num == 6 and t.finished
        assert (tmp_path / "out" / "finished").read_text() == "max_iters:6"
        # a same-max_iters relaunch is refused (no retraining happens)
        t2 = Trainer(config=self._resume(cfg, tmp_path))
        t2.train()
        assert t2.iter_num == 6

    def test_completed_run_extends_with_raised_max_iters(self, tmp_path):
        """Resuming with a RAISED max_iters is a deliberate run extension:
        the max_iters sentinel is cleared and training continues, then the
        sentinel is re-written at the new budget."""
        cfg = make_cfg(tmp_path)
        Trainer(config=cfg).train()
        out = tmp_path / "out"
        assert (out / "finished").read_text() == "max_iters:6"
        t2 = Trainer(config=self._resume(cfg, tmp_path, max_iters=9))
        t2.train()
        assert t2.iter_num == 9 and t2.finished
        assert (out / "finished").read_text() == "max_iters:9"

    def test_early_stop_sentinel_is_final(self, tmp_path):
        """An early-stop sentinel refuses even a raised max_iters (patience
        was exhausted — extension must be an explicit new run)."""
        cfg = make_cfg(tmp_path)
        Trainer(config=cfg).train()
        out = tmp_path / "out"
        (out / "finished").write_text("early_stop")
        t2 = Trainer(config=self._resume(cfg, tmp_path, max_iters=9))
        t2.train()
        assert t2.iter_num == 6
        assert (out / "finished").read_text() == "early_stop"

    def test_baseline_profile_runs(self, tmp_path):
        """n0k0: the profile the reference crashes on (RMSNorm bug) must work."""
        cfg = make_cfg(tmp_path)
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, use_nvit=False, use_kohonen=False)
        )
        t = Trainer(config=cfg)
        t.train()
        assert t.iter_num == 6


class TestMidEpochResumeDeterminism:
    def test_split_run_matches_single_run(self, tmp_path):
        """6 iters in one launch ≡ 3+3 across a relaunch: mid-epoch resume
        skips the already-trained batches (start_batch), so the training
        batch sequence — and therefore the final params — is a pure function
        of iter_num.  The reference replays the epoch from its start on
        every launch (train.py:885), silently double-training early batches."""
        cfg_a = make_cfg(tmp_path / "a")
        ta = Trainer(config=cfg_a)
        ta.train()
        assert ta.iter_num == 6

        cfg_b = make_cfg(tmp_path / "b", training=dataclasses.replace(
            cfg_a.training, max_iters_per_launch=3))
        tb1 = Trainer(config=cfg_b)
        tb1.train()
        assert tb1.iter_num == 3
        cfg_b2 = dataclasses.replace(
            cfg_b,
            training=dataclasses.replace(cfg_b.training, init_from="resume"),
            data=dataclasses.replace(cfg_b.data, checkpoint_dir=str(tmp_path / "b" / "out")),
        )
        tb2 = Trainer(config=cfg_b2)
        tb2.train()
        assert tb2.iter_num == 6

        a_leaves = jax.tree_util.tree_leaves(ta.state.params)
        b_leaves = jax.tree_util.tree_leaves(tb2.state.params)
        for x, y in zip(a_leaves, b_leaves):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), rtol=1e-6, atol=1e-7)


class TestRelaunchProtocol:
    """best_val_loss / patience persist across launches (VERDICT r2 weak #2;
    ≙ reference best_val_loss stored in the checkpoint dict, train.py:650,
    and the patience counter semantics at train.py:711-726)."""

    def _resume_cfg(self, cfg, tmp_path, **tr):
        return dataclasses.replace(
            cfg,
            training=dataclasses.replace(cfg.training, init_from="resume", **tr),
            data=dataclasses.replace(cfg.data, checkpoint_dir=str(tmp_path / "out")),
        )

    def test_relaunch_restores_best_and_patience(self, tmp_path):
        cfg = make_cfg(tmp_path)
        t1 = Trainer(config=cfg)
        t1.train()
        assert t1.best_val_loss is not None
        meta = json.loads((tmp_path / "out" / "checkpoint_latest.json").read_text())
        assert meta["trainer"]["best_val_loss"] == t1.best_val_loss
        t2 = Trainer(config=self._resume_cfg(cfg, tmp_path, max_iters=10))
        assert t2.best_val_loss == t1.best_val_loss
        assert t2.early_stopping_counter == t1.early_stopping_counter

    def test_relaunch_does_not_overwrite_best_with_worse(self, tmp_path):
        """Launch 2's first eval must NOT rewrite checkpoint_best: before the
        fix, best_val_loss reset to None every launch so ANY first eval
        'improved' and clobbered the best model with a worse one."""
        cfg = make_cfg(tmp_path)
        Trainer(config=cfg).train()
        out = tmp_path / "out"
        best_bytes = (out / "checkpoint_best.npz").read_bytes()
        # doctor the persisted best to an unbeatable value — no launch-2 eval
        # can improve on it, so checkpoint_best must stay byte-identical
        meta_path = out / "checkpoint_latest.json"
        meta = json.loads(meta_path.read_text())
        meta["trainer"]["best_val_loss"] = 0.0
        meta_path.write_text(json.dumps(meta))
        t2 = Trainer(config=self._resume_cfg(cfg, tmp_path, max_iters=10))
        assert t2.best_val_loss == 0.0
        t2.train()
        assert (out / "checkpoint_best.npz").read_bytes() == best_bytes

    def test_relaunch_continues_patience_to_early_stop(self, tmp_path):
        """Patience keeps counting across launches: a counter at patience−1
        plus one non-improving eval in launch 2 triggers early stop (before
        the fix a launch-bounded run could never early-stop)."""
        cfg = make_cfg(tmp_path)
        Trainer(config=cfg).train()
        out = tmp_path / "out"
        meta_path = out / "checkpoint_latest.json"
        meta = json.loads(meta_path.read_text())
        meta["trainer"]["best_val_loss"] = 0.0
        meta["trainer"]["early_stopping_counter"] = 1
        meta_path.write_text(json.dumps(meta))
        t2 = Trainer(
            config=self._resume_cfg(cfg, tmp_path, max_iters=1000, early_stopping_patience=2)
        )
        assert t2.early_stopping_counter == 1
        t2.train()
        assert t2.finished
        assert (out / "finished").exists()
        assert t2.iter_num < 1000


def test_init_from_wandb_requires_online(tmp_path):
    """init_from='wandb' errors clearly without online wandb (≙ train.py:362-363)."""
    cfg = make_cfg(tmp_path)
    cfg = dataclasses.replace(
        cfg, training=dataclasses.replace(cfg.training, init_from="wandb")
    )
    with pytest.raises(ValueError, match="online"):
        Trainer(config=cfg)


def test_init_from_wandb_full_path(tmp_path, monkeypatch):
    """init_from='wandb' end-to-end with a fake wandb module: artifact
    download → checkpoint restore → training continues from the restored
    iteration (≙ reference load_from_wandb, train.py:360-373)."""
    import sys
    import types

    # produce a real checkpoint to serve as the "artifact"
    cfg = make_cfg(tmp_path)
    t1 = Trainer(config=cfg)
    t1.train()
    art_dir = tmp_path / "artifact"
    art_dir.mkdir()
    for f in (tmp_path / "out").glob("checkpoint_best.*"):
        (art_dir / f.name).write_bytes(f.read_bytes())

    requested = {}

    class _Artifact:
        def download(self):
            return str(art_dir)

    class _Api:
        def artifact(self, name, type):
            requested["name"], requested["type"] = name, type
            return _Artifact()

    class _Run:
        entity, project, id = "team", "proj", "run0"

        def log_code(self, *a, **k):
            pass

    fake = types.SimpleNamespace(
        Api=_Api,
        login=lambda **k: None,
        init=lambda **k: _Run(),
        log=lambda *a, **k: None,
        finish=lambda *a, **k: None,
        watch=lambda *a, **k: None,
        run=_Run(),
        Artifact=lambda *a, **k: types.SimpleNamespace(
            name=k.get("name", ""), add_file=lambda *aa, **kk: None, metadata={}
        ),
        log_artifact=lambda art, *a, **k: uploaded.append(art.name),
    )
    uploaded: list = []
    monkeypatch.setitem(sys.modules, "wandb", fake)

    cfg2 = dataclasses.replace(
        cfg,
        training=dataclasses.replace(cfg.training, init_from="wandb", max_iters=8),
        wandb=dataclasses.replace(cfg.wandb, mode="online", artifact_name="team/proj/nvit:latest"),
        data=dataclasses.replace(cfg.data, out_dir=str(tmp_path / "out2")),
    )
    t2 = Trainer(config=cfg2)
    assert requested == {"name": "team/proj/nvit:latest", "type": "model"}
    assert t2.iter_num > 0  # restored from the artifact's best checkpoint
    t2.train()
    assert t2.iter_num == 8
    # the best-checkpoint artifact was uploaded (≙ reference train.py:668-707)
    assert uploaded and uploaded[0].startswith("model-")


def test_train_failure_marks_abnormal_and_advises_on_oom(tmp_path, monkeypatch):
    """A RESOURCE_EXHAUSTED mid-training must (a) set _abnormal_exit BEFORE
    cleanup — under multi-host orbax a final collective save from one crashed
    rank would hang the barrier — and (b) log the OOM remediation advice
    (≙ reference handle_error, train.py:1154-1173)."""
    import logging

    cfg = make_cfg(tmp_path)
    t = Trainer(config=cfg)
    monkeypatch.setattr(
        t, "_train_step",
        lambda *a, **k: (_ for _ in ()).throw(RuntimeError("RESOURCE_EXHAUSTED: oom")),
    )
    monkeypatch.setattr(t, "_train_step_norms", t._train_step, raising=False)

    messages: list[str] = []

    class _Capture(logging.Handler):
        def emit(self, record):
            messages.append(record.getMessage())

    # the nvit_tpu logger doesn't propagate to root (its own sinks) — attach
    h = _Capture(level=logging.ERROR)
    t.logger.addHandler(h)
    try:
        with pytest.raises(RuntimeError, match="RESOURCE_EXHAUSTED"):
            t.train()
    finally:
        t.logger.removeHandler(h)
    assert t._abnormal_exit
    assert any("OUT OF MEMORY" in m for m in messages)


def test_init_from_invalid_raises(tmp_path):
    cfg = make_cfg(tmp_path)
    cfg = dataclasses.replace(
        cfg, training=dataclasses.replace(cfg.training, init_from="bogus")
    )
    with pytest.raises(ValueError, match="init_from"):
        Trainer(config=cfg)


class TestRelaunchEvalCadence:
    def test_eval_count_persists_across_relaunch(self, tmp_path):
        """The full_eval_interval cadence phase survives relaunches: with
        max_iters_per_launch shorter than the full-eval period, a reset
        counter would mean the un-capped val pass NEVER fires."""
        cfg = make_cfg(tmp_path)
        t1 = Trainer(config=cfg)  # eval_interval=3, max_iters=6 → 2 evals
        t1.train()
        assert t1._eval_count == 2
        meta = json.loads((tmp_path / "out" / "checkpoint_latest.json").read_text())
        assert meta["trainer"]["eval_count"] == 2
        cfg2 = dataclasses.replace(
            cfg,
            training=dataclasses.replace(cfg.training, init_from="resume", max_iters=12),
            data=dataclasses.replace(cfg.data, checkpoint_dir=str(tmp_path / "out")),
        )
        t2 = Trainer(config=cfg2)
        assert t2._eval_count == 2  # continues, not reset
        t2.train()
        assert t2._eval_count == 4


class TestAbnormalExitCollectiveSave:
    def test_cleanup_skips_collective_save_after_abnormal_exit(self, tmp_path, monkeypatch):
        """Under multi-host orbax a final save from a crashed/signaled rank
        would hang at the collective barrier — cleanup must skip it."""
        import jax

        cfg = make_cfg(tmp_path)
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, checkpoint_backend="orbax")
        )
        t = Trainer(config=cfg)
        saves = []
        monkeypatch.setattr(t, "save", lambda *a, **kw: saves.append(a))
        monkeypatch.setattr(jax, "process_count", lambda: 2)
        t.iter_num = 5
        t._abnormal_exit = True
        t.cleanup()
        assert saves == []  # skipped: collective + abnormal
        # normal completion still saves
        t2 = Trainer(config=make_cfg(tmp_path))
        saves2 = []
        monkeypatch.setattr(t2, "save", lambda *a, **kw: saves2.append(a))
        t2.iter_num = 5
        t2.cleanup()
        assert len(saves2) == 1
