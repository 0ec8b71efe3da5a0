"""L5 launch-surface tests: the package entry point and the profile sweep
run end-to-end in subprocesses (CPU, tiny synthetic config)."""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

TINY_ENV = {
    "NVIT_DATA__DATASET": "synthetic",
    "NVIT_MODEL__IMAGE_SIZE": "16",
    "NVIT_MODEL__N_LAYER": "1",
    "NVIT_MODEL__N_HEAD": "2",
    "NVIT_MODEL__N_EMBD": "32",
    "NVIT_MODEL__NUM_CLASSES": "10",
    "NVIT_MODEL__LOCAL_PATCH_SIZE": "4",
    "NVIT_MODEL__GLOBAL_PATCH_SIZE": "8",
    "NVIT_MODEL__KOHONEN_NODES": "18",
    "NVIT_MODEL__FLASH_ATTN": "false",
    "NVIT_TRAINING__MAX_ITERS": "2",
    "NVIT_TRAINING__EVAL_INTERVAL": "10",
    "NVIT_TRAINING__LOG_INTERVAL": "1",
    "NVIT_TRAINING__EVAL_ITERS": "1",
    "NVIT_TRAINING__BATCH_SIZE": "8",
    "NVIT_SYSTEM__USE_TQDM": "false",
    "NVIT_SYSTEM__DTYPE": "float32",
    "NVIT_SYSTEM__USE_AMP": "false",
    "NVIT_SYSTEM__USE_DDP": "false",
    "NVIT_DATA__AUGMENTATION__ENABLED": "false",
    # hermetic CPU, no TPU plugin
    "JAX_PLATFORMS": "cpu",
    "PALLAS_AXON_POOL_IPS": "",
}


def run_entry(tmp_path, extra_env=None, timeout=600):  # generous under suite load
    env = dict(os.environ)
    env.update(TINY_ENV)
    env["NVIT_DATA__OUT_DIR"] = str(tmp_path / "out")
    env.update(extra_env or {})
    return subprocess.run(
        [sys.executable, "-m", "nvit_tpu"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=timeout,
    )


def test_python_m_nvit_tpu_trains(tmp_path):
    r = run_entry(tmp_path)
    assert r.returncode == 0, r.stderr[-2000:]
    out = tmp_path / "out"
    assert (out / "checkpoint_latest.npz").exists()
    rows = [json.loads(l) for l in (out / "metrics.jsonl").read_text().splitlines()]
    assert any("train/batch_loss" in row for row in rows)


def test_profile_env_overrides_reach_model(tmp_path):
    """≙ profiles/nvit0_k0.env applied through the launcher path."""
    r = run_entry(
        tmp_path,
        extra_env={"NVIT_MODEL__USE_NVIT": "false", "NVIT_MODEL__USE_KOHONEN": "false"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    meta = json.loads((tmp_path / "out" / "checkpoint_latest.json").read_text())
    assert meta["config"]["model"]["use_nvit"] is False
    assert meta["config"]["model"]["use_kohonen"] is False


def test_sigterm_preemption_saves_and_resumes(tmp_path):
    """Preemption end-to-end, OUT of process (≙ reference signal handling,
    train.py:113-116, 1175-1180): SIGTERM a live training subprocess, assert
    the handler writes checkpoint_latest and exits 0, then relaunch with
    init_from=resume and assert training continues PAST the preempted
    iteration.  The in-process tests cover cleanup(); this covers the actual
    kill-a-running-launcher path the relaunch protocol is built around."""
    import signal
    import time

    env = dict(os.environ)
    env.update(TINY_ENV)
    env["NVIT_DATA__OUT_DIR"] = str(tmp_path / "out")
    env["NVIT_TRAINING__MAX_ITERS"] = "100000"  # run until killed
    # no evals before the kill: under suite load SIGTERM can land hundreds of
    # iterations in, and with evals running the synthetic plateau early-stops
    # and writes the `finished` sentinel first — then resume CORRECTLY
    # refuses to continue and the test would fail on its own slowness
    env["NVIT_TRAINING__EVAL_INTERVAL"] = "100000"
    metrics = tmp_path / "out" / "metrics.jsonl"
    proc = subprocess.Popen(
        [sys.executable, "-m", "nvit_tpu"],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    try:
        deadline = time.time() + 600  # generous: full-suite load can slow startup 5-10x
        while time.time() < deadline:  # wait until training is really underway
            if metrics.exists() and metrics.read_text().count("train/batch_loss") >= 2:
                break
            if proc.poll() is not None:
                raise AssertionError(f"trainer exited early: {proc.communicate()[1][-2000:]}")
            time.sleep(0.5)
        else:
            raise AssertionError("trainer never reached iteration 2")
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=300)  # handler saves a checkpoint; slow under suite load
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()
    assert proc.returncode == 0, proc.communicate()[1][-2000:]
    meta = json.loads((tmp_path / "out" / "checkpoint_latest.json").read_text())
    killed_iter = meta["iter_num"]
    assert killed_iter >= 2

    r = run_entry(tmp_path, extra_env={
        "NVIT_TRAINING__INIT_FROM": "resume",
        "NVIT_TRAINING__MAX_ITERS": str(killed_iter + 2),
        # resume reads from data.checkpoint_dir, which (≙ reference
        # settings.yaml:88) defaults to ./out, not to this run's out_dir
        "NVIT_DATA__CHECKPOINT_DIR": str(tmp_path / "out"),
    })
    assert r.returncode == 0, r.stderr[-2000:]
    meta2 = json.loads((tmp_path / "out" / "checkpoint_latest.json").read_text())
    assert meta2["iter_num"] == killed_iter + 2


def test_run_profiles_script(tmp_path):
    """run_profiles.sh sweeps every profile, each into its own out dir."""
    profiles = tmp_path / "profiles"
    profiles.mkdir()
    (profiles / "a.env").write_text("NVIT_MODEL__USE_NVIT=false\nNVIT_MODEL__USE_KOHONEN=false\n")
    (profiles / "b.env").write_text("NVIT_MODEL__USE_NVIT=true\nNVIT_MODEL__USE_KOHONEN=false\n")
    env = dict(os.environ)
    env.update(TINY_ENV)
    env["NVIT_DATA__OUT_DIR"] = ""  # let the script pick per-profile dirs
    env.pop("NVIT_DATA__OUT_DIR")
    r = subprocess.run(
        ["bash", str(REPO / "run_profiles.sh"), "--profiles-dir", str(profiles)],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:] + r.stdout[-500:]
    for name in ("a", "b"):
        meta_path = tmp_path / "out" / name / "checkpoint_latest.json"
        assert meta_path.exists(), f"missing {meta_path}"
    meta_a = json.loads((tmp_path / "out" / "a" / "checkpoint_latest.json").read_text())
    meta_b = json.loads((tmp_path / "out" / "b" / "checkpoint_latest.json").read_text())
    assert meta_a["config"]["model"]["use_nvit"] is False
    assert meta_b["config"]["model"]["use_nvit"] is True
