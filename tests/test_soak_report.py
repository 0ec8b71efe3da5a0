"""Regression tests for scripts/soak_report.py segmentation accounting.

Reproduces the three round-4 artifacts (VERDICT r4 weak #3) on a synthetic
soak directory:

* a SIGTERM'd launch that made no checkpoint progress (duplicate exit iter)
  must appear as a first-class zero-step entry with a reason — and must NOT
  duplicate the relaunch boundary or shift later segments;
* a launch with a start marker but no exit marker (outer timeout /
  supervisor restart, which also restarts log launch numbering) must merge
  into the next closed segment with a note — the final launch keeps its logs;
* an RSS spike coinciding with a slow first quartile must surface in
  ``anomalies`` as a likely in-band recompile.

Also covers: truncated JSONL tolerance and the post-sentinel no-op reason.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "scripts"))
from soak_report import build_report, parse_launch_records  # noqa: E402


def _write_soak_dir(tmp_path: Path, *, sentinel: str | None = "max_iters:600") -> Path:
    out = tmp_path / "soak"
    out.mkdir()
    rows = []

    def log_row(step, ms, rss):
        rows.append(
            {
                "train/iter": step,
                "train/batch_time_ms": ms,
                "system/ram_used_gb": rss,
                "_step": step,
            }
        )

    def eval_row(step, loss):
        rows.append({"val/loss": loss, "_step": step})

    # launch 1: iters 1..200 (exit iter=200)
    eval_row(0, 10.0)
    for s in range(50, 201, 50):
        log_row(s, 700.0 + s / 100, 3.0 + s / 200)
    eval_row(200, 8.0)
    # launch 2: SIGTERM target, no progress (exit iter=200 again) — no rows
    # launch 3: iters 201..300, then killed by the OUTER timeout (no exit
    # marker); supervisor restarts the soak script → numbering restarts at 1.
    # Its segment shows the RSS spike + slow first step (in-band recompile).
    log_row(250, 9000.0, 24.0)
    log_row(300, 800.0, 25.5)
    # relaunch (logged as "launch 1" again): iters 301..400 (exit iter=400)
    eval_row(300, 7.5)
    for s in range(350, 401, 50):
        log_row(s, 710.0, 4.0)
    eval_row(400, 7.4)
    # final launch: iters 401..600, completion
    for s in range(450, 601, 50):
        log_row(s, 705.0, 5.0)
    eval_row(600, 7.0)

    with (out / "metrics.jsonl").open("w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
        f.write('{"train/iter": 650, "train/batch_')  # truncated mid-write

    (out / "soak.log").write_text(
        "=== soak launch 1 start 10:00:00 ===\n"
        "=== soak launch 1 exit rc=0 iter=200 10:20:00 ===\n"
        "=== soak launch 2 start 10:20:02 ===\n"
        "=== SIGTERM launch 2 (10:26:42)\n"
        "=== soak launch 2 exit rc=0 iter=200 10:27:00 ===\n"
        "=== soak launch 3 start 10:27:02 ===\n"
        "=== soak launch 1 start 10:50:00 ===\n"
        "=== soak launch 1 exit rc=0 iter=400 11:10:00 ===\n"
        "=== soak launch 2 start 11:10:02 ===\n"
        "=== soak launch 2 exit rc=0 iter=600 11:25:00 ===\n"
    )
    if sentinel:
        (out / "finished").write_text(sentinel + "\n")
    return out


def test_parse_launch_records_sequential_identity(tmp_path):
    out = _write_soak_dir(tmp_path)
    recs = parse_launch_records((out / "soak.log").read_text())
    # 5 launches despite the log numbering restarting at 1 mid-soak
    assert [r["seq"] for r in recs] == [1, 2, 3, 4, 5]
    assert [r["exit_iter"] for r in recs] == [200, 200, None, 400, 600]
    assert [r["sigterm"] for r in recs] == [False, True, False, False, False]


def test_boundaries_deduplicated_and_monotone(tmp_path):
    report = build_report(_write_soak_dir(tmp_path))
    cuts = [b["cut_iter"] for b in report["relaunch_boundaries"]]
    assert cuts == sorted(set(cuts)), "duplicate or non-monotone boundary iters"
    assert 200 in cuts and cuts.count(200) == 1  # the SIGTERM repeat collapsed
    assert 600 not in cuts  # final exit is the end of the soak, not a boundary


def test_zero_progress_launch_is_first_class_with_reason(tmp_path):
    report = build_report(_write_soak_dir(tmp_path))
    zero = [s for s in report["segments"] if s["logs"] == 0]
    assert len(zero) == 1
    assert zero[0]["launches"] == [2]
    assert "SIGTERM" in zero[0]["reason"]
    # expected zero-progress (the preemption target) is NOT an anomaly
    assert not any(a["type"] == "unexplained_zero_progress" for a in report["anomalies"])


def test_no_exit_marker_launch_merges_and_final_launch_keeps_logs(tmp_path):
    report = build_report(_write_soak_dir(tmp_path))
    merged = [s for s in report["segments"] if len(s["launches"]) > 1]
    assert len(merged) == 1 and merged[0]["launches"] == [3, 4]
    assert "without a marker" in merged[0]["note"]
    # the round-4 bug: the duplicate boundary shifted every later segment,
    # leaving the final launch with zero logs — it must keep its rows now
    final = report["segments"][-1]
    assert final["launches"] == [5]
    assert final["logs"] == 4 and final["steps"] == [450, 600]


def test_rss_spike_flagged_with_recompile_cause(tmp_path):
    report = build_report(_write_soak_dir(tmp_path))
    spikes = [a for a in report["anomalies"] if a["type"] == "rss_spike"]
    assert len(spikes) == 1
    assert spikes[0]["rss_gb_max"] == pytest.approx(25.5)
    assert 3 in spikes[0]["launches"]
    assert "recompile" in spikes[0].get("likely_cause", "")


def test_truncated_jsonl_tolerated_and_sentinel_reported(tmp_path):
    report = build_report(_write_soak_dir(tmp_path))
    assert report["truncated_lines_skipped"] == 1
    assert report["finished_sentinel"] == "max_iters:600"
    assert report["iters_reached"] == 600
    assert report["launches"] == 5
    assert report["sigterm_kills"] == 1


def test_post_sentinel_noop_reason(tmp_path):
    out = _write_soak_dir(tmp_path)
    # supervisor races the sentinel and fires one extra launch that resumes,
    # sees max_iters reached, and exits at the same iteration
    with (out / "soak.log").open("a") as f:
        f.write("=== soak launch 3 start 11:25:02 ===\n")
        f.write("=== soak launch 3 exit rc=0 iter=600 11:25:30 ===\n")
    report = build_report(out)
    last = report["segments"][-1]
    assert last["logs"] == 0 and last["launches"] == [6]
    assert "post-sentinel" in last["reason"]
    assert not any(a["type"] == "unexplained_zero_progress" for a in report["anomalies"])


def _write_minimal(tmp_path: Path, log_text: str, rows: list[dict]) -> Path:
    out = tmp_path / "soak"
    out.mkdir()
    with (out / "metrics.jsonl").open("w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    (out / "soak.log").write_text(log_text)
    return out


def test_orphan_sigterm_echo_does_not_mark_later_launch(tmp_path):
    """The kill subshell is `sleep N; echo marker; kill` — if its target
    crashed before the sleep ended, the echo lands while a LATER launch is
    open.  The marker's launch number must be matched against the open
    record, or the innocent launch gets sigterm=True and the real crash is
    excused as a benign preemption (review finding, round 5)."""
    rows = [
        {"train/batch_time_ms": 700.0, "system/ram_used_gb": 4.0, "_step": s}
        for s in (100, 200)
    ]
    rows += [
        {"train/batch_time_ms": 700.0, "system/ram_used_gb": 4.0, "_step": s}
        for s in (300, 400)
    ]
    log = (
        "=== soak launch 1 start 10:00:00 ===\n"
        "=== soak launch 1 exit rc=0 iter=200 10:20:00 ===\n"
        "=== soak launch 2 start 10:20:02 ===\n"
        "=== soak launch 2 exit rc=1 iter=200 10:20:30 ===\n"  # crashed early
        "=== soak launch 3 start 10:20:32 ===\n"
        "=== SIGTERM launch 2 (10:27:00)\n"  # orphan echo for the dead launch
        "=== soak launch 3 exit rc=0 iter=400 10:40:00 ===\n"
    )
    out = _write_minimal(tmp_path, log, rows)
    recs = parse_launch_records(log)
    assert [r["sigterm"] for r in recs] == [False, False, False]
    report = build_report(out)
    # the crash is NOT excused: it surfaces as unexplained zero progress
    bad = [a for a in report["anomalies"] if a["type"] == "unexplained_zero_progress"]
    assert len(bad) == 1 and bad[0]["launches"] == [2]


def test_checkpoint_advance_without_logs_is_attributed(tmp_path):
    """A launch can advance the checkpoint (exit iter > previous high-water)
    yet land zero train-log rows — e.g. SIGTERM between a checkpoint write
    and the next 100-iter log line.  Seen in the r5 in-flight report as
    `unexplained_zero_progress, reason: null` for the SIGTERM target.  The
    segment must carry an explicit reason and NOT be flagged unexplained."""
    rows = [
        {"train/batch_time_ms": 700.0, "system/ram_used_gb": 4.0, "_step": s}
        for s in (100, 200)
    ] + [
        {"train/batch_time_ms": 700.0, "system/ram_used_gb": 4.0, "_step": s}
        for s in (300, 400)
    ]
    log = (
        "=== soak launch 1 start 10:00:00 ===\n"
        "=== soak launch 1 exit rc=0 iter=200 10:20:00 ===\n"
        "=== soak launch 2 start 10:20:02 ===\n"
        "=== SIGTERM launch 2 (10:26:00)\n"
        # checkpointed at 250 but never reached the step-300 log line
        "=== soak launch 2 exit rc=0 iter=250 10:26:05 ===\n"
        "=== soak launch 3 start 10:26:07 ===\n"
        "=== soak launch 3 exit rc=0 iter=400 10:40:00 ===\n"
    )
    out = _write_minimal(tmp_path, log, rows)
    report = build_report(out)
    seg2 = next(s for s in report["segments"] if s["launches"] == [2])
    assert seg2["logs"] == 0
    assert "SIGTERM" in seg2["reason"] and "250" in seg2["reason"]
    assert not [a for a in report["anomalies"] if a["type"] == "unexplained_zero_progress"]
    # non-SIGTERM variant: still explained (checkpoint DID advance), with
    # the exit iter named in the reason
    log_nosig = log.replace("=== SIGTERM launch 2 (10:26:00)\n", "")
    (tmp_path / "b").mkdir()
    out2 = _write_minimal(tmp_path / "b", log_nosig, rows)
    report2 = build_report(out2)
    seg2b = next(s for s in report2["segments"] if s["launches"] == [2])
    assert "advanced checkpoint" in seg2b["reason"]
    assert not [a for a in report2["anomalies"] if a["type"] == "unexplained_zero_progress"]


def test_replayed_rows_deduped_not_double_counted(tmp_path):
    """A launch killed after logging but before its first checkpoint leaves
    rows the next launch replays and re-logs.  Segment stats must count each
    iteration ONCE (the committing launch's copy), not skew the quartile/RSS
    stats with duplicates (review finding, round 5)."""
    rows = [
        {"train/batch_time_ms": 700.0, "system/ram_used_gb": 4.0, "_step": s}
        for s in (100, 200)
    ]
    # launch 2 steps to 300 (logged) but is SIGTERM'd pre-checkpoint
    rows += [
        {"train/batch_time_ms": 9000.0, "system/ram_used_gb": 20.0, "_step": s}
        for s in (250, 300)
    ]
    # launch 3 replays 250/300 (fresh copies) and continues to 400
    rows += [
        {"train/batch_time_ms": 710.0, "system/ram_used_gb": 4.5, "_step": s}
        for s in (250, 300, 350, 400)
    ]
    log = (
        "=== soak launch 1 start 10:00:00 ===\n"
        "=== soak launch 1 exit rc=0 iter=200 10:20:00 ===\n"
        "=== soak launch 2 start 10:20:02 ===\n"
        "=== SIGTERM launch 2 (10:26:42)\n"
        "=== soak launch 2 exit rc=0 iter=200 10:27:00 ===\n"
        "=== soak launch 3 start 10:27:02 ===\n"
        "=== soak launch 3 exit rc=0 iter=400 10:47:00 ===\n"
    )
    out = _write_minimal(tmp_path, log, rows)
    report = build_report(out)
    final = report["segments"][-1]
    assert final["launches"] == [3]
    assert final["logs"] == 4 and final["steps"] == [250, 400]
    # the kept copies are the committing launch's (710 ms), so the killed
    # launch's 9000 ms pre-kill rows no longer fake a recompile anomaly
    assert final["step_ms_first_q"] == pytest.approx(710.0)
    assert final["rss_gb_max"] == pytest.approx(4.5)
    assert not any(a["type"] == "recompile" for a in report["anomalies"])


def test_round4_real_summary_is_clean():
    """The rescued round-4 artifacts regenerate without the three defects."""
    ev = Path(__file__).resolve().parent.parent / "evidence" / "r4_soak"
    if not ev.exists():  # pragma: no cover
        pytest.skip("round-4 evidence not present")
    report = build_report(ev)
    cuts = [b["cut_iter"] for b in report["relaunch_boundaries"]]
    assert cuts == sorted(set(cuts))
    assert report["launches"] == 19
    assert report["iters_reached"] == 20000
    # the final launch's rows are attributed (the round-4 report showed 0)
    assert report["segments"][-1]["logs"] > 0
    # the 25.7 GB RSS spike is flagged, not buried
    assert any(a["type"] == "rss_spike" and a["rss_gb_max"] > 20 for a in report["anomalies"])
    zero = [s for s in report["segments"] if s["logs"] == 0]
    assert all("reason" in s for s in zero)
