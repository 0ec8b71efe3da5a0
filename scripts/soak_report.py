"""Summarize a tpu_soak.sh run into one JSON report (stability evidence).

Reads $OUT/metrics.jsonl + $OUT/soak.log and reports, per launch segment:
step-time mean of the first vs last quartile (drift), host RSS first/last/max
(growth), and across the whole soak: eval-loss continuity at relaunch
boundaries (no loss jump on resume), relaunch count, SIGTERM recovery, and a
flagged ``anomalies`` list (RSS spikes, in-band recompiles, unexpected
zero-progress launches) so the report needs no manual interpretation.

Segmentation parses soak.log launch markers SEQUENTIALLY (launch numbers in
the log restart when a resume supervisor re-invokes the soak script, so the
printed numbers are labels, not identities):

* a launch whose exit iteration equals the previous high-water mark made no
  checkpoint progress — it gets a first-class zero-step entry with a reason
  (SIGTERM-before-first-checkpoint, or post-sentinel no-op) instead of
  silently duplicating a relaunch boundary;
* a launch with a start marker but NO exit marker was killed externally
  (outer timeout / supervisor restart) — its metrics rows are merged into
  the next closed segment with a note, since its endpoint is unknowable.

≙ the reference's 24 h relaunch protocol (train.py:857-862, 1074-1079);
the reference ships no stability harness — this is our own bar.
"""

from __future__ import annotations

import json
import re
import statistics
import sys
from pathlib import Path


def quartile_mean(xs: list[float], first: bool) -> float | None:
    # None (→ JSON null), not NaN: json.dumps would emit the non-standard
    # token NaN and make the whole summary unparseable by strict readers
    if not xs:
        return None
    q = max(1, len(xs) // 4)
    sel = xs[:q] if first else xs[-q:]
    return round(sum(sel) / len(sel), 2)


def _median(xs: list[float]) -> float | None:
    return statistics.median(xs) if xs else None


def _dedupe_by_step(rows: list[dict]) -> list[dict]:
    """Collapse replayed iterations to ONE row per ``_step`` (keep the last).

    A launch killed after logging but before its first checkpoint leaves
    rows whose iterations the NEXT launch replays and re-logs (exact resume
    restarts from the checkpoint high-water mark).  Keeping the LAST copy —
    the launch that actually committed those iterations — stops segment
    step-time/RSS stats from double-counting the duplicates (which skewed
    the recompile/RSS anomaly heuristics; review finding, round 5)."""
    by_step: dict[int, dict] = {}
    for r in rows:
        by_step[r["_step"]] = r
    return [by_step[k] for k in sorted(by_step)]


def parse_launch_records(log: str) -> list[dict]:
    """Sequential launch records from soak.log markers.

    Returns [{seq, label, exit_iter (None if no exit marker), rc, sigterm}].
    """
    records: list[dict] = []
    open_rec: dict | None = None
    for line in log.splitlines():
        m = re.match(r"=== soak launch (\d+) start", line)
        if m:
            # a start while a record is open ⇒ the previous launch died
            # without its exit marker (outer timeout / supervisor restart)
            open_rec = {
                "seq": len(records) + 1,
                "label": int(m.group(1)),
                "exit_iter": None,
                "rc": None,
                "sigterm": False,
            }
            records.append(open_rec)
            continue
        m = re.match(r"=== SIGTERM launch (\d+)", line)
        if m and open_rec is not None and open_rec["label"] == int(m.group(1)):
            # match the marker's launch number against the OPEN record: the
            # kill subshell is `sleep N; echo marker; kill`, so if its target
            # crashed early the echo lands while a LATER launch is open —
            # attributing the SIGTERM to that innocent launch would also give
            # the real crash a benign zero-progress reason (review finding,
            # round 5)
            open_rec["sigterm"] = True
            continue
        m = re.match(r"=== soak launch (\d+) exit rc=(\d+) iter=(\S+)", line)
        if m and open_rec is not None:
            open_rec["rc"] = int(m.group(2))
            open_rec["exit_iter"] = int(m.group(3)) if m.group(3).isdigit() else None
            open_rec = None
    return records


def build_report(out_dir: str | Path) -> dict:
    out = Path(out_dir)
    # a SIGTERM/SIGKILL landing mid f.write() leaves a truncated JSON line
    # that the next launch appends after — skip it, don't lose the report
    rows, bad = [], 0
    for l in (out / "metrics.jsonl").open():
        try:
            rows.append(json.loads(l))
        except json.JSONDecodeError:
            bad += 1

    train_rows = _dedupe_by_step([r for r in rows if "train/batch_time_ms" in r])
    eval_rows = _dedupe_by_step([r for r in rows if "val/loss" in r])

    log = (out / "soak.log").read_text() if (out / "soak.log").exists() else ""
    records = parse_launch_records(log)
    sigterms = sum(1 for r in records if r["sigterm"])
    sentinel = (out / "finished").read_text().strip() if (out / "finished").exists() else None

    # ---- segmentation over the forward-only iteration axis ----
    seg_reports: list[dict] = []
    prev = 0  # checkpoint high-water mark
    pending: list[dict] = []  # launches with no exit marker (endpoint unknown)
    for rec in records:
        if rec["exit_iter"] is None:
            pending.append(rec)
            continue
        if rec["exit_iter"] <= prev and not pending:
            # zero-progress launch: first-class entry, with the reason
            if rec["sigterm"]:
                reason = "SIGTERM before first post-resume checkpoint (preemption target)"
            elif sentinel and rec["seq"] == len(records):
                reason = f"post-sentinel no-op (finished={sentinel!r} already present)"
            else:
                reason = "no checkpoint progress (killed before first post-resume checkpoint)"
            seg_reports.append(
                {
                    "launches": [rec["seq"]],
                    "steps": [],
                    "logs": 0,
                    "step_ms_first_q": None,
                    "step_ms_last_q": None,
                    "rss_gb_first": None,
                    "rss_gb_last": None,
                    "rss_gb_max": None,
                    "reason": reason,
                }
            )
            continue
        seg_rows = [r for r in train_rows if prev < r["_step"] <= rec["exit_iter"]]
        times = [r["train/batch_time_ms"] for r in seg_rows]
        rss = [r["system/ram_used_gb"] for r in seg_rows if r.get("system/ram_used_gb")]
        entry = {
            "launches": [p["seq"] for p in pending] + [rec["seq"]],
            "steps": [seg_rows[0]["_step"], seg_rows[-1]["_step"]] if seg_rows else [],
            "logs": len(seg_rows),
            "step_ms_first_q": quartile_mean(times, True),
            "step_ms_last_q": quartile_mean(times, False),
            "rss_gb_first": round(rss[0], 3) if rss else None,
            "rss_gb_last": round(rss[-1], 3) if rss else None,
            "rss_gb_max": round(max(rss), 3) if rss else None,
        }
        if not seg_rows:
            # the launch advanced the checkpoint (exit_iter > prev) but no
            # train-log row landed in the window — e.g. SIGTERM between a
            # checkpoint write and the next 100-iter log line.  Without a
            # reason this reads as unexplained zero progress even when the
            # kill is fully attributed (seen in the r5 in-flight report).
            if rec["sigterm"]:
                entry["reason"] = (
                    f"SIGTERM after advancing the checkpoint to iter {rec['exit_iter']} "
                    "but before the next train-log row (preemption target)"
                )
            else:
                entry["reason"] = (
                    f"advanced checkpoint to iter {rec['exit_iter']} with no train-log "
                    "rows in the window (exited between checkpoint and next log)"
                )
        if pending:
            entry["note"] = (
                f"launch(es) {[p['seq'] for p in pending]} exited without a marker "
                "(outer timeout / supervisor restart); rows merged into this segment"
            )
        seg_reports.append(entry)
        prev = rec["exit_iter"]
        pending = []
    if pending:  # log ends mid-launch
        seg_rows = [r for r in train_rows if r["_step"] > prev]
        times = [r["train/batch_time_ms"] for r in seg_rows]
        rss = [r["system/ram_used_gb"] for r in seg_rows if r.get("system/ram_used_gb")]
        seg_reports.append(
            {
                "launches": [p["seq"] for p in pending],
                "steps": [seg_rows[0]["_step"], seg_rows[-1]["_step"]] if seg_rows else [],
                "logs": len(seg_rows),
                "step_ms_first_q": quartile_mean(times, True),
                "step_ms_last_q": quartile_mean(times, False),
                "rss_gb_first": round(rss[0], 3) if rss else None,
                "rss_gb_last": round(rss[-1], 3) if rss else None,
                "rss_gb_max": round(max(rss), 3) if rss else None,
                "note": "log ends without an exit marker for these launches",
            }
        )

    # ---- eval continuity at UNIQUE relaunch boundaries ----
    # (a zero-progress launch repeats the previous exit iter — that is one
    # boundary in the metrics timeline, not two)
    uniq_exits: list[int] = []
    for rec in records:
        e = rec["exit_iter"]
        if e is not None and (not uniq_exits or e > uniq_exits[-1]):
            uniq_exits.append(e)
    boundary_iters = uniq_exits[:-1]  # the final exit ends the soak
    boundaries = []
    for b in boundary_iters:
        before = [r for r in eval_rows if r["_step"] <= b]
        after = [r for r in eval_rows if r["_step"] > b]
        if before and after:
            boundaries.append(
                {
                    "cut_iter": b,
                    "before": {
                        "step": before[-1]["_step"],
                        "val_loss": round(before[-1]["val/loss"], 4),
                    },
                    "after": {
                        "step": after[0]["_step"],
                        "val_loss": round(after[0]["val/loss"], 4),
                    },
                }
            )

    # ---- anomaly flags: the report should not need manual interpretation ----
    anomalies: list[dict] = []
    med_rss = _median([s["rss_gb_max"] for s in seg_reports if s["rss_gb_max"]])
    med_step = _median([s["step_ms_last_q"] for s in seg_reports if s["step_ms_last_q"]])
    for s in seg_reports:
        if med_rss and s["rss_gb_max"] and s["rss_gb_max"] > max(2 * med_rss, med_rss + 8):
            a = {
                "type": "rss_spike",
                "launches": s["launches"],
                "rss_gb_max": s["rss_gb_max"],
                "median_rss_gb": round(med_rss, 3),
            }
            if med_step and s["step_ms_first_q"] and s["step_ms_first_q"] > 3 * med_step:
                a["likely_cause"] = (
                    "in-band XLA recompile (first-quartile step "
                    f"{s['step_ms_first_q']} ms vs median {round(med_step, 1)} ms)"
                )
            anomalies.append(a)
        elif med_step and s["step_ms_first_q"] and s["step_ms_first_q"] > 5 * med_step and s["logs"]:
            anomalies.append(
                {
                    "type": "recompile",
                    "launches": s["launches"],
                    "step_ms_first_q": s["step_ms_first_q"],
                    "median_step_ms": round(med_step, 1),
                }
            )
        reason = s.get("reason") or ""
        explained = (
            "SIGTERM" in reason
            or "post-sentinel" in reason
            or "advanced checkpoint" in reason
        )
        if s["logs"] == 0 and not explained:
            anomalies.append(
                {"type": "unexplained_zero_progress", "launches": s["launches"], "reason": s.get("reason")}
            )

    all_times = [r["train/batch_time_ms"] for r in train_rows]
    all_rss = [r["system/ram_used_gb"] for r in train_rows if r.get("system/ram_used_gb")]
    return {
        "iters_reached": train_rows[-1]["_step"] if train_rows else 0,
        "launches": len(records),
        "sigterm_kills": sigterms,
        "finished_sentinel": sentinel,
        "relaunch_boundaries": boundaries,
        "step_ms_global_first_q": quartile_mean(all_times, True),
        "step_ms_global_last_q": quartile_mean(all_times, False),
        "rss_gb_min": round(min(all_rss), 3) if all_rss else None,
        "rss_gb_max": round(max(all_rss), 3) if all_rss else None,
        "evals": len(eval_rows),
        "truncated_lines_skipped": bad,
        "anomalies": anomalies,
        "segments": seg_reports,
    }


def main(out_dir: str) -> None:
    print(json.dumps(build_report(out_dir), indent=1))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/r4_soak")
