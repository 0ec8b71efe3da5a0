"""Summarize a tpu_soak.sh run into one JSON report (stability evidence).

Reads $OUT/metrics.jsonl + $OUT/soak.log and reports, per launch segment:
step-time mean of the first vs last quartile (drift), host RSS first/last
(growth), and across the whole soak: eval-loss continuity at relaunch
boundaries (no loss jump on resume), relaunch count, SIGTERM recovery.

≙ the reference's 24 h relaunch protocol (train.py:857-862, 1074-1079);
the reference ships no stability harness — this is our own bar.
"""

from __future__ import annotations

import json
import re
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


def main(out_dir: str) -> None:
    out = Path(out_dir)
    # a SIGTERM/SIGKILL landing mid f.write() leaves a truncated JSON line
    # that the next launch appends after — skip it, don't lose the report
    rows, bad = [], 0
    for l in (out / "metrics.jsonl").open():
        try:
            rows.append(json.loads(l))
        except json.JSONDecodeError:
            bad += 1

    train_rows = [r for r in rows if "train/batch_time_ms" in r]
    eval_rows = [r for r in rows if "val/loss" in r]

    # launch boundaries: _step is forward-only across a clean resume (the
    # first row after a resume is already past the last row before the kill),
    # so steps alone can't split segments — use the soak.log exit markers
    # ("=== soak launch N exit rc=0 iter=XXXX"); every exit followed by a
    # subsequent launch start is a relaunch boundary at that iteration.
    log = (out / "soak.log").read_text() if (out / "soak.log").exists() else ""
    exit_iters = [int(m) for m in re.findall(r"=== soak launch \d+ exit rc=\d+ iter=(\d+)", log)]
    launches = len(re.findall(r"=== soak launch \d+ start", log))
    boundary_iters = exit_iters[: launches - 1] if launches > 1 else []

    segments: list[list[dict]] = [[] for _ in range(len(boundary_iters) + 1)]
    for r in train_rows:
        seg_idx = sum(1 for b in boundary_iters if r["_step"] > b)
        segments[seg_idx].append(r)

    seg_reports = []
    for i, seg in enumerate(segments, 1):
        times = [r["train/batch_time_ms"] for r in seg]
        rss = [r.get("system/ram_used_gb") for r in seg if r.get("system/ram_used_gb")]
        seg_reports.append(
            {
                "launch": i,
                "steps": [seg[0]["_step"], seg[-1]["_step"]] if seg else [],
                "logs": len(seg),
                "step_ms_first_q": quartile_mean(times, True),
                "step_ms_last_q": quartile_mean(times, False),
                "rss_gb_first": round(rss[0], 3) if rss else None,
                "rss_gb_last": round(rss[-1], 3) if rss else None,
            }
        )

    # eval continuity at relaunch boundaries: the first eval loss after a
    # resume must be within tol of the last eval loss before the cut
    # (training state really round-tripped, not restarted)
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

    sigterms = len(re.findall(r"=== SIGTERM launch", log))

    all_times = [r["train/batch_time_ms"] for r in train_rows]
    all_rss = [r["system/ram_used_gb"] for r in train_rows if r.get("system/ram_used_gb")]
    report = {
        "iters_reached": train_rows[-1]["_step"] if train_rows else 0,
        "launches": launches,
        "sigterm_kills": sigterms,
        "relaunch_boundaries": boundaries,
        "step_ms_global_first_q": quartile_mean(all_times, True),
        "step_ms_global_last_q": quartile_mean(all_times, False),
        "rss_gb_min": round(min(all_rss), 3) if all_rss else None,
        "rss_gb_max": round(max(all_rss), 3) if all_rss else None,
        "evals": len(eval_rows),
        "truncated_lines_skipped": bad,
        "segments": seg_reports,
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/r4_soak")
