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


def quartile_mean(xs: list[float], first: bool) -> float:
    if not xs:
        return float("nan")
    q = max(1, len(xs) // 4)
    sel = xs[:q] if first else xs[-q:]
    return sum(sel) / len(sel)


def main(out_dir: str) -> None:
    out = Path(out_dir)
    rows = [json.loads(l) for l in (out / "metrics.jsonl").open()]

    # launch boundaries: _step goes backwards (resume re-logs from the
    # restored iteration) or the soak.log launch markers; infer from steps.
    train_rows = [r for r in rows if "train/batch_time_ms" in r]
    eval_rows = [r for r in rows if "val/loss" in r]

    segments: list[list[dict]] = [[]]
    for prev, cur in zip([None, *train_rows], train_rows):
        if prev is not None and cur["_step"] <= prev["_step"]:
            segments.append([])
        segments[-1].append(cur)

    seg_reports = []
    for i, seg in enumerate(segments, 1):
        times = [r["train/batch_time_ms"] for r in seg]
        rss = [r.get("system/ram_used_gb") for r in seg if r.get("system/ram_used_gb")]
        seg_reports.append(
            {
                "launch": i,
                "steps": [seg[0]["_step"], seg[-1]["_step"]] if seg else [],
                "logs": len(seg),
                "step_ms_first_q": round(quartile_mean(times, True), 2),
                "step_ms_last_q": round(quartile_mean(times, False), 2),
                "rss_gb_first": round(rss[0], 3) if rss else None,
                "rss_gb_last": round(rss[-1], 3) if rss else None,
            }
        )

    # eval continuity at relaunch boundaries: the first eval loss after a
    # resume must be within tol of the last eval loss before the cut
    # (training state really round-tripped, not restarted)
    boundaries = []
    for prev, cur in zip([None, *eval_rows], eval_rows):
        if prev is not None and cur["_step"] <= prev["_step"]:
            boundaries.append(
                {
                    "before": {"step": prev["_step"], "val_loss": round(prev["val/loss"], 4)},
                    "after": {"step": cur["_step"], "val_loss": round(cur["val/loss"], 4)},
                }
            )

    log = (out / "soak.log").read_text() if (out / "soak.log").exists() else ""
    sigterms = len(re.findall(r"=== SIGTERM launch", log))
    launches = len(re.findall(r"=== soak launch \d+ start", log))

    all_times = [r["train/batch_time_ms"] for r in train_rows]
    all_rss = [r["system/ram_used_gb"] for r in train_rows if r.get("system/ram_used_gb")]
    report = {
        "iters_reached": train_rows[-1]["_step"] if train_rows else 0,
        "launches": launches,
        "sigterm_kills": sigterms,
        "relaunch_boundaries": boundaries,
        "step_ms_global_first_q": round(quartile_mean(all_times, True), 2),
        "step_ms_global_last_q": round(quartile_mean(all_times, False), 2),
        "rss_gb_min": round(min(all_rss), 3) if all_rss else None,
        "rss_gb_max": round(max(all_rss), 3) if all_rss else None,
        "evals": len(eval_rows),
        "segments": seg_reports,
    }
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/r4_soak")
