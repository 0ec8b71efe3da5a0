"""scripts/soak_report.py: the soak-evidence summarizer must survive the
exact failure modes the soak harness creates on purpose.

tpu_soak.sh SIGTERM-kills a launch mid-run and the watchdogs wrap launches in
``timeout`` (escalating to SIGKILL) — so metrics.jsonl can carry a truncated
JSON line with valid lines appended after it, and _step is FORWARD-ONLY
across a clean resume (the first row after a resume is already past the last
row before the kill), so segments must come from the soak.log launch markers,
not from step regressions.  The report is consumed as strict JSON
(soak_summary.json), so NaN tokens are forbidden.
"""

from __future__ import annotations

import importlib.util
import json
import math
from pathlib import Path

_path = Path(__file__).resolve().parents[1] / "scripts" / "soak_report.py"
_spec = importlib.util.spec_from_file_location("soak_report", _path)
soak_report = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(soak_report)


def _row(step: int, ms: float = 600.0, rss: float = 4.0) -> str:
    return json.dumps(
        {"train/iter": step, "train/batch_time_ms": ms, "system/ram_used_gb": rss, "_step": step}
    )


def _eval_row(step: int, loss: float) -> str:
    return json.dumps({"val/loss": loss, "_step": step})


def _render(tmp_path: Path, metrics: list[str], log: str) -> dict:
    (tmp_path / "metrics.jsonl").write_text("\n".join(metrics) + "\n")
    (tmp_path / "soak.log").write_text(log)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        soak_report.main(str(tmp_path))
    return json.loads(buf.getvalue())


def test_forward_only_steps_split_on_launch_markers(tmp_path):
    # launch 1 runs 100..300, killed at 300; launch 2 resumes and logs 400..600
    # — _step never goes backwards, the log markers are the only boundary
    metrics = [
        _row(100), _eval_row(100, 9.5), _row(200), _row(300), _eval_row(300, 9.0),
        _row(400), _eval_row(400, 9.05), _row(500), _row(600),
    ]
    log = (
        "=== soak launch 1 start 10:00:00 ===\n"
        "=== SIGTERM launch 1 (10:05:00)\n"
        "=== soak launch 1 exit rc=0 iter=300 10:05:30 ===\n"
        "=== soak launch 2 start 10:05:32 ===\n"
    )
    rep = _render(tmp_path, metrics, log)
    assert rep["launches"] == 2
    assert rep["sigterm_kills"] == 1
    assert [s["steps"] for s in rep["segments"]] == [[100, 300], [400, 600]]
    [b] = rep["relaunch_boundaries"]
    assert b["cut_iter"] == 300
    assert b["before"] == {"step": 300, "val_loss": 9.0}
    assert b["after"] == {"step": 400, "val_loss": 9.05}


def test_truncated_line_skipped_and_json_stays_strict(tmp_path):
    # a SIGKILL mid-write leaves a partial JSON line; later launches append
    # after it — the report must skip it, count it, and still be strict JSON
    metrics = [_row(100), '{"train/batch_time_ms": 612.0, "_st', _row(200)]
    log = "=== soak launch 1 start 10:00:00 ===\n"
    rep = _render(tmp_path, metrics, log)
    assert rep["truncated_lines_skipped"] == 1
    assert rep["iters_reached"] == 200
    assert [s["steps"] for s in rep["segments"]] == [[100, 200]]


def test_empty_metrics_yields_null_not_nan(tmp_path):
    # every launch dying in compile must yield null fields, never the
    # non-standard NaN token that breaks strict JSON consumers
    rep = _render(tmp_path, ['{"unrelated": 1}'], "")
    assert rep["iters_reached"] == 0
    assert rep["step_ms_global_first_q"] is None
    dumped = json.dumps(rep)
    assert "NaN" not in dumped
    assert not any(
        isinstance(v, float) and math.isnan(v) for v in rep.values() if isinstance(v, float)
    )
