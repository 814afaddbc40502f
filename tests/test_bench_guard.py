"""Pin tools/bench_guard.py's baseline selection.

Round 11's driver bench ran on a contended box and recorded
interval_join at 29.6s vs 0.94s the round before — a 25x outlier on
unchanged code. bench_guard compares fresh runs against the NEWEST
record, so without a contamination check the inflated record becomes
the next baseline and masks real regressions for a round (VERDICT
r11 item 3). These tests pin the rejection logic with synthetic
records — no Spark involved.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.bench_guard import (  # noqa: E402
    CONTAMINATION_X, MIN_DELTA_SEC, select_baseline)


def _write(root: Path, rnd: int, queries: dict[str, float]) -> Path:
    p = root / f"BENCH_r{rnd:02d}.json"
    p.write_text(json.dumps({"queries": queries}))
    return p


def test_clean_newest_record_is_selected(tmp_path):
    _write(tmp_path, 1, {"a": 1.0, "b": 2.0})
    newest = _write(tmp_path, 2, {"a": 1.2, "b": 1.8})
    assert select_baseline(tmp_path) == newest


def test_contaminated_newest_record_is_skipped(tmp_path):
    prior = _write(tmp_path, 10, {"interval_join": 0.94, "b": 2.0})
    # the r11 shape: one query 25x its prior time on unchanged code
    _write(tmp_path, 11, {"interval_join": 29.64, "b": 2.1})
    assert select_baseline(tmp_path) == prior


def test_small_absolute_jumps_are_not_contamination(tmp_path):
    # sub-second queries jitter far beyond 4x run-to-run; only a
    # ratio AND magnitude breach rejects (same rule the regression
    # gate itself uses).
    _write(tmp_path, 1, {"a": 0.10, "b": 2.0})
    newest = _write(tmp_path, 2,
                    {"a": 0.10 * (CONTAMINATION_X + 1), "b": 2.0})
    assert 0.10 * (CONTAMINATION_X + 1) - 0.10 < MIN_DELTA_SEC
    assert select_baseline(tmp_path) == newest


def test_skip_walks_back_past_consecutive_contamination(tmp_path):
    clean = _write(tmp_path, 1, {"a": 1.0, "b": 1.0})
    _write(tmp_path, 2, {"a": 9.0, "b": 1.0})   # contaminated vs r1
    _write(tmp_path, 3, {"a": 9.1, "b": 8.0})   # contaminated vs r2
    assert select_baseline(tmp_path) == clean


def test_oldest_record_is_last_resort(tmp_path):
    only = _write(tmp_path, 1, {"a": 1.0})
    assert select_baseline(tmp_path) == only
    assert select_baseline(tmp_path / "empty") is None
