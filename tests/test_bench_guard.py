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


def test_consecutive_similarly_inflated_records_are_rejected(tmp_path):
    """Two back-to-back contaminated rounds with SIMILAR inflated
    times show no adjacent outlier (r3 vs r2: 26s vs 25s) — the
    min-anchor over the last CONTAMINATION_LOOKBACK records still
    catches both against the clean floor."""
    clean = _write(tmp_path, 1, {"a": 1.0, "b": 1.0})
    _write(tmp_path, 2, {"a": 25.0, "b": 1.0})   # contention round 1
    _write(tmp_path, 3, {"a": 26.0, "b": 1.1})   # same contention
    assert select_baseline(tmp_path) == clean


def test_median_record_with_repeat_metadata_parses(tmp_path):
    """BENCH_r13+ records carry `repeat` + `samples` alongside the
    median `queries` map (bench.py repeat mode); the parser must
    return the medians untouched and selection must accept it."""
    from tools.bench_guard import load_recorded
    p = tmp_path / "BENCH_r13.json"
    p.write_text(json.dumps({
        "metric": "headline_total", "value": 10.0, "unit": "sec",
        "queries": {"a": 4.0, "b": 6.0}, "sf": 0.1,
        "repeat": {"n": 3, "min_sec": 3.0},
        "samples": {"a": [4.0, 29.0, 3.9], "b": [6.0, 6.1, 5.9]},
    }))
    assert load_recorded(p)["queries"] == {"a": 4.0, "b": 6.0}
    _write(tmp_path, 12, {"a": 4.1, "b": 5.8})
    assert select_baseline(tmp_path) == p


def test_accepted_regression_stamp_exempts_contamination(tmp_path):
    """ADVICE r13: a deliberate >=4x code-change slowdown must not get
    every post-change record rejected as contaminated. A record
    carrying the query in `accepted_regressions` is selectable; the
    identical record WITHOUT the stamp is rejected."""
    _write(tmp_path, 1, {"a": 1.0, "b": 2.0})
    unstamped = _write(tmp_path, 2, {"a": 9.0, "b": 2.0})
    assert select_baseline(tmp_path) != unstamped

    stamped = tmp_path / "BENCH_r03.json"
    stamped.write_text(json.dumps({
        "queries": {"a": 9.1, "b": 2.1},
        "accepted_regressions": {"a": "extra verify pass (r14 fix)"},
    }))
    assert select_baseline(tmp_path) == stamped


def test_accepted_regression_stamp_survives_compact_decode(tmp_path):
    """The stamp must round-trip through the compact times-array
    record format (the only copy the driver durably keeps)."""
    from tools.bench_guard import load_recorded
    names = tmp_path.parent / "x"  # manifest lives at repo root; the
    # compact decode falls back to the named subset when absent
    del names
    p = tmp_path / "BENCH_r04.json"
    p.write_text(json.dumps({
        "queries": {"a": 9.0}, "times": [9.0],
        "names": "BENCH_names.json", "n_timed": 1,
        "accepted_regressions": ["a"],
    }))
    rec = load_recorded(p)
    assert rec.get("accepted_regressions") == ["a"]


def test_unstamped_contamination_still_rejected_alongside_stamp(tmp_path):
    """A stamp on one query must not excuse contamination on another."""
    _write(tmp_path, 1, {"a": 1.0, "b": 1.0})
    mixed = tmp_path / "BENCH_r02.json"
    mixed.write_text(json.dumps({
        "queries": {"a": 9.0, "b": 25.0},
        "accepted_regressions": {"a": "signed"},
    }))
    assert select_baseline(tmp_path) != mixed


def test_cross_epoch_detection_by_mtime(tmp_path):
    """Epoch fence (round 14): a record whose mtime predates the
    current boot was measured under a host profile this boot may not
    share (measured: a mid-round reboot shifted stage-overhead-heavy
    queries 2.5-3.5x on unchanged code while canaries moved 1.36x)."""
    import os

    from tools.bench_guard import boot_time, record_is_cross_epoch

    bt = boot_time()
    assert bt > 0
    fresh = _write(tmp_path, 1, {"a": 1.0})
    assert not record_is_cross_epoch(fresh)
    stale = _write(tmp_path, 2, {"a": 1.0})
    os.utime(stale, (bt - 3600, bt - 3600))
    assert record_is_cross_epoch(stale)


def test_same_epoch_record_preferred_over_newer_cross_epoch(tmp_path):
    """A clean record measured under the CURRENT boot beats a newer
    (by round) pre-reboot record: strict 2x gating is only valid
    within one epoch."""
    import os

    from tools.bench_guard import boot_time, select_baseline

    bt = boot_time()
    same_epoch = _write(tmp_path, 2, {"a": 1.0, "b": 2.0})
    newer_cross = _write(tmp_path, 3, {"a": 1.1, "b": 2.1})
    _write(tmp_path, 1, {"a": 1.0, "b": 2.0})  # floor donor
    os.utime(newer_cross, (bt - 3600, bt - 3600))
    assert select_baseline(tmp_path) == same_epoch


def test_cross_epoch_fallback_when_no_same_epoch_record(tmp_path):
    """With only pre-reboot records the newest clean one still wins
    (main() then relaxes the per-query gate, not the selection)."""
    import os

    from tools.bench_guard import boot_time, select_baseline

    bt = boot_time()
    a = _write(tmp_path, 1, {"a": 1.0, "b": 2.0})
    b = _write(tmp_path, 2, {"a": 1.1, "b": 2.1})
    for p in (a, b):
        os.utime(p, (bt - 3600, bt - 3600))
    assert select_baseline(tmp_path) == b


def test_breaches_normalized_and_raw_paths():
    from tools.bench_guard import breaches

    # normalized breach: 10s vs 2s floor at canary 1.0
    assert breaches("q", 2.0, 10.0, 1.0, 2.0, 4.0)
    # same raw time excused by a genuine uniform box ratio
    assert breaches("q", 2.0, 10.0, 3.0, 2.0, 6.0) is None
    # raw catastrophe backstop fires even when normalization excuses
    assert breaches("q", 2.0, 13.0, 3.0, 2.0, 4.0)
    # magnitude guard: sub-second jitter never fails
    assert breaches("q", 0.1, 0.9, 1.0, 2.0, 4.0) is None


def test_confirm_pass_clears_transient_and_keeps_reproducing(tmp_path):
    """Round-14 confirmation doctrine: a flagged breach must
    REPRODUCE in an independent re-run to fail the guard — 'a jump
    that disappears in the next fresh run is contention, not code'
    applied to the live gate."""
    from bench import CANARIES
    from tools.bench_guard import breaches, confirm_suspects

    old_q = {"transient": 2.0, "real": 2.0, CANARIES[0]: 1.0}
    suspects = {
        "transient": breaches("transient", 2.0, 9.0, 1.0, 2.0, 4.0),
        "real": breaches("real", 2.0, 9.0, 1.0, 2.0, 4.0),
    }
    assert all(suspects.values())

    def fake_runner(names):
        assert "transient" in names and "real" in names
        assert CANARIES[0] in names  # self-normalizing re-run
        return {"transient": 2.1, "real": 8.8, CANARIES[0]: 1.0}

    confirmed = confirm_suspects(suspects, old_q, 2.0, 4.0,
                                 runner=fake_runner)
    assert "transient" not in confirmed
    assert "real" in confirmed and "CONFIRMED" in confirmed["real"]


def test_confirm_pass_failure_keeps_original_flags():
    from tools.bench_guard import confirm_suspects

    suspects = {"q": "q: breach"}
    confirmed = confirm_suspects(suspects, {"q": 2.0}, 2.0, 4.0,
                                 runner=lambda names: {})
    assert confirmed == suspects
