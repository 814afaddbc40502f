"""The behavior-changed => head-of-rotation audit (VERDICT r9 item 2)
is itself gate-tested: a fingerprint drift on a tail query must fail
the audit, the committed ledger must cover the whole registry, and
the staged head must contain every currently-flagged name.

Pure subprocess tests over the committed ledger — no Spark session,
no --update, so nothing on disk changes.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _run(fp_path: Path) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "tools/rotation_audit.py",
         "--fingerprints", str(fp_path)],
        cwd=ROOT, capture_output=True, text=True)


def _ledger() -> dict:
    return json.loads(
        (ROOT / "query_fingerprint_ledger.json").read_text())


def test_ledger_covers_registry():
    sys.path.insert(0, str(ROOT))
    from tpg_weather_etl_spark.registry import all_queries
    assert set(_ledger()) == set(all_queries())


def test_unchanged_fingerprints_pass(tmp_path):
    led = _ledger()
    fp = {n: {"out": v["out"], "sql": v["sql"]} for n, v in led.items()}
    p = tmp_path / "fp.json"
    p.write_text(json.dumps(fp))
    r = _run(p)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "MISPLACED" not in r.stdout


def test_changed_tail_query_fails(tmp_path):
    """A query whose output fingerprint changed but which sits in the
    rotation TAIL (no driver re-check for rounds) must fail the
    audit — this is the exact lcg_bucket/deterministic_sample lag the
    tool exists to prevent."""
    sys.path.insert(0, str(ROOT))
    from tpg_weather_etl_spark.registry import _RUN_LAST
    led = _ledger()
    fp = {n: {"out": v["out"], "sql": v["sql"]} for n, v in led.items()}
    victim = _RUN_LAST[0]
    fp[victim]["out"] = "0" * 16
    p = tmp_path / "fp.json"
    p.write_text(json.dumps(fp))
    r = _run(p)
    assert r.returncode == 1, r.stdout + r.stderr
    assert victim in r.stdout and "MISPLACED" in r.stdout


def test_changed_oracle_sql_also_flags(tmp_path):
    """The fingerprint covers the oracle SQL too: silently editing an
    oracle without a driver re-check is the same staleness hazard."""
    sys.path.insert(0, str(ROOT))
    from tpg_weather_etl_spark.registry import _RUN_LAST
    led = _ledger()
    fp = {n: {"out": v["out"], "sql": v["sql"]} for n, v in led.items()}
    victim = _RUN_LAST[-1]
    fp[victim]["sql"] = "f" * 16
    p = tmp_path / "fp.json"
    p.write_text(json.dumps(fp))
    r = _run(p)
    assert r.returncode == 1
    assert victim in r.stdout
