"""Mechanical "behavior-changed => head of rotation" audit.

Round 9 proved a code fix can change a gate query's OUTPUT
(`lcg_bucket`'s parity bug changed `deterministic_sample` /
`train_test_split`) while the staleness-driven rotation left the
query's old driver row unrefreshed for rounds. This tool makes the
VERDICT r9 item-2 policy mechanical, with no git archaeology:

- ``tools/check_oracle.py --fingerprints`` dumps, per query, a sha1
  of the canonicalized sf0.001 output (columns + sorted rows) and a
  sha1 of the oracle SQL text. The output hash changes whenever the
  query's behavior changes — including through shared helpers the
  query's own source never mentions (exactly the lcg_bucket case).
- A committed LEDGER (``query_fingerprint_ledger.json``) maps each
  name to its fingerprint and the round in which that fingerprint
  was first observed.
- The latest DRIVER row per name comes from ``CORRECTNESS_r*.json``.
- A query is DRIVER-STALE-CHANGED when its fingerprint round is
  newer than its latest driver row (or it has never had one). Every
  such name must sit in the registry's ``_RUN_FIRST`` (the 50-name
  driver cap window); otherwise exit 1.

Caveat (documented, accepted): fingerprints are taken at sf0.001, so
a behavior change that only manifests at larger SFs is invisible
here — the triple gate (sf0.01 plain + NTZ) still catches it as a
correctness failure; this audit only orders the rotation.

Usage:
  python tools/rotation_audit.py --fingerprints FP.json [--update]

``--update`` rewrites the ledger with newly observed fingerprints
(stamped with the current round = max CORRECTNESS round + 1); without
it the ledger is compared read-only. close_round runs with --update.
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
LEDGER = ROOT / "query_fingerprint_ledger.json"


def current_round() -> int:
    rounds = [int(re.search(r"r(\d+)", p.name).group(1))
              for p in ROOT.glob("CORRECTNESS_r[0-9]*.json")]
    return (max(rounds) + 1) if rounds else 1


def latest_driver_rows() -> dict[str, int]:
    """name -> newest round with ANY driver correctness row."""
    latest: dict[str, int] = {}
    for p in sorted(ROOT.glob("CORRECTNESS_r[0-9]*.json")):
        n = int(re.search(r"r(\d+)", p.name).group(1))
        try:
            data = json.loads(p.read_text())
        except ValueError:
            continue
        for name in data:
            latest[name] = max(latest.get(name, 0), n)
    return latest


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fingerprints", required=True, type=Path,
                    help="file written by check_oracle --fingerprints "
                         "(full registry, sf0.001)")
    ap.add_argument("--update", action="store_true",
                    help="persist newly observed fingerprints to the "
                         "ledger (stamped with the current round)")
    args = ap.parse_args()

    fresh = json.loads(args.fingerprints.read_text())
    try:
        ledger = json.loads(LEDGER.read_text())
    except (OSError, ValueError):
        ledger = {}

    rnd = current_round()
    changed: dict[str, int] = {}
    for name, fp in fresh.items():
        old = ledger.get(name)
        if old is None or (old["out"], old["sql"]) != (fp["out"],
                                                       fp["sql"]):
            ledger[name] = {**fp, "round": rnd}
        changed[name] = ledger[name]["round"]

    driver = latest_driver_rows()
    stale = sorted(n for n, r in changed.items()
                   if r > driver.get(n, 0))

    sys.path.insert(0, str(ROOT))
    from tpg_weather_etl_spark.registry import _RUN_FIRST
    head = set(_RUN_FIRST)
    misplaced = [n for n in stale if n not in head]

    print(f"driver-stale changed queries: {stale}")
    if stale:
        print(f"  (fingerprint newer than latest driver row; all must "
              f"be in _RUN_FIRST's 50-name driver window)")
    if misplaced:
        print(f"MISPLACED (not in _RUN_FIRST): {misplaced}")

    if args.update:
        LEDGER.write_text(
            json.dumps(ledger, indent=1, sort_keys=True) + "\n")
        print(f"ledger updated: {len(ledger)} names -> {LEDGER.name}")

    return 1 if misplaced else 0


if __name__ == "__main__":
    raise SystemExit(main())
