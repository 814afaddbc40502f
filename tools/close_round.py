"""One-command round close: runs every evidence gate in sequence and
prints a single summary block for SURVEY.

Order (fail-fast, each step's artifact still written on failure):
1. full oracle gate, plain, sf0.01    (tools/check_oracle.py)
2. full oracle gate, forced NTZ      (tools/check_oracle.py --ntz)
3. full oracle gate, sf0.001 + output fingerprints
4. rotation audit: behavior-changed queries must lead the rotation
   (tools/rotation_audit.py, fed by step 3's fingerprints)
5. bench + regression guard          (tools/bench_guard.py)
6. graph-loop bench + guard          (tools/bench_graph.py)
7. similarity skew stress, 50k docs  (tools/stress_similarity.py)
8. giant-cluster stress              (tools/stress_similarity.py --giant)

Steps 1-3 are the triple gate (VERDICT r6 item 4): every registry
query at plain sf0.01, NTZ sf0.01, and sf0.001 from ONE command.

The full pytest suite is deliberately NOT here — run it separately
(it's 20+ minutes and CI's job); this script is the 15-minute
"is the round closable" check.

Usage: python tools/close_round.py [--skip-stress]
"""

from __future__ import annotations

import argparse
import re
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def run(label: str, cmd: list[str]) -> tuple[bool, str]:
    t0 = time.perf_counter()
    p = subprocess.run([sys.executable, *cmd], cwd=ROOT,
                       capture_output=True, text=True)
    dt = time.perf_counter() - t0
    tail = "\n".join((p.stdout or "").strip().splitlines()[-3:])
    ok = p.returncode == 0
    print(f"[{'OK' if ok else 'FAIL'}] {label} ({dt:.0f}s)")
    return ok, tail


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-stress", action="store_true",
                    help="skip the two stress runs (~4 min)")
    args = ap.parse_args()

    results: list[tuple[str, bool, str]] = []

    def step(label, cmd):
        ok, tail = run(label, cmd)
        results.append((label, ok, tail))
        return ok

    step("oracle gate (plain)", ["tools/check_oracle.py"])
    step("oracle gate (--ntz)", ["tools/check_oracle.py", "--ntz"])
    step("oracle gate (sf0.001)",
         ["tools/check_oracle.py", "--sf", "/root/testdata/sf0.001",
          "--fingerprints", "/tmp/query_fp_sf0001.json"])
    # behavior-changed => head-of-rotation policy, made mechanical
    # (VERDICT r9 item 2): any query whose sf0.001 output fingerprint
    # or oracle SQL changed after its latest driver row must be in
    # _RUN_FIRST's 50-name driver window.
    step("rotation audit (changed=>head)",
         ["tools/rotation_audit.py",
          "--fingerprints", "/tmp/query_fp_sf0001.json", "--update"])
    step("bench + guard", ["tools/bench_guard.py"])
    step("graph bench + guard", ["tools/bench_graph.py"])
    if not args.skip_stress:
        step("similarity stress (50k)", ["tools/stress_similarity.py"])
        step("giant-cluster stress",
             ["tools/stress_similarity.py", "--giant"])

    print("\n===== round close summary =====")
    all_ok = True
    for label, ok, tail in results:
        all_ok &= ok
        m = re.search(r"(\d+) pass, (\d+) fail", tail)
        line = m.group(0) if m else tail.splitlines()[-1][:100] if tail \
            else ""
        print(f"  {'✓' if ok else '✗'} {label}: {line}")
    print("ROUND " + ("CLOSABLE" if all_ok else "NOT CLOSABLE"))
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
