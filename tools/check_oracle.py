"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on
DuckDB over the same parquet tables, then compares row count, column
names, and an order-insensitive value comparison (rows sorted by all
columns after sorting columns by name). Reports per-query PASS/FAIL
with a diff sample on mismatch.

Usage: python tools/check_oracle.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from datetime import date, datetime
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style canonicalization: exact repr of the double
        return repr(v)
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return repr(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(canon(r[i]) for i in order))
    out.sort()
    return [cols[i] for i in order], out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--ntz", action="store_true",
                    help="force TIMESTAMP_NTZ parquet inference on, "
                         "bypassing the session defaults, to prove the "
                         "gate survives the hostile read path")
    ap.add_argument("--fingerprints", default=None, metavar="PATH",
                    help="write per-query output fingerprints (sha1 of "
                         "canonicalized columns+rows, plus sha1 of the "
                         "oracle SQL) to PATH — consumed by "
                         "tools/rotation_audit.py to detect queries "
                         "whose behavior changed after their latest "
                         "driver correctness row")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    # dynamic oracles (kmeans centers CTE) must be built against the
    # same data the DuckDB views read
    import os
    os.environ["SPARK_GRAFT_ORACLE_SF"] = args.sf

    import __spark_entry__ as entry_mod
    from tpg_weather_etl_spark.session import get_spark

    spark = get_spark(app_name="check_oracle")
    con = duckdb.connect()
    for tname in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {tname} AS "
            f"SELECT * FROM read_parquet('{args.sf}/{tname}.parquet')"
        )

    if args.ntz:
        # raw registry callables: the entry-module wrapper re-applies
        # session defaults, which would flip NTZ inference back off
        from tpg_weather_etl_spark.registry import all_oracles, all_queries
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled",
                       "true")
        qs, oracles = all_queries(), all_oracles()
    else:
        qs = entry_mod.queries()
        oracles = entry_mod.oracle_sql()
    names = args.names or list(qs)
    n_pass = n_fail = 0
    fingerprints: dict[str, dict[str, str]] = {}
    for name in names:
        if name not in qs:
            print(f"  {name}: NO SUCH QUERY")
            n_fail += 1
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            print(f"✗ {name}: SPARK ERROR: {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        t_spark = time.time() - t0
        if args.fingerprints:
            import hashlib
            ccols, crows = canon_rows(scols, srows)
            h = hashlib.sha1(repr(ccols).encode())
            for r in crows:
                h.update(repr(r).encode())
            fingerprints[name] = {
                "out": h.hexdigest()[:16],
                "sql": hashlib.sha1(
                    oracles.get(name, "").encode()).hexdigest()[:16],
            }
        if name not in oracles:
            print(f"~ {name}: rows-only ({len(srows)} rows, {t_spark:.1f}s) — no oracle")
            n_pass += 1
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as exc:
            print(f"✗ {name}: ORACLE ERROR: {type(exc).__name__}: {exc}")
            n_fail += 1
            continue

        problems = []
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
        # dtype parity: map Spark simpleStrings onto DuckDB type names so
        # a strict driver-side schema compare cannot trip on e.g.
        # HUGEINT sums or int32-vs-BIGINT lengths.
        _MAP = {"bigint": "BIGINT", "int": "INTEGER", "smallint": "SMALLINT",
                "double": "DOUBLE", "float": "FLOAT", "string": "VARCHAR",
                "boolean": "BOOLEAN", "timestamp": "TIMESTAMP",
                "date": "DATE", "array<float>": "FLOAT[]",
                "array<double>": "DOUBLE[]"}
        sdt = {f.name: f.dataType.simpleString() for f in sdf.schema.fields}
        try:
            odt = {r[0]: r[1] for r in con.execute(
                f"DESCRIBE {oracles[name]}").fetchall()}
        except Exception:
            odt = {}
        for c in set(sdt) & set(odt):
            want = _MAP.get(sdt[c])
            if want and odt[c] != want:
                problems.append(f"dtype[{c}] spark={sdt[c]} oracle={odt[c]}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            _, sc = canon_rows(scols, srows)
            _, oc = canon_rows(ocols, orows)
            if sc != oc:
                ndiff = sum(1 for a, b in zip(sc, oc) if a != b)
                problems.append(f"values differ in {ndiff}/{len(sc)} rows")
                for a, b in zip(sc, oc):
                    if a != b:
                        problems.append(f"  spark : {a}")
                        problems.append(f"  oracle: {b}")
                        break
        if problems:
            print(f"✗ {name} ({t_spark:.1f}s):")
            for p in problems:
                print(f"    {p}")
            n_fail += 1
        else:
            print(f"✓ {name} ({len(srows)} rows, {t_spark:.1f}s)")
            n_pass += 1

    if args.fingerprints:
        import json
        Path(args.fingerprints).write_text(
            json.dumps(fingerprints, indent=1, sort_keys=True) + "\n")
        print(f"fingerprints for {len(fingerprints)} queries -> "
              f"{args.fingerprints}")

    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
