"""Local stand-in for the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() twin on DuckDB at sf0.01,
compare row count, column names, and order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [--json OUT.json] [query ...]
"""

from __future__ import annotations

import math
import sys
from collections import Counter
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from hydra_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    # Tag numerics by kind (int vs float) — the driver's hash gate compares
    # typed values, so DuckDB HUGEINT→float64 vs Spark BIGINT must FAIL here
    # too (the r2 `simhash` bug was invisible to an untyped compare).
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", round(v, 9))
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    return v


def main():
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])
    report = {}
    spark = get_spark(cores=8, app="oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sorted(sdf.columns)
        if name not in oracles:
            print(f"  {name:28s} rows-only: {len(srows)} rows, cols={scols}")
            continue
        ddf = con.sql(oracles[name])
        dcols_raw = [c for c in ddf.columns]
        drows = ddf.fetchall()
        dcols = sorted(dcols_raw)
        ok_cols = scols == dcols
        s_ms = Counter(
            tuple(norm(r[c]) for c in scols) for r in (row.asDict() for row in srows)
        )
        d_ms = Counter(
            tuple(norm(dict(zip(dcols_raw, row))[c]) for c in dcols) for row in drows
        )
        ok = ok_cols and s_ms == d_ms
        status = "OK " if ok else "FAIL"
        print(f"  {name:28s} {status} spark={len(srows)} duck={len(drows)} cols_match={ok_cols}")
        report[name] = {
            "rows_match": len(srows) == len(drows),
            "schema_match": ok_cols,
            "hash_match": ok,
            "spark_rows": len(srows),
            "oracle_rows": len(drows),
            "err": None,
        }
        if not ok:
            failures.append(name)
            only_s = list((s_ms - d_ms).items())[:3]
            only_d = list((d_ms - s_ms).items())[:3]
            print(f"    spark-only: {only_s}")
            print(f"    duck-only : {only_d}")
    print("FAILURES:", failures if failures else "none")
    if json_out:
        import json as _json

        with open(json_out, "w") as f:
            _json.dump(report, f, indent=2)
        print(f"wrote {json_out} ({len(report)} queries)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
