#!/usr/bin/env python
"""Full-catalog correctness sweep, replicating the driver's harness locally:
run every ``queries()`` key at sf0.01 and compare against its ``oracle_sql()``
via DuckDB — row count, sorted column names, and order-insensitive values
(floats canonicalized to 9 significant digits). Rows-only keys are executed
and reported as ``rows_only`` (the driver's weaker check).

Usage:  python scripts/sweep_oracle.py [sf_dir]        # default sf0.01
Exit code 0 iff every oracled key matches and every rows-only key runs.
"""

from __future__ import annotations

import datetime as dt
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(f"{v:.9g}") if v != 0 else 0.0
    if isinstance(v, (dt.datetime, dt.date)):
        return str(v)
    if isinstance(v, list):
        return tuple(_canon(x) for x in v)
    return v


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # optional second arg: comma-separated key subset (giant-replica spot
    # sweeps, where the heavyweight sketch oracles — HUGEINT minhash over
    # 500k docs — would take hours in DuckDB; default remains ALL keys)
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

    import duckdb

    from airflow_etl_elt_spark import TABLES
    from airflow_etl_elt_spark.queries import ORACLE_SQL, QUERIES
    from airflow_etl_elt_spark.session import get_session

    spark = get_session(app_name="sweep")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        # Spark-written tables (the scale replicas) are DIRECTORIES of part
        # files; the driver fixtures are single files. Same handling as
        # bench.py's oracle setup.
        if os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failures = []
    for key in QUERIES:
        if only is not None and key not in only:
            continue
        try:
            sdf = QUERIES[key](spark, sf)
            scols = sorted(sdf.columns)
            srows = sorted(
                (tuple(_canon(r[c]) for c in scols) for r in sdf.collect()),
                key=str,
            )
        except Exception as exc:
            failures.append((key, f"spark error: {exc}"))
            print(f"FAIL {key}: spark error: {str(exc)[:200]}")
            continue
        sql = ORACLE_SQL.get(key)
        if sql is None:
            print(f"ok   {key} (rows_only, {len(srows)} rows)")
            continue
        try:
            # fetchall, not .df(): pandas coerces NULL doubles to NaN and
            # DATE to Timestamp, which would false-flag NULL/date columns
            rel = con.sql(sql)
            cols = [d[0] for d in rel.description]
            order = sorted(range(len(cols)), key=lambda i: cols[i])
            ocols = sorted(cols)
            orows = sorted(
                (tuple(_canon(row[i]) for i in order) for row in rel.fetchall()),
                key=str,
            )
        except Exception as exc:
            failures.append((key, f"oracle error: {exc}"))
            print(f"FAIL {key}: oracle error: {str(exc)[:200]}")
            continue
        if scols != ocols:
            failures.append((key, f"schema {scols} != {ocols}"))
            print(f"FAIL {key}: schema {scols} != {ocols}")
        elif len(srows) != len(orows):
            failures.append((key, f"rows {len(srows)} != {len(orows)}"))
            print(f"FAIL {key}: rows {len(srows)} != {len(orows)}")
        elif srows != orows:
            diff = next(
                (i for i, (a, b) in enumerate(zip(srows, orows)) if a != b), -1
            )
            failures.append((key, f"values differ at sorted row {diff}"))
            print(f"FAIL {key}: values differ, e.g. row {diff}:")
            if diff >= 0:
                print(f"  spark:  {srows[diff]}")
                print(f"  oracle: {orows[diff]}")
        else:
            print(f"ok   {key} ({len(srows)} rows)")
    spark.stop()
    n = len(only) if only is not None else len(QUERIES)
    print(f"\n{n - len(failures)}/{n} keys clean")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
