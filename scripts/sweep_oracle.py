#!/usr/bin/env python
"""Full-catalog correctness sweep, replicating the driver's harness locally:
run every ``queries()`` key at sf0.01 and compare against its ``oracle_sql()``
via DuckDB — row count, sorted column names, and order-insensitive values
(floats canonicalized to 9 significant digits). Rows-only keys are executed
and reported as ``rows_only`` (the driver's weaker check).

Usage:  python scripts/sweep_oracle.py [sf_dir]        # default sf0.01
Exit code 0 iff every oracled key matches and every rows-only key runs.

Float-aggregate epsilon mode (SWEEP_FLOAT_EPS=1; SCALING r7 addendum 6,
VERDICT r7 next-step 3): exact value-hash comparison of float AGGREGATES has
a resolution floor that shrinks with addend count — the engines sum in
different orders, and at the 100x replica the accumulated rounding first
crossed the 9-significant-digit canonicalization (tpch_q10: 2e-9 relative on
a ~5.2e7 sum of thousands of doubles). With the flag set, a key whose EXACT
comparison fails on values gets a second, epsilon-aware pass: rows are
paired on their non-float columns (the group keys), non-float columns must
still match exactly, and each float column must satisfy
``|a-b| <= eps_rel(key) * max(|a|,|b|)`` where

    eps_rel(key) = 1e-12 * n_addends(key)
    n_addends(key) = max-view-rowcount / max(1, output-rows)

i.e. the per-addend drift budget is ~4500 ulp — orders of magnitude above
any observed associativity drift per addend (tpch_q10 at 100x needed ~5e-13)
and orders of magnitude below a logic bug (a wrong filter or join moves
values by >=1e-6 relative; tests/test_sweep_eps.py pins that an injected
divergence still fails). The epsilon actually used is printed per key, so
every epsilon acceptance is documented in the committed sweep output. The
driver's own harness is untouched — this flag exists for the giant-replica
sweeps only; exact comparison remains the default.
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


#: per-addend relative drift budget for the epsilon pass — ~4500 ulp of a
#: double, scaled by the estimated addend count per output row (see module
#: docstring). Deliberately a constant, not tunable per run: the committed
#: sweep outputs stay comparable across rounds.
EPS_PER_ADDEND = 1e-12

#: hard ceiling on the derived eps_rel (ADVICE r8, medium): n_addends =
#: max-view-rows / output-rows wildly overestimates real addend counts for
#: small-output keys (the committed 100x spot sweep accepted tpch_q10 under
#: eps_rel=3e-06 — above the module docstring's own ">=1e-6 = logic bug"
#: floor). 1e-8 is still >>1000x any observed associativity drift (the
#: largest measured: 4.4e-16 relative at 100x) while keeping a wrong-filter
#: divergence (>=1e-8..1e-6 relative on a large aggregate) a hard FAIL.
EPS_REL_CEILING = 1e-8


def _pair_key(row):
    """Sort/pairing key: non-float columns verbatim, floats at a COARSE 6
    significant digits so epsilon-close values land adjacent on both sides
    (the fine comparison then runs pairwise on the raw values)."""
    return tuple(
        (
            "f",
            "NaN" if v != v else (float(f"{v:.6g}") if v != 0 else 0.0),
        )
        if isinstance(v, float)
        else ("x", str(_canon(v)))
        for v in row
    )


def float_eps_match(srows, orows, eps_rel):
    """Order-insensitive row-set comparison with a relative epsilon on float
    columns only. ``srows``/``orows`` are lists of tuples with RAW
    (unrounded) floats. Non-float values must match exactly. Returns
    (ok, max_rel_seen, reason)."""
    if len(srows) != len(orows):
        return False, None, f"rows {len(srows)} != {len(orows)}"
    a = sorted(srows, key=lambda r: str(_pair_key(r)))
    b = sorted(orows, key=lambda r: str(_pair_key(r)))
    max_rel = 0.0
    for i, (ra, rb) in enumerate(zip(a, b)):
        if len(ra) != len(rb):
            return False, max_rel, f"row {i}: arity {len(ra)} != {len(rb)}"
        for va, vb in zip(ra, rb):
            fa, fb = isinstance(va, float), isinstance(vb, float)
            if fa != fb:
                return False, max_rel, f"row {i}: type {va!r} vs {vb!r}"
            if not fa:
                if _canon(va) != _canon(vb):
                    return False, max_rel, f"row {i}: {va!r} != {vb!r}"
                continue
            if va != va and vb != vb:  # both NaN
                continue
            if va != va or vb != vb:
                return False, max_rel, f"row {i}: NaN vs {va!r}/{vb!r}"
            denom = max(abs(va), abs(vb))
            rel = abs(va - vb) / denom if denom else 0.0
            max_rel = max(max_rel, rel)
            if rel > eps_rel:
                return (
                    False,
                    max_rel,
                    f"row {i}: {va!r} vs {vb!r} rel={rel:.2e} > eps={eps_rel:.2e}",
                )
    return True, max_rel, None


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # optional second arg: comma-separated key subset (giant-replica spot
    # sweeps, where the heavyweight sketch oracles — HUGEINT minhash over
    # 500k docs — would take hours in DuckDB; default remains ALL keys)
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    eps_mode = os.environ.get("SWEEP_FLOAT_EPS", "0") == "1"

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

    # addend-count scale for the epsilon pass: the dominant view's rowcount
    # (lineitem at every SF) over the key's output rows
    max_view_rows = 1
    if eps_mode:
        for t in TABLES:
            try:
                max_view_rows = max(
                    max_view_rows, con.sql(f"SELECT count(*) FROM {t}").fetchone()[0]
                )
            except Exception:
                pass

    failures = []
    eps_accepted = []
    for key in QUERIES:
        if only is not None and key not in only:
            continue
        try:
            sdf = QUERIES[key](spark, sf)
            scols = sorted(sdf.columns)
            sraw = [tuple(r[c] for c in scols) for r in sdf.collect()]
            srows = sorted(
                (tuple(_canon(v) for v in row) for row in sraw), key=str
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
            oraw = [tuple(row[i] for i in order) for row in rel.fetchall()]
            orows = sorted(
                (tuple(_canon(v) for v in row) for row in oraw), key=str
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
            if eps_mode:
                n_addends = max(1.0, max_view_rows / max(1, len(sraw)))
                eps_rel = min(EPS_PER_ADDEND * n_addends, EPS_REL_CEILING)
                ok, max_rel, reason = float_eps_match(sraw, oraw, eps_rel)
                if ok:
                    eps_accepted.append(key)
                    print(
                        f"ok   {key} ({len(srows)} rows) [float-eps: "
                        f"eps_rel={eps_rel:.2e} (n_addends~{n_addends:.0f}), "
                        f"max_rel_seen={max_rel:.2e}]"
                    )
                    continue
                failures.append((key, f"values differ beyond eps: {reason}"))
                print(
                    f"FAIL {key}: values differ beyond float-eps "
                    f"eps_rel={eps_rel:.2e}: {reason}"
                )
                continue
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
    if eps_accepted:
        print(
            f"\nfloat-eps acceptances ({len(eps_accepted)}; exact-match "
            f"failures within the documented associativity budget): "
            f"{', '.join(eps_accepted)}"
        )
    print(f"\n{n - len(failures)}/{n} keys clean")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
