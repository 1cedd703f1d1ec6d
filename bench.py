#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing discipline: the SparkSession is built (and the JVM warmed with one
trivial job) before any query is timed; each query is timed end-to-end
including fetching the full result to the driver as a pandas frame —
Arrow-batched toPandas() on the Spark side, .df() on the DuckDB side, so
both engines pay the same columnar fetch. (Row-at-a-time collect() was
measured to spend ~1 s deserializing a 150 k-row result into Python Row
objects — benchmarking the fetch API, not the engine.)
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5_local_revenue",
    "tpch_q6",
    "tpch_q10",
    "grouped_stats",
    "revenue_by_priority",
    "revenue_by_segment",
    "window_topk",
    "window_ranks",
    "events_hourly",
    "sessionize",
    "dedup_exact",
    "dedup_minhash",
    "knn_cosine",
    "token_count",
    "lang_id",
    "rolling_fingerprint",
    # heavyweight corpus-hygiene ops (real per-row compute, not job-floor):
    "repetition_score",
    "decontaminate",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from airflow_etl_elt_spark.queries import QUERIES
    from airflow_etl_elt_spark.session import get_session

    spark = get_session(app_name="bench")
    # Warmup outside the timed region, mirroring a long-running service
    # (steady-state throughput is the comparable number — the DuckDB baseline
    # is precompiled C++ and pays no JIT):
    # 1. one JVM job (codegen + scheduler paths),
    # 2. one trivial pandas_udf across all cores so every Python worker pays
    #    its interpreter+numpy+package import storm here,
    # 3. each headline query once at the smallest SF so C2 JIT-compiles the
    #    hot operators (Java regex, agg, join paths) and codegen caches fill.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    from pyspark.sql.functions import pandas_udf

    def _warm_fn(v):
        import airflow_etl_elt_spark.operators.dedup  # noqa: F401
        import airflow_etl_elt_spark.operators.similarity  # noqa: F401

        return v

    _warm_fn.__annotations__ = {"v": pd.Series, "return": pd.Series}
    _warm = pandas_udf(_warm_fn, "long")

    cpus = spark.sparkContext.defaultParallelism
    spark.range(0, cpus * 100, 1, cpus).select(_warm("id")).collect()

    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for key in HEADLINE:
            try:
                QUERIES[key](spark, warm_dir).toPandas()
            except Exception:
                pass  # warmup must never fail the bench

    # Pre-resolve + page-cache-warm the BENCH-SF tables before the timed
    # loop: the first timed round otherwise pays file listing, parquet
    # footer reads, and a cold OS page cache for sf_dir (the sf0.001 warmup
    # above warms code paths, not these files). count() reads every row
    # group without driver materialization. (VERDICT r2 next-step 3.)
    from airflow_etl_elt_spark import TABLES as _TABLES
    from airflow_etl_elt_spark.sources.readers import read_table as _read_table

    for t in _TABLES:
        try:
            _read_table(spark, sf_dir, t).count()
        except Exception:
            pass

    # Best-of-5 per query, rounds INTERLEAVED across queries: this VM shows
    # bursty CPU steal lasting tens of seconds (identical runs measured
    # 2-25x apart minutes apart — tpch_q3 observed at both 0.11 s and 3.8 s
    # with an identical plan). Back-to-back repeats of one query land every
    # sample inside the same burst; round-robin spreads each query's samples
    # across the whole bench window so the min finds a quiet slice.
    # Steady-state throughput — not scheduler-noise worst case — is the
    # number comparable to the baseline.
    # 7 rounds: this VM's CPU-steal bursts last tens of seconds; widening the
    # interleaved window gives each query more chances to land a sample in a
    # quiet slice (observed: 5 rounds still left whole-bench windows inside
    # one burst, inflating every ratio ~40%).
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "7"))
    timings = {key: float("inf") for key in HEADLINE}
    errors: dict[str, str] = {}
    for _ in range(runs):
        for key in HEADLINE:
            if key in errors:
                continue
            t0 = time.perf_counter()
            try:
                QUERIES[key](spark, sf_dir).toPandas()
            except Exception as exc:  # one broken query must not void the bench
                errors[key] = f"{type(exc).__name__}: {exc}"[:500]
                print(f"bench query {key} failed: {exc}", file=sys.stderr)
                continue
            timings[key] = min(timings[key], time.perf_counter() - t0)
    timings = {k: round(v, 4) for k, v in timings.items() if v != float("inf")}
    # Scheduling-floor calibration: the cheapest possible Spark job, timed
    # with the same discipline. Any query's time minus this floor is the
    # actual engine work; the floor itself is constant in SF (it would be
    # amortized to nothing at sf100's multi-second query times).
    floor = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        floor = min(floor, time.perf_counter() - t0)

    total = round(sum(timings.values()), 4)

    # DuckDB denominator (VERDICT r1): time each headline key's ORACLE_SQL in
    # the same process with the same best-of-N discipline, so BENCH_r{N}.json
    # carries both sides of the <=2x-of-DuckDB bar instead of a numerator only.
    duck_timings: dict[str, float] = {}
    try:
        import duckdb

        from airflow_etl_elt_spark import TABLES
        from airflow_etl_elt_spark.queries import ORACLE_SQL

        con = duckdb.connect()
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        for key in HEADLINE:
            sql = ORACLE_SQL.get(key)
            if sql is None:
                continue  # rows-only keys (e.g. dedup_minhash) have no oracle
            con.sql(sql).df()  # warm the buffer pool, mirror Spark warmup
            best = float("inf")
            for _ in range(runs):
                t0 = time.perf_counter()
                con.sql(sql).df()
                best = min(best, time.perf_counter() - t0)
            duck_timings[key] = round(best, 4)
        con.close()
    except Exception as exc:  # the Spark numbers must survive a broken oracle
        print(f"duckdb baseline failed: {exc}", file=sys.stderr)

    comparable = [k for k in HEADLINE if k in duck_timings and k in timings]
    duck_total = round(sum(duck_timings[k] for k in comparable), 4)
    spark_comparable = round(sum(timings[k] for k in comparable), 4)
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "spark_job_floor_sec": round(floor, 4),
        "duckdb_queries": duck_timings,
        "duckdb_total": duck_total,
        "spark_comparable_total": spark_comparable,
        "ratio_vs_duckdb": round(spark_comparable / duck_total, 2) if duck_total else None,
        "ratios": {
            k: round(timings[k] / duck_timings[k], 2)
            for k in comparable
            if duck_timings[k] > 0
        },
        "errors": errors,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
