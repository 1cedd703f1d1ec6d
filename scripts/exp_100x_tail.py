#!/usr/bin/env python
"""Decompose the three unattributed 100x-tail keys (VERDICT r7 next-step 1):
grouped_stats (7.5 s vs 1.2 s), dedup_exact (0.84 s vs 0.086 s),
events_hourly (0.72 s vs 0.056 s at the 100x replica).

For each key, time the pipeline's components in BOTH engines, interleaved
per round (same weather), min-of-N:

- ``*_scan``      raw scan + decode of exactly the columns the key touches
                  (count + a cheap fold so neither engine can skip decode)
- ``*_core``      the single central aggregation (no median machinery, no
                  final ordering) — what a one-pass engine pays
- ``*_full``      the catalog query / its oracle SQL verbatim

The difference full-core is our extra machinery (median refinement passes,
ordering); core-scan is aggregation cost over the scan; the scan row is the
floor set by bytes + decode. Results land in
scripts/exp_100x_tail_<sf>.json and the attribution narrative in SCALING.md.

Usage: python scripts/exp_100x_tail.py [sf_dir] [runs]   # default /tmp/sf1x100, 5
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("SPARK_GRAFT_PLAN_CACHE", "0")  # fresh mode, like the bench headline


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1x100"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    import duckdb
    from pyspark.sql import functions as F

    from airflow_etl_elt_spark import TABLES
    from airflow_etl_elt_spark.queries import ORACLE_SQL, QUERIES
    from airflow_etl_elt_spark.session import get_session
    from airflow_etl_elt_spark.sources import layout
    from airflow_etl_elt_spark.sources.readers import read_table

    spark = get_session(app_name="exp-100x-tail")
    layout.prepare_at_rest_layout(spark, sf)  # the bench's serving layout

    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    for t in TABLES:
        p = layout.duckdb_path(sf, t, spark)
        if p is None:
            p = f"{sf}/{t}.parquet"
            if os.path.isdir(p):
                p = f"{p}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    # Same materialization conventions as bench.py: Spark results fetched
    # via Arrow (.toPandas()), DuckDB via .df() — so the full-query rows
    # here decompose the bench's own numbers, not a different fetch path
    # (collect()'s py4j row serialization is ~4x slower on a 500k-row
    # result and would mis-attribute fetch cost).
    def s_run(df_fn):
        t0 = time.perf_counter()
        df_fn().toPandas()
        return time.perf_counter() - t0

    def d_run(sql):
        t0 = time.perf_counter()
        con.sql(sql).df()
        return time.perf_counter() - t0

    CASES: dict[str, tuple] = {
        # ---- grouped_stats: 3 groups x 15M doubles, exact median ----
        "grouped_stats_scan": (
            lambda: read_table(spark, sf, "lineitem")
            .select("l_returnflag", "l_extendedprice")
            .agg(F.count(F.lit(1)).alias("c"), F.sum("l_extendedprice").alias("s"),
                 F.count(F.when(F.col("l_returnflag") == "A", 1)).alias("ca")),
            "SELECT count(*) c, sum(l_extendedprice) s, "
            "count(CASE WHEN l_returnflag='A' THEN 1 END) ca FROM lineitem",
        ),
        "grouped_stats_core": (
            lambda: read_table(spark, sf, "lineitem")
            .groupBy("l_returnflag")
            .agg(
                F.avg("l_extendedprice").alias("mean_val"),
                F.stddev_samp("l_extendedprice").alias("std_val"),
                F.min("l_extendedprice").alias("min_val"),
                F.max("l_extendedprice").alias("max_val"),
                F.count(F.lit(1)).alias("cnt"),
            ),
            "SELECT l_returnflag, avg(l_extendedprice), stddev_samp(l_extendedprice),"
            " min(l_extendedprice), max(l_extendedprice), count(*)"
            " FROM lineitem GROUP BY l_returnflag",
        ),
        "grouped_stats_median_only": (
            None,  # Spark-side: the median machinery is not separable without
            # re-implementing it here; full-core attributes it instead
            "SELECT l_returnflag, median(l_extendedprice) FROM lineitem GROUP BY 1",
        ),
        "grouped_stats_full": (
            lambda: QUERIES["grouped_stats"](spark, sf),
            ORACLE_SQL["grouped_stats"],
        ),
        # ---- dedup_exact: 500k multi-KB texts -> md5 -> 2-phase agg ----
        "dedup_exact_scan": (
            lambda: read_table(spark, sf, "documents")
            .select("doc_id", "text")
            .agg(F.count(F.lit(1)).alias("c"), F.sum(F.length("text")).alias("s")),
            "SELECT count(*) c, sum(length(text)) s FROM documents",
        ),
        "dedup_exact_md5agg": (
            lambda: read_table(spark, sf, "documents")
            .groupBy(F.md5(F.col("text")).alias("__h"))
            .agg(F.min("doc_id").alias("canonical_id"), F.count(F.lit(1)).alias("n"))
            .agg(F.count(F.lit(1)).alias("groups"), F.sum("n").alias("rows")),
            "SELECT count(*) AS n_groups, sum(n) AS n_rows FROM (SELECT md5(text) h,"
            " min(doc_id), count(*) n FROM documents GROUP BY md5(text))",
        ),
        "dedup_exact_full": (
            lambda: QUERIES["dedup_exact"](spark, sf),
            ORACLE_SQL["dedup_exact"],
        ),
        # ---- events_hourly: timestamp bucketing + 2-phase agg ----
        "events_hourly_scan": (
            lambda: read_table(spark, sf, "events")
            .select("ts", "event_type", "value")
            .agg(F.count(F.lit(1)).alias("c"), F.sum("value").alias("s"),
                 F.max("ts").alias("m")),
            "SELECT count(*) c, sum(value) s, max(ts) m FROM events",
        ),
        "events_hourly_core": (
            lambda: read_table(spark, sf, "events")
            .filter(F.col("ts").isNotNull())
            .groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sv"))
            .agg(F.count(F.lit(1)).alias("groups"), F.sum("cnt").alias("rows")),
            "SELECT count(*) AS n_groups, sum(cnt) AS n_rows FROM ("
            "SELECT date_trunc('hour', ts) h, event_type, count(*) cnt,"
            " sum(value) sv FROM events WHERE ts IS NOT NULL GROUP BY 1, 2)",
        ),
        "events_hourly_full": (
            lambda: QUERIES["events_hourly"](spark, sf),
            ORACLE_SQL["events_hourly"],
        ),
    }

    # warm both engines (page cache + codegen paths)
    for name, (sfn, dsql) in CASES.items():
        if sfn is not None:
            s_run(sfn)
        d_run(dsql)

    spark_t: dict[str, list] = {k: [] for k in CASES}
    duck_t: dict[str, list] = {k: [] for k in CASES}
    for r in range(runs):
        for name, (sfn, dsql) in CASES.items():
            if sfn is not None:
                spark_t[name].append(s_run(sfn))
            duck_t[name].append(d_run(dsql))
        print(f"round {r + 1}/{runs} done", file=sys.stderr)

    out = {
        "sf_dir": sf,
        "runs": runs,
        "spark_min": {k: round(min(v), 3) for k, v in spark_t.items() if v},
        "duckdb_min": {k: round(min(v), 3) for k, v in duck_t.items() if v},
        "spark_all": {k: [round(x, 3) for x in v] for k, v in spark_t.items() if v},
        "duckdb_all": {k: [round(x, 3) for x in v] for k, v in duck_t.items() if v},
    }
    tag = os.path.basename(sf.rstrip("/"))
    path = os.path.join(os.path.dirname(__file__), f"exp_100x_tail_{tag}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(out["spark_min"], indent=1))
    print(json.dumps(out["duckdb_min"], indent=1))
    print(f"written: {path}")
    spark.stop()


if __name__ == "__main__":
    main()
