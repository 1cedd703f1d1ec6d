#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing discipline: the SparkSession is built (and the JVM warmed with one
trivial job) before any query is timed; each query is timed end-to-end
including its collect() — results are aggregation-shaped (small), so driver
transfer is noise, and the DuckDB baseline pays the same fetch.
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "grouped_stats",
    "revenue_by_priority",
    "revenue_by_segment",
    "window_topk",
    "events_hourly",
    "sessionize",
    "dedup_exact",
    "dedup_minhash",
    "knn_cosine",
    "token_count",
    "lang_id",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from airflow_etl_elt_spark.queries import QUERIES
    from airflow_etl_elt_spark.session import get_session

    spark = get_session(app_name="bench")
    # JVM/codegen warmup outside the timed region
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    for key in HEADLINE:
        t0 = time.perf_counter()
        QUERIES[key](spark, sf_dir).collect()
        timings[key] = round(time.perf_counter() - t0, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
