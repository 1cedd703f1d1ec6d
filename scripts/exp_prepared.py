#!/usr/bin/env python
"""Round-6 diagnostics (VERDICT asks 2 and 5):

A. Prepared-mode: N=9 interleaved re-executions of every headline key with
   the plan cache ON, plus a floor job per round — decides whether r5's
   1.59x prepared ratio was spill/eviction (per-key slow re-execs persist)
   or VM weather (slowness correlates with floor spikes / is round-local).
B. sessionize decomposition: fetch-included vs compute-only (count of the
   aggregated output) timings, Spark and DuckDB, interleaved.
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa
import duckdb

from airflow_etl_elt_spark.queries import ORACLE_SQL, QUERIES
from airflow_etl_elt_spark.session import get_session
from airflow_etl_elt_spark import TABLES
from bench import HEADLINE

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_session(app_name="exp_r6")
spark.range(1_000_000).selectExpr("sum(id)").collect()
for t in TABLES:
    from airflow_etl_elt_spark.sources.readers import read_table
    read_table(spark, sf_dir, t).count()

con = duckdb.connect()
for t in TABLES:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

os.environ["SPARK_GRAFT_PLAN_CACHE"] = "1"
# build pass (uncounted)
for key in HEADLINE:
    QUERIES[key](spark, sf_dir).toPandas()

N = 9
prep = {k: [] for k in HEADLINE}
duck = {k: [] for k in HEADLINE}
floors = []
for r in range(N):
    for key in HEADLINE:
        t0 = time.perf_counter()
        QUERIES[key](spark, sf_dir).toPandas()
        prep[key].append(time.perf_counter() - t0)
        if key in ORACLE_SQL:
            t0 = time.perf_counter()
            con.sql(ORACLE_SQL[key]).df()
            duck[key].append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    floors.append(time.perf_counter() - t0)

out = {"floors": [round(x, 3) for x in floors]}
ptot = dtot = 0.0
for key in HEADLINE:
    xs = prep[key]
    row = {
        "prepared_min": round(min(xs), 3),
        "prepared_med": round(statistics.median(xs), 3),
        "prepared_max": round(max(xs), 3),
        "all": [round(x, 3) for x in xs],
    }
    if duck[key]:
        row["duck_min"] = round(min(duck[key]), 4)
        ptot += min(xs)
        dtot += min(duck[key])
    out[key] = row
out["prepared_ratio_minsum"] = round(ptot / dtot, 3)

# B. sessionize decomposition
sess = {"fetch": [], "count": [], "duck_fetch": [], "duck_count": []}
for r in range(N):
    t0 = time.perf_counter()
    QUERIES["sessionize"](spark, sf_dir).toPandas()
    sess["fetch"].append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    QUERIES["sessionize"](spark, sf_dir).selectExpr("sum(n_events)").collect()
    sess["count"].append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    con.sql(ORACLE_SQL["sessionize"]).df()
    sess["duck_fetch"].append(time.perf_counter() - t0)
    t0 = time.perf_counter()
    con.sql(f"SELECT sum(n_events) FROM ({ORACLE_SQL['sessionize']})").fetchall()
    sess["duck_count"].append(time.perf_counter() - t0)
out["sessionize_decomp"] = {
    k: {"min": round(min(v), 3), "med": round(statistics.median(v), 3)}
    for k, v in sess.items()
}

print(json.dumps(out, indent=1))
spark.stop()
