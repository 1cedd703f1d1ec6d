#!/usr/bin/env python
"""Decompose tpch_q5_local_revenue at the giant replicas (VERDICT r8
next-step 3): 3.58 s vs DuckDB ~0.34 s at 100x was the largest multi-second
gap carrying only a one-line attribution ("merge-join throughput"). Same
method as exp_100x_tail.py (SCALING r8 addendum 1): time the pipeline's
components in BOTH engines, interleaved per round (same weather), min-of-N,
with bench.py's materialization conventions (Arrow toPandas vs .df()).

Components, innermost out (each adds one tier of q5's join tree):

- ``q5_scan_li``        lineitem scan+decode of the 4 touched columns (fold)
- ``q5_scan_orders``    orders scan+decode of the 2 touched columns (fold)
- ``q5_dims``           asian_sup build: supplier |x| nation |x| region (tiny)
- ``q5_li_sup``         lineitem |x| broadcast(asian_sup) -> fold
                        (the ~1/|regions| scan-side prune)
- ``q5_li_sup_ord``     + the one fact-fact join (li |x| o on the orderkey:
                        zero-exchange SMJ under the bucketed at-rest layout)
- ``q5_li_sup_ord_cust``+ the customer join (custkey + the c_nationkey =
                        s_nationkey co-location predicate) -> fold
- ``q5_full``           the catalog query / oracle verbatim (adds the 5-group
                        rollup + fetch)

Per-tier deltas attribute the gap: full - cust = agg+fetch; cust - ord =
customer join; ord - sup = fact-fact merge; sup - scan = broadcast probe.

Usage: python scripts/exp_q5_decompose.py [sf_dir] [runs]  # /tmp/sf1x100, 5
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("SPARK_GRAFT_PLAN_CACHE", "0")  # fresh mode, like bench


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1x100"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    import duckdb
    from pyspark.sql import functions as F

    from airflow_etl_elt_spark import TABLES
    from airflow_etl_elt_spark.queries import ORACLE_SQL, QUERIES, _orderkey_colocated
    from airflow_etl_elt_spark.session import get_session
    from airflow_etl_elt_spark.sources import layout
    from airflow_etl_elt_spark.sources.readers import read_table

    spark = get_session(app_name="exp-q5-decompose")
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

    def s_run(df_fn):
        t0 = time.perf_counter()
        df_fn().toPandas()
        return time.perf_counter() - t0

    def d_run(sql):
        t0 = time.perf_counter()
        con.sql(sql).df()
        return time.perf_counter() - t0

    def asian_sup():
        s = read_table(spark, sf, "supplier")
        n = read_table(spark, sf, "nation")
        r = read_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
        return (
            s.join(
                F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
                s.s_nationkey == F.col("n_nationkey"),
            ).select("s_suppkey", "s_nationkey", "n_name")
        )

    def li4():
        return read_table(spark, sf, "lineitem").select(
            "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
        )

    def li_sup():
        return li4().join(F.broadcast(asian_sup()), F.col("l_suppkey") == F.col("s_suppkey"))

    def li_sup_ord():
        oo = read_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
        if _orderkey_colocated(spark, sf):
            oo = oo.hint("merge")
        return li_sup().join(oo, F.col("l_orderkey") == F.col("o_orderkey"))

    def li_sup_ord_cust():
        c = read_table(spark, sf, "customer")
        return li_sup_ord().join(
            c,
            (F.col("o_custkey") == c.c_custkey)
            & (c.c_nationkey == F.col("s_nationkey")),
        )

    FOLD = [
        F.count(F.lit(1)).alias("c"),
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("s"),
    ]
    ASIAN_CTE = (
        "asian AS (SELECT s_suppkey, s_nationkey, n_name FROM supplier"
        " JOIN nation ON s_nationkey = n_nationkey"
        " JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'ASIA')"
    )
    CASES: dict[str, tuple] = {
        "q5_scan_li": (
            lambda: li4().agg(*FOLD),
            "SELECT count(*) c, sum(l_extendedprice * (1 - l_discount)) s,"
            " max(l_orderkey) mo, max(l_suppkey) ms FROM lineitem",
        ),
        "q5_scan_orders": (
            lambda: read_table(spark, sf, "orders")
            .select("o_orderkey", "o_custkey")
            .agg(F.count(F.lit(1)).alias("c"), F.max("o_custkey").alias("m")),
            "SELECT count(*) c, max(o_custkey) m FROM orders",
        ),
        "q5_dims": (
            lambda: asian_sup().agg(F.count(F.lit(1)).alias("c")),
            f"WITH {ASIAN_CTE} SELECT count(*) c FROM asian",
        ),
        "q5_li_sup": (
            lambda: li_sup().agg(*FOLD),
            f"WITH {ASIAN_CTE} SELECT count(*) c,"
            " sum(l_extendedprice * (1 - l_discount)) s"
            " FROM lineitem JOIN asian ON l_suppkey = s_suppkey",
        ),
        "q5_li_sup_ord": (
            lambda: li_sup_ord().agg(*FOLD),
            f"WITH {ASIAN_CTE} SELECT count(*) c,"
            " sum(l_extendedprice * (1 - l_discount)) s"
            " FROM lineitem JOIN asian ON l_suppkey = s_suppkey"
            " JOIN orders ON l_orderkey = o_orderkey",
        ),
        "q5_li_sup_ord_cust": (
            lambda: li_sup_ord_cust().agg(*FOLD),
            f"WITH {ASIAN_CTE} SELECT count(*) c,"
            " sum(l_extendedprice * (1 - l_discount)) s"
            " FROM lineitem JOIN asian ON l_suppkey = s_suppkey"
            " JOIN orders ON l_orderkey = o_orderkey"
            " JOIN customer ON o_custkey = c_custkey"
            " AND c_nationkey = s_nationkey",
        ),
        "q5_full": (
            lambda: QUERIES["tpch_q5_local_revenue"](spark, sf),
            ORACLE_SQL["tpch_q5_local_revenue"],
        ),
    }

    for name, (sfn, dsql) in CASES.items():  # warm page cache + codegen
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
    path = os.path.join(os.path.dirname(__file__), f"exp_q5_decompose_{tag}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(out["spark_min"], indent=1))
    print(json.dumps(out["duckdb_min"], indent=1))
    print(f"written: {path}")
    spark.stop()


if __name__ == "__main__":
    main()
