#!/usr/bin/env python
"""Measure the ranking compose-vs-plain crossover (SCALING r7 addendum 4).

Builds an N-replica of the sf0.1 orders table (keys shifted, prices
perturbed — same recipe as build_scale_dataset.py), then times
``ranking_suite`` with the composed plan forced vs the plain window
forced, COMPUTE-ONLY (a summary aggregate instead of the full result
fetch, which is identical in both plans and drowns the signal),
alternating pair order per round. The committed crossover behind
``windows.RANK_COMPOSE_ROWS_PER_GROUP``:

    0.9M rows/group (30x replica): composed 2.12 s vs plain 2.16 s (tie)
    3M   rows/group (100x orders): composed 5.45 s vs plain 8.35 s

Usage: python scripts/exp_rank_compose_crossover.py [replicas] [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from airflow_etl_elt_spark.operators import windows as W
    from airflow_etl_elt_spark.session import get_session

    os.environ["SPARK_GRAFT_PLAN_CACHE"] = "0"
    spark = get_session(app_name="exp_rank_crossover")

    out = f"/tmp/rank_orders_{replicas}x"
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        o = spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
        reps = spark.range(replicas).select(F.col("id").alias("__rep"))
        big = (
            o.crossJoin(reps)
            .withColumn("o_orderkey", F.col("o_orderkey") + F.col("__rep") * 10_000_000)
            .withColumn("o_totalprice", F.col("o_totalprice") + F.col("__rep") * 0.001)
            .drop("__rep")
        )
        (
            big.repartitionByRange(32, "o_orderkey")
            .sortWithinPartitions("o_orderkey")
            .write.mode("overwrite")
            .parquet(out)
        )
    src = spark.read.parquet(out)
    total = src.count()

    def sample(composed: bool) -> float:
        # total_rows drives the r7 row-based gate directly: huge forces
        # composed, tiny forces plain (composed is still subject to the
        # low-cardinality probe, which 5 priorities always passes)
        df = W.ranking_suite(
            src.select("o_orderpriority", "o_totalprice", "o_orderkey"),
            "o_orderpriority",
            "o_totalprice",
            "o_orderkey",
            total_rows=(1 << 60) if composed else 1,
        )
        t0 = time.perf_counter()
        df.select((df.drank + df.quartile).alias("x")).agg({"x": "sum"}).collect()
        return time.perf_counter() - t0

    sample(True), sample(False)  # warm both
    res = {"composed": [], "plain": []}
    for r in range(rounds):
        order = [True, False] if r % 2 == 0 else [False, True]
        for c in order:
            res["composed" if c else "plain"].append(round(sample(c), 2))
    print(json.dumps({"replicas": replicas, "rows": total, "rows_per_group": total // 5, **res}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
