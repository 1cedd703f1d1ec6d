#!/usr/bin/env python
"""Build an Nx replica of a fixture dir for scale-up experiments (SCALING.md).

Usage:
    python scripts/build_scale_dataset.py [SRC] [OUT] [REPLICAS]
    # defaults: /root/testdata/sf0.1  /tmp/sf1x10  10

Join keys are shifted per replica so key cardinality scales with volume
(a pure row-copy would skew every key Nx and measure the wrong thing);
document texts are salted and embeddings perturbed per replica so exact
duplication doesn't distort dedup/ANN measurements. events.user_id is
deliberately NOT shifted: users get Nx busier rather than Nx more numerous,
which keeps the window/sessionize keys on their HARD shape (fat groups —
the single-task-spill regime the ranking rewrites exist for) and creates
duplicate (user_id, ts) rows — the tie shape that exposed the
stream_sessionize oracle's ordering bug (SCALING r6 addendum 5).

Fact tables are written in the at-rest layout a production deployment uses:
several files x ~8 MB row groups, so BOTH engines' scans parallelize (r6).
The driver fixtures are written as ONE file with ONE row group — neither
Spark nor DuckDB can split inside a row group, so every sf0.1 scan is
single-threaded by layout, not by engine; replicating that layout at 10-30x
would measure the fixture writer, not the engines. 100 TB never ships as
single-row-group files.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyspark.sql.functions as F  # noqa: E402

from airflow_etl_elt_spark.session import get_session  # noqa: E402
from airflow_etl_elt_spark.sources.readers import read_table  # noqa: E402


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1x10"
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    spark = get_session(app_name="scale-build")

    fact_files = max(8, min(32, replicas))

    def write_fact(df, path, key):
        # several files x several row groups, range-laid-out and sorted on
        # the natural key: the splittable at-rest layout of a production
        # table (plain round-robin repartition measured 2.4x the bytes —
        # shuffling breaks delta/dictionary locality; parquet.block.size
        # bounds the writer's row-group buffer so files split)
        df.repartitionByRange(fact_files, key).sortWithinPartitions(
            key
        ).write.mode("overwrite").option(
            "parquet.block.size", str(8 * 1024 * 1024)
        ).parquet(path)

    def rep(df):
        return df.crossJoin(spark.range(replicas).select(F.col("id").alias("__r")))

    def shift(df, key):
        hi = df.agg(F.max(key)).first()[0] + 1
        return rep(df).withColumn(key, F.col(key) + F.col("__r") * hi)

    write_fact(
        shift(read_table(spark, src, "orders"), "o_orderkey").drop("__r"),
        f"{out}/orders.parquet",
        "o_orderkey",
    )
    # lineitem shares the orders keyspace: shift by the ORDERS max
    omax = read_table(spark, src, "orders").agg(F.max("o_orderkey")).first()[0] + 1
    write_fact(
        rep(read_table(spark, src, "lineitem"))
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("__r") * omax)
        .drop("__r"),
        f"{out}/lineitem.parquet",
        "l_orderkey",
    )
    write_fact(
        shift(read_table(spark, src, "events"), "event_id").drop("__r"),
        f"{out}/events.parquet",
        "event_id",
    )
    dmax = read_table(spark, src, "documents").agg(F.max("doc_id")).first()[0] + 1
    write_fact(
        rep(read_table(spark, src, "documents"))
        .withColumn("doc_id", F.col("doc_id") + F.col("__r") * dmax)
        .withColumn(
            "text", F.concat(F.col("text"), F.lit(" replica"), F.col("__r"))
        )
        .drop("__r"),
        f"{out}/documents.parquet",
        "doc_id",
    )
    # Perturb one component per replica (same reason texts are salted): an
    # unperturbed copy makes every vector exist `replicas` times EXACTLY, so
    # cosine ties at 1.0 between distinct pairs are decided by last-ulp
    # engine arithmetic — the 10x oracle sweep caught label_pairs_topk
    # flipping rank membership on exactly that — and exact duplicates also
    # distort ANN recall measurements. A per-replica nudge of dimension 0
    # keeps the distribution realistic while breaking exact duplication.
    write_fact(
        shift(read_table(spark, src, "embeddings"), "vec_id")
        .withColumn(
            "embedding",
            F.concat(
                F.array(
                    (F.element_at("embedding", 1) + F.col("__r") * F.lit(1e-3))
                    .cast("float")
                ),
                F.slice("embedding", 2, 10_000),
            ),
        )
        .drop("__r"),
        f"{out}/embeddings.parquet",
        "vec_id",
    )
    for t in ["customer", "supplier", "nation", "region", "part"]:
        read_table(spark, src, t).write.mode("overwrite").parquet(f"{out}/{t}.parquet")
    for t in ["lineitem", "orders", "events", "documents", "embeddings"]:
        print(t, spark.read.parquet(f"{out}/{t}.parquet").count())


if __name__ == "__main__":
    main()
