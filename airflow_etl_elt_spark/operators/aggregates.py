"""Aggregations: multi-stat grouped agg, count-by-group, TPC-H-style rollups.

Reference parity (SURVEY.md §2.4):
- grouped_stats — pandas ``groupby("quality")["alcohol"].agg(["mean","median",
  "std","min","max","count"])`` + sort desc (etl_elt_wine.py:426-428).
  pandas ``std`` is sample std (ddof=1) → ``stddev_samp``; pandas ``median``
  is exact interpolated → Spark ``median``/``percentile(col, 0.5)`` (exact),
  never ``approx_percentile`` in oracle-checked paths (SURVEY.md §7 hazard 3).
- count_by_group — Metabase query (README.md:95-105).

Scale notes: groupBy aggregations in Spark are two-phase (partial map-side
combine, then shuffle on the group key, then final merge) — the shuffle
volume is #groups × #partial-states, not #rows. Exact median is the one
exception: it buffers each group's values, so it is reserved for low-ish
cardinality group keys; at 100 TB with high-cardinality keys switch to
``approx_percentile`` (documented per-callsite, not silently).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grouped_stats(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """mean/median/std/min/max/count of ``value_col`` per ``group_col``,
    ordered by group desc (etl_elt_wine.py:426-428 restated)."""
    return (
        df.groupBy(group_col)
        .agg(
            F.avg(value_col).alias("mean_val"),
            F.median(value_col).alias("median_val"),
            F.stddev_samp(value_col).alias("std_val"),
            F.min(value_col).alias("min_val"),
            F.max(value_col).alias("max_val"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy(F.col(group_col).desc())
    )


def count_by_group(df: DataFrame, group_col: str) -> DataFrame:
    """``SELECT g, COUNT(*) GROUP BY g ORDER BY g`` (README.md:95-105)."""
    return df.groupBy(group_col).agg(F.count(F.lit(1)).alias("cnt")).orderBy(group_col)


def pricing_summary(lineitem: DataFrame, ship_cutoff: str = "1998-09-02") -> DataFrame:
    """TPC-H Q1-shaped pricing summary over lineitem (north-star §7 phase E).

    One scan, one shuffle on (returnflag, linestatus) — 6 groups max, so the
    map-side combine collapses virtually all volume before the exchange.
    The date filter is pushed to the parquet reader (min/max row-group stats).
    """
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(ship_cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def bucketed_histogram(df: DataFrame, col: str, edges: list[float]) -> DataFrame:
    """CASE-WHEN bucketing + count — the generalized quality-histogram shape.

    Buckets are labeled ``b00 [lo,hi)`` … with an overflow bucket; a single
    narrow-dependency projection followed by a tiny-group aggregation.
    """
    expr = F.when(F.col(col) < edges[0], F.lit("b00_underflow"))
    for i in range(len(edges) - 1):
        expr = expr.when(
            (F.col(col) >= edges[i]) & (F.col(col) < edges[i + 1]),
            F.lit(f"b{i + 1:02d}"),
        )
    expr = expr.otherwise(F.lit(f"b{len(edges):02d}_overflow"))
    return (
        df.withColumn("bucket", expr)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("bucket")
    )


def distinct_users(events: DataFrame) -> DataFrame:
    """Exact + approximate distinct-count side by side.

    ``approx_count_distinct`` (HyperLogLog++) is the 100 TB path: fixed-size
    sketch per partition, mergeable, no shuffle of raw ids. The exact count is
    the correctness anchor at test scale.
    """
    return events.agg(
        F.countDistinct("user_id").alias("n_users_exact"),
        F.approx_count_distinct("user_id", 0.01).alias("n_users_approx"),
    )
