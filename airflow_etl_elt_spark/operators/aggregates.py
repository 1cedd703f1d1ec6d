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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grouped_exact_median(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Exact per-group median that stays distributed at any group size.

    ``F.median``/``percentile`` buffer every value of a group into one
    aggregation state and merge those buffers in ONE final task per group —
    measured 22 s on 6M rows x 3 groups, and a non-starter when a group holds
    billions of values. This is the selection-by-distributed-sort form
    instead:

    1. range-repartition on (group, value) — contiguous sorted ranges,
       every partition N-way parallel;
    2. count rows per (partition, group) — a tiny driver-side list
       (#partitions x #groups entries);
    3. cumulative offsets per group give each partition the GLOBAL rank of
       its first row in its group; a within-partition ``row_number`` window
       (partitions are already sorted runs) completes exact global ranks;
    4. keep the middle rank(s) per group, average them (pandas interpolated
       median semantics for even counts).

    Total cost: one range shuffle + one pass — same shape at 6M or 6B rows.
    Returns (group_col, median_val).
    """
    vals = df.filter(F.col(value_col).isNotNull()).select(group_col, value_col)
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    # __pid must be MATERIALIZED as a column on the range-partitioned data:
    # spark_partition_id() is evaluated at whatever stage references it, so a
    # later window exchange would silently renumber it (measured: every
    # offset lookup missed → empty result).
    ranged = (
        vals.repartitionByRange(n_parts, F.col(group_col), F.col(value_col))
        .withColumn("__pid", F.spark_partition_id())
        .persist()
    )
    part_group_counts = (
        ranged.groupBy("__pid", group_col).agg(F.count(F.lit(1)).alias("__cnt")).collect()
    )
    # per-group cumulative offset of each partition, in partition order
    offsets: dict[tuple, int] = {}
    totals: dict = {}
    for row in sorted(part_group_counts, key=lambda r: r["__pid"]):
        g = row[group_col]
        offsets[(row["__pid"], g)] = totals.get(g, 0)
        totals[g] = totals.get(g, 0) + row["__cnt"]
    if not totals:
        return df.select(group_col).limit(0).withColumn(
            "median_val", F.lit(None).cast("double")
        )
    offset_map = F.create_map(
        *[
            x
            for (pid, g), off in offsets.items()
            for x in (F.concat_ws("|", F.lit(pid), F.lit(g)), F.lit(off))
        ]
    )
    total_map = F.create_map(
        *[x for g, n in totals.items() for x in (F.lit(g), F.lit(n))]
    )
    w = Window.partitionBy("__pid", group_col).orderBy(value_col)
    ranked = ranged.select(
        group_col,
        F.col(value_col).cast("double").alias("__v"),
        (
            F.row_number().over(w)
            + offset_map[F.concat_ws("|", F.col("__pid"), F.col(group_col))]
        ).alias("__rank"),
        total_map[F.col(group_col)].alias("__n"),
    )
    # odd n: rank (n+1)/2 twice-averaged with itself; even n: ranks n/2, n/2+1
    mid = ranked.filter(
        (F.col("__rank") == F.floor((F.col("__n") + 1) / 2))
        | (F.col("__rank") == F.floor(F.col("__n") / 2) + 1)
    )
    return mid.groupBy(group_col).agg(F.avg("__v").alias("median_val"))


def grouped_stats(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """mean/median/std/min/max/count of ``value_col`` per ``group_col``,
    ordered by group desc (etl_elt_wine.py:426-428 restated).

    The streaming-friendly stats (mean/std/min/max/count) partial-aggregate
    map-side as usual; the exact median comes from ``grouped_exact_median``
    (distributed selection — see its docstring for why not ``F.median``) and
    is joined back on the group key (per-group result rows, broadcast-sized).
    """
    base = df.groupBy(group_col).agg(
        F.avg(value_col).alias("mean_val"),
        F.stddev_samp(value_col).alias("std_val"),
        F.min(value_col).alias("min_val"),
        F.max(value_col).alias("max_val"),
        F.count(F.lit(1)).alias("cnt"),
    )
    med = grouped_exact_median(df, group_col, value_col)
    return (
        base.join(med, group_col)
        .select(
            group_col, "mean_val", "median_val", "std_val", "min_val", "max_val", "cnt"
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
