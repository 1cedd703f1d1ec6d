"""Window functions: ranking, running aggregates, lag/lead deltas.

Not present in the reference (SURVEY.md §2.5 note) — required by the driver
fixtures (events) and any real pipeline. All windows here are PARTITIONED
(``partitionBy``): an un-partitioned window is a single-task funnel and is
banned in this codebase outside of dimension-sized inputs (see
relational.surrogate_key's docstring).

Determinism: every ``orderBy`` includes a unique tiebreaker column so running
aggregates and ranks are reproducible against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    tiebreak_col: str,
    k: int = 3,
) -> DataFrame:
    """row_number ≤ k per group, ordered by ``order_col`` desc.

    One shuffle on the group key; each group sorted independently. For heavy
    skew (one giant group), pre-aggregate or use a per-partition partial top-k
    (e.g. groupBy + max_by/collect-sort for tiny k).

    Two plan shapes (see ``fuse_small_input`` for the mode split):

    - **Distributed** (prepared mode, or any input above the size gate —
      the 100 TB shape): the window runs parallel per group; the final
      ordering of the bounded (#groups x k) output is a global ``orderBy``,
      i.e. a RANGE EXCHANGE. The exchange is the point, not an accident: a
      narrow ``coalesce(1)`` here would fuse into the SAME stage as the
      window and silently single-task the full-input window (ADVICE r5) —
      the barrier keeps the window stage parallel and range-sorts only the
      tiny result.
    - **Fused** (fresh-build mode, small input): the input is already one
      partition, the window plans no exchange, and the sort is an in-place
      ``sortWithinPartitions`` — one stage end to end.
    """
    from airflow_etl_elt_spark.operators.relational import fuse_small_input

    fused = fuse_small_input(df)
    w = Window.partitionBy(group_col).orderBy(
        F.col(order_col).desc(), F.col(tiebreak_col)
    )
    ranked = fused.withColumn("rn", F.row_number().over(w).cast("bigint")).filter(
        F.col("rn") <= k
    )
    if fused is df:
        return ranked.orderBy(group_col, "rn")
    return ranked.sortWithinPartitions(group_col, "rn")


def running_sum(
    df: DataFrame,
    partition_col: str,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running_value",
) -> DataFrame:
    """Cumulative sum per partition in a fixed total order (rows unbounded
    preceding → current). The frame is row-based, so double accumulation order
    is identical across engines — bit-reproducible against the oracle."""
    w = (
        Window.partitionBy(partition_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, F.sum(value_col).over(w))


def lag_delta(
    df: DataFrame,
    partition_col: str,
    order_cols: list[str],
    value_col: str,
    out_col: str = "delta",
) -> DataFrame:
    """value - lag(value) per partition; NULL for each partition's first row."""
    w = Window.partitionBy(partition_col).orderBy(*order_cols)
    return df.withColumn(out_col, F.col(value_col) - F.lag(value_col).over(w))
