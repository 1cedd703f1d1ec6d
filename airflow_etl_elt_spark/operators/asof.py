"""As-of joins and range (interval) joins — time-series operators the
reference lacks but any event/market-data workload needs (SURVEY.md §2.9
flags the events fixture as the time-series surface; DuckDB ships ASOF JOIN
natively, which is the oracle we check against).

Spark has no built-in as-of join, so we use the classic scalable
union-sort-backfill composition instead of a per-row lookup:

1. tag both sides and union them on the (key, time) axis,
2. one window sorted by (key, ts, side-tag) carries the most recent
   right-side attributes forward with ``last(..., ignorenulls=True)``,
3. keep only left-side rows.

Cost shape: ONE shuffle on the join key + a per-partition sort — the same
cost as a regular sort-merge join, with no range-explosion. This is how
as-of joins stay linear at 100 TB; the naive `a JOIN b ON b.ts <= a.ts`
+ argmax form explodes to O(|matches|) pairs before pruning.

Range joins use the bucketed-interval trick: explode each interval into the
coarse time buckets it overlaps, equi-join on (key, bucket), then re-check
the precise predicate — turning an O(n·m) theta-join into an equi-join with
per-bucket fan-out (Flink/KDB-style binning; also what AQE cannot do for
you, since a bare interval predicate plans as broadcast-nested-loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_values: list[str],
    strict: bool = True,
    tolerance_seconds: "float | None" = None,
    direction: str = "backward",
) -> DataFrame:
    """For every left row, append the latest ``right_values`` from the right
    side with ``right.ts < left.ts`` (``strict=True``; ``<=`` otherwise).

    Union-sort-backfill: no row explosion, one shuffle on ``on``.
    Right rows that share a timestamp with a left row order BEFORE the left
    row when ``strict`` is False (so equal-ts matches are visible) and after
    it when True.

    ``tolerance_seconds`` bounds staleness (pandas ``merge_asof`` parity,
    and what a production feature lookup actually wants — a price from last
    month must not decorate today's trade): matches older than the bound
    come back NULL. Implemented by backfilling the matched right TIMESTAMP
    alongside the values (same window, zero extra shuffles) and null-gating
    on the microsecond-exact age.

    ``direction="forward"`` (pandas parity) matches the EARLIEST right row
    with ``right.ts > left.ts`` (or ``>=`` when ``strict`` is False) — the
    same plan traversed on a reversed time axis: only the window's sort
    direction flips, the tag/tie/tolerance machinery is shared.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    fwd = direction == "forward"
    lcols = left.columns
    # tag: right rows sort before left rows at equal ts iff inclusive
    right_tag, left_tag = (0, 1) if not strict else (1, 0)
    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(left_tag).alias("__tag"),
        F.struct(*lcols).alias("__l"),
        F.lit(None).cast(dict(right.dtypes)[right_ts]).alias("__asof_mts"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in right_values],
    )
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(right_tag).alias("__tag"),
        F.lit(None).cast(l_tagged.schema["__l"].dataType).alias("__l"),
        F.col(right_ts).alias("__asof_mts"),
        *[F.col(c).alias(f"__r_{c}") for c in right_values],
    )
    unioned = l_tagged.unionByName(r_tagged)
    # Tie rule: when the right side has duplicate (key, ts) rows, the row with
    # the GREATEST value tuple wins (pick-latest-on-tie). The __r_* columns as
    # trailing sort keys make that deterministic across partitionings/runs —
    # without them last(ignorenulls) would carry whichever duplicate happened
    # to sort last (ADVICE r1). Left rows carry nulls there (sort first,
    # harmless — the tag already separates sides at equal ts).
    # forward = the same traversal on a reversed time axis: among equal-ts
    # ties the trailing ASC value keys still make last() pick the greatest
    ts_key = F.col("__ts").desc() if fwd else F.col("__ts").asc()
    w = (
        Window.partitionBy("__k")
        .orderBy(ts_key, "__tag", *[F.col(f"__r_{c}") for c in right_values])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "__l",
        "__ts",
        F.last("__asof_mts", ignorenulls=True).over(w).alias("__asof_fts"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in right_values
        ],
    )
    if tolerance_seconds is not None:
        age = (
            F.unix_micros(F.col("__asof_fts")) - F.unix_micros(F.col("__ts"))
            if fwd
            else F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__asof_fts"))
        )
        fresh = age <= int(tolerance_seconds * 1_000_000)
        filled = filled.select(
            "__l",
            *[
                F.when(fresh, F.col(f"__f_{c}")).alias(f"__f_{c}")
                for c in right_values
            ],
        )
    return filled.filter(F.col("__l").isNotNull()).select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        *[F.col(f"__f_{c}").alias(f"asof_{c}") for c in right_values],
    )


def range_join_buckets(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    on: str | None = None,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Join each point row to every interval row whose
    ``[start_ts, end_ts)`` contains it (optionally also matching key ``on``).

    Bucketed-equi-join plan on a GLOBAL epoch-aligned grid: bucket id =
    floor(epoch / bucket_seconds). Intervals explode into every grid bucket
    they overlap; points map to exactly one bucket; the join is then a plain
    equi-join on (key?, bucket) with the exact containment predicate
    re-applied. Interval fan-out = ceil(len / bucket) + 1 — pick
    ``bucket_seconds`` near the typical interval length so fan-out stays
    O(1). A bare interval predicate would plan as broadcast-nested-loop
    (O(n·m) compares); this stays a shuffled equi-join at any scale.
    """
    bus = bucket_seconds * 1_000_000
    iv_buckets = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.expr(f"unix_micros({start_ts}) div {bus}"),
                F.expr(f"unix_micros({end_ts}) div {bus}"),
            )
        ),
    )
    pt = points.withColumn("__bucket", F.expr(f"unix_micros({point_ts}) div {bus}"))
    keys = ["__bucket"] + ([on] if on else [])
    joined = pt.join(iv_buckets, keys).filter(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts))
    )
    return joined.drop("__bucket")
