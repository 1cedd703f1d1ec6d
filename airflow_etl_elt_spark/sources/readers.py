"""Sources: parquet table scans and normalized CSV ingest.

Reference parity:
- CSV scan with ``;`` separator, header, inferred types
  (reference ``dags/include/utils.py:31`` — ``pd.read_csv(path, sep=";")``).
- Column-name normalization, spaces → underscores
  (reference ``dags/include/utils.py:32``).
- Table scan with projection (reference ``dags/etl_elt_wine.py:423-424``).

Spark-first notes: scans stay lazy; narrow ``select``/``filter`` applied by
callers reach the parquet reader as column pruning + pushed filters (verify
with ``df.explain('formatted')`` → ``PushedFilters`` / ``ReadSchema``). At
100 TB the parquet layout (partition columns, file sizes ~128-512 MB) is what
makes these pushdowns matter; ``write_partitioned`` in sinks.py is the
write-side counterpart.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (applicationId, path) -> resolved base DataFrame; see read_table.
_RELATION_CACHE: dict[tuple[str, str], DataFrame] = {}

_COLUMN_STATS_CACHE: dict[tuple[str, str], tuple[float, float, int] | None] = {}


def table_column_stats(
    sf_dir: str, name: str, column: str
) -> tuple[float, float, int] | None:
    """(min, max, total_rows) of a numeric column from the parquet FOOTER
    statistics — the scan-statistics layer a real engine keeps in its
    catalog (the same zone-map idea ``sources/txn.py`` uses for
    directory-level skipping). A driver-side pyarrow metadata read: no
    Spark job, microseconds after the per-path cache warms.

    Returns None when any row group lacks min/max stats (callers fall back
    to computing bounds with an aggregation pass). Numeric parquet stats
    are exact (string truncation concerns don't apply), but consumers must
    treat these as PLANNING hints only — ``grouped_exact_median`` stays
    exact under arbitrary bounds by construction (wrong bounds clamp into
    edge cells and only slow convergence)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    key = (path, column)
    if key in _COLUMN_STATS_CACHE:
        return _COLUMN_STATS_CACHE[key]
    res: tuple[float, float, int] | None = None
    try:
        import glob as _glob

        import pyarrow.parquet as pq

        files = (
            sorted(_glob.glob(os.path.join(path, "*.parquet")))
            if os.path.isdir(path)
            else [path]
        )
        mn = mx = None
        rows = 0
        for f in files:
            md = pq.ParquetFile(f).metadata
            names = [md.schema.column(i).name for i in range(md.num_columns)]
            ci = names.index(column)
            for rg in range(md.num_row_groups):
                grp = md.row_group(rg)
                rows += grp.num_rows
                st = grp.column(ci).statistics
                if st is None or not st.has_min_max:
                    raise ValueError("row group without min/max stats")
                lo, hi = float(st.min), float(st.max)
                mn = lo if mn is None else min(mn, lo)
                mx = hi if mx is None else max(mx, hi)
        if mn is not None:
            res = (mn, mx, rows)
    except Exception:
        res = None
    _COLUMN_STATS_CACHE[key] = res
    return res


def invalidate_relation(path: str) -> None:
    """Drop any cached relation for ``path`` (all sessions). Sinks that
    REWRITE a table in place (replace_table, upsert_by_key) must call this:
    a cached DataFrame pins the old file listing, so post-rewrite reads
    through the cache would hit deleted files or stale data."""
    for key in [k for k in _RELATION_CACHE if k[1] == path]:
        del _RELATION_CACHE[key]


def normalize_columns(df: DataFrame) -> DataFrame:
    """Spaces → underscores in every column name (utils.py:32 parity)."""
    return df.toDF(*[c.replace(" ", "_") for c in df.columns])


#: fan_out's cost gate: below this Catalyst plan-size estimate the fan-out
#: exchange plus the per-task Python-crossing overhead exceed what the
#: parallelism buys, so the input is left on its natural layout. Measured
#: r13 at sf0.1 (ISOLATED noop A/B, 3 samples each): scan+fan_out 0.21 s;
#: a TRIVIAL pandas_udf over the fanned-out input 0.53-0.68 s vs the full
#: lang_id WITHOUT fan_out 0.28-0.41 s — the Arrow crossing costs ~10 ms
#: x 32 tasks while the actual RE2 work is noise at this size (full
#: lang_id == trivial-UDF cost over the same fan-out). Crossover estimate:
#: single-threaded text work ~0.04 s/MB vs ~0.3 s fixed fan-out overhead
#: => ~8 MB of text ~ 4 MB compressed estimate. At production scale inputs
#: arrive orders of magnitude above this and the gate never engages.
FAN_OUT_MIN_BYTES = int(
    os.environ.get("SPARK_GRAFT_FANOUT_MIN_BYTES", str(4 * 1024 * 1024))
)


def fan_out(
    df: DataFrame,
    min_partitions: int | None = None,
    min_bytes: int | None = None,
) -> DataFrame:
    """Round-robin repartition a narrow input so compute-heavy downstream work
    (regex passes, pandas UDFs, per-row vector math) uses every core.

    Parquet splits at row-group granularity: a single-row-group file scans as
    ONE partition no matter how many cores exist, serializing everything after
    it. At 100 TB inputs arrive as thousands of files and this is a no-op
    (returns ``df`` unchanged when partitions >= target); on small/skewed
    layouts it costs one tiny shuffle to unlock N-way parallelism — the same
    guard a production pipeline wants against a few-giant-files layout.

    Cost-gated (OPTIMIZATION r13, guide §1.2/§4): inputs whose Catalyst
    size estimate is under ``FAN_OUT_MIN_BYTES`` stay on their natural
    layout — see the gate constant for the measured crossover. Per-row
    operators are order-insensitive, so the gate changes plan shape only,
    never results. The default gate constant assumes LIGHT per-byte work
    (~0.04 s/MB single-threaded — regex/token passes); call sites whose
    downstream is far heavier per byte (interpreted HOF folds, Python
    image decoding) pass their own ``min_bytes`` (0 = always fan out) —
    rolling_fingerprint measured 0.16 -> 0.45 s at sf0.1 under the default
    gate before its override.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if _partition_count(df) >= target:
        return df
    from airflow_etl_elt_spark.operators.aggregates import _plan_size_bytes

    gate = FAN_OUT_MIN_BYTES if min_bytes is None else min_bytes
    if _plan_size_bytes(df) < gate:
        return df
    return df.repartition(target)


_PARTITION_COUNT_CACHE: dict[tuple[str, int], int] = {}


def _partition_count(df: DataFrame) -> int:
    """Planned partition count of ``df``, memoized per (application,
    semanticHash of the analyzed plan). ``df.rdd.getNumPartitions()`` costs
    ~60 ms of driver time per call (full physical planning + RDD
    conversion) and fan_out callers re-pay it on every fresh build; the
    count is a pure function of the immutable fixture layout + session
    parallelism, so the memo has the same staleness contract as the
    reader's relation cache and _PLAN_SIZE_CACHE (OPTIMIZATION r12)."""
    try:
        key = (
            df.sparkSession.sparkContext.applicationId,
            df.semanticHash(),
        )
    except Exception:
        return df.rdd.getNumPartitions()
    n = _PARTITION_COUNT_CACHE.get(key)
    if n is None:
        n = df.rdd.getNumPartitions()
        _PARTITION_COUNT_CACHE[key] = n
    return n


def read_csv_normalized(
    spark: SparkSession,
    path: str,
    sep: str = ";",
    header: bool = True,
    infer_schema: bool = True,
) -> DataFrame:
    """`;`-delimited CSV with header and inferred types, names normalized.

    Matches reference ``utils.py:31-32``. At scale: inferSchema costs one
    extra pass over the file — for repeated loads of a stable feed, pass an
    explicit schema instead (the canonical wine schema lives in
    plans/wine.py).
    """
    df = (
        spark.read.options(sep=sep, header=str(header).lower(), inferSchema=str(infer_schema).lower())
        .csv(path)
    )
    return normalize_columns(df)


def read_json_lines(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """JSON-lines source. ALWAYS pass ``schema`` in production: without it
    Spark runs a full inference pass over the data before the real scan —
    at 100 TB that doubles the read. Inference is allowed here for ad-hoc
    exploration only."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source — same columnar pushdown/pruning properties as parquet
    (verified in tests); useful when upstream systems emit ORC."""
    return spark.read.orc(path)


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Raw-file source for multimodal ingest: one row per file with
    (path, modificationTime, length, content: binary) — the standard entry
    point for image/audio/video corpora that arrive as loose files rather
    than parquet (feeds operators/multimodal.py decode/resize stages).

    Scale notes: ``pathGlobFilter`` prunes at LISTING time (non-matching
    files are never opened); ``max_bytes`` guards executors against a rogue
    multi-GB file inflating one task (each file is one row — a file must fit
    in a task's memory, unlike splittable parquet). At 100 TB, prefer
    ingesting binaries ONCE into parquet with a payload column (sinks) so
    later passes get columnar pruning of the payload; this source is the
    ingest edge, not the steady-state layout.
    """
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)
    return df


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one of the driver's parquet tables (TESTDATA.md layout).

    The events table carries TIMESTAMP(NANOS) parquet columns, which Spark's
    vectorized reader rejects (PARQUET_TYPE_ILLEGAL). We opt into the
    documented ``nanosAsLong`` reading (runtime-settable SQL conf) and rebuild
    the timestamp at microsecond precision with integer division — the same
    truncation DuckDB applies when it narrows ns → µs, so the oracle agrees.
    Double division would be wrong here: epoch-nanos ≈ 1.7e18 exceeds the
    53-bit double mantissa.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    # Timestamp semantics (year/date_trunc/window) are session-TZ-dependent in
    # Spark while the DuckDB oracle computes on naive wall-clock values; pin
    # UTC so results agree even under a caller-provided session that didn't
    # go through our get_session defaults.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Production at-rest layout override (bench path only — a no-op dict
    # lookup unless sources.layout.prepare_at_rest_layout ran this session):
    # same rows, bucketed/multi-file physical layout.
    from airflow_etl_elt_spark.sources import layout as _layout

    overridden = _layout.resolve(spark, sf_dir, name)
    if overridden is not None:
        return overridden
    # Catalog-style relation cache: re-resolving the same path re-lists files
    # and re-reads parquet footers on the DRIVER every time (~50-150 ms per
    # table), which a real engine amortizes in its catalog (Spark's own
    # spark.table does the same via CachedDataSourceTable). Keyed by
    # applicationId so a restarted session never sees relations bound to a
    # dead SparkContext. DataFrames are immutable, so sharing one base
    # relation across queries is safe. Data itself is NOT cached.
    key = (spark.sparkContext.applicationId, path)
    cached = _RELATION_CACHE.get(key)
    if cached is not None:
        return cached
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        dtypes = dict(df.dtypes)
        if dtypes.get("ts") == "bigint":
            # Old fixtures: TIMESTAMP(NANOS) read as epoch-ns long; rebuild at
            # µs precision with integer division (matches DuckDB's ns→µs cut).
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        # Parquet timestamp[us] without isAdjustedToUTC reads as TIMESTAMP_NTZ
        # in Spark 4, which unix_micros()/window() reject. The session TZ is
        # pinned UTC (above), so NTZ → TIMESTAMP is the identity wall-clock
        # mapping and the DuckDB oracle (naive timestamps) still agrees.
        for c, t in dtypes.items():
            if t == "timestamp_ntz":
                df = df.withColumn(c, F.col(c).cast("timestamp"))
    else:
        df = spark.read.parquet(path)
    _RELATION_CACHE[key] = df
    return df


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic ``partsupp`` derived from part × supplier —
    unblocks the partsupp-dependent TPC-H tier (q2/q9/q11/q16/q20) on
    fixtures that ship without one (VERDICT r3 next-step 4).

    Shape follows dbgen: each part gets 4 suppliers; which 4, and the
    availqty/supplycost values, are pure integer-arithmetic functions of
    (p_partkey, s_suppkey) — engine-portable (no hex, no float hashing), so
    the DuckDB oracle rebuilds the byte-identical table from the same
    parquet via :data:`PARTSUPP_ORACLE_CTE` and every downstream query is
    exact-oracle-checkable. Works for ANY sf dir the driver passes; nothing
    is written to disk. Assumes the supplier keyspace is contiguous
    [min, min+count) — true of the fixtures and of dbgen; a gappy keyspace
    would only skew which suppliers are picked, not determinism.

    Scale shape: part is dimension-sized at every SF (lineitem:part is
    ~30:1 in TPC-H), so the 4× explode stays dimension-sized; the supplier
    count/min is a one-row broadcast. At 100 TB a real deployment would
    materialize this once with ``write_bucketed`` on ps_partkey and read it
    back co-located with part — the derivation itself is a cheap scan-side
    expansion either way.
    """
    p = read_table(spark, sf_dir, "part").select("p_partkey")
    ss = read_table(spark, sf_dir, "supplier").agg(
        F.count(F.lit(1)).alias("__s_cnt"), F.min("s_suppkey").alias("__s_min")
    )
    psk = (
        p.crossJoin(F.broadcast(ss))
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            "__s_cnt",
            "__s_min",
            F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("__i"),
        )
        .withColumn(
            "ps_suppkey",
            (
                F.col("__s_min")
                + (F.col("ps_partkey") * 7 + F.col("__i") * 13) % F.col("__s_cnt")
            ).cast("long"),
        )
    )
    return psk.select(
        "ps_partkey",
        "ps_suppkey",
        (
            1 + (F.col("ps_partkey") * 2654435761 + F.col("ps_suppkey") * 40503) % 9999
        )
        .cast("long")
        .alias("ps_availqty"),
        (
            1.0
            + ((F.col("ps_partkey") * 7919 + F.col("ps_suppkey") * 104729) % 100000)
            / 100.0
        )
        .cast("double")
        .alias("ps_supplycost"),
    )


# DuckDB twin of derived_partsupp, for prefixing into oracle SQL as
# `WITH <PARTSUPP_ORACLE_CTE>, ...`. Same integer arithmetic, so both
# engines materialize the identical table from the same parquet.
PARTSUPP_ORACLE_CTE = """
__ss AS (SELECT count(*) AS s_cnt, min(s_suppkey) AS s_min FROM supplier),
__psk AS (SELECT p_partkey AS ps_partkey,
                 s_min + (p_partkey * 7 + i.i * 13) % s_cnt AS ps_suppkey
          FROM part, __ss, (SELECT unnest([0,1,2,3]) AS i) i),
partsupp AS (SELECT ps_partkey, ps_suppkey,
                    CAST(1 + (ps_partkey * 2654435761 + ps_suppkey * 40503) % 9999 AS BIGINT) AS ps_availqty,
                    1.0 + ((ps_partkey * 7919 + ps_suppkey * 104729) % 100000) / 100.0 AS ps_supplycost
             FROM __psk)
"""


#: TPC-H ship modes (public spec, clause 4.2.2.13); order matters for the
#: deterministic pick below.
_SHIP_MODES = ["REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB"]


def derived_lineitem_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem extended with deterministic synthetic ``l_commitdate`` /
    ``l_receiptdate`` / ``l_shipmode`` — unblocks the date-logic TPC-H tier
    (q4/q12/q21) on fixtures that ship without those columns (same move as
    :func:`derived_partsupp`, VERDICT r3 next-step 4).

    Shape follows dbgen: receiptdate = shipdate + [1, 30] days, commitdate
    spread around shipdate ([-30, +30] here, so the q4/q12/q21 "late line"
    predicate ``l_commitdate < l_receiptdate`` selects a nontrivial
    fraction), shipmode uniform over the 7 spec modes. All three are pure
    integer-arithmetic functions of (l_orderkey, l_linenumber) —
    engine-portable, so the DuckDB oracle rebuilds the byte-identical
    columns from the same parquet via :data:`LINEITEM_EXT_ORACLE_CTE`.
    Scan-side expression only: no join, no shuffle, no disk write — free at
    any SF.
    """
    li = read_table(spark, sf_dir, "lineitem")
    k = F.col("l_orderkey")
    ln = F.col("l_linenumber").cast("long")
    commit_days = ((k * 7919 + ln * 104729) % 61 - 30).cast("int")
    receipt_days = (1 + (k * 2654435761 + ln * 40503) % 30).cast("int")
    # multiplier 11 is coprime to the 7 modes: with the old k*7 the orderkey
    # term vanished mod 7 and l_shipmode became a pure function of
    # l_linenumber (ADVICE r5) — q12's MAIL/SHIP filter then selected
    # exactly two fixed linenumbers instead of a uniform spread
    mode_idx = (1 + (k * 11 + ln * 13) % 7).cast("int")
    return (
        li.withColumn(
            "l_commitdate", F.timestamp_add("DAY", commit_days, F.col("l_shipdate"))
        )
        .withColumn(
            "l_receiptdate", F.timestamp_add("DAY", receipt_days, F.col("l_shipdate"))
        )
        .withColumn(
            "l_shipmode",
            F.element_at(F.array(*[F.lit(m) for m in _SHIP_MODES]), mode_idx),
        )
    )


# DuckDB twin of derived_lineitem_ext, for prefixing into oracle SQL as
# `WITH <LINEITEM_EXT_ORACLE_CTE> ...`. Same integer arithmetic + whole-day
# interval addition, so both engines materialize identical columns.
LINEITEM_EXT_ORACLE_CTE = """
lineitem_ext AS (
  SELECT l.*,
         l_shipdate + (((l_orderkey * 7919 + l_linenumber * 104729) % 61) - 30) * INTERVAL 1 DAY AS l_commitdate,
         l_shipdate + (1 + (l_orderkey * 2654435761 + l_linenumber * 40503) % 30) * INTERVAL 1 DAY AS l_receiptdate,
         list_extract(['REG AIR','AIR','RAIL','SHIP','TRUCK','MAIL','FOB'],
                      CAST(1 + (l_orderkey * 11 + l_linenumber * 13) % 7 AS INTEGER)) AS l_shipmode
  FROM lineitem l)
"""


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None) -> dict[str, DataFrame]:
    from airflow_etl_elt_spark import TABLES

    return {n: read_table(spark, sf_dir, n) for n in (names or TABLES)}


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    predicate: str | None = None,
    columns: tuple[str, ...] | None = None,
    partition_column: str | None = None,
    num_partitions: int = 8,
    bounds: tuple[int, int] | None = None,
    driver: str | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """External-DB scan with computation pushdown (SURVEY §2 row 3 — the
    reference ships ``SELECT quality, alcohol FROM wine_data WHERE
    total_sulfur_dioxide < 125`` INTO Postgres, etl_elt_wine.py:268-272).

    Pushdown here is structural, not hopeful: ``predicate``/``columns`` are
    folded into the dbtable subquery, so the DATABASE executes them and only
    the result crosses the wire — exactly the reference's ELT contract.
    (Spark's JDBCRelation also pushes planned filters/required columns, but
    inlining makes the pushdown visible in the plan string and robust to
    expressions JDBC pushdown rejects.)

    Scale: a single JDBC cursor is ONE task no matter the cluster size —
    pass ``partition_column`` + ``bounds`` to split the read into
    ``num_partitions`` range-parallel cursors (the JDBC equivalent of file
    splits). Without it, reads of big tables bottleneck on one connection.
    """
    proj = ", ".join(columns) if columns else "*"
    sub = f"SELECT {proj} FROM {table}"
    if predicate:
        sub += f" WHERE {predicate}"
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", f"({sub}) AS spark_pushdown")
    )
    if driver:
        reader = reader.option("driver", driver)
    if partition_column and bounds:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(bounds[0]))
            .option("upperBound", str(bounds[1]))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()
