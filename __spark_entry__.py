"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The real catalog lives in ``airflow_etl_elt_spark/queries.py`` — one builder
per implemented operator from SURVEY.md §2 plus the north-star extensions
(joins, windows, time series, dedup, similarity search, text analysis,
multimodal plumbing). This file is just the thin driver-facing adapter.
"""

from __future__ import annotations

import os as _os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Python WORKERS resolve imports from PYTHONPATH + their cwd, not the
# driver's sys.path. The driver imports this file with its own plain
# SparkSession from an arbitrary cwd; without this pin, the first
# pandas-UDF-backed key (minhash/simhash/multimodal) would die in the
# worker with ModuleNotFoundError — and now that dedup_minhash is
# hash-checked (r5) that would read as a correctness failure. Same move as
# session.get_session; must happen before the JVM forks its first worker.
_pkg_root = _os.path.dirname(_os.path.abspath(__file__))
_pp = _os.environ.get("PYTHONPATH", "")
if _pkg_root not in _pp.split(_os.pathsep):
    _os.environ["PYTHONPATH"] = _pkg_root + (_os.pathsep + _pp if _pp else "")

from airflow_etl_elt_spark.queries import ORACLE_SQL, QUERIES  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H-Q1-shaped pricing
    summary (scan → pushed filter → two-phase grouped agg → sort)."""
    return QUERIES["tpch_q1"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator (SURVEY.md §2 keys + north star)."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query key; keys absent here are rows-only by
    design (see ROWS_ONLY_KEYS in airflow_etl_elt_spark/queries.py)."""
    return dict(ORACLE_SQL)
