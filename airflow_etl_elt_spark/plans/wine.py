"""The reference's two DAGs (ETL_ELT_wine + downstream) re-expressed as
Spark-native pipelines.

Reference lifecycle (SURVEY.md §3): CSV → pandas → DuckDB (ETL path with
INSERT OR IGNORE), CSV → Postgres raw + in-DB transform (ELT path), then a
dataset-triggered downstream DAG charts a per-class KDE from whichever engine
the weekday branch picks. Here both "engines" are parquet tables written by
one Spark app; each former process/engine boundary collapses into a lazy
plan, and the dataset triggers become commit markers.

Canonical schema: FIXTURES.md §1 (DuckDB DDL at etl_elt_wine.py:129-144,
doubles per SURVEY §7 hazard 2).
"""

from __future__ import annotations

import datetime as dt
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from airflow_etl_elt_spark.operators.aggregates import grouped_stats
from airflow_etl_elt_spark.operators.relational import (
    derive_flag,
    filter_ge,
    filter_lt,
    sample_fraction,
    surrogate_key,
)
from airflow_etl_elt_spark.operators.stats import kde_per_group
from airflow_etl_elt_spark.plans.pipeline import Pipeline
from airflow_etl_elt_spark.sources.readers import read_csv_normalized, read_jdbc
from airflow_etl_elt_spark.sources.sinks import (
    insert_ignore_by_name,
    replace_table,
    write_commit_marker,
    write_jdbc,
)

FEATURE_COLS = [
    "fixed_acidity",
    "volatile_acidity",
    "citric_acid",
    "residual_sugar",
    "chlorides",
    "free_sulfur_dioxide",
    "total_sulfur_dioxide",
    "density",
    "pH",
    "sulphates",
    "alcohol",
]

WINE_SCHEMA = T.StructType(
    [T.StructField(c, T.DoubleType()) for c in FEATURE_COLS]
    + [T.StructField("quality", T.IntegerType())]
)

DEFAULT_PARAMS: dict[str, Any] = {
    # etl_elt_wine.py:81-86
    "high_quality_threshold": 7,
    # etl_elt_wine.py:87-92
    "ml_sample_count_threshold": 200,
    # etl_elt_wine.py:54 (SAMPLES_FRAC env, default 1.0) + utils.py:34 seed
    "samples_frac": 1.0,
    "sample_seed": 1,
}


def extract_wine(spark: SparkSession, csv_path: str, params: dict[str, Any]) -> DataFrame:
    """utils.py:20-36 restated: CSV scan → name normalization → surrogate id →
    seeded sample. The id ordering is an explicit stable sort over all columns
    (the pandas positional index depends on file order — SURVEY §7 hazard 1);
    golden-value checks (counts, grouped means) are order-independent."""
    df = read_csv_normalized(spark, csv_path, sep=";")
    df = df.select(
        *[F.col(c).cast("double").alias(c) for c in FEATURE_COLS],
        F.col("quality").cast("int").alias("quality"),
    )
    df = surrogate_key(df, order_by=FEATURE_COLS + ["quality"])
    return sample_fraction(df, params["samples_frac"], params["sample_seed"])


def transform_wine(df: DataFrame, params: dict[str, Any]) -> DataFrame:
    """etl_elt_wine.py:173-192: derive high_quality, keep rows >= threshold."""
    t = params["high_quality_threshold"]
    return filter_ge(derive_flag(df, "high_quality", "quality", t), "quality", t)


def elt_transform(spark: SparkSession, raw_path: str) -> DataFrame:
    """etl_elt_wine.py:249-275: the in-database transform.

    ``raw_path`` may be a parquet path (filter + projection pushed into the
    scan by Catalyst) or a ``jdbc:`` URL (the reference's actual engine
    shape: the predicate/projection are folded into the query the DATABASE
    executes — read_jdbc — so only the ~2k-row result crosses the wire,
    etl_elt_wine.py:268-272)."""
    if raw_path.startswith("jdbc:"):
        # ANSI-quoted identifiers: Spark's JDBC writer creates quoted
        # (case-preserved) columns; unquoted names would fold to uppercase
        # on Derby / lowercase on Postgres. Quoting is portable to both.
        return read_jdbc(
            spark,
            raw_path,
            "wine_data_raw",
            predicate='"total_sulfur_dioxide" < 125',
            columns=('"quality"', '"alcohol"'),
        )
    raw = spark.read.parquet(raw_path)
    return filter_lt(raw, "total_sulfur_dioxide", 125.0).select("quality", "alcohol")


def build_wine_etl_pipeline(
    spark: SparkSession,
    csv_path: str,
    warehouse_dir: str,
    params: dict[str, Any] | None = None,
    now=dt.datetime.now,
    pg_engine_url: str | None = None,
) -> Pipeline:
    """The ETL_ELT_wine DAG. Step names mirror the reference task ids.

    ``pg_engine_url``: optional ``jdbc:`` URL standing in for the reference's
    Postgres server (etl_elt_wine.py:242-243) — the ELT leg then writes/reads
    through JDBC with in-database pushdown instead of the parquet stand-in.
    The pipeline runs unchanged either way (tests cover both via embedded
    Derby)."""
    p = {**DEFAULT_PARAMS, **(params or {})}
    duck_path = os.path.join(warehouse_dir, "wine_data")
    pg_path = pg_engine_url or os.path.join(warehouse_dir, "wine_data_raw")
    marker_dir = os.path.join(warehouse_dir, "_markers")

    pipe = Pipeline(name="ETL_ELT_wine", spark=spark, params=p, now=now)

    def extract(pl: Pipeline, ctx):
        return extract_wine(spark, csv_path, pl.params)

    def transform(pl: Pipeline, ctx):
        return transform_wine(ctx["extract_wine_data"], pl.params)

    def load_duckdb(pl: Pipeline, ctx):
        n = insert_ignore_by_name(spark, ctx["transform_wine_data"], duck_path, key="id")
        write_commit_marker(marker_dir, "duckdb_dataset", {"appended": n})
        total = spark.read.parquet(duck_path).count()
        return {"row_count": total}

    def load_postgresql(pl: Pipeline, ctx):
        # ELT: raw, unfiltered frame replaces the table (etl_elt_wine.py:242-243)
        raw = ctx["extract_wine_data"]
        if pg_path.startswith("jdbc:"):
            write_jdbc(raw, pg_path, "wine_data_raw", mode="overwrite")
            n = read_jdbc(spark, pg_path, "wine_data_raw").count()
        else:
            replace_table(raw, pg_path)
            n = spark.read.parquet(pg_path).count()
        write_commit_marker(marker_dir, "postgresql_dataset", {"row_count": n})
        return {"row_count": n}

    def transform_from_postgresql(pl: Pipeline, ctx):
        return elt_transform(spark, pg_path)

    def branch(pl: Pipeline, ctx):
        # etl_elt_wine.py:297-315: weekday ≤ 5 AND count ≥ threshold → ML too
        count = ctx["load_wine_data_into_duckdb"]["row_count"]
        weekday = pl.now().isoweekday()
        downstream = {"transform_wine_data_from_postgresql", "chart_kde", "print_loaded_wine"}
        if weekday <= 5 and count >= pl.params["ml_sample_count_threshold"]:
            return downstream | {"ml_task_group"}
        return downstream

    def ml_task_group(pl: Pipeline, ctx):
        from airflow_etl_elt_spark.ml.regression import train_wine_models

        return train_wine_models(spark.read.parquet(duck_path), rng=pl.rng)

    def print_loaded_wine(pl: Pipeline, ctx):
        # etl_elt_wine.py:407-431: stats report over the loaded table
        return grouped_stats(spark.read.parquet(duck_path), "quality", "alcohol")

    def chart_kde(pl: Pipeline, ctx):
        # utils.py:255-318 minus the PDF: the KDE grid itself
        return kde_per_group(ctx["transform_wine_data_from_postgresql"], "quality", "alcohol")

    (
        pipe.add("extract_wine_data", extract, retries=2, retry_delay_s=0.1)
        .add("transform_wine_data", transform)
        .add("load_wine_data_into_duckdb", load_duckdb)
        .add("load_wine_data_into_postgresql", load_postgresql)
        .add("branch_task", branch, branch=True)
        .add("transform_wine_data_from_postgresql", transform_from_postgresql)
        .add("ml_task_group", ml_task_group)
        .add("print_loaded_wine", print_loaded_wine)
        .add("chart_kde", chart_kde)
    )
    return pipe


def build_wine_downstream_pipeline(
    spark: SparkSession,
    warehouse_dir: str,
    now=dt.datetime.now,
    pg_engine_url: str | None = None,
    chart_dir: str | None = None,
) -> Pipeline:
    """ETL_ELT_wine_downstream: triggered when BOTH sink markers exist
    (etl_elt_wine_downstream.py:42); weekday < 3 picks the Postgres-shaped
    source, else the DuckDB-shaped one (:96-101); charts quality×alcohol.
    With ``chart_dir`` set, the chart task also renders the reference's PDF
    artifact (utils.py:307-318) via the stdlib vector writer
    (operators/chart_pdf.py) and returns its path."""
    duck_path = os.path.join(warehouse_dir, "wine_data")
    pg_path = pg_engine_url or os.path.join(warehouse_dir, "wine_data_raw")

    pipe = Pipeline(name="ETL_ELT_wine_downstream", spark=spark, now=now)

    def branch(pl: Pipeline, ctx):
        source = (
            "extract_wine_data_postgresql" if pl.now().isoweekday() < 3 else "extract_wine_data_duckdb"
        )
        ctx["chosen_source"] = source
        return {source, "chart_kde"}

    def extract_pg(pl: Pipeline, ctx):
        if pg_path.startswith("jdbc:"):
            return read_jdbc(spark, pg_path, "wine_data_raw", columns=('"quality"', '"alcohol"'))
        return spark.read.parquet(pg_path).select("quality", "alcohol")

    def extract_duck(pl: Pipeline, ctx):
        return spark.read.parquet(duck_path).select("quality", "alcohol")

    def chart_kde(pl: Pipeline, ctx):
        # trigger rule NONE_FAILED_MIN_ONE_SUCCESS: exactly one source ran;
        # the double xcom_pull (task id → value) is ctx[ctx["chosen_source"]]
        df = ctx[ctx["chosen_source"]]
        out = kde_per_group(df, "quality", "alcohol")
        result = {"kde": out, "row_count": df.count()}
        if chart_dir is not None:
            from airflow_etl_elt_spark.operators.chart_pdf import plot_kde_pdf

            result["pdf_path"] = plot_kde_pdf(
                df, "quality", "alcohol", chart_dir, title="Alcohol KDE"
            )
        return result

    (
        pipe.add("branch_task", branch, branch=True)
        .add("extract_wine_data_postgresql", extract_pg)
        .add("extract_wine_data_duckdb", extract_duck)
        .add("chart_kde", chart_kde)
    )
    return pipe
