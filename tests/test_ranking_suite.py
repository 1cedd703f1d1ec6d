"""ranking_suite: the range-bucket offset composition must be value-identical
to the plain ``Window.partitionBy(group)`` formulation on any input, and its
plan must never sort a whole group in one task (VERDICT r5 next-step 3 — the
low-cardinality partition-key spill named at the 30x replica).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

import airflow_etl_elt_spark.operators.windows as W
from airflow_etl_elt_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def _frame(spark, n=600, groups=("a", "b", "c"), null_every=17, skew_group="a"):
    """Seeded frame with heavy skew toward one group, duplicate order values
    across (and within) groups, and NULL order values."""
    rng = random.Random(42)
    rows = []
    for i in range(n):
        g = skew_group if rng.random() < 0.7 else rng.choice(groups)
        v = None if i % null_every == 0 else round(rng.random() * 50, 1)
        rows.append((g, v, i))
    return spark.createDataFrame(rows, "g string, x double, id bigint")


def _plain(df, ntile_n):
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy(F.desc("x"), F.col("id"))
    return df.select(
        "id",
        "g",
        F.dense_rank().over(w).cast("bigint").alias("drank"),
        F.percent_rank().over(w).alias("prank"),
        F.ntile(ntile_n).over(w).cast("bigint").alias("quartile"),
        F.cume_dist().over(w).alias("cdist"),
    )


def test_row_gate_is_compression_independent(spark):
    """r7 regression pin: the r6 replica rewrite halved orders' on-disk
    bytes and silently flipped the compressed-bytes gate OFF at 10x/30x,
    resurrecting the plain-window spill. With footer ``total_rows`` the
    decision must depend on rows-per-group only — a tiny well-compressed
    file with a large stated row count composes; a small one never does."""
    df = _frame(spark)
    big = W.ranking_suite(
        df, "g", "x", "id", total_rows=100 * W.RANK_COMPOSE_ROWS_PER_GROUP
    )
    assert "__bkt" in big._jdf.queryExecution().executedPlan().toString()
    small = W.ranking_suite(df, "g", "x", "id", total_rows=1000)
    assert "__bkt" not in small._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("ntile_n", [2, 3, 4, 7])
def test_composed_matches_plain_window(spark, monkeypatch, ntile_n):
    monkeypatch.setattr(W, "RANK_COMPOSE_BYTES", 0)
    df = _frame(spark)
    got = sorted(
        W.ranking_suite(df, "g", "x", "id", ntile_n=ntile_n).collect(),
        key=lambda r: (r["g"], r["id"]),
    )
    want = sorted(_plain(df, ntile_n).collect(), key=lambda r: (r["g"], r["id"]))
    assert len(got) == len(want)
    for a, b in zip(got, want):
        assert (a["g"], a["id"], a["drank"], a["quartile"]) == (
            b["g"],
            b["id"],
            b["drank"],
            b["quartile"],
        )
        assert a["prank"] == pytest.approx(b["prank"], abs=1e-12)
        assert a["cdist"] == pytest.approx(b["cdist"], abs=1e-12)


def test_composed_single_row_group(spark, monkeypatch):
    # N == 1: percent_rank's (rn-1)/(N-1) division guard
    monkeypatch.setattr(W, "RANK_COMPOSE_BYTES", 0)
    df = spark.createDataFrame([("a", 1.0, 1), ("b", 2.0, 2)], "g string, x double, id bigint")
    rows = {r["g"]: r for r in W.ranking_suite(df, "g", "x", "id").collect()}
    assert rows["a"]["drank"] == 1 and rows["a"]["prank"] == 0.0
    assert rows["a"]["cdist"] == 1.0 and rows["a"]["quartile"] == 1


def test_composed_empty_input(spark, monkeypatch):
    monkeypatch.setattr(W, "RANK_COMPOSE_BYTES", 0)
    df = spark.createDataFrame([], "g string, x double, id bigint")
    assert W.ranking_suite(df, "g", "x", "id").count() == 0


def test_high_cardinality_key_skips_compose(spark, monkeypatch):
    # A key with >= 4x parallelism distinct values already parallelizes the
    # plain window — compose must NOT engage (its two extra passes would be
    # pure overhead). Probe via the plan: the composed path partitions on
    # (g, __bkt); the plain path on g alone.
    monkeypatch.setattr(W, "RANK_COMPOSE_BYTES", 0)
    par = spark.sparkContext.defaultParallelism
    n = 8 * par
    df = spark.createDataFrame(
        [(str(i), float(i % 13), i) for i in range(4 * n)],
        "g string, x double, id bigint",
    )
    plan = W.ranking_suite(df, "g", "x", "id")._jdf.queryExecution().executedPlan().toString()
    assert "__bkt" not in plan


def test_window_ranks_composed_plan_never_sorts_whole_group(spark, monkeypatch):
    """Force compose on the catalog key: the full-data window's partition
    spec must include the range bucket — parallelism groups x buckets, so
    no task ever sorts an entire priority."""
    monkeypatch.setenv("SPARK_GRAFT_PLAN_CACHE", "0")
    # force both gate signals: the catalog key passes footer total_rows (the
    # r7 row-based gate), direct callers without stats hit the bytes gate
    monkeypatch.setattr(W, "RANK_COMPOSE_BYTES", 0)
    monkeypatch.setattr(W, "RANK_COMPOSE_ROWS_PER_GROUP", 0)
    plan = (
        QUERIES["window_ranks"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "__bkt" in plan
    # the row_number window partitions on (group, bucket), not group alone
    import re

    w = re.search(r"Window \[row_number\(\).*?windowspecdefinition\(([^)]*)\)", plan)
    assert w is not None, plan
    assert "__bkt" in w.group(1)
