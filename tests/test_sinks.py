"""Idempotent keyed append (INSERT OR IGNORE BY NAME) property tests —
SURVEY.md §5 item 3: appending the same batch twice == once; column order
must not matter; duplicate keys within a batch collapse."""

from __future__ import annotations

from airflow_etl_elt_spark.sources.sinks import insert_ignore_by_name


def _batch(spark, rows, cols=("id", "v")):
    return spark.createDataFrame(rows, list(cols))


def test_append_twice_equals_once(spark, tmp_path):
    path = str(tmp_path / "t")
    b = _batch(spark, [(1, "a"), (2, "b")])
    assert insert_ignore_by_name(spark, b, path) == 2
    assert insert_ignore_by_name(spark, b, path) == 0
    assert spark.read.parquet(path).count() == 2


def test_only_new_keys_appended(spark, tmp_path):
    path = str(tmp_path / "t")
    insert_ignore_by_name(spark, _batch(spark, [(1, "a"), (2, "b")]), path)
    n = insert_ignore_by_name(spark, _batch(spark, [(2, "x"), (3, "c")]), path)
    assert n == 1
    data = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert data == {1: "a", 2: "b", 3: "c"}  # existing row 2 untouched


def test_by_name_column_matching(spark, tmp_path):
    """BY NAME semantics (etl_elt_wine.py:216): source column order differs
    from target order; values must land in the right columns."""
    path = str(tmp_path / "t")
    insert_ignore_by_name(spark, _batch(spark, [(1, "a")], cols=("id", "v")), path)
    reordered = _batch(spark, [("b", 2)], cols=("v", "id"))
    assert insert_ignore_by_name(spark, reordered, path) == 1
    data = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert data == {1: "a", 2: "b"}


def test_missing_column_rejected(spark, tmp_path):
    import pytest

    path = str(tmp_path / "t")
    insert_ignore_by_name(spark, _batch(spark, [(1, "a")]), path)
    with pytest.raises(ValueError, match="missing target columns"):
        insert_ignore_by_name(spark, spark.createDataFrame([(9,)], ["id"]), path)


def test_intra_batch_duplicate_keys_collapse(spark, tmp_path):
    path = str(tmp_path / "t")
    n = insert_ignore_by_name(spark, _batch(spark, [(1, "a"), (1, "z"), (2, "b")]), path)
    assert n == 2
    assert spark.read.parquet(path).count() == 2
