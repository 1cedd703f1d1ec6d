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


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Co-located join proof: both sides bucketed+sorted on the join key →
    the sort-merge join plans with ZERO Exchange (and zero Sort) operators.
    This is the at-rest layout that deletes the fact-fact shuffle at 100 TB."""
    import io
    from contextlib import redirect_stdout

    from airflow_etl_elt_spark.sources.sinks import write_bucketed

    import uuid

    suffix = uuid.uuid4().hex[:8]
    o_tbl, l_tbl = f"o_bkt_{suffix}", f"l_bkt_{suffix}"
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    write_bucketed(orders, o_tbl, ("o_orderkey",), num_buckets=4, sort_cols=("o_orderkey",))
    write_bucketed(lineitem, l_tbl, ("l_orderkey",), num_buckets=4, sort_cols=("l_orderkey",))

    # force the sort-merge path (at test scale the planner would broadcast,
    # which has its own BroadcastExchange and bypasses bucketing entirely)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(l_tbl).join(
            spark.table(o_tbl),
            spark.table(l_tbl).l_orderkey == spark.table(o_tbl).o_orderkey,
        )
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain()
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # bucket co-location: no shuffle
        # and the co-located result is identical to the plain shuffled join
        expect = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey).count()
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql(f"DROP TABLE IF EXISTS {o_tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {l_tbl}")


def test_upsert_updates_matched_inserts_new(spark, tmp_path):
    from airflow_etl_elt_spark.sources.sinks import upsert_by_key

    path = str(tmp_path / "u")
    assert upsert_by_key(spark, _batch(spark, [(1, "a"), (2, "b")]), path) == (0, 2)
    # 2 matched (updated, batch wins), 3 new (inserted)
    assert upsert_by_key(spark, _batch(spark, [(2, "x"), (3, "c")]), path) == (1, 1)
    data = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert data == {1: "a", 2: "x", 3: "c"}


def test_upsert_is_idempotent(spark, tmp_path):
    from airflow_etl_elt_spark.sources.sinks import upsert_by_key

    path = str(tmp_path / "u")
    b = _batch(spark, [(1, "a"), (2, "b")])
    upsert_by_key(spark, b, path)
    assert upsert_by_key(spark, b, path) == (2, 0)  # all matched, no inserts
    data = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert data == {1: "a", 2: "b"}


def test_upsert_batch_dupes_resolve_by_recency(spark, tmp_path):
    from airflow_etl_elt_spark.sources.sinks import upsert_by_key

    path = str(tmp_path / "u")
    b = _batch(spark, [(1, "old", 10), (1, "new", 20), (2, "b", 5)], cols=("id", "v", "ts"))
    assert upsert_by_key(spark, b, path, order_col="ts") == (0, 2)
    data = {r["id"]: r["v"] for r in spark.read.parquet(path).collect()}
    assert data == {1: "new", 2: "b"}  # max-ts row won within the batch


def test_upsert_column_names_matched_not_positions(spark, tmp_path):
    from airflow_etl_elt_spark.sources.sinks import upsert_by_key

    path = str(tmp_path / "u")
    upsert_by_key(spark, _batch(spark, [(1, "a")]), path)
    # batch with swapped column ORDER must still line up by name
    swapped = spark.createDataFrame([("z", 1)], ["v", "id"])
    assert upsert_by_key(spark, swapped, path) == (1, 0)
    assert {r["v"] for r in spark.read.parquet(path).collect()} == {"z"}


def test_upsert_missing_column_rejected(spark, tmp_path):
    import pytest

    from airflow_etl_elt_spark.sources.sinks import upsert_by_key

    path = str(tmp_path / "u")
    upsert_by_key(spark, _batch(spark, [(1, "a")]), path)
    with pytest.raises(ValueError, match="missing target columns"):
        upsert_by_key(spark, spark.createDataFrame([(3,)], ["id"]), path)


def test_rewriting_sinks_invalidate_relation_cache(spark, tmp_path):
    """A cached read_table relation pins the old file listing; replace/upsert/
    append sinks must invalidate it or post-write reads see stale data."""
    from airflow_etl_elt_spark.sources.readers import read_table
    from airflow_etl_elt_spark.sources.sinks import replace_table, upsert_by_key

    path = str(tmp_path / "t.parquet")
    _batch(spark, [(1, "a")]).write.parquet(path)
    assert read_table(spark, str(tmp_path), "t").count() == 1  # now cached

    upsert_by_key(spark, _batch(spark, [(1, "x"), (2, "b")]), path)
    assert read_table(spark, str(tmp_path), "t").count() == 2

    replace_table(_batch(spark, [(9, "z")]), path)
    got = read_table(spark, str(tmp_path), "t").collect()
    assert [(r["id"], r["v"]) for r in got] == [(9, "z")]

    assert insert_ignore_by_name(spark, _batch(spark, [(9, "z"), (10, "w")]), path) == 1
    assert read_table(spark, str(tmp_path), "t").count() == 2
