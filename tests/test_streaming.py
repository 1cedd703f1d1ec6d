"""Structured Streaming twins: the batch transformation run as a stream over
file drops must produce the same result as the batch path (availableNow
catch-up), and session windows must merge correctly."""

from __future__ import annotations

import datetime as dt


def _write_event_drop(spark, path, rows):
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    ).write.mode("append").parquet(path)


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_hourly_agg_stream_matches_batch(spark, tmp_path):
    from airflow_etl_elt_spark.operators.timeseries import hourly_agg
    from airflow_etl_elt_spark.streaming.windowed import (
        hourly_agg_stream,
        read_events_stream,
        run_available_now,
    )

    src = str(tmp_path / "events")
    rows = [
        (1, _ts(0, 5), 1, "click", 1.0, "{}"),
        (2, _ts(0, 50), 1, "click", 2.0, "{}"),
        (3, _ts(1, 10), 2, "view", 3.0, "{}"),
        (4, _ts(2, 30), 2, "click", 4.0, "{}"),
    ]
    _write_event_drop(spark, src, rows)

    stream = hourly_agg_stream(read_events_stream(spark, src))
    got = run_available_now(stream, str(tmp_path / "ckpt"), "hourly_t")
    batch = hourly_agg(spark.read.parquet(src)).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))


def test_stream_picks_up_new_files(spark, tmp_path):
    """Dataset-trigger semantics: a second availableNow run sees only-new
    data through the checkpoint and the aggregate reflects both drops."""
    from airflow_etl_elt_spark.streaming.windowed import (
        hourly_agg_stream,
        read_events_stream,
        run_available_now,
    )

    src = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    _write_event_drop(spark, src, [(1, _ts(0, 5), 1, "click", 1.0, "{}")])
    got1 = run_available_now(hourly_agg_stream(read_events_stream(spark, src)), ckpt, "inc_t1")
    assert len(got1) == 1 and got1[0]["cnt"] == 1

    _write_event_drop(spark, src, [(2, _ts(0, 30), 1, "click", 5.0, "{}")])
    got2 = run_available_now(hourly_agg_stream(read_events_stream(spark, src)), ckpt, "inc_t2")
    row = [r for r in got2 if r["event_type"] == "click"][0]
    assert row["cnt"] == 2 and row["sum_value"] == 6.0


def test_session_window_stream(spark, tmp_path):
    from airflow_etl_elt_spark.streaming.windowed import (
        read_events_stream,
        run_available_now,
        sessionize_stream,
    )

    src = str(tmp_path / "events")
    rows = [
        (1, _ts(0, 0), 1, "a", 1.0, "{}"),
        (2, _ts(0, 10), 1, "a", 1.0, "{}"),   # same session (gap 10m < 30m)
        (3, _ts(1, 0), 1, "a", 1.0, "{}"),    # new session (gap 50m)
        (4, _ts(0, 0), 2, "a", 1.0, "{}"),
    ]
    _write_event_drop(spark, src, rows)
    out = run_available_now(
        sessionize_stream(read_events_stream(spark, src)), str(tmp_path / "ck"), "sess_t"
    )
    per_user = {}
    for r in out:
        per_user.setdefault(r["user_id"], []).append(r["n_events"])
    assert sorted(per_user[1]) == [1, 2]
    assert per_user[2] == [1]


def _run_foreach_batch(stream_df, ckpt, mode="update"):
    """Collect availableNow output via foreachBatch (works for every output
    mode, unlike the memory sink)."""
    batches = []

    def sink(df, _bid):
        batches.extend(df.collect())

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return batches


def test_stream_static_enrichment(spark, tmp_path):
    from airflow_etl_elt_spark.streaming.windowed import enrich_stream, read_events_stream

    src = str(tmp_path / "events")
    _write_event_drop(spark, src, [(1, _ts(0, 5), 1, "click", 1.0, "{}"),
                                   (2, _ts(0, 6), 2, "view", 2.0, "{}"),
                                   (3, _ts(0, 7), 9, "view", 3.0, "{}")])  # user 9: no dim row
    users = spark.createDataFrame(
        [(1, "gold"), (2, "free")], "u_user_id bigint, u_segment string"
    )
    got = _run_foreach_batch(
        enrich_stream(read_events_stream(spark, src), users),
        str(tmp_path / "ck"),
        mode="append",
    )
    by_event = {r["event_id"]: r["u_segment"] for r in got}
    assert by_event == {1: "gold", 2: "free"}  # inner join drops user 9


def test_stateful_running_totals_across_batches(spark, tmp_path):
    from airflow_etl_elt_spark.streaming.stateful import running_user_totals_stream
    from airflow_etl_elt_spark.streaming.windowed import read_events_stream

    src = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    _write_event_drop(spark, src, [(1, _ts(0, 5), 1, "click", 1.0, "{}"),
                                   (2, _ts(0, 6), 1, "click", 2.0, "{}")])
    got1 = _run_foreach_batch(
        running_user_totals_stream(read_events_stream(spark, src)), ckpt
    )
    assert {(r["user_id"], r["n_events"], r["total_value"]) for r in got1} == {(1, 2, 3.0)}

    # state must persist through the checkpoint into the next availableNow run
    _write_event_drop(spark, src, [(3, _ts(1, 0), 1, "click", 4.0, "{}"),
                                   (4, _ts(1, 1), 2, "view", 9.0, "{}")])
    got2 = _run_foreach_batch(
        running_user_totals_stream(read_events_stream(spark, src)), ckpt
    )
    per_user = {r["user_id"]: (r["n_events"], r["total_value"]) for r in got2}
    assert per_user[1] == (3, 7.0)
    assert per_user[2] == (1, 9.0)


def test_dedup_stream_drops_duplicate_ids(spark, tmp_path):
    from airflow_etl_elt_spark.streaming.stateful import dedup_stream
    from airflow_etl_elt_spark.streaming.windowed import read_events_stream

    src = str(tmp_path / "events")
    rows = [
        (1, _ts(0, 0), 1, "a", 1.0, "{}"),
        (1, _ts(0, 1), 1, "a", 1.0, "{}"),   # duplicate event_id
        (2, _ts(0, 2), 1, "a", 1.0, "{}"),
    ]
    _write_event_drop(spark, src, rows)
    got = _run_foreach_batch(
        dedup_stream(read_events_stream(spark, src)), str(tmp_path / "ck"), mode="append"
    )
    assert sorted(r["event_id"] for r in got) == [1, 2]


def test_sliding_window_stream_matches_batch(spark, tmp_path):
    """sliding_hourly_agg's plan is streaming-legal as claimed: the identical
    transformation over a file-drop stream (with a watermark) produces the
    batch result under availableNow catch-up."""
    from pyspark.sql import functions as F

    from airflow_etl_elt_spark.operators.timeseries import sliding_hourly_agg
    from airflow_etl_elt_spark.streaming.windowed import (
        read_events_stream,
        run_available_now,
    )

    src = str(tmp_path / "events")
    rows = [
        (1, _ts(0, 5), 1, "click", 1.0, "{}"),
        (2, _ts(0, 40), 1, "click", 2.0, "{}"),
        (3, _ts(1, 10), 2, "view", 3.0, "{}"),
        (4, _ts(1, 35), 2, "click", 4.0, "{}"),
    ]
    _write_event_drop(spark, src, rows)

    stream = sliding_hourly_agg(
        read_events_stream(spark, src).withWatermark("ts", "2 hours")
    )
    got = run_available_now(stream, str(tmp_path / "ckpt"), "slide_t")
    batch = sliding_hourly_agg(spark.read.parquet(src)).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, batch))
    # each event in exactly 2 overlapping windows
    assert sum(r["n_events"] for r in got) == 2 * len(rows)


def test_corpus_hygiene_ops_are_streaming_legal(spark, tmp_path):
    """The stateless corpus-hygiene ops (stratified_sample, repetition_score)
    must run unchanged over a document STREAM — ingestion-time hygiene at
    100 TB is a streaming job, not a nightly batch. availableNow catch-up
    over a file drop must equal the batch result exactly."""
    from airflow_etl_elt_spark.operators.relational import stratified_sample
    from airflow_etl_elt_spark.operators.text import repetition_score

    src = str(tmp_path / "docs")
    rows = [
        (i, ("spark rows " * (i % 4 + 1)).strip(), "en" if i % 2 else "zh")
        for i in range(40)
    ]
    schema = "doc_id bigint, text string, lang string"
    spark.createDataFrame(rows, schema).write.mode("append").parquet(src)

    def hygiene(df):
        kept = stratified_sample(df, "lang", {"en": 50}, key_col="doc_id")
        return repetition_score(kept, n=2)

    batch = sorted(tuple(r) for r in hygiene(spark.read.parquet(src)).collect())
    stream_df = hygiene(spark.readStream.schema(schema).parquet(src))
    got = sorted(
        tuple(r)
        for r in _run_foreach_batch(stream_df, str(tmp_path / "ckpt"), mode="append")
    )
    assert got == batch and len(got) > 0


def test_pii_redact_is_streaming_legal(spark, tmp_path):
    """PII scrubbing is pure codegen regex (no shuffle, no state) so the
    SAME operator must run over an ingestion stream — redact-at-ingest is
    the 100 TB privacy posture (raw text should never land unredacted)."""
    from airflow_etl_elt_spark.operators.text import pii_redact

    src = str(tmp_path / "docs")
    rows = [
        (0, "mail me at a.b@example.com or call 555-123-4567"),
        (1, "server at 10.0.0.1 is fine"),
        (2, "no pii here"),
    ]
    schema = "doc_id bigint, text string"
    spark.createDataFrame(rows, schema).write.mode("append").parquet(src)
    batch = sorted(
        tuple(r) for r in pii_redact(spark.read.parquet(src)).collect()
    )
    stream_df = pii_redact(spark.readStream.schema(schema).parquet(src))
    got = sorted(
        tuple(r)
        for r in _run_foreach_batch(stream_df, str(tmp_path / "ckpt2"), mode="append")
    )
    assert got == batch and len(got) == 3
    # (doc_id, n_emails, n_ips, n_phones, clean_len, clean_fp)
    counts = {r[0]: (r[1], r[2], r[3]) for r in got}
    assert counts[0] == (1, 0, 1)
    assert counts[1] == (0, 1, 0)
    assert counts[2] == (0, 0, 0)


def test_ewma_stream_matches_batch(spark, tmp_path):
    """Streaming EWMA (two-double state, untruncated recursion) agrees with
    the batch 50-step-truncated operator to within the documented
    (1-alpha)^50 bound, across TWO micro-batch runs through the
    checkpoint."""
    from airflow_etl_elt_spark.operators.timeseries import ewma
    from airflow_etl_elt_spark.streaming.stateful import ewma_stream
    from airflow_etl_elt_spark.streaming.windowed import read_events_stream

    src = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    rows1 = [(i, _ts(0, i), 1 + (i % 2), "e", float(i * 7 % 5), "{}") for i in range(8)]
    rows2 = [(i, _ts(1, i - 8), 1 + (i % 2), "e", float(i * 3 % 4), "{}") for i in range(8, 14)]
    _write_event_drop(spark, src, rows1)
    got1 = _run_foreach_batch(
        ewma_stream(read_events_stream(spark, src)), ckpt
    )
    _write_event_drop(spark, src, rows2)
    got2 = _run_foreach_batch(
        ewma_stream(read_events_stream(spark, src)), ckpt
    )
    streamed = {r["event_id"]: r["ewma"] for r in got1 + got2}
    batch = {
        r["event_id"]: r["ewma"]
        for r in ewma(spark.read.parquet(src)).collect()
    }
    assert set(streamed) == set(batch)
    for eid in batch:
        assert abs(streamed[eid] - batch[eid]) < 1e-6


def test_scd2_stream_closed_intervals_match_batch(spark, tmp_path):
    """Streaming SCD2 emits each CLOSED validity interval exactly once as
    attribute changes arrive, matching the batch scd2_history's non-current
    rows — including a change that spans the micro-batch boundary."""
    from airflow_etl_elt_spark.operators.relational import scd2_history
    from airflow_etl_elt_spark.streaming.stateful import scd2_stream
    from airflow_etl_elt_spark.streaming.windowed import read_events_stream

    src = str(tmp_path / "events")
    ckpt = str(tmp_path / "ckpt")
    _write_event_drop(spark, src, [
        (1, _ts(0, 0), 1, "bronze", 0.0, "{}"),
        (2, _ts(0, 10), 1, "bronze", 0.0, "{}"),
        (3, _ts(0, 20), 1, "silver", 0.0, "{}"),
        (4, _ts(0, 5), 2, "bronze", 0.0, "{}"),
    ])
    got1 = _run_foreach_batch(scd2_stream(read_events_stream(spark, src)), ckpt)
    # second drop: user 1 changes again, user 2's first change arrives
    _write_event_drop(spark, src, [
        (5, _ts(1, 0), 1, "gold", 0.0, "{}"),
        (6, _ts(1, 5), 2, "silver", 0.0, "{}"),
    ])
    got2 = _run_foreach_batch(scd2_stream(read_events_stream(spark, src)), ckpt)
    streamed = sorted(
        (r["user_id"], r["event_type"], r["valid_from"], r["valid_to"])
        for r in got1 + got2
    )
    batch = sorted(
        (r["user_id"], r["event_type"], r["valid_from"], r["valid_to"])
        for r in scd2_history(
            spark.read.parquet(src), "user_id", "ts", ["event_type"], "event_id"
        ).collect()
        if not r["is_current"]
    )
    assert streamed == batch and len(streamed) == 3


def test_stream_asof_enrich_matches_batch(spark, tmp_path):
    """foreachBatch as-of enrichment over a static right side is exactly
    the batch as-of join however the left stream is micro-batched."""
    import datetime as dt

    from airflow_etl_elt_spark.operators.asof import asof_join
    from airflow_etl_elt_spark.streaming.windowed import (
        read_events_stream,
        stream_asof_enrich,
    )

    src = str(tmp_path / "events")
    out = str(tmp_path / "enriched")
    ckpt = str(tmp_path / "ckpt")
    right = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 0, 0), 10.0),
         (1, dt.datetime(2024, 1, 1, 0, 30), 20.0),
         (2, dt.datetime(2024, 1, 1, 0, 15), 30.0)],
        "user_id bigint, rts timestamp, price double",
    )
    _write_event_drop(spark, src, [(1, _ts(0, 10), 1, "e", 0.0, "{}"),
                                   (2, _ts(0, 40), 1, "e", 0.0, "{}")])
    stream_asof_enrich(
        read_events_stream(spark, src), right, on="user_id",
        left_ts="ts", right_ts="rts", right_values=["price"],
        out_path=out, checkpoint_dir=ckpt,
    )
    _write_event_drop(spark, src, [(3, _ts(0, 20), 2, "e", 0.0, "{}"),
                                   (4, _ts(0, 5), 2, "e", 0.0, "{}")])
    stream_asof_enrich(
        read_events_stream(spark, src), right, on="user_id",
        left_ts="ts", right_ts="rts", right_values=["price"],
        out_path=out, checkpoint_dir=ckpt,
    )
    streamed = sorted(
        (r["event_id"], r["asof_price"])
        for r in spark.read.parquet(out).collect()
    )
    batch = sorted(
        (r["event_id"], r["asof_price"])
        for r in asof_join(
            spark.read.parquet(src), right, on="user_id", left_ts="ts",
            right_ts="rts", right_values=["price"], strict=False,
        ).collect()
    )
    assert streamed == batch == [(1, 10.0), (2, 20.0), (3, 30.0), (4, None)]


def test_stateful_streams_accept_string_keys(spark, tmp_path):
    """ewma_stream / scd2_stream derive key/tiebreak/attr output types from
    the input schema (ADVICE r5: the hardcoded bigint signature failed
    Arrow conversion on string user ids)."""
    from airflow_etl_elt_spark.streaming.stateful import ewma_stream, scd2_stream

    schema = (
        "event_id bigint, ts timestamp, user_id string, "
        "event_type string, value double"
    )
    src = str(tmp_path / "sk_events")
    spark.createDataFrame(
        [
            (1, _ts(0, 0), "alice", "bronze", 1.0),
            (2, _ts(0, 10), "alice", "silver", 2.0),
            (3, _ts(0, 5), "bob", "bronze", 3.0),
        ],
        schema,
    ).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)

    got = _run_foreach_batch(ewma_stream(stream), str(tmp_path / "ck1"))
    assert {r["user_id"] for r in got} == {"alice", "bob"}
    assert all(isinstance(r["user_id"], str) for r in got)

    stream2 = spark.readStream.schema(schema).parquet(src)
    closed = _run_foreach_batch(scd2_stream(stream2), str(tmp_path / "ck2"))
    assert [(r["user_id"], r["event_type"]) for r in closed] == [("alice", "bronze")]


def test_scd2_stream_rejects_non_json_attr_types(spark, tmp_path):
    """Attr columns ride JSON state, so a timestamp attr raises up front
    instead of silently stringifying."""
    import pytest as _pytest
    from airflow_etl_elt_spark.streaming.stateful import scd2_stream

    schema = "event_id bigint, ts timestamp, user_id bigint, seen timestamp"
    src = str(tmp_path / "bad_events")
    spark.createDataFrame([(1, _ts(0, 0), 1, _ts(0, 0))], schema).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    with _pytest.raises(ValueError, match="JSON state"):
        scd2_stream(stream, attr_cols=("seen",))


def _write_drop(spark, path, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("append").parquet(path)


def test_asof_join_stream_matches_batch(spark, tmp_path):
    """Stream-STREAM as-of join: the watermark-gated reorder buffer emits,
    across three micro-batch runs through the checkpoint, exactly the batch
    asof_join rows whose left timestamp the final watermark has passed —
    including a match that spans the drop boundary (right row arrives in a
    LATER drop than the left row it decorates)."""
    from airflow_etl_elt_spark.operators.asof import asof_join
    from airflow_etl_elt_spark.streaming.stateful import asof_join_stream

    lsrc, rsrc = str(tmp_path / "trades"), str(tmp_path / "quotes")
    ckpt = str(tmp_path / "ckpt")
    lschema = "trade_id bigint, ts timestamp, sym string, qty double"
    rschema = "ts timestamp, sym string, px double"

    def run():
        lstream = spark.readStream.schema(lschema).parquet(lsrc)
        rstream = spark.readStream.schema(rschema).parquet(rsrc)
        return _run_foreach_batch(
            asof_join_stream(
                lstream, rstream, on="sym", left_ts="ts", right_ts="ts",
                right_values=["px"], strict=True, watermark="10 minutes",
            ),
            ckpt,
            mode="append",
        )

    # drop 1: quotes before and after the first trades; trade 3 has no
    # quote yet (its quote arrives in drop 2 — the reorder case)
    _write_drop(spark, rsrc, [(_ts(0, 0), "A", 10.0), (_ts(0, 4), "A", 11.0),
                              (_ts(0, 1), "B", 50.0)], rschema)
    _write_drop(spark, lsrc, [(1, _ts(0, 5), "A", 1.0),
                              (2, _ts(0, 2), "B", 2.0),
                              (3, _ts(0, 30), "B", 3.0)], lschema)
    got = run()
    # drop 2: the late-ish quote for trade 3, plus more trades
    _write_drop(spark, rsrc, [(_ts(0, 20), "B", 55.0)], rschema)
    _write_drop(spark, lsrc, [(4, _ts(0, 40), "A", 4.0),
                              (5, _ts(0, 6), "C", 5.0)], lschema)  # C: no quotes at all
    got += run()
    # drop 3: watermark-advancing sentinels on a spectator key (watermark is
    # global, so these ripen every earlier left row); the sentinel trade
    # itself stays buffered — the documented contract
    _write_drop(spark, rsrc, [(_ts(6, 0), "Z", 0.0)], rschema)
    _write_drop(spark, lsrc, [(99, _ts(6, 0), "Z", 0.0)], lschema)
    got += run()

    streamed = sorted((r["trade_id"], r["sym"], r["asof_px"]) for r in got)
    batch = sorted(
        (r["trade_id"], r["sym"], r["asof_px"])
        for r in asof_join(
            spark.read.parquet(lsrc), spark.read.parquet(rsrc),
            on="sym", left_ts="ts", right_ts="ts", right_values=["px"],
            strict=True,
        ).collect()
        if r["trade_id"] != 99  # still buffered: final watermark has not passed it
    )
    assert streamed == batch and len(streamed) == 5
    by_id = {r[0]: r[2] for r in streamed}
    assert by_id[1] == 11.0     # latest A quote before 0:05
    assert by_id[2] == 50.0
    assert by_id[3] == 55.0     # the quote that arrived a drop later
    assert by_id[4] == 11.0
    assert by_id[5] is None     # key with no right rows


def test_asof_join_stream_tolerance_and_forward(spark, tmp_path):
    """tolerance_seconds null-gates stale matches; direction='forward'
    matches the earliest later quote within the bound and REQUIRES a
    tolerance on a stream (undecidable without one)."""
    import pytest as _pytest

    from airflow_etl_elt_spark.operators.asof import asof_join
    from airflow_etl_elt_spark.streaming.stateful import asof_join_stream

    lschema = "trade_id bigint, ts timestamp, sym string"
    rschema = "ts timestamp, sym string, px double"
    lrows = [(1, _ts(0, 5), "A"), (2, _ts(1, 30), "A")]
    rrows = [(_ts(0, 4), "A", 10.0), (_ts(0, 7), "A", 12.0)]
    sentinel_l = [(99, _ts(8, 0), "Z")]
    sentinel_r = [(_ts(8, 0), "Z", 0.0)]

    for mode, kwargs, expect in [
        # backward, 10-min staleness: trade 2's only earlier quote is ~83
        # minutes stale -> NULL
        ("tol", dict(strict=True, tolerance_seconds=600), {1: 10.0, 2: None}),
        # forward, 10-min horizon: trade 1 takes the 0:07 quote, trade 2
        # has no later quote within bound -> NULL
        ("fwd", dict(strict=True, tolerance_seconds=600, direction="forward"),
         {1: 12.0, 2: None}),
    ]:
        lsrc = str(tmp_path / f"l_{mode}")
        rsrc = str(tmp_path / f"r_{mode}")
        _write_drop(spark, lsrc, lrows + sentinel_l, lschema)
        _write_drop(spark, rsrc, rrows + sentinel_r, rschema)
        # two runs: run 1 sets the watermark from the data, run 2 emits
        got = []
        for _ in range(2):
            lstream = spark.readStream.schema(lschema).parquet(lsrc)
            rstream = spark.readStream.schema(rschema).parquet(rsrc)
            got += _run_foreach_batch(
                asof_join_stream(
                    lstream, rstream, on="sym", left_ts="ts", right_ts="ts",
                    right_values=["px"], watermark="10 minutes", **kwargs,
                ),
                str(tmp_path / f"ck_{mode}"),
                mode="append",
            )
        assert {r["trade_id"]: r["asof_px"] for r in got} == expect
        # and the emitted rows agree with the batch operator
        batch = {
            r["trade_id"]: r["asof_px"]
            for r in asof_join(
                spark.read.parquet(lsrc), spark.read.parquet(rsrc),
                on="sym", left_ts="ts", right_ts="ts", right_values=["px"],
                **kwargs,
            ).collect()
            if r["trade_id"] != 99
        }
        assert {r["trade_id"]: r["asof_px"] for r in got} == batch

    with _pytest.raises(ValueError, match="tolerance"):
        asof_join_stream(
            spark.readStream.schema(lschema).parquet(str(tmp_path / "l_tol")),
            spark.readStream.schema(rschema).parquet(str(tmp_path / "r_tol")),
            on="sym", left_ts="ts", right_ts="ts", right_values=["px"],
            direction="forward",
        )
