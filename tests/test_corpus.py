"""End-to-end corpus pipeline: quality/lang filter → exact dedup → near-dup
removal → per-language stats → partitioned write."""

from __future__ import annotations

import pyspark.sql.functions as F

from airflow_etl_elt_spark.plans.corpus import clean_corpus, corpus_stats, write_corpus


def _docs(spark):
    en = "the cat and the dog sat in the house and the bird is on the roof today"
    rows = [
        (1, en, "en", "web", len(en)),
        (2, en, "en", "web", len(en)),                      # exact dup of 1
        (3, en + " extra tail words here", "en", "web", 0), # near dup of 1
        (4, "le chat est dans la maison avec le chien et les oiseaux", "fr", "web", 0),
        (5, "short text", "en", "web", 0),                  # < min_tokens
        (6, "!!! ??? ;;; ... ,,, :::" * 4, "en", "web", 0), # punct junk
        (7, "the quick brown fox jumps over the lazy dog and runs to the green hill", "en", "web", 0),
    ]
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )


def test_clean_corpus_filters_and_dedups(spark):
    out = clean_corpus(
        _docs(spark), min_tokens=10, max_symbol_ratio=0.2, keep_langs=("en",),
        near_dup_threshold=0.5,
    )
    ids = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    # 2 exact-dup dropped, 3 near-dup dropped, 4 wrong lang, 5 too short,
    # 6 punct junk → survivors: 1 and 7
    assert ids == [1, 7]


def test_corpus_stats_shape(spark):
    out = clean_corpus(_docs(spark), min_tokens=5, near_dup_threshold=0.9)
    stats = corpus_stats(out).collect()
    assert [r["lang_pred"] for r in stats] == ["en"]
    assert stats[0]["n_docs"] >= 2


def test_write_corpus_partitions_by_lang(spark, tmp_path):
    out = clean_corpus(_docs(spark), min_tokens=5, keep_langs=("en", "fr"),
                       near_dup_threshold=0.9)
    path = str(tmp_path / "corpus")
    write_corpus(out, path)
    back = spark.read.parquet(path)
    langs = {r["lang_pred"] for r in back.select("lang_pred").distinct().collect()}
    assert langs == {"en", "fr"}
    import os
    assert any(d.startswith("lang_pred=") for d in os.listdir(path))


def test_pack_sequences_budget_and_coverage(spark):
    from airflow_etl_elt_spark.plans.corpus import pack_sequences

    docs = spark.createDataFrame(
        [(i, 100 + (i * 37) % 900) for i in range(200)] + [(999, 5000)],
        "doc_id bigint, n_tokens bigint",
    )
    packs = pack_sequences(docs, max_tokens=1000).collect()
    all_ids = [d for r in packs for d in r["doc_ids"]]
    assert sorted(all_ids) == sorted([r["doc_id"] for r in docs.collect()])  # exactly once
    assert len(set(r["pack_id"] for r in packs)) == len(packs)  # unique pack ids
    for r in packs:
        assert r["total_tokens"] <= 1000 or r["n_docs"] == 1  # budget, oversize alone
    # deterministic across runs
    again = pack_sequences(docs, max_tokens=1000).collect()
    assert sorted((r["pack_id"], tuple(r["doc_ids"])) for r in packs) == sorted(
        (r["pack_id"], tuple(r["doc_ids"])) for r in again
    )


def test_idempotent_stream_ingestion(spark, tmp_path):
    import datetime as dt

    from airflow_etl_elt_spark.streaming.windowed import (
        read_events_stream,
        stream_insert_ignore,
    )

    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    src = str(tmp_path / "stream_src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2024, 1, 1)

    spark.createDataFrame([(1, t0, 1, "a", 1.0, "{}"), (2, t0, 1, "b", 2.0, "{}")],
                          schema).write.mode("append").parquet(src)
    stream_insert_ignore(read_events_stream(spark, src), sink, "event_id", ckpt)
    assert spark.read.parquet(sink).count() == 2

    # second drop replays event 2 (duplicate key) + adds event 3
    spark.createDataFrame([(2, t0, 1, "b", 2.0, "{}"), (3, t0, 2, "c", 3.0, "{}")],
                          schema).write.mode("append").parquet(src)
    stream_insert_ignore(read_events_stream(spark, src), sink, "event_id", ckpt)
    rows = spark.read.parquet(sink).collect()
    assert sorted(r["event_id"] for r in rows) == [1, 2, 3]
