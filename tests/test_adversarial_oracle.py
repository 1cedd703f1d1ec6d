"""Adversarial-fixture oracle differentials — the engine-portability
contract, enforced in CI.

The driver regenerates fixtures every round; the latent correctness risk
is a Spark↔DuckDB divergence on data shapes the current fixtures don't
contain (round-5 fuzz found 12: unicode-whitespace trim, \\x0B in \\s,
empty-list NULLs, malformed JSON, null-text tie-breaks — see
scripts/build_adversarial_fixture.py). This test rebuilds that fixture
and re-checks the riskiest text/JSON keys exactly; the full-catalog
adversarial sweep runs via scripts/sweep_oracle.py at round end.
"""

from __future__ import annotations

import math
import subprocess
import sys

import pytest

# the keys the round-5 fuzz actually caught, plus their nearest neighbours
KEYS = [
    "token_count",
    "token_count_bpe",
    "text_quality",
    "lang_id",
    "word_entropy",
    "rolling_fingerprint",
    "doc_fingerprint",
    "chunk_documents",
    "segment_dedup",
    "boilerplate_segments",
    "dedup_simhash",
    "dedup_minhash",
    # r6 incremental-index variant shares the sketch; its extra risk is the
    # persisted-signature round-trip + cross-subset candidate join
    "dedup_incremental",
    "stream_dedup_incremental",
    "dedup_minhash_verified",
    "ngram_jaccard",
    "bigram_lm_score",
    # late-r6 exact-oracle conversion; adversarial risk = null/NaN values,
    # null group keys, single-row groups (sigma NULL), subnormal clamp
    "kde_per_group",
    "json_extract",
    "null_handling",
    "ewma",
    # null-ts contract (_events_timed): time-ordered keys drop such rows
    "sessionize",
    "session_stats",
    "scd2_user_state",
    "window_running_sum",
    "window_lag_delta",
    "window_lead_first_last",
    "window_range_frame",
    "events_hourly",
    "sliding_window_hourly",
    # ascii_lower / word_separated contract (case folding + boundaries)
    "top_tokens",
    "tfidf_top_terms",
    # embedding edges (zero/constant vectors)
    "knn_cosine",
    "dedup_embedding",
    # zero-variance groups: ANSI DIVIDE_BY_ZERO vs SQL NULL/NaN
    "zscore_outliers",
    "corr_by_flag",
    # r6 streaming/txn tiers: null-ts watermark contract, null event_type
    # through JSON state, empty right side, argmax null handling
    "stream_dedup",
    "stream_scd2_closed",
    "stream_asof_join",
    "stream_interval_join",
    "txn_change_feed",
    "txn_merge_upsert",
]


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("adv") / "sf")
    subprocess.run(
        [sys.executable, "scripts/build_adversarial_fixture.py", out],
        check=True,
        capture_output=True,
    )
    return out


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(f"{v:.9g}") if v != 0 else 0.0
    return v


@pytest.mark.parametrize("key", KEYS)
def test_adversarial_key_matches_oracle(spark, adv_dir, key):
    import duckdb

    from airflow_etl_elt_spark import TABLES
    from airflow_etl_elt_spark.queries import ORACLE_SQL, QUERIES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{adv_dir}/{t}.parquet'")
    sdf = QUERIES[key](spark, adv_dir)
    scols = sorted(sdf.columns)
    srows = sorted(
        (tuple(_canon(r[c]) for c in scols) for r in sdf.collect()), key=repr
    )
    rel = con.sql(ORACLE_SQL[key])
    order = [rel.columns.index(c) for c in sorted(rel.columns)]
    orows = sorted(
        (tuple(_canon(row[i]) for i in order) for row in rel.fetchall()), key=repr
    )
    assert sorted(sdf.columns) == sorted(rel.columns)
    assert srows == orows, f"{key}: {srows[:3]} vs {orows[:3]}"
