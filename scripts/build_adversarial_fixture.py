#!/usr/bin/env python
"""Build an ADVERSARIAL fixture dir for oracle-divergence fuzzing.

The driver regenerates the parquet fixtures every round, so the real
correctness risk is a Spark/DuckDB divergence on data shapes the current
fixtures don't contain. This script synthesizes a fixture whose documents
and events exercise exactly those shapes — null/empty/whitespace-only text
(ASCII and UNICODE whitespace), control separators, emoji, NUL bytes, one
giant token, exact and near duplicate texts, malformed and non-scalar JSON
props, null event values, duplicate timestamps — while reusing the real
sf0.001 TPC-H tables unchanged.

Usage:  python scripts/build_adversarial_fixture.py [OUT_DIR]
then:   python scripts/sweep_oracle.py OUT_DIR

Round-5 findings from this fuzz (all fixed + regression-swept):
- DuckDB trim() strips UNICODE whitespace, Java trim() only <= U+0020 →
  every trim-then-split tokenization diverged; replaced repo-wide with the
  no-trim ws_tokens contract (split on the explicit class, drop '').
- Java \\s includes \\x0B, RE2's does not — inside BPE_ISH_PATTERN's
  negated class this produced an extra token per vertical tab.
- DuckDB list slicing/array_to_string on empty lists yields NULL (Spark:
  ''/0) — coalesced in the segment/chunk/jaccard oracles.
- DuckDB json_extract_string ERRORS on malformed JSON where Spark's
  get_json_object returns NULL → json_valid guards + TRY_CAST/try_cast.
- Null-text lang-ID "predictions" were engine-dependent tie-break
  artifacts → NULL on both engines.
- ewma over null values shifted window frames (collect_list drops nulls)
  → the documented filter-first precondition is now applied in the
  catalog key AND its oracle.
- NULL event times: Spark windows order NULLS FIRST, DuckDB NULLS LAST —
  every ts-ordered key diverged. Contract: time-ordered operators DROP
  null-ts rows (the _events_timed view + WHERE in each oracle), the same
  rule a streaming watermark enforces.
- \\b word boundaries next to non-ASCII letters (Java vs RE2) →
  word_separated; unicode lower() (Greek final sigma, context-sensitive
  case mapping) → ascii_lower.
- ANSI crash-safety (zero-variance corr / z-score division) → try_divide.
- Probed and found PORTABLE (no change needed): string comparison incl.
  supplementary-plane chars (both engines order UTF-8 bytes), pre-epoch
  and microsecond-edge timestamp functions, NaN group keys (both group
  NaNs together). Probed and found UNREACHABLE by construction: DuckDB
  throws on ln(0)/sqrt(<0) where Spark yields NULL/NaN, but every
  catalog log argument is smoothing-bounded > 0 and every sqrt argument
  is a sum of squares.
- Probed but deliberately NOT changed: round(x, 4) diverges when the
  double's SHORTEST decimal lands exactly on a half (round(0.00015, 4):
  Spark 0.0002 via BigDecimal-of-toString, DuckDB 0.0001 on the binary
  value). The rounded catalog values (ewma, bigram cross-entropy) are
  computed logs/weighted sums with full-length expansions — they cannot
  shortest-print onto a half — so the knife edge is unreachable there;
  rounding LITERAL-derived columns at low precision would be the bug.
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import sys


def main() -> None:
    import duckdb

    src = "/root/testdata/sf0.001"
    dst = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_adv"
    os.makedirs(dst, exist_ok=True)
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem",
    ]:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")

    con = duckdb.connect()
    # embeddings: the real vectors plus a ZERO vector (cosine-of-zero
    # convention) and a constant vector (perfect-similarity ties) — both
    # verified divergence-free across engines
    con.sql(f"CREATE TABLE emb AS SELECT * FROM '{src}/embeddings.parquet'")
    dim = con.sql("SELECT len(embedding) FROM emb LIMIT 1").fetchone()[0]
    con.sql(
        f"INSERT INTO emb VALUES (900001, CAST([0.0 for x in range({dim})] AS FLOAT[]), 0)"
    )
    con.sql(
        f"INSERT INTO emb VALUES (900002, CAST([1.0 for x in range({dim})] AS FLOAT[]), 1)"
    )
    con.sql(f"COPY emb TO '{dst}/embeddings.parquet' (FORMAT PARQUET)")
    texts = [
        (0, None, "en", "web", 0),
        (1, "", "en", "web", 0),
        (2, "   ", "en", "web", 3),
        (3, "  ", "en", "web", 2),  # unicode WS only
        (4, "hello world hello world", "en", "web", 23),
        (5, "tab\tsep\nnewline\x0bvtab\x0cff\rcr end", "en", "web", 30),
        (6, "a\x1cb\x1dc\x1ed\x1fe", "en", "web", 9),  # info separators
        (7, "café CAFÉ Über über", "fr", "web", 20),
        (8, "😀 emoji 😀 emoji test", "en", "web", 20),
        (9, "x" * 5000, "en", "web", 5000),  # one giant token
        (10, "tok", "en", "web", 3),
        (11, "the quick brown fox jumps over the lazy dog " * 8, "en", "web", 352),
        (12, "the quick brown fox jumps over the lazy dog " * 8, "en", "books", 352),
        (13, "the quick brown fox jumps over the lazy dog extra " * 8, "en", "web", 400),
        (14, "zero\0byte inside", "en", "web", 16),
        (15, "ünïcödé tökens ünïcödé tökens ünïcödé", "de", "web", 37),
        (16, "Trailing spaces   ", "en", "web", 18),
        (17, "UPPER lower MiXeD UPPER lower", "en", "web", 29),
        (18, "1 2 3 4 5 6 7 8 9 10 11 12", "en", "web", 26),
        (19, "word " * 300, "en", "web", 1500),
        # marker words GLUED to non-ASCII letters: \b counts them
        # differently in Java vs RE2 (word_separated contract)
        (20, "caféthe theéx the und der caféund", "de", "web", 33),
        # word-final Greek sigma: Java lower() gives 'ς', DuckDB 'σ' —
        # the ascii_lower contract leaves both engines byte-identical
        (21, "ΣΙΣΥΦΟΣ σισυφος ΣΙΣΥΦΟΣ the É è", "en", "web", 31),
    ]
    con.sql(
        "CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR,"
        " source VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO d VALUES (?,?,?,?,?)", texts)
    con.sql(f"COPY d TO '{dst}/documents.parquet' (FORMAT PARQUET)")

    rows = []
    base = dt.datetime(2024, 1, 1)
    eid = 0
    for u in (1, 2):
        for sec, v, p in [
            (0, 1.0, '{"k":1}'),
            (0, 2.0, None),
            (1800, None, "{}"),       # null value
            (1800, 3.0, '{"k":2}'),
            (1801, 4.0, "not json"),  # malformed props
            (7200, 5.0, '{"k":[1,2]}'),  # non-scalar k
            (7200, 5.0, '{"k":3}'),
            (None, 6.0, "{}"),   # NULL event time (unprocessable by
            #                      time-ordered ops — the _events_timed
            #                      contract; null-ordering defaults also
            #                      differ between the engines)
            (7300, 7.0, None),
        ]:
            ts = (
                None
                if sec is None
                else base + dt.timedelta(seconds=sec, microseconds=eid * 7)
            )
            etype = None if p is None else ("click" if eid % 2 else "view")
            rows.append((eid, ts, u, etype, v, p))
            eid += 1
    # a CONSTANT-value event type: zero variance makes ANSI-mode
    # F.corr / plain division throw DIVIDE_BY_ZERO where SQL engines
    # yield NULL/NaN (the try_divide contract)
    for j in range(4):
        rows.append((800 + j, base + dt.timedelta(days=1, seconds=j), 3,
                     "const", 5.0, "{}"))
    con.sql(
        "CREATE TABLE e (event_id BIGINT, ts TIMESTAMP, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    con.executemany("INSERT INTO e VALUES (?,?,?,?,?,?)", rows)
    con.sql(f"COPY e TO '{dst}/events.parquet' (FORMAT PARQUET)")
    print(f"adversarial fixture at {dst}")


if __name__ == "__main__":
    main()
