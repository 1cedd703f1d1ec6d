"""Quantitative quality gates for the APPROXIMATE operators (VERDICT r1 #4).

These keys are `no_oracle` forever — DuckDB has no twin for Spark-side hash
families — so recall against their EXACT in-repo twins is the only hard
signal that "approximate" means "measured", not "unchecked":

- ann_topk (multi-table random-hyperplane LSH)  vs cosine_topk (exact)
- ivf_topk (k-means cells, n_probe sweep)       vs cosine_topk (exact)
- minhash_lsh_pairs candidates                  vs exact shingle-Jaccard
- simhash_near_pairs (banded, pigeonhole)       vs exact Hamming all-pairs
  (this one is a STRICT equality: 4x16-bit banding provably finds every
  pair with Hamming <= 3, so any difference is a bug, not a recall miss)

Measured at sf0.01 (500 vectors / 500 docs), floors set one notch below
measurement (see COVERAGE.md for the numbers). Everything runs at
SF_CORRECT to mirror the driver's correctness scale.
"""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from airflow_etl_elt_spark.operators import dedup, similarity
from airflow_etl_elt_spark.queries import _query_vec
from airflow_etl_elt_spark.sources.readers import read_table
from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def exact_top10(spark):
    emb = read_table(spark, SF_CORRECT, "embeddings")
    q = _query_vec(spark, SF_CORRECT)
    return {
        r["vec_id"]
        for r in similarity.cosine_topk(emb, q, k=10).collect()
    }


def _lsh_recall(spark, exact, **kw):
    emb = read_table(spark, SF_CORRECT, "embeddings")
    q = _query_vec(spark, SF_CORRECT)
    got = {
        r["vec_id"]
        for r in similarity.ann_topk(emb, q, dim=64, k=10, **kw).collect()
    }
    return len(exact & got) / len(exact)


def test_ann_lsh_recall_catalog_config(spark, exact_top10):
    # the q_ann_lsh configuration (auto bits from corpus size, 8 tables,
    # hamming<=1): measured 1.0 at sf0.01 (auto_bits -> 4) and 1.0 at sf0.1
    # (auto_bits -> 5, n=2000) — the sf0.1 end is covered by
    # test_ann_lsh_recall_holds_at_larger_sf below
    assert _lsh_recall(spark, exact_top10) >= 0.8


def test_ann_lsh_recall_holds_at_larger_sf(spark):
    """VERDICT r3 #6: auto-sized bits must hold recall across corpus sizes
    with no manual retuning — checked at the largest fixture (sf0.1,
    n=2000), where the r3 pinned bits=6/tables=4 config measured only 0.5."""
    sf = "/root/testdata/sf0.1"
    emb = read_table(spark, sf, "embeddings")
    q = _query_vec(spark, sf)
    exact = {r["vec_id"] for r in similarity.cosine_topk(emb, q, k=10).collect()}
    got = {
        r["vec_id"] for r in similarity.ann_topk(emb, q, dim=64, k=10).collect()
    }
    assert len(exact & got) / len(exact) >= 0.8


def test_ann_lsh_portable_planes_recall(spark, exact_top10):
    """The r7 q_ann_lsh configuration (portable integer-arithmetic planes +
    count-derived bits — the one the DuckDB oracle replicates) must pass
    the same recall gate as the Gaussian planes, at both fixture sizes."""
    emb = read_table(spark, SF_CORRECT, "embeddings")
    bits = similarity.auto_bits_from_count(emb.count(), k=10, max_hamming=1)
    assert (
        _lsh_recall(
            spark, exact_top10, bits=bits,
            plane_fn=similarity.portable_hyperplanes,
        )
        >= 0.8
    )
    sf = "/root/testdata/sf0.1"
    emb = read_table(spark, sf, "embeddings")
    q = _query_vec(spark, sf)
    exact = {r["vec_id"] for r in similarity.cosine_topk(emb, q, k=10).collect()}
    bits = similarity.auto_bits_from_count(emb.count(), k=10, max_hamming=1)
    got = {
        r["vec_id"]
        for r in similarity.ann_topk(
            emb, q, dim=64, k=10, bits=bits,
            plane_fn=similarity.portable_hyperplanes,
        ).collect()
    }
    assert len(exact & got) / len(exact) >= 0.8


def test_portable_planes_are_engine_portable():
    """Every intermediate of the portable plane derivation must stay exact
    in a double (the SQL twin computes the same integers), and the values
    must span [-1, 1] without degenerate repetition."""
    planes = similarity.portable_hyperplanes(64, 24, 49)  # largest seed used
    flat = [x for row in planes for x in row]
    assert all(-1.0 <= x <= 1.0 for x in flat)
    assert len(set(flat)) > len(flat) * 0.99  # no lattice collapse
    j, i, seed = 23, 63, 49
    v = j * 73856093 + i * 19349663 + seed * 83492791
    assert v < 2**53


def test_auto_bits_grows_with_corpus():
    """Unit check on the sizing rule itself (no Spark): candidate budget
    constant => bits grow ~log2(n)."""
    from airflow_etl_elt_spark.operators.similarity import _probe_count

    def pick(n, budget=400, mh=1):
        for b in range(4, 25):
            if n * _probe_count(b, mh) / float(1 << b) <= budget:
                return b
        return 24

    assert pick(500) == 4
    assert pick(2_000) == 5
    assert pick(1_000_000) <= pick(100_000_000) <= pick(10_000_000_000)
    assert pick(10_000_000_000) >= 20


def test_ann_lsh_recall_wide_probe(spark, exact_top10):
    # coarser buckets probe more of the corpus: measured 1.0
    assert _lsh_recall(spark, exact_top10, tables=4, bits=4) >= 0.9


def test_ann_lsh_single_table_is_worse(spark, exact_top10):
    # sanity on the mechanism: one fine-grained table must not silently
    # return the whole corpus (recall ~1 here would mean no bucketing)
    assert _lsh_recall(spark, exact_top10, tables=1, bits=8) <= 0.7


def test_ann_ivf_recall(spark, exact_top10):
    emb = read_table(spark, SF_CORRECT, "embeddings")
    q = _query_vec(spark, SF_CORRECT)
    got = {
        r["vec_id"]
        for r in similarity.ivf_topk(
            emb, q, k=10, n_centroids=16, n_probe=8
        ).collect()
    }
    # half the cells probed: measured 0.9
    assert len(exact_top10 & got) / 10 >= 0.7


def test_ann_ivf_portable_recall_catalog_config(spark, exact_top10):
    """The q_ann_ivf configuration since r8 (exact-oracle conversion):
    zero-iteration id-modulus stratified centroids, n_probe=4 of 16.
    Measured 1.0 at sf0.01 AND sf0.1; floor one notch below."""
    emb = read_table(spark, SF_CORRECT, "embeddings")
    q = _query_vec(spark, SF_CORRECT)
    got = {
        r["vec_id"]
        for r in similarity.ivf_topk(
            emb, q, k=10, n_centroids=16, n_probe=4, coarse="portable"
        ).collect()
    }
    assert len(exact_top10 & got) / 10 >= 0.8


def test_ann_ivf_portable_actually_buckets(spark):
    """Mechanism sanity: the portable centroids must PARTITION the corpus
    (balanced-ish cells), not degenerate to one cell — recall 1.0 with a
    single occupied cell would mean the ANN is a full scan. Measured at
    sf0.01: 16 occupied cells, max cell < 20% of the corpus, and the
    4-probe candidate set covers < 60% of the corpus."""
    emb = read_table(spark, SF_CORRECT, "embeddings")
    n = emb.count()
    cents = similarity.portable_ivf_centroids(emb, 16)
    assert len(cents) == 16
    cells = similarity.ivf_assign(emb, cents)
    hist = {
        r["ivf_cell"]: r["c"]
        for r in cells.groupBy("ivf_cell").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert len(hist) >= 12
    assert max(hist.values()) < 0.2 * n
    q = _query_vec(spark, SF_CORRECT)
    import numpy as np

    C = np.array(cents)
    d = ((C - np.array(q)[None, :]) ** 2).sum(axis=1)
    probe = sorted(range(len(C)), key=lambda i: (d[i], i))[:4]
    frac = sum(hist.get(p, 0) for p in probe) / n
    assert frac < 0.6


def test_ann_ivf_full_probe_is_exact(spark, exact_top10):
    emb = read_table(spark, SF_CORRECT, "embeddings")
    q = _query_vec(spark, SF_CORRECT)
    got = {
        r["vec_id"]
        for r in similarity.ivf_topk(
            emb, q, k=10, n_centroids=16, n_probe=16
        ).collect()
    }
    # probing every cell degrades to brute force — exactness invariant
    assert got == exact_top10


def _shingles(text: str, k: int = 5) -> set:
    toks = text.split()
    return {tuple(toks[i : i + k]) for i in range(max(len(toks) - k + 1, 1))}


@pytest.fixture(scope="module")
def doc_rows(spark):
    return read_table(spark, SF_CORRECT, "documents").select("doc_id", "text").collect()


def test_minhash_candidate_recall(spark, doc_rows):
    sh = {r["doc_id"]: _shingles(r["text"]) for r in doc_rows}
    true_pairs = set()
    for a, b in itertools.combinations(sorted(sh), 2):
        inter = len(sh[a] & sh[b])
        if inter and inter / len(sh[a] | sh[b]) >= 0.5:
            true_pairs.add((a, b))
    assert true_pairs, "fixture regression: no true near-dup pairs at sf0.01"
    docs = read_table(spark, SF_CORRECT, "documents")
    cands = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(docs, threshold=0.0).collect()
    }
    recall = len(true_pairs & cands) / len(true_pairs)
    # measured 1.0 (25/25 true pairs at jaccard>=0.5)
    assert recall >= 0.9, f"minhash candidate recall {recall:.2f}"


def test_minhash_incremental_matches_one_shot_cross_pairs(spark, tmp_path):
    """The incremental index-join discipline must find EXACTLY the one-shot
    operator's pairs that cross the corpus/increment split — same sketch,
    same banding, same verify, different pairing. Also proves the persisted
    index round-trips: signatures written to parquet and read back behave
    identically to in-memory ones."""
    docs = read_table(spark, SF_CORRECT, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    new = docs.filter(F.col("doc_id") % 10 == 0)
    idx = str(tmp_path / "sig_idx")
    dedup.minhash_index_write(corpus, idx)
    got = {
        (r["id_new"], r["id_corpus"]): round(r["est_jaccard"], 9)
        for r in dedup.minhash_incremental_pairs(
            spark, idx, new, threshold=0.0
        ).collect()
    }
    want = {}
    for r in dedup.minhash_lsh_pairs(docs, threshold=0.0).collect():
        a, b = r["id_a"], r["id_b"]
        if (a % 10 == 0) != (b % 10 == 0):  # exactly one side is increment
            nid, cid = (a, b) if a % 10 == 0 else (b, a)
            want[(nid, cid)] = round(r["est_jaccard"], 9)
    assert want, "fixture regression: no cross-split near-dup pairs at sf0.01"
    assert got == want


def test_minhash_index_append_grows_the_corpus(spark, tmp_path):
    """The continuous-ingest loop: dedup an increment, APPEND its signatures
    (mode='append'), and the next increment's pairs against the grown index
    must equal a fresh index built over corpus ∪ increment-1 — signatures
    are order-independent rows, so append == rebuild."""
    docs = read_table(spark, SF_CORRECT, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 > 1)
    inc1 = docs.filter(F.col("doc_id") % 10 == 0)
    inc2 = docs.filter(F.col("doc_id") % 10 == 1)
    grown = str(tmp_path / "grown")
    dedup.minhash_index_write(corpus, grown)
    dedup.minhash_index_write(inc1, grown, mode="append")
    rebuilt = str(tmp_path / "rebuilt")
    dedup.minhash_index_write(docs.filter(F.col("doc_id") % 10 != 1), rebuilt)
    via_grown = sorted(
        map(tuple, dedup.minhash_incremental_pairs(spark, grown, inc2, threshold=0.0).collect())
    )
    via_rebuilt = sorted(
        map(tuple, dedup.minhash_incremental_pairs(spark, rebuilt, inc2, threshold=0.0).collect())
    )
    assert via_grown == via_rebuilt and via_grown


def test_simhash_banding_is_exact(spark, doc_rows):
    docs = read_table(spark, SF_CORRECT, "documents")
    sk = {r["id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    mask = (1 << 64) - 1
    exact = {
        (a, b)
        for a, b in itertools.combinations(sorted(sk), 2)
        if bin((sk[a] ^ sk[b]) & mask).count("1") <= 3
    }
    banded = {
        (r["id_a"], r["id_b"])
        for r in dedup.simhash_near_pairs(docs, max_hamming=3).collect()
    }
    # pigeonhole guarantee: banding must find EXACTLY the brute-force set
    assert banded == exact


def test_ann_pq_recall(spark, exact_top10):
    """ADC-selected + exact-rescored PQ top-10 vs brute force: measured 1.0
    at sf0.01 (rerank=50 covers quantization error at this corpus size)."""
    emb = read_table(spark, SF_CORRECT, "embeddings")
    q = _query_vec(spark, SF_CORRECT)
    got = {r["vec_id"] for r in similarity.pq_topk(emb, q, k=10, rerank=50).collect()}
    assert len(exact_top10 & got) / 10 >= 0.8


def test_ann_pq_portable_recall_catalog_config(spark, exact_top10):
    """The q_ann_pq configuration since r9 (exact-oracle conversion):
    stride-row codebooks, zero Lloyd iterations, JVM left-fold encoder.
    Measured 1.0 at sf0.01 (rerank=50 absorbs the coarser codebooks);
    floor one notch below like the ivf twin."""
    emb = read_table(spark, SF_CORRECT, "embeddings")
    q = _query_vec(spark, SF_CORRECT)
    got = {
        r["vec_id"]
        for r in similarity.pq_topk(
            emb, q, k=10, m=8, ksub=16, rerank=50, codebooks="portable"
        ).collect()
    }
    assert len(exact_top10 & got) / 10 >= 0.8


def test_ann_pq_portable_codes_not_degenerate(spark):
    """Mechanism sanity for the portable codebooks: codes must actually
    discriminate (a degenerate all-rows-same-code corpus would make the
    ADC ranking a no-op and the 'ANN' a fancy LIMIT 50). Require a healthy
    number of distinct full codes and >1 distinct index per subspace."""
    emb = read_table(spark, SF_CORRECT, "embeddings")
    n = emb.count()
    books = similarity.portable_pq_codebooks(emb, m=8, ksub=16)
    assert len(books) == 8 and all(len(b) == 16 for b in books)
    rows = similarity.pq_encode_jvm(emb, books).select("pq_code").collect()
    codes = [tuple(r["pq_code"]) for r in rows]
    assert len(set(codes)) > 0.5 * n
    for s in range(8):
        assert len({c[s] for c in codes}) >= 4


def test_pq_portable_encoders_agree_on_left_fold(spark):
    """pq_encode_jvm (the oracle-exact JVM fold path) and a plain NumPy
    re-derivation over the SAME raw-double codebooks must assign identical
    codes except at genuine float boundaries — on this fixture: identical.
    Guards the encoder against slice/off-by-one regressions."""
    import numpy as np

    emb = read_table(spark, SF_CORRECT, "embeddings")
    books = similarity.portable_pq_codebooks(emb, m=8, ksub=16)
    rows = (
        similarity.pq_encode_jvm(emb, books)
        .select("vec_id", "embedding", "pq_code")
        .limit(200)
        .collect()
    )
    B = [np.array(b, dtype=np.float64) for b in books]
    for r in rows:
        x = np.array([float(v) for v in r["embedding"]], dtype=np.float64)
        for s in range(8):
            xs = x[s * 8 : (s + 1) * 8]
            d = ((B[s] - xs[None, :]) ** 2).sum(axis=1)
            assert int(d.argmin()) == r["pq_code"][s], (r["vec_id"], s)


def test_pq_code_roundtrip_distortion_bounded(spark):
    """Encoding sanity: reconstructing each vector from its codebook entries
    must land closer to the original than to the corpus mean (i.e. the
    codebooks learned structure, not noise)."""
    import numpy as np

    emb = read_table(spark, SF_CORRECT, "embeddings")
    books = similarity.pq_train(emb, m=8, ksub=16)
    rows = similarity.pq_encode(emb, books).select("embedding", "pq_code").limit(200).collect()
    X = np.array([[float(v) for v in r["embedding"]] for r in rows])
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    B = [np.array(b) for b in books]
    recon = np.hstack([B[s][[r["pq_code"][s] for r in rows]] for s in range(8)])
    err = np.linalg.norm(X - recon, axis=1).mean()
    base = np.linalg.norm(X - X.mean(axis=0), axis=1).mean()
    assert err < base


def test_ivfpq_recall(spark, exact_top10):
    """The composed IVF-PQ index (prune cells, ADC-score codes, exact
    rescore) against brute force: measured 0.9+ at sf0.01 with half the
    cells probed."""
    emb = read_table(spark, SF_CORRECT, "embeddings")
    q = _query_vec(spark, SF_CORRECT)
    got = {
        r["vec_id"]
        for r in similarity.ivfpq_topk(
            emb, q, k=10, n_centroids=16, n_probe=8, rerank=50
        ).collect()
    }
    assert len(exact_top10 & got) / 10 >= 0.7


def test_ivfpq_persisted_index_lifecycle(spark, exact_top10, tmp_path):
    """Build → at-rest layout → partition-pruned search (VERDICT r2/r3: the
    billion-scale at-rest story, now exercised for real instead of only
    described): codes land partitioned by ivf_cell, the probe plan prunes
    partitions, and full-probe search degrades to the exact answer."""
    import os

    from airflow_etl_elt_spark.operators.similarity import (
        build_ivfpq_index,
        ivfpq_index_search,
    )

    emb = read_table(spark, SF_CORRECT, "embeddings")
    q = _query_vec(spark, SF_CORRECT)
    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(emb, path, n_centroids=16)

    # at-rest shape: per-cell directories + broadcast-sized metadata
    cells = [d for d in os.listdir(f"{path}/codes") if d.startswith("ivf_cell=")]
    assert len(cells) >= 8
    assert os.path.getsize(f"{path}/meta.json") < 1 << 20

    # partial probe: bounded read, recall floor
    got = {
        r["vec_id"]
        for r in ivfpq_index_search(spark, path, q, emb, k=10, n_probe=8).collect()
    }
    assert len(exact_top10 & got) / 10 >= 0.7

    # full probe degrades to exact — the correctness invariant
    got_full = {
        r["vec_id"]
        for r in ivfpq_index_search(
            spark, path, q, emb, k=10, n_probe=16, rerank=500
        ).collect()
    }
    assert got_full == exact_top10

    # the probe plan must be partition-pruned (cells reached the scan)
    from airflow_etl_elt_spark.operators import similarity as S
    from pyspark.sql import functions as F

    codes = spark.read.parquet(f"{path}/codes").filter(F.col("ivf_cell").isin([0, 1]))
    plan = codes._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_cell" in plan.split("PartitionFilters")[1].split("]")[0]
