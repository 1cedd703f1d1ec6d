"""Unit tests: as-of join semantics, bucketed range join edges, block-tiled
exact cosine near-dup, and IVF cell assignment — pinned on tiny in-memory
frames where the expected answer is hand-checkable."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from airflow_etl_elt_spark.operators import asof, similarity


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, 0)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(10)), (2, 1, _ts(20)), (3, 2, _ts(15)), (4, 3, _ts(5))],
        "event_id int, user_id int, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 100.0), (1, _ts(18), 200.0), (2, _ts(15), 300.0)],
        "user_id int, ts timestamp, value double",
    )
    return left, right


def test_asof_join_inclusive(spark):
    left, right = _frames(spark)
    out = asof.asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        right_values=["value"], strict=False,
    )
    got = {r["event_id"]: r["asof_value"] for r in out.collect()}
    # event 1 @10: right @10 matches inclusively; event 2 @20: latest is @18;
    # event 3 @15 user 2: equal-ts match; event 4 user 3: no right rows
    assert got == {1: 100.0, 2: 200.0, 3: 300.0, 4: None}


def test_asof_join_strict(spark):
    left, right = _frames(spark)
    out = asof.asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        right_values=["value"], strict=True,
    )
    got = {r["event_id"]: r["asof_value"] for r in out.collect()}
    # strict <: the equal-ts right rows are no longer visible
    assert got == {1: None, 2: 200.0, 3: None, 4: None}


def test_range_join_boundaries(spark):
    points = spark.createDataFrame(
        [(1, 1, _ts(10)), (2, 1, _ts(30)), (3, 1, _ts(40)), (4, 2, _ts(10))],
        "pid int, user_id int, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(100, 1, _ts(10), _ts(40))],
        "iid int, user_id int, start_ts timestamp, end_ts timestamp",
    )
    out = asof.range_join_buckets(
        points, intervals, point_ts="ts", start_ts="start_ts", end_ts="end_ts",
        on="user_id", bucket_seconds=600,  # 10-min grid: interval spans buckets
    )
    got = sorted(r["pid"] for r in out.collect())
    # start inclusive (pid 1), interior (pid 2), end exclusive (pid 3),
    # wrong key (pid 4)
    assert got == [1, 2]


def test_cosine_near_dup_exact(spark):
    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.01]),   # near-dup of 1
        (3, [0.0, 1.0]),    # orthogonal
        (4, [-1.0, 0.0]),   # opposite
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in similarity.cosine_near_dup_pairs(emb, threshold=0.9).collect()
    }
    assert set(out) == {(1, 2)}
    expected = 1.0 / math.sqrt(1 + 0.01**2)
    assert abs(out[(1, 2)] - expected) < 1e-9


def test_cosine_near_dup_matches_bruteforce(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pairs = similarity.cosine_near_dup_pairs(emb, threshold=0.3).collect()
    keys = {(r["id_a"], r["id_b"]) for r in pairs}
    assert len(keys) == len(pairs), "pair set must be duplicate-free"
    # brute-force reference in numpy over the same (small) fixture
    import numpy as np

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r[0] for r in rows])
    V = np.array([[float(x) for x in r[1]] for r in rows])
    N = V / np.linalg.norm(V, axis=1)[:, None]
    S = N @ N.T
    iu, ju = np.triu_indices(len(ids), k=1)
    want = {
        (int(min(a, b)), int(max(a, b)))
        for a, b, c in zip(ids[iu], ids[ju], S[iu, ju])
        if c >= 0.3
    }
    assert keys == want


def test_ivf_assignment_and_recall(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = similarity.ivf_centroids(emb, n_centroids=4, sample_size=256, seed=7)
    cells = similarity.ivf_assign(emb, cents)
    dist = cells.groupBy("ivf_cell").count().collect()
    assert {r["ivf_cell"] for r in dist} <= set(range(4))
    assert sum(r["count"] for r in dist) == emb.count()
    # probing every cell degrades to exact: top-1 must be the query itself
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    top = similarity.ivf_topk(emb, q, k=1, n_centroids=4, n_probe=4).first()
    assert top["vec_id"] == 0


def test_ivf_partitioned_at_rest_prunes_probes(spark, tmp_path):
    """Substantiate the docstring claim: a corpus written partitioned by
    ivf_cell turns a probe into a partition-pruned scan — the at-scale
    layout where n_probe/n_centroids of the files are even touched."""
    from airflow_etl_elt_spark.operators.similarity import ivf_assign, ivf_centroids
    from airflow_etl_elt_spark.sources.readers import read_table
    from tests.conftest import SF_SMOKE

    emb = read_table(spark, SF_SMOKE, "embeddings")
    cents = ivf_centroids(emb, n_centroids=4)
    path = str(tmp_path / "ivf_corpus")
    ivf_assign(emb, cents).write.partitionBy("ivf_cell").parquet(path)

    probe = spark.read.parquet(path).filter("ivf_cell IN (0, 1)")
    plan = probe._jdf.queryExecution().executedPlan().toString()
    # partition filter on the partition column, nothing pushed to data files
    assert "PartitionFilters: [" in plan and "ivf_cell" in plan.split("PartitionFilters")[1][:80]
    # and the scan actually reads only the probed cells
    cells = {r["ivf_cell"] for r in probe.select("ivf_cell").distinct().collect()}
    assert cells <= {0, 1}


def test_asof_join_right_values_named_ts(spark):
    """ADVICE r5: a right_values column literally named "ts" used to
    collide with the internal matched-timestamp alias (two __r_ts
    columns). The caller wanting the matched timestamp back is the natural
    use — it must come through as asof_ts."""
    left, right = _frames(spark)
    out = asof.asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        right_values=["ts", "value"], strict=False,
    )
    got = {r["event_id"]: (r["asof_ts"], r["asof_value"]) for r in out.collect()}
    assert got == {
        1: (_ts(10), 100.0),
        2: (_ts(18), 200.0),
        3: (_ts(15), 300.0),
        4: (None, None),
    }


def test_near_dup_block_count_scales_with_corpus():
    """r10 scale fix (found by the first full-catalog 100x sweep, which the
    unbounded version OOM-killed): block count must grow with corpus size so
    no task's gram matrix exceeds _MAX_BLOCK_ROWS^2 doubles, regardless of
    parallelism."""
    from airflow_etl_elt_spark.operators.similarity import (
        _MAX_BLOCK_ROWS,
        _near_dup_blocks,
    )

    # parallelism floor still applies on small corpora
    assert _near_dup_blocks(2_000, 32) == max(4, int(math.isqrt(64)))
    # the 100x-replica shape that OOM'd: 200k vectors, 32 cores — blocks
    # must cap at <= _MAX_BLOCK_ROWS rows each
    for n in (200_000, 1_000_000, 50_000_000):
        nb = _near_dup_blocks(n, 32)
        assert -(-n // nb) <= _MAX_BLOCK_ROWS, (n, nb)
    # monotone in n
    assert _near_dup_blocks(1_000_000, 32) >= _near_dup_blocks(200_000, 32)


def test_label_pairs_topk_tiling_invariant(spark, monkeypatch):
    """r11 scale fix (the r10 dedup_embedding lesson applied to the OTHER
    group-sized-gram operator): pairwise_topk_within_label tiles each label
    group into bounded blocks, and the result must be IDENTICAL for any
    tile size — every pair lands in exactly one tile, per-tile top-k under
    the total order (cosine DESC, id_a, id_b) keeps every global winner,
    and the value-threshold selection keeps all k-th-cosine ties so the id
    tie-break stays exact across tilings."""
    from airflow_etl_elt_spark.operators import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

    def rows(df):
        return [
            (r["lbl"], r["id_a"], r["id_b"], round(r["cosine"], 9))
            for r in df.collect()
        ]

    whole = rows(similarity.pairwise_topk_within_label(emb, k=3))
    monkeypatch.setattr(similarity, "_MAX_BLOCK_ROWS", 5)  # many tiny tiles
    tiled = rows(similarity.pairwise_topk_within_label(emb, k=3))
    assert tiled == whole and len(whole) > 0


def test_label_pairs_topk_ulp_tie_break_tiling_invariant(spark, monkeypatch):
    """ADVICE r11: BLAS gemm summation order varies with tile shape, so
    duplicated vectors' cosines can land at 1.0 in one tiling and
    1.0000000000000002 in another — enough to reorder exact ties and make
    the selected PAIR IDENTITIES tiling-dependent. The quantized (9-decimal)
    ordering key makes the chosen (id_a, id_b) set invariant, not just the
    rounded values: five exact-duplicate vectors give C(5,2)=10 pairs all
    tied at cosine 1.0, k=3 selects strictly by the id tie-break, and any
    tiling must pick the identical three pairs."""
    from airflow_etl_elt_spark.operators import similarity

    base = [float(i % 7) + 0.25 for i in range(16)]
    rows_in = [(i, 0, base) for i in range(5)] + [
        (10 + i, 0, [float((i * j) % 5) - 1.0 for j in range(16)])
        for i in range(4)
    ]
    emb = spark.createDataFrame(
        rows_in, "vec_id bigint, label int, embedding array<double>"
    )

    def ids(df):
        return [(r["lbl"], r["id_a"], r["id_b"]) for r in df.collect()]

    whole = ids(similarity.pairwise_topk_within_label(emb, k=3))
    # the duplicate block's ties must resolve purely by (id_a, id_b)
    assert whole[:3] == [(0, 0, 1), (0, 0, 2), (0, 0, 3)]
    for tile in (2, 3, 5):
        monkeypatch.setattr(similarity, "_MAX_BLOCK_ROWS", tile)
        assert ids(similarity.pairwise_topk_within_label(emb, k=3)) == whole


def test_label_pairs_topk_nan_pairs_always_excluded(spark):
    """ADVICE r11 contract pin: NaN-cosine pairs never rank and never pad a
    small group — a 3-vector group (3 pairs <= k) where one vector carries
    a NaN coordinate returns ONLY the one finite pair, not NaN padding."""
    from airflow_etl_elt_spark.operators import similarity

    nan = float("nan")
    emb = spark.createDataFrame(
        [
            (1, 7, [1.0, 0.0, 2.0]),
            (2, 7, [1.0, 0.5, 2.0]),
            (3, 7, [nan, 1.0, 0.0]),
        ],
        "vec_id bigint, label int, embedding array<double>",
    )
    got = similarity.pairwise_topk_within_label(emb, k=5).collect()
    assert [(r["id_a"], r["id_b"]) for r in got] == [(1, 2)]
    assert all(r["cosine"] == r["cosine"] for r in got)  # no NaN rows
