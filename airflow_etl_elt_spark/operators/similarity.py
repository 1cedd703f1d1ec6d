"""Similarity search over embedding columns (array<float>).

North-star operators. Two tiers:

- **Brute-force cosine top-k** — the exactness baseline. Dot products via
  built-in higher-order functions (``zip_with`` + ``aggregate``), fully
  JVM-side; the query vector is a broadcast literal. TakeOrderedAndProject
  keeps per-partition top-k, so nothing but k rows ever reaches the driver.
- **LSH-bucketed ANN** — the 100 TB path: random-hyperplane signatures
  (Charikar 2002) bucket vectors so queries probe one bucket instead of the
  full corpus; recall tuned by bits/tables. Hyperplanes are deterministic
  from a seed, generated driver-side, embedded as literals.

At real scale the corpus side would be written bucketed-by-signature so probes
are partition-pruned reads; here the bucketing is computed on the fly.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    # cast elements to double BEFORE multiplying: float32*float32 then
    # widening loses bits vs the oracle's double math
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine similarity to ``query_vec``.

    One scan, no shuffle until the final top-k merge; ties broken by id for
    determinism. Cosine of a zero vector is defined as 0 here.
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    q_norm = math.sqrt(sum(v * v for v in query_vec)) or 1.0
    denom = _norm(F.col(vec_col)) * F.lit(q_norm)
    cos = F.when(denom == 0, F.lit(0.0)).otherwise(_dot(F.col(vec_col), q) / denom)
    return (
        embeddings.select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def pairwise_topk_within_label(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Top-k most-similar pairs within each label group (blocked all-pairs).

    The label acts as a blocking key: the quadratic pair expansion happens
    only inside groups (classic blocked-similarity-join shape); at scale the
    block key would be an LSH bucket (see ``lsh_bucket``) instead of a label.
    Per group the work is one normalized Gram matrix (BLAS matmul) inside
    applyInPandas — the SQL self-join form evaluates an interpreted 64-dim
    dot product per pair and measured ~50x slower at 5k vectors.
    """
    import numpy as np
    import pandas as pd

    out_schema = "lbl int, id_a bigint, id_b bigint, cosine double"

    def topk_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        ids = pdf[id_col].to_numpy()
        V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        norms = np.linalg.norm(V, axis=1)
        norms[norms == 0] = 1.0
        N = V / norms[:, None]
        S = N @ N.T
        iu, ju = np.triu_indices(len(ids), k=1)
        cos = S[iu, ju]
        order = np.lexsort((ids[ju], ids[iu], -cos))[:k]
        return pd.DataFrame(
            {
                "lbl": pdf[label_col].iloc[0],
                "id_a": ids[iu[order]],
                "id_b": ids[ju[order]],
                "cosine": cos[order],
            }
        )

    return (
        embeddings.select(label_col, id_col, vec_col)
        .groupBy(label_col)
        .applyInPandas(topk_fn, out_schema)
        .orderBy("lbl", F.col("cosine").desc(), "id_a", "id_b")
    )


def _hyperplanes(dim: int, bits: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]


def lsh_bucket(
    embeddings: DataFrame,
    dim: int,
    bits: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Append a random-hyperplane LSH bucket id (0..2^bits-1).

    sign(v · h_j) per hyperplane → bit j. All arithmetic is built-in
    higher-order functions over the array column — no UDF.
    """
    planes = _hyperplanes(dim, bits, seed)
    bucket = F.lit(0).cast("bigint")
    for j, plane in enumerate(planes):
        h = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot(F.col(vec_col), h) > 0, F.shiftleft(F.lit(1).cast("bigint"), j)).otherwise(
            F.lit(0).cast("bigint")
        )
        bucket = bucket.bitwiseOR(bit)
    return embeddings.withColumn("bucket", bucket)


def ann_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    dim: int,
    k: int = 10,
    bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe only the query's LSH bucket, then exact
    cosine within it. Recall < 1 by design; raise by multi-probing buckets at
    Hamming distance 1 (probe set below includes them)."""
    planes = _hyperplanes(dim, bits, seed)
    qb = 0
    for j, plane in enumerate(planes):
        if sum(q * p for q, p in zip(query_vec, plane)) > 0:
            qb |= 1 << j
    probe = [qb] + [qb ^ (1 << j) for j in range(bits)]  # multi-probe: Hamming ≤ 1
    bucketed = lsh_bucket(embeddings, dim, bits, seed, vec_col)
    return cosine_topk(
        bucketed.filter(F.col("bucket").isin(probe)), query_vec, k, id_col, vec_col
    )
