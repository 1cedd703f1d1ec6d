#!/usr/bin/env python
"""Decompose dedup_minhash's at-scale cost (VERDICT r9 next-step 5):
41.4 s at the 100x replica is the largest single absolute in the suite and
its last optimization pass was r6. Stage the pipeline exactly as
minhash_lsh_pairs runs it and time each materialization boundary:

  sig      minhash_signatures -> rotate_persist -> count   (the pandas_udf
           shingling + 64-permutation pass, persisted exactly as the
           operator persists it)
  pairs    banded explode -> band self-join -> id_a<id_b -> dropDuplicates
           -> count  (reads the persisted signatures)
  verify   candidate pairs join sig_a/sig_b -> agreement filter ->
           toPandas  (the remaining end-to-end cost incl. result fetch)
  e2e      a FRESH minhash_lsh_pairs(...).toPandas() for cross-checking
           that the staged sum reproduces the bench number

Usage: python scripts/exp_minhash_decompose.py [SF_DIR] [RUNS]
Writes scripts/exp_minhash_decompose_<tag>.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyspark.sql.functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1x100"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    tag = os.path.basename(sf_dir.rstrip("/"))

    from airflow_etl_elt_spark.operators import dedup
    from airflow_etl_elt_spark.operators._cache import rotate_persist
    from airflow_etl_elt_spark.session import get_session
    from airflow_etl_elt_spark.sources.readers import read_table

    spark = get_session(app_name="exp-minhash-decompose")
    os.environ["SPARK_GRAFT_PLAN_CACHE"] = "0"
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # pandas_udf worker warmup, as bench.py does
    dedup.minhash_lsh_pairs(
        read_table(spark, "/root/testdata/sf0.001", "documents")
    ).toPandas()

    docs = read_table(spark, sf_dir, "documents")
    n_docs = docs.count()

    stage_samples: dict[str, list[float]] = {
        "sig": [],
        "pairs": [],
        "verify_fetch": [],
        "e2e": [],
    }
    counts: dict[str, int] = {}

    for _ in range(runs):
        # --- staged run (mirrors minhash_lsh_pairs internals) ---
        t0 = time.perf_counter()
        sigs = dedup.minhash_signatures(docs)
        sigs = rotate_persist("exp_minhash_sigs", sigs)
        counts["sig_rows"] = sigs.count()
        stage_samples["sig"].append(time.perf_counter() - t0)

        banded = dedup._banded_ids(sigs, 16, 4)
        left = banded.select("band_id", "band_sig", F.col("id").alias("id_a"))
        right = banded.select("band_id", "band_sig", F.col("id").alias("id_b"))
        pairs = (
            left.join(right, ["band_id", "band_sig"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .dropDuplicates(["id_a", "id_b"])
        )
        t0 = time.perf_counter()
        pairs = rotate_persist("exp_minhash_pairs", pairs)  # materializes
        counts["pair_rows"] = pairs.count()
        stage_samples["pairs"].append(time.perf_counter() - t0)

        sig_a = sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
        sig_b = sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
        agree = F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                lambda v: v == 1,
            )
        )
        t0 = time.perf_counter()
        out = (
            pairs.join(sig_a, "id_a")
            .join(sig_b, "id_b")
            .select("id_a", "id_b", (agree / F.lit(64)).alias("est_jaccard"))
            .filter(F.col("est_jaccard") >= 0.4)
            .toPandas()
        )
        counts["result_rows"] = len(out)
        stage_samples["verify_fetch"].append(time.perf_counter() - t0)
        sigs.unpersist()
        pairs.unpersist()

        # --- fresh end-to-end, the bench-comparable number ---
        t0 = time.perf_counter()
        dedup.minhash_lsh_pairs(docs, threshold=0.4).toPandas()
        stage_samples["e2e"].append(time.perf_counter() - t0)

    # --- signature-pass A/B (r10): the production per-doc loop vs a
    # whole-batch vectorized variant (Arrow-kernel tokenization + one flat
    # rolling poly + np.minimum.reduceat over per-doc segments). The variant
    # was prototyped as the production path, verified BIT-IDENTICAL on the
    # full sf0.1 corpus + adversarial strings + a hypothesis sweep, then
    # REJECTED on this measurement: the per-doc (64 x n_shingles) blocks of
    # the loop stay L2-resident while the flat form streams (chunk x
    # millions)-element intermediates to RAM 64/chunk times per batch —
    # vectorization traded Python-loop overhead for a memory-bandwidth-bound
    # pipeline and lost (100x replica: loop 2.12 s vs batch 3.91 s on an
    # identical agg sink). The variant lives HERE, not in the package, so
    # the rejection stays re-measurable. ---
    import random

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from airflow_etl_elt_spark.operators.dedup import (
        _P,
        _SHINGLE_MULT,
        _batch_token_hashes,
        _shingle_hashes_from_tokens,
    )
    from airflow_etl_elt_spark.operators.text import WS_RE, ws_tokens
    from airflow_etl_elt_spark.sources.readers import fan_out

    def _flat_token_hashes(texts: "pd.Series"):
        """Whole-batch token hashes in FLAT form: (th_flat uint64, counts int64
        per doc, none_mask bool per doc).

        Bit-identical values to ``_batch_token_hashes`` — the same ASCII-only
        lowering, the same RE2-compatible ``WS_RE`` split with empties dropped,
        the same MD5-first-8-bytes per unique token — but the per-document
        Python loop is replaced by Arrow kernels (ascii_lower,
        split_pattern_regex, list_flatten, dictionary_encode), so the only
        Python-rate work left per batch is the MD5 of each UNIQUE token (tiny
        by Zipf). Part of the REJECTED whole-batch variant — see the A/B
        comment above for why the production per-doc loop wins.
        """
        import hashlib

        import pyarrow as pa
        import pyarrow.compute as pc

        # explicit string type: an all-null batch otherwise infers null-typed,
        # which ascii_lower has no kernel for
        arr = pa.Array.from_pandas(texts, type=pa.string())
        toks = pc.split_pattern_regex(pc.ascii_lower(arr), pattern=WS_RE)
        flat = pc.list_flatten(toks)  # null docs contribute nothing
        parents = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")  # re.split boundary empties, as `if tok`
        flat = flat.filter(keep)
        parents = parents.filter(keep)
        enc = flat.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        vocab = enc.dictionary.to_pylist()
        vh = np.fromiter(
            (
                int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
                for t in vocab
            ),
            dtype=np.uint64,
            count=len(vocab),
        )
        th_flat = vh[idx] if len(idx) else np.empty(0, dtype=np.uint64)
        counts = np.bincount(
            parents.to_numpy(zero_copy_only=False), minlength=len(texts)
        ).astype(np.int64)
        none_mask = np.asarray(pc.is_null(arr).to_numpy(zero_copy_only=False))
        return th_flat, counts, none_mask


    def _batch_minhash_signatures(
        texts: "pd.Series", k: int, a_np: np.ndarray, b_np: np.ndarray, p: np.uint64
    ) -> list:
        """One whole-batch vectorized MinHash pass: list of int64[num_hashes]
        arrays (None for null/zero-token docs), bit-identical to the per-doc
        ``_shingle_hashes_from_tokens`` + permutation-min loop.

        Shingle hashes ride ONE global rolling polynomial over the flat token
        array; windows spanning a document boundary are masked out (the window
        is valid iff token i and token i+k-1 belong to the same doc). Docs
        shorter than k keep the zero-padded single-shingle contract via a
        per-doc fallback (rare at k=5). The 64-permutation min runs as
        ``np.minimum.reduceat`` over per-doc shingle segments, chunked over
        permutations to bound the (chunk x total_shingles) intermediate.
        """
        num_hashes = len(a_np)
        th_flat, counts, none_mask = _flat_token_hashes(texts)
        n_docs = len(counts)
        out: list = [None] * n_docs

        # doc id per token -> window-validity mask over global rolling windows
        n_tok = len(th_flat)
        full = counts >= k  # docs whose shingles come from the global poly
        if n_tok >= k and full.any():
            acc = np.zeros(n_tok - k + 1, dtype=np.uint64)
            for j in range(k):
                acc = acc * _SHINGLE_MULT + th_flat[j : j + n_tok - k + 1]
            doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
            valid = doc_of[: n_tok - k + 1] == doc_of[k - 1 :]
            h_valid = acc[valid] % p  # grouped by doc, contiguous
            seg_lens = np.where(full, counts - k + 1, 0)
            seg_starts = np.zeros(int(full.sum()), dtype=np.int64)
            np.cumsum(seg_lens[full][:-1], out=seg_starts[1:])
            full_idx = np.flatnonzero(full)
            sig_full = np.empty((len(full_idx), num_hashes), dtype=np.int64)
            chunk = max(1, int(8_000_000 // max(1, len(h_valid))))
            for c in range(0, num_hashes, chunk):
                # (chunk, S) u64: h < p < 2^31 and a < p keep products in u64
                H = (h_valid[None, :] * a_np[c : c + chunk] + b_np[c : c + chunk]) % p
                sig_full[:, c : c + chunk] = np.minimum.reduceat(
                    H, seg_starts, axis=1
                ).T.astype(np.int64)
            for row, d in enumerate(full_idx):
                out[d] = sig_full[row]

        # short docs (0 < count < k): zero-padded single shingle, per doc
        starts_all = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(counts[:-1], out=starts_all[1:])
        for d in np.flatnonzero((counts > 0) & ~full):
            th = th_flat[starts_all[d] : starts_all[d] + counts[d]]
            h = _shingle_hashes_from_tokens(th, k) % p
            out[d] = ((h[None, :] * a_np + b_np) % p).min(axis=1).astype(np.int64)

        # null/zero-token docs stay None (the upstream filter drops them; the
        # contract matches _batch_token_hashes for any other caller)
        for d in np.flatnonzero(none_mask | (counts == 0)):
            out[d] = None
        return out



    rng = random.Random(42)
    a_np = np.array(
        [rng.randrange(1, _P) for _ in range(64)], dtype=np.uint64
    )[:, None]
    b_np = np.array(
        [rng.randrange(0, _P) for _ in range(64)], dtype=np.uint64
    )[:, None]
    p = np.uint64(_P)

    def _batch_sig_fn(texts):
        return pd.Series(_batch_minhash_signatures(texts, 5, a_np, b_np, p))

    # `from __future__ import annotations` stringifies hints, which
    # pandas_udf can't infer — set them explicitly (same move as bench.py)
    _batch_sig_fn.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    batch_sig_udf = pandas_udf(_batch_sig_fn, "array<long>")

    loop_sig: list[float] = []
    batch_sig: list[float] = []
    for _ in range(runs):
        # identical agg sink over the REJECTED whole-batch variant
        nonempty = docs.filter(F.size(ws_tokens(F.col("text"))) > 0)
        frame = fan_out(
            nonempty.select(F.col("doc_id").alias("id"), F.col("text"))
        ).select("id", batch_sig_udf("text").alias("sig"))
        t0 = time.perf_counter()
        frame.select(F.sum(F.size("sig"))).collect()
        batch_sig.append(time.perf_counter() - t0)
        # production per-doc loop, same sink
        t0 = time.perf_counter()
        dedup.minhash_signatures(docs).select(F.sum(F.size("sig"))).collect()
        loop_sig.append(time.perf_counter() - t0)
    stage_samples["sig_production_loop"] = loop_sig
    stage_samples["sig_batch_vectorized_rejected"] = batch_sig

    result = {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "runs": runs,
        "counts": counts,
        "stages_min_sec": {k: round(min(v), 3) for k, v in stage_samples.items()},
        "stages_all_sec": {
            k: [round(x, 3) for x in v] for k, v in stage_samples.items()
        },
    }
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"exp_minhash_decompose_{tag}.json",
    )
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result["stages_min_sec"]), "counts:", counts)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
