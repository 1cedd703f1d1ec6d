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
