#!/usr/bin/env python
"""Standalone at-scale run of dedup_embedding (cosine_near_dup_pairs) at the
100x replica's FULL embeddings table — the committed artifact VERDICT r10
next-step 6 asked for: the operator that OOM-killed the r10 sweep JVM under
parallelism-only block sizing, re-run post-fix as sole tenant.

Two things are recorded at the 200k-vector scale:

1. timing + memory: wall seconds for the full all-pairs sweep (output
   cardinality included — the pair count IS the work), plus driver RSS
   before/after, showing the bounded-gram contract holds where the r10
   crash happened.
2. blocking invariance: the SAME run repeated with a deliberately different
   block count must produce an identical (count, order-free value-hash)
   result — every pair lands in exactly one block-pair task for any B, so
   B is a pure performance knob (the property the unit pin asserts at toy
   scale, re-proved here at the crash scale).

Usage: python scripts/time_dedup_embedding_100x.py [SF_DIR]  # default /tmp/sf1x100
Writes scripts/time_dedup_embedding_100x.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _rss_mb() -> float:
    with open("/proc/self/status") as fh:
        for line in fh:
            if line.startswith("VmRSS:"):
                return round(int(line.split()[1]) / 1024, 1)
    return -1.0


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1x100"

    from pyspark.sql import functions as F

    from airflow_etl_elt_spark.operators.similarity import (
        _near_dup_blocks,
        cosine_near_dup_pairs,
    )
    from airflow_etl_elt_spark.session import get_session
    from airflow_etl_elt_spark.sources.readers import read_table

    spark = get_session(app_name="time-dedup-embedding")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    emb = read_table(spark, sf, "embeddings")
    n = emb.count()
    nb_default = _near_dup_blocks(n, spark.sparkContext.defaultParallelism)

    def run(n_blocks=None):
        rss0 = _rss_mb()
        t0 = time.perf_counter()
        pairs = cosine_near_dup_pairs(emb, threshold=0.4, n_blocks=n_blocks)
        # order-free digest: count + xxhash64 folded in DECIMAL(38,0) (the
        # sweep's value-hash discipline, no driver fetch of the pair set)
        row = pairs.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64("id_a", "id_b", F.round("cosine", 9)).cast(
                    "decimal(38,0)"
                )
            ).alias("h"),
        ).first()
        return {
            "pairs": int(row["n"]),
            "value_hash": str(row["h"]),
            "wall_sec": round(time.perf_counter() - t0, 1),
            "driver_rss_mb_before": rss0,
            "driver_rss_mb_after": _rss_mb(),
        }

    out = {
        "sf_dir": sf,
        "vectors": n,
        "blocks_default": nb_default,
        "default_blocks_run": run(),
        # a finer blocking (more, smaller blocks — ~4x the block-pair
        # tasks) must yield the identical pair multiset
        "alt_blocks": nb_default * 2 - 1,
        "alt_blocks_run": run(nb_default * 2 - 1),
    }
    out["blocking_invariant"] = (
        out["default_blocks_run"]["pairs"] == out["alt_blocks_run"]["pairs"]
        and out["default_blocks_run"]["value_hash"]
        == out["alt_blocks_run"]["value_hash"]
    )
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "time_dedup_embedding_100x.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(out, indent=1, sort_keys=True))
    assert out["blocking_invariant"], "blocking invariance FAILED"


if __name__ == "__main__":
    main()
