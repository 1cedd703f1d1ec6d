#!/usr/bin/env python
"""dedup_exact's named-structural cost, probed (VERDICT r8 next-step 4).

SCALING r8 addendum 1 attributed the 100x gap (0.69 s vs 0.05 s core) to
"partial aggregation reducing nothing over ~unique digests": the map-side
combine builds a ~500k-entry hash map per partition and forwards one partial
state per digest — pure overhead when nearly every digest is unique. Two
cheap experiments before accepting that attribution:

- ``dd_baseline``     the catalog operator verbatim (groupBy md5 -> min+count)
- ``dd_dropdup``      dropDuplicates on the digest (first-wins, no copy
                      count): semantically WEAKER (no n_copies, arbitrary
                      survivor) — included purely to price the count
                      machinery, not as a replacement
- ``dd_repart_agg``   explicit repartition on the digest, THEN the same agg:
                      the groupBy reuses the clustering so the exchange
                      carries raw (digest, id) rows with NO map-side combine
                      pass over them; prices "two-phase off" in the only form
                      OSS Spark 4.1 offers (no skip-partial-aggregate conf
                      exists — probed: spark.sql.aggregate.* skip flags all
                      unset in this build)
- ``dd_distinct_h``   count(distinct digest) fold — the floor any
                      formulation must pay (hash every body + dedupe digests)

min-of-N interleaved rounds, Arrow fetch, fresh-build mode — bench.py's
conventions. Output: scripts/exp_dedup_exact_ab_<sf>.json.

Usage: python scripts/exp_dedup_exact_ab.py [sf_dir] [runs]  # /tmp/sf1x100, 5
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ.setdefault("SPARK_GRAFT_PLAN_CACHE", "0")


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1x100"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from pyspark.sql import functions as F

    from airflow_etl_elt_spark.queries import QUERIES
    from airflow_etl_elt_spark.session import get_session
    from airflow_etl_elt_spark.sources import layout
    from airflow_etl_elt_spark.sources.readers import read_table

    spark = get_session(app_name="exp-dedup-exact-ab")
    layout.prepare_at_rest_layout(spark, sf)

    def s_run(df_fn):
        t0 = time.perf_counter()
        df_fn().toPandas()
        return time.perf_counter() - t0

    def docs():
        return read_table(spark, sf, "documents").select("doc_id", "text")

    CASES = {
        "dd_baseline": lambda: QUERIES["dedup_exact"](spark, sf),
        "dd_dropdup": lambda: (
            docs()
            .select(F.md5("text").alias("__h"), "doc_id")
            .dropDuplicates(["__h"])
            .select(F.col("doc_id").alias("canonical_id"))
        ),
        "dd_repart_agg": lambda: (
            docs()
            .select(F.md5("text").alias("__h"), "doc_id")
            .repartition(F.col("__h"))
            .groupBy("__h")
            .agg(
                F.min("doc_id").alias("canonical_id"),
                F.count(F.lit(1)).alias("n_copies"),
            )
            .select("canonical_id", "n_copies")
        ),
        "dd_distinct_h": lambda: docs().agg(
            F.countDistinct(F.md5("text")).alias("n")
        ),
    }

    for fn in CASES.values():
        s_run(fn)  # warm

    t: dict[str, list] = {k: [] for k in CASES}
    for r in range(runs):
        for name, fn in CASES.items():
            t[name].append(s_run(fn))
        print(f"round {r + 1}/{runs} done", file=sys.stderr)

    out = {
        "sf_dir": sf,
        "runs": runs,
        "spark_min": {k: round(min(v), 3) for k, v in t.items()},
        "spark_all": {k: [round(x, 3) for x in v] for k, v in t.items()},
        "note": (
            "dd_dropdup drops n_copies + picks an arbitrary survivor; "
            "dd_repart_agg is semantically identical to baseline"
        ),
    }
    tag = os.path.basename(sf.rstrip("/"))
    path = os.path.join(os.path.dirname(__file__), f"exp_dedup_exact_ab_{tag}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(out["spark_min"], indent=1))
    print(f"written: {path}")
    spark.stop()


if __name__ == "__main__":
    main()
