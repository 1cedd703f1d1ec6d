#!/usr/bin/env python
"""Decompose each headline key's FRESH cost into (build+plan, noop exec,
toPandas fetch) at the bench SF — guide §1.4: the noop sink times the
computation without the fetch; build+plan isolates Catalyst.

Usage: python scripts/exp_fresh_decompose.py [sf_dir] [key ...]
Writes scripts/exp_fresh_decompose_<sfname>.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from airflow_etl_elt_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from bench import HEADLINE
    from airflow_etl_elt_spark.queries import QUERIES

    keys = sys.argv[2:] or HEADLINE
    spark = get_session(app_name="fresh-decompose")
    sc = spark.sparkContext
    # mirror bench warmup: one JVM job + python workers + warm each key once
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from airflow_etl_elt_spark.sources import layout as _layout

    if os.environ.get("SPARK_GRAFT_AT_REST_LAYOUT", "1") != "0":
        _layout.prepare_at_rest_layout(spark, sf_dir)
    os.environ["SPARK_GRAFT_PLAN_CACHE"] = "0"
    for key in keys:
        try:
            QUERIES[key](spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"warm {key} failed: {exc}", file=sys.stderr)

    out: dict[str, dict] = {}
    for key in keys:
        rec = {"build_plan": [], "noop": [], "topandas": []}
        for _ in range(3):
            # 1. build + full Catalyst physical planning, no execution
            t0 = time.perf_counter()
            df = QUERIES[key](spark, sf_dir)
            df._jdf.queryExecution().executedPlan()
            rec["build_plan"].append(time.perf_counter() - t0)
            # 2. fresh build, execute into the noop sink (no fetch)
            sc.setJobDescription(f"decompose:{key}:noop")
            t0 = time.perf_counter()
            QUERIES[key](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            rec["noop"].append(time.perf_counter() - t0)
            # 3. fresh build, full toPandas (the bench's timed shape)
            sc.setJobDescription(f"decompose:{key}:topandas")
            t0 = time.perf_counter()
            QUERIES[key](spark, sf_dir).toPandas()
            rec["topandas"].append(time.perf_counter() - t0)
            sc.setJobDescription(None)
        out[key] = {k: round(min(v), 4) for k, v in rec.items()}
        out[key]["exec_only"] = round(
            max(out[key]["noop"] - out[key]["build_plan"], 0.0), 4
        )
        out[key]["fetch_delta"] = round(
            max(out[key]["topandas"] - out[key]["noop"], 0.0), 4
        )
        print(f"{key:24s} {out[key]}")

    name = os.path.basename(sf_dir.rstrip("/"))
    path = os.path.join(
        os.path.dirname(__file__), f"exp_fresh_decompose_{name}.json"
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
