#!/usr/bin/env python
"""Count Spark JOBS per fresh headline-key run (guide §1 / VERDICT r12
next-step 4): at sf0.1 the suite cost is dominated by the ~0.06-0.10 s
scheduling floor PER JOB, so job count is the unit that matters. Each key
runs under its own job group; the group's job ids are counted via
statusTracker.

Usage: python scripts/exp_job_count.py [sf_dir] [key ...]
Writes scripts/exp_job_count_<sfname>[_tag].json  (SPARK_GRAFT_EXP_TAG)
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
    spark = get_session(app_name="job-count")
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from airflow_etl_elt_spark.sources import layout as _layout

    if os.environ.get("SPARK_GRAFT_AT_REST_LAYOUT", "1") != "0":
        _layout.prepare_at_rest_layout(spark, sf_dir)
    os.environ["SPARK_GRAFT_PLAN_CACHE"] = "0"
    for key in keys:  # warm metadata memos, codegen, workers
        try:
            QUERIES[key](spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"warm {key} failed: {exc}", file=sys.stderr)

    tracker = sc.statusTracker()
    out: dict[str, dict] = {}
    for key in keys:
        group = f"jobcount:{key}"
        sc.setJobGroup(group, key)
        t0 = time.perf_counter()
        QUERIES[key](spark, sf_dir).toPandas()
        wall = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        jobs = tracker.getJobIdsForGroup(group)
        out[key] = {"jobs": len(jobs), "wall_sec": round(wall, 4)}
        print(f"{key:24s} {out[key]}")

    name = os.path.basename(sf_dir.rstrip("/"))
    tag = os.environ.get("SPARK_GRAFT_EXP_TAG", "")
    path = os.path.join(
        os.path.dirname(__file__),
        f"exp_job_count_{name}{('_' + tag) if tag else ''}.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
