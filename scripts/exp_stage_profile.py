#!/usr/bin/env python
"""Per-stage wall/executor-time profile of a fresh key run (guide §1/§7):
where inside a key's jobs the time actually goes — scheduler gaps vs stage
compute — via the app status store after one profiled run.

Usage: python scripts/exp_stage_profile.py [sf_dir] key [key ...]
Prints per job: stages with (submission->completion wall, executorRunTime
sum, task count); gaps between consecutive jobs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from airflow_etl_elt_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    keys = sys.argv[2:]
    from airflow_etl_elt_spark.queries import QUERIES

    spark = get_session(app_name="stage-profile")
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from airflow_etl_elt_spark.sources import layout as _layout

    if os.environ.get("SPARK_GRAFT_AT_REST_LAYOUT", "1") != "0":
        _layout.prepare_at_rest_layout(spark, sf_dir)
    os.environ["SPARK_GRAFT_PLAN_CACHE"] = "0"
    for key in keys:
        QUERIES[key](spark, sf_dir).toPandas()  # warm

    store = sc._jsc.sc().statusStore()
    tracker = sc.statusTracker()
    for key in keys:
        group = f"prof:{key}"
        sc.setJobGroup(group, key)
        t0 = time.perf_counter()
        QUERIES[key](spark, sf_dir).toPandas()
        wall = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        print(f"== {key}: wall {wall:.3f}s")
        jobs = sorted(tracker.getJobIdsForGroup(group))
        prev_end = None
        for j in jobs:
            jd = store.job(j)
            sub = jd.submissionTime().get().getTime()
            comp = jd.completionTime().get().getTime()
            gap = "" if prev_end is None else f" (+{(sub - prev_end)/1000.0:.3f}s gap)"
            prev_end = comp
            print(f"  job {j}: {(comp-sub)/1000.0:.3f}s{gap}")
            for sid in sorted(tracker.getJobInfo(j).stageIds):
                try:
                    sd = store.lastStageAttempt(sid)
                except Exception:
                    continue
                st = sd.submissionTime()
                ct = sd.completionTime()
                if st.isEmpty() or ct.isEmpty():
                    print(f"    stage {sid}: skipped")
                    continue
                sw = (ct.get().getTime() - st.get().getTime()) / 1000.0
                run = sd.executorRunTime() / 1000.0
                print(
                    f"    stage {sid}: wall {sw:.3f}s run {run:.3f}s "
                    f"tasks {sd.numCompleteTasks()} {sd.name().split(' ')[0]}"
                )
    spark.stop()


if __name__ == "__main__":
    main()
