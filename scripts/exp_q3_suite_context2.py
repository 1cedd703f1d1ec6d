#!/usr/bin/env python
"""Follow-up causal arms for exp_q3_suite_context.py (VERDICT r9 next-step
4). The first experiment established: q3 in-suite elevation appears only
AFTER the suite's giant Arrow fetches (round 1: 0.84 s ~= dedicated 0.74;
rounds 2-3 after driver RSS grew 148 MB -> 3.2 GB: 2.5-2.9 s), with no
DuckDB in the process, and is NOT released by gc.collect() +
pyarrow release_unused() + JVM System.gc().

Two remaining arms:
  suite_no_fetchers   the full HEADLINE round-robin MINUS the three
                      full-cardinality-fetch keys (events_hourly,
                      sessionize, window_ranks). If q3 stays at dedicated
                      speed all rounds, the fetches are causally necessary
                      for the elevation — the verdict's interleave A/B.
  suite_malloc_trim   full HEADLINE, with ctypes libc malloc_trim(0) after
                      every key (untimed) — tests whether glibc arena
                      retention in the driver process is the mechanism the
                      arrow/JVM releases couldn't reach.

Usage: python scripts/exp_q3_suite_context2.py [SF_DIR] [ROUNDS]
Writes scripts/exp_q3_suite_context2_<tag>.json
"""

from __future__ import annotations

import ctypes
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

KEY = "tpch_q3"
FETCHERS = {"events_hourly", "sessionize", "window_ranks"}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1x100"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    tag = os.path.basename(sf_dir.rstrip("/"))

    from bench import HEADLINE

    from airflow_etl_elt_spark.queries import QUERIES
    from airflow_etl_elt_spark.session import get_session
    from airflow_etl_elt_spark.sources import layout as _layout

    spark = get_session(app_name="exp-q3-suite-context2")
    os.environ["SPARK_GRAFT_PLAN_CACHE"] = "0"
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for key in HEADLINE:
            try:
                QUERIES[key](spark, warm_dir).toPandas()
            except Exception:
                pass
    _layout.prepare_at_rest_layout(spark, sf_dir)

    try:
        libc = ctypes.CDLL("libc.so.6")
    except OSError:
        libc = None

    def run_arm(name: str, keys: list[str], trim: bool) -> dict:
        q3: list[float] = []
        t_arm = time.perf_counter()
        for _ in range(rounds):
            for key in keys:
                t0 = time.perf_counter()
                pdf = QUERIES[key](spark, sf_dir).toPandas()
                dt = time.perf_counter() - t0
                if key == KEY:
                    q3.append(dt)
                del pdf
                if trim and libc is not None:
                    gc.collect()
                    libc.malloc_trim(0)
        out = {
            "q3_samples": [round(x, 3) for x in q3],
            "q3_min": round(min(q3), 3),
            "arm_wall_sec": round(time.perf_counter() - t_arm, 1),
        }
        print(name, json.dumps(out), flush=True)
        return out

    results = {
        "suite_no_fetchers": run_arm(
            "suite_no_fetchers", [k for k in HEADLINE if k not in FETCHERS], False
        ),
        "suite_malloc_trim": run_arm("suite_malloc_trim", list(HEADLINE), True),
    }

    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"exp_q3_suite_context2_{tag}.json",
    )
    with open(out_path, "w") as f:
        json.dump({"sf_dir": sf_dir, "rounds": rounds, "arms": results}, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
