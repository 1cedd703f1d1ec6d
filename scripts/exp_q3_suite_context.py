#!/usr/bin/env python
"""Name the mechanism behind tpch_q3's suite-context cost (VERDICT r9
next-step 4): at the 100x replica q3 runs ~0.85 s dedicated but ~2.4-2.6 s
inside the bench suite, reproduced across two full runs at r9 HEAD. The
~1.5 s delta is attributed to "suite context" — this experiment decomposes
WHICH context:

  dedicated            q3 alone (after the bench's standard warmup)
  spark_only_suite     the full HEADLINE round-robin, Spark side only —
                       isolates Spark/Arrow fetch state (two ~15M-row
                       toPandas results per round: sessionize, window_ranks)
  bench_replica        HEADLINE with the in-process DuckDB oracle runs
                       interleaved exactly as bench.py does — adds DuckDB's
                       buffer pool + result frames to the SAME process
                       allocator
  bench_replica_mitigated
                       bench_replica + an UNTIMED release between keys:
                       drop frame refs, gc.collect(), pyarrow
                       default_memory_pool().release_unused(), JVM
                       System.gc()

If spark_only_suite ~= dedicated but bench_replica is elevated, the
mechanism is in-process-DuckDB allocator pressure (the bench's honest
two-engine interleave, a cost a production deployment never pays). If
spark_only_suite is already elevated, it is Spark/Arrow fetch state. The
mitigated arm measures whether the cost is releasable; if not, bench.py
gains a suite_context_sec field (the verdict's fallback).

Usage: python scripts/exp_q3_suite_context.py [SF_DIR] [ROUNDS]
Writes scripts/exp_q3_suite_context_<tag>.json
"""

from __future__ import annotations

import gc
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

KEY = "tpch_q3"


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def _release(spark) -> None:
    import pyarrow as pa

    gc.collect()
    try:
        pa.default_memory_pool().release_unused()
    except Exception:
        pass
    try:
        spark._jvm.System.gc()
    except Exception:
        pass


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1x100"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    tag = os.path.basename(sf_dir.rstrip("/"))

    from bench import HEADLINE

    from airflow_etl_elt_spark import TABLES
    from airflow_etl_elt_spark.queries import ORACLE_SQL, QUERIES
    from airflow_etl_elt_spark.session import get_session
    from airflow_etl_elt_spark.sources import layout as _layout

    spark = get_session(app_name="exp-q3-suite-context")
    os.environ["SPARK_GRAFT_PLAN_CACHE"] = "0"

    # bench.py's exact warmup: one JVM job, one pandas_udf import storm,
    # every headline key once at the smallest SF, at-rest layout prepared.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for key in HEADLINE:
            try:
                QUERIES[key](spark, warm_dir).toPandas()
            except Exception:
                pass
    _layout.prepare_at_rest_layout(spark, sf_dir)

    def duck_connect():
        import duckdb

        con = duckdb.connect()
        con.sql("SET TimeZone='UTC'")
        for t in TABLES:
            p = _layout.duckdb_path(sf_dir, t, spark)
            if p is None:
                p = f"{sf_dir}/{t}.parquet"
                if os.path.isdir(p):
                    p = f"{p}/*.parquet"
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        return con

    def run_arm(name: str, duck: bool, mitigate: bool) -> dict:
        con = duck_connect() if duck else None
        not_comparable = {"dedup_minhash"}
        q3: list[float] = []
        rss_at_q3: list[float] = []
        t_arm = time.perf_counter()
        for _ in range(rounds):
            for key in HEADLINE:
                t0 = time.perf_counter()
                pdf = QUERIES[key](spark, sf_dir).toPandas()
                dt = time.perf_counter() - t0
                if key == KEY:
                    q3.append(dt)
                    rss_at_q3.append(_rss_mb())
                del pdf
                if con is not None and key in ORACLE_SQL and key not in not_comparable:
                    ddf = con.sql(ORACLE_SQL[key]).df()
                    del ddf
                if mitigate:
                    _release(spark)
        if con is not None:
            con.close()
        out = {
            "q3_samples": [round(x, 3) for x in q3],
            "q3_min": round(min(q3), 3),
            "rss_mb_at_q3": [round(x) for x in rss_at_q3],
            "arm_wall_sec": round(time.perf_counter() - t_arm, 1),
        }
        print(name, json.dumps(out), flush=True)
        return out

    results: dict[str, dict] = {}

    # dedicated first — before any giant fetch has touched the process
    ded = []
    for _ in range(max(rounds, 3)):
        t0 = time.perf_counter()
        QUERIES[KEY](spark, sf_dir).toPandas()
        ded.append(time.perf_counter() - t0)
    results["dedicated"] = {
        "q3_samples": [round(x, 3) for x in ded],
        "q3_min": round(min(ded), 3),
        "rss_mb": round(_rss_mb()),
    }
    print("dedicated", json.dumps(results["dedicated"]), flush=True)

    results["spark_only_suite"] = run_arm("spark_only_suite", duck=False, mitigate=False)
    results["bench_replica"] = run_arm("bench_replica", duck=True, mitigate=False)
    results["bench_replica_mitigated"] = run_arm(
        "bench_replica_mitigated", duck=True, mitigate=True
    )

    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"exp_q3_suite_context_{tag}.json",
    )
    with open(out_path, "w") as f:
        json.dump({"sf_dir": sf_dir, "rounds": rounds, "arms": results}, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
