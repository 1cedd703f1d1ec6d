#!/usr/bin/env python
"""Third q3-suite-context arm (VERDICT r9 next-step 4): the codegen-cache
hypothesis. Eliminated so far (exp_q3_suite_context{,2}): in-process DuckDB
(spark-only arm still elevated), the giant Arrow fetches specifically
(no-fetchers arm still elevated), JVM garbage (System.gc no effect), glibc
arena retention (malloc_trim no effect).

Remaining candidate that fits every observation: Spark's generated-class
cache (CodeGenerator.cache) is bounded by the STATIC conf
spark.sql.codegen.cache.maxEntries (default 100). Twenty interleaved
headline queries generate well over 100 whole-stage-codegen classes per
round, evicting q3's entries — so every in-suite visit re-pays Janino
compilation (hundreds of ms across q3's stages), while dedicated
back-to-back runs hit the cache (fresh plans regenerate IDENTICAL source
text, which is the cache key). Compilation cost is CPU, invisible to every
GC/allocator mitigation tried — exactly the observed signature.

Two processes, identical suite workload, the conf as the only difference:
  default  session built with the stock cache (100 entries)
  big      spark.sql.codegen.cache.maxEntries=5000

If big holds q3 at its dedicated ~0.8 s across rounds while default
degrades to ~2.5 s, the mechanism is NAMED and the fix is one static conf
in get_session's defaults.

Usage: python scripts/exp_q3_codegen_cache.py [SF_DIR] [ROUNDS] [default|big]
(the caller runs it twice, once per mode — a static conf cannot change
inside one JVM). Writes/updates scripts/exp_q3_codegen_cache_<tag>.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

KEY = "tpch_q3"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1x100"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    mode = sys.argv[3] if len(sys.argv) > 3 else "big"
    tag = os.path.basename(sf_dir.rstrip("/"))

    from bench import HEADLINE

    from airflow_etl_elt_spark.queries import QUERIES
    from airflow_etl_elt_spark.session import get_session
    from airflow_etl_elt_spark.sources import layout as _layout

    extra = {}
    if mode == "big":
        extra["spark.sql.codegen.cache.maxEntries"] = "5000"
    else:
        # PIN the stock value (ADVICE r10): session.py now bakes 5000 into
        # DEFAULT_CONF, so an empty extra_conf would silently measure the
        # big arm twice; the baseline arm must force the pre-fix default.
        extra["spark.sql.codegen.cache.maxEntries"] = "100"
    spark = get_session(app_name=f"exp-q3-codegen-{mode}", extra_conf=extra)
    try:
        got = spark.conf.get("spark.sql.codegen.cache.maxEntries")
    except Exception:
        got = "stock-default(100)"
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

    # dedicated baseline in THIS process
    ded = []
    for _ in range(3):
        t0 = time.perf_counter()
        QUERIES[KEY](spark, sf_dir).toPandas()
        ded.append(round(time.perf_counter() - t0, 3))

    q3: list[float] = []
    t_arm = time.perf_counter()
    for _ in range(rounds):
        for key in HEADLINE:
            t0 = time.perf_counter()
            pdf = QUERIES[key](spark, sf_dir).toPandas()
            dt = time.perf_counter() - t0
            if key == KEY:
                q3.append(round(dt, 3))
            del pdf
    arm = {
        "conf_value": got,
        "dedicated_samples": ded,
        "q3_suite_samples": q3,
        "q3_suite_min": min(q3),
        "arm_wall_sec": round(time.perf_counter() - t_arm, 1),
    }
    print(mode, json.dumps(arm), flush=True)

    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"exp_q3_codegen_cache_{tag}.json",
    )
    data = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            data = json.load(f)
    data.setdefault("sf_dir", sf_dir)
    data.setdefault("rounds", rounds)
    data.setdefault("arms", {})[mode] = arm
    with open(out_path, "w") as f:
        json.dump(data, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
