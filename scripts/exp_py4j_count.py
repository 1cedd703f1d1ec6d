#!/usr/bin/env python
"""Count py4j round trips (send_command calls) and wall time for the
DataFrame CONSTRUCTION of each headline key — guide §1 measurement for the
driver-build-cost work (VERDICT r12 next-step 1): the r12 finding was that
~40% of fresh-suite wall was Python-side query construction at ~0.2 ms per
round trip, fixed for the agg family only.

Usage: python scripts/exp_py4j_count.py [sf_dir] [key ...]
Writes scripts/exp_py4j_count_<sfname>[_tag].json  (SPARK_GRAFT_EXP_TAG)
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
    spark = get_session(app_name="py4j-count")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from airflow_etl_elt_spark.sources import layout as _layout

    if os.environ.get("SPARK_GRAFT_AT_REST_LAYOUT", "1") != "0":
        _layout.prepare_at_rest_layout(spark, sf_dir)
    os.environ["SPARK_GRAFT_PLAN_CACHE"] = "0"
    # warm every key once so session-lived metadata memos (partition-count
    # probes, dim-key lookups) are populated — the counted build is the
    # steady-state fresh build the bench times
    for key in keys:
        try:
            QUERIES[key](spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"warm {key} failed: {exc}", file=sys.stderr)

    client = spark.sparkContext._gateway._gateway_client
    real_send = client.send_command
    counter = {"n": 0}

    def counting_send(*a, **kw):
        counter["n"] += 1
        return real_send(*a, **kw)

    client.send_command = counting_send

    out: dict[str, dict] = {}
    for key in keys:
        calls, times = [], []
        for _ in range(3):
            counter["n"] = 0
            t0 = time.perf_counter()
            QUERIES[key](spark, sf_dir)  # construction only, no planning
            times.append(time.perf_counter() - t0)
            calls.append(counter["n"])
        out[key] = {"send_commands": min(calls), "build_sec": round(min(times), 4)}
        print(f"{key:24s} {out[key]}")

    client.send_command = real_send
    name = os.path.basename(sf_dir.rstrip("/"))
    tag = os.environ.get("SPARK_GRAFT_EXP_TAG", "")
    path = os.path.join(
        os.path.dirname(__file__),
        f"exp_py4j_count_{name}{('_' + tag) if tag else ''}.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
