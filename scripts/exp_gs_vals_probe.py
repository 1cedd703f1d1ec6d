#!/usr/bin/env python
"""grouped_stats vals-materialization probe (VERDICT r11 stretch 7).

The 100x decomposition (exp_100x_tail) puts grouped_stats at 3.2 s e2e,
0.54 s stats core, 0.32 s bare 2-col scan — the median machinery re-reads
the vals projection for each histogram level and the selection scan, so
~2 of its ~2.7 s ride on repeated parquet decode. Hypothesis (verdict's
framing was a bucketed at-rest layout; this probes the cheaper general
form first): materialize vals once (MEMORY_AND_DISK, rotated per
invocation so fresh mode stays fresh) and serve the later passes from
memory. Alternating-arm min-of-N, fresh builds, sole tenant.

Usage: python scripts/exp_gs_vals_probe.py [SF_DIR] [REPS]
Writes scripts/exp_gs_vals_probe_<base>.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1x100"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 5


def main() -> None:
    os.environ["SPARK_GRAFT_PLAN_CACHE"] = "0"
    from airflow_etl_elt_spark.queries import QUERIES
    from airflow_etl_elt_spark.session import get_session

    spark = get_session(app_name="gs-vals-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # warm both arms once
    for mode in ("scan", "persist"):
        os.environ["SPARK_GRAFT_GS_VALS"] = mode
        QUERIES["grouped_stats"](spark, SF_DIR).toPandas()

    times: dict[str, list[float]] = {"scan": [], "persist": []}
    rows: dict[str, list] = {}
    for _ in range(REPS):
        for mode in ("scan", "persist"):  # alternating arms, same weather
            os.environ["SPARK_GRAFT_GS_VALS"] = mode
            t0 = time.perf_counter()
            pdf = QUERIES["grouped_stats"](spark, SF_DIR).toPandas()
            times[mode].append(round(time.perf_counter() - t0, 4))
            rows[mode] = sorted(map(tuple, pdf.round(6).values.tolist()))
    os.environ["SPARK_GRAFT_GS_VALS"] = "scan"
    assert rows["scan"] == rows["persist"], "ARMS DISAGREE — abort"
    out = {
        "sf_dir": SF_DIR,
        "reps": REPS,
        "times": times,
        "min": {m: min(v) for m, v in times.items()},
        "median": {m: sorted(v)[len(v) // 2] for m, v in times.items()},
        "results_identical": True,
    }
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"exp_gs_vals_probe_{os.path.basename(SF_DIR.rstrip('/'))}.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(out["min"]), json.dumps(out["median"]))
    print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
