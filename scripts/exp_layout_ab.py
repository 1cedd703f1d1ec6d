#!/usr/bin/env python
"""Isolated per-key A/B of the at-rest layout (sources/layout.py): each key
is timed fresh (plan cache off, full toPandas fetch) with the layout
overrides ON vs OFF, ALTERNATING pair order per round (SCALING addendum 1b
rule). Emits min+med per variant per key as JSON.

Usage: python scripts/exp_layout_ab.py SF_DIR ROUNDS key [key ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf = sys.argv[1]
    rounds = int(sys.argv[2])
    keys = sys.argv[3:]

    from airflow_etl_elt_spark.queries import QUERIES
    from airflow_etl_elt_spark.session import get_session
    from airflow_etl_elt_spark.sources import layout

    spark = get_session(app_name="exp_layout_ab")
    os.environ["SPARK_GRAFT_PLAN_CACHE"] = "0"
    layout.prepare_at_rest_layout(spark, sf)  # materialize once (untimed)

    layout.suspend(spark)

    def sample(key: str, on: bool) -> float:
        if on:
            layout.resume(spark)
        t0 = time.perf_counter()
        QUERIES[key](spark, sf).toPandas()
        dt = time.perf_counter() - t0
        if on:
            layout.suspend(spark)
        return dt

    # warm both variants once, untimed
    for key in keys:
        sample(key, True)
        sample(key, False)

    out: dict[str, dict] = {}
    for key in keys:
        on: list[float] = []
        off: list[float] = []
        for r in range(rounds):
            first, second = (True, False) if r % 2 == 0 else (False, True)
            a = sample(key, first)
            b = sample(key, second)
            (on if first else off).append(a)
            (off if first else on).append(b)

        def med(xs: list[float]) -> float:
            ys = sorted(xs)
            n = len(ys)
            return ys[n // 2] if n % 2 else (ys[n // 2 - 1] + ys[n // 2]) / 2

        out[key] = {
            "layout_on": {"min": round(min(on), 3), "med": round(med(on), 3)},
            "layout_off": {"min": round(min(off), 3), "med": round(med(off), 3)},
        }
        print(json.dumps({key: out[key]}), flush=True)
    layout.clear(spark)
    with open("/tmp/exp_layout_ab.json", "w") as fh:
        json.dump({"sf_dir": sf, "rounds": rounds, "keys": out}, fh, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
