#!/usr/bin/env python
"""Interleaved A/B of the minhash verify-join broadcast gate (VERDICT r6
next-step 5): the driver bench showed dedup_minhash 1.41 s (r5) -> 1.84 s
(r6) at sf0.1, and the only plan change in between was the r6 broadcast-
verify gate (b0c6820). This measures gate ON vs OFF with the bench's own
discipline — fresh builds (plan cache off), full toPandas fetch,
ALTERNATING pair order per round (SCALING addendum 1b rule), min+median
of N rounds — and writes the raw samples as JSON.

Usage: python scripts/exp_minhash_gate.py [sf_dir] [rounds]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 7

    from airflow_etl_elt_spark.operators import dedup
    from airflow_etl_elt_spark.queries import QUERIES
    from airflow_etl_elt_spark.session import get_session

    spark = get_session(app_name="exp_minhash_gate")
    os.environ["SPARK_GRAFT_PLAN_CACHE"] = "0"

    # Warm code paths + page cache once, untimed (bench does the same).
    QUERIES["dedup_minhash"](spark, sf).toPandas()

    def sample(force: bool) -> float:
        dedup._FORCE_VERIFY_BROADCAST = force
        t0 = time.perf_counter()
        QUERIES["dedup_minhash"](spark, sf).toPandas()
        return time.perf_counter() - t0

    on: list[float] = []
    off: list[float] = []
    for r in range(rounds):
        first, second = (True, False) if r % 2 == 0 else (False, True)
        a = sample(first)
        b = sample(second)
        (on if first else off).append(a)
        (off if first else on).append(b)
    dedup._FORCE_VERIFY_BROADCAST = None

    def med(xs: list[float]) -> float:
        ys = sorted(xs)
        n = len(ys)
        return ys[n // 2] if n % 2 else (ys[n // 2 - 1] + ys[n // 2]) / 2

    out = {
        "sf_dir": sf,
        "rounds": rounds,
        "broadcast_on": {"min": round(min(on), 4), "med": round(med(on), 4),
                         "samples": [round(x, 4) for x in on]},
        "broadcast_off": {"min": round(min(off), 4), "med": round(med(off), 4),
                          "samples": [round(x, 4) for x in off]},
    }
    print(json.dumps(out, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
