#!/usr/bin/env python
"""Record each headline key's DataFrame.semanticHash() — the canonicalized
analyzed-plan hash. Used as the plan-identity check for the r13 SQL-text
build-path rewrites (VERDICT r12 next-step 1): a rewrite that claims
"plans byte-identical" must leave every key's semanticHash unchanged.

Usage: python scripts/exp_semhash.py [sf_dir] [key ...]
Writes scripts/exp_semhash_<sfname>[_tag].json  (SPARK_GRAFT_EXP_TAG)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from airflow_etl_elt_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from bench import HEADLINE
    from airflow_etl_elt_spark.queries import QUERIES

    keys = sys.argv[2:] or HEADLINE
    spark = get_session(app_name="semhash")
    from airflow_etl_elt_spark.sources import layout as _layout

    if os.environ.get("SPARK_GRAFT_AT_REST_LAYOUT", "1") != "0":
        _layout.prepare_at_rest_layout(spark, sf_dir)
    os.environ["SPARK_GRAFT_PLAN_CACHE"] = "0"

    out: dict[str, int | str] = {}
    for key in keys:
        try:
            out[key] = QUERIES[key](spark, sf_dir).semanticHash()
        except Exception as exc:
            out[key] = f"FAILED: {type(exc).__name__}: {exc}"[:200]
        print(f"{key:24s} {out[key]}")

    name = os.path.basename(sf_dir.rstrip("/"))
    tag = os.environ.get("SPARK_GRAFT_EXP_TAG", "")
    path = os.path.join(
        os.path.dirname(__file__),
        f"exp_semhash_{name}{('_' + tag) if tag else ''}.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
