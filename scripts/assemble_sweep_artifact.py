#!/usr/bin/env python
"""Assemble scripts/sweep_sf1x100_full.txt from the per-axis sweep outputs
(run by scripts/run_r11_atscale.sh as sole tenant). Verifies the axis
outputs cover the whole catalog with zero FAILs before writing; exits
nonzero otherwise so a partial run can never overwrite the artifact with
an overclaiming summary (the r10 lesson).

Usage: python scripts/assemble_sweep_artifact.py \
           /tmp/sweep_100x.txt /tmp/sweep_capped.txt \
           /tmp/sweep_embcap.txt /tmp/sweep_giants_10x.txt
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

HEADER = """# Full-catalog oracle sweep on at-scale axes (VERDICT r10 next-step 1) —
# r11, one HEAD, sweep as sole tenant. Every one of the 146 queries() keys
# carries an at-scale two-engine row, on the strongest tractable axis:
#
#   100x          /tmp/sf1x100 (build_scale_dataset.py x100): 137 keys,
#                 SWEEP_FLOAT_EPS=1 available (acceptances printed per key)
#   capped-docs   /tmp/sf1x100_capped (documents doc_id%25, 20k of 500k
#                 replica docs): the 5 minhash-family keys — the HUGEINT
#                 SQL sketch twin is O(docs x 64 perms), hours at 500k docs
#   capped-emb    /tmp/sf1x100_embcap (embeddings vec_id%25, 8k of 200k):
#                 dedup_embedding — the DuckDB all-pairs twin is O(n^2 dim)
#                 SQL arithmetic, >9 min at 200k vectors; the SPARK side
#                 runs the full 200k standalone post-fix, timed + blocking-
#                 invariance-asserted in
#                 scripts/time_dedup_embedding_100x.json
#   10x           /tmp/sf1x10: the 3 keys whose 100x outputs (25-60M rows:
#                 feature_projection 60M, elt_filter 28.8M, filter_ge_param
#                 25.2M) make the PYTHON COMPARISON, not either engine, the
#                 infeasible part — the measured feasibility ceiling is
#                 dedup_simhash's 20.2M-row 100x comparison, which this
#                 sweep runs at 100x (r10 relegated 15M-row keys too; they
#                 run at the full 100x axis here)
#
# Commands:
#   python scripts/build_scale_dataset.py /root/testdata/sf0.1 /tmp/sf1x100 100
#   python scripts/build_capped_corpus.py /tmp/sf1x100 /tmp/sf1x100_capped 25
#   python scripts/build_capped_corpus.py /tmp/sf1x100 /tmp/sf1x100_embcap 25 embeddings
#   bash scripts/run_r11_atscale.sh      # sole tenant, sequential axes
"""

SECTIONS = [
    ("100x replica", 0),
    ("capped-docs (minhash family)", 1),
    ("capped-emb (dedup_embedding)", 2),
    ("10x (full-output-cardinality keys)", 3),
]


def main() -> int:
    from airflow_etl_elt_spark.queries import QUERIES

    paths = sys.argv[1:5]
    assert len(paths) == 4, "need 4 axis files: 100x capped embcap giants"
    axis_rows: list[list[str]] = []
    seen: dict[str, str] = {}
    fails = 0
    for path in paths:
        rows = []
        for line in open(path):
            m = re.match(r"(ok|rows_only|eps_ok)\s+(\w+) ", line)
            if m:
                rows.append(line.rstrip())
                seen[m.group(2)] = path
            elif line.startswith("FAIL"):
                rows.append(line.rstrip())
                fails += 1
        axis_rows.append(rows)

    missing = [k for k in QUERIES if k not in seen]
    if fails or missing:
        print(f"REFUSING to write: {fails} FAILs, missing={missing}")
        return 1

    out = [HEADER]
    for (title, idx) in SECTIONS:
        out.append(f"## {title}")
        out.extend(axis_rows[idx])
        out.append("")
    out.append(f"{len(seen)}/{len(QUERIES)} keys green on an at-scale axis")
    with open("/root/repo/scripts/sweep_sf1x100_full.txt", "w") as fh:
        fh.write("\n".join(out) + "\n")
    print(f"wrote artifact: {len(seen)}/{len(QUERIES)} green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
