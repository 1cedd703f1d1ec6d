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
# r11, sweep as sole tenant. Every one of the 146 queries() keys carries
# an at-scale two-engine row, on the strongest tractable axis. Two HEADs,
# disjoint by key: 19 keys ran at 3ea046f before the sweep stalled on
# label_pairs_topk; everything after ran at 451d414, whose only diff is
# the pairwise_topk_within_label tiling fix — no pre-stall key touches it:
#
#   100x          /tmp/sf1x100 (build_scale_dataset.py x100): 128 keys,
#                 SWEEP_FLOAT_EPS=1 available (acceptances printed per key;
#                 this run needed ZERO), incl. the full streaming tier and
#                 every r10 cascade casualty up to 10M-row output compares
#   capped-docs   /tmp/sf1x100_capped (documents doc_id%25, 20k of 500k
#                 replica docs): the 5 minhash-family keys (HUGEINT SQL
#                 sketch twin is O(docs x 64 perms), hours at 500k docs)
#                 + ngram_jaccard (re-axed mid-sweep: its pair output grows
#                 superlinearly on the salted replica — 18+ min at full
#                 parallelism and ~30 GB JVM before the kill; 709,882 pairs
#                 compare exactly at the capped corpus)
#   capped-emb    /tmp/sf1x100_embcap (embeddings vec_id%25, 8k of 200k):
#                 dedup_embedding AND label_pairs_topk — both DuckDB twins
#                 are O(n^2 dim) interpreted SQL arithmetic (>9 min /
#                 ~hours at 200k vectors); the SPARK sides run the full
#                 200k standalone post-fix, timed + invariance-asserted in
#                 scripts/time_dedup_embedding_100x.json and
#                 scripts/time_label_pairs_topk_100x.json (label_pairs_topk
#                 was re-axed here mid-round: the r11 sweep STALLED on its
#                 one-task-per-label gram — the r10 dedup_embedding lesson
#                 in its second operator — fixed by block-pair tiling,
#                 commit 451d414, before its capped row below)
#   10x           /tmp/sf1x10: 10 keys whose 100x outputs (10-60M rows)
#                 make the PYTHON COMPARISON, not either engine, the
#                 infeasible-in-one-session part — the 3 giants
#                 (feature_projection 60M, elt_filter 28.8M, filter_ge_param
#                 25.2M) plus the 7 full-cardinality window/json/date/simhash
#                 keys (10-20M each; r10's dedup_simhash 20.2M row measured
#                 the harness at ~15 min/key there — 7 such keys did not fit
#                 this round's window). The 15M-row projection keys
#                 (table_scan_project, surrogate_key, derived_bool_col,
#                 window_ranks) DID run at the full 100x axis this round,
#                 as did scalar_above_avg (3.7M), ewma (10M), and the
#                 2M-row asof/resample family
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
