#!/bin/bash
# r11 chain part 4: last 10 light keys at 100x, ngram_jaccard at
# capped-docs (its pair output grows superlinearly on the salted replica —
# the minhash-family shape), the 7 relegated heavies at 10x, then benches.
set -u
cd /root/repo
REMAIN=$(python3 - <<'PY'
import re
from airflow_etl_elt_spark.queries import QUERIES
skip = set("feature_projection,elt_filter,filter_ge_param,dedup_minhash,dedup_minhash_verified,dedup_components,dedup_incremental,stream_dedup_incremental,dedup_embedding,label_pairs_topk,window_lead_first_last,date_arith,window_lag_delta,window_running_sum,json_extract,window_range_frame,dedup_simhash,ngram_jaccard".split(","))
done = set()
for f in ("/tmp/sweep_100x_part1.txt", "/tmp/sweep_100x_part2.txt", "/tmp/sweep_100x_part3.txt"):
    for line in open(f):
        m = re.match(r"(ok|rows_only)\s+(\w+) ", line)
        if m: done.add(m.group(2))
print(",".join(k for k in QUERIES if k not in skip and k not in done))
PY
)
echo "remaining 100x: $(echo $REMAIN | tr ',' '\n' | wc -l) keys"
echo "=== 100x remainder $(date -u +%H:%M:%S) ==="
SWEEP_FLOAT_EPS=1 python scripts/sweep_oracle.py /tmp/sf1x100 "$REMAIN" > /tmp/sweep_100x_part4.txt 2>&1
echo "exit $?"
echo "=== ngram_jaccard at capped-docs $(date -u +%H:%M:%S) ==="
python scripts/sweep_oracle.py /tmp/sf1x100_capped ngram_jaccard > /tmp/sweep_capped_ngram.txt 2>&1
echo "exit $?"
echo "=== heavies at 10x $(date -u +%H:%M:%S) ==="
SWEEP_FLOAT_EPS=1 python scripts/sweep_oracle.py /tmp/sf1x10 "window_lead_first_last,date_arith,window_lag_delta,window_running_sum,json_extract,window_range_frame,dedup_simhash" > /tmp/sweep_heavies_10x.txt 2>&1
echo "exit $?"
echo "=== bench sf1x10 $(date -u +%H:%M:%S) ==="
SPARK_GRAFT_SF_DIR=/tmp/sf1x10 python bench.py 2>/dev/null | tail -1 > BENCH_SF1.json && cp BENCH_DETAIL.json BENCH_SF1_DETAIL.json
echo "=== bench sf1x30 $(date -u +%H:%M:%S) ==="
SPARK_GRAFT_SF_DIR=/tmp/sf1x30 python bench.py 2>/dev/null | tail -1 > BENCH_SF3.json && cp BENCH_DETAIL.json BENCH_SF3_DETAIL.json
echo "=== bench sf1x100 $(date -u +%H:%M:%S) ==="
SPARK_GRAFT_SF_DIR=/tmp/sf1x100 python bench.py 2>/dev/null | tail -1 > BENCH_SF10.json && cp BENCH_DETAIL.json BENCH_SF10_DETAIL.json
echo "=== ALL DONE $(date -u +%H:%M:%S) ==="
