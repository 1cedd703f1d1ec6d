#!/bin/bash
# r11 chain part 2: remaining 100x keys (part 1 banked 19 in
# /tmp/sweep_100x_part1.txt before label_pairs_topk was re-axed to
# capped-emb), then the three bench scale points. Sole tenant.
set -u
cd /root/repo
REMAIN=$(python3 - <<'PY'
import re
from airflow_etl_elt_spark.queries import QUERIES
skip = set("feature_projection,elt_filter,filter_ge_param,dedup_minhash,dedup_minhash_verified,dedup_components,dedup_incremental,stream_dedup_incremental,dedup_embedding,label_pairs_topk".split(","))
done = set()
for line in open("/tmp/sweep_100x_part1.txt"):
    m = re.match(r"(ok|rows_only)\s+(\w+) ", line)
    if m: done.add(m.group(2))
print(",".join(k for k in QUERIES if k not in skip and k not in done))
PY
)
echo "remaining: $(echo $REMAIN | tr ',' '\n' | wc -l) keys"
echo "=== 100x remainder $(date -u +%H:%M:%S) ==="
SWEEP_FLOAT_EPS=1 python scripts/sweep_oracle.py /tmp/sf1x100 "$REMAIN" > /tmp/sweep_100x_part2.txt 2>&1
echo "exit $?"
echo "=== bench sf1x10 $(date -u +%H:%M:%S) ==="
SPARK_GRAFT_SF_DIR=/tmp/sf1x10 python bench.py 2>/dev/null | tail -1 > BENCH_SF1.json && cp BENCH_DETAIL.json BENCH_SF1_DETAIL.json
echo "=== bench sf1x30 $(date -u +%H:%M:%S) ==="
SPARK_GRAFT_SF_DIR=/tmp/sf1x30 python bench.py 2>/dev/null | tail -1 > BENCH_SF3.json && cp BENCH_DETAIL.json BENCH_SF3_DETAIL.json
echo "=== bench sf1x100 $(date -u +%H:%M:%S) ==="
SPARK_GRAFT_SF_DIR=/tmp/sf1x100 python bench.py 2>/dev/null | tail -1 > BENCH_SF10.json && cp BENCH_DETAIL.json BENCH_SF10_DETAIL.json
echo "=== ALL DONE $(date -u +%H:%M:%S) ==="
