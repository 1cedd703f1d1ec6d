#!/bin/bash
# r11 at-scale evidence chain — run as SOLE TENANT (SCALING r10 addendum 3).
# Axes (strongest tractable per key, r10 header contract):
#   100x:        every key except the 6 capped-axis and 3 giants
#   capped-docs: the 5 minhash-family keys (HUGEINT SQL twin is O(docs x 64))
#   capped-emb:  dedup_embedding (DuckDB all-pairs twin is O(n^2 dim))
#   10x:         the 3 giants whose 100x outputs (25-60M rows) make the
#                PYTHON COMPARISON infeasible (dedup_simhash's 20.2M-row
#                100x row is the measured feasibility ceiling)
set -u
cd /root/repo
GIANTS="feature_projection,elt_filter,filter_ge_param"
CAPPED_DOCS="dedup_minhash,dedup_minhash_verified,dedup_components,dedup_incremental,stream_dedup_incremental"
MAIN_KEYS=$(python3 - <<'PY'
from airflow_etl_elt_spark.queries import QUERIES
skip = set("feature_projection,elt_filter,filter_ge_param,dedup_minhash,dedup_minhash_verified,dedup_components,dedup_incremental,stream_dedup_incremental,dedup_embedding".split(","))
print(",".join(k for k in QUERIES if k not in skip))
PY
)
echo "=== capped-docs $(date -u +%H:%M:%S) ==="
python scripts/sweep_oracle.py /tmp/sf1x100_capped "$CAPPED_DOCS" > /tmp/sweep_capped.txt 2>&1
echo "exit $?"
echo "=== capped-emb $(date -u +%H:%M:%S) ==="
python scripts/sweep_oracle.py /tmp/sf1x100_embcap dedup_embedding > /tmp/sweep_embcap.txt 2>&1
echo "exit $?"
echo "=== giants-10x $(date -u +%H:%M:%S) ==="
SWEEP_FLOAT_EPS=1 python scripts/sweep_oracle.py /tmp/sf1x10 "$GIANTS" > /tmp/sweep_giants_10x.txt 2>&1
echo "exit $?"
echo "=== dedup_embedding standalone 200k timing $(date -u +%H:%M:%S) ==="
python scripts/time_dedup_embedding_100x.py /tmp/sf1x100 > /tmp/time_embed_100x.txt 2>&1
echo "exit $?"
echo "=== 100x full $(date -u +%H:%M:%S) ==="
SWEEP_FLOAT_EPS=1 python scripts/sweep_oracle.py /tmp/sf1x100 "$MAIN_KEYS" > /tmp/sweep_100x.txt 2>&1
echo "exit $?"
echo "=== bench sf1x10 $(date -u +%H:%M:%S) ==="
SPARK_GRAFT_SF_DIR=/tmp/sf1x10 python bench.py 2>/dev/null | tail -1 > BENCH_SF1.json && cp BENCH_DETAIL.json BENCH_SF1_DETAIL.json
echo "=== bench sf1x30 $(date -u +%H:%M:%S) ==="
SPARK_GRAFT_SF_DIR=/tmp/sf1x30 python bench.py 2>/dev/null | tail -1 > BENCH_SF3.json && cp BENCH_DETAIL.json BENCH_SF3_DETAIL.json
echo "=== bench sf1x100 $(date -u +%H:%M:%S) ==="
SPARK_GRAFT_SF_DIR=/tmp/sf1x100 python bench.py 2>/dev/null | tail -1 > BENCH_SF10.json && cp BENCH_DETAIL.json BENCH_SF10_DETAIL.json
echo "=== ALL DONE $(date -u +%H:%M:%S) ==="
