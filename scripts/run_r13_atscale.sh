#!/bin/bash
# r13 scale-bench chain: refresh the four-point record at the r13 HEAD,
# serial and sole-tenant, every official artifact written only by the
# validate-and-install guard (same discipline as run_r12_atscale.sh; the
# replicas are assumed freshly built in /tmp/sf1x{10,30,100} by
# build_scale_dataset.py earlier in the session).
set -u
cd /root/repo

fail() { echo "CHAIN FAILED: $1"; exit 1; }

echo "=== bench sf0.1 (solo point for the README table) $(date -u +%H:%M:%S) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py \
    > /tmp/bench_sf01.raw 2>/tmp/bench_sf01.err || fail "sf0.1 bench rc"
tail -1 /tmp/bench_sf01.raw > scripts/bench_sf0.1_r13_solo.json
cp BENCH_DETAIL.json scripts/bench_sf0.1_r13_solo_detail.json

echo "=== bench 10x $(date -u +%H:%M:%S) ==="
SPARK_GRAFT_SF_DIR=/tmp/sf1x10 python bench.py \
    > /tmp/bench_sf1.raw 2>/tmp/bench_sf1.err || fail "10x bench rc"
python scripts/assemble_bench_artifact.py install /tmp/bench_sf1.raw SF1 1x10 \
    || fail "SF1 install refused"

echo "=== bench 30x $(date -u +%H:%M:%S) ==="
SPARK_GRAFT_SF_DIR=/tmp/sf1x30 python bench.py \
    > /tmp/bench_sf3.raw 2>/tmp/bench_sf3.err || fail "30x bench rc"
python scripts/assemble_bench_artifact.py install /tmp/bench_sf3.raw SF3 1x30 \
    || fail "SF3 install refused"

echo "=== bench 100x $(date -u +%H:%M:%S) ==="
# 48g for the 100x point only: the 20-key x 7-round suite accumulates
# broadcast/cache remnants (freed lazily by the ContextCleaner on GC) on
# top of 60M-row working sets in ONE local-mode JVM; at 24g the r12 first
# attempt OOMed mid-suite while every key runs clean standalone at 24g
# (SCALING r12 addendum). A cluster sizes executor memory to the data.
SPARK_GRAFT_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=/tmp/sf1x100 python bench.py \
    > /tmp/bench_sf10.raw 2>/tmp/bench_sf10.err || fail "100x bench rc"
python scripts/assemble_bench_artifact.py install /tmp/bench_sf10.raw SF10 1x100 \
    || fail "SF10 install refused"

echo "=== verify record + straggler check $(date -u +%H:%M:%S) ==="
python scripts/assemble_bench_artifact.py verify || fail "record verify"
echo "=== ALL DONE $(date -u +%H:%M:%S) ==="
