#!/bin/bash
# r12 scale-bench chain (VERDICT r11 next-step 1): the four-point record
# at one HEAD, serial and sole-tenant, with the refuses-to-overclaim guard
# between every bench and its official artifact. The r11 chain truncated
# BENCH_SF10.json at launch via a shell redirect and the snapshot committed
# mid-run; here the official files are only ever written by
# assemble_bench_artifact.py AFTER the raw output validates, and the chain
# ends with a verify pass that also fails on straggler processes.
set -u
cd /root/repo

fail() { echo "CHAIN FAILED: $1"; exit 1; }

echo "=== bench sf0.1 (solo point for the README table) $(date -u +%H:%M:%S) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench.py \
    > /tmp/bench_sf01.raw 2>/tmp/bench_sf01.err || fail "sf0.1 bench rc"
tail -1 /tmp/bench_sf01.raw > scripts/bench_sf0.1_r12_solo.json
cp BENCH_DETAIL.json scripts/bench_sf0.1_r12_solo_detail.json

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
# attempt OOMed mid-suite in round >5 while every key runs clean
# standalone at 24g. A cluster sizes executor memory to the data; this is
# the single-JVM equivalent, not a per-query tuning knob (timings at
# smaller points are unaffected — they keep the 24g default).
SPARK_GRAFT_DRIVER_MEM=48g SPARK_GRAFT_SF_DIR=/tmp/sf1x100 python bench.py \
    > /tmp/bench_sf10.raw 2>/tmp/bench_sf10.err || fail "100x bench rc"
python scripts/assemble_bench_artifact.py install /tmp/bench_sf10.raw SF10 1x100 \
    || fail "SF10 install refused"

echo "=== verify record + straggler check $(date -u +%H:%M:%S) ==="
python scripts/assemble_bench_artifact.py verify || fail "record verify"
echo "=== ALL DONE $(date -u +%H:%M:%S) ==="
