#!/bin/bash
# Scaling-audit bench chain (VERDICT r11 ask #1; r12 ask #1 added the
# sf1 leg): full-set ALL runs at three SFs, sequential, each writing
# its own artifact, then — when the generated sf1 set exists — a
# single-pass sf1 leg over ALL (r13 verdict #2: graph_link_prediction
# now defaults to the sf1-measured cap 256 with its oracle mirroring
# the cap, so the sf1 leg carries all declared queries). Run on an
# idle machine (loadavg < 1.5 at start — the artifact records it
# either way), then fit exponents:
#   python3 tools/scaling_audit.py bench_all_sf0.001.json \
#     bench_all_sf0.01.json bench_all_sf0.1.json bench_all_sf1.json
# The sf0.1 artifact doubles as the refreshed bench_all_out.json.
set -e
cd /root/repo
for sf in 0.001 0.01 0.1; do
  echo "=== sf$sf start $(date -u +%H:%M:%S) loadavg $(cut -d' ' -f1-3 /proc/loadavg)"
  SPARK_GRAFT_BENCH_QUERIES=ALL \
  SPARK_GRAFT_SF_DIR=/root/testdata/sf$sf \
  SPARK_GRAFT_BENCH_OUT=bench_all_sf$sf.json \
  sbt -batch "runMain graft.Bench" > /tmp/bench_all_sf$sf.log 2>&1
  echo "=== sf$sf done  $(date -u +%H:%M:%S): $(tail -1 bench_all_sf$sf.json)"
done
cp bench_all_sf0.1.json bench_all_out.json
if [ -d /root/repo/testdata_sf1 ] && [ "${SKIP_SF1:-0}" != "1" ]; then
  echo "=== sf1 start $(date -u +%H:%M:%S) loadavg $(cut -d' ' -f1-3 /proc/loadavg)"
  SPARK_GRAFT_BENCH_QUERIES=ALL \
  SPARK_GRAFT_BENCH_REPEATS=1 \
  SPARK_DRIVER_MEM=48g \
  SPARK_GRAFT_SF_DIR=/root/repo/testdata_sf1 \
  SPARK_GRAFT_BENCH_OUT=bench_all_sf1.json \
  sbt -batch "runMain graft.Bench" > /tmp/bench_all_sf1.log 2>&1
  echo "=== sf1 done  $(date -u +%H:%M:%S): $(tail -1 bench_all_sf1.json)"
fi
echo "=== chain complete"
