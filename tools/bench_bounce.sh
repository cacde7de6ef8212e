#!/bin/bash
# Chain-context A/B (VERDICT r14 ask #7): the ALL run in ONE JVM shows
# per-query inflation vs isolated medians (r14: lp 16.7 s in-chain vs
# 9.6 s isolated — JVM/context load, not the queries). Arm B runs the
# SAME full set split into per-family JVMs (bounce between groups) on
# the same machine state; if the bounced sum converges toward isolated
# medians, the chain adopts JVM bouncing; if not, the inflation is
# machine-level and bouncing is a recorded negative.
# Usage: bench_bounce.sh <sfDir> <outPrefix>
set -e
cd /root/repo
SFDIR=${1:-/root/testdata/sf0.1}
PREFIX=${2:-bench_bounce}
FAMS="dedup_ embed_,ann_ graph_ corpus_ text_ mm_ events_,sketch_,stream,tumbling range_,asof_,sub_ REL"
i=0
for g in $FAMS; do
  i=$((i+1))
  echo "=== group $i ($g) start $(date -u +%H:%M:%S) loadavg $(cut -d' ' -f1 /proc/loadavg)"
  SPARK_GRAFT_BENCH_GROUP="$g" \
  SPARK_GRAFT_BENCH_QUERIES=ALL \
  SPARK_GRAFT_SF_DIR=$SFDIR \
  SPARK_GRAFT_BENCH_OUT=${PREFIX}_g$i.json \
  sbt -batch "runMain graft.Bench" > /tmp/${PREFIX}_g$i.log 2>&1
  tail -1 ${PREFIX}_g$i.json
done
echo "=== bounce complete"
