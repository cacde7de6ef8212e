#!/bin/bash
cd /root/repo
for mode in gc block 0; do
  echo "=== mode=$mode $(date) loadavg=$(cat /proc/loadavg)" >> r18/mode_sweep2.log
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  SPARK_GRAFT_BENCH_REPEATS=1 SPARK_GRAFT_BENCH_GC=$mode \
  SPARK_GRAFT_BENCH_OUT=r18/bench2_mode_${mode}.json \
  sbt "runMain graft.Bench" > r18/bench2_mode_${mode}.stdout 2>&1
  echo "=== mode=$mode done rc=$? $(date)" >> r18/mode_sweep2.log
  sleep 30
done
