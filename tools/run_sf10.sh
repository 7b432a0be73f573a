#!/bin/bash
# sf10 tier refresh: regenerate (sf1 x10), full-registry verify sweep,
# DuckDB check, then the demoted-bench run (q_embed_dup dropped above sf1).
set -x
cd /root/repo
export SPARK_GRAFT_CPUS=24
CP="/opt/spark/jars/*:target/scala-2.13/classes"
java -cp "$CP" graft.ScaleUp testdata_local/sf1 testdata_local/sf10 10 2>&1 | grep -E "scaleup|Error" | tail -3
echo "=== scaleup done $(date) ==="
java -cp "$CP" graft.Verify testdata_local/sf10 /tmp/out_sf10 2>&1 | grep -E "^\[verify\]" | tail -8
echo "=== verify done $(date) ==="
python3 tools/check.py testdata_local/sf10 /tmp/out_sf10 CORRECTNESS_sf10.json 2>&1 | tail -5
echo "=== check done $(date) ==="
SPARK_GRAFT_SF_DIR=testdata_local/sf10 SPARK_GRAFT_BENCH_PASSES=2 \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf10.json \
  java -cp "$CP" graft.Bench 2>&1 | grep -o '{"metric".*}' | head -1 > BENCH_sf10_tmp.json
echo "=== DONE sf10 $(date) ==="
