#!/bin/bash
# Round-9 (continued) scale-evidence chain. The sf1 sweep is already
# committed (CORRECTNESS_sf1.json, 157/157); sf1 data is regenerated here
# only as the ScaleUp input for sf10. Produces:
#   CORRECTNESS_sf10.json  — full 157-query registry at sf10
#   BENCH_sf10_tmp.json    — demoted bench (q_embed_dup dropped above sf1)
#   CORRECTNESS_sf100.json — 40-query docs/events probe at sf100
set -x
cd /root/repo
export SPARK_GRAFT_CPUS=24
CP="/opt/spark/jars/*:target/scala-2.13/classes"

java -cp "$CP" graft.ScaleUp /root/testdata/sf0.1 testdata_local/sf1 10 2>&1 | grep -E "scaleup|Error" | tail -3
echo "=== sf1 scaleup done $(date) ==="
java -cp "$CP" graft.ScaleUp testdata_local/sf1 testdata_local/sf10 10 2>&1 | grep -E "scaleup|Error" | tail -3
echo "=== sf10 scaleup done $(date) ==="

java -cp "$CP" graft.Verify testdata_local/sf10 /tmp/out_sf10 2>&1 | grep -E "^\[verify\]" | tail -8
echo "=== sf10 verify done $(date) ==="
CHECK_THREADS=16 CHECK_MEM=40GB \
  python3 tools/check.py testdata_local/sf10 /tmp/out_sf10 CORRECTNESS_sf10.json.new 2>&1 | tail -5
mv CORRECTNESS_sf10.json.new CORRECTNESS_sf10.json
echo "=== sf10 check done $(date) ==="

SPARK_GRAFT_SF_DIR=testdata_local/sf10 SPARK_GRAFT_BENCH_PASSES=2 \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf10.json \
  java -cp "$CP" graft.Bench 2>&1 | grep -o '{"metric".*}' | head -1 > BENCH_sf10_tmp.json
echo "=== sf10 bench done $(date) ==="

bash tools/run_sf100.sh
echo "=== ALL r9d SCALE TIERS DONE $(date) ==="
