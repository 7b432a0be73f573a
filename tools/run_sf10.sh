#!/bin/bash
# sf10 tier refresh: regenerate (sf1 x10), full-registry verify sweep,
# DuckDB check, then the demoted-bench run (q_embed_dup dropped above sf1).
set -x
cd /root/repo
export SPARK_GRAFT_CPUS=24
# spark-class's standard Java-17 module opens: without them a raw
# `java -cp` run crashes in Kryo (FieldSerializer on HeapByteBuffer)
# the moment memory pressure evicts a broadcast/checkpoint block to
# disk — bit us on q_nmf_topics at sf100 (r13)
JOPTS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
CP="/opt/spark/jars/*:target/scala-2.13/classes"
java $JOPTS -cp "$CP" graft.ScaleUp testdata_local/sf1 testdata_local/sf10 10 2>&1 | grep -E "scaleup|Error" | tail -3
echo "=== scaleup done $(date) ==="
java $JOPTS -cp "$CP" graft.Verify testdata_local/sf10 /tmp/out_sf10 2>&1 | grep -E "^\[verify\]" | tail -8
echo "=== verify done $(date) ==="
python3 tools/check.py testdata_local/sf10 /tmp/out_sf10 CORRECTNESS_sf10.json 2>&1 | tail -5
echo "=== check done $(date) ==="
SPARK_GRAFT_SF_DIR=testdata_local/sf10 SPARK_GRAFT_BENCH_PASSES=2 \
  SPARK_GRAFT_BENCH_OUT=/tmp/bench_sf10.json \
  java $JOPTS -cp "$CP" graft.Bench 2>&1 | grep -o '{"metric".*}' | head -1 > BENCH_sf10_tmp.json
echo "=== DONE sf10 $(date) ==="
