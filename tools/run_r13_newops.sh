#!/bin/bash
# r13 follow-up: extend the committed scale evidence to the two r13
# operators (q_db_index, q_heaps_law, q_ppmi_svd) at every ScaleUp tier WITHOUT
# re-running the other 176 oracles — Verify dumps only the two queries
# (queries.txt manifests the subset) and check.py CHECK_RESUME merges the
# fresh verdicts into each existing CORRECTNESS artifact.
set -x
cd /root/repo
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-24}
# spark-class's standard Java-17 module opens: without them a raw
# `java -cp` run crashes in Kryo (FieldSerializer on HeapByteBuffer)
# the moment memory pressure evicts a broadcast/checkpoint block to
# disk — bit us on q_nmf_topics at sf100 (r13)
JOPTS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
CP="/opt/spark/jars/*:target/scala-2.13/classes"
NEWQ="q_db_index q_heaps_law q_ppmi_svd"
for TIER in sf1 sf10 sf100; do
  OUT=/tmp/out_${TIER}_r13new
  rm -rf "$OUT"
  java $JOPTS -cp "$CP" graft.Verify testdata_local/$TIER "$OUT" $NEWQ 2>&1 \
    | grep -E "^\[verify\]" | tail -4
  # strip any stale verdicts for the new queries — CHECK_RESUME would
  # otherwise serve the old verdict instead of re-checking the fresh dump
  python3 - "$TIER" <<'PY'
import json, sys
t = sys.argv[1]
d = json.load(open(f"CORRECTNESS_{t}.json"))
for q in ["q_db_index", "q_heaps_law", "q_ppmi_svd"]:
    d.pop(q, None)
json.dump(d, open(f"CORRECTNESS_{t}.json.partial", "w"), indent=2,
          sort_keys=True)
PY
  CHECK_RESUME=1 python3 tools/check.py testdata_local/$TIER "$OUT" \
    CORRECTNESS_${TIER}.json 2>&1 | tail -3
  echo "=== $TIER merged $(date) ==="
done
