#!/bin/bash
# Scale-bench refresh to the full 179-query registry (VERDICT r13 #1 —
# the last open r12 directive): BENCH_sf10.json was r11's 171-query
# artifact and BENCH_sf1.json was a two-generation-stale 104-query one
# (it still named the retired q_embed_dup). Two passes per tier, min-of-
# passes steady — the same protocol as the committed sf100 bench.
# q_embed_dup_smalltier is auto-included at sf1 and auto-demoted at sf10
# by Bench.scala's tier rule. Run on an otherwise idle machine.
#
# Hardened per ADVICE r14: -euo pipefail so a Bench crash can't write an
# empty artifact through the grep pipeline; each tier writes to a temp
# file and only moves into the repo artifact when non-empty; the
# committed sf0.1 BENCH.json is restored by a trap even on interrupt.
set -euo pipefail
cd /root/repo
export SPARK_GRAFT_CPUS=24
JOPTS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
CP="/opt/spark/jars/*:target/scala-2.13/classes"

# Bench unconditionally mirrors its line into repo BENCH.json — preserve
# the committed sf0.1 artifact (the budget source and the driver's read)
cp BENCH.json /tmp/BENCH_sf01_keep.json
trap 'cp /tmp/BENCH_sf01_keep.json BENCH.json' EXIT

for tier in sf10 sf1; do
  TMP=/tmp/bench_${tier}_line.json
  SPARK_GRAFT_SF_DIR=testdata_local/$tier SPARK_GRAFT_BENCH_PASSES=2 \
    SPARK_GRAFT_BENCH_OUT=/tmp/bench_${tier}_full.json \
    java $JOPTS -cp "$CP" graft.Bench 2>&1 \
    | { grep -o '{"metric".*}' || true; } | head -1 > "$TMP"
  if [ -s "$TMP" ]; then
    mv "$TMP" "BENCH_${tier}.json"
    echo "=== $tier bench done $(date) ==="
  else
    echo "=== $tier bench produced NO metric line — artifact untouched ===" >&2
    exit 1
  fi
done
echo "=== DONE scale benches $(date) ==="
