#!/bin/bash
# sf100 probe, round-14 addendum (VERDICT r13 #2/#3/#5):
#   1. q_rnn_pairs ENGINE run with the r14 occupancy-aware cell split —
#      the r13 >95-min hot-cell straggler is the thing being fixed; the
#      measured wall-time lands in this header after the run.
#   2. q_nmf_topics ENGINE re-attempt, SERIAL (nothing else spilling;
#      r13 died twice on >70G transient scratch while DuckDB spilled
#      alongside) — followed by its full-oracle check on a fresh
#      connection if the dump lands.
#   3. q_rnn_pairs FULL-oracle attempt on a fresh 100GB connection —
#      expected to exhaust the ~71G scratch ceiling (the pair CTE is
#      ~8e9 rows at this tier even post-split); the attempt is made so
#      the exclusion stays MEASURED, not assumed.
#   4. PartialVerify dumps (textrank edges, PPMI rows for the md5 word
#      sample) + tools/partial_check.py over the five r13 oracle-budget
#      exclusions plus q_rnn_pairs → CORRECTNESS_sf100_partial.json.
# Run steps SERIALLY — the whole point of the nmf re-attempt is an
# uncontended scratch volume.
set -x
cd /root/repo
export SPARK_GRAFT_CPUS=24
JOPTS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/jdk.internal.ref=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
CP="/opt/spark/jars/*:target/scala-2.13/classes"
SF=testdata_local/sf100

# 1. rnn engine run (post-split)
time java $JOPTS -cp "$CP" graft.Verify $SF /tmp/out_sf100_r14 q_rnn_pairs \
  2>&1 | grep -E "^\[verify\]|Error" | tail -3
echo "=== rnn engine done $(date) ==="

# 2. nmf engine re-attempt, serial
time java $JOPTS -cp "$CP" graft.Verify $SF /tmp/out_sf100_r14 q_nmf_topics \
  2>&1 | grep -E "^\[verify\]|Error" | tail -3
echo "=== nmf engine done $(date) ==="

# nmf full-oracle check (fresh connection; unrolled CTEs are nnz-linear)
if [ -d /tmp/out_sf100_r14/q_nmf_topics ]; then
  CHECK_MEM=100GB python3 tools/check.py $SF /tmp/out_sf100_r14 \
    /tmp/corr_sf100_nmf.json q_nmf_topics 2>&1 | tail -3
fi
echo "=== nmf check done $(date) ==="

# 3. rnn full-oracle attempt (measured, expected to exhaust scratch)
CHECK_MEM=100GB timeout 5400 python3 tools/check.py $SF /tmp/out_sf100_r14 \
  /tmp/corr_sf100_rnn.json q_rnn_pairs 2>&1 | tail -3
echo "=== rnn oracle attempt done $(date) ==="

# 4. partial dumps + checks
time java $JOPTS -cp "$CP" graft.PartialVerify $SF /tmp/pdump_sf100 \
  2>&1 | grep -E "^\[partial\]|Error" | tail -4
PARTIAL_MEM=60GB python3 tools/partial_check.py $SF /tmp/out_sf100 \
  /tmp/pdump_sf100 CORRECTNESS_sf100_partial.json \
  q_minhash_dedup q_jaccard_prefix q_suffix_spans q_suffix_scrub \
  q_textrank q_ppmi_svd 2>&1 | tail -16
# rnn partial rides on the r14 dump dir (fresh engine output)
PARTIAL_MEM=60GB python3 tools/partial_check.py $SF /tmp/out_sf100_r14 \
  /tmp/pdump_sf100 /tmp/partial_rnn.json q_rnn_pairs 2>&1 | tail -3
python3 - <<'EOF'
import json, os
out = "CORRECTNESS_sf100_partial.json"
d = json.load(open(out)) if os.path.exists(out) else {}
if os.path.exists("/tmp/partial_rnn.json"):
    d.update(json.load(open("/tmp/partial_rnn.json")))
json.dump(d, open(out, "w"), indent=1, sort_keys=True)
print("merged", sorted(d))
EOF
echo "=== DONE r14 sf100 addendum $(date) ==="
