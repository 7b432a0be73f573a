#!/bin/bash
# sf100 probe, round-14 addendum (VERDICT r13 #2/#3/#5):
#   1. q_rnn_pairs ENGINE run with the r14 occupancy-aware cell split —
#      the r13 >95-min hot-cell straggler is the thing being fixed.
#      MEASURED r14, two runs: (a) with the split alone the run died at
#      ~10 min on a 200+ GB spill — NOT the pair join, but
#      ObjectHashAggregate's sort-based fallback (default threshold: 128
#      keys!) silently sorting the full ~8e9-row pair stream that feeds
#      the TopKNeighbors partial aggregation; (b) with
#      spark.sql.objectHashAggregate.sortBased.fallbackThreshold raised
#      in every session builder, the run COMPLETED in ~11 min wall
#      (24 threads) producing 3.9M mutual pairs, and the cosine-
#      soundness partial oracle is green on 245,377 sampled rows
#      (CORRECTNESS_sf100_partial.json). The same fallback was quietly
#      taxing every >128-group udaf at every tier — the full ScalaTest
#      suite dropped 9:42 -> 6:49 on the same code. The shipped value is
#      200000, not the 4M first tried: growing-buffer aggregations
#      (assocRules' collect_list baskets, 625k+ groups/task at sf10)
#      WANT the sort fallback — 4M held the full basket map and cost
#      q_assoc_rules +23 s at sf10, while 200k keeps the top-k family's
#      ~83k distinct-keys-per-task hashed with 2.4x margin (sf100 rerun
#      at 200k: byte-identical 3.9M rows, same ~11 min).
#   2. q_nmf_topics ENGINE re-attempt, SERIAL (nothing else spilling;
#      r13 died twice on >70G transient scratch while DuckDB spilled
#      alongside) — followed by its full-oracle check on a fresh
#      connection if the dump lands.
#      MEASURED r14: the serial engine run COMPLETED in 7.0 min wall
#      (16:17-16:24, JOPTS module opens + uncontended scratch — the r13
#      deaths were Kryo-on-evict plus a concurrent DuckDB spill); the
#      ORACLE replay then died at ~41+ GB of DuckDB spill against the
#      ~71 GB ceiling (unrolled nnz-linear CTEs at 195M nnz; fresh
#      connection, 100GB memory_limit). q_nmf_topics' sf100 posture is
#      therefore: engine dump green at tier, full-value evidence at sf10
#      (CORRECTNESS_sf10.json hash-green) — an ORACLE-budget exclusion
#      now, no longer an engine weakness.
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

# 3. rnn full-oracle attempt. check.py has no per-query arg — it checks
# the outdir's queries.txt manifest — so the attempt needs its own dump
# dir (the first script revision pointed it at the shared dir and
# re-ran the nmf oracle instead; caught and fixed same-session).
# MEASURED posture: the full replay at sf10 needed ~50 GB of DuckDB
# spill at CHECK_MEM=100GB (hash-green, this round); the pair CTE grows
# linearly with n to ~8e9 rows at sf100 — an order of magnitude past
# the ~71 GB scratch ceiling — so the attempt is gated behind
# RNN_ORACLE_ATTEMPT=1 rather than burned by default.
if [ "$RNN_ORACLE_ATTEMPT" = "1" ] && [ -d /tmp/out_sf100_rnn/q_rnn_pairs ]; then
  CHECK_MEM=100GB timeout 5400 python3 tools/check.py $SF /tmp/out_sf100_rnn \
    /tmp/corr_sf100_rnn.json 2>&1 | tail -3
fi
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
