#!/bin/bash
# Round-9 tail chain: the sf100 components re-dump (its verify attempt
# failed under transient disk pressure; the sf100 bench subsequently ran
# it clean), the sf1 Kneser-Ney oracle retry, and the full sf100 check.
set -x
cd /root/repo
CP="/opt/spark/jars/*:target/scala-2.13/classes"

# 1. re-dump q_dedup_components at sf100 into the probe's out dir
SPARK_GRAFT_CPUS=16 java -cp "$CP" graft.Verify testdata_local/sf100 \
  /tmp/out_sf100_comp q_dedup_components 2>&1 | grep -E "\[verify\]" | tail -2
cp -r /tmp/out_sf100_comp/q_dedup_components /tmp/out_sf100/
echo "=== sf100 components re-dump done $(date) ==="

# 2. sf1 kn_bigram retry, alone this time, bigger memory
python3 - <<'EOF'
import json
d = json.load(open('CORRECTNESS_sf1.json'))
d.pop('q_kn_bigram', None)
json.dump(d, open('CORRECTNESS_sf1.json.partial', 'w'), indent=2, sort_keys=True)
EOF
CHECK_THREADS=12 CHECK_MEM=40GB CHECK_RESUME=1 \
  python3 tools/check.py testdata_local/sf1 /tmp/out_sf1_r9c CORRECTNESS_sf1.json
echo "=== sf1 kn retry done $(date) ==="

# 3. full sf100 check over all 40 dumps
CHECK_THREADS=12 CHECK_MEM=40GB CHECK_RESUME=1 \
  python3 tools/check.py testdata_local/sf100 /tmp/out_sf100 CORRECTNESS_sf100.json.new
echo "=== DONE r9 tail $(date) ==="
