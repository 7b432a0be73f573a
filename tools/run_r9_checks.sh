#!/bin/bash
# Round-9 check chain (sequential to bound disk spill):
#  1. retry the sf1 q_kn_bigram oracle (prior attempt hit a full /tmp
#     while two DuckDBs spilled concurrently)
#  2. full sf10 check (resumes the .partial)
#  3. sf10 supplement: the 5 r9c queries added after the sf10 Verify ran
set -x
cd /root/repo

# 1. sf1 kn_bigram retry: drop the failed entry, resume over the cache
python3 - <<'EOF'
import json
d = json.load(open('CORRECTNESS_sf1.json'))
d.pop('q_kn_bigram', None)
json.dump(d, open('CORRECTNESS_sf1.json.partial', 'w'), indent=2, sort_keys=True)
EOF
CHECK_THREADS=16 CHECK_MEM=24GB CHECK_RESUME=1 \
  python3 tools/check.py testdata_local/sf1 /tmp/out_sf1_r9c CORRECTNESS_sf1.json
echo "=== sf1 kn_bigram retry done $(date) ==="

# 2. full sf10 check, resumed
CHECK_THREADS=16 CHECK_MEM=24GB CHECK_RESUME=1 \
  python3 tools/check.py testdata_local/sf10 /tmp/out_sf10 CORRECTNESS_sf10.json.new
echo "=== sf10 full check done $(date) ==="

# 3. sf10 r9c supplement, merged over the full-check results
cp CORRECTNESS_sf10.json.new CORRECTNESS_sf10.json.new.partial
CHECK_THREADS=16 CHECK_MEM=24GB CHECK_RESUME=1 \
  python3 tools/check.py testdata_local/sf10 /tmp/out_sf10_r9c CORRECTNESS_sf10.json.new
mv CORRECTNESS_sf10.json.new CORRECTNESS_sf10.json
echo "=== DONE r9 checks $(date) ==="
