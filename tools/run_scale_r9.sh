#!/bin/bash
# Round-9 scale-evidence refresh (VERDICT r8 #3 + #7):
#  - regenerate testdata_local/sf1 and sf10 (the tiers are gitignored,
#    wiped between sessions), then the FULL-registry sf10 sweep + bench
#  - regenerate the docs-only sf100 tier and run the extended 23-query
#    probe (run_sf100.sh list incl. the r6 analytics)
set -x
cd /root/repo
export SPARK_GRAFT_CPUS=24
CP="/opt/spark/jars/*:target/scala-2.13/classes"

java -cp "$CP" graft.ScaleUp /root/testdata/sf0.1 testdata_local/sf1 10 2>&1 | grep -E "scaleup|Error" | tail -3
echo "=== sf1 scaleup done $(date) ==="

java -cp "$CP" graft.Verify testdata_local/sf1 /tmp/out_sf1 2>&1 | grep -E "^\[verify\]" | tail -8
python3 tools/check.py testdata_local/sf1 /tmp/out_sf1 CORRECTNESS_sf1.json 2>&1 | tail -5
echo "=== sf1 sweep done $(date) ==="

bash tools/run_sf10.sh
bash tools/run_sf100.sh
echo "=== ALL SCALE TIERS DONE $(date) ==="
