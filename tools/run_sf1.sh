#!/bin/bash
# sf1 tier refresh: regenerate, full-registry verify sweep, DuckDB check.
set -x
cd /root/repo
export SPARK_GRAFT_CPUS=16
sbt -batch "runMain graft.ScaleUp /root/testdata/sf0.1 testdata_local/sf1 10" 2>&1 | grep -E "scaleup|\[error\]" | tail -5
echo "=== scaleup done $(date) ==="
sbt -batch "runMain graft.Verify testdata_local/sf1 /tmp/out_sf1" 2>&1 | grep -E "^\[verify\]" | tail -5
echo "=== verify done $(date) ==="
python3 tools/check.py testdata_local/sf1 /tmp/out_sf1 CORRECTNESS_sf1.json 2>&1 | tail -5
echo "=== DONE sf1 $(date) ==="
