#!/bin/bash
# Local replica of the full round gate: tests, smoke, oracle, bench.
set -e
cd "$(dirname "$0")/.."
echo "=== sbt test ==="
sbt -batch test 2>&1 | grep -E "Tests:|Passed:"
echo "=== smoke (t1) ==="
sbt -batch "runMain graft.Smoke" 2>&1 | grep '\[smoke\]'
echo "=== oracle (t2, sf0.01) ==="
SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} sbt -batch \
  "runMain graft.Verify /root/testdata/sf0.01 /tmp/gate_vout" > /tmp/gate_verify.log 2>&1
python3 tools/compare.py /root/testdata/sf0.01 /tmp/gate_vout | tail -1
echo "=== bench (sf0.1) ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"' | tail -1 | sed 's/^\[info\] //'
