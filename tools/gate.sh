#!/usr/bin/env bash
# Full local gate: compile, tests, oracle verification at every SF, bench.
# Usage: tools/gate.sh [--fast]   (--fast skips sf0.1 verify + bench)
set -euo pipefail
cd "$(dirname "$0")/.."

sbt -batch compile
sbt -batch test

for sf in sf0.001 sf0.01; do
  tools/run.sh graft.Verify "/root/testdata/$sf" "/tmp/gate_$sf" >/dev/null 2>&1
  python3 tools/check_oracle.py "/root/testdata/$sf" "/tmp/gate_$sf" | tail -1
done

if [[ "${1:-}" != "--fast" ]]; then
  tools/run.sh graft.Verify /root/testdata/sf0.1 /tmp/gate_sf0.1 >/dev/null 2>&1
  python3 tools/check_oracle.py /root/testdata/sf0.1 /tmp/gate_sf0.1 | tail -1
  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_OUT=/tmp/gate_bench.json \
    tools/run.sh graft.Bench 2>/dev/null | tail -1
fi
echo "GATE OK"
