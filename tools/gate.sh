#!/usr/bin/env bash
# Multi-sf correctness gate: run graft.Verify and the DuckDB oracle compare
# at sf0.001, sf0.01 and sf0.1; exit non-zero on any red. This catches the
# q158/q105 class of scale- or representation-dependent bugs before the
# round driver does.
#
#   tools/gate.sh                    # full gate, all three sfs
#   tools/gate.sh q105_decimal_money # only these queries (comma-separated)
#   SFS=sf0.01 tools/gate.sh         # restrict scale factors
#   SPARK_GRAFT_CPUS=16 tools/gate.sh
set -uo pipefail
cd "$(dirname "$0")/.."
SFS="${SFS:-sf0.001 sf0.01 sf0.1}"
ONLY="${1:-}"
sbt -batch compile || exit 1
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
rc=0
for sf in $SFS; do
  out="/tmp/gate_${sf}"
  echo "=== gate: $sf ==="
  rm -rf "$out"
  java -cp "$CP" -Dderby.system.home=/tmp/derby graft.Verify \
    "/root/testdata/$sf" "$out" $ONLY 2>"/tmp/gate_${sf}.stderr"
  # sbt-free run: stderr is Spark INFO noise; real failures are these lines
  if grep '\[verify\]' "/tmp/gate_${sf}.stderr"; then rc=1; fi
  python3 tools/check_oracle.py "/root/testdata/$sf" "$out" || rc=1
done
if [ "$rc" -ne 0 ]; then echo "GATE RED"; else echo "GATE GREEN"; fi
exit $rc
