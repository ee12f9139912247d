#!/usr/bin/env bash
# Query-throughput scaling experiment (round 5): the serving-side analog of
# build_scaling.sh. One index is prebuilt on /dev/shm with 16 doc shards
# (WAND parallelism must exist for >4 cores to matter), then the frozen
# 10-query qbench set is timed (best-of-REPS total) at:
#   A) one JVM, local[4]               -> Q4   (baseline set-seconds)
#   B) one JVM, local[16]              -> Q16  (in-process scaling)
#   C) four CONCURRENT JVMs, local[4], all reading the SAME index
#                                      -> Q4x4 (process-isolated scaling:
#      4x the query load served in max-child wall — the cluster shape,
#      where executors share only the storage)
# in-process efficiency  = (Q4/Q16)/4 ; isolated efficiency = Q4/Q4x4max.
#
# Usage: tools/query_scaling.sh [nPages]   (default 60000)
set -euo pipefail
cd "$(dirname "$0")/.."
NPAGES="${1:-60000}"
source tools/jvm_prelude.sh # script already cd'd to the repo root

BASE=/dev/shm/graft-qscalx
rm -rf "$BASE"; mkdir -p "$BASE"

echo "== prebuild: local[16], 16 doc shards, $NPAGES pages =="
SPARK_GRAFT_CPUS=16 SPARK_GRAFT_DOC_SHARDS=16 SPARK_LOCAL_DIRS="$BASE/lb" \
java $ADD_OPENS -XX:ActiveProcessorCount=16 -Xms12g -Xmx12g \
  -Dspark.ui.enabled=false -cp "$CP" \
  graft.GraftCli directbuild "$BASE/ix" "$NPAGES" >"$BASE/build.log" 2>&1
grep -o 'directbuild .*' "$BASE/build.log" || { echo "BUILD FAILED"; tail "$BASE/build.log"; exit 1; }

run_qbench() { # cores heap localdir logfile
  local cores="$1" heap="$2" localdir="$3" log="$4"
  rm -rf "$localdir"; mkdir -p "$localdir"
  SPARK_GRAFT_CPUS="$cores" SPARK_GRAFT_QBENCH_REPS=3 SPARK_LOCAL_DIRS="$localdir" \
  java $ADD_OPENS -XX:ActiveProcessorCount="$cores" \
    -Xms"$heap" -Xmx"$heap" \
    -Dspark.ui.enabled=false -cp "$CP" \
    graft.GraftCli qbench "$BASE/ix" >"$log" 2>&1
}
extract_total() { grep -o 'total=[0-9.]*s' "$1" | sed 's/total=//; s/s$//'; }

echo "== A: single JVM local[4] =="
run_qbench 4 6g "$BASE/l4" "$BASE/a.log"
Q4=$(extract_total "$BASE/a.log"); echo "Q4=${Q4}s (10-query set, best of 3)"

echo "== B: single JVM local[16] =="
run_qbench 16 12g "$BASE/l16" "$BASE/b.log"
Q16=$(extract_total "$BASE/b.log"); echo "Q16=${Q16}s"

echo "== C: four concurrent JVMs local[4], shared read-only index =="
for i in 1 2 3 4; do
  run_qbench 4 6g "$BASE/c$i" "$BASE/c$i.log" &
done
wait # NB: always 0 for backgrounded jobs — child failure is caught below
CMAX=0
for i in 1 2 3 4; do
  S=$(extract_total "$BASE/c$i.log")
  if [ -z "$S" ]; then
    echo "CHILD JVM $i FAILED (no total= line):"; tail -5 "$BASE/c$i.log"; exit 1
  fi
  echo "  jvm$i: ${S}s"
  CMAX=$(python3 -c "print(max($CMAX, $S))")
done
echo "Q4x4(max child set-seconds)=${CMAX}s"

python3 - "$Q4" "$Q16" "$CMAX" <<'EOF'
import sys
q4, q16, cmax = (float(x) for x in sys.argv[1:4])
print(f"in-process 4->16 query efficiency: {(q4 / q16) / 4:.3f}")
print(f"process-isolated 4x(4-core) query efficiency: {q4 / cmax:.3f}")
print("(isolated: 4x the query load in cmax seconds vs 1x in q4 — the")
print(" cluster-shaped number; children share only the index storage)")
EOF
rm -rf "$BASE"
