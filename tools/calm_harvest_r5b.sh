#!/bin/bash
# Round-5 headline scaling harvester: W2 vs W8 pairs at 2-core executors
# over a corpus big enough to amortize the per-pass serial term.
#
# Why 6.4M rows: the r4/r5 cells fit T(cores) = S + P/cores with S ~= 9.6 s
# (driver latency: AQE re-plan + codegen across ~42 stages) and P ~= 117
# core-s at 1.6M clips. At 1.6M the W2(4 cores) -> W8(16 cores) efficiency
# is capped at ~0.57 by S alone; at 6.4M (P ~= 468 core-s) the same engine
# predicts ~0.81. The criterion measures the engine's dataflow scaling, so
# the cell must be sized so dataflow, not fixed driver latency, dominates —
# exactly as a production run at 10^9+ rows would be.
#
# Gates: (a) pre-cell 30 s steal probe must be calm; (b) every pass records
# its own /proc/stat steal delta (ClusterBench pass_stats) so downstream
# selection keeps only counter-clean passes; (c) a PAUSE file skips cell
# launches while the operator runs anything else on the box.
# Usage: tools/calm_harvest_r5b.sh [nRows] [workDir] [out.jsonl]
cd "$(dirname "$0")/.."
N=${1:-6400000}
WORK=${2:-/dev/shm/graft-c6400k}
OUT=${3:-/tmp/cbruns5/calm_6400k.jsonl}
CORES=${CORES:-2}
MEM=${MEM:-6144}
CALM_J=${CALM_J:-100}   # jiffies per 30s probe (~200/min)
MAXCELLS=${MAXCELLS:-8}
PAUSE=${PAUSE:-/tmp/cbruns5/PAUSE}
mkdir -p "$(dirname "$OUT")"
JAR=target/scala-2.13/sourcesystemdatacheckerspark_2.13-0.1.0.jar
AO=$(sed -n 's/^ADD_OPENS="\(.*\)"/\1/p' tools/qrun.sh)
steal_probe() {
  local a b
  a=$(awk '/^cpu /{print $9}' /proc/stat); sleep 30
  b=$(awk '/^cpu /{print $9}' /proc/stat); echo $((b - a))
}
WARMUP=${WARMUP:-/dev/shm/graft-c100k}
cell() { # $1 = workers
  SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 SPARK_LOCAL_DIRS=/dev/shm/spark-local \
  SPARK_GRAFT_WARMUP_DIR="$WARMUP" \
  SPARK_GRAFT_PASSES=2 SPARK_GRAFT_PARTS=32 SPARK_GRAFT_EXEC_CORES=$CORES \
  SPARK_GRAFT_EXEC_OPTS="-XX:ActiveProcessorCount=$CORES -XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=256m" \
  java $AO -Xmx8g -XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=512m \
    -Dspark.ui.enabled=false -cp "$JAR:/opt/spark/jars/*" \
    graft.ClusterBench "$1" "$N" "$WORK" full "$MEM" 2>>"${OUT%.jsonl}.err" \
    | grep -oE '\{"workers".*\}' | sed "s/^{/{\"cores\":$CORES,/" >> "$OUT"
  rm -rf "$WORK"/out-* /dev/shm/spark-local/* 2>/dev/null
}
done_cells=0
while [ "$done_cells" -lt "$MAXCELLS" ]; do
  if [ -e "$PAUSE" ]; then echo "[calm-r5b] paused $(date +%T)"; sleep 30; continue; fi
  S=$(steal_probe)
  echo "[calm-r5b] steal=$S j/30s cores=$CORES n=$N cells=$done_cells $(date +%T)"
  if [ "$S" -lt "$CALM_J" ]; then
    echo "[calm-r5b] calm - running W2/W8 pair at ${CORES}-core executors"
    cell 2; cell 8
    done_cells=$((done_cells + 1))
    tail -2 "$OUT" | grep -o '"workers":[0-9]*\|"validate_s":[0-9.]*\|"steal_j":[0-9]*' | tr '\n' ' '; echo
  fi
done
echo "[calm-r5b] done: $done_cells cell pairs at cores=$CORES n=$N"
