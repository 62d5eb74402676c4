#!/bin/bash
# Round-5 opportunistic scaling-cell harvester: multi-core-executor cells,
# calm-gated. The r4 diagnosis localized the W8 1-core deficit to HotSpot
# 1-CPU ergonomics (single C2 thread in futex storms chewing multi-MB
# codegen); the 4-core 4N attempt (8 exec x 4 cores = all 32 host cores)
# was both storm-robbed AND left zero headroom for driver/JVM service
# threads. This round's primary cell keeps per-executor shape fixed at
# CORES (default 2) and varies ONLY the executor count 2 -> 8 (N -> 4N),
# leaving host headroom at W8 (16 of 32 cores).
#
# Gates: (a) pre-cell: skip unless steal < CALM_J jiffies/min; (b) each
# pass records its own /proc/stat steal delta (ClusterBench pass_stats) --
# selection downstream excludes passes on counter evidence.
# Usage: CORES=2 tools/calm_harvest_r5.sh [nRows] [workDir] [out.jsonl]
cd "$(dirname "$0")/.."
N=${1:-1600000}
WORK=${2:-/dev/shm/graft-c1600k}
OUT=${3:-/tmp/cbruns5/calm_cells.jsonl}
CORES=${CORES:-2}
MEM=${MEM:-3072}
CALM_J=${CALM_J:-150}
MAXCELLS=${MAXCELLS:-6}
mkdir -p "$(dirname "$OUT")"
JAR=target/scala-2.13/sourcesystemdatacheckerspark_2.13-0.1.0.jar
AO=$(sed -n 's/^ADD_OPENS="\(.*\)"/\1/p' tools/qrun.sh)
steal_per_min() {
  local a b
  a=$(awk '/^cpu /{print $9}' /proc/stat); sleep 60
  b=$(awk '/^cpu /{print $9}' /proc/stat); echo $((b - a))
}
cell() { # $1 = workers
  SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 SPARK_LOCAL_DIRS=/dev/shm/spark-local \
  SPARK_GRAFT_PASSES=2 SPARK_GRAFT_PARTS=32 SPARK_GRAFT_EXEC_CORES=$CORES \
  SPARK_GRAFT_EXEC_OPTS="-XX:ActiveProcessorCount=$CORES -XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=256m" \
  java $AO -Xmx8g -XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=512m \
    -Dspark.ui.enabled=false -cp "$JAR:/opt/spark/jars/*" \
    graft.ClusterBench "$1" "$N" "$WORK" full "$MEM" 2>/dev/null \
    | grep -oE '\{"workers".*\}' | sed "s/^{/{\"cores\":$CORES,/" >> "$OUT"
  rm -rf "$WORK"/out-* 2>/dev/null
}
done_cells=0
while [ "$done_cells" -lt "$MAXCELLS" ]; do
  S=$(steal_per_min)
  echo "[calm-r5] steal=$S j/min cores=$CORES cells=$done_cells $(date +%T)"
  if [ "$S" -lt "$CALM_J" ]; then
    echo "[calm-r5] calm - running W2/W8 pair at ${CORES}-core executors"
    cell 2; cell 8
    done_cells=$((done_cells + 1))
    tail -2 "$OUT" | grep -o '"workers":[0-9]*\|"validate_s":[0-9.]*\|"steal_j":[0-9]*' | tr '\n' ' '; echo
  fi
done
echo "[calm-r5] done: $done_cells cell pairs at cores=$CORES"
