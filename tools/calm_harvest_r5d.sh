#!/bin/bash
# Round-5 generalized calm-gated scaling harvester: one W_BIG/W_SMALL pair
# per calm window, single measured pass per cell after a JIT warmup on a
# smaller corpus (see calm_harvest_r5c.sh for the storm-dodging rationale).
# The pair is configurable so the same harness measures BOTH the
# 1-executor-vs-4-executor cell (4N cores still inside the host's
# flat-frequency envelope) and the 2-vs-8 cell (where the host's own
# parallel-capacity ceiling binds — measured separately by CapacityProbe).
# Usage: [WBIG=4 WSMALL=1 CORES=2 ...] tools/calm_harvest_r5d.sh [nRows] [workDir] [out.jsonl]
cd "$(dirname "$0")/.."
N=${1:-6400000}
WORK=${2:-/dev/shm/graft-c6400k}
OUT=${3:-/tmp/cbruns5/calm_r5d.jsonl}
WBIG=${WBIG:-4}
WSMALL=${WSMALL:-1}
CORES=${CORES:-2}
MEM=${MEM:-6144}
CALM_J=${CALM_J:-100}   # jiffies per 30s probe
MAXCELLS=${MAXCELLS:-12}
WARMUP=${WARMUP:-/dev/shm/graft-c1600k}
PAUSE=${PAUSE:-/tmp/cbruns5/PAUSE}
mkdir -p "$(dirname "$OUT")"
JAR=target/scala-2.13/sourcesystemdatacheckerspark_2.13-0.1.0.jar
AO=$(sed -n 's/^ADD_OPENS="\(.*\)"/\1/p' tools/qrun.sh)
steal_probe() {
  local a b
  a=$(awk '/^cpu /{print $9}' /proc/stat); sleep 30
  b=$(awk '/^cpu /{print $9}' /proc/stat); echo $((b - a))
}
cell() { # $1 = workers
  SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 SPARK_LOCAL_DIRS=/dev/shm/spark-local \
  SPARK_GRAFT_WARMUP_DIR="$WARMUP" SPARK_GRAFT_STAGEDUMP=1 \
  SPARK_GRAFT_PASSES=1 SPARK_GRAFT_PARTS=32 SPARK_GRAFT_EXEC_CORES=$CORES \
  SPARK_GRAFT_EXEC_OPTS="-XX:ActiveProcessorCount=$CORES -XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=256m" \
  java $AO -Xmx8g -XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=512m \
    -Dspark.ui.enabled=false -cp "$JAR:/opt/spark/jars/*" \
    graft.ClusterBench "$1" "$N" "$WORK" full "$MEM" 2>>"${OUT%.jsonl}.err" \
    | grep -oE '\{"workers".*\}' | sed "s/^{/{\"cores\":$CORES,/" >> "$OUT"
  rm -rf "$WORK"/out-* /dev/shm/spark-local/* 2>/dev/null
}
done_cells=0
while [ "$done_cells" -lt "$MAXCELLS" ]; do
  if [ -e "$PAUSE" ]; then echo "[calm-r5d] paused $(date +%T)"; sleep 30; continue; fi
  S=$(steal_probe)
  echo "[calm-r5d] steal=$S j/30s cores=$CORES pair=W$WBIG/W$WSMALL n=$N cells=$done_cells $(date +%T)"
  if [ "$S" -lt "$CALM_J" ]; then
    echo "[calm-r5d] calm - W$WBIG then W$WSMALL, single measured pass each"
    cell "$WBIG"; cell "$WSMALL"
    done_cells=$((done_cells + 1))
    tail -2 "$OUT" | grep -o '"workers":[0-9]*\|"validate_s":[0-9.]*\|"steal_j":[0-9]*' | tr '\n' ' '; echo
  fi
done
echo "[calm-r5d] done: $done_cells cell pairs W$WBIG/W$WSMALL at cores=$CORES n=$N"
