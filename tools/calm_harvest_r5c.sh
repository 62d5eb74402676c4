#!/bin/bash
# Round-5 short-cell scaling harvester: W8/W2 pairs at 2-core executors,
# single measured pass per cell after a 1.6M-corpus JIT warmup.
#
# Storm-dodging rationale: hypervisor-calm windows on this box last
# minutes, not tens of minutes (r5 measured: a 30 s calm probe followed by
# an 83 j/s storm surge 4 min later). The atomic unit of measurement must
# therefore be as short as possible: warmup on the mid-size corpus
# compiles the same codegen classes the measured pass runs (classes are
# cached by plan shape, not data size — validated: steady-after-warmup
# 38.7 s == full-cold steady 38.9 s at W2/1.6M), then ONE measured 6.4M
# pass. W8 runs FIRST in each pair: it is the shorter, scarcer draw and
# the pair's calm signal is freshest at its start. Replication comes from
# many cells, not passes-within-cell; every pass still records its own
# /proc/stat steal delta so selection keeps only counter-clean draws.
# Usage: tools/calm_harvest_r5c.sh [nRows] [workDir] [out.jsonl]
cd "$(dirname "$0")/.."
N=${1:-6400000}
WORK=${2:-/dev/shm/graft-c6400k}
OUT=${3:-/tmp/cbruns5/calm_r5c.jsonl}
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
  if [ -e "$PAUSE" ]; then echo "[calm-r5c] paused $(date +%T)"; sleep 30; continue; fi
  S=$(steal_probe)
  echo "[calm-r5c] steal=$S j/30s cores=$CORES n=$N cells=$done_cells $(date +%T)"
  if [ "$S" -lt "$CALM_J" ]; then
    echo "[calm-r5c] calm - W8 then W2, single measured pass each"
    cell 8; cell 2
    done_cells=$((done_cells + 1))
    tail -2 "$OUT" | grep -o '"workers":[0-9]*\|"validate_s":[0-9.]*\|"steal_j":[0-9]*' | tr '\n' ' '; echo
  fi
done
echo "[calm-r5c] done: $done_cells cell pairs at cores=$CORES n=$N"
