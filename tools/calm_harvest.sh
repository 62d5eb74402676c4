#!/bin/bash
# Opportunistic scaling-cell harvester: waits for hypervisor-steal calm
# (storms on this box reach 100+ stolen core-s per pass and invalidate any
# wall-time cell), then runs ONE interleaved W2/W8 full-decode pair at the
# given corpus size. Repeats until killed. Appends to $OUT.
cd "$(dirname "$0")/.."
N=${1:-1600000}
WORK=${2:-/dev/shm/graft-c1600k}
OUT=${3:-/tmp/cbruns4/calm_cells.jsonl}
JAR=target/scala-2.13/sourcesystemdatacheckerspark_2.13-0.1.0.jar
AO=$(sed -n 's/^ADD_OPENS="\(.*\)"/\1/p' tools/qrun.sh)
steal_per_min() {
  local a b
  a=$(awk '/^cpu /{print $9}' /proc/stat); sleep 60
  b=$(awk '/^cpu /{print $9}' /proc/stat); echo $((b - a))
}
cell() {
  SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 SPARK_LOCAL_DIRS=/dev/shm/spark-local \
  SPARK_GRAFT_PASSES=2 SPARK_GRAFT_PARTS=32 \
  SPARK_GRAFT_EXEC_OPTS='-XX:ActiveProcessorCount=1 -XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=256m' \
  java $AO -Xmx8g -XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=512m \
    -Dspark.ui.enabled=false -cp "$JAR:/opt/spark/jars/*" \
    graft.ClusterBench "$1" "$N" "$WORK" full 3072 2>/dev/null \
    | grep -oE '\{"workers".*\}' >> "$OUT"
}
while true; do
  S=$(steal_per_min)
  echo "[calm-harvest] steal=$S j/min $(date +%T)"
  if [ "$S" -lt 200 ]; then
    echo "[calm-harvest] calm - running W2/W8 pair"
    cell 2; cell 8
    tail -2 "$OUT" | grep -o '"workers":[0-9]*\|"validate_s":[0-9.]*\|"steal_j":[0-9]*' | tr '\n' ' '; echo
  fi
done
