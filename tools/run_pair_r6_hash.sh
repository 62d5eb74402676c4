#!/bin/bash
# Round-6: the VERDICT r5 "next round #3" cell — the DEFAULT (hash-first)
# engine profile's 1v4 scaling pair at 19.2M rows, same 4-core-executor
# candle protocol as calm_harvest_r5e.sh pair B (W4 first, then W1; every
# pass records its own /proc/stat steal delta + pre/post standard-candle).
# The hash-first path is bandwidth-bound, so this is the honest stress case
# for the single-box 4N analog (the r5 headline ran the compute-weighted
# full-decode profile).
# Usage: tools/run_pair_r6_hash.sh [out.jsonl] [nRows] [workDir] [passes]
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/cbruns6/r6hash_1v4.jsonl}
N=${2:-19200000}
WORK=${3:-/dev/shm/graft-c19200k}
PASSES=${4:-3}
CORES=${CORES:-4}
MEM=${MEM:-6144}
WARMUP=${WARMUP:-/dev/shm/graft-c100k}
mkdir -p "$(dirname "$OUT")"
JAR=target/scala-2.13/sourcesystemdatacheckerspark_2.13-0.1.0.jar
AO=$(sed -n 's/^ADD_OPENS="\(.*\)"/\1/p' tools/qrun.sh)
cell() {
  SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 SPARK_LOCAL_DIRS=/dev/shm/spark-local \
  SPARK_GRAFT_WARMUP_DIR="$WARMUP" SPARK_GRAFT_STAGEDUMP=1 \
  SPARK_GRAFT_ABORT_STEAL_J=${ABORT_J:-400} \
  SPARK_GRAFT_PASSES=$PASSES SPARK_GRAFT_PARTS=32 SPARK_GRAFT_EXEC_CORES=$CORES \
  SPARK_GRAFT_SETTLE_S=${SETTLE:-15} \
  SPARK_GRAFT_EXEC_OPTS="-XX:ActiveProcessorCount=$CORES -Xms${MEM}m -XX:+AlwaysPreTouch -XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=256m" \
  java $AO -Xmx8g -XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=512m \
    -Dspark.ui.enabled=false -cp "$JAR:/opt/spark/jars/*" \
    graft.ClusterBench "$1" "$N" "$WORK" hash "$MEM" 2>>"$OUT.err" \
    | grep -oE '\{"workers".*\}' | sed "s/^{/{\"cores\":$CORES,\"profile\":\"hash\",/" >> "$OUT"
  local rc=${PIPESTATUS[0]}
  rm -rf "$WORK"/out-* /dev/shm/spark-local/* 2>/dev/null
  return "$rc"
}
if cell 4; then
  cell 1
else
  echo "[pair-r6-hash] W4 warmup hit the steal gate — pair aborted" >&2
  exit 3
fi
tail -2 "$OUT" | grep -o '"workers":[0-9]*\|"validate_s":[0-9.]*\|"steal_j":[0-9]*\|"aborted":"[a-z_]*"\|"candle_[a-z]*_s":[0-9.]*' | tr '\n' ' '; echo
