#!/bin/bash
# Scaling-efficiency evidence (north rule, two-cluster-size criterion):
# same job, same input, local[2] vs local[8] (= N and 4N), one JVM per
# measurement, min of REPS runs per cell, both engine profiles, cells
# INTERLEAVED (each rep visits every cell) so host co-tenancy noise spreads
# evenly instead of biasing one cell.
#
# MUST run detached from any interactive/supervised shell (tmux/nohup):
# foreground supervision was measured to skew wall times up to 3x.
#
# Invokes the packaged jar directly (no sbt in the measurement loop):
#   sbt -batch package   # before running this script
set -e
cd "$(dirname "$0")/.."
N=${1:-800000}
# corpus + outputs on /dev/shm: this VM's virtio disk serves cold reads so
# slowly that a disk corpus measures the disk, not the engine (see
# ScalingBench methodology notes)
WORK=${2:-/dev/shm/graft-scaling}
REPS=${REPS:-3}
DRIVER_MEM=${SPARK_DRIVER_MEM:-24g}
OUT=${SCALING_OUT:-/tmp/scaling_cells.jsonl}
JAR=target/scala-2.13/sourcesystemdatacheckerspark_2.13-0.1.0.jar
CP="$JAR:/opt/spark/jars/*"   # scala-library ships with the Spark jars

ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

run() { # run <mode> <profile>
  # JVM runtime (GC/JIT threads) left at host defaults for BOTH cells —
  # on a real cluster each executor node brings its own full runtime
  # either way, so pinning would not make the comparison fairer, and the
  # same defaults apply to N and 4N alike.
  java $ADD_OPENS -Xmx$DRIVER_MEM \
    -XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=512m \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$CP" graft.ScalingBench "$1" "$N" "$WORK" "$2" 2>/dev/null \
    | grep -oE '\{"(cpus|prep)".*\}' | tail -1
}

: > "$OUT"
echo "[scaling] prep corpus n=$N"
run prep x
for r in $(seq "$REPS"); do
  for profile in full fast; do
    for c in 2 8; do
      R=$(run "$c" "$profile")
      echo "$R" | tee -a "$OUT"
    done
  done
done

python3 tools/assemble_scaling.py "$N" "$OUT"
