#!/bin/bash
# tmpfs write-concurrency probe — the round-5 root-cause microbenchmark.
#
# Measures wall time and total busy CPU (/proc/stat user+system jiffies)
# for N concurrent writers each writing 1.2 GB to tmpfs, in two modes:
#   fresh     - new files (every byte allocates a fresh tmpfs page)
#   overwrite - same files rewritten in place (pages already exist)
#
# Measured on the round-5 sandbox (idle box, 32 vCPUs, 128 GiB):
#   writers=4   fresh      wall 1.0s   busy   3.0 core-s  (0.63 core-s/GB)
#   writers=8   fresh      wall 1.0s   busy   4.9 core-s  (0.51 core-s/GB)
#   writers=16  fresh      wall 23.5s  busy 328   core-s  (17.1 core-s/GB)
#   writers=16  overwrite  wall 1.0s   busy  13   core-s  (0.68 core-s/GB)
# i.e. concurrent tmpfs PAGE ALLOCATION collapses ~33x in CPU-per-byte
# between 8 and 16 writers, while overwriting existing pages scales
# perfectly. Any Spark stage that shuffle-writes GBs at >8-way concurrency
# on this box inherits that collapse — the mechanism behind the W4/W8
# full-profile task-CPU inflation (and the "load-triggered steal storms":
# steal also surges only in the fresh-allocation runs). The engine-side
# answer is the clustered snapshot layout: the diff join stops shuffling
# payloads entirely (SnapshotStore.appendClustered).
#
# Usage: tools/membench_tmpfs.sh [writers ...]   (default: 4 8 16 16-overwrite)
set -u
D=/dev/shm/wtest-$$
mkdir -p "$D"
trap 'rm -rf "$D"' EXIT
run() { # $1 = writers, $2 = mode (fresh|overwrite)
  local NW=$1 MODE=$2 s0 s1 t0 t1
  [ "$MODE" = fresh ] && rm -f "$D"/f*
  s0=($(awk '/^cpu /{print $2+$4, $9}' /proc/stat)); t0=$(date +%s.%N)
  for i in $(seq 1 "$NW"); do
    dd if=/dev/zero of="$D/f$i" bs=1M count=1200 conv=notrunc 2>/dev/null &
  done
  wait
  t1=$(date +%s.%N); s1=($(awk '/^cpu /{print $2+$4, $9}' /proc/stat))
  awk -v a="$t0" -v b="$t1" -v bj="$(( ${s1[0]} - ${s0[0]} ))" \
      -v sj="$(( ${s1[1]} - ${s0[1]} ))" -v nw="$NW" -v m="$MODE" 'BEGIN{
    gb = nw * 1.2
    printf "writers=%-3d mode=%-9s wall=%5.1fs busy=%7.1f core-s steal=%5.1f core-s  (%.2f core-s/GB)\n",
      nw, m, b-a, bj/100.0, sj/100.0, bj/100.0/gb }'
  sleep 4
}
if [ $# -gt 0 ]; then for w in "$@"; do run "$w" fresh; done
else
  run 4 fresh; run 8 fresh; run 16 fresh
  run 16 fresh  # leaves files in place for the overwrite case
  run 16 overwrite
fi
