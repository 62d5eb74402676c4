#!/bin/bash
# Scaling-efficiency evidence (north rule, two-cluster-size criterion):
# same job, same input, local[2] vs local[8] (= N and 4N), one JVM per
# measurement, min of REPS runs per cell, both engine profiles.
# MUST run detached from the interactive sandbox shell (see ScalingBench).
set -e
cd "$(dirname "$0")/.."
N=${1:-800000}
WORK=${2:-/tmp/graft-scaling8}
REPS=${REPS:-1}
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-16g}
OUT=/tmp/scaling_cells.jsonl
: > $OUT

run() { sbt -batch "runMain graft.ScalingBench $1 $N $WORK $2" 2>&1 | grep -oE '\{"(cpus|prep)".*\}' | tail -1; }

echo "[scaling] prep corpus n=$N"
run prep x
for profile in full fast; do
  for c in 2 8; do
    for r in $(seq $REPS); do
      R=$(run $c $profile); echo "$R" | tee -a $OUT
    done
  done
done

python3 - "$N" <<'EOF'
import json, sys, pathlib, collections
n = int(sys.argv[1])
cells = collections.defaultdict(list)
for line in open('/tmp/scaling_cells.jsonl'):
    r = json.loads(line)
    cells[(r['profile'], r['cpus'])].append(r['validate_s'])
p = pathlib.Path("BENCH"); p.mkdir(exist_ok=True)
f = p / "BASELINE.md"
rows = []
for profile in ('full', 'fast'):
    t2 = min(cells[(profile, 2)]); t8 = min(cells[(profile, 8)])
    eff = t2 / (4.0 * t8)
    rows.append((profile, 2, t2, n/t2, 'baseline'))
    rows.append((profile, 8, t8, n/t8, f'{eff:.2f}'))
    print(f'[scaling] {profile}: T2={t2:.1f}s T8={t8:.1f}s efficiency={eff:.2f}')
header = """# BENCH/BASELINE.md — measured scaling evidence

Same validation job (standard rule pack, snapshot-pinned clips corpus) at two
parallelism levels on identical input (local[2] and local[8] stand in for N
and 4N executors in this sandbox; one JVM per measurement; min of repeated
runs — the shared VM host shows sporadic stalls). Efficiency =
T_N / (4 x T_4N), target >= 0.8 (BASELINE.json north rule).

Profiles: `full` = full-decode verify (every matched row decodes + SNR —
CPU-weighted, the per-row invariant evaluated literally; this is the
thread-scaling evidence, since the `fast` hash-first path is
memory-bandwidth-bound and a single box cannot scale DRAM bandwidth with
thread count — a real 4N-executor cluster brings 4N nodes' bandwidth).
`fast` = hash-first diff (default; highest absolute throughput).

| profile | parallelism | rows | wall time (s) | throughput (clips/s) | efficiency |
|---|---|---|---|---|---|
"""
text = header
for prof, c, t, thr, eff in rows:
    text += f'| {prof} | local[{c}] | {n:,} | {t:.1f} | {thr:,.0f} | {eff} |\n'
f.write_text(text)
print(f'[scaling] wrote {f}')
EOF
