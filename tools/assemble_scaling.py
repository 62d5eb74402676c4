#!/usr/bin/env python3
"""Assemble BENCH/BASELINE.md from scaling cell measurements.

Usage: assemble_scaling.py <nRows> <cells.jsonl> [reps-note]

Each line of cells.jsonl is one ScalingBench emission:
  {"cpus":2,"n":...,"profile":"full","cold_s":...,"validate_s":...,...}
Labels are read from the JSON itself, never from run order. Efficiency =
T_N / (4 x T_4N) over the per-cell MIN of steady-state times.
"""
import json, sys, pathlib, collections

n = int(sys.argv[1])
src = sys.argv[2]
cells = collections.defaultdict(list)
for line in open(src):
    line = line.strip()
    if not line or '"prep"' in line:
        continue
    r = json.loads(line)
    cells[(r['profile'], r['cpus'])].append(r['validate_s'])
for k, v in sorted(cells.items()):
    print(f'[scaling] cell {k}: {sorted(v)}')
reps = min(len(v) for v in cells.values()) if cells else 0
p = pathlib.Path(__file__).resolve().parent.parent / "BENCH"
p.mkdir(exist_ok=True)
rows = []
for profile in ('full', 'fast'):
    if (profile, 2) not in cells or (profile, 8) not in cells:
        continue
    t2 = min(cells[(profile, 2)]); t8 = min(cells[(profile, 8)])
    eff = t2 / (4.0 * t8)
    rows.append((profile, 2, t2, n / t2, 'baseline'))
    rows.append((profile, 8, t8, n / t8, f'{eff:.2f}'))
    print(f'[scaling] {profile}: T2={t2:.1f}s T8={t8:.1f}s efficiency={eff:.2f}')
header = f"""# BENCH/BASELINE.md — measured scaling evidence

Same validation job (standard rule pack, snapshot-pinned clips corpus,
{n:,} rows) at two parallelism levels on identical input; local[2] and
local[8] stand in for N and 4N executors in this sandbox. Methodology:

- corpus and outputs on /dev/shm — this VM's virtio disk serves cold reads
  so slowly (~5x wall inflation measured) that a disk corpus measures the
  disk, not the engine, and biases whichever cell runs first;
- one fresh JVM per measurement, run detached from any supervised shell
  (foreground supervision skews wall time up to 3x, measured);
- shuffle partitioning FIXED (32) across cells, as a real cluster keeps its
  partitioning when executors are added: both cells execute the identical
  physical plan, only the executor-slot count differs;
- steady-state wall time (second full engine run in the JVM, fresh output
  store) — the regime a long-running cluster job sits in; cold first-run
  times (JIT/classloading included) are in the raw cells file;
- cells interleaved across {reps} repetitions, per-cell MIN taken (the
  shared VM host shows sporadic multi-x co-tenancy stalls);
- profile labels read from each run's emitted JSON, never from run order.

Profiles: `full` = full-decode verify (every matched row decodes + SNR
-compares — the per-row invariant evaluated literally; CPU-weighted).
`fast` = hash-first diff (default; ships 128-bit payload hashes through the
wide join and decodes only hash-mismatched suspects — bandwidth-weighted,
highest absolute throughput).

Efficiency = T_N / (4 x T_4N), target >= 0.8 (BASELINE.json north rule).

| profile | parallelism | rows | wall time (s) | throughput (clips/s) | efficiency |
|---|---|---|---|---|---|
"""
text = header
for prof, c, t, thr, eff in rows:
    text += f'| {prof} | local[{c}] | {n:,} | {t:.1f} | {thr:,.0f} | {eff} |\n'
(p / "BASELINE.md").write_text(text)
print(f'[scaling] wrote {p / "BASELINE.md"}')
