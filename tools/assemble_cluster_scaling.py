#!/usr/bin/env python3
"""Summarize local-cluster scaling cells (tools/run_cluster_scaling.sh).

Usage: assemble_cluster_scaling.py <nRows> <cells.jsonl>

Each line is one ClusterBench emission:
  {"workers":2,"n":...,"profile":"full","cold_s":...,"validate_s":...,
   "passes":[...],...}
Labels are read from the JSON itself, never from run order. Efficiency =
T_N / (4 x T_4N) over the per-cell MIN of steady-state (pass 2) times.
Prints the per-cell spreads and the efficiency lines used in
BENCH/BASELINE.md.
"""
import json, sys, collections

n = int(sys.argv[1])
cells = collections.defaultdict(list)
for line in open(sys.argv[2]):
    line = line.strip()
    if not line or '"prep"' in line:
        continue
    r = json.loads(line)
    cells[(r['profile'], r['workers'])].append((r['validate_s'], r['cold_s']))
for k, v in sorted(cells.items()):
    print(f'[cluster] cell {k}: steady={sorted(x[0] for x in v)} cold={sorted(x[1] for x in v)}')
for profile in ('full', 'fast'):
    if (profile, 2) not in cells or (profile, 8) not in cells:
        continue
    t2 = min(x[0] for x in cells[(profile, 2)])
    t8 = min(x[0] for x in cells[(profile, 8)])
    eff = t2 / (4.0 * t8)
    print(f'[cluster] {profile}: T2={t2:.1f}s ({n/t2:,.0f} clips/s)  '
          f'T8={t8:.1f}s ({n/t8:,.0f} clips/s)  efficiency={eff:.2f}')
