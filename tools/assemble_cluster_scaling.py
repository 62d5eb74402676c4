#!/usr/bin/env python3
"""Summarize local-cluster scaling cells (tools/run_cluster_scaling.sh).

Usage: assemble_cluster_scaling.py <nRows> <cells.jsonl>

Each line is one ClusterBench emission:
  {"workers":2,"n":...,"profile":"full","cold_s":...,"validate_s":...,
   "passes":[...],"pass_stats":[{"t":..,"steal_j":..,...},...],...}
Labels are read from the JSON itself, never from run order.

Reports per-cell spreads with MIN and MEDIAN (the r3 verdict's ask: a
single fast draw must not carry the headline), efficiency on both
statistics, and per-pass host-stall attribution: a slow pass with a large
steal/iowait delta is external co-tenancy; one without is the app's.
"""
import json, sys, collections, statistics

n = int(sys.argv[1])
cells = collections.defaultdict(list)
for line in open(sys.argv[2]):
    line = line.strip()
    if not line or '"prep"' in line:
        continue
    r = json.loads(line)
    if r.get('n') != n:
        continue
    cells[(r['profile'], r['workers'])].append(r)

for k, v in sorted(cells.items()):
    steadies = sorted(x['validate_s'] for x in v)
    colds = sorted(x['cold_s'] for x in v)
    print(f'[cluster] n={n} cell {k}: steady={steadies} cold={colds}')
    for cell in v:
        for i, ps in enumerate(cell.get('pass_stats', [])):
            # normalize jiffies to core-seconds (100 Hz per CPU)
            t = ps['t']
            steal = ps.get('steal_j', -1) / 100.0
            iow = ps.get('iowait_j', -1) / 100.0
            busy = ps.get('busy_j', -1) / 100.0
            print(f'  [pass] w={cell["workers"]} p{i + 1} t={t:7.1f}s '
                  f'steal={steal:6.1f}cs iowait={iow:6.1f}cs busy={busy:8.1f}cs '
                  f'load {ps.get("load0", "?")}->{ps.get("load1", "?")}')

for profile in ('full', 'fast'):
    if (profile, 2) not in cells or (profile, 8) not in cells:
        continue
    s2 = sorted(x['validate_s'] for x in cells[(profile, 2)])
    s8 = sorted(x['validate_s'] for x in cells[(profile, 8)])
    for stat, f in (('min', min), ('median', statistics.median)):
        t2, t8 = f(s2), f(s8)
        eff = t2 / (4.0 * t8)
        print(f'[cluster] n={n} {profile} {stat}: T2={t2:.1f}s ({n / t2:,.0f} clips/s)  '
              f'T8={t8:.1f}s ({n / t8:,.0f} clips/s)  efficiency={eff:.2f}  '
              f'(reps: {len(s2)}x{len(s8)})')
