#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run after graft.Verify.
Compares each query's parquet output against its DuckDB oracle (columns
sorted by name, values compared row-by-row after sorting)."""
import sys, json, glob
import duckdb, pandas as pd

out = sys.argv[1] if len(sys.argv) > 1 else '/tmp/verify-out'
sf = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.01'
con = duckdb.connect()
for tbl in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf}/{tbl}.parquet')")
oracle = json.load(open(f'{out}/oracle_sql.json'))
ok = fail = 0
for name in sorted(glob.glob(f'{out}/q*')):
    q = name.split('/')[-1]
    try:
        got = pd.concat([pd.read_parquet(f) for f in glob.glob(f'{name}/*.parquet')])
    except Exception as e:
        print(f'{q}: NO OUTPUT ({e})'); fail += 1; continue
    if q not in oracle:
        print(f'{q}: rows-only ({len(got)} rows)'); ok += 1; continue
    try:
        exp = con.execute(oracle[q]).fetchdf()
    except Exception as e:
        print(f'{q}: ORACLE SQL ERROR: {e}'); fail += 1; continue
    g = got.reindex(sorted(got.columns), axis=1)
    e = exp.reindex(sorted(exp.columns), axis=1)
    if list(g.columns) != list(e.columns):
        print(f'{q}: SCHEMA MISMATCH spark={list(g.columns)} duckdb={list(e.columns)}'); fail += 1; continue
    g = g.sort_values(by=list(g.columns)).reset_index(drop=True)
    e = e.sort_values(by=list(e.columns)).reset_index(drop=True)
    if len(g) != len(e):
        print(f'{q}: ROWCOUNT MISMATCH spark={len(g)} duckdb={len(e)}'); fail += 1; continue
    g2 = g.astype(str); e2 = e.astype(str)
    if not g2.equals(e2):
        diff = (g2 != e2).any(axis=1)
        print(f'{q}: VALUE MISMATCH ({diff.sum()} rows differ); first:')
        for i in diff[diff].index[:3]:
            print('   spark :', dict(g2.loc[i]))
            print('   duckdb:', dict(e2.loc[i]))
        fail += 1; continue
    print(f'{q}: OK ({len(g)} rows)'); ok += 1
print(f'== {ok} ok, {fail} fail')
sys.exit(1 if fail else 0)
