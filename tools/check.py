#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output vs DuckDB.
Usage: check.py <sfDir> <verifyOutDir> [query ...]"""
import sys, json, glob, duckdb, pandas as pd

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
oracle = json.load(open(f"{out}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only: continue
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    try:
        got = pd.read_parquet(f"{out}/{name}")
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}"); fail += 1; continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: cols spark={list(got.columns)} duck={list(exp.columns)}"); fail += 1; continue
    gs = got.sort_values(by=list(got.columns), ignore_index=True).astype(str)
    es = exp.sort_values(by=list(exp.columns), ignore_index=True).astype(str)
    if len(gs) != len(es):
        print(f"FAIL {name}: rows spark={len(gs)} duck={len(es)}"); fail += 1; continue
    if gs.equals(es):
        print(f"ok   {name} ({len(gs)} rows)"); ok += 1
    else:
        diff = (gs != es).any(axis=1)
        print(f"FAIL {name}: {diff.sum()}/{len(gs)} rows differ; first:")
        i = diff.idxmax()
        print("  spark:", gs.iloc[i].to_dict())
        print("  duck :", es.iloc[i].to_dict())
        fail += 1
print(f"== {ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
