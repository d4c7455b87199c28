#!/usr/bin/env python3
"""Per-key oracle check with timing: like check.py but one key at a time
with wall-clock per key and incremental output — for the long sf10
full-inventory verify where a single monolithic run would hide progress
and one pathological oracle would stall the rest.
Usage: check_each.py <sfDir> <verifyOutDir> [--skip k1,k2] [query ...]"""
import os, sys, json, glob, time, duckdb, pandas as pd

sf, out = sys.argv[1], sys.argv[2]
args = sys.argv[3:]
skip = set()
if args and args[0] == "--skip":
    skip = set(args[1].split(","))
    args = args[2:]
only = set(args)
oracle = json.load(open(f"{out}/oracle_sql.json"))
ok = fail = skipped = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only: continue
    if name in skip:
        print(f"skip {name} (documented exception)", flush=True)
        skipped += 1
        continue
    t0 = time.time()
    # files check BEFORE duckdb.connect(): the early-continue path must
    # not leak one open connection per missing key over a long run
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output", flush=True); fail += 1; continue
    con = duckdb.connect()
    # cap DuckDB's footprint and let it SPILL instead of OOM-ing the
    # host: the sf10 q_gopher_repetition replay grew past 127 GB RSS and
    # was oom-killed with the default (80%-of-RAM) limit. Override with
    # GRAFT_DUCK_MEM; spill files go under the verify out dir.
    mem = os.environ.get("GRAFT_DUCK_MEM", "48GB")
    con.sql(f"SET memory_limit='{mem}'")
    con.sql(f"SET temp_directory='{out}/.duckdb_spill'")
    # window/list intermediates are buffered PER THREAD and not all of
    # them count against memory_limit — the 32-thread default blew past
    # a 90GB limit to 130 GB RSS on the sf10 gopher replay; fewer
    # threads bound the untracked share
    threads = os.environ.get("GRAFT_DUCK_THREADS")
    if threads:
        con.sql(f"SET threads={int(threads)}")
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    try:
        got = pd.read_parquet(f"{out}/{name}")
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}", flush=True)
        fail += 1; continue
    finally:
        con.close()
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    dt = time.time() - t0
    if list(got.columns) != list(exp.columns):
        print(f"FAIL {name}: cols spark={list(got.columns)} duck={list(exp.columns)}", flush=True)
        fail += 1; continue
    gs = got.sort_values(by=list(got.columns), ignore_index=True).astype(str)
    es = exp.sort_values(by=list(exp.columns), ignore_index=True).astype(str)
    if len(gs) != len(es):
        print(f"FAIL {name}: rows spark={len(gs)} duck={len(es)}", flush=True)
        fail += 1; continue
    if gs.equals(es):
        print(f"ok   {name} ({len(gs)} rows, {dt:.1f}s)", flush=True); ok += 1
    else:
        diff = (gs != es).any(axis=1)
        i = diff.idxmax()
        print(f"FAIL {name}: {diff.sum()}/{len(gs)} rows differ; first "
              f"spark={gs.iloc[i].to_dict()} duck={es.iloc[i].to_dict()}",
              flush=True)
        fail += 1
print(f"== {ok} ok, {fail} fail, {skipped} skipped", flush=True)
sys.exit(1 if fail else 0)
