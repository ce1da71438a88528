#!/usr/bin/env python3
"""check.py clone with a query-subset arg and per-query timing."""
import sys, json, os, time

# In-repo copy of the round-3 per-query oracle checker: same compare
# logic as check.py but takes an optional comma-separated query subset
# (arg 3) and prints per-query wall time - the full sf0.1 sweep is
# ~75 min (quadratic d4/d6 oracles); this lets you iterate on one
# query in seconds.
import duckdb
sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name in sorted(oracle):
    if only and name not in only: continue
    d = os.path.join(out_dir, name)
    t0 = time.time()
    got = con.sql(f"SELECT * FROM read_parquet('{d}/*.parquet')").df()
    got = got[sorted(got.columns)]
    exp = con.sql(oracle[name]).df()
    exp = exp[sorted(exp.columns)]
    status = []
    if list(got.columns) != list(exp.columns):
        status.append(f"SCHEMA got={list(got.columns)} exp={list(exp.columns)}")
    elif len(got) != len(exp):
        status.append(f"ROWS got={len(got)} exp={len(exp)}")
    else:
        g = got.sort_values(by=list(got.columns)).reset_index(drop=True).astype(str)
        e = exp.sort_values(by=list(exp.columns)).reset_index(drop=True).astype(str)
        if not g.equals(e):
            neq = (g != e).any(axis=1)
            status.append(f"VALUES mismatch rows={neq.sum()}")
            print(g[neq].head(3)); print(e[neq].head(3))
    print(f"{name}: {'FAIL ' + ';'.join(status) if status else 'OK'} ({time.time()-t0:.1f}s)", flush=True)
    if status: fails += 1
print("FAILS:", fails)
