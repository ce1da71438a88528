#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run Verify output
against DuckDB oracles and diff. Usage:
  python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out [only]
`only` = optional comma-separated subset of query names — lets the
long DuckDB replays (d2 minhash, s9/s11 PQ) run in chunks at sf0.1.
"""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{sf_dir}/{t}.parquet"
    if os.path.isdir(p):
        # Spark-written table: a DIRECTORY of part files (the degen
        # corpora DegenSweep writes); glob the parts for DuckDB
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
    elif os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
# Iterate the UNION of expected queries (Verify manifest), oracle keys,
# and whatever dirs exist — a query that crashed in Verify (missing
# output dir) is a FAIL, not a silent skip.
expected = set(k for k in oracle)
expected |= set(d for d in os.listdir(out_dir) if os.path.isdir(os.path.join(out_dir, d)))
mpath = f"{out_dir}/manifest.json"
manifest = json.load(open(mpath)) if os.path.exists(mpath) else {"queries": [], "failed": {}}
expected |= set(manifest["queries"])
if only is not None:
    expected &= only
fails = 0
for name in sorted(expected):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        fails += 1
        err = manifest.get("failed", {}).get(name, "no output written")
        print(f"{name}: FAIL missing output ({err})")
        continue
    got = con.sql(f"SELECT * FROM read_parquet('{d}/*.parquet')").df()
    got = got[sorted(got.columns)]
    if name not in oracle:
        print(f"{name}: rows-only check -> {len(got)} rows", "OK" if len(got) > 0 else "FAIL(empty)")
        if len(got) == 0: fails += 1
        continue
    exp = con.sql(oracle[name]).df()
    exp = exp[sorted(exp.columns)]
    status = []
    if list(got.columns) != list(exp.columns):
        status.append(f"SCHEMA got={list(got.columns)} exp={list(exp.columns)}")
    elif len(got) != len(exp):
        status.append(f"ROWS got={len(got)} exp={len(exp)}")
    else:
        import pandas as pd
        g = got.reset_index(drop=True)
        e = exp.reset_index(drop=True)
        # sort rows deterministically on all columns to be order-insensitive
        g = g.sort_values(by=list(g.columns)).reset_index(drop=True)
        e = e.sort_values(by=list(e.columns)).reset_index(drop=True)
        g = g.astype(str)
        e = e.astype(str)
        if not g.equals(e):
            neq = (g != e).any(axis=1)
            status.append(f"VALUES mismatch rows={neq.sum()}")
            print(g[neq].head(3))
            print(e[neq].head(3))
    if status:
        fails += 1
        print(f"{name}: FAIL {'; '.join(status)}")
    else:
        print(f"{name}: OK ({len(got)} rows)")
print("FAILS:", fails)
sys.exit(1 if fails else 0)
