#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Reads each Verify output parquet + oracle_sql.json, runs the SQL in
DuckDB over the same sf tables, sorts columns by name and rows by all
columns, and compares values exactly (doubles: exact bit equality,
mirroring a hash compare).
"""
import json
import sys

import duckdb

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        got = con.execute(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')"
        ).df()
        exp = con.execute(sql).df()
    except Exception as ex:
        fails += 1
        print(f"FAIL {name}: oracle error {ex}")
        continue
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    status = []
    if list(got.columns) != list(exp.columns):
        status.append(f"cols {list(got.columns)} != {list(exp.columns)}")
    elif len(got) != len(exp):
        status.append(f"rows {len(got)} != {len(exp)}")
    else:
        g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
        e = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
        for c in got.columns:
            gv, ev = list(g[c]), list(e[c])
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(gv, ev))
                   if a != b and str(a) != str(b)]
            if bad:
                status.append(f"col {c}: {len(bad)} mismatches, "
                              f"first {bad[0]}")
    if status:
        fails += 1
        print(f"FAIL {name}: {'; '.join(status)}")
    else:
        print(f"ok   {name} ({len(got)} rows)")
print(f"{'PASS' if fails == 0 else 'FAIL'}: "
      f"{len(oracle) - fails}/{len(oracle)} matched")
sys.exit(1 if fails else 0)
