#!/usr/bin/env python3
"""Bit-exact oracle compare — stricter than compare.py.

compare.py uses Python == which hides exactly the differences a
bytewise hash (the driver's) can see: int64 vs float64 dtype drift
(DuckDB SUM(BIGINT) -> HUGEINT -> float64), -0.0 vs 0.0, NaN
payloads. This tool compares pandas dtypes and raw bit patterns after
sorting rows by all columns.
"""
import json
import math
import struct
import sys

import duckdb

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")


import numbers


def bits(v):
    """Canonical bit-level key for a scalar.

    Floats compare by IEEE bits (catches -0.0 vs 0.0); integers of any
    width compare by value (the driver's hash stringifies, so int32 5
    == int64 5 but int 5 != float 5.0); everything else by type+str.
    """
    if isinstance(v, float):
        return ("f", struct.pack("<d", v))
    if isinstance(v, numbers.Integral) and not isinstance(v, bool):
        return ("i", int(v))
    return ("v", str(type(v).__name__), str(v))


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
        # int-vs-float dtype drift is exactly what the driver's
        # stringify-hash catches ("123" vs "123.0"); int-width drift
        # (int32 vs int64) it does not — compare value-level via
        # bits() below, flagging only kind mismatches here.
        for c in got.columns:
            gk, ek = got[c].dtype.kind, exp[c].dtype.kind
            if (gk in "iu") != (ek in "iu") or (gk == "f") != (ek == "f"):
                status.append(
                    f"col {c}: dtype {got[c].dtype} != {exp[c].dtype}")
        if not status:
            g = got.sort_values(by=list(got.columns)).reset_index(drop=True)
            e = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
            for c in got.columns:
                bad = [(i, a, b)
                       for i, (a, b) in enumerate(zip(list(g[c]),
                                                      list(e[c])))
                       if bits(a) != bits(b)
                       and not (isinstance(a, float) and math.isnan(a)
                                and isinstance(b, float)
                                and math.isnan(b))]
                if bad:
                    i, a, b = bad[0]
                    status.append(
                        f"col {c}: {len(bad)} bit-mismatches, first "
                        f"row {i}: {a!r} vs {b!r}")
    if status:
        fails += 1
        print(f"FAIL {name}: {'; '.join(status)}")
    else:
        print(f"ok   {name} ({len(got)} rows)")
print(f"{'PASS' if fails == 0 else 'FAIL'}: "
      f"{len(oracle) - fails}/{len(oracle)} matched")
sys.exit(1 if fails else 0)
