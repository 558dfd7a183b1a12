#!/usr/bin/env python3
"""Generate a BENCH-ONLY scaled dataset by replicating a source SF
directory N times with disjoint key offsets (referential integrity
preserved). Usage:

    python3 tools/gen_sf.py /root/testdata/sf0.1 localdata/sf1 10

Correctness/oracle runs stay on the driver-generated /root/testdata
directories; this exists only to drill the bench at the next scale
factor (VERDICT r2, item 9). Offsets keep documents.doc_id below the
1e6 near-dup plant offset so the dedup queries keep their semantics.
events.ts is re-written as TIMESTAMP_NS to preserve the
nanosAsLong read path the loader expects.
"""
import os
import sys

import duckdb


def main(src, dst, factor):
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    copies = range(int(factor))

    def gen(table, select):
        parts = " UNION ALL ".join(
            select.format(i=i) + f" FROM '{src}/{table}.parquet'"
            for i in copies)
        con.execute(
            f"COPY ({parts}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"  {table}: {n} rows")

    # dimensions stay single-copy
    for t in ("region", "nation"):
        con.execute(f"COPY (SELECT * FROM '{src}/{t}.parquet')"
                    f" TO '{dst}/{t}.parquet' (FORMAT PARQUET)")
        print(f"  {t}: copied")

    gen("customer",
        "SELECT c_custkey + {i}*1000000 AS c_custkey, c_name,"
        " c_nationkey, c_acctbal, c_mktsegment")
    gen("supplier",
        "SELECT s_suppkey + {i}*100000 AS s_suppkey, s_name,"
        " s_nationkey, s_acctbal")
    gen("part",
        "SELECT p_partkey + {i}*1000000 AS p_partkey, p_name, p_brand,"
        " p_type, p_size, p_retailprice")
    gen("orders",
        "SELECT o_orderkey + {i}*10000000 AS o_orderkey,"
        " o_custkey + {i}*1000000 AS o_custkey, o_orderstatus,"
        " o_totalprice, o_orderdate, o_orderpriority")
    gen("lineitem",
        "SELECT l_orderkey + {i}*10000000 AS l_orderkey,"
        " l_partkey + {i}*1000000 AS l_partkey,"
        " l_suppkey + {i}*100000 AS l_suppkey, l_linenumber, l_quantity,"
        " l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,"
        " l_shipdate")
    gen("events",
        "SELECT event_id + {i}*10000000 AS event_id,"
        " CAST(ts AS TIMESTAMP_NS) AS ts,"
        " user_id + {i}*1000000 AS user_id, event_type, value, props")
    # doc_id must stay below the 1e6 near-dup plant offset for EVERY
    # copy, so the per-copy step shrinks with the factor (factor 10 →
    # 100000, identical to the original sf1 generation; factor 100 →
    # 10000). Guarded so a too-large source can't silently collide.
    doc_step = 1000000 // int(factor)
    max_doc = con.execute(
        f"SELECT max(doc_id) FROM '{src}/documents.parquet'").fetchone()[0]
    assert max_doc < doc_step, (
        f"source doc_id {max_doc} >= step {doc_step}: ids would cross"
        " the 1e6 plant boundary")
    gen("documents",
        "SELECT doc_id + {i}*" + str(doc_step) + " AS doc_id, text,"
        " lang, source, n_chars")
    max_vec = con.execute(
        f"SELECT max(vec_id) FROM '{src}/embeddings.parquet'").fetchone()[0]
    assert max_vec < 100000, (
        f"source vec_id {max_vec} >= step 100000: replica ids would collide")
    gen("embeddings",
        "SELECT vec_id + {i}*100000 AS vec_id, embedding, label")
    print(f"OK: {dst} (factor {factor})")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
