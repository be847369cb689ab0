#!/usr/bin/env python
"""Compare Spark vs DuckDB raw Python types+values cell-by-cell.

Finds type-level mismatches (Decimal vs float, int vs Decimal) that a
str()-normalized comparison hides but a driver-side exact value hash
would catch.
"""
from __future__ import annotations
import sys
sys.path.insert(0, ".")
import duckdb
import __spark_entry__ as entry_mod
from opengauss_tools_datachecker_performance_spark import get_spark

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="typediff", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    for name, fn in queries.items():
        if only and name not in only:
            continue
        if name not in oracles:
            print(f"{name}: NO ORACLE"); continue
        sdf = fn(spark, sf_dir)
        s_cols = sdf.columns
        s_rows = [tuple(r) for r in sdf.collect()]
        res = con.execute(oracles[name])
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
        so = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
        do = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
        s_sorted = sorted([tuple(r[i] for i in so) for r in s_rows], key=lambda t: tuple(str(x) for x in t))
        d_sorted = sorted([tuple(r[i] for i in do) for r in d_rows], key=lambda t: tuple(str(x) for x in t))
        cols_sorted = sorted(s_cols)
        mismatches = {}
        for sr, dr in zip(s_sorted, d_sorted):
            for ci, (a, b) in enumerate(zip(sr, dr)):
                key = cols_sorted[ci]
                if key in mismatches: continue
                if type(a) is not type(b) or a != b or repr(a) != repr(b):
                    mismatches[key] = (type(a).__name__, repr(a), type(b).__name__, repr(b))
        if mismatches:
            print(f"{name}:")
            for col, (ta, ra, tb, rb) in mismatches.items():
                print(f"  {col}: spark {ta} {ra[:60]}  vs duck {tb} {rb[:60]}")
        else:
            print(f"{name}: IDENTICAL types+values")
    spark.stop()

if __name__ == "__main__":
    main()
