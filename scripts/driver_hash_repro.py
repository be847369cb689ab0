#!/usr/bin/env python
"""Reproduce the DRIVER's comparison path (pandas DataFrames on both
sides, columns sorted by name, rows lex-sorted, exact cell values) for
a set of catalog entries — the local fetchall()-based harness hid a
class of mismatches (DuckDB HUGEINT/DECIMAL -> float64 in .df(),
Spark decimal -> decimal.Decimal in toPandas()) that the driver's
hasher sees.  Prints the first differing cells per entry.

Usage: python scripts/driver_hash_repro.py [--tz ZONE] [sf_dir] [query ...]

``--tz America/New_York`` pins a DIFFERENT Spark session timezone than
the local harness's UTC default — run new entries under BOTH to catch
session-TZ-dependent rendering (the driver's session TZ is not ours to
choose).  This script plus `scripts/check_correctness.py --strict` is
the pre-commit gate for every new catalog entry.
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")

import duckdb
import pandas as pd

import __spark_entry__ as entry_mod
from opengauss_tools_datachecker_performance_spark import get_spark

TZ = None
if "--tz" in sys.argv:
    i = sys.argv.index("--tz")
    TZ = sys.argv[i + 1]
    del sys.argv[i : i + 2]

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]
    extra = {"spark.sql.session.timeZone": TZ} if TZ else None
    spark = get_spark(
        app_name="driver-repro",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf=extra,
    )
    if TZ:  # runtime conf — also covers a reused getOrCreate session
        spark.conf.set("spark.sql.session.timeZone", TZ)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    for name in names or list(queries):
        if name not in oracles:
            continue
        try:
            s = _canon(queries[name](spark, sf_dir).toPandas())
            o = _canon(con.sql(oracles[name]).df())
        except Exception as e:  # the quality_filter crash class
            print(f"ERR  {name}: {type(e).__name__}: {str(e)[:160]}")
            continue
        if list(s.columns) != list(o.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(o.columns)}")
            continue
        if len(s) != len(o):
            print(f"FAIL {name}: rows {len(s)} vs {len(o)}")
            continue
        bad = 0
        for c in s.columns:
            sv, ov = s[c].tolist(), o[c].tolist()
            for i, (a, b) in enumerate(zip(sv, ov)):
                both_nan = (
                    isinstance(a, float)
                    and isinstance(b, float)
                    and a != a
                    and b != b
                )  # a NULL in a nullable int/float column reaches
                # pandas as NaN from BOTH engines — equal to the driver
                same = both_nan or (
                    (a == b)
                    and (
                        type(a) is type(b)
                        or (isinstance(a, str) and isinstance(b, str))
                    )
                )
                if not same:
                    if bad < 4:
                        print(
                            f"  {name}.{c}[{i}]: spark={a!r} ({type(a).__name__})"
                            f" vs oracle={b!r} ({type(b).__name__})"
                        )
                    bad += 1
        print(("FAIL" if bad else "PASS") + f" {name}: {bad} differing cells")
    spark.stop()


if __name__ == "__main__":
    main()
