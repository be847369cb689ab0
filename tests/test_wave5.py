"""Wave-5 operators: slice envelope (A5) + table-metadata hash (A6)."""

import duckdb
import pytest

from opengauss_tools_datachecker_performance_spark.entry_queries import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", ["minmax_envelope", "table_metadata_hash"])
def test_wave5_matches_oracle(spark, duck, name):
    got = {
        tuple(r) for r in QUERIES[name](spark, SF_DIR).collect()
    }
    want = {tuple(r) for r in duck.execute(ORACLES[name]).fetchall()}
    assert got == want


def test_metadata_hash_detects_drift(spark):
    """Dropping a column must flip the structure digest — the check's
    purpose (CheckTableStructureService.java:65-80 exclusion)."""
    from pyspark.sql import functions as F

    from opengauss_tools_datachecker_performance_spark.functions.hashing import (
        portable_hash64,
    )

    full = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    narrowed = full.drop("o_orderpriority")

    def h(df):
        joined = ",".join(sorted(f.name.lower() for f in df.schema.fields))
        return (
            spark.range(1)
            .select(portable_hash64(F.lit(joined)).alias("h"))
            .collect()[0]["h"]
        )

    assert h(full) != h(narrowed)
