"""Wave-8 catalog entries vs DuckDB oracle (sf0.001) + operator unit
checks for the composite-PK batch builder and the salted-agg path."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from opengauss_tools_datachecker_performance_spark.entry_queries import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{SF_DIR}/lineitem.parquet'"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", ["repair_dml_composite", "skew_salted_agg"])
def test_wave8_matches_oracle(spark, duck, name):
    got = {tuple(map(str, r)) for r in QUERIES[name](spark, SF_DIR).collect()}
    want = {tuple(map(str, r)) for r in duck.execute(ORACLES[name]).fetchall()}
    assert got == want and len(got) > 0


def test_composite_batches_respect_cap_and_tuple_form(spark):
    rows = QUERIES["repair_dml_composite"](spark, SF_DIR).collect()
    assert rows, "expected at least one batch"
    for r in rows:
        assert r.n_keys <= 25
        assert r.sql.startswith(
            "DELETE FROM lineitem WHERE (l_orderkey, l_linenumber) IN (("
        )
        assert r.sql.rstrip().endswith("));")
        # one tuple per key
        assert r.sql.count("(") - 2 == r.n_keys  # WHERE-( + IN-( + n tuples


def test_salted_agg_equals_plain_groupby(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    plain = {
        (r.l_returnflag, r.n_rows, str(r.sum_qty))
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)"))
            .cast("decimal(20,2)")
            .alias("sum_qty"),
        )
        .collect()
    }
    salted = {
        (r.l_returnflag, r.n_rows, str(r.sum_qty))
        for r in QUERIES["skew_salted_agg"](spark, SF_DIR).collect()
    }
    assert salted == plain
