"""Wave-7 catalog entries vs DuckDB oracle (sf0.001)."""

from __future__ import annotations

import duckdb
import pytest

from opengauss_tools_datachecker_performance_spark.entry_queries import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", ["ann_ivf"])
def test_wave7_matches_oracle(spark, duck, name):
    got = {tuple(map(str, r)) for r in QUERIES[name](spark, SF_DIR).collect()}
    want = {tuple(map(str, r)) for r in duck.execute(ORACLES[name]).fetchall()}
    assert got == want and len(got) > 0
