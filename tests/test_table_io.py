"""Table IO seam: Iceberg ref grammar + parquet stand-in path."""

from __future__ import annotations

import pytest

from opengauss_tools_datachecker_performance_spark.sources.table_io import (
    is_iceberg_ref,
    load_table,
    parse_iceberg_ref,
    write_table,
)


def test_ref_grammar():
    assert is_iceberg_ref("iceberg:db.docs")
    assert not is_iceberg_ref("/data/docs.parquet")
    assert parse_iceberg_ref("iceberg:db.docs") == ("db.docs", None)
    assert parse_iceberg_ref("iceberg:db.docs@12345") == ("db.docs", 12345)


def test_parquet_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t.parquet")
    df = spark.range(10).withColumnRenamed("id", "k")
    write_table(df, path)
    assert load_table(spark, path).count() == 10


def test_iceberg_ref_requires_runtime(spark):
    """Without Iceberg jars the ref must fail loudly (not silently read
    something else) — the sandbox has no Iceberg runtime."""
    with pytest.raises(Exception):
        load_table(spark, "iceberg:db.nope").count()
