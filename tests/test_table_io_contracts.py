"""Contracts for the table-IO seams the sandbox can't fully exercise:

* the Iceberg scheme (``iceberg:db.tbl[@snapshot]``) — a real-catalog
  end-to-end that runs whenever the Iceberg Spark runtime jar is on
  the classpath, and is SKIPPED (not silently passed) without it
* the CSV slice-dir handoff protocol (rename-to-.check = consumed,
  reference FileUtils.java:194-203)
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _iceberg_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def test_iceberg_ref_parsing():
    from opengauss_tools_datachecker_performance_spark.sources.table_io import (
        is_iceberg_ref,
        parse_iceberg_ref,
    )

    assert is_iceberg_ref("iceberg:db.tbl") and not is_iceberg_ref("/tmp/x")
    assert parse_iceberg_ref("iceberg:db.tbl") == ("db.tbl", None)
    assert parse_iceberg_ref("iceberg:db.tbl@42") == ("db.tbl", 42)


def test_iceberg_real_roundtrip(spark, tmp_path):
    """Real-catalog e2e: write docs as an Iceberg table, read the
    current snapshot, time-travel to it after an overwrite.  Pins the
    load_table/write_table/current_snapshot_id contract; requires the
    iceberg-spark-runtime jar (skipped in jar-less sandboxes — the
    point is that the test EXISTS and runs green wherever a user has
    Iceberg, the deployment target of the north rule)."""
    if not _iceberg_available(spark):
        pytest.skip("iceberg-spark-runtime jar not on classpath")
    from opengauss_tools_datachecker_performance_spark.sources.table_io import (
        current_snapshot_id,
        load_table,
        write_table,
    )

    spark.conf.set(
        "spark.sql.catalog.graft_test", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.graft_test.type", "hadoop")
    spark.conf.set(
        "spark.sql.catalog.graft_test.warehouse", str(tmp_path / "wh")
    )
    ref = "iceberg:graft_test.db.docs"
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    write_table(df, ref)
    assert load_table(spark, ref).count() == 2
    snap = current_snapshot_id(spark, ref)
    assert snap is not None
    write_table(df.withColumn("v", F.lit("mut")), ref)
    pinned = load_table(spark, f"{ref}@{snap}")
    assert {r.v for r in pinned.collect()} == {"a", "b"}


def test_csv_consumed_rename_protocol(spark, tmp_path):
    from opengauss_tools_datachecker_performance_spark.sources.csv_source import (
        list_unconsumed_csv,
        mark_csv_consumed,
    )

    d = str(tmp_path)
    for name in ("t_slice_0.csv", "t_slice_1.csv"):
        with open(os.path.join(d, name), "w") as f:
            f.write("a,b\n1,2\n")
    assert list_unconsumed_csv(spark, d) == ["t_slice_0.csv", "t_slice_1.csv"]
    assert mark_csv_consumed(spark, d, "t_slice_0.csv") is True
    # consumed file carries the reference's .check suffix; listing
    # now shows only the pending slice (the restart re-dispatch set)
    assert os.path.exists(os.path.join(d, "t_slice_0.csv.check"))
    assert list_unconsumed_csv(spark, d) == ["t_slice_1.csv"]
    # idempotent: renaming again (or a missing file) returns False
    assert mark_csv_consumed(spark, d, "t_slice_0.csv") is False
    assert mark_csv_consumed(spark, d, "nope.csv") is False
    # missing dir -> empty, not an error
    assert list_unconsumed_csv(spark, d + "/missing") == []
