"""Round-4 review fixes (ADVICE.md r03), each pinned by a test:

* fd_violations — NULL-safe rhs tuple encoding (NULL must not collapse
  to '' nor make ('a', NULL) collide with (NULL, 'a')).
* canon_oracle_number — BigDecimal.toBigInteger() TRUNCATES toward
  zero (SimpleTypeHandlerFactory.createOracleBigDecimalHandler), never
  HALF_UP rounds.
* canon_oracle_blob — the reference's HexUtil.byteToHexTrim emits '00'
  for an all-zero array (the slow pointer always appends one byte).
* pk_gaps — bucket assignment must survive 64-bit-wide key ranges
  (snowflake-style ids) without long-multiplication overflow.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.canon import (
    canon_oracle_blob,
    canon_oracle_number,
)
from opengauss_tools_datachecker_performance_spark.checks.constraints import (
    fd_violations,
    pk_gaps,
)


def test_fd_violations_null_rhs_is_distinct(spark):
    # group 1 maps to {'x', NULL} -> 2 distinct rhs tuples (violation);
    # group 2 maps to {NULL} only -> no violation;
    # group 3 maps to {''} and {NULL} -> violation (NULL != '')
    df = spark.createDataFrame(
        [(1, "x"), (1, None), (2, None), (2, None), (3, ""), (3, None)],
        "k int, v string",
    )
    out = {r["k"]: r for r in fd_violations(df, ["k"], ["v"]).collect()}
    assert set(out) == {1, 3}
    assert out[1]["n_distinct_rhs"] == 2
    assert out[3]["n_distinct_rhs"] == 2


def test_fd_violations_multicol_null_position_matters(spark):
    # ('a', NULL) vs (NULL, 'a') must be DIFFERENT rhs tuples
    df = spark.createDataFrame(
        [(1, "a", None), (1, None, "a")], "k int, r1 string, r2 string"
    )
    out = fd_violations(df, ["k"], ["r1", "r2"]).collect()
    assert len(out) == 1 and out[0]["n_distinct_rhs"] == 2


def test_canon_oracle_number_truncates_toward_zero(spark):
    df = spark.createDataFrame(
        [(2.7,), (-2.7,), (3.0,), (-0.9,), (0.0,)], "x double"
    )
    vals = [
        r["c"]
        for r in df.select(canon_oracle_number(F.col("x")).alias("c"))
        .orderBy(F.col("x"))
        .collect()
    ]
    # ordered by x: -2.7, -0.9, 0.0, 2.7, 3.0
    assert vals == ["-2", "0", "0", "2", "3"]


def test_canon_oracle_number_truncates_decimals_exactly(spark):
    df = spark.createDataFrame([("123456789012345678.9",)], "s string").select(
        F.col("s").cast("decimal(38,1)").alias("x")
    )
    got = df.select(canon_oracle_number(F.col("x")).alias("c")).first()["c"]
    assert got == "123456789012345678"


def test_canon_oracle_blob_all_zero_is_00(spark):
    df = spark.createDataFrame(
        [(bytearray(b"\x02\xaa\x00"),), (bytearray(b"\x00\x00\x00"),),
         (bytearray(b""),)],
        "b binary",
    )
    vals = [r["c"] for r in df.select(canon_oracle_blob(F.col("b")).alias("c")).collect()]
    assert vals == ["02AA", "00", ""]


def test_pk_gaps_wide_64bit_range(spark):
    # keys spread across nearly the full long range: the old
    # (k - lo) * n_buckets long math overflowed here and scrambled
    # bucket monotonicity.  One true gap between the two middle keys.
    lo = -(2**62)
    hi = 2**62
    keys = [lo, lo + 1, -5, -3, hi - 1, hi]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    gaps = {
        (r["gap_start"], r["gap_end"])
        for r in pk_gaps(df, "k", n_buckets=4).collect()
    }
    assert (lo + 2, -6) in gaps
    assert (-4, -4) in gaps
    assert (-2, hi - 2) in gaps
    assert len(gaps) == 3
