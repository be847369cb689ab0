"""Canonicalization layer vs the reference's type-handler table.

Mirrors the reference's golden type-canonicalization tests
(datachecker-extract/src/test/resources/mysql_opgs/expect/t_*.json,
SURVEY.md §5): for each type family, edge-case values in → expected
canonical strings out.  Here the handler is a Catalyst expression, so
one select over a literal frame exercises the whole registry.
"""

from __future__ import annotations

import datetime
import decimal

from pyspark.sql import functions as F
from pyspark.sql import types as T

from opengauss_tools_datachecker_performance_spark.canon import (
    canon_binary,
    canon_bit,
    canon_boolean,
    canon_date,
    canon_decimal,
    canon_double_plain,
    canon_expr,
    canon_float,
    canon_integer,
    canon_time,
    canon_timestamp,
    canon_unsigned,
    canonical_projection,
)


def _one(spark, value, dtype, fn, **kw):
    df = spark.createDataFrame([(value,)], T.StructType([T.StructField("c", dtype)]))
    return df.select(fn(F.col("c"), **kw).alias("o")).first()["o"]


def test_integer_families(spark):
    assert _one(spark, 42, T.IntegerType(), canon_integer) == "42"
    assert _one(spark, -7, T.LongType(), canon_integer) == "-7"
    assert _one(spark, 0, T.ShortType(), canon_integer) == "0"


def test_decimal_to_plain_string(spark):
    # reference golden: decimal(20,6) of 1 → "1.000000" (t_decimal.json)
    v = decimal.Decimal("1")
    assert _one(spark, v, T.DecimalType(20, 6), canon_decimal) == "1.000000"
    v = decimal.Decimal("12345678901234.567890")
    assert (
        _one(spark, v, T.DecimalType(20, 6), canon_decimal)
        == "12345678901234.567890"
    )


def test_float_scale_formatting(spark):
    # %.<scale>f with no thousands separators (SimpleTypeHandlerFactory:63-75)
    assert _one(spark, 1234.5, T.DoubleType(), canon_float, scale=2) == "1234.50"
    assert _one(spark, 1234567.891, T.DoubleType(), canon_float, scale=1) == "1234567.9"


def test_double_plain_expands_scientific(spark):
    # Spark's double→string yields E-notation for 1e10; the reference
    # expands it (BigDecimal.toPlainString)
    assert _one(spark, 1.0e10, T.DoubleType(), canon_double_plain) == "10000000000"
    assert _one(spark, 1.5e-5, T.DoubleType(), canon_double_plain) == "0.000015"
    # plain values pass through Spark's shortest round-trip form
    assert _one(spark, 2.5, T.DoubleType(), canon_double_plain) == "2.5"


def test_boolean_vs_bit(spark):
    # boolean → "true"/"false" (:520-522); bit(1) → "0"/"1" (:87-95)
    assert _one(spark, True, T.BooleanType(), canon_boolean) == "true"
    assert _one(spark, False, T.BooleanType(), canon_boolean) == "false"
    assert _one(spark, True, T.BooleanType(), canon_bit) == "1"
    assert _one(spark, False, T.BooleanType(), canon_bit) == "0"


def test_unsigned_bigint_full_precision(spark):
    # 2^64-1 does not fit a signed long; decimal(20,0) carries it
    v = decimal.Decimal(2**64 - 1)
    assert (
        _one(spark, v, T.DecimalType(20, 0), canon_unsigned)
        == "18446744073709551615"
    )


def test_binary_upper_hex(spark):
    assert _one(spark, bytearray(b"\xde\xad\xbe\xef"), T.BinaryType(), canon_binary) == "DEADBEEF"


def test_date_time_timestamp(spark):
    d = datetime.date(2024, 2, 29)
    assert _one(spark, d, T.DateType(), canon_date) == "2024-02-29"
    ts = datetime.datetime(2024, 2, 29, 13, 5, 9, 123000)
    assert _one(spark, ts, T.TimestampType(), canon_timestamp) == "2024-02-29 13:05:09"
    assert (
        _one(spark, ts, T.TimestampType(), canon_timestamp, scale=3)
        == "2024-02-29 13:05:09.123"
    )
    assert _one(spark, ts, T.TimestampType(), canon_time) == "13:05:09"


def test_null_stays_null_at_canon_layer(spark):
    # NULL → SQL NULL here; '' substitution happens only inside digests
    # (HashHandler.java:58 split preserved — canon.py module docstring)
    df = spark.createDataFrame(
        [(None,)], T.StructType([T.StructField("c", T.StringType())])
    )
    assert df.select(canon_expr(df.schema.fields[0]).alias("o")).first()["o"] is None


def test_canonical_projection_keeps_names_and_stringifies(spark):
    df = spark.createDataFrame(
        [(1, 2.5, datetime.date(2020, 1, 2), True)],
        "a int, b double, d date, f boolean",
    )
    out = canonical_projection(df)
    assert [f.name for f in out.schema.fields] == ["a", "b", "d", "f"]
    assert all(f.dataType == T.StringType() for f in out.schema.fields)
    r = out.first()
    assert (r["a"], r["b"], r["d"], r["f"]) == ("1", "2.5", "2020-01-02", "true")


# ---------------------------------------------------------------------------
# Golden per-type matrix — mirrors the reference's per-type expect
# fixtures (datachecker-extract/src/test/resources/mysql_opgs/expect/
# t_{double,decimal,time,...}.json), extended with the magnitude edges
# the fixtures don't reach.
# ---------------------------------------------------------------------------


def test_golden_timestamp_scales_0_to_6(spark):
    """One golden per fractional scale 0..6 (DateTimeFormatterMap.java:
    38-60 builds 'yyyy-MM-dd HH:mm:ss' + '.S'*scale)."""
    ts = datetime.datetime(2022, 12, 16, 11, 4, 50, 4300)  # .004300
    want = {
        0: "2022-12-16 11:04:50",
        1: "2022-12-16 11:04:50.0",
        2: "2022-12-16 11:04:50.00",
        3: "2022-12-16 11:04:50.004",
        4: "2022-12-16 11:04:50.0043",
        5: "2022-12-16 11:04:50.00430",
        6: "2022-12-16 11:04:50.004300",  # t_time.json c_time golden shape
    }
    for scale, expect in want.items():
        assert (
            _one(spark, ts, T.TimestampType(), canon_timestamp, scale=scale)
            == expect
        ), scale


def test_golden_double_magnitude_edges(spark):
    """Full-precision plain expansion (SimpleTypeHandlerFactory.java:
    262-358 BigDecimal.toPlainString): values beyond DECIMAL(38,18)
    must NOT collapse to NULL, and sub-1e-18 values must stay distinct."""
    cases = {
        1.0e20: "100000000000000000000",
        1.234e20: "123400000000000000000",
        1.0e308: "1" + "0" * 308,
        1.0e-30: "0." + "0" * 29 + "1",
        -5.5e-10: "-0.00000000055",
        # t_double.json golden shapes (plain values pass through)
        1.0: "1.0",
        -0.001: "-0.001",
        9999.999: "9999.999",
    }
    vals = list(cases)
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {
        r["x"]: r["c"]
        for r in df.select(
            "x", canon_double_plain(F.col("x")).alias("c")
        ).collect()
    }
    for v, expect in cases.items():
        assert got[v] == expect, v
    # injectivity at the former collision magnitudes
    tiny = [1.0e-30, 2.0e-30, 1.0e-19, 1.0e-20]
    huge = [1.0e20, 1.0000000000000001e20, 1.0e21, 1.0e308]
    df2 = spark.createDataFrame([(v,) for v in tiny + huge], "x double")
    strs = [
        r["c"]
        for r in df2.select(canon_double_plain(F.col("x")).alias("c")).collect()
    ]
    assert len(set(strs)) == len(strs) and all(s is not None for s in strs)


def test_golden_bit_n_and_binary_hex(spark):
    """bit(n>1)/binary → upper hex without zero-padding loss
    (HexUtil.java byteToHex: two chars per byte, upper case)."""
    cases = {
        b"\x00": "00",
        b"\x05": "05",
        b"\x00\xff": "00FF",
        b"\x0a\x0b\x0c": "0A0B0C",
    }
    for raw, expect in cases.items():
        assert (
            _one(spark, bytearray(raw), T.BinaryType(), canon_binary) == expect
        ), raw


def test_golden_unsigned_and_decimal_scales(spark):
    """Unsigned bigint edge + decimal scale retention (t_decimal.json
    goldens keep the declared scale: 1.0001 @ (20,12) →
    '1.000100000000')."""
    assert (
        _one(spark, decimal.Decimal(2**64 - 1), T.DecimalType(20, 0), canon_unsigned)
        == "18446744073709551615"
    )
    assert (
        _one(
            spark,
            decimal.Decimal("1.0001"),
            T.DecimalType(20, 12),
            canon_decimal,
        )
        == "1.000100000000"
    )
    assert (
        _one(spark, decimal.Decimal("0"), T.DecimalType(10, 0), canon_decimal)
        == "0"
    )


# ---------------------------------------------------------------------------
# Oracle-dialect goldens (OracleResultSetHandler.java:40-54 +
# SimpleTypeHandlerFactory.java:574-675 + HexUtil.java byteToHexTrim)
# ---------------------------------------------------------------------------


def test_golden_oracle_number(spark):
    from opengauss_tools_datachecker_performance_spark.canon import (
        canon_oracle_number,
    )

    # scale ≤ 0 → BigInteger string (decimal dropped, not rounded away
    # by a double hop); NUMBER(38) magnitudes survive
    dec = T.DecimalType(38, 0)
    big = decimal.Decimal("99999999999999999999999999999999999999")
    assert _one(spark, big, dec, canon_oracle_number, scale=0) == str(big)
    assert (
        _one(spark, decimal.Decimal("-12345"), dec, canon_oracle_number, scale=0)
        == "-12345"
    )
    # scale > 0 → doubleValue() string, sci-notation flattened to plain
    assert _one(spark, 1.5, T.DoubleType(), canon_oracle_number, scale=2) == "1.5"
    assert (
        _one(spark, 1.0e20, T.DoubleType(), canon_oracle_number, scale=2)
        == "100000000000000000000"
    )


def test_golden_oracle_raw_vs_blob_trim(spark):
    from opengauss_tools_datachecker_performance_spark.canon import (
        canon_oracle_blob,
        canon_oracle_raw,
    )

    bt = T.BinaryType()
    # RAW: plain upper hex, zero bytes KEPT (ResultSet::getString)
    assert _one(spark, b"\x02\xaa\x00", bt, canon_oracle_raw) == "02AA00"
    # BLOB: HexUtil.byteToHexTrim — trailing zero bytes dropped
    assert _one(spark, b"\x02\xaa\x00", bt, canon_oracle_blob) == "02AA"
    assert _one(spark, b"\x02\xaa\x00\x00", bt, canon_oracle_blob) == "02AA"
    # interior zeros survive; only the tail trims
    assert _one(spark, b"\x00\x10\x00", bt, canon_oracle_blob) == "0010"
    # all-zero payload keeps ONE '00': byteToHexTrim's slow pointer
    # unconditionally appends its byte, so the trim can never reach
    # the empty string on non-empty input (ADVICE r03)
    assert _one(spark, b"\x00\x00", bt, canon_oracle_blob) == "00"
    assert _one(spark, b"", bt, canon_oracle_blob) == ""
    # no accidental odd-aligned trim: 0x30,0x00 -> "30", 0x03,0x00 -> "03"
    assert _one(spark, b"\x30\x00", bt, canon_oracle_blob) == "30"
    assert _one(spark, b"\x03\x00", bt, canon_oracle_blob) == "03"


def test_golden_oracle_clob_and_xml(spark):
    from opengauss_tools_datachecker_performance_spark.canon import (
        canon_oracle_clob,
        canon_oracle_xml,
    )

    st = T.StringType()
    # readLine-loop concatenation: terminators vanish entirely
    assert (
        _one(spark, "line1\nline2\r\nline3\r", st, canon_oracle_clob)
        == "line1line2line3"
    )
    assert _one(spark, "no newline", st, canon_oracle_clob) == "no newline"
    assert (
        _one(spark, "<a><b>x</b></a>", st, canon_oracle_xml) == "<a><b>x</b></a>"
    )
