"""Round-5 review fixes (ADVICE.md r04 + VERDICT r04), each pinned:

* canon_oracle_number — magnitudes ≥ 1e38 (beyond Spark's decimal(38,0)
  ceiling, reachable only from DOUBLE inputs) must render the full
  integer digit string like the reference's toBigInteger(), not abort
  under ANSI mode / NULL with ANSI off.
* --audit-split / --audit-equidepth / --audit-kanon — malformed specs
  must be an argparse error (SystemExit 2), never an
  IndexError/ValueError traceback mid-run.
* referential/span_rules/uniqueness — violation-proportional frames
  route through operators.skew.small_side (the broadcast-discipline
  gate itself lives in test_plan_audit.py); here we pin that the
  semantics survived the routing change at both AQE settings.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.canon import canon_oracle_number


def test_canon_oracle_number_survives_1e38(spark):
    df = spark.createDataFrame(
        [(1e40,), (-2.5e38,), (9.9e37,), (12345.0,), (None,)], "x double"
    )
    got = {
        r["x"]: r["c"]
        for r in df.select(
            "x", canon_oracle_number(F.col("x")).alias("c")
        ).collect()
    }
    assert got[1e40] == "1" + "0" * 40
    assert got[-2.5e38] == "-25" + "0" * 37
    assert got[9.9e37] == "99" + "0" * 36  # below ceiling: decimal path
    assert got[12345.0] == "12345"
    assert got[None] is None


def test_canon_oracle_number_decimal_inputs_unaffected(spark):
    df = spark.createDataFrame([("987654321.99",)], "s string").select(
        F.col("s").cast("decimal(20,2)").alias("x")
    )
    assert (
        df.select(canon_oracle_number(F.col("x")).alias("c")).first()["c"]
        == "987654321"
    )


@pytest.mark.parametrize(
    "argv",
    [
        ["--audit-equidepth", "price"],  # missing tiebreak section
        ["--audit-equidepth", "v:ck:"],  # empty BINS → int('')
        ["--audit-equidepth", "v:"],  # empty tiebreak
        ["--audit-equidepth", "v:a+:4"],  # empty tiebreak element
        ["--audit-equidepth", "v:ck:x"],  # non-numeric BINS
        ["--audit-split", "ck::"],  # empty SEED → int('')
        ["--audit-split", ":g:1"],  # empty IDCOL
        ["--audit-split", "ck:g:notanint"],
        ["--audit-kanon", ":5"],  # empty column list
        ["--audit-kanon", "a,,b"],  # empty column element
        ["--audit-kanon", "a,b:x"],  # non-numeric K
    ],
)
def test_malformed_audit_specs_are_argparse_errors(argv):
    from opengauss_tools_datachecker_performance_spark.__main__ import main

    with pytest.raises(SystemExit) as exc:
        main(["--table", "ignored.parquet", *argv])
    assert exc.value.code == 2  # argparse error, not a traceback


@pytest.mark.parametrize("aqe", ["true", "false"])
def test_referential_violations_same_rows_both_aqe_settings(spark, aqe):
    from opengauss_tools_datachecker_performance_spark.checks.referential import (
        referential_violations,
    )

    docs = spark.createDataFrame(
        [
            ("d1", [("text", "hello", None, 0), ("media", None, "a1", 1)]),
            ("d2", [("media", None, "missing", 0), ("media", None, "a2", 1)]),
        ],
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    assets = spark.createDataFrame([("a1",), ("a2",)], "media_ref string")
    old = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        rows = referential_violations(docs, assets).collect()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    assert [(r["key"], r["span_idx"], r["media_ref"]) for r in rows] == [
        ("d2", 0, "missing")
    ]


@pytest.mark.parametrize("aqe", ["true", "false"])
def test_duplicate_keys_from_digests_both_aqe_settings(spark, aqe):
    from opengauss_tools_datachecker_performance_spark.checks.uniqueness import (
        duplicate_keys_from_digests,
    )

    digests = spark.createDataFrame(
        [("dup", 5), ("dup", 5), ("k1", 10), ("k2", 10), ("k3", 11)],
        "key string, k_hash long",
    )
    old = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        out = {
            r["key"]: r["n_occurrences"]
            for r in duplicate_keys_from_digests(digests).collect()
        }
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    # k1/k2 share a hash but are distinct keys (collision — the exact
    # verify keeps them out); only the repeated KEY is a duplicate
    assert out == {"dup": 2}
