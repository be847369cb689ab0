"""Run-to-run violation regression diff (plans.report.run_regression
+ CLI --baseline-report-dir)."""

import json
import os

from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.__main__ import main
from opengauss_tools_datachecker_performance_spark.plans.report import run_regression
from opengauss_tools_datachecker_performance_spark.synth import write_corpus

_SCHEMA = (
    "part int, constraint string, key string, span_idx int, detail string"
)


def _vio(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def test_run_regression_classifies_and_null_normalizes(spark):
    """Doc-level violations carry NULL span_idx (and sometimes NULL
    detail); a plain column-list full-outer join would classify such a
    row as simultaneously new AND resolved. The normalization must
    make it ONE persisting row."""
    prev = _vio(
        spark,
        [
            (0, "min_chars", "7", None, None),  # persists (null span/detail)
            (1, "diff", "8", 2, "update"),      # resolved
            (1, "diff", "9", 0, "delete"),      # persists
        ],
    )
    cur = _vio(
        spark,
        [
            (0, "min_chars", "7", None, None),
            (1, "diff", "9", 0, "delete"),
            (2, "referential", "10", 1, "dangling"),  # new
        ],
    )
    got = {
        (r["part"], r["constraint"], r["key"], r["span_idx"], r["change"])
        for r in run_regression(cur, prev).collect()
    }
    assert got == {
        ("0", "min_chars", "7", -1, "persisting"),
        ("1", "diff", "8", 2, "resolved"),
        ("1", "diff", "9", 0, "persisting"),
        ("2", "referential", "10", 1, "new"),
    }
    # duplicate identities in either run collapse to one row
    dup = prev.unionByName(prev)
    assert run_regression(dup, prev).count() == 3


def test_run_regression_null_and_string_parts(spark):
    """part itself is a join key and may be NULL (docs with a NULL
    partition value) or non-integer (--partition-col on a string date
    column): both must still classify as ONE persisting row, not a
    new+resolved pair."""
    rows = [
        (None, "min_chars", "7", None, None),
        ("2024-01-03", "diff", "9", 0, "delete"),
    ]
    schema = (
        "part string, constraint string, key string, span_idx int, "
        "detail string"
    )
    prev = spark.createDataFrame(rows, schema)
    cur = spark.createDataFrame(rows, schema)
    out = run_regression(cur, prev).collect()
    assert len(out) == 2
    assert {r["change"] for r in out} == {"persisting"}
    assert {r["part"] for r in out} == {"", "2024-01-03"}


def test_cli_baseline_dir_validated_before_run(spark, tmp_path):
    """A typo'd --baseline-report-dir must fail at argparse time, not
    after the whole validation has run."""
    import pytest

    with pytest.raises(SystemExit):
        main(
            [
                "--source", "unused.parquet",
                "--report-dir", str(tmp_path / "r"),
                "--baseline-report-dir", str(tmp_path / "nope"),
            ],
            spark=spark,
        )


def test_cli_baseline_report_dir(spark, tmp_path):
    """Second run against the first run's report dir: identical input
    ⇒ everything persists, regression.parquet written, counts in
    summary.json. A third run on a REPAIRED sink resolves the diff
    violations it fixed."""
    corpus = str(tmp_path / "corpus")
    write_corpus(spark, corpus, n_docs=600, n_assets=50, n_partitions=3)
    args = [
        "--source", f"{corpus}/docs_source.parquet",
        "--sink", f"{corpus}/docs_sink.parquet",
        "--assets", f"{corpus}/assets.parquet",
    ]
    r1, r2 = str(tmp_path / "r1"), str(tmp_path / "r2")
    assert main(args + ["--report-dir", r1], spark=spark) == 1
    assert (
        main(
            args + ["--report-dir", r2, "--baseline-report-dir", r1],
            spark=spark,
        )
        == 1
    )
    s2 = json.load(open(os.path.join(r2, "summary.json")))
    reg = s2["regression"]
    assert reg["new"] == 0 and reg["resolved"] == 0
    assert reg["persisting"] > 0
    frame = spark.read.parquet(os.path.join(r2, "regression.parquet"))
    assert {r["change"] for r in frame.collect()} == {"persisting"}

    # repair the sink to equal the source: the diff-family violations
    # resolve; source-intrinsic ones (null rules etc.) persist
    fixed = str(tmp_path / "fixed_sink.parquet")
    spark.read.parquet(f"{corpus}/docs_source.parquet").write.parquet(fixed)
    r3 = str(tmp_path / "r3")
    rc = main(
        [
            "--source", f"{corpus}/docs_source.parquet",
            "--sink", fixed,
            "--assets", f"{corpus}/assets.parquet",
            "--report-dir", r3,
            "--baseline-report-dir", r2,
        ],
        spark=spark,
    )
    assert rc == 1  # seeded source violations still fail the run
    s3 = json.load(open(os.path.join(r3, "summary.json")))
    assert s3["regression"]["resolved"] > 0
    f3 = spark.read.parquet(os.path.join(r3, "regression.parquet"))
    resolved = f3.filter(F.col("change") == "resolved")
    assert resolved.filter(F.col("constraint") == "consistency").count() > 0
