"""Regression tests for the second review-hardening wave (dedup /
components / streaming edge cases)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def test_exact_decisions_cover_null_text_group(spark):
    from opengauss_tools_datachecker_performance_spark.operators.dedup import (
        exact_duplicate_decisions,
        exact_duplicate_groups,
    )

    df = spark.createDataFrame(
        [("1", None), ("2", None), ("3", "real"), ("4", "real")],
        "doc_id string, text string",
    )
    groups = exact_duplicate_groups(df, "doc_id", "text").collect()
    decisions = exact_duplicate_decisions(df, "doc_id", "text").collect()
    # BOTH views must report both duplicate groups — the NULL
    # fingerprint group used to vanish from the decisions join
    assert len(groups) == 2
    assert {r.doc_id for r in decisions} == {"1", "2", "3", "4"}
    by_doc = {r.doc_id: r.action for r in decisions}
    assert by_doc["1"] == "keep" and by_doc["2"] == "remove"


def test_survivor_prefers_real_text_over_null(spark):
    from opengauss_tools_datachecker_performance_spark.operators.components import (
        dedup_survivors,
    )

    labels = spark.createDataFrame(
        [("a", "a"), ("b", "a")], "id string, component string"
    )
    docs = spark.createDataFrame(
        [("a", None), ("b", "some real text")], "doc_id string, text string"
    )
    [row] = dedup_survivors(labels, docs).collect()
    assert row.survivor_id == "b" and row.survivor_len == 14


def test_embedding_near_dup_survives_zero_vector(spark):
    from opengauss_tools_datachecker_performance_spark.operators.dedup import (
        embedding_near_duplicates,
    )

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 0.0, 0.0]),  # zero norm: must not abort the job
        (4, [0.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r.id_a, r.id_b)
        for r in embedding_near_duplicates(df, dims=4, threshold=0.99).collect()
    }
    assert (1, 2) in got
    # zero-vector pairs score NULL and drop at the threshold
    assert all(3 not in p and 4 not in p for p in got)


def test_minhash_bands_divisibility_guard(spark):
    from opengauss_tools_datachecker_performance_spark.operators.dedup import (
        minhash_buckets_from_shingle_rows,
    )
    from opengauss_tools_datachecker_performance_spark.functions.text import (
        shingle_rows,
    )

    df = spark.createDataFrame([("1", "a b c d")], "doc_id string, text string")
    rows = shingle_rows(df, "doc_id", "text", 2, distinct=False)
    with pytest.raises(ValueError, match="divisible"):
        minhash_buckets_from_shingle_rows(rows, num_hashes=8, bands=3)


def test_null_text_doc_still_shingles(spark):
    from opengauss_tools_datachecker_performance_spark.functions.text import (
        shingle_rows,
    )

    df = spark.createDataFrame(
        [("1", None), ("2", "")], "doc_id string, text string"
    )
    got = {r.doc_id for r in shingle_rows(df, "doc_id", "text", 3).collect()}
    assert got == {"1", "2"}  # NULL text behaves like empty text


def test_incremental_confirmations_survive_restart(corpus, spark, tmp_path):
    from opengauss_tools_datachecker_performance_spark.streaming.incremental import (
        IncrementalChecker,
    )

    src, sink = corpus["docs_source"], corpus["docs_sink"]
    bad = [
        r.doc_id
        for r in corpus["violations_expected"]
        .filter(F.col("vclass") == "corrupt_text")
        .limit(2)
        .collect()
    ]
    out = str(tmp_path)
    chk = IncrementalChecker(src, sink, out)
    batch = spark.createDataFrame([(k,) for k in bad[:1]], "doc_id string")
    chk.process_batch(batch, 0)
    chk.process_batch(spark.createDataFrame([], "doc_id string"), 1)
    assert {k for k, _, _ in chk.confirmed} == {bad[0]}

    # "restart": a FRESH checker (driver state gone) confirms a second
    # key — the first confirmation must survive in the sink
    chk2 = IncrementalChecker(src, sink, out)
    batch2 = spark.createDataFrame([(bad[1],)], "doc_id string")
    chk2.process_batch(batch2, 10)
    chk2.process_batch(spark.createDataFrame([], "doc_id string"), 11)
    written = spark.read.parquet(
        os.path.join(out, "incremental_violations.parquet")
    )
    assert {r.key for r in written.collect()} == set(bad)
