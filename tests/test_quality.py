"""Composite quality filter (operators/quality.py): each rule fires on
its crafted doc and clean docs keep."""

from __future__ import annotations

from opengauss_tools_datachecker_performance_spark.operators.quality import (
    quality_filter,
)

CLEAN = (
    "the quick brown fox jumps over a lazy dog and then the fox "
    "rests by the river for a while in the warm sun"
)

DOCS = [
    ("clean", CLEAN),
    ("short", "the tiny doc"),
    ("repeat", "the spam " + "spam " * 30 + "is the spam for a test"),
    ("boiler", CLEAN + " buy now" * 12),
    ("nonen", "foo bar baz qux quux corge grault garply waldo fred"),
    ("piidoc", CLEAN + " reach me at someone@example.com today"),
    ("empty", ""),
]


def test_quality_filter_rules(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    got = {
        r["doc_id"]: (r["keep"], list(r["reasons"]), r["n_tokens"])
        for r in quality_filter(df).collect()
    }
    assert got["clean"] == (True, [], len(CLEAN.split()))
    # a 3-token doc's top bigram covers 2/3 of it — boilerplate fires
    # alongside too_short (independent thresholds, Gopher-style)
    assert got["short"] == (False, ["boilerplate", "too_short"], 3)
    assert "repetition" in got["repeat"][1] and not got["repeat"][0]
    assert "boilerplate" in got["boiler"][1]
    assert got["nonen"][1] == ["non_english"]
    assert got["piidoc"][1] == ["pii"]
    # empty doc: too_short AND non_english (ratio 0), sorted order
    assert got["empty"] == (False, ["non_english", "too_short"], 0)


def test_quality_filter_thresholds_are_parameters(spark):
    df = spark.createDataFrame(DOCS, "doc_id string, text string")
    lax = {
        r["doc_id"]: r["keep"]
        for r in quality_filter(
            df,
            min_tokens=1,
            max_dup_token_frac=1.0,
            # overlapping occurrences each cover 2 tokens, so the
            # coverage ratio can exceed 1 — relax beyond that
            max_top_bigram_frac=99.0,
            min_stopword_ratio=0.0,
            flag_pii=False,
        ).collect()
    }
    # with every threshold relaxed only the 0-token doc can fail
    assert all(keep for d, keep in lax.items() if d != "empty")
