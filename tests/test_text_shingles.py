"""The explode-first shingle/minhash forms must agree exactly with the
array-form reference implementations (word_shingles / minhash_signature)
— same shingle sets, same signatures — including the <k-token and
empty-text fallbacks."""

from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.functions.hashing import (
    portable_hash64,
)
from opengauss_tools_datachecker_performance_spark.functions.text import (
    MINHASH_AB,
    minhash_affine,
    minhash_signature,
    shingle_rows,
    word_shingles,
)

DOCS = [
    ("1", "the quick brown fox jumps over the lazy dog"),
    ("2", "the quick brown fox jumps over the lazy cat"),
    ("3", "one two"),          # < k tokens → whole-doc shingle
    ("4", "single"),           # 1 token
    ("5", ""),                 # empty text → hash of ""
    ("6", "  padded   whitespace   everywhere  "),
    ("7", "dup dup dup dup dup"),  # duplicate shingles collapse (distinct)
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


def test_shingle_rows_match_array_form(spark):
    df = _df(spark)
    rows = {
        (r["doc_id"], r["sh"])
        for r in shingle_rows(df, "doc_id", "text", 3, distinct=True).collect()
    }
    arr = df.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                word_shingles(F.col("text"), 3), lambda s: portable_hash64(s)
            )
        ).alias("sh"),
    ).collect()
    want = {(r["doc_id"], h) for r in arr for h in r["sh"]}
    assert rows == want
    # every doc contributes at least one shingle (whole-doc fallback)
    assert {d for d, _ in rows} == {d for d, _ in DOCS}


def test_minhash_rows_match_array_form(spark):
    df = _df(spark)
    rows = shingle_rows(df, "doc_id", "text", 3, distinct=False)
    sig_rows = {
        r["doc_id"]: [r[f"_m{i}"] for i in range(8)]
        for r in rows.groupBy("doc_id")
        .agg(
            *[
                F.min(minhash_affine(F.col("sh"), a, b)).alias(f"_m{i}")
                for i, (a, b) in enumerate(MINHASH_AB)
            ]
        )
        .collect()
    }
    sig_arr = {
        r["doc_id"]: list(r["sig"])
        for r in df.select(
            "doc_id", minhash_signature(F.col("text"), 3, 8).alias("sig")
        ).collect()
    }
    assert sig_rows == sig_arr
    # near-identical docs share most signature slots; disjoint docs none
    same = sum(a == b for a, b in zip(sig_arr["1"], sig_arr["2"]))
    assert same >= 4
    assert not any(a == b for a, b in zip(sig_arr["1"], sig_arr["7"]))
