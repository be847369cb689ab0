"""Wave-19 operators: deterministic splits, exact equi-depth
histogram, k-anonymity audit."""

from __future__ import annotations

from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.checks.distributions import (
    equidepth_histogram,
)
from opengauss_tools_datachecker_performance_spark.checks.privacy import (
    k_anonymity_audit,
)
from opengauss_tools_datachecker_performance_spark.operators.splits import (
    hash_split,
    split_report,
)

FRACS = [("train", 0.9), ("val", 0.05), ("test", 0.05)]


def test_hash_split_stable_under_append(spark):
    """Adding rows must not reassign existing ids — the leakage
    property the seeded-hash wheel exists for."""
    small = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(small, "doc_id", FRACS, 7).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(big, "doc_id", FRACS, 7).collect()}
    assert all(b[k] == v for k, v in a.items())
    assert set(b.values()) == {"train", "val", "test"}


def test_hash_split_seed_changes_assignment(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id", FRACS, 7).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(df, "doc_id", FRACS, 8).collect()}
    assert any(a[k] != b[k] for k in a)


def test_split_report_shares_sum_to_one(spark):
    df = spark.range(0, 3000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 3).cast("string").alias("src")
    )
    rep = split_report(df, "doc_id", FRACS, group_col="src", seed=7).collect()
    by_src: dict[str, float] = {}
    for r in rep:
        by_src[r["src"]] = by_src.get(r["src"], 0.0) + float(r["share"])
    assert all(abs(v - 1.0) < 1e-4 for v in by_src.values())
    # realized train share lands near the requested 0.9
    train = sum(r["n_docs"] for r in rep if r["split"] == "train")
    assert 0.85 < train / 3000 < 0.95


def test_equidepth_histogram_exact_vs_bruteforce(spark):
    import math

    rows = [(float((i * 37) % 101), i) for i in range(500)]
    df = spark.createDataFrame(rows, "v double, k long")
    got = {
        r["bin"]: (r["n"], r["v_lo"], r["v_hi"])
        for r in equidepth_histogram(df, "v", ["k"], n_bins=8).collect()
    }
    ordered = sorted(rows)
    n = len(ordered)
    expect: dict[int, list[float]] = {}
    for rank0, (v, _) in enumerate(ordered):
        expect.setdefault(math.floor(rank0 * 8 / n), []).append(v)
    assert set(got) == set(expect)
    for b, vals in expect.items():
        cnt, lo, hi = got[b]
        assert cnt == len(vals)
        assert float(lo) == min(vals) and float(hi) == max(vals)
    # equi-DEPTH: bin counts within 1 of each other
    counts = [got[b][0] for b in sorted(got)]
    assert max(counts) - min(counts) <= 1


def test_k_anonymity_audit_counts(spark):
    # groups: (a: 5 rows), (b: 2 rows), (c: 1 row) with k=3
    rows = [("a",)] * 5 + [("b",)] * 2 + [("c",)]
    df = spark.createDataFrame(rows, "qi string")
    r = k_anonymity_audit(df, ["qi"], k=3).first()
    assert r["n_rows"] == 8 and r["n_groups"] == 3
    assert r["n_small_groups"] == 2 and r["rows_at_risk"] == 3
    assert r["min_group_size"] == 1 and r["k_anonymous"] is False
    ok = k_anonymity_audit(df.filter(F.col("qi") == "a"), ["qi"], k=3).first()
    assert ok["k_anonymous"] is True and ok["rows_at_risk"] == 0


def test_boilerplate_removal_exact(spark):
    from opengauss_tools_datachecker_performance_spark.operators.lines import (
        boilerplate_lines,
        remove_boilerplate_report,
    )

    docs = spark.createDataFrame(
        [
            ("a", "unique a1\nfooter\nunique a2"),
            ("b", "unique b1\nfooter"),
            ("c", "footer\nunique c1"),
            ("d", "unique d1"),
            ("e", "footer\nfooter\nfooter"),  # within-doc repeats = 1 doc
        ],
        "doc_id string, text string",
    )
    boiler = {r["line"]: r["n_docs"] for r in boilerplate_lines(docs, min_docs=3).collect()}
    assert boiler == {"footer": 4}  # distinct-doc counting, not row counting
    rep = {r["doc_id"]: r for r in remove_boilerplate_report(docs, min_docs=3).collect()}
    assert rep["a"]["n_lines"] == 3 and rep["a"]["n_removed"] == 1
    assert rep["d"]["n_removed"] == 0
    # doc e loses every line -> cleaned text is the empty string
    assert rep["e"]["n_removed"] == 3
    from opengauss_tools_datachecker_performance_spark.functions.hashing import (
        portable_hash64,
    )
    empty_hash = (
        spark.range(1).select(portable_hash64(F.lit("")).alias("h")).first()["h"]
    )
    assert rep["e"]["clean_hash"] == empty_hash
    # kept lines preserve original order
    clean_a_hash = (
        spark.range(1)
        .select(portable_hash64(F.lit("unique a1\nunique a2")).alias("h"))
        .first()["h"]
    )
    assert rep["a"]["clean_hash"] == clean_a_hash


def test_span_transition_profile_hand_case(spark):
    from opengauss_tools_datachecker_performance_spark.checks.interleaved import (
        span_transition_profile,
    )

    schema = (
        "doc_id string, spans array<struct<"
        "kind:string,text:string,media_ref:string,offset:int>>"
    )
    docs = spark.createDataFrame(
        [
            # unsorted input: operator must order by offset first
            ("a", [("media", None, "m1", 1), ("text", "t", None, 0),
                   ("media", None, "m2", 2)]),
            ("b", [("media", None, "m3", 0), ("media", None, "m4", 1)]),
            ("c", []),
        ],
        schema,
    )
    got = {
        (r["from_kind"], r["to_kind"]): r["n_transitions"]
        for r in span_transition_profile(docs).collect()
    }
    assert got == {
        ("^", "text"): 1,
        ("text", "media"): 1,
        ("media", "media"): 2,  # doc a m1->m2 AND doc b m3->m4
        ("^", "media"): 1,
    }


def test_hash_split_null_id_parity(spark):
    """NULL ids get a deterministic split via the reserved sentinel —
    and the DuckDB rendering agrees (Spark's concat_ws drops NULLs
    while DuckDB's || propagates them; the coalesce reconciles)."""
    import duckdb

    from opengauss_tools_datachecker_performance_spark.operators.splits import (
        hash_split,
        hash_split_sql,
    )

    fr = [("train", 0.5), ("rest", 0.5)]
    df = spark.createDataFrame([(10,), (None,)], "doc_id long")
    got = {
        r["doc_id"]: r["split"] for r in hash_split(df, "doc_id", fr, 3).collect()
    }
    case = hash_split_sql("doc_id", fr, 3)
    oracle = {
        r[0]: r[1]
        for r in duckdb.sql(
            f"SELECT doc_id, {case} AS s FROM (VALUES (10), (NULL)) t(doc_id)"
        ).fetchall()
    }
    assert got == oracle and None in got and got[None] is not None
