"""Randomized property tests (hypothesis): the Spark diff core must
agree with the pure-Python oracle on ARBITRARY corpora, not just the
seeded synthetic one.  Mirrors the reference's golden-test idea
(SURVEY.md §5) with generated inputs instead of fixtures.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from opengauss_tools_datachecker_performance_spark.operators.diff import diff_docs
from tests.oracle import canon_spans, classify

DOC_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)

_kind = st.sampled_from(["text", "media", "rule"])
_text = st.one_of(st.none(), st.text(max_size=8))


def _spans(draw, n):
    # unique offsets per doc: Spark's sort_array ties would otherwise
    # break on (kind, text, media_ref) while Python's stable sort keeps
    # input order — the engine contract only covers unique offsets.
    offs = draw(
        st.lists(st.integers(0, 1000), min_size=n, max_size=n, unique=True)
    )
    out = []
    for i in range(n):
        k = draw(_kind)
        out.append(
            {
                "kind": k,
                "text": draw(_text),
                "media_ref": f"m{draw(st.integers(0, 5))}" if k == "media" else None,
                "offset": offs[i],
            }
        )
    return out


@st.composite
def corpus_pair(draw):
    n_docs = draw(st.integers(2, 12))
    src = {}
    for i in range(n_docs):
        src[f"d{i}"] = _spans(draw, draw(st.integers(1, 5)))
    sink = {}
    for k, spans in src.items():
        action = draw(st.sampled_from(["keep", "keep", "drop", "mutate"]))
        if action == "keep":
            sink[k] = [dict(s) for s in spans]
        elif action == "mutate":
            m = [dict(s) for s in spans]
            j = draw(st.integers(0, len(m) - 1))
            field = draw(st.sampled_from(["text", "kind", "offset"]))
            if field == "offset":
                m[j]["offset"] = m[j]["offset"] + 2000  # stays unique
            else:
                m[j][field] = (m[j][field] or "") + "!"
            sink[k] = m
        # drop → absent in sink (an 'insert' diff)
    for i in range(draw(st.integers(0, 3))):  # sink-only docs ('delete')
        sink[f"x{i}"] = _spans(draw, draw(st.integers(1, 3)))
    return src, sink


def _df(spark, docs: dict):
    return spark.createDataFrame(
        [(k, v) for k, v in docs.items()], DOC_SCHEMA
    )


@pytest.mark.parametrize("two_phase", [True, False])
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pair=corpus_pair())
def test_diff_matches_python_oracle_on_random_corpora(spark, two_phase, pair):
    src, sink = pair
    got = {
        t: {r["key"] for r in rows}
        for t, rows in _group(
            diff_docs(_df(spark, src), _df(spark, sink), two_phase=two_phase)
            .collect()
        ).items()
    }
    want = classify(
        {k: canon_spans(v) for k, v in src.items()},
        {k: canon_spans(v) for k, v in sink.items()},
    )
    for t in ("insert", "update", "delete"):
        assert got.get(t, set()) == want[t], (t, src, sink)


def _group(rows):
    out: dict[str, list] = {}
    for r in rows:
        out.setdefault(r["diff_type"], []).append(r)
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pair=corpus_pair())
def test_locate_spans_matches_body_locator_on_random_corpora(spark, pair):
    """The in-join span locator (digest-frame hash arrays,
    classify_diff(locate_spans=True)) must agree with the
    body-comparing first_divergent_span on ARBITRARY mutations —
    text/kind/offset edits, added/dropped spans, null text."""
    import pyspark.sql.functions as F

    from opengauss_tools_datachecker_performance_spark.operators.diff import (
        diff_digests,
        first_divergent_span,
    )
    from opengauss_tools_datachecker_performance_spark.plans.runner import (
        _enriched_digests,
    )

    src, sink = pair
    sdf = _df(spark, src).withColumn("part", F.lit(0))
    tdf = _df(spark, sink).withColumn("part", F.lit(0))
    diffs = diff_digests(
        _enriched_digests(sdf),
        _enriched_digests(tdf),
        two_phase=True,
        carry_cols=["part"],
        locate_spans=True,
    )
    got = {
        r["key"]: r["span_idx"]
        for r in diffs.filter(F.col("diff_type") == "update").collect()
    }
    upd = spark.createDataFrame([(k,) for k in got] or [("__none__",)], "key string")
    want = {
        r["key"]: r["span_idx"]
        for r in first_divergent_span(sdf, tdf, upd).collect()
    }
    assert got == want, (src, sink)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    keys=st.lists(
        st.integers(-(2**40), 2**40), min_size=1, max_size=200, unique=True
    ),
    n_buckets=st.integers(1, 16),
)
def test_global_rank_property(spark, keys, n_buckets):
    """global_rank == enumerate(sorted(keys)) for ARBITRARY unique
    integer keys (negatives, clusters, huge spreads) at any bucket
    count — the deterministic-bucket zipWithIndex must be exact."""
    from opengauss_tools_datachecker_performance_spark.operators.skew import (
        global_rank,
    )

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r["k"]: r["rn"]
        for r in global_rank(df, ["k"], n_buckets=n_buckets).collect()
    }
    assert got == {k: i + 1 for i, k in enumerate(sorted(keys))}
