"""Wave-14 unit checks: URL canonicalization/dedup and token-budget
pruning (incl. the scalable global prefix sum)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.entry_queries import ORACLES, QUERIES
from opengauss_tools_datachecker_performance_spark.functions.url import (
    canonical_url,
    url_dedup_groups,
    url_host,
)
from opengauss_tools_datachecker_performance_spark.operators.curation import (
    budget_prune,
)
from opengauss_tools_datachecker_performance_spark.operators.skew import (
    global_rank_cumsum,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", ["url_dedup", "budget_prune"])
def test_wave14_matches_oracle(spark, duck, name):
    got = {tuple(map(str, r)) for r in QUERIES[name](spark, SF_DIR).collect()}
    want = {tuple(map(str, r)) for r in duck.execute(ORACLES[name]).fetchall()}
    assert got == want and len(got) > 0


CANON_CASES = [
    ("HTTP://WWW.Site.com:80/a/", "http://site.com/a"),
    ("http://site.com/a?utm_source=x", "http://site.com/a"),
    ("https://Example.COM:443/p/q?id=2&utm_campaign=c#frag",
     "https://example.com/p/q?id=2"),
    ("https://example.com/p/q?utm_a=1&utm_b=2", "https://example.com/p/q"),
    ("https://example.com/p/q?utm_a=1&id=3", "https://example.com/p/q?id=3"),
    ("https://example.com/p/q?fbclid=abc&gclid=d&ref=rss",
     "https://example.com/p/q"),
    # path case is significant — only scheme://host lowercases
    ("HTTPS://HOST.COM/CaseSensitive/Path", "https://host.com/CaseSensitive/Path"),
    # non-default port survives
    ("http://site.com:8080/a", "http://site.com:8080/a"),
    # :443 is only default for https (and :80 only for http)
    ("http://site.com:443/a", "http://site.com:443/a"),
    ("http://example.com/", "http://example.com"),
    ("http://example.com", "http://example.com"),
    # a trailing slash inside a query VALUE is semantically significant
    # and survives; only pure path tails are stripped
    ("https://site.com/login?next=/home/", "https://site.com/login?next=/home/"),
    ("https://site.com/a/?id=1", "https://site.com/a/?id=1"),
    ("https://site.com/a//", "https://site.com/a"),
    ("not a url", "not a url"),
    (None, None),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CANON_CASES)], "i int, url string"
    )
    got = {
        r.i: r.c
        for r in df.select("i", canonical_url(F.col("url")).alias("c")).collect()
    }
    for i, (u, want) in enumerate(CANON_CASES):
        assert got[i] == want, f"{u!r}: {got[i]!r} != {want!r}"


def test_url_host(spark):
    df = spark.createDataFrame(
        [("https://WWW.Ex.COM:8443/p",), ("nope",), (None,)], "url string"
    )
    hs = [r.h for r in df.select(url_host(F.col("url")).alias("h")).collect()]
    assert hs == ["ex.com", None, None]


def test_url_dedup_groups_keep_lowest_id(spark):
    df = spark.createDataFrame(
        [
            ("9", "http://a.com/x"),
            ("10", "HTTP://WWW.A.com:80/x/"),
            ("11", "http://a.com/x?utm_source=s"),
            ("12", "http://b.com/unique"),
            ("13", None),
        ],
        "doc_id string, url string",
    )
    [g] = url_dedup_groups(df).collect()
    assert g.canonical_url == "http://a.com/x"
    assert g.n_docs == 3
    assert g.keep_id == "10"  # STRING min: '10' < '11' < '9'


def test_global_rank_cumsum_equals_single_window(spark):
    df = spark.range(0, 500).select(
        F.col("id").cast("long").alias("k"),
        (F.pmod(F.col("id") * 37, F.lit(101))).cast("double").alias("score"),
        (F.pmod(F.col("id"), F.lit(13)) + 1).cast("long").alias("w"),
    )
    got = {
        (r.k): (r.rn, r.cum)
        for r in global_rank_cumsum(df, ["score", "k"], "w").collect()
    }
    rows = sorted(df.collect(), key=lambda r: (r.score, r.k))
    cum = 0
    for i, r in enumerate(rows, start=1):
        cum += r.w
        assert got[r.k] == (i, cum), f"row {r.k}"


def test_budget_prune_boundary(spark):
    df = spark.createDataFrame(
        [("a", 10, 1.0), ("b", 20, 2.0), ("c", 30, 3.0), ("d", 5, 4.0)],
        "doc_id string, n_tokens long, score double",
    )
    got = {r.doc_id: r for r in budget_prune(df, 31).collect()}
    # order a(10) b(30) c(60) d(65): budget 31 keeps a and b only
    assert got["a"].kept and got["b"].kept
    assert not got["c"].kept and not got["d"].kept
    assert got["b"].cum_tokens == 30 and got["c"].cum_tokens == 60
    assert [got[k].rank for k in "abcd"] == [1, 2, 3, 4]


# --- randomized properties -------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_scheme = st.sampled_from(["http", "https", "HTTP", "HtTpS"])
_host = st.from_regex(r"[A-Za-z][A-Za-z0-9-]{0,8}(\.[A-Za-z]{2,4}){1,2}", fullmatch=True)
_path = st.from_regex(r"(/[A-Za-z0-9._~-]{0,6}){0,3}/?", fullmatch=True)
_params = st.lists(
    st.tuples(
        st.sampled_from(["id", "q", "utm_source", "utm_campaign", "fbclid", "ref"]),
        st.from_regex(r"[A-Za-z0-9]{0,5}", fullmatch=True),
    ),
    max_size=4,
)


@st.composite
def _urls(draw):
    scheme = draw(_scheme)
    host = draw(_host)
    www = draw(st.booleans())
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    path = draw(_path)
    params = draw(_params)
    q = "&".join(f"{k}={v}" for k, v in params)
    frag = draw(st.sampled_from(["", "#x", "#frag"]))
    return (
        f"{scheme}://{'www.' if www else ''}{host}{port}{path}"
        + (f"?{q}" if q else "")
        + frag
    )


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_urls(), min_size=1, max_size=40))
def test_canonical_url_idempotent(spark, urls):
    """canonical(canonical(u)) == canonical(u) — normalization is a
    projection, so a re-crawl of already-canonical URLs must be a
    fixed point (otherwise dedup keys drift run-over-run)."""
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(canonical_url(F.col("url")).alias("c1"))
    twice = once.select(
        F.col("c1"), canonical_url(F.col("c1")).alias("c2")
    ).collect()
    for r in twice:
        assert r.c1 == r.c2, r


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.floats(0, 100, allow_nan=False), st.integers(1, 50)),
        min_size=1,
        max_size=60,
    )
)
def test_global_rank_cumsum_property(spark, rows):
    """rank is a permutation of 1..n and cum is the exact prefix sum
    along (score, id) for arbitrary score distributions (incl. heavy
    ties — all equal scores land in one bucket by construction)."""
    df = spark.createDataFrame(
        [(str(i), s, w) for i, (s, w) in enumerate(rows)],
        "k string, score double, w long",
    )
    got = sorted(
        global_rank_cumsum(df, ["score", "k"], "w").collect(),
        key=lambda r: r.rn,
    )
    assert [r.rn for r in got] == list(range(1, len(rows) + 1))
    expect = sorted(
        ((str(i), s, w) for i, (s, w) in enumerate(rows)),
        key=lambda t: (t[1], t[0]),
    )
    cum = 0
    for r, (k, s, w) in zip(got, expect):
        cum += w
        assert (r.k, r.cum) == (k, cum)
