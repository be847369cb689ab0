"""Edge-case tests for wave 15: constraint checks, distribution
checks, CDC merge, temporal operators.  (Oracle parity for the happy
paths is covered by the catalog entries; these pin the edges the
oracles don't reach.)"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def _ts(s):
    return datetime.datetime.fromisoformat(s)


# --- constraints ------------------------------------------------------


def test_fd_violations_multi_col_and_nulls(spark):
    from opengauss_tools_datachecker_performance_spark.checks.constraints import (
        fd_violations,
    )

    df = spark.createDataFrame(
        [
            ("a", 1, "x"),
            ("a", 1, "x"),  # duplicate pair — not a violation by itself
            ("a", 1, "y"),  # conflict for (a,1)
            ("b", 2, None),  # NULL rhs is a value: (b,2)->{NULL,'z'} conflicts
            ("b", 2, "z"),
            ("c", 3, "w"),
        ],
        "k1 string, k2 int, v string",
    )
    rows = {
        (r.k1, r.k2): r for r in fd_violations(df, ["k1", "k2"], ["v"]).collect()
    }
    assert set(rows) == {("a", 1), ("b", 2)}
    assert rows[("a", 1)].n_rows == 3 and rows[("a", 1)].n_distinct_rhs == 2
    assert rows[("b", 2)].n_distinct_rhs == 2


def test_domain_violations_null_is_violation(spark):
    from opengauss_tools_datachecker_performance_spark.checks.constraints import (
        domain_violations,
    )

    df = spark.createDataFrame(
        [("1", "O"), ("2", "X"), ("3", None), ("4", "X")], "k string, s string"
    )
    rows = {r.value: r for r in domain_violations(df, "s", ["O", "F"], "k").collect()}
    assert set(rows) == {"X", None}
    assert rows["X"].n_rows == 2 and rows["X"].min_key == "2"
    assert rows[None].n_rows == 1


def test_cross_column_zero_violations_still_reported(spark):
    from opengauss_tools_datachecker_performance_spark.checks.constraints import (
        cross_column_violations,
    )

    df = spark.createDataFrame(
        [("1", 5, None), ("2", -1, 3)], "k string, a int, b int"
    )
    out = {
        r.constraint: r
        for r in cross_column_violations(
            df,
            {
                "a_nonneg": F.col("a") >= 0,
                "b_present": F.col("b").isNotNull(),
                "always": F.lit(True),
            },
            "k",
        ).collect()
    }
    assert out["a_nonneg"].n_violations == 1 and out["a_nonneg"].min_key == "2"
    # NULL predicate result (b missing) counts as a violation
    assert out["b_present"].n_violations == 1 and out["b_present"].min_key == "1"
    assert out["always"].n_violations == 0 and out["always"].min_key is None


def test_regex_conformance_null_not_matching(spark):
    from opengauss_tools_datachecker_performance_spark.checks.constraints import (
        regex_conformance,
    )

    df = spark.createDataFrame(
        [("ab12",), (None,), ("xy",)], "code string"
    )
    [r] = regex_conformance(df, {"code": "^[a-z]+[0-9]+$"}).collect()
    assert (r.n_rows, r.n_matching) == (3, 1)
    assert r.conform_rate == "0.333333"


def test_completeness_blank_vs_null(spark):
    from opengauss_tools_datachecker_performance_spark.checks.constraints import (
        completeness,
    )

    df = spark.createDataFrame(
        [("x",), (None,), ("  ",), ("",)], "t string"
    )
    [r] = completeness(df, ["t"], min_ratio=0.5).collect()
    assert (r.n_null, r.n_blank) == (1, 2)
    assert r.completeness == "0.250000" and r.status == "fail"


def test_pk_gaps_across_bucket_seams(spark):
    from opengauss_tools_datachecker_performance_spark.checks.constraints import (
        pk_gaps,
    )

    # keys 0..99 missing 10-14 and 50; 2 buckets force the seam logic
    keys = [k for k in range(100) if not (10 <= k <= 14 or k == 50)]
    df = spark.createDataFrame([(k,) for k in keys], "id long")
    got = {
        (r.gap_start, r.gap_end, r.gap_len)
        for r in pk_gaps(df, "id", n_buckets=2).collect()
    }
    assert got == {(10, 14, 5), (50, 50, 1)}
    # duplicates and an empty frame are fine
    dup = spark.createDataFrame([(1,), (1,), (3,)], "id long")
    assert {(r.gap_start, r.gap_end) for r in pk_gaps(dup, "id").collect()} == {
        (2, 2)
    }
    empty = spark.createDataFrame([], "id long")
    assert pk_gaps(empty, "id").count() == 0


# --- distributions ----------------------------------------------------


def test_benford_profile_counts(spark):
    from opengauss_tools_datachecker_performance_spark.checks.distributions import (
        benford_profile,
    )

    # 1.00 x3, 2.50 x1, 0.005 excluded (< 0.01), NULL excluded
    df = spark.createDataFrame(
        [(1.0,), (1.0,), (1.0,), (2.5,), (0.005,), (None,)], "x double"
    )
    rows = {r.digit: r for r in benford_profile(df, "x").collect()}
    assert set(rows) == {1, 2}
    assert rows[1].n == 3 and rows[1].observed_p == "0.750000"
    assert rows[1].expected_p == "0.301030"


def test_chi2_drift_new_category_null_term(spark):
    from opengauss_tools_datachecker_performance_spark.checks.distributions import (
        categorical_drift_chi2,
    )

    src = spark.createDataFrame([("a",)] * 3 + [("b",)], "c string")
    sink = spark.createDataFrame([("a",)] * 2 + [("z",)] * 2, "c string")
    rows = {r.category: r for r in categorical_drift_chi2(src, sink, "c").collect()}
    assert rows["z"].n_src == 0 and rows["z"].chi2_term is None
    assert rows["b"].n_sink == 0 and rows["b"].chi2_term is not None
    assert rows["a"].p_src == "0.750000" and rows["a"].p_sink == "0.500000"


def test_mad_outliers_degenerate_and_planted(spark):
    from opengauss_tools_datachecker_performance_spark.checks.distributions import (
        mad_outliers,
    )

    # >half identical -> MAD 0 -> no outliers rather than div-by-zero
    flat = spark.createDataFrame(
        [("a", 5.0), ("b", 5.0), ("c", 5.0), ("d", 9.0)], "k string, x double"
    )
    assert mad_outliers(flat, "k", "x").count() == 0
    spread = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("c", 3.0), ("d", 4.0), ("e", 5000.0)],
        "k string, x double",
    )
    got = [r.key for r in mad_outliers(spread, "k", "x").collect()]
    assert got == ["e"]
    empty = spark.createDataFrame([], "k string, x double")
    assert mad_outliers(empty, "k", "x").count() == 0


# --- CDC merge --------------------------------------------------------


def test_apply_cdc_dedupes_batch_by_order(spark):
    from opengauss_tools_datachecker_performance_spark.operators.cdc_apply import (
        apply_cdc,
    )

    snap = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    # key 1: update then delete (delete wins by ts); key 2: two updates
    # (later wins); key 9: insert
    changes = spark.createDataFrame(
        [
            (1, "a2", "u", 10),
            (1, None, "d", 20),
            (2, "b2", "u", 10),
            (2, "b3", "u", 30),
            (9, "new", "c", 5),
        ],
        "id long, v string, op string, ts long",
    )
    got = {
        r.id: r.v
        for r in apply_cdc(snap, changes, "id", order_cols=["ts"]).collect()
    }
    assert got == {2: "b3", 3: "c", 9: "new"}


def test_apply_cdc_without_order_cols(spark):
    from opengauss_tools_datachecker_performance_spark.operators.cdc_apply import (
        apply_cdc,
    )

    snap = spark.createDataFrame([(1, "a")], "id long, v string")
    changes = spark.createDataFrame(
        [(1, "a2", "u"), (2, "x", "c")], "id long, v string, op string"
    )
    got = {r.id: r.v for r in apply_cdc(snap, changes, "id").collect()}
    assert got == {1: "a2", 2: "x"}


# --- temporal ---------------------------------------------------------


def test_as_of_join_same_ts_and_no_prior(spark):
    from opengauss_tools_datachecker_performance_spark.operators.temporal import (
        as_of_join,
    )

    t0 = _ts("2024-01-01T10:00:00")
    t1 = _ts("2024-01-01T11:00:00")
    left = spark.createDataFrame(
        [(1, "u", t0), (2, "u", t1), (3, "v", t1)],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, "u", t0, 7.0), (11, "u", t1, 9.0)],
        "event_id long, user_id string, ts timestamp, value double",
    )
    got = {
        r.event_id: r.asof_value
        for r in as_of_join(
            left, right, "user_id", "ts", ["value"], tiebreak_cols=["event_id"]
        ).collect()
    }
    # same-timestamp right row is visible to the left row (right sorts first)
    assert got[1] == 7.0 and got[2] == 9.0
    # user with no right rows at all -> NULL
    assert got[3] is None


def test_sessionize_gap_boundary(spark):
    from opengauss_tools_datachecker_performance_spark.operators.temporal import (
        sessionize,
    )

    base = _ts("2024-01-01T00:00:00")
    rows = [
        ("u", base),
        ("u", base + datetime.timedelta(minutes=30)),  # exactly the gap: SAME session
        ("u", base + datetime.timedelta(minutes=60, seconds=1)),  # > gap: new
    ]
    df = spark.createDataFrame(rows, "user string, ts timestamp")
    out = sorted(
        (r.session_id, r.n_events)
        for r in sessionize(df, "user", "ts", gap_minutes=30).collect()
    )
    assert out == [(1, 2), (2, 1)]


def test_interval_count_boundaries_and_empty(spark):
    from opengauss_tools_datachecker_performance_spark.operators.temporal import (
        interval_count_bucketed,
    )

    s = _ts("2024-01-01T00:00:00")
    e = _ts("2024-01-01T02:00:00")
    points = spark.createDataFrame(
        [
            (s,),  # on start boundary: counted
            (e,),  # on end boundary: counted
            (e + datetime.timedelta(seconds=1),),  # outside
        ],
        "ts timestamp",
    )
    intervals = spark.createDataFrame(
        [("iv1", s, e), ("iv2", _ts("2030-01-01T00:00:00"), _ts("2030-01-01T01:00:00"))],
        "interval_id string, start_ts timestamp, end_ts timestamp",
    )
    got = {
        r.interval_id: r.n_points
        for r in interval_count_bucketed(points, intervals, "ts").collect()
    }
    assert got == {"iv1": 2, "iv2": 0}


# --- wave 16 ----------------------------------------------------------


def test_json_field_audit_classification(spark):
    from opengauss_tools_datachecker_performance_spark.checks.constraints import (
        json_field_audit,
    )

    df = spark.createDataFrame(
        [
            ('{"k": 5}',),     # with field
            ('{"k": 7}',),     # with field
            ('{"other": 1}',), # valid, field missing
            ('{"k":',),        # malformed
            (None,),           # null raw
        ],
        "props string",
    )
    [r] = json_field_audit(df, "props", "k", "int").collect()
    assert (r.n_rows, r.n_null_raw, r.n_malformed, r.n_missing_field) == (
        5, 1, 1, 1,
    )
    assert (r.n_with_field, r.min_val, r.max_val, r.sum_val) == (2, 5, 7, 12)


def test_containment_asymmetry(spark):
    from opengauss_tools_datachecker_performance_spark.operators.dedup import (
        containment_pairs,
    )

    long_text = " ".join(f"w{i} w{i+1} token{i}" for i in range(12))
    prefix = " ".join(long_text.split()[:10])
    docs = spark.createDataFrame(
        [("big", long_text), ("small", prefix), ("other", "entirely different words here now")],
        "doc_id string, text string",
    )
    got = {
        (r.doc_id, r.container_id): r.containment
        for r in containment_pairs(docs, "doc_id", "text", threshold=0.8).collect()
    }
    # the prefix doc is fully contained in the big doc...
    assert got.get(("small", "big")) == 1.0
    # ...but NOT vice versa (asymmetry), and the unrelated doc is absent
    assert ("big", "small") not in got
    assert not any("other" in k for k in got)


def test_equiwidth_histogram_edges(spark):
    from opengauss_tools_datachecker_performance_spark.checks.distributions import (
        equiwidth_histogram,
    )

    df = spark.createDataFrame(
        [(0.0,), (5.0,), (9.99,), (10.0,), (None,)], "x double"
    )
    rows = {r.bin: r for r in equiwidth_histogram(df, "x", n_bins=10).collect()}
    # max value clamps into the LAST bin, not an 11th
    assert max(rows) == 9 and rows[9].n == 2  # 9.99 and 10.0
    assert rows[0].n == 1 and rows[5].n == 1
    # degenerate: all values equal -> one bin carrying the count
    same = spark.createDataFrame([(3.0,), (3.0,)], "x double")
    [one] = equiwidth_histogram(same, "x").collect()
    assert one.bin == 0 and one.n == 2
    empty = spark.createDataFrame([], "x double")
    assert equiwidth_histogram(empty, "x").count() == 0


# --- wave 17 ----------------------------------------------------------


def test_rate_anomaly_dense_spine_flags_outage(spark):
    from opengauss_tools_datachecker_performance_spark.operators.temporal import (
        rate_anomaly,
    )

    base = _ts("2024-01-01T00:00:00")
    rows = []
    # steady 10 events/hour for 30 hours, except hour 27 is an OUTAGE
    # (zero events — no row at all) and hour 28 is a 10x burst
    for h in range(30):
        n = 0 if h == 27 else (100 if h == 28 else 10)
        for i in range(n):
            rows.append(("svc", base + datetime.timedelta(hours=h, seconds=i)))
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {
        r.window_start.hour + 24 * (r.window_start.day - 1): r
        for r in rate_anomaly(df, "ts", "event_type", 60, 24, 3.0).collect()
    }
    assert len(out) == 30  # dense spine: the empty hour 27 EXISTS
    assert out[27].n_events == 0 and out[27].anomalous is True
    assert out[28].anomalous is True
    assert out[10].anomalous is False  # steady hour


def test_join_explosion_audit_ranks_fanout(spark):
    from opengauss_tools_datachecker_performance_spark.operators.skew import (
        join_explosion_audit,
    )

    left = spark.createDataFrame(
        [("hot",)] * 100 + [("warm",)] * 10 + [("cold",)], "k string"
    )
    right = spark.createDataFrame(
        [("hot",)] * 50 + [("warm",)] * 5 + [("never",)], "k string"
    )
    rows = join_explosion_audit(left, right, ["k"], top_k=5).collect()
    assert [r.k for r in rows] == ["hot", "warm"]  # 'cold'/'never' never meet
    assert rows[0].n_out == 5000 and rows[1].n_out == 50


def test_childless_parents_basic(spark):
    from opengauss_tools_datachecker_performance_spark.checks.referential import (
        childless_parents,
    )

    parents = spark.createDataFrame([(1,), (2,), (3,)], "pid long")
    children = spark.createDataFrame([(1,), (1,), (3,)], "parent_id long")
    got = {
        r.pid
        for r in childless_parents(
            parents, children, ["parent_id"], parent_key_cols=["pid"]
        ).collect()
    }
    assert got == {2}


def test_cluster_size_histogram_counts(spark):
    from opengauss_tools_datachecker_performance_spark.operators.components import (
        cluster_size_histogram,
    )

    labels = spark.createDataFrame(
        [("a", "c1"), ("b", "c1"), ("c", "c2"), ("d", "c2"), ("e", "c2"),
         ("f", "c3"), ("g", "c3")],
        "id string, component string",
    )
    got = {
        r.cluster_size: r.n_clusters
        for r in cluster_size_histogram(labels).collect()
    }
    assert got == {2: 2, 3: 1}


def test_dedup_rate_by_group_counts_removable(spark):
    from opengauss_tools_datachecker_performance_spark.operators.dedup import (
        dedup_rate_by_group,
    )

    docs = spark.createDataFrame(
        [
            ("s1", "1", "same"), ("s1", "2", "same"), ("s1", "3", "same"),
            ("s1", "4", "unique"),
            ("s2", "5", "x"), ("s2", "6", "y"),
        ],
        "source string, doc_id string, text string",
    )
    got = {
        r.group: (r.n_docs, r.n_dup_docs, r.n_groups_with_dups, r.dup_rate)
        for r in dedup_rate_by_group(docs, "doc_id", "text", "source").collect()
    }
    assert got["s1"] == (4, 2, 1, "0.500000")
    assert got["s2"] == (2, 0, 0, "0.000000")


def test_interval_count_inverted_interval_reports_zero(spark):
    from opengauss_tools_datachecker_performance_spark.operators.temporal import (
        interval_count_bucketed,
    )

    s = _ts("2024-01-01T00:00:00")
    points = spark.createDataFrame([(s,)], "ts timestamp")
    intervals = spark.createDataFrame(
        [("ok", s, s), ("inverted", s, _ts("2023-12-31T00:00:00"))],
        "interval_id string, start_ts timestamp, end_ts timestamp",
    )
    got = {
        r.interval_id: r.n_points
        for r in interval_count_bucketed(points, intervals, "ts").collect()
    }
    # inverted interval stays in the output with 0, never explodes a
    # descending bucket sequence
    assert got == {"ok": 1, "inverted": 0}


def test_json_field_audit_all_null_column(spark):
    from opengauss_tools_datachecker_performance_spark.checks.constraints import (
        json_field_audit,
    )

    df = spark.createDataFrame([(None,), (None,)], "props string")
    [r] = json_field_audit(df, "props", "k", "int").collect()
    assert (r.n_rows, r.n_null_raw, r.n_malformed, r.n_with_field) == (2, 2, 0, 0)
    assert r.sum_val is None


def test_rate_anomaly_single_event(spark):
    from opengauss_tools_datachecker_performance_spark.operators.temporal import (
        rate_anomaly,
    )

    df = spark.createDataFrame(
        [("t", _ts("2024-01-01T05:30:00"))], "event_type string, ts timestamp"
    )
    [r] = rate_anomaly(df, "ts", "event_type").collect()
    # one window, no trailing history -> no verdict, not a crash
    assert r.n_events == 1 and r.z is None and r.anomalous is None


def test_as_of_join_empty_left(spark):
    from opengauss_tools_datachecker_performance_spark.operators.temporal import (
        as_of_join,
    )

    left = spark.createDataFrame(
        [], "event_id long, user_id string, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, "u", _ts("2024-01-01T00:00:00"), 5.0)],
        "event_id long, user_id string, ts timestamp, value double",
    )
    assert (
        as_of_join(left, right, "user_id", "ts", ["value"]).count() == 0
    )


def test_containment_single_doc_and_empty(spark):
    from opengauss_tools_datachecker_performance_spark.operators.dedup import (
        containment_pairs,
    )

    one = spark.createDataFrame([("a", "just one document here")],
                                "doc_id string, text string")
    assert containment_pairs(one, "doc_id", "text").count() == 0
    empty = spark.createDataFrame([], "doc_id string, text string")
    assert containment_pairs(empty, "doc_id", "text").count() == 0


def test_winnowing_guarantee_and_density(spark):
    """Schleimer et al.'s core guarantee: documents sharing a substring
    of ≥ window+k-1 tokens share at least one identical fingerprint;
    and the fingerprint set is a strict subset of the k-gram stream."""
    from opengauss_tools_datachecker_performance_spark.operators.dedup import (
        winnow_fingerprints,
    )

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = w+k-1
    docs = spark.createDataFrame(
        [
            ("a", "intro words here " + shared + " tail one"),
            ("b", "совершенно other prefix " + shared + " different ending"),
            ("c", "no overlap with anything else at all whatsoever"),
        ],
        "doc_id string, text string",
    )
    fps = winnow_fingerprints(docs, "doc_id", "text", shingle_k=3, window=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc["a"] & by_doc["b"], "shared substring must share a fingerprint"
    assert not (by_doc["a"] & by_doc["c"])
    # density: fingerprints ≈ 1/window of gram positions, never more
    n_tokens_a = len(("intro words here " + shared + " tail one").split())
    n_grams_a = n_tokens_a - 3 + 1
    assert len(by_doc["a"]) < n_grams_a
    # determinism across runs
    again = {
        (r.doc_id, r.pos, r.fp)
        for r in winnow_fingerprints(docs, "doc_id", "text", 3, 4).collect()
    }
    first = {(r.doc_id, r.pos, r.fp) for r in fps.collect()}
    assert again == first
