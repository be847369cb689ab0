"""Randomized property tests for the wave-15/16 operators: each Spark
plan must agree with a pure-Python brute-force oracle on ARBITRARY
inputs (hypothesis), not just the planted catalog fixtures."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@st.composite
def event_stream(draw):
    n_users = draw(st.integers(1, 4))
    rows = []
    eid = 0
    for u in range(n_users):
        n = draw(st.integers(1, 10))
        # seconds offsets; duplicates allowed ACROSS users, unique
        # within a user so session identity is deterministic
        offs = draw(
            st.lists(st.integers(0, 100_000), min_size=n, max_size=n, unique=True)
        )
        for o in offs:
            rows.append((eid, f"u{u}", o))
            eid += 1
    return rows


@settings(**_SETTINGS)
@given(event_stream(), st.integers(1, 200))
def test_sessionize_matches_bruteforce(spark, rows, gap_minutes):
    from opengauss_tools_datachecker_performance_spark.operators.temporal import (
        sessionize,
    )

    base = datetime.datetime(2024, 1, 1)
    data = [
        (e, u, base + datetime.timedelta(seconds=o)) for (e, u, o) in rows
    ]
    df = spark.createDataFrame(
        data, "event_id long, user string, ts timestamp"
    )
    got = {
        (r.user, r.session_id): r.n_events
        for r in sessionize(df, "user", "ts", gap_minutes=gap_minutes).collect()
    }
    # brute force: sort each user's offsets, split on gap
    want: dict = {}
    by_user: dict = {}
    for e, u, o in rows:
        by_user.setdefault(u, []).append(o)
    gap_s = gap_minutes * 60
    for u, offs in by_user.items():
        offs.sort()
        sid = 0
        prev = None
        for o in offs:
            if prev is None or o - prev > gap_s:
                sid += 1
            want[(u, sid)] = want.get((u, sid), 0) + 1
            prev = o
    assert got == want


@settings(**_SETTINGS)
@given(event_stream())
def test_as_of_join_matches_bruteforce(spark, rows):
    from opengauss_tools_datachecker_performance_spark.operators.temporal import (
        as_of_join,
    )

    base = datetime.datetime(2024, 1, 1)
    # even event ids are left (queries), odd are right (values)
    left = [
        (e, u, base + datetime.timedelta(seconds=o))
        for (e, u, o) in rows
        if e % 2 == 0
    ]
    right = [
        (e, u, base + datetime.timedelta(seconds=o), float(e))
        for (e, u, o) in rows
        if e % 2 == 1
    ]
    if not left:
        return
    ldf = spark.createDataFrame(
        left, "event_id long, user string, ts timestamp"
    )
    rdf = spark.createDataFrame(
        right, "event_id long, user string, ts timestamp, value double"
    )
    got = {
        r.event_id: r.asof_value
        for r in as_of_join(
            ldf, rdf, "user", "ts", ["value"], tiebreak_cols=["event_id"]
        ).collect()
    }
    for e, u, ts in left:
        cands = [
            (rts, rid)
            for (rid, ru, rts, _v) in right
            if ru == u and rts <= ts
        ]
        want = float(max(cands)[1]) if cands else None
        assert got[e] == want, (e, u, ts)


@settings(**_SETTINGS)
@given(
    st.lists(st.integers(0, 60), min_size=1, max_size=40, unique=True),
    st.integers(2, 8),
)
def test_pk_gaps_matches_bruteforce(spark, keys, n_buckets):
    from opengauss_tools_datachecker_performance_spark.checks.constraints import (
        pk_gaps,
    )

    df = spark.createDataFrame([(k,) for k in keys], "id long")
    got = {
        (r.gap_start, r.gap_end, r.gap_len)
        for r in pk_gaps(df, "id", n_buckets=n_buckets).collect()
    }
    ks = sorted(keys)
    want = set()
    for a, b in zip(ks, ks[1:]):
        if b - a > 1:
            want.add((a + 1, b - 1, b - a - 1))
    assert got == want


@settings(**_SETTINGS)
@given(
    st.dictionaries(
        st.integers(0, 9),
        st.text("ab", min_size=1, max_size=3),
        min_size=0,
        max_size=8,
    ),
    st.lists(
        st.tuples(
            st.integers(0, 9),
            st.sampled_from(["c", "u", "d"]),
            st.text("xy", min_size=1, max_size=3),
            st.integers(0, 100),
        ),
        max_size=12,
    ),
)
def test_apply_cdc_matches_bruteforce(spark, snap, changes):
    from opengauss_tools_datachecker_performance_spark.operators.cdc_apply import (
        apply_cdc,
    )

    # make (key, ts) unique so the latest image is well-defined
    seen = set()
    uniq = []
    for k, op, v, ts in changes:
        if (k, ts) not in seen:
            seen.add((k, ts))
            uniq.append((k, op, v, ts))
    snap_df = spark.createDataFrame(
        list(snap.items()) or [(None, None)], "id int, v string"
    ).filter("id is not null")
    if uniq:
        ch_df = spark.createDataFrame(uniq, "id int, op string, v string, ts int")
        got = {
            r.id: r.v
            for r in apply_cdc(
                snap_df, ch_df.select("id", "v", "op", "ts"), "id",
                order_cols=["ts"],
            ).collect()
        }
    else:
        got = {r.id: r.v for r in snap_df.collect()}
    want = dict(snap)
    latest: dict = {}
    for k, op, v, ts in uniq:
        if k not in latest or ts > latest[k][2]:
            latest[k] = (op, v, ts)
    for k, (op, v, _ts) in latest.items():
        if op == "d":
            want.pop(k, None)
        else:
            want[k] = v
    assert got == want


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3), st.integers(0, 3), st.sampled_from("xyz")
        ),
        min_size=1,
        max_size=25,
    )
)
def test_fd_discovery_matches_bruteforce(spark, rows):
    from opengauss_tools_datachecker_performance_spark.checks.constraints import (
        fd_discovery,
    )

    df = spark.createDataFrame(rows, "a int, b int, c string")
    cols = ["a", "b", "c"]
    got = {
        (r.lhs, r.rhs): (r.n_lhs_groups, r.n_violating_groups, r.holds)
        for r in fd_discovery(df, cols, max_violation_rate=0.2).collect()
    }
    data = [dict(zip(cols, r)) for r in rows]
    for lhs in cols:
        for rhs in cols:
            if lhs == rhs:
                continue
            mapping: dict = {}
            for row in data:
                mapping.setdefault(str(row[lhs]), set()).add(str(row[rhs]))
            n_groups = len(mapping)
            n_viol = sum(1 for v in mapping.values() if len(v) > 1)
            holds = n_viol / n_groups <= 0.2
            assert got[(lhs, rhs)] == (n_groups, n_viol, holds), (lhs, rhs)
