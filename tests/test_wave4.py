"""Wave-4 operators: LSH ANN scale path, table rules, throughput window."""

from __future__ import annotations

import pyspark.sql.functions as F

from opengauss_tools_datachecker_performance_spark.checks.rules import TableRules
from opengauss_tools_datachecker_performance_spark.operators.similarity import (
    brute_force_topk,
    lsh_ann_topk,
    plane_weights,
)


def _embeddings(spark, n=200, dims=16):
    """Deterministic unit-ish vectors with planted near-duplicate pairs."""
    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dims - 1)),
            lambda d: F.sin(F.col("id") * 0.7 + d * 1.3),
        ).alias("embedding"),
    )
    return df


def test_plane_weights_deterministic_and_pm1():
    w1 = plane_weights(0, 3, 32)
    w2 = plane_weights(0, 3, 32)
    assert w1 == w2
    assert set(w1) <= {-1, 1}
    # different table/plane → different plane (w.h.p.)
    assert plane_weights(1, 3, 32) != w1


def test_lsh_ann_recall_vs_brute_force(spark):
    emb = _embeddings(spark, n=200, dims=16).cache()
    queries = emb.filter(F.col("vec_id") % 40 == 0)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(queries, emb, k=3).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in lsh_ann_topk(
            queries, emb, k=3, dims=16, n_planes=4, n_tables=4
        ).collect()
    }
    # with 4 tables × 4 planes on smooth vectors, recall should be high
    assert len(approx & exact) / len(exact) >= 0.5
    # quantized signatures return the same shape and obey k
    q = lsh_ann_topk(
        queries, emb, k=3, dims=16, n_planes=4, n_tables=4, quantize_scale=1e6
    )
    rows = q.collect()
    assert all(r.rank <= 3 for r in rows)
    assert all(r.query_id != r.neighbor_id for r in rows)


def test_table_rules_white_wins():
    names = ["orders", "lineitem", "events", "nation"]
    # white wins even when black would exclude orders
    tr = TableRules(white=["order.*"], black=["orders"])
    assert tr.select_tables(names) == ["orders"]
    assert TableRules(black=["e.*"]).select_tables(names) == [
        "orders", "lineitem", "nation",
    ]
    assert TableRules().select_tables(names) == names


def test_throughput_window_double_counts(spark):
    # 1h window sliding 30m ⇒ every event lands in exactly 2 windows
    ev = spark.range(100).select(
        F.col("id").alias("event_id"),
        (F.lit("2024-01-01 00:00:00").cast("timestamp")
         + F.make_interval(mins=F.col("id") * 7)).alias("ts"),
        F.lit(1.0).alias("value"),
    )
    win = (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    total = win.agg(F.sum("n_events")).collect()[0][0]
    assert total == 200


def test_brute_force_topk_vectorized_matches_jvm_exact(spark):
    """The Arrow/BLAS path returns the SAME (query, neighbor, rank)
    triples as the JVM interpreted-lambda baseline on well-separated
    vectors — the two differ only in float accumulation order."""
    from opengauss_tools_datachecker_performance_spark.operators.similarity import (
        brute_force_topk_vectorized,
    )

    emb = _embeddings(spark, n=200, dims=16).repartition(8)
    queries = emb.filter(F.col("vec_id") % 40 == 0)
    exact = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in brute_force_topk(queries, emb, k=5).collect()
    )
    fast = sorted(
        (r.query_id, r.neighbor_id, r.rank)
        for r in brute_force_topk_vectorized(queries, emb, k=5).collect()
    )
    assert fast == exact
    # empty query set degrades to an empty, correctly-typed frame
    none = brute_force_topk_vectorized(queries.limit(0), emb, k=5)
    assert none.count() == 0 and none.columns == ["query_id", "neighbor_id", "rank"]
