"""Skew handling: salted repartition balances hot-key layouts."""

from __future__ import annotations

from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.operators.skew import (
    salted_repartition,
    skew_factor,
)


def test_salted_repartition_balances_hot_prefix(spark):
    # 80% of rows share ONE key — the worst case for key-partitioning
    df = spark.range(10_000).select(
        F.when(F.col("id") % 5 < 4, F.lit("hot")).otherwise(
            F.col("id").cast("string")
        ).alias("prefix"),
        F.col("id").alias("payload"),
    )
    skewed = df.repartition(16, F.col("prefix"))
    salted = salted_repartition(df, "prefix", 16)
    sf_skewed, sf_salted = skew_factor(skewed), skew_factor(salted)
    # one task owns the hot key (AQE coalescing softens the raw ratio);
    # salting must spread it to near-uniform
    assert sf_skewed > 2.5, (sf_skewed, sf_salted)
    # residual ≤ ~2 is balls-in-bins variance of (key,salt) combos over
    # partitions — vs the unsalted ~13× single-task hot spot
    assert sf_salted < 2.0 and sf_skewed > 4 * sf_salted, (sf_skewed, sf_salted)


def test_salted_two_level_agg_exact(spark):
    """Two-level (key, salt) → key aggregation gives identical results
    to the direct groupBy for commutative folds (count + bit_xor)."""
    from opengauss_tools_datachecker_performance_spark.operators.skew import salt_col

    df = spark.range(5_000).select(
        (F.col("id") % 7).cast("string").alias("k"),
        F.xxhash64(F.col("id")).alias("v"),
    )
    direct = {
        (r["k"]): (r["n"], r["x"])
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.expr("bit_xor(v)").alias("x"))
        .collect()
    }
    two_level = {
        (r["k"]): (r["n"], r["x"])
        for r in df.withColumn("s", salt_col(["v"], 8))
        .groupBy("k", "s")
        .agg(F.count("*").alias("n"), F.expr("bit_xor(v)").alias("x"))
        .groupBy("k")
        .agg(F.sum("n").alias("n"), F.expr("bit_xor(x)").alias("x"))
        .collect()
    }
    assert direct == two_level


def test_global_rank_matches_sorted_enumeration(spark):
    """global_rank == row_number over the global order, on a skewed
    value distribution (clustered + sparse tail + negatives)."""
    from opengauss_tools_datachecker_performance_spark.operators.skew import global_rank

    df = spark.range(3_000).select(
        F.when(F.col("id") % 3 == 0, F.col("id"))
        .when(F.col("id") % 3 == 1, F.col("id") * 1000)
        .otherwise(-F.col("id"))
        .alias("k")
    )
    got = {r["k"]: r["rn"] for r in global_rank(df, ["k"], n_buckets=16).collect()}
    expect = {k: i + 1 for i, k in enumerate(sorted(got))}
    assert len(got) == 3_000
    assert got == expect


def test_global_rank_edge_cases(spark):
    from opengauss_tools_datachecker_performance_spark.operators.skew import global_rank

    empty = spark.range(0).select(F.col("id").alias("k"))
    assert global_rank(empty, ["k"]).collect() == []
    # constant leading key (span == 0): falls back to one bucket, ranks
    # by the tie-break column
    const = spark.range(50).select(
        F.lit(7).alias("k"), F.col("id").alias("tie")
    )
    rows = global_rank(const, ["k", "tie"], n_buckets=8).collect()
    assert sorted((r["tie"], r["rn"]) for r in rows) == [
        (i, i + 1) for i in range(50)
    ]
