"""Corpus-curation operators: stratified sampling + packing plan."""

from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.operators.curation import (
    stratified_sample,
    token_pack_plan,
)


def _docs(spark, n=90):
    rows = [
        (str(i), " ".join(f"w{i}_{j}" for j in range((i % 7) + 1)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_stratified_sample_caps_and_determinism(spark):
    d = _docs(spark).withColumn(
        "stratum",
        F.when(F.col("doc_id").cast("long") % 3 == 0, "a").otherwise("b"),
    )
    out1 = stratified_sample(d, "stratum", 5).collect()
    out2 = stratified_sample(d, "stratum", 5).collect()
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))  # seedless
    by_stratum = {}
    for r in out1:
        by_stratum.setdefault(r["stratum"], []).append(r["sample_rank"])
    assert set(by_stratum) == {"a", "b"}
    for ranks in by_stratum.values():
        assert sorted(ranks) == list(range(1, 6))


def test_stratified_sample_small_stratum_kept_whole(spark):
    d = spark.createDataFrame(
        [("1", "x"), ("2", "x")], "doc_id string, stratum string"
    )
    assert stratified_sample(d, "stratum", 5).count() == 2


def test_token_pack_plan_layout_invariants(spark):
    budget, shards = 7, 4
    rows = token_pack_plan(_docs(spark), budget, n_shards=shards).collect()
    assert len(rows) == 90
    # rebuild each shard's contiguous stream and check the closed form
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rs in by_shard.items():
        assert 0 <= shard < shards
        # start = bin*budget + offset is monotone in stream order
        rs = sorted(rs, key=lambda r: (r["bin"], r["offset"]))
        start = 0
        for r in rs:
            assert r["bin"] == start // budget
            assert r["offset"] == start % budget
            assert 0 <= r["offset"] < budget
            start += r["n_tokens"]


def test_token_pack_plan_is_jvm_side(spark):
    out = token_pack_plan(_docs(spark), 16, n_shards=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "PythonRDD" not in plan
