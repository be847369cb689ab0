"""End-to-end curation pipeline composition: the post-validation path
a training-data build actually runs, each stage an operator from this
repo, chained on DataFrames (one lazy plan until the final asserts):

    near-dup clusters → survivor selection → benchmark decontamination
    → data-mixing plan → deterministic stratified sample → packing plan

Asserts the cross-stage contracts (drops compose, budgets hold), not
the per-operator math — that's each operator's own test/oracle."""

from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.operators.components import (
    connected_components,
)
from opengauss_tools_datachecker_performance_spark.operators.curation import (
    mixing_plan,
    stratified_sample,
    token_pack_plan,
)
from opengauss_tools_datachecker_performance_spark.operators.decontamination import (
    decontaminate,
)
from opengauss_tools_datachecker_performance_spark.operators.dedup import (
    exact_jaccard,
    minhash_band_buckets,
    lsh_candidate_pairs,
)


def _corpus(spark):
    """90 docs over 3 sources with per-doc-disjoint tokens (no accidental
    shingle overlap); doc 7's text duplicated into doc 107x (near-dup
    pair), docs 30/60/80 equal to the benchmark text."""
    base = [
        (
            i,
            f"src{i % 3}",
            " ".join(f"tok{i}w{j}" for j in range(30)),
        )
        for i in range(90)
    ]
    rows = []
    bench_text = "held out evaluation question answer pair " * 5
    for i, src, text in base:
        if i in (30, 60, 80):
            text = bench_text.strip()
        rows.append((str(i), src, text))
    dup_text = rows[7][2] + " tiny suffix"
    rows.append(("107x", "src1", dup_text))
    docs = spark.createDataFrame(rows, "doc_id string, source string, text string")
    bench = spark.createDataFrame(
        [("b0", bench_text.strip())], "doc_id string, text string"
    )
    return docs, bench


def test_full_curation_pipeline(spark):
    docs, bench = _corpus(spark)

    # 1. near-dup pairs → clusters → survivors (longest text, min id)
    buckets = minhash_band_buckets(docs, "doc_id", "text")
    pairs = lsh_candidate_pairs(buckets)
    verified = exact_jaccard(docs, "doc_id", "text", pairs).filter(
        F.col("jaccard") >= 0.5
    )
    comp = connected_components(verified.select("id_a", "id_b"))
    # keep min-id member per cluster; drop the rest
    losers = (
        comp.join(
            comp.groupBy("component").agg(F.min("id").alias("keep")),
            "component",
        )
        .filter(F.col("id") != F.col("keep"))
        .select(F.col("id").alias("doc_id"))
    )
    deduped = docs.join(losers, "doc_id", "left_anti")

    # the planted near-dup pair resolved to exactly one survivor
    kept_ids = {r["doc_id"] for r in deduped.select("doc_id").collect()}
    assert len({"7", "107x"} & kept_ids) == 1

    # 2. decontamination drops the benchmark copies
    decon = decontaminate(deduped, bench, min_shared=2)
    clean = deduped.join(
        decon.filter(F.col("contaminated")).select("doc_id"),
        "doc_id",
        "left_anti",
    )
    clean_ids = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert not {"30", "60", "80"} & clean_ids
    assert "0" in clean_ids  # ordinary docs survive

    # 3. mixing plan over the cleaned corpus
    plan = mixing_plan(
        clean, {"src0": 2.0, "src1": 1.0, "src2": 1.0}, token_budget=1200
    )
    rates = {r["source"]: r for r in plan.collect()}
    assert set(rates) == {"src0", "src1", "src2"}
    # src0 gets twice the token target of src1
    assert abs(
        rates["src0"]["target_tokens"] - 2 * rates["src1"]["target_tokens"]
    ) < 1e-9

    # 4. sample each source down by its plan (rate → per-stratum count)
    n_keep = {
        s: max(1, int(r["sample_rate"] * r["n_docs"])) for s, r in rates.items()
    }
    sampled = None
    for s, k in n_keep.items():
        part = stratified_sample(
            clean.filter(F.col("source") == s), "source", k
        )
        sampled = part if sampled is None else sampled.unionByName(part)
    got_counts = {
        r["stratum"]: r["n"]
        for r in sampled.groupBy("stratum").agg(F.count("*").alias("n")).collect()
    }
    assert got_counts == n_keep

    # 5. pack the sampled docs: placements tile each shard contiguously
    packed = token_pack_plan(
        clean.join(sampled.select("doc_id"), "doc_id"), budget=64, n_shards=4
    )
    rows = packed.collect()
    assert len(rows) == sum(n_keep.values())
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: (r["bin"], r["offset"]))
        pos = 0
        for r in shard_rows:
            assert r["bin"] * 64 + r["offset"] == pos
            pos += r["n_tokens"]
