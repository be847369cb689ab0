"""Corpus-curation operators: stratified sampling + packing plan."""

from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.operators.curation import (
    pack_manifest,
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


def test_pack_manifest_reconstructs_streams(spark):
    """Manifest slices tile each shard's token stream exactly: per
    (shard, bin), slice lengths sum to the bin's occupancy, offsets
    are contiguous, and per doc the [doc_from, doc_to) chunks tile
    [0, n_tokens)."""
    from opengauss_tools_datachecker_performance_spark.operators.curation import (
        pack_manifest,
    )

    budget = 7
    docs = _docs(spark)
    plan = token_pack_plan(docs, budget, n_shards=4)
    man = pack_manifest(plan).collect()  # budget travels with the plan
    n_tok = {r["doc_id"]: r["n_tokens"] for r in plan.collect()}

    by_doc, by_bin = {}, {}
    for r in man:
        by_doc.setdefault(r["doc_id"], []).append(r)
        by_bin.setdefault((r["shard"], r["bin"]), []).append(r)
    # per doc: chunks tile [0, n_tokens)
    for doc, rs in by_doc.items():
        rs = sorted(rs, key=lambda r: r["doc_from"])
        assert rs[0]["doc_from"] == 0
        for a, b in zip(rs, rs[1:]):
            assert a["doc_to"] == b["doc_from"]
        assert rs[-1]["doc_to"] == n_tok[doc]
    # per bin: slices are contiguous from their offsets and fit budget
    for (_, _), rs in by_bin.items():
        rs = sorted(rs, key=lambda r: r["bin_offset"])
        pos = 0  # contiguous stream ⇒ every bin covered from position 0
        for r in rs:
            assert r["bin_offset"] == pos
            pos += r["doc_to"] - r["doc_from"]
        assert pos <= budget
    # full bins (all but each shard's last) are exactly budget tokens
    last_bin = {}
    for (sh, b) in by_bin:
        last_bin[sh] = max(last_bin.get(sh, -1), b)
    for (sh, b), rs in by_bin.items():
        if b < last_bin[sh]:
            assert sum(r["doc_to"] - r["doc_from"] for r in rs) == budget


def test_token_pack_plan_is_jvm_side(spark):
    out = token_pack_plan(_docs(spark), 16, n_shards=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "PythonRDD" not in plan


def test_token_pack_plan_null_and_empty_text(spark):
    """NULL text counts as 0 tokens (not NULL/-1, which would corrupt
    the shard cumsum) and still receives a placement; the doc after a
    NULL doc packs as if the NULL doc were empty."""
    d = spark.createDataFrame(
        [("1", None), ("2", "a b c"), ("3", ""), ("4", "d e")],
        "doc_id string, text string",
    )
    rows = {r["doc_id"]: r for r in token_pack_plan(d, 4, n_shards=1).collect()}
    assert len(rows) == 4
    assert rows["1"]["n_tokens"] == 0 and rows["3"]["n_tokens"] == 0
    # total stream length is unaffected by the zero-token docs
    assert sum(r["n_tokens"] for r in rows.values()) == 5
    starts = sorted(
        r["bin"] * 4 + r["offset"] for r in rows.values()
    )
    assert starts[0] == 0 and starts[-1] <= 5
    # and the manifest simply omits them
    man = pack_manifest(token_pack_plan(d, 4, n_shards=1)).collect()
    assert {r["doc_id"] for r in man} == {"2", "4"}


def test_pack_manifest_budget_contract(spark):
    """The plan carries its budget: passing a (possibly different)
    budget alongside it is an error, and a plan without the column
    requires the explicit argument."""
    import pytest

    plan = token_pack_plan(_docs(spark, n=10), 7, n_shards=2)
    with pytest.raises(ValueError, match="already carries"):
        pack_manifest(plan, 8)
    with pytest.raises(ValueError, match="no budget"):
        pack_manifest(plan.drop("budget"))
    # external plan without the column: explicit budget still works
    a = pack_manifest(plan.drop("budget"), 7).collect()
    b = pack_manifest(plan).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_stratified_sample_hash_prefilter_exact(spark):
    """A stratum LARGER than the prefilter's survivor target
    (oversample*n + 256) takes the hash-threshold path; the sample
    must still be exactly the n smallest (portable_hash64(id), id)
    docs of the full stratum, ranked 1..n."""
    import hashlib

    n_docs, n = 700, 3  # target = 4*3 + 256 = 268 < 700 → prefilter on
    ids = [f"d{i}" for i in range(n_docs)]
    d = spark.createDataFrame(
        [(i, "s") for i in ids], "doc_id string, stratum string"
    )
    out = sorted(
        stratified_sample(d, "stratum", n).collect(),
        key=lambda r: r["sample_rank"],
    )
    phash = lambda s: int(hashlib.md5(s.encode()).hexdigest()[:15], 16)  # noqa: E731
    expected = sorted(ids, key=lambda i: (phash(i), i))[:n]
    assert [r["doc_id"] for r in out] == expected
    assert [r["sample_rank"] for r in out] == [1, 2, 3]
