"""Corpus-hygiene operators: decontamination, repetition stats, PII
scan (functions/text.py + operators/decontamination.py)."""

from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.functions.text import (
    pii_scan,
    repetition_stats,
)
from opengauss_tools_datachecker_performance_spark.operators.decontamination import (
    decontaminate,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_decontaminate_flags_exact_and_near_copies(spark):
    bench = _docs(
        spark,
        [("b1", "the quick brown fox jumps over the lazy dog tonight")],
    )
    corpus = _docs(
        spark,
        [
            # exact benchmark copy → every shingle shared
            ("c1", "the quick brown fox jumps over the lazy dog tonight"),
            # near copy (prefix changed) → most shingles still shared
            ("c2", "a quick brown fox jumps over the lazy dog tonight"),
            # unrelated → no shared shingles
            ("c3", "completely different words about spark and parquet files"),
            # single shared shingle ("the lazy dog") → below min_shared=2
            ("c4", "walking past the lazy dog without any other overlap here"),
        ],
    )
    got = {
        r["doc_id"]: (r["n_shared"], r["contaminated"])
        for r in decontaminate(corpus, bench, min_shared=2).collect()
    }
    assert got["c1"][1] and got["c1"][0] == got_n_shingles(corpus, "c1", spark)
    assert got["c2"][1] and got["c2"][0] >= 6
    assert got["c3"] == (0, False)
    assert got["c4"][0] == 1 and not got["c4"][1]


def got_n_shingles(corpus, doc, spark):
    from opengauss_tools_datachecker_performance_spark.functions.text import (
        shingle_rows,
    )

    return (
        shingle_rows(corpus, "doc_id", "text")
        .filter(F.col("doc_id") == doc)
        .count()
    )


def test_decontaminate_min_frac_gate(spark):
    bench = _docs(spark, [("b1", "alpha beta gamma delta")])
    corpus = _docs(
        spark,
        # shares the 2 benchmark shingles but they are a tiny fraction
        # of this long doc — min_frac filters it out
        [("c1", "alpha beta gamma delta " + " ".join(f"w{i}" for i in range(40)))],
    )
    loose = decontaminate(corpus, bench, min_shared=2).collect()[0]
    strict = decontaminate(corpus, bench, min_shared=2, min_frac=0.5).collect()[0]
    assert loose["contaminated"] and not strict["contaminated"]


def test_repetition_stats_planted(spark):
    d = _docs(
        spark,
        [
            ("r1", "buy now buy now buy now"),          # 6 toks, 2 distinct
            ("r2", "one two three four five six"),      # no repetition
            ("r3", "single"),                            # 1 token, no bigram
        ],
    )
    got = {r["doc_id"]: r for r in repetition_stats(d).collect()}
    r1 = got["r1"]
    assert r1["n_tokens"] == 6 and r1["n_distinct_tokens"] == 2
    assert abs(r1["dup_token_frac"] - (1 - 2 / 6)) < 1e-12
    # bigrams: 'buy now' x3, 'now buy' x2 → top covers 6/6 tokens
    assert r1["top_bigram"] == "buy now"
    assert abs(r1["top_bigram_frac"] - 1.0) < 1e-12
    r2 = got["r2"]
    assert r2["dup_token_frac"] == 0.0
    # all bigrams count 1 → lexicographic tie-break
    assert r2["top_bigram"] == "five six"
    assert abs(r2["top_bigram_frac"] - 2 / 6) < 1e-12
    r3 = got["r3"]
    assert r3["top_bigram"] is None and r3["top_bigram_frac"] == 0.0


def test_pii_scan_counts(spark):
    d = _docs(
        spark,
        [
            ("p1", "mail a@b.org and c.d+e@f-g.co, server 10.0.0.7 up"),
            ("p2", "call +1-555-12345 or +44-020-7946"),
            ("p3", "nothing sensitive here, version 1.2 build 3"),
        ],
    )
    got = {r["doc_id"]: r for r in pii_scan(d).collect()}
    assert got["p1"]["n_email"] == 2
    assert got["p1"]["n_ipv4"] == 1 and got["p1"]["has_pii"]
    assert got["p2"]["n_phone"] == 2
    assert got["p3"]["n_email"] == 0
    assert got["p3"]["n_ipv4"] == 0  # 1.2 / versions must not match
    assert not got["p3"]["has_pii"]


def test_decontaminate_benchmark_set_broadcasts(spark):
    """The benchmark shingle set must reach the corpus-side join as a
    broadcast (no corpus-sized shuffle) when broadcast_benchmark=True."""
    bench = _docs(spark, [("b1", "alpha beta gamma delta epsilon")])
    corpus = _docs(spark, [("c%d" % i, "alpha beta gamma delta epsilon word%d" % i) for i in range(20)])
    out = decontaminate(corpus, bench)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_mixing_plan_targets_and_clamp(spark):
    from opengauss_tools_datachecker_performance_spark.operators.curation import (
        mixing_plan,
    )

    docs = _docs(
        spark,
        # srcA: 2 docs x 4 tokens = 8; srcB: 1 doc x 4 tokens = 4
        [
            ("a1", "one two three four"),
            ("a2", "five six seven eight"),
            ("b1", "nine ten eleven twelve"),
        ],
    ).withColumn(
        "source", F.when(F.col("doc_id").startswith("a"), "srcA").otherwise("srcB")
    )
    got = {
        r["source"]: r
        for r in mixing_plan(
            docs, {"srcA": 1.0, "srcB": 3.0}, token_budget=16
        ).collect()
    }
    a, b = got["srcA"], got["srcB"]
    assert (a["n_docs"], a["n_tokens"]) == (2, 8)
    # srcA target = 1/4 * 16 = 4 of 8 available → rate 0.5, no oversample
    assert abs(a["target_tokens"] - 4.0) < 1e-12
    assert abs(a["sample_rate"] - 0.5) < 1e-12
    # srcB target = 3/4 * 16 = 12 of 4 available → 3 epochs, rate clamps to 1
    assert abs(b["epochs"] - 3.0) < 1e-12
    assert b["sample_rate"] == 1.0
    # a source with no weight entry gets default 0 → rate 0
    got0 = {
        r["source"]: r
        for r in mixing_plan(docs, {"srcA": 1.0}, token_budget=16).collect()
    }
    assert got0["srcB"]["weight"] == 0.0 and got0["srcB"]["sample_rate"] == 0.0


def test_cli_decontaminate(spark, tmp_path):
    """--decontaminate-table/--decontaminate-benchmark: flagged docs in
    contaminated.parquet, count in summary.json; a later run WITHOUT
    the flags clears the stale frame."""
    import json
    import os

    from opengauss_tools_datachecker_performance_spark.__main__ import main
    from opengauss_tools_datachecker_performance_spark.synth import write_corpus

    corpus_dir = str(tmp_path / "corpus")
    write_corpus(spark, corpus_dir, n_docs=200, n_assets=20, n_partitions=2)
    bench_text = "held out evaluation question answer pair " * 5
    docs = _docs(
        spark,
        [("d%d" % i, "plain words number %d only here" % i) for i in range(30)]
        + [("leak1", bench_text.strip()), ("leak2", bench_text.strip() + " x")],
    )
    docs_path = str(tmp_path / "docs.parquet")
    docs.write.parquet(docs_path)
    bench_path = str(tmp_path / "bench.parquet")
    _docs(spark, [("b0", bench_text.strip())]).write.parquet(bench_path)

    report = str(tmp_path / "report")
    args = [
        "--source", f"{corpus_dir}/docs_source.parquet",
        "--sink", f"{corpus_dir}/docs_sink.parquet",
        "--report-dir", report,
        "--decontaminate-table", docs_path,
        "--decontaminate-benchmark", bench_path,
    ]
    main(args, spark=spark)
    flagged = spark.read.parquet(os.path.join(report, "contaminated.parquet"))
    assert {r["doc_id"] for r in flagged.collect()} == {"leak1", "leak2"}
    s = json.load(open(os.path.join(report, "summary.json")))
    assert s["decontamination"]["n_contaminated"] == 2

    # one flag without the other is rejected at argparse time
    import pytest

    with pytest.raises(SystemExit):
        main(
            ["--source", f"{corpus_dir}/docs_source.parquet",
             "--report-dir", report, "--decontaminate-table", docs_path],
            spark=spark,
        )

    # fresh run without the flags clears the stale frame + section
    main(
        ["--source", f"{corpus_dir}/docs_source.parquet",
         "--sink", f"{corpus_dir}/docs_sink.parquet",
         "--report-dir", report],
        spark=spark,
    )
    assert not os.path.exists(os.path.join(report, "contaminated.parquet"))
    s2 = json.load(open(os.path.join(report, "summary.json")))
    assert "decontamination" not in s2


def test_repetition_stats_empty_doc_no_ansi_crash(spark):
    """Empty/whitespace-only docs must yield zeros, not a
    DIVIDE_BY_ZERO job abort under Spark 4's ANSI default."""
    d = _docs(spark, [("e1", ""), ("e2", "   "), ("e3", "hello world")])
    got = {r["doc_id"]: r for r in repetition_stats(d).collect()}
    for k in ("e1", "e2"):
        assert got[k]["n_tokens"] == 0
        assert got[k]["dup_token_frac"] == 0.0
        assert got[k]["top_bigram_frac"] == 0.0
    assert got["e3"]["n_tokens"] == 2


def test_mixing_plan_empty_weights(spark):
    from opengauss_tools_datachecker_performance_spark.operators.curation import (
        mixing_plan,
    )

    docs = _docs(spark, [("a1", "one two")]).withColumn("source", F.lit("srcA"))
    row = mixing_plan(docs, {}, token_budget=10).collect()[0]
    assert row["weight"] == 0.0 and row["sample_rate"] == 0.0


def test_cli_decontaminate_runs_on_resume_nothing_pending(spark, tmp_path):
    """resume with nothing pending must still honor a requested
    decontamination screen (it runs outside the wave loop)."""
    import json
    import os

    from opengauss_tools_datachecker_performance_spark.__main__ import main
    from opengauss_tools_datachecker_performance_spark.synth import write_corpus

    corpus_dir = str(tmp_path / "corpus")
    write_corpus(spark, corpus_dir, n_docs=120, n_assets=12, n_partitions=2)
    bench_text = "held out evaluation question answer pair " * 5
    docs_path = str(tmp_path / "docs.parquet")
    _docs(spark, [("leak", bench_text.strip()), ("ok", "plain words here")]).write.parquet(docs_path)
    bench_path = str(tmp_path / "bench.parquet")
    _docs(spark, [("b0", bench_text.strip())]).write.parquet(bench_path)

    report, ckpt = str(tmp_path / "report"), str(tmp_path / "ckpt")
    base = [
        "--source", f"{corpus_dir}/docs_source.parquet",
        "--sink", f"{corpus_dir}/docs_sink.parquet",
        "--report-dir", report, "--checkpoint-dir", ckpt,
    ]
    main(base, spark=spark)  # all partitions checkpoint as done
    # resume: nothing pending, but the screen is newly requested
    main(
        base + ["--resume", "--decontaminate-table", docs_path,
                "--decontaminate-benchmark", bench_path],
        spark=spark,
    )
    flagged = spark.read.parquet(os.path.join(report, "contaminated.parquet"))
    assert {r["doc_id"] for r in flagged.collect()} == {"leak"}
    s = json.load(open(os.path.join(report, "summary.json")))
    assert s["decontamination"]["n_contaminated"] == 1


def test_duplicate_spans_exact_boundaries(spark):
    """Two docs sharing a middle passage flag exactly that passage in
    BOTH docs; within-doc-only repetition does not flag (min_docs
    counts distinct docs); unrelated docs contribute nothing."""
    from opengauss_tools_datachecker_performance_spark.operators.substring_dedup import (
        duplicate_spans,
    )

    passage = "alpha beta gamma delta epsilon"  # 5 tokens
    d = _docs(
        spark,
        [
            # passage at token positions 2..6
            ("s1", "u1 u2 " + passage + " v1 v2 v3"),
            # same passage at positions 0..4
            ("s2", passage + " w1 w2"),
            # unrelated
            ("s3", "x1 x2 x3 x4 x5 x6 x7"),
            # repeats a passage only WITHIN itself → not cross-doc
            ("s4", "y1 rep1 rep2 rep3 y2 rep1 rep2 rep3 y3"),
        ],
    )
    got = {
        (r["doc_id"], r["start_pos"], r["end_pos"], r["span_tokens"])
        for r in duplicate_spans(d, min_docs=2).collect()
    }
    assert got == {("s1", 2, 6, 5), ("s2", 0, 4, 5)}


def test_span_removal_keep_first(spark):
    """removal_plan keeps the first carrier's copy (smallest doc_id,
    start_pos) and remove_spans cuts exactly the duplicated tokens
    from every other carrier."""
    from opengauss_tools_datachecker_performance_spark.operators.substring_dedup import (
        duplicate_spans,
        removal_plan,
        remove_spans,
    )

    passage = "alpha beta gamma delta epsilon"
    d = _docs(
        spark,
        [
            ("s1", "u1 u2 " + passage + " v1 v2 v3"),
            ("s2", passage + " w1 w2"),
            ("s3", "x1 x2 x3 x4 x5 x6 x7"),
        ],
    )
    spans = duplicate_spans(d, min_docs=2)
    keys = {r["passage_key"] for r in spans.collect()}
    assert len(keys) == 1  # identical passage → identical key
    plan = removal_plan(spans).collect()
    assert {(r["doc_id"], r["start_pos"], r["action"]) for r in plan} == {
        ("s1", 2, "keep"),
        ("s2", 0, "remove"),
    }
    got = {r["doc_id"]: r for r in remove_spans(d, removal_plan(spans)).collect()}
    assert got["s1"]["n_removed_tokens"] == 0  # keep-first carrier
    assert got["s1"]["clean_text"] == "u1 u2 " + passage + " v1 v2 v3"
    assert got["s2"]["n_removed_tokens"] == 5
    assert got["s2"]["clean_text"] == "w1 w2"
    assert got["s3"]["n_removed_tokens"] == 0


def test_span_removal_overlap_keeps_first_copy_intact(spark):
    """Adjacent duplicated passages produce OVERLAPPING spans with
    different passage_keys (islands separated by one non-duplicate
    position overlap by k-2 tokens). The kept first carrier's range
    must be protected from the overlapping removal — otherwise the
    passage could vanish from every doc in the corpus."""
    from opengauss_tools_datachecker_performance_spark.operators.substring_dedup import (
        duplicate_spans,
        removal_plan,
        remove_spans,
    )

    # m carries both passages: "a b c" (m is first carrier → keep) and
    # "c d e" (a2 is first carrier → m's copy is removable). The two
    # spans in m overlap at token 2 ("c").
    d = _docs(
        spark,
        [
            ("m", "a b c d e"),
            ("y", "a b c p1 q1"),
            ("a2", "c d e r1 s1"),
        ],
    )
    plan = removal_plan(duplicate_spans(d, min_docs=2))
    got = {r["doc_id"]: r for r in remove_spans(d, plan).collect()}
    # keep-one guarantee: "a b c" survives verbatim in m (its first
    # carrier), even though m's overlapping "c d e" span is removed
    assert got["m"]["clean_text"] == "a b c"
    assert got["m"]["n_removed_tokens"] == 2  # d e, NOT c
    assert got["y"]["clean_text"] == "p1 q1"
    assert got["a2"]["clean_text"] == "c d e r1 s1"  # first carrier kept


def test_remove_spans_null_text_passthrough(spark):
    """Null-text docs pass through with 0 tokens and empty clean_text
    (not nulls), matching the oracle's COALESCE fingerprint."""
    from opengauss_tools_datachecker_performance_spark.operators.substring_dedup import (
        duplicate_spans,
        removal_plan,
        remove_spans,
    )

    d = _docs(spark, [("n1", None), ("n2", "w1 w2 w3")])
    got = {
        r["doc_id"]: r
        for r in remove_spans(d, removal_plan(duplicate_spans(d))).collect()
    }
    assert got["n1"]["n_tokens"] == 0
    assert got["n1"]["n_removed_tokens"] == 0
    assert got["n1"]["clean_text"] == ""


def test_cli_substring_dedup(spark, tmp_path):
    """--substring-dedup-table: duplicate_spans.parquet +
    span_removals.parquet + (with --substring-dedup-apply)
    clean_docs.parquet land in the report dir, counts in summary.json;
    a later run WITHOUT the flag clears the stale frames."""
    import json
    import os

    from opengauss_tools_datachecker_performance_spark.__main__ import main
    from opengauss_tools_datachecker_performance_spark.synth import write_corpus

    corpus_dir = str(tmp_path / "corpus")
    write_corpus(spark, corpus_dir, n_docs=200, n_assets=20, n_partitions=2)
    passage = "alpha beta gamma delta epsilon"
    docs = _docs(
        spark,
        [("p1", "u1 u2 " + passage + " v1 v2"), ("p2", passage + " w1 w2")]
        + [
            # per-doc-disjoint tokens: shared filler words would form
            # shared k-shingles and flag as cross-doc passages
            ("d%d" % i, " ".join("t%dw%d" % (i, j) for j in range(6)))
            for i in range(20)
        ],
    )
    docs_path = str(tmp_path / "docs.parquet")
    docs.write.parquet(docs_path)

    report = str(tmp_path / "report")
    main(
        ["--source", f"{corpus_dir}/docs_source.parquet",
         "--sink", f"{corpus_dir}/docs_sink.parquet",
         "--report-dir", report,
         "--substring-dedup-table", docs_path,
         "--substring-dedup-apply"],
        spark=spark,
    )
    spans = spark.read.parquet(os.path.join(report, "duplicate_spans.parquet"))
    assert {r["doc_id"] for r in spans.collect()} == {"p1", "p2"}
    plan = spark.read.parquet(os.path.join(report, "span_removals.parquet"))
    assert {(r["doc_id"], r["start_pos"], r["action"]) for r in plan.collect()} == {
        ("p1", 2, "keep"),
        ("p2", 0, "remove"),
    }
    clean = {
        r["doc_id"]: r
        for r in spark.read.parquet(
            os.path.join(report, "clean_docs.parquet")
        ).collect()
    }
    assert clean["p2"]["clean_text"] == "w1 w2"
    assert clean["p1"]["n_removed_tokens"] == 0
    s = json.load(open(os.path.join(report, "summary.json")))
    assert s["substring_dedup"]["n_duplicate_spans"] == 2
    assert s["substring_dedup"]["n_removals"] == 1
    assert s["substring_dedup"]["n_docs_affected"] == 1
    assert s["substring_dedup"]["n_tokens_planned"] == 5
    assert s["substring_dedup"]["n_tokens_removed"] == 5

    # fresh scan WITHOUT --apply: rewrites spans+plan but must clear
    # the previous apply run's clean_docs — a stale cleaned corpus
    # next to a summary section with no n_tokens_removed would read
    # as current output (regression test: this cleanup was wrongly
    # coupled to --near-dup-clusters)
    main(
        ["--source", f"{corpus_dir}/docs_source.parquet",
         "--sink", f"{corpus_dir}/docs_sink.parquet",
         "--report-dir", report,
         "--substring-dedup-table", docs_path],
        spark=spark,
    )
    assert os.path.exists(os.path.join(report, "duplicate_spans.parquet"))
    assert os.path.exists(os.path.join(report, "span_removals.parquet"))
    assert not os.path.exists(os.path.join(report, "clean_docs.parquet"))
    s_mid = json.load(open(os.path.join(report, "summary.json")))
    assert "n_tokens_removed" not in s_mid["substring_dedup"]

    # fresh run without the flags clears the stale frames + section
    main(
        ["--source", f"{corpus_dir}/docs_source.parquet",
         "--sink", f"{corpus_dir}/docs_sink.parquet",
         "--report-dir", report],
        spark=spark,
    )
    for frame in (
        "duplicate_spans.parquet",
        "span_removals.parquet",
        "clean_docs.parquet",
    ):
        assert not os.path.exists(os.path.join(report, frame))
    s2 = json.load(open(os.path.join(report, "summary.json")))
    assert "substring_dedup" not in s2
