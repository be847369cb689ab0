"""Corpus statistics + bigram-surprisal LM scoring (operators/corpus_stats)."""

from __future__ import annotations

from collections import Counter

from opengauss_tools_datachecker_performance_spark.operators.corpus_stats import (
    bigram_surprisal_scores,
    vocab_stats,
)

DOCS = [
    ("1", "the cat sat on the mat"),
    ("2", "the dog sat on the log"),
    ("3", "cat and dog and cat"),
    ("4", "  The   CAT  sat  "),  # normalization: case + whitespace
    ("5", "solo"),  # 1 token → no bigrams
    ("6", ""),  # empty → no tokens at all
]


def _tokens(text: str) -> list[str]:
    return [t for t in text.lower().split() if t]


def _expected_vocab(top_k: int = 100):
    tf: Counter = Counter()
    df: Counter = Counter()
    for _, text in DOCS:
        toks = _tokens(text)
        tf.update(toks)
        df.update(set(toks))
    ranked = sorted(tf, key=lambda t: (-tf[t], t))[:top_k]
    return {
        t: (tf[t], df[t], i + 1) for i, t in enumerate(ranked)
    }


def _expected_surprisal():
    bigrams: Counter = Counter()
    vocab: set[str] = set()
    per_doc: dict[str, list[tuple[str, str]]] = {}
    for doc_id, text in DOCS:
        toks = _tokens(text)
        vocab.update(toks)
        pairs = list(zip(toks, toks[1:]))
        if pairs:
            per_doc[doc_id] = pairs
        bigrams.update(pairs)
    hist: Counter = Counter()
    for (w1, _), c in bigrams.items():
        hist[w1] += c
    v = len(vocab)
    out = {}
    for doc_id, pairs in per_doc.items():
        bits = [
            (hist[w1] + v).bit_length() - (bigrams[(w1, w2)] + 1).bit_length()
            for w1, w2 in pairs
        ]
        out[doc_id] = (len(bits), sum(bits), round(sum(bits) / len(bits), 6))
    return out


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


def test_vocab_stats_exact(spark):
    got = {
        r["token"]: (r["tf"], r["df"], r["rank"])
        for r in vocab_stats(_df(spark)).collect()
    }
    assert got == _expected_vocab()


def test_vocab_stats_top_k_cap(spark):
    rows = vocab_stats(_df(spark), top_k=3).collect()
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2, 3]
    # the global #1 must survive the salted pre-cap phase
    assert rows and min(rows, key=lambda r: r["rank"])["token"] == "the"


def test_bigram_surprisal_exact(spark):
    got = {
        r["doc_id"]: (r["n_bigrams"], r["surprisal_bits"], float(r["avg_bits"]))
        for r in bigram_surprisal_scores(_df(spark)).collect()
    }
    assert got == _expected_surprisal()
    # short docs are absent, not scored 0
    assert "5" not in got and "6" not in got
    # repeated common sequences surprise less than one-off sequences:
    # doc 4 is a prefix of doc 1's opening ("the cat sat") whose
    # bigrams all recur; doc 3's "and"-chain bigrams are singletons
    assert got["4"][2] <= got["3"][2]


def test_tfidf_top_terms_exact(spark):
    from opengauss_tools_datachecker_performance_spark.operators.corpus_stats import (
        tfidf_top_terms,
    )

    tf_by_doc: dict[str, Counter] = {}
    df_count: Counter = Counter()
    for doc_id, text in DOCS:
        toks = _tokens(text)
        if toks:
            tf_by_doc.setdefault(doc_id, Counter()).update(toks)
        df_count.update(set(toks))
    n = len(DOCS)
    expect = {}
    for doc_id, tf in tf_by_doc.items():
        scored = sorted(
            (
                (
                    -(tf[t] * (n.bit_length() - df_count[t].bit_length())),
                    t,
                )
                for t in tf
            ),
        )[:3]
        for i, (negscore, t) in enumerate(scored):
            expect[(doc_id, t)] = (
                tf[t],
                n.bit_length() - df_count[t].bit_length(),
                i + 1,
            )
    got = {
        (r["doc_id"], r["token"]): (r["tf"], r["idf_bits"], r["rank"])
        for r in tfidf_top_terms(
            spark.createDataFrame(DOCS, "doc_id string, text string")
        ).collect()
    }
    assert got == expect


def test_semantic_decontaminate_planted(spark):
    """Planted scaled copies flag back to their benchmark source; the
    benchmark vectors flag themselves; others stay clean."""
    import pyspark.sql.functions as F

    from opengauss_tools_datachecker_performance_spark.operators.decontamination import (
        semantic_decontaminate,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    bench = emb.filter(F.col("vec_id") % 41 == 0)
    pert = bench.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.001).alias("embedding"),
    )
    out = {
        r["vec_id"]: (r["contaminated"], r["matched_benchmark_id"])
        for r in semantic_decontaminate(
            emb.unionByName(pert), bench, threshold=0.99
        ).collect()
    }
    bench_ids = {r["vec_id"] for r in bench.collect()}
    assert bench_ids, "benchmark subset must be non-empty at sf0.001"
    for b in bench_ids:
        assert out[b] == (True, b)  # self-hit
        assert out[b + 100000] == (True, b)  # planted copy hits its source
    clean = [v for v, (c, _) in out.items() if not c]
    assert clean and all(v % 41 != 0 for v in clean if v < 100000)
