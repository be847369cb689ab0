"""Driver-contract query catalog, wave 11: corpus-level statistics +
self-trained LM quality scoring (operators/corpus_stats.py).

* ``vocab_stats`` — top-100 vocabulary by total term frequency with
  document frequency (two-phase salted top-K on the Spark side; the
  oracle's single window is fine at DuckDB's sandbox scale).
* ``lm_surprisal`` — per-doc integer-bits surprisal under the
  corpus's own add-one-smoothed bigram model (the CCNet KenLM filter
  re-expressed; whole bits via exact integer bit-length so the JVM
  and DuckDB agree bit-for-bit — see operators/corpus_stats.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.entry_queries import (
    _SQL_NORM,
    _SQL_WS_TOKS,
    _t,
    query,
)

_TOKS = _SQL_WS_TOKS.format(t=_SQL_NORM.format(t="text"))

_SQL_NORM_DOCS = f"""
    norm AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id, {_TOKS} AS toks
      FROM documents
    )
"""


@query(
    "vocab_stats",
    f"""
    WITH {_SQL_NORM_DOCS},
    tok AS (SELECT doc_id, unnest(toks) AS token FROM norm),
    dt AS (SELECT doc_id, token, COUNT(*) AS n FROM tok GROUP BY 1, 2),
    v AS (
      SELECT token, CAST(SUM(n) AS BIGINT) AS tf,
             CAST(COUNT(*) AS BIGINT) AS df
      FROM dt GROUP BY 1
    ),
    r AS (
      SELECT token, tf, df,
             CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, token ASC) AS BIGINT)
               AS rank
      FROM v
    )
    SELECT token, tf, df, rank FROM r WHERE rank <= 100
    """,
)
def q_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary audit (operators.corpus_stats.vocab_stats):
    top-100 terms by total frequency, ties to token ascending."""
    from opengauss_tools_datachecker_performance_spark.operators.corpus_stats import (
        vocab_stats,
    )

    return vocab_stats(_t(spark, sf_dir, "documents"))


#: full-precision surprisal core — reused (decimal avg_bits intact) by
#: wave 14's budget_prune oracle, which ORDERS BY avg_bits numerically.
#: The registered lm_surprisal oracle wraps this with a VARCHAR cast so
#: the driver-facing output schema is hash-stable (a DECIMAL column
#: reaches pandas as float64 from DuckDB but decimal.Decimal from
#: Spark, and the driver's exact value hash sees those as different).
_SQL_LM_CORE = f"""
    WITH {_SQL_NORM_DOCS},
    bg AS (
      SELECT doc_id, unnest(
        CASE WHEN len(toks) >= 2
             THEN list_transform(range(1, len(toks)),
                                 i -> toks[i] || ' ' || toks[i+1])
             ELSE [] END) AS bigram
      FROM norm
    ),
    bgc AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg GROUP BY 1),
    hist AS (
      SELECT split_part(bigram, ' ', 1) AS w1, CAST(SUM(c2) AS BIGINT) AS c1
      FROM bgc GROUP BY 1
    ),
    voc AS (
      SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS v
      FROM (SELECT unnest(toks) AS token FROM norm)
    ),
    scored AS (
      SELECT bg.doc_id,
             length(bin(h.c1 + voc.v)) - length(bin(b.c2 + 1)) AS bits
      FROM bg
      JOIN bgc b USING (bigram)
      JOIN hist h ON h.w1 = split_part(bg.bigram, ' ', 1)
      CROSS JOIN voc
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(bits) AS BIGINT) AS surprisal_bits,
           CAST(round(SUM(bits)::DOUBLE / COUNT(*), 6) AS DECIMAL(10,6))
             AS avg_bits
    FROM scored GROUP BY 1
"""


@query(
    "lm_surprisal",
    f"""
    SELECT doc_id, n_bigrams, surprisal_bits,
           CAST(avg_bits AS VARCHAR) AS avg_bits
    FROM ({_SQL_LM_CORE})
    """,
)
def q_lm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-trained bigram-LM surprisal per doc
    (operators.corpus_stats.bigram_surprisal_scores). avg_bits is
    emitted as its exact 6-dp decimal STRING — the catalog's
    hash-stable output ground rule (entry_queries.py header)."""
    from opengauss_tools_datachecker_performance_spark.operators.corpus_stats import (
        bigram_surprisal_scores,
    )

    lm = bigram_surprisal_scores(_t(spark, sf_dir, "documents"))
    return lm.withColumn("avg_bits", F.col("avg_bits").cast("string"))


@query(
    "tfidf_top_terms",
    f"""
    WITH {_SQL_NORM_DOCS},
    tok AS (SELECT doc_id, unnest(toks) AS token FROM norm),
    dt AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tok GROUP BY 1, 2
    ),
    dfreq AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM dt GROUP BY 1
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM norm),
    scored AS (
      SELECT dt.doc_id, dt.token, dt.tf,
             CAST(length(bin(nd.n)) - length(bin(f.df)) AS BIGINT) AS idf_bits,
             dt.tf * (length(bin(nd.n)) - length(bin(f.df))) AS score
      FROM dt JOIN dfreq f USING (token) CROSS JOIN nd
    ),
    r AS (
      SELECT doc_id, token, tf, idf_bits,
             CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, token ASC)
                  AS BIGINT) AS rank
      FROM scored
    )
    SELECT doc_id, token, tf, idf_bits, rank FROM r WHERE rank <= 3
    """,
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc characteristic terms
    (operators.corpus_stats.tfidf_top_terms): tf · integer-bits idf,
    top-3, ties to token ascending."""
    from opengauss_tools_datachecker_performance_spark.operators.corpus_stats import (
        tfidf_top_terms,
    )

    return tfidf_top_terms(_t(spark, sf_dir, "documents"))


@query(
    "semantic_decontaminate",
    """
    WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    pert AS (
      SELECT vec_id + 100000 AS vec_id, list_transform(v, x -> x * 1.001) AS v
      FROM base WHERE vec_id % 41 = 0
    ),
    corpus AS (SELECT * FROM base UNION ALL SELECT * FROM pert),
    bench AS (SELECT vec_id AS bench_id, v AS bv FROM base WHERE vec_id % 41 = 0),
    hits AS (
      SELECT c.vec_id, MIN(b.bench_id) AS matched_benchmark_id
      FROM corpus c JOIN bench b
        ON list_cosine_similarity(c.v, b.bv) >= 0.99
      GROUP BY 1
    )
    SELECT c.vec_id,
           h.matched_benchmark_id IS NOT NULL AS contaminated,
           h.matched_benchmark_id
    FROM corpus c LEFT JOIN hits h USING (vec_id)
    """,
)
def q_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space eval-leak screen
    (operators.decontamination.semantic_decontaminate): benchmark =
    the %41 vectors; planted 1.001-scaled copies (+100000) must flag
    back to their source (scaling preserves cosine), as must the
    benchmark vectors themselves (cos(self)=1). The oracle is the
    brute-force corpus × benchmark screen — candidate recall of the
    IVF route must reproduce it exactly at this threshold."""
    from pyspark.sql import functions as F

    from opengauss_tools_datachecker_performance_spark.operators.decontamination import (
        semantic_decontaminate,
    )

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    bench = emb.filter(F.col("vec_id") % 41 == 0)
    pert = bench.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.001).alias("embedding"),
    )
    return semantic_decontaminate(emb.unionByName(pert), bench, threshold=0.99)


# ---------------------------------------------------------------------------
# composite quality filter (operators/quality.py)
# ---------------------------------------------------------------------------

from opengauss_tools_datachecker_performance_spark.functions.text import (  # noqa: E402
    EN_STOPWORDS,
)

_SQL_SW_LIST = "[" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + "]"

#: planted verdict mix: %29 docs truncated (too_short), %7 docs get
#: boilerplate (repetition/boilerplate), %13 docs get an email (pii);
#: non_english falls out of each doc's natural stopword density
_SQL_QF_DOCS = """
      SELECT doc_id,
             CASE WHEN doc_id % 29 = 0 THEN 'tiny doc'
                  ELSE text
                    || CASE WHEN doc_id % 7 = 0
                            THEN ' buy now buy now buy now' ELSE '' END
                    || CASE WHEN doc_id % 13 = 0
                            THEN ' contact user' || doc_id || '@example.com now'
                            ELSE '' END
             END AS text
      FROM documents
"""


#: the shared WITH-body computing per-doc rule verdicts (CTE ``r``) —
#: quality_filter and quality_by_source replay the identical rules
_SQL_QF_CORE = f"""
    docs2 AS ({_SQL_QF_DOCS}),
    norm AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id, text, {_TOKS} AS toks
      FROM docs2
    ),
    base AS (
      SELECT doc_id, text, toks, len(toks) AS n_tokens,
             len(list_distinct(toks)) AS n_distinct,
             CASE WHEN len(toks) >= 2
                  THEN list_transform(range(1, len(toks)),
                                      i -> toks[i] || ' ' || toks[i+1])
                  ELSE [] END AS bigrams
      FROM norm
    ),
    bc AS (
      SELECT doc_id, bg, COUNT(*) AS n
      FROM (SELECT doc_id, unnest(bigrams) AS bg FROM base)
      GROUP BY 1, 2
    ),
    top AS (
      SELECT doc_id, n,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY n DESC, bg ASC) AS rn
      FROM bc
    ),
    sig AS (
      SELECT b.doc_id, b.n_tokens,
             CASE WHEN b.n_tokens > 0
                  THEN 1.0::DOUBLE - b.n_distinct::DOUBLE / b.n_tokens
                  ELSE 0.0::DOUBLE END AS dup_frac,
             COALESCE(CASE WHEN b.n_tokens > 0
                           THEN 2.0::DOUBLE * t.n / b.n_tokens END,
                      0.0::DOUBLE) AS top_frac,
             CASE WHEN b.n_tokens > 0
                  THEN len(list_filter(b.toks,
                           x -> list_contains({_SQL_SW_LIST}, x)))::DOUBLE
                       / b.n_tokens
                  ELSE 0.0::DOUBLE END AS sw,
             (len(regexp_extract_all(b.text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) > 0
              OR len(regexp_extract_all(b.text,
                 '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b')) > 0
              OR len(regexp_extract_all(b.text,
                 '\\+\\d{{1,3}}-\\d{{3}}-\\d{{3,}}')) > 0) AS pii
      FROM base b
      LEFT JOIN (SELECT * FROM top WHERE rn = 1) t USING (doc_id)
    ),
    r AS (
      SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
             list_sort(list_filter([
               CASE WHEN n_tokens < 5 THEN 'too_short' END,
               CASE WHEN n_tokens > 50000 THEN 'too_long' END,
               CASE WHEN dup_frac > 0.30 THEN 'repetition' END,
               CASE WHEN top_frac > 0.20 THEN 'boilerplate' END,
               CASE WHEN sw < 0.05 THEN 'non_english' END,
               CASE WHEN pii THEN 'pii' END
             ], x -> x IS NOT NULL)) AS reasons
      FROM sig
    )
"""


def _planted_quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "source",
        F.when(F.col("doc_id") % 29 == 0, F.lit("tiny doc"))
        .otherwise(
            F.concat(
                F.col("text"),
                F.when(
                    F.col("doc_id") % 7 == 0,
                    F.lit(" buy now buy now buy now"),
                ).otherwise(F.lit("")),
                F.when(
                    F.col("doc_id") % 13 == 0,
                    F.concat(
                        F.lit(" contact user"),
                        F.col("doc_id").cast("string"),
                        F.lit("@example.com now"),
                    ),
                ).otherwise(F.lit("")),
            )
        )
        .alias("text"),
    )


@query(
    "quality_filter",
    f"""
    WITH {_SQL_QF_CORE}
    SELECT doc_id, n_tokens, len(reasons) = 0 AS keep,
           COALESCE(array_to_string(reasons, ','), '') AS reasons
    FROM r
    """,
)
def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite Gopher-rule verdict (operators.quality.quality_filter)
    over documents with planted short/boilerplate/PII docs. The sorted
    reasons array is flattened to a comma-joined string for the driver
    gate (an array column is unhashable in the driver's pandas-based
    value hasher); the operator itself keeps the typed array."""
    from opengauss_tools_datachecker_performance_spark.operators.quality import (
        quality_filter,
    )

    qf = quality_filter(_planted_quality_docs(spark, sf_dir).drop("source"))
    return qf.withColumn("reasons", F.concat_ws(",", "reasons"))


@query(
    "quality_by_source",
    f"""
    WITH {_SQL_QF_CORE},
    sel AS (
      SELECT doc_id,
             unnest(CASE WHEN len(reasons) = 0
                         THEN ['kept'] ELSE reasons END) AS reason
      FROM r
    )
    SELECT s.source, sel.reason, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM sel
    JOIN (SELECT CAST(doc_id AS VARCHAR) AS doc_id, source FROM documents) s
      USING (doc_id)
    GROUP BY 1, 2
    """,
)
def q_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The filter's audit rollup: drops per (source, rule) — what a
    100 TB run actually reads to see WHERE its corpus shrank (keeps
    count under reason='kept'). One explode + partial-agg groupBy over
    the verdict frame; the per-doc source map joins on doc_id."""
    from opengauss_tools_datachecker_performance_spark.operators.quality import (
        quality_filter,
    )

    d = _planted_quality_docs(spark, sf_dir)
    qf = quality_filter(d.drop("source"))
    src = d.select(F.col("doc_id").cast("string").alias("doc_id"), "source")
    rs = F.when(F.size("reasons") == 0, F.array(F.lit("kept"))).otherwise(
        F.col("reasons")
    )
    return (
        qf.join(src, "doc_id")
        .select("source", F.explode(rs).alias("reason"))
        .groupBy("source", "reason")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    )
