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


@query(
    "lm_surprisal",
    f"""
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
    """,
)
def q_lm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-trained bigram-LM surprisal per doc
    (operators.corpus_stats.bigram_surprisal_scores)."""
    from opengauss_tools_datachecker_performance_spark.operators.corpus_stats import (
        bigram_surprisal_scores,
    )

    return bigram_surprisal_scores(_t(spark, sf_dir, "documents"))
