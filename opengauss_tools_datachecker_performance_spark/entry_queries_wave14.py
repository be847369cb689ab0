"""Driver-contract query catalog, wave 14: web-corpus curation.

* ``url_dedup`` — canonical-URL duplicate groups
  (functions/url.py): five deterministic messy variants per doc
  (case, www., default ports, tracking params, trailing slash,
  fragments) that must collapse to one canonical form.  The oracle
  derives the canonical form INDEPENDENTLY from the construction —
  it shares no regex with the Spark implementation, so it checks the
  normalization semantics, not a parallel-constructed regex chain.
* ``budget_prune`` — perplexity-based token-budget corpus selection
  (operators/curation.py): docs ranked by the self-trained bigram-LM
  surprisal (wave 11), kept while the exact global running token
  total fits the budget (operators.skew.global_rank_cumsum — no
  single-task SUM() OVER (ORDER BY) window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.entry_queries import (
    ORACLES,
    _SQL_NORM,
    _SQL_WS_TOKS,
    _t,
    query,
)


def _messy_urls(documents: DataFrame) -> DataFrame:
    """(doc_id, url): deterministic messy URL variants — doc groups of
    docs sharing (source, doc_id div 140) share a page (sources cycle doc_id%20, so each page collects ~7 same-source docs); each doc renders the page URL
    differently by doc_id % 5."""
    did = F.col("doc_id")
    page = F.floor(did / F.lit(140)).cast("long").cast("string")
    base = F.concat(F.lit("://"), F.col("source"), F.lit(".com"))
    # upper() stops at the authority: the path stays '/doc/N' because
    # canonicalization lowercases scheme://host only, never the path
    v0 = F.concat(F.lit("https"), base, F.lit("/doc/"), page)
    v1 = F.concat(
        F.lit("HTTPS://WWW."), F.upper(F.col("source")), F.lit(".COM/doc/"), page
    )
    v2 = F.concat(
        F.lit("https"), base, F.lit("/doc/"), page, F.lit("?utm_source=feed")
    )
    v3 = F.concat(F.lit("https"), base, F.lit("/doc/"), page, F.lit("/"))
    v4 = F.concat(
        F.lit("https"), base, F.lit(":443/doc/"), page, F.lit("#sec")
    )
    url = (
        F.when(did % 5 == 0, v0)
        .when(did % 5 == 1, v1)
        .when(did % 5 == 2, v2)
        .when(did % 5 == 3, v3)
        .otherwise(v4)
    )
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"), url.alias("url")
    )


@query(
    "url_dedup",
    """
    WITH u AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id,
             'https://' || source || '.com/doc/'
               || CAST(doc_id // 140 AS VARCHAR) AS canon
      FROM documents
    )
    SELECT canon AS canonical_url, COUNT(*)::BIGINT AS n_docs,
           MIN(doc_id) AS keep_id
    FROM u GROUP BY 1 HAVING COUNT(*) > 1
    """,
)
def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL duplicate groups (functions.url.url_dedup_groups):
    the oracle knows every messy variant canonicalizes to
    https://<source>.com/doc/<doc_id div 140> by CONSTRUCTION — an
    independent derivation of what the regex chain must produce."""
    from opengauss_tools_datachecker_performance_spark.functions.url import (
        url_dedup_groups,
    )

    return url_dedup_groups(_messy_urls(_t(spark, sf_dir, "documents")))


_BUDGET = 5_000


@query(
    "budget_prune",
    f"""
    WITH lm AS ({{lm_sql}}),
    tok AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id,
             len({_SQL_WS_TOKS.format(t=_SQL_NORM.format(t="text"))}) AS n_tokens
      FROM documents
    ),
    s AS (
      SELECT lm.doc_id, tok.n_tokens, lm.avg_bits
      FROM lm JOIN tok USING (doc_id)
    ),
    r AS (
      SELECT doc_id, n_tokens,
             CAST(ROW_NUMBER() OVER (ORDER BY avg_bits, doc_id) AS BIGINT)
               AS rank,
             CAST(SUM(n_tokens) OVER (ORDER BY avg_bits, doc_id
                                      ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS cum_tokens
      FROM s
    )
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, rank, cum_tokens,
           (cum_tokens <= {_BUDGET}) AS kept
    FROM r
    """,
)
def q_budget_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-pruning under a token budget
    (operators.curation.budget_prune): best-LM-score-first selection
    with an exact, scalably-computed global running token total.
    Docs too short to score (<2 tokens → no bigrams) are outside the
    scored universe, matching the oracle's inner join."""
    from opengauss_tools_datachecker_performance_spark.functions.text import (
        normalized_text,
        ws_tokens,
    )
    from opengauss_tools_datachecker_performance_spark.operators.corpus_stats import (
        bigram_surprisal_scores,
    )
    from opengauss_tools_datachecker_performance_spark.operators.curation import (
        budget_prune,
    )

    documents = _t(spark, sf_dir, "documents")
    lm = bigram_surprisal_scores(documents).select("doc_id", "avg_bits")
    toks = documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.size(ws_tokens(normalized_text(F.col("text"))))
        .cast("long")
        .alias("n_tokens"),
    )
    scored = lm.join(toks, "doc_id")
    return budget_prune(
        scored, _BUDGET, id_col="doc_id", tokens_col="n_tokens",
        score_col="avg_bits",
    )


# resolve the wave-11 surprisal CORE (decimal avg_bits — this oracle
# ORDERS BY it numerically; the registered lm_surprisal oracle renders
# it as VARCHAR for hash stability and must not be reused here)
from opengauss_tools_datachecker_performance_spark.entry_queries_wave11 import (
    _SQL_LM_CORE,
)

ORACLES["budget_prune"] = ORACLES["budget_prune"].format(lm_sql=_SQL_LM_CORE)
