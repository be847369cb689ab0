"""Driver-contract query catalog, wave 7.

* ``ann_ivf`` — the inverted-file similarity-search scale path
  (operators.similarity.ivf_ann_topk), complementing ``ann_lsh``:
  coarse-quantizer cells instead of hyperplane buckets.  Deterministic
  centroid choice (lowest-id vectors) + integer-quantized assignment
  arithmetic make the DuckDB oracle replay cell assignment exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.entry_queries import _t, query

_N_CELLS, _NPROBE, _K, _QSCALE = 16, 2, 5, 1_000_000.0

_ANN_IVF_SQL = f"""
    WITH cent AS (
      SELECT vec_id AS cell,
             list_transform(embedding::DOUBLE[],
                            x -> CAST(floor(x * {_QSCALE}) AS BIGINT)) AS ci
      FROM embeddings ORDER BY vec_id LIMIT {_N_CELLS}
    ),
    v AS (
      SELECT vec_id, embedding::DOUBLE[] AS ev,
             list_transform(embedding::DOUBLE[],
                            x -> CAST(floor(x * {_QSCALE}) AS BIGINT)) AS vi
      FROM embeddings
    ),
    assign AS (
      SELECT vec_id, ev, cell,
             row_number() OVER (
               PARTITION BY vec_id
               ORDER BY list_dot_product(vi::DOUBLE[], ci::DOUBLE[]) DESC, cell
             ) AS rn
      FROM v, cent
    ),
    c AS (SELECT vec_id AS neighbor_id, ev AS cv, cell FROM assign WHERE rn = 1),
    q AS (
      SELECT vec_id AS query_id, ev AS qv, cell FROM assign
      WHERE rn <= {_NPROBE} AND vec_id % 50 = 0
    ),
    s AS (
      SELECT DISTINCT query_id, neighbor_id,
             list_cosine_similarity(qv, cv) AS cs
      FROM c JOIN q USING (cell)
      WHERE neighbor_id <> query_id
    ),
    r AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (
               PARTITION BY query_id ORDER BY cs DESC, neighbor_id
             ) AS rank
      FROM s
    )
    SELECT query_id, neighbor_id, rank FROM r WHERE rank <= {_K}
"""


@query("ann_ivf", _ANN_IVF_SQL)
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate nearest neighbors
    (operators.similarity.ivf_ann_topk): 16 deterministic coarse cells,
    nprobe=2, exact cosine re-score inside probed cells only."""
    from opengauss_tools_datachecker_performance_spark.operators.similarity import (
        ivf_ann_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") % 50 == 0)
    return ivf_ann_topk(
        queries_df, emb, k=_K, n_cells=_N_CELLS, nprobe=_NPROBE,
        quantize_scale=_QSCALE,
    )


# ---------------------------------------------------------------------------
# Multi-language marker-profile language ID (word-unigram n-gram
# heuristic; functions.text.lang_id_profile). Planted suffixes flip
# every 17th doc to de/fr/es so the argmax is exercised, not just the
# 'en'/'unknown' split of the stopword-density heuristic.
# ---------------------------------------------------------------------------

def _lang_profile_sql() -> str:
    from opengauss_tools_datachecker_performance_spark.functions.text import (
        LANG_MARKERS,
    )

    markers = ", ".join(
        f"('{lang}', '{w}', {i})"
        for i, (lang, words) in enumerate(LANG_MARKERS.items())
        for w in words
    )
    return f"""
    WITH docs2 AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id,
             CASE WHEN doc_id % 17 = 1 THEN text || ' der die und das ist nicht mit ein'
                  WHEN doc_id % 17 = 2 THEN text || ' le la les et des est une dans'
                  WHEN doc_id % 17 = 3 THEN text || ' el los las de que es una por'
                  ELSE text END AS text
      FROM documents
    ),
    toks AS (
      SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                        x -> x <> '')) AS tok
      FROM docs2
    ),
    markers(lang, tok, rnk) AS (VALUES {markers}),
    hits AS (
      SELECT doc_id, lang, rnk, COUNT(*) AS n_hits
      FROM toks JOIN markers USING (tok) GROUP BY 1, 2, 3
    ),
    best AS (
      SELECT doc_id, lang, n_hits,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY n_hits DESC, rnk ASC) AS rn
      FROM hits
    )
    SELECT d.doc_id,
           COALESCE(CASE WHEN b.n_hits >= 2 THEN b.lang END, 'unknown') AS lang,
           CAST(COALESCE(CASE WHEN b.n_hits >= 2 THEN b.n_hits END, 0) AS BIGINT) AS n_hits
    FROM (SELECT doc_id FROM docs2) d
    LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
    """


@query("lang_id_profile", _lang_profile_sql())
def q_lang_id_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language ID via marker-word profiles over 4 languages
    (functions.text.lang_id_profile): explode → broadcast marker join
    → argmax with deterministic tie-break, 'unknown' below 2 hits."""
    from opengauss_tools_datachecker_performance_spark.functions.text import (
        lang_id_profile,
    )

    d = _t(spark, sf_dir, "documents")
    m17 = F.col("doc_id") % 17
    docs2 = d.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.when(m17 == 1, F.concat(F.col("text"), F.lit(" der die und das ist nicht mit ein")))
        .when(m17 == 2, F.concat(F.col("text"), F.lit(" le la les et des est une dans")))
        .when(m17 == 3, F.concat(F.col("text"), F.lit(" el los las de que es una por")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return lang_id_profile(docs2, "doc_id", "text", min_hits=2)
