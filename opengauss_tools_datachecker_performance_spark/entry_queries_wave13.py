"""Driver-contract query catalog, wave 13: corpus-vs-catalog
reverse-referential audit + length-shape profiling.

* ``asset_usage`` — the dual of the referential check: per-asset
  usage counts with ``dangling`` / ``orphan`` / ``ok`` status
  (checks/referential.py).
* ``doc_length_histogram`` — per-source log2-bucketed token-length
  histogram via exact integer bit length (operators/corpus_stats.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from opengauss_tools_datachecker_performance_spark.entry_queries import (
    _SQL_NORM,
    _SQL_WS_TOKS,
    _t,
    query,
)

_N_ASSETS_PRESENT = 150


@query(
    "asset_usage",
    f"""
    WITH refs AS (
      SELECT 'asset-' || CAST(doc_id % 200 AS VARCHAR) AS media_ref,
             COUNT(*)::BIGINT AS n_refs
      FROM documents WHERE doc_id % 3 = 0 GROUP BY 1
    ),
    cat AS (
      SELECT 'asset-' || CAST(r AS VARCHAR) AS media_ref
      FROM range({_N_ASSETS_PRESENT}) t(r)
    ),
    j AS (
      SELECT coalesce(r.media_ref, c.media_ref) AS media_ref,
             coalesce(r.n_refs, 0)::BIGINT AS n_refs,
             (c.media_ref IS NOT NULL) AS in_catalog,
             CASE WHEN c.media_ref IS NULL THEN 'dangling'
                  WHEN r.media_ref IS NULL THEN 'orphan'
                  ELSE 'ok' END AS status
      FROM refs r FULL OUTER JOIN cat c ON r.media_ref = c.media_ref
    )
    SELECT media_ref, n_refs, in_catalog, status FROM j
    """,
)
def q_asset_usage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reverse-referential asset-usage audit
    (checks.referential.asset_usage) over the derived interleaved docs
    vs the deterministic 150-asset catalog — dangling refs and orphan
    assets surface together."""
    from opengauss_tools_datachecker_performance_spark.checks.referential import (
        asset_usage,
    )
    from opengauss_tools_datachecker_performance_spark.sources.docs_builder import (
        assets_catalog,
        docs_from_documents,
    )

    docs = docs_from_documents(_t(spark, sf_dir, "documents"))
    return asset_usage(docs, assets_catalog(spark, n_present=_N_ASSETS_PRESENT))


@query(
    "doc_length_histogram",
    f"""
    WITH n AS (
      SELECT source,
             len({_SQL_WS_TOKS.format(t=_SQL_NORM.format(t="text"))}) AS n
      FROM documents
    )
    , b AS (
      SELECT source, CAST(length(bin(n)) - 1 AS INT) AS bucket
      FROM n WHERE n >= 1
    )
    SELECT source, bucket,
           CAST(1::BIGINT << bucket AS BIGINT) AS lo_tokens,
           CAST((1::BIGINT << (bucket + 1)) - 1 AS BIGINT) AS hi_tokens,
           COUNT(*)::BIGINT AS n_docs
    FROM b GROUP BY 1, 2
    """,
)
def q_doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source log2 token-length histogram
    (operators.corpus_stats.doc_length_histogram) — exact integer
    bit-length buckets, identical across engines."""
    from opengauss_tools_datachecker_performance_spark.operators.corpus_stats import (
        doc_length_histogram,
    )

    return doc_length_histogram(_t(spark, sf_dir, "documents"))
