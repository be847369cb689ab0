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


# ---------------------------------------------------------------------------
# cross-snapshot drift — body-free text_len quantile profiles t1 vs t2
# ---------------------------------------------------------------------------

_SNAP_DRIFT_SQL = """
    WITH spans_base AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id, doc_id AS did,
             string_split(text, ' ') AS words,
             least(ceil(len(string_split(text, ' ')) / 8.0)::INT, 6) AS nc
      FROM documents
    ),
    m0 AS (
      SELECT did, did % 8 AS part,
             list_sum(list_transform(range(0, nc), i ->
               strlen(array_to_string(list_slice(words, i*8+1, i*8+8), ' '))
               + 4))
             + CASE WHEN did % 3 = 0
                    THEN 5 + strlen('asset-' || CAST(did % 200 AS VARCHAR))
                    ELSE 0 END AS metric
      FROM spans_base
    ),
    olds AS (SELECT part, metric FROM m0),
    news AS (
      SELECT part,
             metric + CASE WHEN did % 89 = 3 THEN 3 ELSE 0 END AS metric
      FROM m0 WHERE did % 97 <> 0
      UNION ALL
      SELECT part, metric FROM m0 WHERE did % 79 = 11
    ),
    po AS (
      SELECT part, COUNT(*)::BIGINT AS n_old,
             quantile_cont(metric, [0.25, 0.5, 0.75]) AS qo
      FROM olds GROUP BY 1
    ),
    pn AS (
      SELECT part, COUNT(*)::BIGINT AS n_new,
             quantile_cont(metric, [0.25, 0.5, 0.75]) AS qn
      FROM news GROUP BY 1
    ),
    j AS (
      SELECT coalesce(po.part, pn.part) AS part, n_old, n_new, qo, qn
      FROM po FULL OUTER JOIN pn ON po.part = pn.part
    ),
    g AS (
      SELECT part, n_old, n_new,
             CASE WHEN n_old IS NOT NULL AND n_new IS NOT NULL THEN
               list_max(list_transform(range(1, 4),
                 i -> abs(qn[i] - qo[i]) / greatest(abs(qo[i]), 1.0)))
             END AS score
      FROM j
    )
    SELECT CAST(part AS INT) AS part,
           CASE WHEN n_old IS NULL THEN 'new'
                WHEN n_new IS NULL THEN 'gone'
                ELSE 'compared' END AS status,
           n_old, n_new,
           CAST(CAST(round(score, 6) AS DECIMAL(12,6)) AS VARCHAR)
             AS drift_score,
           coalesce(score > 0.3, TRUE) AS drifted
    FROM g
"""


@query("snapshot_drift", _SNAP_DRIFT_SQL)
def q_snapshot_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Body-free run-over-run drift (plans.snapshot.snapshot_drift):
    per-partition text_len quantile profile at snapshot t2 vs t1, max
    relative gap with the old snapshot as baseline.  Exact-percentile
    variant for oracle parity; production uses the mergeable
    percentile_approx default."""
    from pyspark.sql import functions as F

    from opengauss_tools_datachecker_performance_spark.digest import (
        _sorted_spans,
        span_text_volume_from_sorted,
    )
    from opengauss_tools_datachecker_performance_spark.plans.snapshot import (
        snapshot_drift,
    )
    from opengauss_tools_datachecker_performance_spark.sources.docs_builder import (
        docs_from_documents,
        mutate_docs,
    )

    docs = docs_from_documents(_t(spark, sf_dir, "documents"))
    sink = mutate_docs(docs)

    def _metric(d):
        return d.select(
            "part",
            span_text_volume_from_sorted(_sorted_spans(F.col("spans"))).alias(
                "text_len"
            ),
        )

    out = snapshot_drift(_metric(docs), _metric(sink), exact=True)
    return out.select(
        "part",
        "status",
        "n_old",
        "n_new",
        F.round("drift_score", 6)
        .cast("decimal(12,6)")
        .cast("string")
        .alias("drift_score"),
        "drifted",
    )
