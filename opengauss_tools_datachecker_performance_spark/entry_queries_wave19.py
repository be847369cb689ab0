"""Driver-contract query catalog, wave 19: release-gate operators a
training-data pipeline runs after curation.

* ``dataset_split`` — operators/splits.py: deterministic seeded-hash
  train/val/test assignment (stable under corpus appends — no rand(),
  no reassignments on refresh) with a per-source realized-share
  report; the oracle replays the identical md5-wheel math in DuckDB.
* ``equidepth_histogram_price`` — checks/distributions.py
  equidepth_histogram: EXACT equi-depth bins via the bounded
  global-rank passes (operators/skew.py), never a single-task global
  window; the oracle uses a genuine ROW_NUMBER + the same bin formula.
* ``k_anonymity`` — checks/privacy.py: quasi-identifier group-size
  audit (k-anonymity verdict + rows-at-risk) — the table-level dual of
  the per-document PII scan.

All outputs follow the catalog's hash-stable ground rule
(string/bigint/boolean only — tests/test_plan_audit.py gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.entry_queries import (
    _t,
    query,
)
from opengauss_tools_datachecker_performance_spark.operators.splits import (
    hash_split_sql,
)

_SPLITS = [("train", 0.9), ("val", 0.05), ("test", 0.05)]
_SPLIT_SEED = 7

_SPLIT_CASE = hash_split_sql("doc_id", _SPLITS, _SPLIT_SEED)


@query(
    "dataset_split",
    f"""
    WITH s AS (
      SELECT source, {_SPLIT_CASE} AS split FROM documents
    ),
    c AS (
      SELECT source, split, COUNT(*)::BIGINT AS n_docs
      FROM s GROUP BY 1, 2
    )
    SELECT source, split, n_docs,
           CAST(CAST(round(n_docs / SUM(n_docs) OVER (PARTITION BY source), 6)
                     AS DECIMAL(10,6)) AS VARCHAR) AS share
    FROM c
    """,
)
def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split report per source
    (operators.splits.split_report): 90/5/5 on seed 7."""
    from opengauss_tools_datachecker_performance_spark.operators.splits import (
        split_report,
    )

    return split_report(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        _SPLITS,
        group_col="source",
        seed=_SPLIT_SEED,
    )


@query(
    "equidepth_histogram_price",
    """
    WITH base AS (
      SELECT CAST(l_extendedprice AS DOUBLE) AS v, l_orderkey, l_linenumber
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ),
    r AS (
      SELECT v,
             ROW_NUMBER() OVER (ORDER BY v, l_orderkey, l_linenumber) AS rn,
             COUNT(*) OVER () AS n
      FROM base
    )
    SELECT CAST(floor((rn - 1) * 16 / n) AS INT) AS bin,
           COUNT(*)::BIGINT AS n,
           CAST(CAST(round(MIN(v), 6) AS DECIMAL(18,6)) AS VARCHAR) AS v_lo,
           CAST(CAST(round(MAX(v), 6) AS DECIMAL(18,6)) AS VARCHAR) AS v_hi
    FROM r GROUP BY 1
    """,
)
def q_equidepth_histogram_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 16-bin equi-depth histogram of lineitem extended price
    (checks.distributions.equidepth_histogram): quantile-edge bins via
    bounded global-rank passes; the oracle's single window is fine at
    DuckDB's sandbox scale."""
    from opengauss_tools_datachecker_performance_spark.checks.distributions import (
        equidepth_histogram,
    )

    return equidepth_histogram(
        _t(spark, sf_dir, "lineitem"),
        "l_extendedprice",
        ["l_orderkey", "l_linenumber"],
        n_bins=16,
    )


@query(
    "k_anonymity",
    """
    WITH g AS (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
      FROM customer GROUP BY 1, 2
    )
    SELECT 5::BIGINT AS k,
           CAST(SUM(n) AS BIGINT) AS n_rows,
           COUNT(*)::BIGINT AS n_groups,
           CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_small_groups,
           CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           CAST(MIN(n) AS BIGINT) AS min_group_size,
           MIN(n) >= 5 AS k_anonymous
    FROM g
    """,
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of customer on (nation, market segment)
    quasi-identifiers, k=5 (checks.privacy.k_anonymity_audit)."""
    from opengauss_tools_datachecker_performance_spark.checks.privacy import (
        k_anonymity_audit,
    )

    return k_anonymity_audit(
        _t(spark, sf_dir, "customer"), ["c_nationkey", "c_mktsegment"], k=5
    )


from opengauss_tools_datachecker_performance_spark.functions.hashing import (  # noqa: E402
    portable_hash64_sql,
)

#: planted multi-line corpus: break lines on a literal ' the ' (same
#: non-overlapping left-to-right replace in both engines) and append
#: boilerplate footer lines to deterministic doc subsets
_SQL_LINE_DOCS = """
      SELECT CAST(doc_id AS VARCHAR) AS doc_id,
             replace(text, ' the ', chr(10))
             || CASE WHEN doc_id % 4 = 0
                     THEN chr(10) || 'subscribe to our newsletter'
                     ELSE '' END
             || CASE WHEN doc_id % 6 = 0
                     THEN chr(10) || 'all rights reserved'
                     ELSE '' END AS text
      FROM documents
"""


@query(
    "boilerplate_removal",
    f"""
    WITH d AS ({_SQL_LINE_DOCS}),
    l AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM d),
    e AS (
      SELECT doc_id, unnest(ls) AS line,
             generate_subscripts(ls, 1) AS pos
      FROM l
    ),
    freq AS (
      SELECT line
      FROM (SELECT line, COUNT(DISTINCT doc_id) AS nd FROM e GROUP BY 1)
      WHERE nd >= 3
    ),
    kept AS (
      SELECT e.doc_id, e.line, e.pos
      FROM e LEFT JOIN freq f USING (line)
      WHERE f.line IS NULL
    ),
    reb AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             string_agg(line, chr(10) ORDER BY pos) AS clean
      FROM kept GROUP BY 1
    ),
    tot AS (SELECT doc_id, len(ls)::BIGINT AS n_lines FROM l)
    SELECT t.doc_id, t.n_lines,
           CAST(t.n_lines - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed,
           {portable_hash64_sql("COALESCE(r.clean, '')")} AS clean_hash
    FROM tot t LEFT JOIN reb r USING (doc_id)
    """,
)
def q_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level boilerplate removal
    (operators.lines.remove_boilerplate_report): lines occurring in
    ≥ 3 distinct docs are dropped; per-doc before/after counts plus
    the portable hash of the cleaned text. Planted footers on doc_id
    % 4 / % 6 subsets guarantee known boilerplate at every sf."""
    from opengauss_tools_datachecker_performance_spark.operators.lines import (
        remove_boilerplate_report,
    )

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.concat(
            F.regexp_replace(F.col("text"), " the ", "\n"),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.lit("\nsubscribe to our newsletter"),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 6 == 0, F.lit("\nall rights reserved")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return remove_boilerplate_report(d, min_docs=3)


@query(
    "span_transitions",
    """
    WITH b AS (
      SELECT doc_id,
             least(ceil(len(string_split(text, ' ')) / 8.0)::INT, 6) AS nc,
             (doc_id % 3 = 0) AS m
      FROM documents
    )
    SELECT from_kind, to_kind, CAST(SUM(n) AS BIGINT) AS n_transitions
    FROM (
      SELECT '^' AS from_kind, 'text' AS to_kind, COUNT(*) AS n FROM b
      UNION ALL
      SELECT 'text', 'media', COUNT(*) FROM b WHERE m
      UNION ALL
      SELECT 'media', 'text', COUNT(*) FROM b WHERE m AND nc >= 2
      UNION ALL
      SELECT 'text', 'text',
             SUM(CASE WHEN m THEN greatest(nc - 2, 0) ELSE nc - 1 END)
      FROM b
    )
    GROUP BY 1, 2 HAVING SUM(n) > 0
    """,
)
def q_span_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-kind transition profile over the derived interleaved docs
    (checks.interleaved.span_transition_profile).  The oracle derives
    the same counts ANALYTICALLY from the docs_from_documents
    construction (chunk count + media placement at offset 1), so a
    sort-order or zip-shift bug in the operator cannot agree with it
    by accident."""
    from opengauss_tools_datachecker_performance_spark.checks.interleaved import (
        span_transition_profile,
    )
    from opengauss_tools_datachecker_performance_spark.sources.docs_builder import (
        docs_from_documents,
    )

    return span_transition_profile(
        docs_from_documents(_t(spark, sf_dir, "documents"))
    )
