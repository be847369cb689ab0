"""Driver-contract query catalog, wave 20 (round 5).

* ``source_overlap_matrix`` — operators/dedup.py
  :func:`source_overlap_matrix`: pairwise exact-content overlap
  between corpus sources (distinct-fingerprint Jaccard + both
  asymmetric containment fractions), the across-source dual of
  ``dedup_rate_report``'s within-source duplicate rate — the number a
  curator reads before dropping a redundant feed from a mixture.
  The entry plants a ``mirror`` source that re-tags every
  ``doc_id % 17 == 0`` document, so mirror↔src* overlaps are known
  non-zero while src*↔src* pairs only overlap via accidental exact
  duplicates (counted identically by both engines).

Output follows the catalog's hash-stable ground rule
(string/bigint/boolean only).  Registered at the BACK of the catalog
(outside the driver's front-50 sample — see entry_queries.py rotation
contract); external verification comes from scripts/round_gate.sh's
strict + driver-path repro passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.entry_queries import (
    _SQL_NORM,
    _t,
    query,
)

_RATIO = "CAST(CAST(round({x}, 6) AS DECIMAL(10,6)) AS VARCHAR)"

_OVERLAP_SQL = f"""
    WITH docs2 AS (
      SELECT source, text FROM documents
      UNION ALL
      SELECT 'mirror' AS source, text FROM documents WHERE doc_id % 17 = 0
    ),
    fps AS (
      SELECT DISTINCT source, md5({_SQL_NORM.format(t='text')}) AS fp
      FROM docs2 WHERE text IS NOT NULL AND source IS NOT NULL
    ),
    fpc AS (SELECT fp, COUNT(*) AS s_n FROM fps GROUP BY 1),
    kept AS (
      SELECT fps.source, fps.fp FROM fps JOIN fpc USING (fp)
      WHERE s_n <= 64
    ),
    sizes AS (SELECT source, COUNT(*) AS n FROM kept GROUP BY 1),
    shared AS (
      SELECT a.source AS source_a, b.source AS source_b,
             COUNT(*) AS n_shared
      FROM kept a JOIN kept b USING (fp)
      WHERE a.source < b.source
      GROUP BY 1, 2
    )
    SELECT source_a, source_b,
           sa.n AS n_a, sb.n AS n_b, n_shared,
           {_RATIO.format(x='n_shared::DOUBLE / (sa.n + sb.n - n_shared)')} AS jaccard,
           {_RATIO.format(x='n_shared::DOUBLE / sa.n')} AS frac_a_in_b,
           {_RATIO.format(x='n_shared::DOUBLE / sb.n')} AS frac_b_in_a
    FROM shared
    JOIN sizes sa ON sa.source = source_a
    JOIN sizes sb ON sb.source = source_b
"""


@query("source_overlap_matrix", _OVERLAP_SQL)
def q_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Across-source exact-content overlap with a planted mirror feed
    (operators.dedup.source_overlap_matrix)."""
    from opengauss_tools_datachecker_performance_spark.operators.dedup import (
        source_overlap_matrix,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    mirror = d.filter(F.col("doc_id") % 17 == 0).select(
        "doc_id", F.lit("mirror").alias("source"), "text"
    )
    return source_overlap_matrix(d.unionByName(mirror))
