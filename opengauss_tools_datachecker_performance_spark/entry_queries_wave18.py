"""Driver-contract query catalog, wave 18: persisted ANN index.

* ``ann_index_query`` — operators/ann_index.py: the corpus is split
  into a base build plus an incrementally ingested batch (assigned
  against the STORED centroids, no retrain, no corpus re-read), then
  queried.  Because the index is a physical layout of exactly the
  ivf_ann_topk semantics, the oracle is wave-7's ``ann_ivf`` SQL
  VERBATIM — the strongest possible statement that indexing changed
  nothing but the storage shape.  (The heldout batch excludes the 16
  lowest ids, so the base's lowest-id centroids equal the full
  corpus's.)  Disk round-trip + idempotent batch replay are pinned in
  tests/test_ann_index.py; the catalog entry runs the frame-level
  path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.entry_queries import _t, query
from opengauss_tools_datachecker_performance_spark.entry_queries_wave7 import (
    _ANN_IVF_SQL,
)


@query("ann_index_query", _ANN_IVF_SQL)
def q_ann_index_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-IVF-index query (operators/ann_index.py): build from
    the base split, ingest the heldout batch against stored centroids,
    probe — results must equal the unindexed ann_ivf run bit-for-bit
    (same oracle SQL)."""
    from opengauss_tools_datachecker_performance_spark.operators.ann_index import (
        ivf_index_frames,
        ivf_index_topk,
    )
    from opengauss_tools_datachecker_performance_spark.operators.similarity import (
        _qz,
        ivf_assign,
    )

    emb = _t(spark, sf_dir, "embeddings")
    heldout = (F.col("vec_id") % 10 == 7) & (F.col("vec_id") >= 100)
    base, batch = emb.filter(~heldout), emb.filter(heldout)
    cent, vectors = ivf_index_frames(base)
    # incremental ingest: assign the batch against the EXISTING
    # centroids (frame-level twin of add_batch_to_ivf_index)
    b = batch.select(
        F.col("vec_id").cast("long").alias("neighbor_id"),
        F.col("embedding").cast("array<double>").alias("cv"),
    ).withColumn("vi", _qz(F.col("cv"), 1_000_000.0))
    batch_vectors = ivf_assign(b, cent, "neighbor_id", 1).select(
        "neighbor_id", "cell", "cv"
    )
    all_vectors = vectors.unionByName(batch_vectors)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return ivf_index_topk(cent, all_vectors, queries, k=5, nprobe=2)


_FD_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
_FD_RATE = 0.05


def _fd_pair_sql(a: str, b: str) -> str:
    return f"""
    SELECT '{a}' AS lhs, '{b}' AS rhs,
           COUNT(*)::BIGINT AS n_lhs_groups,
           SUM(CASE WHEN nr > 1 THEN 1 ELSE 0 END)::BIGINT AS n_violating_groups,
           CAST(CAST(round(SUM(CASE WHEN nr > 1 THEN 1 ELSE 0 END) / COUNT(*)::DOUBLE, 6) AS DECIMAL(10,6)) AS VARCHAR) AS violation_rate,
           SUM(CASE WHEN nr > 1 THEN 1 ELSE 0 END) / COUNT(*)::DOUBLE <= {_FD_RATE} AS holds
    FROM (
      SELECT l, COUNT(*) AS nr FROM (
        SELECT DISTINCT CAST({a} AS VARCHAR) AS l, CAST({b} AS VARCHAR) AS r
        FROM orders
      ) GROUP BY l
    )
    """


_FD_DISCOVERY_SQL = "\nUNION ALL\n".join(
    _fd_pair_sql(a, b) for a in _FD_COLS for b in _FD_COLS if a != b
)


@query("fd_discovery", _FD_DISCOVERY_SQL)
def q_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-FD discovery (checks.constraints.fd_discovery):
    profile every ordered column pair of orders for how close
    lhs → rhs is to holding — key columns discover exact FDs, the
    reverse directions report their true violation rates.  One melt
    scan + three stacked partial aggregates for ALL pairs."""
    from opengauss_tools_datachecker_performance_spark.checks.constraints import (
        fd_discovery,
    )

    return fd_discovery(
        _t(spark, sf_dir, "orders"), _FD_COLS, max_violation_rate=_FD_RATE
    )


_WINNOW_K, _WINNOW_W = 3, 4

_WINNOW_SQL = f"""
    WITH norm AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id,
             %TOKS% AS toks
      FROM documents
    ),
    grams AS (
      SELECT doc_id, i - 1 AS pos,
             ('0x' || substr(md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]), 1, 15))::BIGINT AS sh
      FROM norm, UNNEST(range(1, len(toks) - {_WINNOW_K} + 2)) AS t(i)
      WHERE len(toks) >= {_WINNOW_K}
    ),
    sel AS (
      SELECT doc_id, pos,
             MIN({{'sh': sh, 'np': -pos}}) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN {_WINNOW_W - 1} PRECEDING AND CURRENT ROW
             ) AS s
      FROM grams
    )
    SELECT DISTINCT doc_id, CAST(-(s.np) AS INT) AS pos, s.sh AS fp
    FROM sel WHERE pos >= {_WINNOW_W - 1}
"""


@query(
    "winnow_fingerprints",
    _WINNOW_SQL.replace(
        "%TOKS%",
        "list_filter(regexp_split_to_array(trim(regexp_replace(lower(text),"
        " '\\s+', ' ', 'g')), '\\s+'), x -> x <> '')",
    ),
)
def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (operators.dedup.winnow_fingerprints;
    Schleimer et al. SIGMOD'03): robust-winnowed k-gram minima over
    documents — any ≥(w+k-1)-token shared substring is guaranteed a
    matching fingerprint; stored set ~1/w of the gram stream."""
    from opengauss_tools_datachecker_performance_spark.operators.dedup import (
        winnow_fingerprints,
    )

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    return winnow_fingerprints(d, "doc_id", "text", _WINNOW_K, _WINNOW_W)
