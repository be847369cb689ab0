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
      FROM embeddings WHERE vec_id < {_N_CELLS}
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
