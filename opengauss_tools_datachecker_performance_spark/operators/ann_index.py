"""Persisted IVF ANN index — the similarity dual of
operators/dedup_index.py's incremental MinHash index.

At 10^12 vectors the corpus must be INDEXED ONCE and then serve
queries and ingest batches without re-reading or re-training: the
coarse quantizer (centroids) and the cell-assigned vector postings are
durable tables; a new batch assigns against the STORED centroids (one
narrow map pass over the batch — the corpus is untouched) and lands in
its own idempotent ``batch=<id>`` subdir; queries probe ``nprobe``
cells and re-score exactly inside them.

Semantics are identical to operators/similarity.ivf_ann_topk with the
same parameters (deterministic lowest-id centroids, integer-quantized
assignment, exact cosine re-rank) — materializing the index is purely
a physical choice, which is what makes the DuckDB oracle of the
``ann_ivf`` entry reusable verbatim for the indexed path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from opengauss_tools_datachecker_performance_spark.operators.similarity import (
    _qz,
    cosine_sim,
    ivf_assign,
    ivf_centroids,
)

DEFAULT_QSCALE = 1_000_000.0


def ivf_index_frames(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    quantize_scale: float = DEFAULT_QSCALE,
) -> tuple[DataFrame, DataFrame]:
    """→ (centroids, vectors): the two index tables.  ``centroids`` =
    (cell, ci) integer-quantized; ``vectors`` = (neighbor_id, cell,
    cv) — every corpus vector with its assigned cell and raw
    coordinates (the exact re-rank needs them; PQ codes are the
    memory-tight alternative, operators/similarity.py IVF-PQ)."""
    cent = ivf_centroids(corpus, id_col, vec_col, n_cells, quantize_scale)
    c = corpus.select(
        F.col(id_col).cast("long").alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("vi", _qz(F.col("cv"), quantize_scale))
    vectors = ivf_assign(c, cent, "neighbor_id", 1)
    return cent, vectors.select("neighbor_id", "cell", "cv")


def write_ivf_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    quantize_scale: float = DEFAULT_QSCALE,
) -> None:
    """Materialize the index: ``centroids.parquet`` plus
    ``vectors.parquet/batch=base/`` partitioned by cell, so a probe
    of ``nprobe`` cells is a partition-pruned scan, not a full read."""
    cent, vectors = ivf_index_frames(
        corpus, id_col, vec_col, n_cells, quantize_scale
    )
    cent.write.mode("overwrite").parquet(f"{path}/centroids.parquet")
    vectors.write.mode("overwrite").partitionBy("cell").parquet(
        f"{path}/vectors.parquet/batch=base"
    )


def add_batch_to_ivf_index(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    batch_id: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    quantize_scale: float = DEFAULT_QSCALE,
) -> None:
    """Ingest a new vector batch: assign against the STORED centroids
    (no retrain, corpus untouched) and write the postings into an
    idempotent ``batch=<id>`` subdir — replaying a crashed ingest
    overwrites its own subdir and converges."""
    cent = spark.read.parquet(f"{path}/centroids.parquet")
    b = batch.select(
        F.col(id_col).cast("long").alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("vi", _qz(F.col("cv"), quantize_scale))
    assigned = ivf_assign(b, cent, "neighbor_id", 1).select(
        "neighbor_id", "cell", "cv"
    )
    assigned.write.mode("overwrite").partitionBy("cell").parquet(
        f"{path}/vectors.parquet/batch={batch_id}"
    )


def read_ivf_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """→ (centroids, vectors) across every ingested batch.  ``cell``
    and ``batch`` come back as partition columns — cell filters prune
    directories before any file IO."""
    cent = spark.read.parquet(f"{path}/centroids.parquet")
    vectors = spark.read.option("basePath", f"{path}/vectors.parquet").parquet(
        f"{path}/vectors.parquet"
    )
    return cent, vectors.select("neighbor_id", "cell", "cv")


def ivf_index_topk(
    centroids: DataFrame,
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 2,
    quantize_scale: float = DEFAULT_QSCALE,
) -> DataFrame:
    """Query the persisted index → (query_id, neighbor_id, rank):
    probe ``nprobe`` cells per query (broadcast the tiny probed query
    frame into the cell-pruned postings join), exact cosine re-rank.
    Identical results to similarity.ivf_ann_topk over the union of the
    indexed batches — the index is a physical layout, not a
    semantics change."""
    q = queries.select(
        F.col(id_col).cast("long").alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("vi", _qz(F.col("qv"), quantize_scale))
    q_probed = ivf_assign(q, centroids, "query_id", nprobe)
    scored = (
        vectors.join(F.broadcast(q_probed), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_sim(F.col("qv"), F.col("cv")).alias("cos_sim"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
