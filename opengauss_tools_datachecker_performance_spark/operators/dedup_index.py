"""Incremental near-dup detection via a persisted MinHash index —
the digest-companion idea (sources/prehashed.py) applied to dedup.

A training-data pipeline does not re-dedup 10^12 documents per batch;
it dedups each INCOMING batch against the corpus. Re-shingling and
re-hashing the corpus per batch is the dominant cost (same
memory-bandwidth argument as the digest companion: KBs of text decoded
per doc to recompute a few longs). So the corpus's LSH state is
persisted ONCE at ingest:

* ``buckets.parquet``  — (doc_id, band, band_key): ~bands rows/doc of
  three longs; the LSH join side.
* ``shingles.parquet`` — (doc_id, sh): the DISTINCT shingle-hash rows
  exact verification needs; longs only, ~100× smaller than the text.

Incremental detection then computes signatures for the new batch only,
joins its band keys against the stored buckets (plus a new-vs-new
self-join), and verifies candidates with exact Jaccard over stored +
new shingle rows. The math is EXACTLY minhash_near_duplicates over
(corpus ∪ batch) restricted to pairs touching the batch — asserted in
tests/test_dedup_index.py — so the oracle is the same SQL with a
batch-involvement predicate.

Scale notes (10^12 docs):
* the per-batch cost is O(|batch| text) + joins against thin long-only
  tables; corpus text is never re-read.
* lay the index out bucketed by (band, band_key) (Iceberg
  ``bucket(N, band_key)``) and the candidate join is
  storage-partitioned: the index never shuffles. Shingles bucketed by
  doc_id co-locate the verification semi-join the same way.
* the mega-bucket cap is evaluated over the UNION's occupancy
  (corpus + batch), identical to the full-corpus run — so incremental
  and full runs drop the same degenerate buckets (no coverage drift
  between the two paths).
* ``update_minhash_index`` appends only docs not yet indexed
  (anti-join on the thin bucket table), so replaying a failed batch
  is idempotent — same contract as update_digest_companion.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from opengauss_tools_datachecker_performance_spark.functions.text import shingle_rows
from opengauss_tools_datachecker_performance_spark.operators.dedup import (
    jaccard_for_pairs,
    minhash_band_buckets,
)


def minhash_index_frames(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
) -> tuple[DataFrame, DataFrame]:
    """→ (buckets, shingles): the two persistable index frames for
    ``docs`` — exactly what minhash_near_duplicates computes
    internally, as writable projections."""
    buckets = minhash_band_buckets(
        docs, id_col, text_col, shingle_k, num_hashes, bands
    )
    shingles = shingle_rows(docs, id_col, text_col, shingle_k, distinct=True)
    return buckets, shingles


def write_minhash_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    mode: str = "overwrite",
) -> None:
    buckets, shingles = minhash_index_frames(
        docs, id_col, text_col, shingle_k, num_hashes, bands
    )
    buckets.write.mode(mode).parquet(os.path.join(path, "buckets.parquet"))
    shingles.write.mode(mode).parquet(os.path.join(path, "shingles.parquet"))


def read_minhash_index(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    return (
        spark.read.parquet(os.path.join(path, "buckets.parquet")),
        spark.read.parquet(os.path.join(path, "shingles.parquet")),
    )


def update_minhash_index(
    spark: SparkSession,
    path: str,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
) -> int:
    """Append the batch's index rows, skipping docs already indexed
    (idempotent batch replay). Returns the number of docs appended.
    The existence probe semi-joins the thin bucket table against the
    batch's ids — never a corpus scan."""
    buckets, _ = read_minhash_index(spark, path)
    batch_ids = new_docs.select(
        F.col(id_col).cast("string").alias("doc_id")
    ).distinct()
    already = buckets.join(
        F.broadcast(batch_ids), "doc_id", "left_semi"
    ).select("doc_id").distinct()
    fresh = new_docs.join(
        already,
        new_docs[id_col].cast("string") == already["doc_id"],
        "left_anti",
    )
    n = fresh.count()
    if n == 0:
        return 0
    b, s = minhash_index_frames(
        fresh, id_col, text_col, shingle_k, num_hashes, bands
    )
    b.write.mode("append").parquet(os.path.join(path, "buckets.parquet"))
    s.write.mode("append").parquet(os.path.join(path, "shingles.parquet"))
    return n


def incremental_near_duplicates(
    index_buckets: DataFrame,
    index_shingles: DataFrame,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    shingle_k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    max_bucket_size: int = 50,
    coverage_out: dict | None = None,
) -> DataFrame:
    """→ (id_a, id_b, jaccard): verified near-dup pairs that involve
    at least one NEW doc — new-vs-corpus and new-vs-new — without
    reading any corpus text. Equals minhash_near_duplicates over
    (corpus ∪ batch) filtered to batch-involving pairs (tested)."""
    # a batch doc already present in the index is not "new" — keeping
    # it would double its bucket/shingle rows in the unions below and
    # corrupt the exact-Jaccard counts; the probe is a broadcast
    # semi-join against the thin bucket table, never a corpus scan
    batch_ids = new_docs.select(
        F.col(id_col).cast("string").alias("doc_id")
    ).distinct()
    indexed = index_buckets.join(
        F.broadcast(batch_ids), "doc_id", "left_semi"
    ).select("doc_id").distinct()
    new_docs = new_docs.join(
        indexed,
        new_docs[id_col].cast("string") == indexed["doc_id"],
        "left_anti",
    )
    new_buckets, new_shingles = minhash_index_frames(
        new_docs, id_col, text_col, shingle_k, num_hashes, bands
    )
    union = index_buckets.select(
        "doc_id", "band", "band_key", F.lit(False).alias("is_new")
    ).unionByName(
        new_buckets.select(
            "doc_id", "band", "band_key", F.lit(True).alias("is_new")
        )
    )
    # occupancy cap over the UNION — identical semantics to the
    # full-corpus lsh_candidate_pairs, so the incremental path drops
    # exactly the buckets the full run would
    sized = union.withColumn(
        "bucket_n", F.count(F.lit(1)).over(Window.partitionBy("band", "band_key"))
    )
    if coverage_out is not None:
        coverage_out["minhash_dropped_bucket_entries"] = sized.filter(
            F.col("bucket_n") > max_bucket_size
        )
    sized = sized.filter(F.col("bucket_n") <= max_bucket_size)
    a = sized.select(
        "band", "band_key", F.col("doc_id").alias("id_a"), F.col("is_new").alias("new_a")
    )
    b = sized.select(
        "band", "band_key", F.col("doc_id").alias("id_b"), F.col("is_new").alias("new_b")
    )
    cands = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.col("new_a") | F.col("new_b"))
        .select("id_a", "id_b")
        .distinct()
        .persist()
    )
    if coverage_out is not None:
        coverage_out.setdefault("persisted", []).append(cands)
    ids = cands.select(
        F.explode(F.array("id_a", "id_b")).alias("doc_id")
    ).distinct()
    rows = (
        index_shingles.unionByName(new_shingles)
        .join(F.broadcast(ids), "doc_id", "left_semi")
        .persist()
    )
    if coverage_out is not None:
        coverage_out.setdefault("persisted", []).append(rows)
    verified = jaccard_for_pairs(rows, cands)
    return verified.filter(F.col("jaccard") >= threshold)
