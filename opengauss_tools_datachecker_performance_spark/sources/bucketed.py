"""Bucketed doc tables: shuffle-free consistency diffs.

At 10^12 docs the single largest exchange in the whole validation is
the diff's row-level full-outer join — both digest frames shuffle by
``key``. If the source and sink tables are WRITTEN bucketed by
``doc_id`` with the same bucket count, both scans come up already
hash-partitioned on the join key, the partitioning survives the
digest projection (alias-aware) and the persist, and the join plans
with ZERO Exchange: each executor diffs its own co-located buckets.
That turns the engine's dominant shuffle into a map-side join — the
Spark analogue of the reference pre-sharding both endpoints the same
way (its bucket-count congruence rule, BuilderBucketHandler.java:37-60,
exists for exactly this alignment).

Spark-native surfaces:

* parquet/filesystem (this sandbox): ``DataFrameWriter.bucketBy(n,
  'doc_id').sortBy('doc_id').saveAsTable(...)`` — bucketing metadata
  lives in the session/Hive catalog, so reads must go through
  ``spark.table`` (the ``table:`` ref scheme in sources.table_io).
* Iceberg (production): identical effect via a bucket partition
  transform ``bucket(N, doc_id)`` plus storage-partitioned joins
  (``spark.sql.sources.v2.bucketing.enabled``) — same plan shape, no
  Hive-style bucket files.

The bucket count is a LAYOUT contract between the two tables: equal
counts co-locate perfectly (Spark can also ratio-match a multiple
with bucketing.autoBucketedScan). Pick n_buckets so one bucket of the
bigger table fits an executor core's working set at target scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_docs(
    docs: DataFrame,
    table_name: str,
    n_buckets: int = 64,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a doc table bucketed + sorted by ``doc_id`` so diffs
    against any same-bucketed table run without a shuffle. ``path``
    makes it an external table (data outside the warehouse dir)."""
    w = (
        docs.write.mode(mode)
        .format("parquet")
        .bucketBy(n_buckets, "doc_id")
        .sortBy("doc_id")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Catalog read — the only path that preserves bucket metadata
    (spark.read.parquet on the same files would forget it)."""
    return spark.table(table_name)
