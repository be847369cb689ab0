"""Digest-companion tables: validation without reading doc bodies.

The digest stage is the memory-bandwidth ceiling of the whole engine:
at 3M heavy docs/side the parquet nested-span decode (text bytes)
dominates the scan, and hashing itself is measured cheap
(scripts/bench_digest_variants.py). At 10^12 docs the same ratio
holds — every validation run re-reads ~KB of span text per doc to
recompute ~40 B of digests.

A digest COMPANION table inverts that cost: at ingest (when the
writer has the doc bodies in memory anyway) it persists exactly the
enriched digest frame the checks consume (plans.runner.ENRICHED_COLS:
per-span hash array, span-sequence digest, k_hash, bucket, drift
metric, span-rule inputs). Validation then scans tens of bytes per
doc instead of the bodies — a 10-100x scan-volume cut that converts
the bandwidth-bound digest stage into a metadata read, the same
economics as Iceberg keeping column stats in manifests. The reference
has the identical idea in miniature: its extract service builds row
digests ONCE per endpoint and ships only digests to the check service
(DataCheckRunnable.java) — the companion is that digest shipment made
durable and incremental.

Integrity model: the companion is DERIVED state. Writers maintain it
transactionally with the doc table (same commit in Iceberg); a stale
companion is detectable cheaply by comparing its per-partition row
counts/XOR signatures against the doc table's lineage ledger entries
(plans.lineage), without reading bodies.

Layout: partitioned by ``part`` (partition pruning for chunked /
resumed runs) — or bucketed by ``key`` via ``table_name`` +
``n_buckets`` so the consistency diff against a same-bucketed
companion also runs exchange-free (sources.bucketed's co-location
argument, compounded: no body scan AND no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def digest_companion_frame(docs: DataFrame, partition_col: str = "part") -> DataFrame:
    """The exact enriched digest frame validate_docs builds internally
    (plans.runner._enriched_digests), as a writable projection."""
    from opengauss_tools_datachecker_performance_spark.plans.runner import (
        _enriched_digests,
    )

    return _enriched_digests(docs.withColumnRenamed(partition_col, "part"))


def write_digest_companion(
    docs: DataFrame,
    path: str | None = None,
    partition_col: str = "part",
    table_name: str | None = None,
    n_buckets: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write the digest companion for ``docs``.

    * ``path`` only: plain parquet, partitioned by ``part`` (pruned
      scans for --chunk-partitions / resume waves).
    * ``table_name`` (+ optional ``path`` for external data): catalog
      table bucketed by ``key`` with ``n_buckets`` (default 64) — a
      diff between two same-bucketed companions plans with zero key
      Exchange on top of the body-free scan.
    """
    frame = digest_companion_frame(docs, partition_col)
    if table_name is not None:
        w = (
            frame.write.mode(mode)
            .format("parquet")
            .bucketBy(n_buckets or 64, "key")
            .sortBy("key")
        )
        if path is not None:
            w = w.option("path", path)
        w.saveAsTable(table_name)
        return
    if path is None:
        raise ValueError("write_digest_companion needs a path or a table_name")
    frame.write.mode(mode).partitionBy("part").parquet(path)


def read_digest_companion(
    spark: SparkSession, ref: str
) -> DataFrame:
    """Read a companion written by :func:`write_digest_companion` —
    ``table:name`` for the bucketed form (bucket metadata only
    survives catalog reads), else a parquet path."""
    if ref.startswith("table:"):
        return spark.table(ref[len("table:"):])
    return spark.read.parquet(ref)
