"""Per-partition lineage + resumable runs (SURVEY.md X12, north rule).

Reference: slice status bitmask registry (source=1|sink=2|checked=4,
datachecker-check/.../cache/TableStatusRegister.java, SliceVo.java:68-70)
— an in-heap ledger; a crash loses it.  Here the ledger is a parquet
checkpoint table (Iceberg stand-in) with one row per completed
partition:

    (run_id, part, n_rows, digest, status, wall_ts)

Resume = read the ledger, take parts with status='done', anti-join
them from the partition universe, and validate only the remainder —
the driver-side list is tiny (#partitions), so the anti-join is a
Python set difference feeding partition pruning, not a data shuffle.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_LEDGER_SCHEMA = "run_id string, part int, n_rows long, digest long, status string, wall_ts double"


def ledger_path(checkpoint_dir: str) -> str:
    return os.path.join(checkpoint_dir, "partition_ledger.parquet")


def read_ledger(spark: SparkSession, checkpoint_dir: str) -> DataFrame:
    path = ledger_path(checkpoint_dir)
    try:
        return spark.read.schema(_LEDGER_SCHEMA).parquet(path)
    except Exception:
        return spark.createDataFrame([], _LEDGER_SCHEMA)


def completed_partitions(spark: SparkSession, checkpoint_dir: str) -> set[int]:
    rows = (
        read_ledger(spark, checkpoint_dir)
        .filter(F.col("status") == "done")
        .select("part")
        .distinct()
        .collect()
    )
    return {r["part"] for r in rows}


def pending_partitions(
    spark: SparkSession, checkpoint_dir: str, all_partitions: list[int]
) -> list[int]:
    """The resume anti-join (driver-side set difference — the universe
    is #partitions, not #rows)."""
    done = completed_partitions(spark, checkpoint_dir)
    return sorted(set(all_partitions) - done)


def record_partitions(
    spark: SparkSession,
    checkpoint_dir: str,
    run_id: str,
    partition_stats: DataFrame,
) -> None:
    """Append (part, n_rows, digest) stats as 'done' ledger rows.
    ``partition_stats`` must have columns part, n_rows, digest."""
    now = time.time()
    out = partition_stats.select(
        F.lit(run_id).alias("run_id"),
        F.col("part").cast("int"),
        F.col("n_rows").cast("long"),
        F.col("digest").cast("long"),
        F.lit("done").alias("status"),
        F.lit(now).alias("wall_ts"),
    )
    out.write.mode("append").parquet(ledger_path(checkpoint_dir))


def partition_stats(docs: DataFrame, partition_col: str = "part") -> DataFrame:
    """(part, n_rows, digest): XOR fold of span-sequence digests per
    partition — the lineage digest the ledger stores (snapshot-id
    analogue in a real Iceberg deployment).

    Digest-companion inputs (or validate's enriched digest frames)
    fold their stored ``v_hash`` directly — no body scan, so the
    ledger write and the companion staleness check both stay
    metadata-sized."""
    if "v_hash" in docs.columns and "spans" not in docs.columns:
        keyed = docs.select(
            F.col(partition_col).alias("part"), F.col("v_hash")
        )
    else:
        from opengauss_tools_datachecker_performance_spark.digest import (
            span_sequence_hash_col,
        )

        keyed = docs.select(
            F.col(partition_col).alias("part"),
            span_sequence_hash_col(F.col("spans")).alias("v_hash"),
        )
    return keyed.groupBy("part").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(v_hash)").alias("digest"),
    )
