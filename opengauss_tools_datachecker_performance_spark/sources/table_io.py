"""Table IO: Iceberg-first load/write with a parquet stand-in.

The engine's contract (north rule) is Iceberg tables.  This sandbox
ships no Iceberg runtime jars, so every module works on parquet
directories with an explicit ``part`` partition column — the same
logical shape (partitioned table + per-partition lineage).  This
module is the single seam: callers say ``load_table(spark, ref)`` and
get the right reader either way.

Ref grammar:
* ``iceberg:db.tbl``            → ``spark.read.format('iceberg').load('db.tbl')``
* ``iceberg:db.tbl@<snapshot>`` → time-travel read of that snapshot
  (``option('snapshot-id', ...)``) — how a resumed run re-reads the
  EXACT data version its ledger rows were computed from.
* ``table:name``                → ``spark.table(name)`` — catalog read;
  the only path that preserves bucketBy metadata (sources.bucketed),
  so bucketed source+sink diff without a shuffle.
* anything else                 → parquet path.

On Iceberg, the lineage ledger's ``digest`` column is complemented by
the snapshot id (``current_snapshot_id``) so resume can verify the
table hasn't advanced under the checkpoint; on parquet the content
digest alone plays that role (plans/lineage.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_PREFIX = "iceberg:"
TABLE_PREFIX = "table:"


def is_iceberg_ref(ref: str) -> bool:
    return ref.startswith(ICEBERG_PREFIX)


def parse_iceberg_ref(ref: str) -> tuple[str, int | None]:
    """``iceberg:db.tbl[@snapshot]`` → (identifier, snapshot_id|None)."""
    body = ref[len(ICEBERG_PREFIX):]
    if "@" in body:
        ident, snap = body.rsplit("@", 1)
        return ident, int(snap)
    return body, None


def load_table(spark: SparkSession, ref: str) -> DataFrame:
    if is_iceberg_ref(ref):
        ident, snap = parse_iceberg_ref(ref)
        reader = spark.read.format("iceberg")
        if snap is not None:
            reader = reader.option("snapshot-id", str(snap))
        return reader.load(ident)
    if ref.startswith(TABLE_PREFIX):
        return spark.table(ref[len(TABLE_PREFIX):])
    return spark.read.parquet(ref)


def write_table(df: DataFrame, ref: str, mode: str = "overwrite") -> None:
    if is_iceberg_ref(ref):
        ident, _ = parse_iceberg_ref(ref)
        df.writeTo(ident).using("iceberg").createOrReplace()
        return
    df.write.mode(mode).parquet(ref)


def current_snapshot_id(spark: SparkSession, ref: str) -> int | None:
    """Iceberg current snapshot id (for ledger rows); None on parquet."""
    if not is_iceberg_ref(ref):
        return None
    ident, _ = parse_iceberg_ref(ref)
    row = spark.sql(
        f"SELECT snapshot_id FROM {ident}.snapshots ORDER BY committed_at DESC LIMIT 1"
    ).head(1)
    return row[0]["snapshot_id"] if row else None


def hadoop_rmtree(spark: SparkSession, path: str) -> None:
    """Recursive delete through the Hadoop FileSystem API — works for
    local paths AND hdfs:///s3a:// storage, where a shutil.rmtree
    would silently no-op and leave stale files behind.  Missing paths
    are fine; a delete the filesystem REFUSES raises."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(jpath) and not fs.delete(jpath, True):
        raise IOError(f"failed to delete {path}")
