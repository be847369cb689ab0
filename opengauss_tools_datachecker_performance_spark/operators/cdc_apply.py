"""Apply a CDC change batch to a table snapshot (MERGE semantics).

The reference reaches consistency by re-extracting and diffing after
changes; the forward operation — folding a decoded Debezium batch
(key, op, row image) into the snapshot — is the natural companion:
it is what keeps the "sink" side fresh between checks (and what a
repair replays).  Shape: dedupe the batch to the LAST image per key
(partitioned window over the batch only, which is orders of magnitude
smaller than the snapshot), then one full-outer-style merge via
left-anti + union — a single shuffle of each side on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def latest_change_per_key(
    changes: DataFrame, key_col: str, order_cols: list[str]
) -> DataFrame:
    """Collapse a CDC batch to its final image per key: the row with
    the greatest ``order_cols`` (ts, offset, ...) wins.  Windowed over
    the BATCH, partitioned by key — never touches the snapshot."""
    w = Window.partitionBy(key_col).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_cdc(
    snapshot: DataFrame,
    changes: DataFrame,
    key_col: str,
    op_col: str = "op",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Fold a CDC batch into a snapshot → the merged table.

    ``changes`` carries the snapshot's columns plus ``op_col`` in
    {'c','u','d'} (Debezium ops; 'r' snapshot-reads count as upserts).
    Deletes drop the key; creates/updates replace or insert the full
    row image.  ``order_cols`` (default: none — batch is assumed
    pre-deduped) picks the winning image when a key appears multiple
    times in one batch.

    Plan: snapshot LEFT ANTI JOIN touched-keys ∪ upsert-images — one
    shuffle per side on the key, no full-outer row comparison, and the
    anti join broadcasts when the batch is small (the common case)."""
    if order_cols:
        changes = latest_change_per_key(changes, key_col, order_cols)
    touched = changes.select(key_col).distinct()
    upserts = changes.filter(F.col(op_col) != "d").drop(op_col)
    survivors = snapshot.join(touched, key_col, "left_anti")
    return survivors.unionByName(upserts.select(*snapshot.columns))
