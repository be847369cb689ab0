"""Privacy-shape audits over training corpora/tables.

k-anonymity is the table-level dual of the per-document PII scan
(functions/text.py pii_scan): even with direct identifiers scrubbed,
a row whose QUASI-identifier combination (e.g. nation x market
segment x birth-year bucket) is shared by fewer than k rows is
re-identifiable by joining public data.  A training-data release gate
therefore wants the group-size profile of the chosen QI columns, not
just regex hits.

Scale shape: one partial-aggregated groupBy over the QI columns
(map-side combine collapses duplicates; hot QI combos are the GOOD
case), then a second #groups-sized aggregate to the one-row verdict —
no per-group row sets, no windows.  The verdict row (not a per-group
dump) is the driver-facing output: group VALUES below k are exactly
what must not leak into a report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def k_anonymity_audit(df: DataFrame, qi_cols: list[str], k: int) -> DataFrame:
    """→ one row (k, n_rows, n_groups, n_small_groups, rows_at_risk,
    min_group_size, k_anonymous): the table satisfies k-anonymity on
    ``qi_cols`` iff every QI group holds ≥ k rows.  ``rows_at_risk``
    counts rows inside sub-k groups — the quantity a release gate
    thresholds (dropping or generalizing those rows is the remedy)."""
    sizes = df.groupBy(*qi_cols).agg(F.count(F.lit(1)).alias("_n"))
    return sizes.agg(
        F.lit(k).cast("long").alias("k"),
        F.sum("_n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum((F.col("_n") < k).cast("long")).cast("long").alias("n_small_groups"),
        F.sum(F.when(F.col("_n") < k, F.col("_n")).otherwise(0))
        .cast("long")
        .alias("rows_at_risk"),
        F.min("_n").cast("long").alias("min_group_size"),
        (F.min("_n") >= k).alias("k_anonymous"),
    )
