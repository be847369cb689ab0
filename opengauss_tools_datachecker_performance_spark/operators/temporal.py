"""Temporal operators Spark lacks natively: as-of join,
sessionization, and bucketed interval (range) join.

All three stay in partitioned windows / equi-joins — the shapes that
hold at 10^12 events: an as-of join is a union + per-key
last-non-null carry-forward (never a per-row subquery); a range join
equi-joins on coarse time buckets and filters exactly (never a
BroadcastNestedLoopJoin over intervals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    value_cols: list[str],
    prefix: str = "asof_",
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """For every left row, attach the LATEST right row with the same
    key and ts ≤ left.ts (the classic trades/quotes as-of).

    Implementation is the scale-canonical union trick: tag both sides,
    union, and carry the last non-null right values forward inside a
    window PARTITIONED BY key ORDER BY (ts, side) — right rows sort
    before left rows at equal ts, so a same-timestamp quote is visible
    to its trade.  One shuffle on the key, no self-join, no per-row
    probe; skewed keys can pre-salt the left side upstream."""
    lcols = left.columns
    tagged_l = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in value_cols],
    )
    # tiebreak columns must carry REAL values on both sides so equal-ts
    # rows order deterministically within each side too
    keep = {key_col, ts_col, *(tiebreak_cols or [])} & set(right.columns)
    tagged_r = right.select(
        *[
            F.col(c)
            if c in keep
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
    )
    u = tagged_l.unionByName(tagged_r)
    order = [F.col(ts_col).asc(), F.col("_side").asc()] + [
        F.col(c).asc() for c in (tiebreak_cols or [])
    ]
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *lcols,
        "_side",
        *[
            F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).drop("_side")


def sessionize(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Gap-based sessionization → (key, session_id, n_events,
    session_start, session_end): a new session starts when the gap
    from the previous event of the same key exceeds ``gap_minutes``.

    Two stacked windows, both PARTITIONED BY the key (lag to mark
    session starts, running sum to number them), then one aggregate —
    the standard distributed gap-and-island, linear in events per key.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc())
    # gap compared in integer microseconds — exact, no float-seconds
    # boundary ambiguity at the threshold
    gap_us = int(round(gap_minutes * 60.0 * 1_000_000))
    prev = F.lag(ts_col).over(w)
    # timestamp_diff is exact integer microseconds AND type-agnostic:
    # NTZ gaps never route through a session-timezone cast, so the
    # result is identical whatever TZ the driver session pins
    is_new = F.when(
        prev.isNull()
        | (
            F.timestamp_diff("MICROSECOND", prev, F.col(ts_col))
            > F.lit(gap_us)
        ),
        1,
    ).otherwise(0)
    numbered = events.withColumn("_new", is_new).withColumn(
        "session_id",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return numbered.groupBy(key_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
    )


def interval_count_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    id_col: str = "interval_id",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_minutes: int = 60,
) -> DataFrame:
    """Count points falling in each [start, end] interval →
    (interval_id, n_points) — WITHOUT a non-equi join.

    Each interval explodes to the coarse time buckets it overlaps
    (sequence of epoch buckets), points map to their single bucket,
    and a plain equi-join on the bucket + exact containment filter
    does the rest.  Cost scales with interval-length / bucket size,
    not |points| × |intervals|; pick ``bucket_minutes`` near the
    median interval length.  Intervals that match zero points still
    report n_points=0 (left join from intervals)."""
    bucket_s = bucket_minutes * 60
    # wall-clock epoch seconds, session-TZ-independent (same NTZ-diff
    # form as rate_anomaly; only used internally for bucketing, but a
    # session-dependent bucket edge is a debugging trap)
    _epoch_ntz = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    sec = lambda c: F.timestamp_diff(  # noqa: E731
        "SECOND", _epoch_ntz, c.cast("timestamp_ntz")
    )
    p = points.select(
        F.col(ts_col).alias("_ts"),
        (sec(F.col(ts_col)) / bucket_s).cast("long").alias("_bk"),
    )
    # an inverted interval (end < start) matches nothing by definition —
    # keep it OUT of the bucket explode (F.sequence would emit a
    # DESCENDING bucket range: wasted candidate rows) but IN the final
    # left join, so it still reports n_points=0 instead of vanishing
    valid = intervals.filter(F.col(end_col) >= F.col(start_col))
    iv = valid.select(
        id_col,
        F.col(start_col).alias("_s"),
        F.col(end_col).alias("_e"),
        F.explode(
            F.sequence(
                (sec(F.col(start_col)) / bucket_s).cast("long"),
                (sec(F.col(end_col)) / bucket_s).cast("long"),
            )
        ).alias("_bk"),
    )
    hits = (
        iv.join(p, "_bk")
        .filter((F.col("_ts") >= F.col("_s")) & (F.col("_ts") <= F.col("_e")))
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_points"))
    )
    return (
        intervals.select(id_col)
        .join(hits, id_col, "left")
        .select(id_col, F.coalesce("n_points", F.lit(0)).alias("n_points"))
    )


def rate_anomaly(
    events: DataFrame,
    ts_col: str,
    group_col: str,
    window_minutes: int = 60,
    trailing: int = 24,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Windowed event-rate anomaly detection → (group, window_start,
    n_events, trailing_mean, z, anomalous): tumbling ``window_minutes``
    counts per group, each compared against the mean/stddev of the
    ``trailing`` PRECEDING windows of the same group (rows-frame
    window, partitioned by group — never a global sort).

    Empty windows are materialized via a per-group dense window spine
    (sequence over the group's [min,max] bucket range) so a traffic
    OUTAGE scores as anomalous instead of silently vanishing — the
    classic gap in naive groupBy-count anomaly checks.  Windows with
    fewer than 2 trailing samples report z NULL and no verdict; a
    ZERO-VARIANCE baseline reports z NULL but still flags any
    deviation from the constant rate (an outage against a perfectly
    steady baseline is the most anomalous case, not an undefined
    one)."""
    from pyspark.sql.window import Window

    bucket_s = window_minutes * 60
    # wall-clock epoch seconds via an NTZ diff — a bare
    # cast("timestamp").cast("long") interprets an NTZ column in the
    # SESSION timezone, shifting every bucket boundary when the driver
    # session isn't UTC (caught by driver_hash_repro --tz)
    _epoch_ntz = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    sec = lambda c: F.timestamp_diff(  # noqa: E731
        "SECOND", _epoch_ntz, c.cast("timestamp_ntz")
    )
    b = events.select(
        F.col(group_col).alias("group"),
        (sec(F.col(ts_col)) / bucket_s).cast("long").alias("_bk"),
    )
    counts = b.groupBy("group", "_bk").agg(F.count(F.lit(1)).alias("n_events"))
    spine = (
        counts.groupBy("group")
        .agg(F.min("_bk").alias("_lo"), F.max("_bk").alias("_hi"))
        .select("group", F.explode(F.sequence("_lo", "_hi")).alias("_bk"))
    )
    dense = spine.join(counts, ["group", "_bk"], "left").select(
        "group", "_bk", F.coalesce("n_events", F.lit(0)).alias("n_events")
    )
    w = (
        Window.partitionBy("group")
        .orderBy("_bk")
        .rowsBetween(-trailing, -1)
    )
    mean = F.avg("n_events").over(w)
    sd = F.stddev_samp("n_events").over(w)
    cnt = F.count("n_events").over(w)
    z = F.when(
        (cnt >= 2) & (sd > 0), (F.col("n_events") - mean) / sd
    )
    anomalous = F.when(
        (cnt >= 2) & (sd > 0), F.abs(z) > z_threshold
    ).when((cnt >= 2) & (sd == 0), F.col("n_events") != mean)
    return dense.select(
        "group",
        F.timestamp_seconds(F.col("_bk") * bucket_s).alias("window_start"),
        "n_events",
        mean.alias("trailing_mean"),
        z.alias("z"),
        anomalous.alias("anomalous"),
    )
