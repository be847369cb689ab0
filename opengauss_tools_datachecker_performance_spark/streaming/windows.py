"""Event-time windowed rate aggregation with watermark semantics.

The reference keeps a 30 s sliding rows/sec rate over *processing*
time (datachecker-check/.../modules/report/ProgressService.java:73-175,
CheckRateCache.java:35-117).  The streaming growth path (SURVEY.md
§2.9) needs *event-time* semantics on top of that: change events from
a CDC feed arrive out of order, must be aggregated into the window
their event time belongs to, and the aggregation state must be
finalizable — otherwise a long-running incremental check accumulates
one open window per hour forever.

Spark-native shape: ``withWatermark(time_col, lateness)`` +
``groupBy(F.window(...))``.  The watermark

* bounds state: a window is dropped from the state store once the
  watermark (max observed event time − lateness) passes its end;
* defines late-data policy: events older than the watermark are
  discarded instead of reopening a finalized window;
* enables append-mode output: each window is emitted exactly once,
  when it finalizes — the right contract for a violations/metrics
  sink that downstream consumers tail.

The same builder runs unchanged on batch frames (Spark ignores
``withWatermark`` outside streaming), so one implementation serves
the batch catalog query (oracle-checked) and the stream (tested via
two availableNow runs over a shared checkpoint in
tests/test_streaming.py — the watermark survives restart, on-time
data is emitted once, late data is dropped).

Scale note: state per live window is one (count, sum) pair — the
watermark caps live windows at ~((lateness + window) / slide)
independent of input volume; no per-key state, no doc bodies held.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_change_rate(
    events: DataFrame,
    time_col: str = "ts",
    window: str = "30 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
    value_col: str | None = None,
) -> DataFrame:
    """Events-per-second per event-time window, late data bounded by
    ``watermark``.  Works on both streaming and batch DataFrames.

    Output: (window_start string, n_events bigint, events_per_sec
    string, [sum_value string]) — rates/sums pinned to fixed-scale
    decimals rendered as strings, the repo-wide oracle-parity rule.
    """
    win = (
        F.window(time_col, window, slide) if slide else F.window(time_col, window)
    ).alias("w")
    # window length in seconds, derived from the window struct itself
    # so the rate denominator always matches the requested duration.
    # timestamp_diff expresses that directly; unix_timestamp
    # subtraction would be equivalent (on TIMESTAMP inputs it returns
    # TZ-independent epoch seconds — no DST skew in either form)
    dur = F.timestamp_diff("SECOND", F.col("w.start"), F.col("w.end"))
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(
            F.round(F.sum(value_col), 4)
            .cast("decimal(18,4)")
            .cast("string")
            .alias("sum_value")
        )
    out_cols = [
        F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "n_events",
        F.round(F.col("n_events") / dur, 6)
        .cast("decimal(12,6)")
        .cast("string")
        .alias("events_per_sec"),
    ]
    if value_col is not None:
        out_cols.append(F.col("sum_value"))
    return (
        events.withWatermark(time_col, watermark)
        .groupBy(win)
        .agg(*aggs)
        .select(*out_cols)
    )
