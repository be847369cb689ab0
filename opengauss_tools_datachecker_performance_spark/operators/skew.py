"""Skew handling (SURVEY.md X1; north rule: "skew handled explicitly").

Where skew can and cannot bite this engine:

* **groupBy aggregations** (bucket XOR signatures, verdict counts,
  quantile profiles) are skew-immune by construction: Spark's hash
  aggregates partial-aggregate map-side, so a reducer receives one
  combined row per map task per key, never the raw row count.
* **The diff join** keys on ``doc_id`` (unique per side ⇒ ≤ 2 rows per
  key) — no hot keys possible.
* **The referential join** distincts media refs before the anti-join
  and routes the dangling set through :func:`small_side` (AQE runtime
  sizing) — a media_ref referenced by millions of spans is collapsed
  map-side first, and a wholesale-stale catalog degrades to a shuffle
  instead of a driver OOM.
* What remains is **physical-partition skew**: a hot ``part`` (or a
  hot doc_id prefix feeding a partitioner) makes one TASK heavy in any
  per-partition pass. Two levers, both here:
  - AQE skew-join splitting + runtime coalescing (session.py, on by
    default) repairs it at shuffle boundaries;
  - :func:`salted_repartition` repairs it at the source: spread any
    hot grouping value across ``salt_buckets`` tasks deterministically.

Determinism note: the salt is derived from hashes of OTHER columns of
the row (not ``rand()``/``monotonically_increasing_id``), so Spark
task retries re-produce identical placement — the same property the
digest layer relies on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def small_side(df: DataFrame) -> DataFrame:
    """Join-side marker for frames EXPECTED to be small but whose size
    is corpus-proportional (candidate-pair sets, stop-shingle sets):
    with AQE on (the engine default, session.py) the frame is returned
    UNHINTED — AQE's runtime size check still broadcasts it whenever
    the materialized side is under
    ``spark.sql.autoBroadcastJoinThreshold``, and falls back to a
    shuffle join when near-dup density or vocabulary growth blows it
    past driver/executor broadcast budgets (where an unconditional
    ``F.broadcast`` hint becomes an OOM at 100 TB).  With AQE off
    (perf-probe configuration only) the broadcast is pinned, because
    static stats cannot see through the aggregations that produce
    these frames and sandbox scales always fit the threshold."""
    aqe = (
        df.sparkSession.conf.get("spark.sql.adaptive.enabled", "true").lower()
        == "true"
    )
    return df if aqe else F.broadcast(df)


def salt_col(cols: list[str], salt_buckets: int) -> Column:
    """Deterministic salt in [0, salt_buckets): hash of the given
    columns (use value/content columns, NOT the hot key itself)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(salt_buckets))


def salted_repartition(
    df: DataFrame,
    key_col: str,
    n_partitions: int,
    salt_buckets: int | None = None,
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Repartition by (key, salt) so a hot ``key_col`` value occupies
    every task instead of one.  ``salt_from`` defaults to every other
    column (content-derived, retry-stable).  ``salt_buckets`` defaults
    to ``4 × n_partitions``: the (key, salt) combos land in partitions
    by hash, so the bucket count must comfortably exceed the partition
    count or balls-in-bins collisions leave a residual ~2-3× skew.

    Aggregations over the result use the two-level pattern:
    ``groupBy(key, salt).agg(partial)`` then ``groupBy(key).agg(merge)``
    — for commutative folds (counts, sums, bit_xor digests) the merge
    is the same function."""
    salt_from = salt_from or [c for c in df.columns if c != key_col]
    if not salt_from:
        raise ValueError("need at least one non-key column to derive the salt")
    if salt_buckets is None:
        salt_buckets = 4 * n_partitions
    return df.repartition(
        n_partitions, F.col(key_col), salt_col(salt_from, salt_buckets)
    )


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_name: str = "rn",
    n_buckets: int | None = None,
) -> DataFrame:
    """Exact global ``row_number() OVER (ORDER BY order_cols)`` without
    the single-task global window — the DataFrame analogue of
    ``RDD.zipWithIndex``, for a NUMERIC (or date/timestamp) leading
    order column. Three bounded passes:

    1. min/max of the leading column (partial agg, one scalar row);
    2. rows bucket by a linear map of the leading column onto
       ``n_buckets`` ranges — explicitly deterministic, unlike
       ``repartitionByRange``, whose RangePartitioner seeds its
       reservoir sampler from the runtime RDD id, so two jobs over
       the same lazy exchange can compute DIFFERENT boundaries (the
       offsets would then belong to the wrong partitions — observed,
       not hypothetical). Per-bucket counts collect to the driver
       (#buckets rows) and cumulate into starting offsets;
    3. rank locally inside each bucket (window groups bounded by one
       bucket) and add the bucket's offset via a broadcast join.

    The linear map is weakly monotone (IEEE multiply/divide by
    positive constants preserves ordering), and rows that tie on the
    leading column always share a bucket, so offset + local rank is
    exactly the global rank. ``order_cols`` should be a unique key
    for deterministic ranks. Bucket sizes follow the VALUE
    distribution, not an equi-depth sample — a pathological
    distribution concentrates buckets (still never worse than the
    single-task window); size ``n_buckets`` generously (default 4×
    shuffle partitions).
    """
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = 4 * int(spark.conf.get("spark.sql.shuffle.partitions"))
    lead = F.col(order_cols[0]).cast("double")
    mm = df.agg(
        F.min(lead).alias("lo"), F.max(lead).alias("hi")
    ).collect()[0]
    if mm["lo"] is None:  # empty input (or all-NULL key)
        return df.withColumn(rank_name, F.lit(None).cast("long")).limit(0)
    lo, hi = float(mm["lo"]), float(mm["hi"])
    span = hi - lo
    if span > 0:
        bucket = F.least(
            F.lit(n_buckets - 1),
            F.greatest(
                F.lit(0), F.floor((lead - F.lit(lo)) / F.lit(span) * n_buckets)
            ),
        ).cast("int")
    else:
        bucket = F.lit(0)
    bucketed = df.withColumn("_b", bucket)
    counts = bucketed.groupBy("_b").agg(F.count(F.lit(1)).alias("_n")).collect()
    cum = 0
    offsets = []
    for r in sorted(counts, key=lambda r: r["_b"]):
        offsets.append((r["_b"], cum))
        cum += r["_n"]
    off = spark.createDataFrame(offsets, "_b int, _off long")
    from pyspark.sql.window import Window

    w = Window.partitionBy("_b").orderBy(*[F.col(c) for c in order_cols])
    return (
        bucketed.withColumn("_lrn", F.row_number().over(w))
        .join(F.broadcast(off), "_b")
        .withColumn(rank_name, (F.col("_lrn") + F.col("_off")).cast("long"))
        .drop("_b", "_lrn", "_off")
    )


def partition_sizes(df: DataFrame) -> list[int]:
    """Rows per physical partition (diagnostic; one tiny agg job)."""
    rows = (
        df.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )
    return sorted((r["count"] for r in rows), reverse=True)


def skew_factor(df: DataFrame) -> float:
    """max/mean partition size — 1.0 is perfectly balanced."""
    sizes = partition_sizes(df)
    if not sizes or sum(sizes) == 0:
        return 1.0
    return max(sizes) / (sum(sizes) / len(sizes))


def global_rank_cumsum(
    df: DataFrame,
    order_cols: list[str],
    sum_col: str,
    rank_name: str = "rn",
    cum_name: str = "cum",
    n_buckets: int | None = None,
) -> DataFrame:
    """:func:`global_rank` extended with an exact global PREFIX SUM of
    ``sum_col`` in the same bounded three passes: the per-bucket
    driver collect carries (count, sum) instead of count, so both the
    rank offset and the running-total offset cumulate from #buckets
    rows, and the single-task global window that
    ``SUM() OVER (ORDER BY ...)`` would plan never exists.  Same
    contract as global_rank: numeric leading order column, unique
    order_cols for determinism, ties share a bucket by construction."""
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = 4 * int(spark.conf.get("spark.sql.shuffle.partitions"))
    lead = F.col(order_cols[0]).cast("double")
    mm = df.agg(
        F.min(lead).alias("lo"),
        F.max(lead).alias("hi"),
        # contract check folded into the pass we already pay for: NULL
        # order values would make bucket NULL (driver sort TypeError)
        # and NULL sums would poison the running total — fail fast
        F.sum(
            F.when(
                lead.isNull() | F.col(sum_col).isNull(), F.lit(1)
            ).otherwise(F.lit(0))
        ).alias("n_null"),
    ).collect()[0]
    if mm["n_null"]:
        raise ValueError(
            f"global_rank_cumsum: {mm['n_null']} row(s) have NULL in "
            f"order column {order_cols[0]!r} or sum column {sum_col!r}; "
            "the contract requires non-NULL numeric values — filter or "
            "coalesce them before ranking"
        )
    if mm["lo"] is None:
        return (
            df.withColumn(rank_name, F.lit(None).cast("long"))
            .withColumn(cum_name, F.lit(None).cast("long"))
            .limit(0)
        )
    lo, hi = float(mm["lo"]), float(mm["hi"])
    span = hi - lo
    if span > 0:
        bucket = F.least(
            F.lit(n_buckets - 1),
            F.greatest(
                F.lit(0), F.floor((lead - F.lit(lo)) / F.lit(span) * n_buckets)
            ),
        ).cast("int")
    else:
        bucket = F.lit(0)
    bucketed = df.withColumn("_b", bucket)
    stats = (
        bucketed.groupBy("_b")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.col(sum_col).cast("long")).alias("_s"),
        )
        .collect()
    )
    cum_n, cum_s = 0, 0
    offsets = []
    for r in sorted(stats, key=lambda r: r["_b"]):
        offsets.append((r["_b"], cum_n, cum_s))
        cum_n += r["_n"]
        cum_s += r["_s"]
    off = spark.createDataFrame(offsets, "_b int, _off long, _soff long")
    from pyspark.sql.window import Window

    w = Window.partitionBy("_b").orderBy(*[F.col(c) for c in order_cols])
    return (
        bucketed.withColumn("_lrn", F.row_number().over(w))
        .withColumn(
            "_lcs",
            F.sum(F.col(sum_col).cast("long")).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .join(F.broadcast(off), "_b")
        .withColumn(rank_name, (F.col("_lrn") + F.col("_off")).cast("long"))
        .withColumn(cum_name, (F.col("_lcs") + F.col("_soff")).cast("long"))
        .drop("_b", "_lrn", "_lcs", "_off", "_soff")
    )


def join_explosion_audit(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    top_k: int = 20,
    min_product: int = 1,
) -> DataFrame:
    """Join-cardinality pre-flight → the ``top_k`` keys by output
    fan-out (n_left × n_right), with both side counts.  Run this
    BEFORE a big join: one hot key with 10^5 rows on each side emits
    10^10 output rows and takes the stage down — this audit costs two
    partial-aggregate passes and an inner join of the (distinct-key)
    count frames, nothing near the join itself.

    The top-k is a TakeOrdered over the joined count frame (bounded
    driver transfer), not a global sort."""
    lc = left.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_left"))
    rc = right.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n_right"))
    j = lc.join(rc, key_cols).withColumn(
        "n_out", F.col("n_left") * F.col("n_right")
    )
    return (
        j.filter(F.col("n_out") >= min_product)
        .orderBy(F.col("n_out").desc(), *[F.col(c) for c in key_cols])
        .limit(top_k)
    )
