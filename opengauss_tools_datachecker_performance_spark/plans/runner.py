"""Validation runner: one pass over the doc table → per-partition
verdicts + violation rows.

Output contract (the reference's CheckDiffResult + Difference,
datachecker-check/.../modules/check/CheckDiffResult.java:55-130,
.../entry/check/Difference.java:27-33, re-shaped):

* ``violations``: (part, constraint, key, span_idx, detail) — one row
  per violating doc; ``span_idx`` set where span-resolution applies
  (corrupted span, dangling ref, null text).
* ``verdicts``:   (part, constraint, n_violations, status) — complete
  grid over partitions × constraints; ``status`` ∈ pass|fail.

Constraints: consistency (diff vs sink: detail=insert|update|delete),
unique, referential, null_text, drift, schema.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.checks.drift import (
    drift_from_profiles,
    quantile_profiles,
)
from opengauss_tools_datachecker_performance_spark.checks.schema_check import (
    DOCS_SCHEMA,
    check_schema,
)
from opengauss_tools_datachecker_performance_spark.checks.span_rules import (
    span_rule_violations_from_digests,
)
from opengauss_tools_datachecker_performance_spark.checks.uniqueness import (
    duplicate_keys_from_digests,
)
from opengauss_tools_datachecker_performance_spark.digest import (
    bucket_of,
    span_sequence_hash_col,
)
from opengauss_tools_datachecker_performance_spark.functions.hashing import k_hash
from opengauss_tools_datachecker_performance_spark.operators.diff import (
    diff_digests,
    first_divergent_span,
)

CONSTRAINTS = ["consistency", "unique", "referential", "null_text", "drift"]

_VIOLATION_SCHEMA = "part int, constraint string, key string, span_idx int, detail string"


@dataclass
class ValidationResult:
    violations: DataFrame
    verdicts: DataFrame
    schema_ok: bool
    schema_message: str = ""
    extras: dict = field(default_factory=dict)


def _empty_violations(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], _VIOLATION_SCHEMA)


def drift_verdicts(drift: DataFrame) -> DataFrame:
    """(part, drift_score, drifted) → verdict-grid rows for 'drift'."""
    return drift.select(
        F.col("part"),
        F.lit("drift").alias("constraint"),
        F.col("drifted").cast("int").cast("long").alias("n_violations"),
        F.when(F.col("drifted"), "fail").otherwise("pass").alias("status"),
    )


def _enriched_digests(docs: DataFrame) -> DataFrame:
    """One projection of the scan carrying everything the cheap checks
    need: span-sequence digest + k_hash (diff, uniqueness), partition,
    and the drift metric — so diff, uniqueness, drift, the partition
    universe and lineage all run off this one persisted frame without
    re-reading doc bodies.

    The canonical rendered string is computed ONCE and feeds both the
    digest (xxhash64) and the drift metric (length): a single
    span-touching pass per doc instead of separate hash and text-length
    aggregations. The length of the canonical render (text + kind +
    media_ref chars) is monotone in text volume, which is exactly what
    the distribution-drift check needs."""
    from opengauss_tools_datachecker_performance_spark.digest import (
        _sorted_spans,
        media_spans_col,
        null_text_idxs_col,
        render_sorted_spans,
    )

    key = F.col("doc_id").cast("string")
    kh = k_hash(key)
    s = F.col("_s")
    return docs.select(
        key.alias("key"),
        kh.alias("k_hash"),
        _sorted_spans(F.col("spans")).alias("_s"),
        bucket_of(kh).alias("bucket"),
        F.col("part"),
    ).select(
        "key",
        "k_hash",
        F.xxhash64(render_sorted_spans(s)).alias("v_hash"),
        "bucket",
        "part",
        F.length(render_sorted_spans(s)).cast("double").alias("text_len"),
        # span-rule inputs ride the same scan (sorted-order indexes):
        # a handful of (idx, ref) pairs + an almost-always-empty int
        # array per doc — the cached frame stays body-free
        media_spans_col(s).alias("media_spans"),
        null_text_idxs_col(s).alias("null_text_idxs"),
    )


def validate_docs(
    docs_source: DataFrame,
    docs_sink: DataFrame | None,
    assets: DataFrame | None,
    partition_col: str = "part",
    only_partitions: list[int] | None = None,
    drift_threshold: float = 0.15,
    two_phase: bool = True,
    eager: bool = True,
    max_violations_per_partition: int | None = None,
    skip_drift: bool = False,
) -> ValidationResult:
    """Run every applicable check; returns violations + verdict grid.

    ``only_partitions`` implements resume: restrict the scan up front
    (partition pruning on the parquet/Iceberg partition column) —
    see plans.lineage for the anti-join that computes the list.
    """
    spark = docs_source.sparkSession

    # --- schema pre-check: failure excludes data checks (ref §3.2) ---
    present = {f.name for f in docs_source.schema.fields}
    probe_cols = [f.name for f in DOCS_SCHEMA.fields if f.name in present]
    sres = check_schema(
        docs_source.select(*probe_cols) if probe_cols else docs_source.limit(0),
        DOCS_SCHEMA,
        check_types=True,
    )
    if only_partitions is not None:
        docs_source = docs_source.filter(F.col(partition_col).isin(only_partitions))
        if docs_sink is not None:
            docs_sink = docs_sink.filter(F.col(partition_col).isin(only_partitions))
    docs_source = docs_source.withColumnRenamed(partition_col, "part")
    if docs_sink is not None:
        docs_sink = docs_sink.withColumnRenamed(partition_col, "part")

    if not sres.equal:
        parts_all = docs_source.select("part").distinct()
        if docs_sink is not None:
            parts_all = parts_all.union(docs_sink.select("part")).distinct()
        verdicts = (
            parts_all.crossJoin(
                spark.createDataFrame([(c,) for c in ["schema"]], "constraint string")
            )
            .select(
                "part",
                "constraint",
                F.lit(1).alias("n_violations"),
                F.lit("fail").alias("status"),
            )
        )
        return ValidationResult(
            violations=_empty_violations(spark),
            verdicts=verdicts,
            schema_ok=False,
            schema_message=sres.message,
        )

    # --- digest frames: computed ONCE, persisted, reused by diff,
    # uniqueness (k_hash reuse), drift (text_len), the partition
    # universe and the verdict grid. The digest frame is the small
    # projection of the scan (5 longs + key), so it is the right thing
    # to persist at any scale — never the doc bodies.
    dig_src = _enriched_digests(docs_source).persist()
    dig_sink = (
        _enriched_digests(docs_sink).persist() if docs_sink is not None else None
    )
    if eager:
        # Materialize the digest caches as an explicit barrier before any
        # downstream branch is planned against them. Without this, the
        # first consumer to run is a driver-side BROADCAST BUILD (the
        # mismatched-bucket set), so the heaviest stage of the whole job
        # — the full doc scan + digest — executes inside a blocking
        # broadcast future while the main job's stages sit idle. One
        # count() per side turns the scan into an ordinary fully-parallel
        # job; every later branch then reads the in-memory columnar cache.
        dig_src.count()
        if dig_sink is not None:
            dig_sink.count()

    parts_all = dig_src.select("part").distinct()
    if dig_sink is not None:
        parts_all = parts_all.union(dig_sink.select("part")).distinct()

    pieces: list[DataFrame] = []
    diffs: DataFrame | None = None

    # --- consistency diff (the reference's core check) ---
    if dig_sink is not None:
        # persist: the diff result is tiny (≈ diff-rate × rows) but its
        # subtree is the bucket-prune + full-outer join over both digest
        # frames; it feeds BOTH the violation rows and the updated-key
        # broadcast below — without persist the broadcast build would
        # re-execute the whole join inside a driver-blocking future.
        diffs = diff_digests(
            dig_src, dig_sink, two_phase=two_phase, carry_cols=["part"]
        ).persist()
        if eager:
            diffs.count()
        # updated-key set is small → broadcast so span location does a
        # broadcast semi-join instead of shuffling both doc scans
        upd = F.broadcast(diffs.filter(F.col("diff_type") == "update").select("key"))
        span_loc = first_divergent_span(docs_source, docs_sink, upd)
        diff_v = (
            diffs.join(span_loc, "key", "left")
            .select(
                "part",
                F.lit("consistency").alias("constraint"),
                "key",
                F.col("span_idx").cast("int"),
                F.col("diff_type").alias("detail"),
            )
        )
        pieces.append(diff_v)

    # --- uniqueness (reuses dig_src's k_hash; zero extra scans) ---
    uniq = duplicate_keys_from_digests(dig_src).select(
        "part",
        F.lit("unique").alias("constraint"),
        "key",
        F.lit(None).cast("int").alias("span_idx"),
        F.lit(None).cast("string").alias("detail"),
    )
    pieces.append(uniq)

    # --- span-level rules: referential + null_text, off the digest
    # cache (zero extra doc-body scans; span_rules.py) ---
    pieces.append(
        span_rule_violations_from_digests(dig_src, assets).select(
            "part", "constraint", "key", "span_idx", "detail"
        )
    )

    violations = pieces[0]
    for p in pieces[1:]:
        violations = violations.unionByName(p)
    violations = violations.persist()
    violations_full = violations  # the persisted frame (unpersist handle)

    # --- verdict counts come from the FULL violation set; the
    # enumerated rows can be capped per (part, constraint) — the
    # analogue of the reference's large-diff guard rails (X11:
    # LargeDataDiffException / MerkleTreeDepthException,
    # DataCheckRunnable.java:165-182,299-322), except a flooded
    # partition still FAILS with its exact count instead of aborting
    # the run; only the per-row enumeration stops at the cap. ---
    counts = violations.groupBy("part", "constraint").agg(
        F.count(F.lit(1)).alias("n_violations")
    )
    if max_violations_per_partition is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("part", "constraint").orderBy("key", "span_idx")
        violations = (
            violations.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= max_violations_per_partition)
            .drop("_rn")
        )

    # --- drift (partition-level; metric rides on the digest frame).
    # The per-partition quantile PROFILES are always exposed: a chunked
    # run (``__main__ --chunk-partitions``) sets skip_drift=True,
    # persists each wave's profiles, and judges drift once over their
    # union so the baseline is run-global regardless of waving. ---
    drift_prof = quantile_profiles(
        dig_src.select("part", F.col("text_len").alias("metric")),
        group_col="part",
    )
    drift = (
        None
        if skip_drift
        else drift_from_profiles(drift_prof, threshold=drift_threshold)
    )

    # --- verdict grid: partitions × constraints, zero-filled ---
    grid = parts_all.crossJoin(
        spark.createDataFrame([(c,) for c in CONSTRAINTS if c != "drift"], "constraint string")
    )
    verdicts = (
        grid.join(counts, ["part", "constraint"], "left")
        .withColumn("n_violations", F.coalesce("n_violations", F.lit(0)))
        .withColumn(
            "status", F.when(F.col("n_violations") > 0, "fail").otherwise("pass")
        )
    )
    if drift is not None:
        verdicts = verdicts.unionByName(drift_verdicts(drift))

    return ValidationResult(
        violations=violations,
        verdicts=verdicts,
        schema_ok=True,
        schema_message=sres.message,
        extras={
            "drift": drift,
            "drift_profiles": drift_prof,
            "digests_source": dig_src,
            "digests_sink": dig_sink,
            "diffs": diffs,
            "violations_full": violations_full,
        },
    )
