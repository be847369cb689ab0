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
    bucket_signatures,
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

    The spans sort ONCE into a materialized attribute; the digest is
    the per-span multi-arg xxhash64 fold (boundary-safe without
    building a rendered string — digest.span_sequence_hash_from_hashes
    has the measured numbers) and the drift metric is the byte volume
    of the same sorted spans (monotone in text volume, which is
    exactly what the distribution-drift check needs)."""
    from opengauss_tools_datachecker_performance_spark.digest import (
        _sorted_spans,
        media_spans_col,
        null_text_idxs_col,
        span_hashes_from_sorted,
        span_sequence_hash_from_hashes,
        span_text_volume_from_sorted,
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
        span_sequence_hash_from_hashes(span_hashes_from_sorted(s)).alias("v_hash"),
        "bucket",
        "part",
        span_text_volume_from_sorted(s).cast("double").alias("text_len"),
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
    max_inlist_keys: int = 32_768,
    driver_exchange: bool = False,
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
    # two-phase pruning state decided at the barrier (eager path):
    #   no_diff=True          → every bucket signature matched, skip the
    #                           row-level join entirely
    #   bucket_prune=[...]    → mismatched bucket ids, pushed into the
    #                           cached digest scans as a literal filter
    #   both None/False       → lazy path: diff_digests does its own
    #                           in-plan signature agg + broadcast
    no_diff = False
    bucket_prune: list[int] | None = None
    if eager:
        # Materialize the digest caches as an explicit barrier before any
        # downstream branch is planned against them. Without this, the
        # first consumer to run is a driver-side BROADCAST BUILD (the
        # mismatched-bucket set), so the heaviest stage of the whole job
        # — the full doc scan + digest — executes inside a blocking
        # broadcast future while the main job's stages sit idle.
        #
        # Optional driver_exchange path (DEFAULT OFF — measured worse):
        # make the barrier action the digest-tree leaf aggregation
        # itself — collect the ≤2^16 (bucket, sig, n_rows) rows per
        # side and compare them in the driver, like the reference's
        # endpoints exchanging Merkle roots (DataCheckRunnable.java:
        # 359-375). Interleaved A/B at 3M docs (scripts/
        # ab_driver_exchange.py): 46.1 s vs 28.4 s min — the literal
        # IN filter of ~10^4 mismatched bucket ids bloats the logical
        # plan that every downstream action re-analyzes, and the
        # barrier becomes two sequential shuffle+collect jobs instead
        # of cheap counts. The in-plan formulation (union+agg +
        # broadcast semi-join, operators/diff.py) keeps the signature
        # compare distributed and the plans small — the right call on
        # a real cluster for the same reasons.
        if dig_sink is not None and two_phase and driver_exchange:
            src_sigs = {
                r["bucket"]: (r["sig"], r["n_rows"])
                for r in bucket_signatures(dig_src).collect()
            }
            sink_sigs = {
                r["bucket"]: (r["sig"], r["n_rows"])
                for r in bucket_signatures(dig_sink).collect()
            }
            seen = set(src_sigs) | set(sink_sigs)
            bad = sorted(b for b in seen if src_sigs.get(b) != sink_sigs.get(b))
            if not bad:
                no_diff = True
            elif len(bad) <= max(1, len(seen) // 2):
                bucket_prune = bad
            # else: most buckets dirty — pruning can't pay, fall through
            # to the plain full-outer join over the whole caches
        elif dig_sink is not None:
            # materialize both sides' caches as CONCURRENT jobs (Spark
            # schedulers fill one job's straggler/stage-gap slack with
            # the other's tasks; on a real cluster this overlaps two
            # independent table scans)
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=2) as pool:
                fs = [pool.submit(dig_src.count), pool.submit(dig_sink.count)]
                for f in fs:
                    f.result()
        else:
            dig_src.count()

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
        # IN-list below — without persist that consumer would re-execute
        # the whole join subtree.
        if no_diff:
            # all 2^16 leaf signatures matched at the barrier — span-
            # sequence equality holds everywhere, no row-level join
            diffs = dig_src.select(
                "key", F.lit(None).cast("string").alias("diff_type"), "part"
            ).limit(0)
        elif bucket_prune is not None:
            from opengauss_tools_datachecker_performance_spark.operators.diff import (
                classify_diff,
            )

            s = dig_src.filter(F.col("bucket").isin(bucket_prune))
            t = dig_sink.filter(F.col("bucket").isin(bucket_prune))
            diffs = classify_diff(s, t, carry_cols=["part"])
        else:
            diffs = diff_digests(
                dig_src, dig_sink, two_phase=two_phase, carry_cols=["part"]
            )
        diffs = diffs.persist()
        if eager:
            diffs.count()
        # --- span location for updated keys. The naive plan re-scans
        # BOTH doc tables (all span bodies) just to semi-join a tiny
        # updated-key set — at bench scale that one stage cost as much
        # as the digest scan itself, and at 100 TB it would double the
        # job's I/O. Instead, read the updated (key, part) pairs off
        # the persisted diff (tiny: diff-rate × rows) and push them
        # into the scans as literal filters: the partition IN-list
        # prunes whole files (the doc table is written partition-
        # clustered) and the doc_id filter prunes row groups via
        # parquet stats — a DPP-style runtime pushdown, the same trick
        # as the reference's IN-list secondary check
        # (IncrementCheckService re-extracts only changed PKs). Falls
        # back to the broadcast-semi-join full scan above the IN-list
        # cap (a diff that large means most row groups are touched
        # anyway, so pushdown stops paying).
        upd_kp = diffs.filter(F.col("diff_type") == "update").select("key", "part")
        # count (cheap: diffs is persisted) BEFORE collecting, so a
        # pathological everything-differs diff never floods the driver
        n_upd = upd_kp.count() if max_inlist_keys > 0 else None
        upd_rows = (
            upd_kp.collect()
            if n_upd is not None and n_upd <= max_inlist_keys
            else None
        )
        if n_upd == 0:
            span_loc = spark.createDataFrame([], "key string, span_idx int")
        elif upd_rows is not None:
            keys = [r["key"] for r in upd_rows]
            parts = sorted({r["part"] for r in upd_rows})
            src_f = docs_source.filter(
                F.col("part").isin(parts) & F.col("doc_id").isin(keys)
            )
            sink_f = docs_sink.filter(
                F.col("part").isin(parts) & F.col("doc_id").isin(keys)
            )
            span_loc = first_divergent_span(src_f, sink_f, None)
        else:
            # above the IN-list cap the key set is too big to FORCE a
            # broadcast (that's exactly the large case) — plain semi
            # join; AQE still turns it into a broadcast when it fits
            span_loc = first_divergent_span(
                docs_source, docs_sink, upd_kp.select("key")
            )
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
