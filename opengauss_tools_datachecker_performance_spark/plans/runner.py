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
from pyspark.sql import types as T

from opengauss_tools_datachecker_performance_spark.checks.drift import (
    drift_from_profiles,
    quantile_profiles,
)
from opengauss_tools_datachecker_performance_spark.checks.schema_check import (
    DOCS_SCHEMA,
    SchemaCheckResult,
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
)
from opengauss_tools_datachecker_performance_spark.functions.hashing import k_hash
from opengauss_tools_datachecker_performance_spark.operators.diff import (
    diff_digests,
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


#: the digest-companion contract: a table carrying exactly what the
#: checks consume lets validation skip the doc-body scan entirely —
#: ~8 B/span of hashes instead of the text bytes (the measured
#: memory-bandwidth ceiling of the digest stage). Produced at ingest
#: by sources.prehashed.write_digest_companion.
ENRICHED_COLS = [
    "key",
    "k_hash",
    "span_hashes",
    "bucket",
    "part",
    "text_len",
    "media_spans",
    "null_text_idxs",
    "v_hash",
]


def is_enriched(df: DataFrame) -> bool:
    """True if ``df`` already carries the full digest-companion
    contract (ENRICHED_COLS) — validate_docs then runs every check
    off it without ever reading doc bodies."""
    return set(ENRICHED_COLS) <= set(df.columns)


def enriched_schema(spark: SparkSession) -> T.StructType:
    """The companion contract's exact types, derived from the docs
    schema through the real projection (never hand-maintained)."""
    empty = spark.createDataFrame([], DOCS_SCHEMA).withColumn(
        "part", F.lit(0)
    )
    return _enriched_digests(empty).schema


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
    exactly what the distribution-drift check needs).

    Digest-companion fast path: input that already carries the full
    ENRICHED_COLS contract (written at ingest by
    sources.prehashed.write_digest_companion) passes through with a
    column-pruning projection — no body scan, no hashing."""
    if is_enriched(docs):
        return docs.select(*ENRICHED_COLS)
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
    return (
        docs.select(
            key.alias("key"),
            kh.alias("k_hash"),
            _sorted_spans(F.col("spans")).alias("_s"),
            bucket_of(kh).alias("bucket"),
            F.col("part"),
        )
        .select(
            "key",
            "k_hash",
            # per-span hash array materializes as its own attribute so
            # the v_hash fold below reads it instead of re-hashing
            # (Spark does NO cross-expression CSE) — and so the diff
            # join can locate the first divergent span from the cache
            # (classify_diff(locate_spans=True)) without ever
            # re-reading doc bodies. ~8 B × spans/doc of extra cache —
            # still an order of magnitude under the bodies.
            span_hashes_from_sorted(s).alias("span_hashes"),
            "bucket",
            "part",
            span_text_volume_from_sorted(s).cast("double").alias("text_len"),
            # span-rule inputs ride the same scan (sorted-order indexes):
            # a handful of (idx, ref) pairs + an almost-always-empty int
            # array per doc — the cached frame stays body-free
            media_spans_col(s).alias("media_spans"),
            null_text_idxs_col(s).alias("null_text_idxs"),
        )
        .withColumn(
            "v_hash", span_sequence_hash_from_hashes(F.col("span_hashes"))
        )
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
    driver_exchange: bool = False,
) -> ValidationResult:
    """Run every applicable check; returns violations + verdict grid.

    ``only_partitions`` implements resume: restrict the scan up front
    (partition pruning on the parquet/Iceberg partition column) —
    see plans.lineage for the anti-join that computes the list.
    """
    spark = docs_source.sparkSession
    if driver_exchange and not eager:
        # the exchange path is built around eagerly-materialized digest
        # caches; silently falling back to the in-plan diff would make
        # an A/B of the two strategies measure the same code twice
        raise ValueError("driver_exchange=True requires eager=True")

    docs_source = docs_source.withColumnRenamed(partition_col, "part")
    if docs_sink is not None:
        docs_sink = docs_sink.withColumnRenamed(partition_col, "part")

    # --- schema pre-check: failure excludes data checks (ref §3.2).
    # Each side is checked against ITS OWN contract (digest companions
    # against ENRICHED_COLS, raw docs against DOCS_SCHEMA), so a
    # companion source can be diffed against a raw sink and vice versa
    # — _enriched_digests normalizes each input independently.
    def _precheck(df: DataFrame):
        if is_enriched(df):
            return check_schema(
                df.select(*ENRICHED_COLS), enriched_schema(spark), check_types=True
            )
        present = {f.name for f in df.schema.fields}
        probe_cols = [f.name for f in DOCS_SCHEMA.fields if f.name in present]
        return check_schema(
            df.select(*probe_cols) if probe_cols else df.limit(0),
            DOCS_SCHEMA,
            check_types=True,
        )

    sres = _precheck(docs_source)
    if sres.equal and docs_sink is not None:
        sres = _precheck(docs_sink)
    # the partition column is part of the structural contract too —
    # without this, a typo'd --partition-col crashes in the digest
    # projection instead of failing the schema gate gracefully
    if sres.equal:
        for side in (docs_source, docs_sink):
            if side is not None and "part" not in side.columns:
                sres = SchemaCheckResult(
                    equal=False, missing_columns=[partition_col]
                )
                break
    # only filter sides that actually carry the partition column — when
    # the schema gate just failed for a missing 'part', the filter would
    # raise UNRESOLVED_COLUMN and mask the graceful fail verdict below
    if only_partitions is not None:
        if "part" in docs_source.columns:
            docs_source = docs_source.filter(F.col("part").isin(only_partitions))
        if docs_sink is not None and "part" in docs_sink.columns:
            docs_sink = docs_sink.filter(F.col("part").isin(only_partitions))

    if not sres.equal:
        # the fail branch cannot assume the partition column exists —
        # that may be exactly what failed; one NULL-part row then
        sides = [
            d
            for d in (docs_source, docs_sink)
            if d is not None and "part" in d.columns
        ]
        if sides:
            parts_all = sides[0].select("part").distinct()
            for d in sides[1:]:
                parts_all = parts_all.union(d.select("part")).distinct()
        else:
            parts_all = spark.range(1).select(
                F.lit(None).cast("int").alias("part")
            )
        verdicts = parts_all.select(
            "part",
            F.lit("schema").alias("constraint"),
            F.lit(1).alias("n_violations"),
            F.lit("fail").alias("status"),
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
            else:
                # most buckets dirty — pruning can't pay; the
                # signatures are ALREADY known dirty-majority, so the
                # fall-through must not re-run the in-plan two-phase
                # signature agg it just superseded
                two_phase = False
            # to the plain full-outer join over the whole caches
        elif dig_sink is not None:
            # materialize both sides' caches as CONCURRENT jobs (Spark
            # schedulers fill one job's straggler/stage-gap slack with
            # the other's tasks; on a real cluster this overlaps two
            # independent table scans). A per-barrier AQE exemption
            # (session-conf toggle around these counts) was built and
            # interleaved-A/B-measured: WORSE (min 33.9 s vs 30.5 s at
            # local[8] AQE-on, 3M docs) — caches built under a
            # different AQE setting than their consumers cost more
            # than AQE's stage decomposition does, so the barrier
            # inherits the session setting untouched.
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
                "key",
                F.lit(None).cast("string").alias("diff_type"),
                "part",
                F.lit(None).cast("int").alias("span_idx"),
            ).limit(0)
        elif bucket_prune is not None:
            from opengauss_tools_datachecker_performance_spark.operators.diff import (
                classify_diff,
            )

            s = dig_src.filter(F.col("bucket").isin(bucket_prune))
            t = dig_sink.filter(F.col("bucket").isin(bucket_prune))
            diffs = classify_diff(s, t, carry_cols=["part"], locate_spans=True)
        else:
            diffs = diff_digests(
                dig_src,
                dig_sink,
                two_phase=two_phase,
                carry_cols=["part"],
                locate_spans=True,
            )
        diffs = diffs.persist()
        if eager:
            diffs.count()
        # --- span location for updated keys rides the diff join
        # itself (classify_diff(locate_spans=True)): the digest frames
        # carry per-span hash arrays, so the first divergent index is
        # a zip_with over columns the join already exchanged. Two
        # earlier designs paid a second full-table body read for this:
        # a key-IN-list pushdown re-scan (measured 14-20 s per 3M-doc
        # run and nearly FLAT from local[2] to local[8] — parquet can't
        # push a multi-thousand-literal IN, row-group stats don't prune
        # uniformly-spread keys, and the literal list bloats every
        # downstream plan re-analysis) and a broadcast-semi-join full
        # scan. The in-join formulation eliminates the re-scan, the
        # two driver barriers (count + collect), and the IN-list cap
        # tuning at any scale. The IN-list fetch pattern itself lives
        # on in streaming.incremental (P6), where the key set arrives
        # from OUTSIDE the digest caches.
        diff_v = diffs.select(
            "part",
            F.lit("consistency").alias("constraint"),
            "key",
            F.col("span_idx").cast("int"),
            F.col("diff_type").alias("detail"),
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

    # --- verdict grid: partitions × constraints, zero-filled.
    # explode(array(lit…)) instead of crossJoin(createDataFrame([...])):
    # a Python-list frame plans as a PythonRDD scan, and under the
    # cartesian it re-evaluated per OUTPUT PARTITION — measured 256
    # tasks × ~200 ms of Python-worker round trip (~42 slot-seconds of
    # zero-CPU dead time) in the final collect stage at any
    # parallelism. The literal explode stays in codegen. ---
    # only constraints that actually RAN appear: a no-sink run never
    # compared anything, a no-assets run never resolved a media_ref —
    # reporting those as 'pass' would present unexecuted checks as
    # green (the grid row's absence is the honest signal)
    active = [
        c
        for c in CONSTRAINTS
        if c != "drift"
        and (c != "consistency" or docs_sink is not None)
        and (c != "referential" or assets is not None)
    ]
    grid = parts_all.select(
        "part",
        F.explode(F.array(*[F.lit(c) for c in active])).alias("constraint"),
    )
    verdicts = (
        grid.join(counts, ["part", "constraint"], "left")
        .withColumn("n_violations", F.coalesce("n_violations", F.lit(0)))
        .withColumn(
            "status", F.when(F.col("n_violations") > 0, "fail").otherwise("pass")
        )
    )
    if drift is not None:
        dv = drift_verdicts(drift)
        # a sink-only partition has NO source rows, so no drift profile
        # exists for it — its distribution vanished, which IS drift;
        # emit an explicit fail instead of leaving a hole in the
        # partitions × constraints grid
        vanished = (
            parts_all.join(dv.select("part"), "part", "left_anti")
            .select(
                "part",
                F.lit("drift").alias("constraint"),
                F.lit(1).cast("long").alias("n_violations"),
                F.lit("fail").alias("status"),
            )
        )
        verdicts = verdicts.unionByName(dv).unionByName(vanished)

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
