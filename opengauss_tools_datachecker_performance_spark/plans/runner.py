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
    doc_text_length,
    drift_by_quantiles,
)
from opengauss_tools_datachecker_performance_spark.checks.referential import (
    referential_violations,
)
from opengauss_tools_datachecker_performance_spark.checks.schema_check import (
    DOCS_SCHEMA,
    check_schema,
)
from opengauss_tools_datachecker_performance_spark.checks.stats import (
    span_null_text_violations,
)
from opengauss_tools_datachecker_performance_spark.checks.uniqueness import (
    uniqueness_violations,
)
from opengauss_tools_datachecker_performance_spark.operators.diff import (
    diff_docs,
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


def validate_docs(
    docs_source: DataFrame,
    docs_sink: DataFrame | None,
    assets: DataFrame | None,
    partition_col: str = "part",
    only_partitions: list[int] | None = None,
    drift_threshold: float = 0.15,
    two_phase: bool = True,
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

    parts_src = docs_source.select(partition_col).distinct()
    parts_all = (
        parts_src.union(docs_sink.select(partition_col)).distinct()
        if docs_sink is not None
        else parts_src
    )

    if not sres.equal:
        verdicts = (
            parts_all.crossJoin(
                spark.createDataFrame([(c,) for c in ["schema"]], "constraint string")
            )
            .select(
                partition_col,
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

    # key → partition attribution map (covers sink-only keys too)
    key_part_src = docs_source.select(
        F.col("doc_id").cast("string").alias("key"), F.col(partition_col).alias("part")
    )
    key_part = (
        key_part_src.union(
            docs_sink.select(
                F.col("doc_id").cast("string").alias("key"),
                F.col(partition_col).alias("part"),
            )
        ).distinct()
        if docs_sink is not None
        else key_part_src.distinct()
    )

    pieces: list[DataFrame] = []

    # --- consistency diff (the reference's core check) ---
    if docs_sink is not None:
        diffs = diff_docs(docs_source, docs_sink, two_phase=two_phase)
        upd = diffs.filter(F.col("diff_type") == "update").select("key")
        span_loc = first_divergent_span(docs_source, docs_sink, upd)
        diff_v = (
            diffs.join(key_part, "key", "left")
            .join(span_loc, "key", "left")
            .select(
                "part",
                F.lit("consistency").alias("constraint"),
                "key",
                F.col("span_idx").cast("int"),
                F.col("diff_type").alias("detail"),
            )
        )
        pieces.append(diff_v)

    # --- uniqueness ---
    uniq = (
        uniqueness_violations(docs_source, F.col("doc_id"))
        .join(key_part, "key", "left")
        .select(
            "part", "constraint", "key",
            F.lit(None).cast("int").alias("span_idx"),
            F.lit(None).cast("string").alias("detail"),
        )
    )
    pieces.append(uniq)

    # --- referential ---
    if assets is not None:
        refv = referential_violations(docs_source, assets).join(key_part, "key", "left")
        pieces.append(
            refv.select(
                "part", "constraint", "key",
                F.col("span_idx").cast("int"),
                F.col("media_ref").alias("detail"),
            )
        )

    # --- null-text column rule ---
    nullv = span_null_text_violations(docs_source).join(key_part, "key", "left")
    pieces.append(
        nullv.select(
            "part", "constraint", "key",
            F.col("span_idx").cast("int"),
            F.lit(None).cast("string").alias("detail"),
        )
    )

    violations = pieces[0]
    for p in pieces[1:]:
        violations = violations.unionByName(p)

    # --- drift (partition-level, no per-doc violation rows) ---
    drift = drift_by_quantiles(
        doc_text_length(docs_source), group_col=partition_col,
        threshold=drift_threshold,
    )

    # --- verdict grid: partitions × constraints, zero-filled ---
    counts = violations.groupBy("part", "constraint").agg(
        F.count(F.lit(1)).alias("n_violations")
    )
    grid = parts_all.withColumnRenamed(partition_col, "part").crossJoin(
        spark.createDataFrame([(c,) for c in CONSTRAINTS if c != "drift"], "constraint string")
    )
    verdicts = (
        grid.join(counts, ["part", "constraint"], "left")
        .withColumn("n_violations", F.coalesce("n_violations", F.lit(0)))
        .withColumn(
            "status", F.when(F.col("n_violations") > 0, "fail").otherwise("pass")
        )
    )
    drift_verdict = drift.select(
        F.col(partition_col).alias("part"),
        F.lit("drift").alias("constraint"),
        F.col("drifted").cast("int").cast("long").alias("n_violations"),
        F.when(F.col("drifted"), "fail").otherwise("pass").alias("status"),
    )
    verdicts = verdicts.unionByName(drift_verdict)

    return ValidationResult(
        violations=violations,
        verdicts=verdicts,
        schema_ok=True,
        schema_message=sres.message,
        extras={"drift": drift},
    )
