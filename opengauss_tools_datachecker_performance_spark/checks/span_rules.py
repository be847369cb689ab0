"""Fused span-level rule pass: referential + null-text in ONE explode.

The runner's scan-count discipline: per validation run the doc bodies
are read (a) once per side for the digest frame, (b) once for the
media-ref universe, (c) once here for all span-level rule violations.
Everything else works off the persisted digest frame.  Keeping the
span rules fused means adding a new span rule costs zero extra scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.checks.referential import (
    dangling_media_refs,
)
from opengauss_tools_datachecker_performance_spark.digest import _sorted_spans


def span_rule_violations(docs: DataFrame, assets: DataFrame | None) -> DataFrame:
    """→ (part, constraint, key, span_idx, detail) for every span-level
    rule violation: constraint ∈ {referential, null_text}."""
    carry = [c for c in ("part",) if c in docs.columns]
    exploded = docs.select(
        F.col("doc_id").cast("string").alias("key"),
        *carry,
        F.posexplode(_sorted_spans(F.col("spans"))).alias("span_idx", "span"),
    ).select(
        "key",
        *carry,
        "span_idx",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
    )
    null_text = (F.col("kind") == "text") & F.col("text").isNull()
    if assets is not None:
        bad_refs = dangling_media_refs(docs, assets).withColumn("is_bad", F.lit(True))
        flagged = exploded.join(F.broadcast(bad_refs), "media_ref", "left_outer")
        dangling = (F.col("kind") == "media") & F.coalesce(F.col("is_bad"), F.lit(False))
    else:
        flagged = exploded.withColumn("is_bad", F.lit(False))
        dangling = F.lit(False)
    return (
        flagged.filter(null_text | dangling)
        .select(
            *(carry or [F.lit(None).cast("int").alias("part")]),
            F.when(dangling, F.lit("referential"))
            .otherwise(F.lit("null_text"))
            .alias("constraint"),
            "key",
            F.col("span_idx").cast("int").alias("span_idx"),
            F.when(dangling, F.col("media_ref")).alias("detail"),
        )
    )
