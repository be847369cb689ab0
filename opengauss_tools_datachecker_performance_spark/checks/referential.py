"""Referential integrity: media_ref → asset catalog (SURVEY.md J5).

New-engine check (the reference has no FK checking; closest analogue
is its IN-list key re-query, DataManipulationService.java:85-233).
Plan shape: explode media spans, distinct the refs *before* the join
(shrinks the probe side from #spans to #distinct refs), then an
anti-join against the catalog — broadcast when the catalog is small,
sort-merge otherwise; Catalyst + AQE pick per run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dangling_media_refs(docs: DataFrame, assets: DataFrame) -> DataFrame:
    """→ (media_ref) present in docs' media spans but absent from assets."""
    refs = (
        docs.select(F.explode("spans").alias("span"))
        .filter(F.col("span.kind") == "media")
        .select(F.col("span.media_ref").alias("media_ref"))
        .filter(F.col("media_ref").isNotNull())
        .distinct()
    )
    return refs.join(assets.select("media_ref"), "media_ref", "left_anti")


def referential_violations(docs: DataFrame, assets: DataFrame) -> DataFrame:
    """→ (key, constraint='referential', span_idx, media_ref): every doc
    span pointing at a missing asset, with its offset-order index."""
    from opengauss_tools_datachecker_performance_spark.digest import _sorted_spans

    carry = [c for c in ("part",) if c in docs.columns]
    spans = (
        docs.select(
            F.col("doc_id").cast("string").alias("key"),
            *carry,
            F.posexplode(_sorted_spans(F.col("spans"))).alias("span_idx", "span"),
        )
        .filter((F.col("span.kind") == "media") & F.col("span.media_ref").isNotNull())
        .select("key", *carry, "span_idx", F.col("span.media_ref").alias("media_ref"))
    )
    bad_refs = dangling_media_refs(docs, assets)
    return spans.join(F.broadcast(bad_refs), "media_ref", "left_semi").select(
        "key", F.lit("referential").alias("constraint"), "span_idx", "media_ref", *carry
    )
