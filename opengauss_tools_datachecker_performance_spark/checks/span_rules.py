"""Span-level rules: referential + null-text.

Two formulations:

* ``span_rule_violations`` — standalone single-pass explode over the
  doc table (used by the direct operator queries and as the oracle for
  the fused path).
* ``span_rule_violations_from_digests`` — the runner's scale path: the
  digest scan already extracted ``media_spans`` (sorted-order index +
  ref of every media span) and ``null_text_idxs`` onto the persisted
  digest frame, so span rules evaluate off that cache and the doc
  bodies are read exactly ONCE per side per run.
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
        from opengauss_tools_datachecker_performance_spark.operators.skew import (
            small_side,
        )

        bad_refs = dangling_media_refs(docs, assets).withColumn("is_bad", F.lit(True))
        # violation-sized in a healthy corpus but unbounded if the
        # catalog is wholesale stale — small_side leaves it unhinted
        # under AQE (production default: the RUNTIME size decides
        # broadcast vs shuffle, so the wholesale-stale case degrades
        # to a shuffle) and pins the broadcast only in the AQE-off
        # diagnostic config, where Catalyst's static estimate can't
        # see through the anti-join and would otherwise shuffle the
        # corpus-sized exploded frame.
        flagged = exploded.join(small_side(bad_refs), "media_ref", "left_outer")
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


def span_rule_violations_from_digests(
    dig: DataFrame, assets: DataFrame | None
) -> DataFrame:
    """Same output contract as :func:`span_rule_violations`, computed
    from the persisted digest frame (columns ``key``, ``part``,
    ``media_spans``, ``null_text_idxs``) — zero doc-body scans.

    The dangling-ref set is violation-sized in a healthy corpus, but
    UNBOUNDED if the asset catalog is wholesale stale — so its join is
    left to AQE, which broadcasts when the runtime size fits and falls
    back to a shuffle join when it doesn't (same treatment as the
    uniqueness candidates).  At cluster scale the distinct is a narrow
    shuffle of ref strings, the catalog side is a plain column scan,
    and nothing re-reads span text.
    """
    null_v = dig.select(
        "part",
        F.lit("null_text").alias("constraint"),
        "key",
        F.explode("null_text_idxs").alias("span_idx"),
        F.lit(None).cast("string").alias("detail"),
    )
    if assets is None:
        return null_v
    refs = (
        dig.select(F.explode("media_spans").alias("m"))
        .select(F.col("m.media_ref").alias("media_ref"))
        .filter(F.col("media_ref").isNotNull())
        .distinct()
    )
    bad_refs = refs.join(
        assets.select(F.col("media_ref")), "media_ref", "left_anti"
    )
    ref_v = (
        dig.select("part", "key", F.explode("media_spans").alias("m"))
        .select(
            "part",
            "key",
            F.col("m.span_idx").alias("span_idx"),
            F.col("m.media_ref").alias("media_ref"),
        )
        .join(bad_refs, "media_ref", "left_semi")
        .select(
            "part",
            F.lit("referential").alias("constraint"),
            "key",
            F.col("span_idx").cast("int").alias("span_idx"),
            F.col("media_ref").alias("detail"),
        )
    )
    return ref_v.unionByName(null_v)
