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
    from opengauss_tools_datachecker_performance_spark.operators.skew import small_side

    # bad_refs is violation-proportional: tiny in a healthy corpus,
    # unbounded if the catalog is wholesale stale — exactly the case a
    # validator must survive.  small_side leaves it unhinted under AQE
    # (runtime size decides broadcast vs shuffle) and pins the
    # broadcast only in the AQE-off diagnostic config, matching
    # span_rules.py's validate hot path.
    bad_refs = dangling_media_refs(docs, assets)
    return spans.join(small_side(bad_refs), "media_ref", "left_semi").select(
        "key", F.lit("referential").alias("constraint"), "span_idx", "media_ref", *carry
    )


def asset_usage(docs: DataFrame, assets: DataFrame) -> DataFrame:
    """Reverse-referential audit → (media_ref, n_refs, in_catalog,
    status) for every ref seen in docs OR cataloged asset:
    ``dangling`` (referenced, not cataloged — the forward check's
    hits), ``orphan`` (cataloged, never referenced — retention/cost
    candidates), ``ok`` otherwise.

    The forward check (:func:`dangling_media_refs`) answers "is every
    reference valid"; this answers the dual the catalog owner asks:
    "which assets does the corpus actually use".  Scale: media spans
    are filtered INSIDE the array before the explode (text spans never
    explode), the count shuffles (ref, partial-count) pairs, and the
    asset join is asset-catalog-sized."""
    media_refs = F.filter(
        F.col("spans"),
        lambda sp: (sp["kind"] == "media") & sp["media_ref"].isNotNull(),
    )
    refs = (
        docs.select(F.explode(media_refs).alias("sp"))
        .select(F.col("sp.media_ref").alias("media_ref"))
        .groupBy("media_ref")
        .agg(F.count(F.lit(1)).cast("long").alias("n_refs"))
    )
    cat = assets.select("media_ref").distinct().withColumn("_cat", F.lit(True))
    j = refs.join(cat, "media_ref", "full_outer")
    status = (
        F.when(F.col("_cat").isNull(), F.lit("dangling"))
        .when(F.col("n_refs").isNull(), F.lit("orphan"))
        .otherwise(F.lit("ok"))
    )
    return j.select(
        "media_ref",
        F.coalesce(F.col("n_refs"), F.lit(0)).cast("long").alias("n_refs"),
        F.col("_cat").isNotNull().alias("in_catalog"),
        status.alias("status"),
    )


def childless_parents(
    parents: DataFrame,
    children: DataFrame,
    key_cols: list[str],
    parent_key_cols: list[str] | None = None,
) -> DataFrame:
    """1:N cardinality check: parent rows with ZERO child rows →
    the parent key columns of every childless parent.

    The dual of the dangling-reference check (child → missing parent):
    here the PARENT side owes at least one child (every order must
    have a lineitem, every doc at least one span row, ...).  One
    left-anti join on the distinct child keys — the child side
    collapses map-side before shuffling."""
    pk = parent_key_cols or key_cols
    ck = children.select(
        *[F.col(c).alias(p) for c, p in zip(key_cols, pk)]
    ).distinct()
    return parents.join(ck, pk, "left_anti").select(*pk)
