"""Line-level boilerplate removal — the C4-style cleaning pass
(Raffel et al. 2020 §2.2 removed any line that repeated ≥3 times in
the corpus: nav menus, cookie banners, "all rights reserved" footers
survive document-level dedup because the documents AROUND them
differ).

Scale shape: explode docs to (doc, pos, line) once; the corpus-wide
line frequency is a two-phase aggregate over DISTINCT (line, doc)
pairs (map-side combine collapses within-doc repeats first, so a page
that repeats its own nav 100× contributes 1 — and no hot line key
ever carries raw row counts).  Removal is an anti-join of the
exploded frame against the boilerplate set — which grows with the
corpus, so it routes through :func:`operators.skew.small_side`
(AQE runtime sizing), never an unconditional broadcast.
Reconstruction groups by doc and rejoins the surviving lines in
position order — per-doc state only, bounded by document size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.functions.hashing import (
    portable_hash64,
)
from opengauss_tools_datachecker_performance_spark.operators.skew import small_side


def _exploded_lines(
    docs: DataFrame, id_col: str, text_col: str, sep: str = "\n"
) -> DataFrame:
    return docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    )


def boilerplate_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 3,
    sep: str = "\n",
) -> DataFrame:
    """→ (line, n_docs): every line occurring in ≥ ``min_docs``
    DISTINCT documents — the removal set (and the audit report: eyeball
    it before pointing the remover at a corpus)."""
    per_doc = (
        _exploded_lines(docs, id_col, text_col, sep)
        .select("doc_id", "line")
        .distinct()
    )
    return (
        per_doc.groupBy("line")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def remove_boilerplate_report(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 3,
    sep: str = "\n",
) -> DataFrame:
    """Apply the line filter and report per doc →
    (doc_id, n_lines, n_removed, clean_hash): line counts before/after
    plus the portable hash of the cleaned text (empty string when every
    line was boilerplate), so two engines — or two runs over refreshed
    data — can diff cleaning outcomes without shipping document bodies.
    """
    lines = _exploded_lines(docs, id_col, text_col, sep)
    boiler = boilerplate_lines(docs, id_col, text_col, min_docs, sep).select(
        "line"
    )
    kept = lines.join(small_side(boiler), "line", "left_anti")
    totals = lines.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines")
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("line")))
                ),
                lambda s: s["line"],
            ),
            sep,
        ).alias("_clean"),
    )
    return (
        totals.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_lines",
            (F.col("n_lines") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            portable_hash64(F.coalesce(F.col("_clean"), F.lit(""))).alias(
                "clean_hash"
            ),
        )
    )
