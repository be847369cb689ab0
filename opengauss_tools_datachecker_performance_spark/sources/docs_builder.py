"""Interleaved-doc view over the flat ``documents`` test table.

The driver's testdata has a flat documents(doc_id, text, lang, source,
n_chars) table; the north-rule input shape is
docs(doc_id string, spans array<struct<kind,text,media_ref,offset>>).
This builder derives the latter from the former **deterministically**
(pure function of the row), so a DuckDB oracle can reproduce the exact
same spans with list functions — making span-level operators
oracle-checkable.

Construction (keep in sync with the SQL in entry_queries):
* words = split(text, ' ')
* text span i (i = 0..ceil(n_words/8)-1, capped at 6): words
  [i*8, i*8+8) joined by ' ', offset = 2*i
* docs with doc_id % 3 == 0 get one media span at offset 1 with
  media_ref = 'asset-<doc_id % 200>'
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CHUNK = 8
MAX_CHUNKS = 6
N_ASSET_REFS = 200


def docs_from_documents(documents: DataFrame) -> DataFrame:
    """documents(doc_id,text,...) → docs(doc_id string, spans, part)."""
    words = F.split(F.col("text"), " ")
    n_chunks = F.least(
        F.ceil(F.size(words) / F.lit(CHUNK)).cast("int"), F.lit(MAX_CHUNKS)
    )
    text_spans = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            F.lit("text").alias("kind"),
            F.array_join(F.slice(words, i * CHUNK + 1, CHUNK), " ").alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            (i * 2).cast("int").alias("offset"),
        ),
    )
    media_span = F.struct(
        F.lit("media").alias("kind"),
        F.lit(None).cast("string").alias("text"),
        F.concat(F.lit("asset-"), (F.col("doc_id") % N_ASSET_REFS).cast("string")).alias(
            "media_ref"
        ),
        F.lit(1).cast("int").alias("offset"),
    )
    spans = F.when(
        F.col("doc_id") % 3 == 0, F.concat(text_spans, F.array(media_span))
    ).otherwise(text_spans)
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        spans.alias("spans"),
        F.pmod(F.col("doc_id"), F.lit(8)).cast("int").alias("part"),
    )


def assets_catalog(spark, n_present: int = 150) -> DataFrame:
    """Asset catalog covering asset-0..asset-(n_present-1): refs above
    that are deliberately dangling (deterministic violations)."""
    return spark.range(n_present).select(
        F.concat(F.lit("asset-"), F.col("id").cast("string")).alias("media_ref"),
        F.lit("image/png").alias("mime"),
        (F.col("id") * 1000 + 17).alias("bytes"),
    )


def mutate_docs(docs: DataFrame) -> DataFrame:
    """Deterministic sink-side mutation of a docs frame (diff targets):
    doc_id%97==0 dropped (→insert), %89==3 first text span corrupted
    (→update), %83==5 spans 0/2 offsets swapped (→update),
    plus extra docs 'x<doc_id>' for %79==11 (→delete; the 'x' prefix
    can never collide with a numeric doc_id)."""
    did = F.col("doc_id").cast("long")
    corrupt = F.transform(
        F.col("spans"),
        lambda s: F.struct(
            s["kind"].alias("kind"),
            F.when(
                (s["offset"] == 0) & (s["kind"] == "text"),
                F.concat(F.coalesce(s["text"], F.lit("")), F.lit(" XX")),
            ).otherwise(s["text"]).alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset"),
        ),
    )
    swapped = F.transform(
        F.col("spans"),
        lambda s: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            F.when(s["offset"] == 0, F.lit(2))
            .when(s["offset"] == 2, F.lit(0))
            .otherwise(s["offset"])
            .cast("int")
            .alias("offset"),
        ),
    )
    kept = (
        docs.filter(did % 97 != 0)
        .withColumn(
            "spans",
            F.when(did % 89 == 3, corrupt)
            .when(did % 83 == 5, swapped)
            .otherwise(F.col("spans")),
        )
    )
    extra = docs.filter(did % 79 == 11).withColumn(
        "doc_id", F.concat(F.lit("x"), F.col("doc_id"))
    )
    return kept.unionByName(extra)
