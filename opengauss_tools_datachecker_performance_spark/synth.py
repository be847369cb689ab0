"""Deterministic synthetic interleaved-doc corpus with seeded violations.

The engine's own mock-data module — analogue of the reference's
datachecker-mock-data service (ExtractMockTableService.java:86-110,
ExtractMockDataService.java), re-done as pure Catalyst expressions
over ``spark.range`` so generation is distributed, collect-free, and
a pure function of (seed, n_docs): the same ``id`` always yields the
same document on any cluster size.

Produces the north-rule table shape (BASELINE.json input_hint):

    docs(doc_id string, spans array<struct<kind,text,media_ref,offset:int>>, part int)
    assets(media_ref string, mime string, bytes bigint)

plus a mutated **sink** copy and a ``violations_expected`` sidecar
(doc_id, vclass) covering every violation class from FIXTURES.md F1:

| vclass        | plant                                            | tripped check |
|---------------|--------------------------------------------------|---------------|
| missing_doc   | dropped from sink                                 | diff → insert |
| extra_doc     | present only in sink                              | diff → delete |
| corrupt_text  | sink span#0 text mutated                          | diff → update |
| swap_offsets  | sink spans 0/1 offsets swapped (order corruption) | diff → update |
| duplicate     | doc_id duplicated in BOTH sides                   | uniqueness    |
| dangling_ref  | media_ref not in assets (both sides)              | referential   |
| null_text     | kind='text' with text NULL (both sides)           | not-null rule |

plus a distribution shift: partition 0 docs get systematically longer
texts on both sides (drift check material; no diff impact).

Skew: ~20% of docs share 4 hot doc_id prefixes (exercises salting /
AQE skew joins per the north rule).

Span arrays are stored *scrambled* (reversed for odd ids): span order
is defined by ``offset``, not array position — the digest layer must
sort, and tests prove it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42

# one prime modulus per violation class; first-match-wins priority
# keeps generation and expectation trivially consistent
_MISSING, _CORRUPT, _SWAP, _DUP, _DANGLE, _NULLTEXT = 997, 991, 983, 1009, 977, 971

_VOCAB = [
    "spark", "table", "query", "scan", "join", "merge", "batch", "stream",
    "window", "filter", "group", "order", "value", "hash", "digest", "span",
    "media", "text", "doc", "row", "column", "part", "key", "slice",
    "bucket", "tree", "leaf", "node", "check", "verify", "report", "drift",
    "stat", "count", "null", "ref", "asset", "image", "audio", "video",
    "token", "shingle", "byte", "frame", "offset", "kind", "source", "sink",
    "delta", "omega",
]


def _h(*cols) -> F.Column:
    """Deterministic 64-bit mix of id + tags (seeded)."""
    return F.xxhash64(F.lit(SEED), *cols)


def _doc_id(id_col: F.Column) -> F.Column:
    """~20% of docs land on 4 hot prefixes → planted doc_id skew."""
    return F.concat(
        F.when(id_col % 5 == 0, F.concat(F.lit("hot"), (id_col % 4).cast("string")))
        .otherwise(F.lit("doc")),
        F.lit("-"),
        F.lpad(id_col.cast("string"), 10, "0"),
    )


def _vclass(id_col: F.Column, n_docs: int) -> F.Column:
    return (
        F.when(id_col >= n_docs, F.lit("extra_doc"))
        .when(id_col % _MISSING == 13, F.lit("missing_doc"))
        .when(id_col % _CORRUPT == 7, F.lit("corrupt_text"))
        .when(id_col % _SWAP == 11, F.lit("swap_offsets"))
        .when((id_col % _DUP == 3) & (id_col > 0), F.lit("duplicate"))
        .when(id_col % _DANGLE == 5, F.lit("dangling_ref"))
        .when(id_col % _NULLTEXT == 19, F.lit("null_text"))
    )


def synth_corpus(
    spark: SparkSession,
    n_docs: int = 10_000,
    n_assets: int = 500,
    n_partitions: int = 16,
    min_spans: int = 2,
    spans_spread: int = 7,
    min_words: int = 3,
    words_spread: int = 10,
) -> dict[str, DataFrame]:
    """Build the full fixture set. Returns dict with keys
    ``docs_source``, ``docs_sink``, ``assets``, ``violations_expected``.
    Span/word knobs let the bench generate heavier (compute-bound)
    documents than the fast pytest corpus.
    """
    n_extra = max(2, n_docs // 500)
    vocab = F.array(*[F.lit(w) for w in _VOCAB])

    base = (
        spark.range(n_docs + n_extra)
        .withColumn("doc_id", _doc_id(F.col("id")))
        .withColumn("vclass", _vclass(F.col("id"), n_docs))
        .withColumn("part", F.pmod(F.xxhash64("doc_id"), F.lit(n_partitions)).cast("int"))
        .withColumn(
            "n_spans",
            (F.lit(min_spans) + F.pmod(_h(F.col("id")), F.lit(spans_spread))).cast("int"),
        )
    )

    # ---- span construction (pure higher-order functions) ----------------
    id_c = F.col("id")
    drift_extra = F.when(F.col("part") == 0, F.lit(6)).otherwise(F.lit(0))

    def span_struct(i):
        """Span i of doc `id`: ~1 in 4 is a media span."""
        is_media = F.pmod(_h(id_c, i, F.lit(0)), F.lit(4)) == 0
        n_words = (
            F.lit(min_words) + F.pmod(_h(id_c, i, F.lit(1)), F.lit(words_spread)) + drift_extra
        ).cast("int")
        words = F.transform(
            F.sequence(F.lit(0), n_words - 1),
            lambda j: F.element_at(vocab, (F.pmod(_h(id_c, i, j + 2), F.lit(len(_VOCAB))) + 1).cast("int")),
        )
        text = F.array_join(words, " ")
        # dangling_ref docs point their media spans at absent assets
        ref_ok = F.concat(F.lit("asset-"), F.pmod(_h(id_c, i, F.lit(3)), F.lit(n_assets)).cast("string"))
        ref_bad = F.concat(F.lit("missing-asset-"), id_c.cast("string"))
        media_ref = F.when(F.col("vclass") == "dangling_ref", ref_bad).otherwise(ref_ok)
        # null_text docs: span#1 is forced to kind='text' with SQL NULL
        # text so the not-null rule check always has a target
        null_here = (F.col("vclass") == "null_text") & (i == 1)
        is_media = is_media & ~null_here
        return F.struct(
            F.when(is_media, F.lit("media")).otherwise(F.lit("text")).alias("kind"),
            F.when(is_media | null_here, F.lit(None).cast("string")).otherwise(text).alias("text"),
            F.when(is_media, media_ref).otherwise(F.lit(None).cast("string")).alias("media_ref"),
            (i * 2).cast("int").alias("offset"),  # non-contiguous offsets on purpose
        )

    spans = F.transform(F.sequence(F.lit(0), F.col("n_spans") - 1), span_struct)
    # span order is defined by `offset`; scramble array order for odd ids
    spans = F.when(id_c % 2 == 1, F.reverse(spans)).otherwise(spans)
    built = base.withColumn("spans", spans)

    # ---- source / sink assembly -----------------------------------------
    cols = ["doc_id", "spans", "part"]
    src_rows = built.filter(id_c < n_docs)
    dups = src_rows.filter(F.col("vclass") == "duplicate")
    docs_source = src_rows.select(*cols).unionAll(dups.select(*cols))

    # sink mutations, applied span-wise in Catalyst
    # mutate span#0 whatever its kind: text spans get suffixed, media
    # spans get their ref swapped — the digest must always flip
    corrupt = F.transform(
        F.col("spans"),
        lambda s: F.struct(
            s["kind"].alias("kind"),
            F.when((s["offset"] == 0) & (s["kind"] == "text"), F.concat(F.coalesce(s["text"], F.lit("")), F.lit(" CORRUPTED")))
            .otherwise(s["text"]).alias("text"),
            F.when((s["offset"] == 0) & (s["kind"] == "media"), F.concat(s["media_ref"], F.lit("-corrupted")))
            .otherwise(s["media_ref"]).alias("media_ref"),
            s["offset"].alias("offset"),
        ),
    )
    swapped = F.transform(
        F.col("spans"),
        lambda s: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            F.when(s["offset"] == 0, F.lit(2)).when(s["offset"] == 2, F.lit(0))
            .otherwise(s["offset"]).cast("int").alias("offset"),
        ),
    )
    sink_rows = (
        built.filter((F.col("vclass").isNull()) | (F.col("vclass") != "missing_doc"))
        .withColumn(
            "spans",
            F.when(F.col("vclass") == "corrupt_text", corrupt)
            .when(F.col("vclass") == "swap_offsets", swapped)
            .otherwise(F.col("spans")),
        )
    )
    sink_dups = sink_rows.filter(F.col("vclass") == "duplicate")
    docs_sink = sink_rows.select(*cols).unionAll(sink_dups.select(*cols))

    assets = (
        spark.range(n_assets)
        .select(
            F.concat(F.lit("asset-"), F.col("id").cast("string")).alias("media_ref"),
            F.element_at(
                F.array(F.lit("image/png"), F.lit("image/jpeg"), F.lit("audio/wav"), F.lit("video/mp4")),
                (F.pmod(_h(F.col("id")), F.lit(4)) + 1).cast("int"),
            ).alias("mime"),
            (F.lit(1_000) + F.pmod(_h(F.col("id"), F.lit(1)), F.lit(5_000_000))).alias("bytes"),
        )
    )

    violations_expected = (
        built.filter(F.col("vclass").isNotNull())
        .select("doc_id", "vclass", "part")
    )

    return {
        "docs_source": docs_source,
        "docs_sink": docs_sink,
        "assets": assets,
        "violations_expected": violations_expected,
    }


def write_corpus(spark: SparkSession, out_dir: str, **kwargs) -> None:
    """Materialize the corpus as parquet (Iceberg stand-in; the runtime
    has no Iceberg jars — partition layout via explicit ``part`` column
    + partitionBy gives the same pruning behavior for the engine)."""
    frames = synth_corpus(spark, **kwargs)
    for name, df in frames.items():
        writer = df.write.mode("overwrite")
        if name.startswith("docs"):
            # co-locate each logical partition into one file: without the
            # repartition, every write task emits a sliver into every
            # part= dir (n_tasks × n_partitions tiny files — a real
            # scan-overhead bug observed at 2400 files for 400k docs)
            writer = df.repartition("part").write.mode("overwrite").partitionBy("part")
        writer.parquet(f"{out_dir}/{name}.parquet")
