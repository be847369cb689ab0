"""Digest tree: row digests → bucket signatures → partition digests.

Replaces the reference's extract→Kafka→bucket→Merkle pipeline
(datachecker-check/.../modules/bucket/BuilderBucketHandler.java,
.../merkle/MerkleTree.java) with a partition-parallel digest tree in
three DataFrame stages:

1. **row digests** — ``(key, k_hash, v_hash, bucket)`` per row; the
   reference's RowDataHash (datachecker-common/.../entry/extract/RowDataHash.java:34-65).
2. **bucket signatures** — XOR fold of ``v_hash`` per bucket
   (Bucket.java:84-87: ``sig ^= vHash`` — commutative, so a plain
   shuffle agg with map-side partial aggregation; no sort needed).
3. **level-2 rollup** — bucket groups of 2^k buckets XOR-folded again;
   stands in for the Merkle internal nodes (MerkleTree.java:203-212).
   Two levels suffice: the reference caps trees at 2^15 leaves and
   only uses the tree to *prune equal subtrees* before row compare;
   our pruning join does the same with O(#buckets) digest rows.

Bucket routing mirrors BuilderBucketHandler.java:116-131
(``bucket = |kHash| & (2^n - 1)``): ``pmod(xxhash64(key), n_buckets)``.

For the interleaved-doc table the row digest is the **span-sequence
digest**: spans sorted by ``offset``, each canonicalized to
(kind, text, media_ref), the ordered sequence hashed once — equality
of digests ⇔ span-sequence equality (kind, text, media_ref, order),
the per-row invariant from BASELINE.json. Within-doc order matters
(array_sort by offset); across docs the XOR bucket fold is
order-insensitive, so no global sort ever happens.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.functions.hashing import (
    k_hash,
    pk_key,
    v_hash,
)

#: default bucket count — the reference caps Merkle trees at 2^15
#: leaves PER SLICE (BuilderBucketHandler.java:37-41, expect-capacity 1
#: row/bucket); our tree is table-global, so the default is sized so
#: that at ~1% violation density most buckets stay clean and the
#: digest-level pruning actually prunes. Only affects pruning
#: granularity, never correctness.
DEFAULT_NUM_BUCKETS = 1 << 16

#: record/unit separators for span-sequence canonical strings. Fields
#: are additionally LENGTH-PREFIXED (octet_length ':' bytes) so the
#: render is injective for ANY byte content - a text/media_ref that
#: itself contains these control bytes cannot forge a field or record
#: boundary (the prefix pins where each field ends). Length framing is
#: O(1) per field (byte length, no extra string scan), unlike escaping.
_UNIT_SEP = ""
_REC_SEP = ""


def _framed(c: Column) -> Column:
    """``<byte-len>:<bytes>`` framing of one canonical field; null →
    '' first (HashHandler.java:58 null=='' digest quirk preserved)."""
    s = F.coalesce(c, F.lit(""))
    return F.concat(F.octet_length(s).cast("string"), F.lit(":"), s)


def bucket_of(key_hash: Column, num_buckets: int = DEFAULT_NUM_BUCKETS) -> Column:
    """Hash-route a key to a bucket (BuilderBucketHandler.java:116-131)."""
    return F.pmod(key_hash, F.lit(num_buckets)).cast("int")


def row_digests(
    df: DataFrame,
    key_cols: list[str],
    value_cols: list[str] | None = None,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
) -> DataFrame:
    """Flat-table row digests: ``(key, k_hash, v_hash, bucket)``.

    ``value_cols`` default to all columns in schema order (the
    reference hashes every column in metadata order,
    HashHandler.java:53-63).
    """
    vals = value_cols or [f.name for f in df.schema.fields]
    key = pk_key(*key_cols)
    kh = k_hash(key)
    return df.select(
        key.alias("key"),
        kh.alias("k_hash"),
        v_hash(*[F.col(c) for c in vals]).alias("v_hash"),
        bucket_of(kh, num_buckets).alias("bucket"),
    )


def _sorted_spans(spans_col: Column) -> Column:
    # sort_array on structs compares lexicographically by field order →
    # putting offset first sorts by span position, i.e. span order.
    # sort_array (not array_sort): same ordering for the non-null span
    # structs we have, but measurably faster (codegen'd comparator, no
    # lambda machinery) — ~4× in the 3M-doc digest micro-bench.
    return F.sort_array(
        F.transform(
            spans_col,
            lambda s: F.struct(
                s["offset"].alias("offset"),
                s["kind"].alias("kind"),
                s["text"].alias("text"),
                s["media_ref"].alias("media_ref"),
            ),
        )
    )


def render_sorted_spans(sorted_spans_col: Column) -> Column:
    """Canonical render of an ALREADY offset-sorted span array — split
    out so a caller that materializes the sorted array once can feed
    digest + rule extraction off the same sort."""
    rendered = F.transform(
        sorted_spans_col,
        lambda s: F.concat_ws(
            _UNIT_SEP,
            _framed(s["kind"]),
            _framed(s["text"]),
            _framed(s["media_ref"]),
        ),
    )
    return F.array_join(rendered, _REC_SEP)


def span_sequence_canonical_col(spans_col: Column) -> Column:
    return render_sorted_spans(_sorted_spans(spans_col))


def media_spans_col(sorted_spans_col: Column) -> Column:
    """``array<struct<span_idx:int, media_ref:string>>`` of the media
    spans (sorted-order indexes) — small enough to ride on the cached
    digest frame so the referential check never re-reads doc bodies."""
    indexed = F.transform(
        sorted_spans_col,
        lambda s, i: F.struct(
            i.cast("int").alias("span_idx"),
            s["kind"].alias("kind"),
            s["media_ref"].alias("media_ref"),
        ),
    )
    return F.transform(
        F.filter(indexed, lambda x: x["kind"] == "media"),
        lambda x: F.struct(
            x["span_idx"].alias("span_idx"), x["media_ref"].alias("media_ref")
        ),
    )


def null_text_idxs_col(sorted_spans_col: Column) -> Column:
    """Sorted-order indexes of text spans with NULL text (almost always
    empty — violations only)."""
    flagged = F.transform(
        sorted_spans_col,
        lambda s, i: F.when(
            (s["kind"] == "text") & s["text"].isNull(), i.cast("int")
        ),
    )
    return F.filter(flagged, lambda x: x.isNotNull())


def span_hashes_from_sorted(sorted_spans_col: Column) -> Column:
    """Per-span 64-bit digest array over an ALREADY sorted span array:
    multi-arg xxhash64 over (kind, text, media_ref). Spark's multi-arg
    hash feeds each field through the hasher separately (internally
    length-framed), so field content can never forge a field boundary
    — the same guarantee as the length-prefixed canonical render,
    without building the big concat string.

    Null quirk preserved (HashHandler.java:58): null fields COALESCE
    to '' first, so null and empty string collide *inside the digest*
    exactly like the reference."""
    return F.transform(
        sorted_spans_col,
        lambda s: F.xxhash64(
            F.coalesce(s["kind"], F.lit("")),
            F.coalesce(s["text"], F.lit("")),
            F.coalesce(s["media_ref"], F.lit("")),
        ),
    )


#: arbitrary odd seed for the span-sequence fold (golden-ratio prime)
_SPAN_FOLD_SEED = -7046029254386353131

#: distinct digest for a NULL spans column, so NULL vs [] between
#: source and sink is still detected as an update (arbitrary odd
#: constant != seed; colliding with a real fold output needs a 64-bit
#: collision — the same accepted class as any digest equality)
_NULL_SPANS_DIGEST = -5659871106399925013


def span_sequence_hash_from_hashes(span_hashes_col: Column) -> Column:
    """Order-sensitive fold of the per-span hash array into the doc
    digest: h ← xxhash64(h, span_hash) left-to-right. Equality of
    digests ⇔ span-sequence equality (modulo 64-bit collisions — the
    same class the reference's per-row xxHash already accepts).

    Measured at 3M heavy docs (interleaved min-of-3): this per-span-
    hash fold runs at the bare separator-render speed (2.41 s vs
    2.40 s for render+hash+length) while the boundary-safe
    length-prefixed render costs 3.13 s — the int fold avoids building
    the big concat string entirely. Empty span arrays digest to the
    seed; a NULL spans column digests to a DISTINCT sentinel so a
    NULL-vs-[] discrepancy between source and sink still surfaces as
    an update instead of silently comparing equal."""
    return F.coalesce(
        F.aggregate(
            span_hashes_col,
            F.lit(_SPAN_FOLD_SEED),
            lambda acc, h: F.xxhash64(acc, h),
        ),
        F.lit(_NULL_SPANS_DIGEST),
    )


def span_text_volume_from_sorted(sorted_spans_col: Column) -> Column:
    """Byte volume of a doc's spans (text + media_ref + kind) — the
    drift metric (monotone in text volume), computed as an int
    aggregate so no rendered string is ever materialized."""
    return F.coalesce(
        F.aggregate(
            sorted_spans_col,
            F.lit(0).cast("long"),
            lambda acc, s: acc
            + F.coalesce(F.octet_length(s["text"]), F.lit(0))
            + F.coalesce(F.octet_length(s["media_ref"]), F.lit(0))
            + F.coalesce(F.octet_length(s["kind"]), F.lit(0)),
        ),
        F.lit(0).cast("long"),
    )


def span_sequence_hash_col(spans_col: Column) -> Column:
    """Span-sequence digest off a raw spans column: sort by offset,
    per-span multi-arg xxhash64, order-sensitive fold (see
    span_sequence_hash_from_hashes for the measured rationale)."""
    return span_sequence_hash_from_hashes(
        span_hashes_from_sorted(_sorted_spans(spans_col))
    )


def doc_digests(
    docs: DataFrame,
    doc_id_col: str = "doc_id",
    spans_col: str = "spans",
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Interleaved-doc digests: ``(key, k_hash, v_hash, bucket)`` where
    ``v_hash`` is the span-sequence digest.  ``carry_cols`` (e.g. the
    physical partition column) ride along so downstream verdicts don't
    need a key→partition join."""
    key = F.col(doc_id_col).cast("string")
    kh = k_hash(key)
    return docs.select(
        key.alias("key"),
        kh.alias("k_hash"),
        span_sequence_hash_col(F.col(spans_col)).alias("v_hash"),
        bucket_of(kh, num_buckets).alias("bucket"),
        *[F.col(c) for c in (carry_cols or [])],
    )


def bucket_signatures(row_digest_df: DataFrame) -> DataFrame:
    """Leaf level of the digest tree: XOR fold of v_hash per bucket
    (Bucket.java:84-87). ``bit_xor`` is a built-in commutative agg →
    map-side partial aggregation, one narrow shuffle of #buckets rows.
    """
    return row_digest_df.groupBy("bucket").agg(
        F.expr("bit_xor(v_hash)").alias("sig"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def tree_rollup(bucket_sig_df: DataFrame, fanout_bits: int = 6) -> DataFrame:
    """Internal digest-tree level: 2^fanout_bits buckets per node,
    node sig = XOR of child sigs (stands in for MerkleTree.java:203-212's
    Adler32(left‖right); checksum choice is engine-internal, the
    contract is subtree-equality pruning)."""
    return (
        bucket_sig_df.withColumn(
            "node", (F.col("bucket") / F.lit(1 << fanout_bits)).cast("int")
        )
        .groupBy("node")
        .agg(F.expr("bit_xor(sig)").alias("sig"), F.sum("n_rows").alias("n_rows"))
    )


def table_digest(bucket_sig_df: DataFrame) -> DataFrame:
    """Root digest: single (sig, n_rows) row — the analogue of the
    reference's table hash (TableMetadata.tableHash)."""
    return bucket_sig_df.agg(
        F.expr("bit_xor(sig)").alias("sig"), F.sum("n_rows").alias("n_rows")
    )
