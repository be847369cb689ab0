"""Corpus-curation operators: deterministic stratified sampling and
token-budget packing plans — the two decisions a training-data
pipeline makes after validation/dedup: WHICH documents to keep per
stratum, and HOW to lay the keepers out into fixed-token-budget
training sequences.

Both are seedless and deterministic (ordering by the portable md5
hash of the doc id, ties by id), so results are reproducible across
runs and engines — each has a DuckDB oracle in entry_queries_wave9.

Scale notes (10^12 docs):
* stratified_sample is one window per stratum — a hash-partitioned
  shuffle keyed on the stratum column; no global ordering anywhere.
  Skewed strata (one language dominating) spread across tasks the
  same way any hot groupBy key does (AQE skew handling applies).
* token_pack_plan never builds a GLOBAL running sum (a single
  unpartitioned window = one task at any scale). Docs are sharded by
  id hash; each shard packs independently with its own running token
  cumsum, and a sequence is identified by (shard, bin) —
  embarrassingly parallel, deterministic, and exactly how a
  1000-executor packing job would shard. The layout is contiguous
  (GPT-pretraining style): every sequence is exactly ``budget``
  tokens, docs straddle bin boundaries and are split there by the
  downstream writer — no padding waste, no per-row state machine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.functions.hashing import (
    portable_hash64,
)
from opengauss_tools_datachecker_performance_spark.functions.text import ws_tokens


def stratified_sample(
    docs: DataFrame,
    strata_col: str | Column,
    n_per_stratum: int,
    id_col: str = "doc_id",
    oversample: int = 4,
) -> DataFrame:
    """Keep the first ``n_per_stratum`` docs of each stratum under the
    deterministic (portable_hash64(id), id) order → (doc_id, stratum,
    sample_rank). Hash order makes membership stable under corpus
    append-order changes and uniformly spread, i.e. a seedless uniform
    sample per stratum.

    Skew shape: ranking a whole stratum with one row_number window
    sorts that stratum inside a single task — a dominant stratum (one
    language at 10^11 docs) is the mega-group trap, and AQE skew
    splitting does not apply to windows. Because the order key is a
    uniform hash, the top-n rows of a size-m stratum lie below the
    ~(oversample·n+256)/m hash quantile, so a per-stratum COUNT
    (partial-aggregated, skew-immune) plus a hash-threshold filter
    prunes each stratum to ≈ oversample·n+256 survivors BEFORE the
    window; strata at or below that size skip the filter entirely.
    The window then ranks a bounded group regardless of corpus scale,
    and the result is bit-identical to ranking the full stratum
    (survivors ⊃ true top-n unless a Binomial(m, (4n+256)/m) draw
    lands below n — probability < e^-100, the same acceptance class
    as the engine's 64-bit digest collisions)."""
    stratum = (
        F.col(strata_col) if isinstance(strata_col, str) else strata_col
    ).alias("stratum")
    base = docs.select(
        F.col(id_col).cast("string").alias("doc_id"), stratum
    ).withColumn("_h", portable_hash64(F.col("doc_id")))
    survivors_target = oversample * n_per_stratum + 256
    sizes = base.groupBy("stratum").agg(F.count(F.lit(1)).alias("_m"))
    # portable_hash64 is uniform on [0, 2^60); keep the hash prefix
    # whose expected size is survivors_target
    keep_p = F.least(
        F.lit(1.0),
        F.lit(float(survivors_target)) / F.col("_m").cast("double"),
    )
    pruned = base.join(sizes, "stratum").filter(
        (F.col("_m") <= F.lit(survivors_target))
        | (F.col("_h").cast("double") <= keep_p * F.lit(float(2**60)))
    )
    ranked = pruned.withColumn(
        "sample_rank",
        F.row_number().over(
            Window.partitionBy("stratum").orderBy("_h", "doc_id")
        ),
    )
    return ranked.filter(F.col("sample_rank") <= n_per_stratum).select(
        "doc_id", "stratum", "sample_rank"
    )


def token_pack_plan(
    docs: DataFrame,
    budget: int,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Contiguous sequence-packing plan → (doc_id, shard, bin, offset,
    n_tokens): the GPT-pretraining layout — within a shard, docs
    concatenate in the deterministic (portable_hash64(id), id) order
    into one token stream sliced into ``budget``-token sequences. Each
    doc's placement is the closed-form image of its running START
    offset: bin = start / budget, offset = start % budget. A doc with
    offset + n_tokens > budget straddles into the following bin(s);
    the downstream sequence writer splits it there (standard packing —
    no padding waste, stated rather than hidden). Zero-token docs
    (including NULL text, counted as 0 tokens — guarded explicitly
    because ``size(NULL)`` is NULL under ANSI and -1 under legacy
    semantics, either of which would corrupt the running cumsum)
    occupy no space but still receive a placement. The plan carries
    ``budget`` as a constant column (RLE-compressed to nothing on
    disk) so :func:`pack_manifest` can never expand it against a
    different bin size than it was built with."""
    n_tokens = F.when(F.col(text_col).isNull(), F.lit(0)).otherwise(
        F.size(ws_tokens(F.col(text_col)))
    )
    base = docs.select(
        F.col(id_col).cast("string").alias("doc_id"),
        n_tokens.cast("long").alias("n_tokens"),
    ).withColumn(
        "shard", F.pmod(portable_hash64(F.col("doc_id")), F.lit(n_shards))
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(portable_hash64(F.col("doc_id")), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return base.select(
        "doc_id",
        "shard",
        F.floor(start / F.lit(budget)).cast("long").alias("bin"),
        (start % F.lit(budget)).cast("long").alias("offset"),
        "n_tokens",
        F.lit(budget).cast("long").alias("budget"),
    )


def pack_manifest(plan: DataFrame, budget: int | None = None) -> DataFrame:
    """Expand a :func:`token_pack_plan` into the per-(doc, bin) slice
    table a distributed sequence writer consumes → (shard, bin,
    doc_id, bin_offset, doc_from, doc_to): doc tokens
    [doc_from, doc_to) land at ``bin_offset`` inside (shard, bin).
    A straddling doc emits one row per bin it touches (closed-form
    ``sequence`` explode — no state). Every (shard, bin) group is a
    self-contained writer work unit: its rows reconstruct exactly
    ``budget`` tokens (the stream tail may underfill its last bin).
    Zero-token docs emit nothing.

    The bin size comes from the plan's own ``budget`` column (written
    by :func:`token_pack_plan`), so the manifest cannot be expanded
    against a different budget than the plan was packed with. The
    ``budget`` argument is accepted only for externally-built plans
    that lack the column; passing it alongside the column is an
    error rather than a silent override."""
    if "budget" in plan.columns:
        if budget is not None:
            raise ValueError(
                "plan already carries its budget column; drop the "
                "budget argument (it would silently diverge from the "
                "bin size the plan was packed with)"
            )
        budget_expr = F.col("budget")
    elif budget is not None:
        budget_expr = F.lit(budget)
    else:
        raise ValueError("plan has no budget column and no budget given")
    # relative index of the last bin this doc touches — built against
    # the PLAN-side budget expression; everything after the explode
    # must instead use `b`, the budget column carried on the exploded
    # rows (distinct names keep the phase boundary explicit)
    rel_last = F.floor((F.col("offset") + F.col("n_tokens") - 1) / budget_expr)
    k = F.col("k")
    rows = plan.filter(F.col("n_tokens") > 0).select(
        "shard",
        "bin",
        "doc_id",
        "offset",
        "n_tokens",
        budget_expr.cast("long").alias("_b"),
        F.explode(F.sequence(F.lit(0).cast("long"), rel_last.cast("long"))).alias("k"),
    )
    b = F.col("_b")
    doc_from = F.greatest(F.lit(0), k * b - F.col("offset"))
    doc_to = F.least(F.col("n_tokens"), (k + 1) * b - F.col("offset"))
    return rows.select(
        "shard",
        (F.col("bin") + k).cast("long").alias("bin"),
        "doc_id",
        F.when(k == 0, F.col("offset")).otherwise(F.lit(0)).cast("long").alias("bin_offset"),
        doc_from.cast("long").alias("doc_from"),
        doc_to.cast("long").alias("doc_to"),
    )


def mixing_plan(
    docs: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    text_col: str = "text",
    default_weight: float = 0.0,
) -> DataFrame:
    """Data-mixing plan (the LLaMA/Pile mixture table as an operator):
    per source → ``(source, n_docs, n_tokens, weight, target_tokens,
    epochs, sample_rate)``.

    ``weights`` are relative mixture weights (normalized over the
    weight mass actually present in the corpus); ``target_tokens`` =
    normalized weight × token_budget; ``epochs`` = target / available
    (> 1 means the source is oversampled across epochs, the standard
    mixture-table semantics); ``sample_rate`` = min(1, epochs) — the
    within-epoch keep rate to feed stratified_sample.

    One partial-aggregated groupBy(source) over the corpus (token
    counts combine map-side) plus a broadcast of the literal weight
    table — the weight literals ride an explode(array(...)) so no
    driver-side PythonRDD scan lands under the join. The weight
    normalizer is a scalar agg over that same tiny frame, computed
    identically by the DuckDB oracle (same doubles, same IEEE ops).
    """
    per_source = docs.groupBy(F.col(source_col).alias("source")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(ws_tokens(F.col(text_col)))).alias("n_tokens"),
    )
    if not weights:
        # F.array() of zero structs is array<null> and breaks the
        # star-expand below with an opaque AnalysisException; the
        # documented zero-weight behavior needs no join at all
        joined = per_source.withColumn(
            "weight", F.lit(float(default_weight)).cast("double")
        )
        return _mixing_plan_rates(joined, token_budget)
    w = docs.sparkSession.range(1).select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("source"),
                        F.lit(float(v)).cast("double").alias("weight"),
                    )
                    for s, v in sorted(weights.items())
                ]
            )
        ).alias("w")
    ).select("w.*")
    joined = per_source.join(F.broadcast(w), "source", "left").withColumn(
        "weight", F.coalesce(F.col("weight"), F.lit(float(default_weight)))
    )
    return _mixing_plan_rates(joined, token_budget)


def _mixing_plan_rates(joined: DataFrame, token_budget: int) -> DataFrame:
    """Rate columns off a (source, n_docs, n_tokens, weight) frame.
    Normalizes over the weight mass PRESENT in the corpus (a weight
    for a missing source must not silently shrink everyone else's
    share of the budget). The global window runs over the per-source
    aggregate — sources-sized at any corpus scale, never the corpus."""
    total_w = F.sum("weight").over(Window.partitionBy())
    target = (
        F.when(total_w > 0, F.col("weight") / total_w).otherwise(F.lit(0.0))
        * F.lit(float(token_budget))
    )
    epochs = F.when(
        F.col("n_tokens") > 0, target / F.col("n_tokens").cast("double")
    ).otherwise(F.lit(0.0))
    return joined.select(
        "source",
        "n_docs",
        "n_tokens",
        "weight",
        target.alias("target_tokens"),
        epochs.alias("epochs"),
        F.least(F.lit(1.0), epochs).alias("sample_rate"),
    )


def budget_prune(
    scored: DataFrame,
    token_budget: int,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    score_col: str = "score",
) -> DataFrame:
    """Token-budget corpus selection (the CCNet/perplexity-pruning
    recipe as an operator): rank docs best-score-first (ascending
    ``score_col`` — e.g. LM surprisal bits — ties to ``id_col``), run
    an exact global prefix sum of ``tokens_col`` along that order, and
    keep docs while the running total fits ``token_budget``.

    → (id, n_tokens, rank, cum_tokens, kept) for EVERY doc — the drop
    set is auditable, not silently discarded.

    Scale: the ranking and the running total both come from
    operators.skew.global_rank_cumsum — three bounded passes, never a
    single-task ``SUM() OVER (ORDER BY ...)`` window."""
    from opengauss_tools_datachecker_performance_spark.operators.skew import (
        global_rank_cumsum,
    )

    ranked = global_rank_cumsum(
        scored.select(
            F.col(id_col),
            F.col(tokens_col).cast("long").alias(tokens_col),
            F.col(score_col),
        ),
        [score_col, id_col],
        tokens_col,
        rank_name="rank",
        cum_name="cum_tokens",
    )
    return ranked.select(
        id_col,
        tokens_col,
        "rank",
        "cum_tokens",
        (F.col("cum_tokens") <= F.lit(int(token_budget))).alias("kept"),
    )
