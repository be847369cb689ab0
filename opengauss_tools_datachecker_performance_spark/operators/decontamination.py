"""Benchmark decontamination: flag corpus documents that overlap a
held-out evaluation/benchmark set by shared word n-grams.

Training-data pipelines must remove documents that leak evaluation
data (the GPT-3/Pile "13-gram decontamination" discipline; the k is a
parameter here because the synthetic sandbox texts are short). The
reference engine has no such operator — this extends its
set-difference/diff family (SliceCheckResultManager's onlyOnLeft
semantics, see operators/diff.py) to fuzzy membership: a corpus doc
is "in" the benchmark set if it shares ≥ ``min_shared`` distinct
k-shingles (optionally ≥ ``min_frac`` of its own shingles) with ANY
benchmark doc.

Scale shape: the benchmark side is eval suites — thousands of docs,
at most a few million distinct shingles — so its DISTINCT shingle-hash
set broadcasts (one long per shingle) and the corpus-side shingle
stream is consumed by a single partial-aggregated groupBy(doc_id):
one shuffle of (doc_id, 2 longs), no corpus-sized join exchange.
Set ``broadcast_benchmark=False`` for a pathologically large
benchmark set and the same plan runs as a shuffle join (AQE may still
broadcast it at runtime).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.functions.text import (
    shingle_rows,
)


def benchmark_shingles(
    benchmark: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """→ one-column ``(sh)`` frame: the benchmark set's DISTINCT
    shingle hashes. Persistable (tiny, long-only) — at 10^12-doc
    corpus scale this is the piece to compute once and reuse across
    ingest batches, exactly like the MinHash index of
    operators/dedup_index.py."""
    return shingle_rows(benchmark, id_col, text_col, k).select("sh").distinct()


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    min_shared: int = 2,
    min_frac: float | None = None,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """→ ``(doc_id, n_shingles, n_shared, shared_frac, contaminated)``
    per corpus doc.

    ``n_shared`` counts DISTINCT shingles the doc shares with the
    union of all benchmark docs; ``shared_frac`` = n_shared /
    n_shingles (the doc's own distinct shingle count).
    ``contaminated`` = n_shared ≥ min_shared AND (when ``min_frac`` is
    set) shared_frac ≥ min_frac. Single pass over the corpus shingle
    stream: the hit flag rides the left join and one groupBy computes
    both counts (no second scan)."""
    c_rows = shingle_rows(corpus, id_col, text_col, k)  # distinct per doc
    b_sh = benchmark_shingles(benchmark, id_col, text_col, k).withColumn(
        "_hit", F.lit(True)
    )
    if broadcast_benchmark:
        b_sh = F.broadcast(b_sh)
    agg = (
        c_rows.join(b_sh, "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count(F.col("_hit")).alias("n_shared"),
        )
    )
    frac = F.col("n_shared").cast("double") / F.col("n_shingles").cast("double")
    contaminated = F.col("n_shared") >= F.lit(min_shared)
    if min_frac is not None:
        contaminated = contaminated & (frac >= F.lit(min_frac))
    return agg.select(
        "doc_id",
        "n_shingles",
        "n_shared",
        frac.alias("shared_frac"),
        contaminated.alias("contaminated"),
    )


def semantic_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.99,
    n_cells: int = 16,
    nprobe: int = 2,
    quantize_scale: float = 1_000_000.0,
) -> DataFrame:
    """Embedding-space decontamination: → (vec_id, contaminated,
    matched_benchmark_id) — flag corpus vectors within cosine ≥
    ``threshold`` of ANY benchmark vector (paraphrased eval leakage
    that n-gram overlap misses; the modern complement of
    :func:`decontaminate`).

    Same IVF candidate discipline as similarity.ivf_ann_topk — and the
    same determinism contract, so a SQL oracle replays it: corpus
    vectors assign to 1 cell and benchmark vectors probe ``nprobe``
    cells by exact integer-quantized dot products; only cell-sharing
    pairs score real cosine. ``matched_benchmark_id`` is the MINIMUM
    hitting benchmark id (deterministic without exposing float sims).
    Candidate recall follows IVF geometry — near-identical vectors
    share a cell by construction; a looser threshold wants more
    ``nprobe`` (the parameters trade recall for candidate volume,
    stated not hidden).

    Scale shape: centroids broadcast; ONE narrow assignment pass per
    side; the benchmark side (eval-suite sized) broadcasts into the
    cell equi-join; per-doc verdicts come from a partial-aggregated
    groupBy — the corpus never self-joins and never re-scans."""
    from opengauss_tools_datachecker_performance_spark.operators.similarity import (
        _qz,
        cosine_sim,
        ivf_assign,
        ivf_centroids,
    )

    cent = ivf_centroids(corpus, id_col, vec_col, n_cells, quantize_scale)
    c = corpus.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("vi", _qz(F.col("cv"), quantize_scale))
    b = benchmark.select(
        F.col(id_col).cast("long").alias("bench_id"),
        F.col(vec_col).cast("array<double>").alias("bv"),
    ).withColumn("vi", _qz(F.col("bv"), quantize_scale))
    hits = (
        ivf_assign(c, cent, "vec_id", 1)
        .join(F.broadcast(ivf_assign(b, cent, "bench_id", nprobe)), "cell")
        .filter(cosine_sim(F.col("cv"), F.col("bv")) >= threshold)
        .groupBy("vec_id")
        .agg(F.min("bench_id").alias("matched_benchmark_id"))
    )
    return (
        c.select("vec_id")
        .join(hits, "vec_id", "left")
        .select(
            "vec_id",
            F.col("matched_benchmark_id").isNotNull().alias("contaminated"),
            "matched_benchmark_id",
        )
    )
