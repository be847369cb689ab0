"""Similarity search over an embedding column (array<float>).

Two paths per the build brief:

* **brute-force cosine top-k** — the exactness baseline: query set ×
  corpus join, JVM-side dot products (zip_with + aggregate — no
  Python), window top-k.  Right answer at any scale where
  |queries| × |corpus| fits the cluster; the query side is broadcast.
* **LSH-bucketed ANN** — the scale path: random-hyperplane signatures
  (sign bits of deterministic ±1 hyperplanes derived from the
  portable hash of (plane, dim) — no RNG, reproducible anywhere),
  candidate generation by bucket equality (optionally multi-probe on
  1-bit flips), exact re-scoring of candidates only.  Recall is
  tunable via n_planes / n_tables; candidates per query shrink by
  ~2^n_planes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from opengauss_tools_datachecker_performance_spark.functions.hashing import (
    portable_hash64,
)


def dot(a: Column, b: Column) -> Column:
    """Dot product of two numeric arrays, left-to-right accumulation
    (deterministic summation order — matters for cross-engine parity)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_sim(a: Column, b: Column) -> Column:
    """Guarded: mismatched embedding lengths raise at action time —
    zip_with would otherwise NULL-pad, the pair would score NULL, and
    the row would silently drop out of every top-k."""
    ok = F.assert_true(
        a.isNull() | b.isNull() | (F.size(a) == F.size(b)),
        F.concat(
            F.lit("cosine over mismatched embedding lengths: "),
            F.size(a).cast("string"),
            F.lit(" vs "),
            F.size(b).cast("string"),
        ),
    )
    return F.when(ok.isNull(), dot(a, b) / (norm(a) * norm(b)))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """→ (query_id, neighbor_id, rank): exact top-k cosine neighbors
    (self excluded). Ties broken by neighbor_id for determinism. The
    query side is broadcast — corpus never shuffles."""
    # norms materialize once per ROW before the pair join — the values
    # are bit-identical to per-pair norm() (same left-to-right sum, same
    # sqrt) but interpreted-lambda work drops from O(|Q|·|C|) to
    # O(|Q|+|C|); only the dot product remains per pair
    q = queries.select(
        F.col(id_col).cast("long").alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("qn", norm(F.col("qv")))
    c = corpus.select(
        F.col(id_col).cast("long").alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("cn", norm(F.col("cv")))
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def plane_weights(table: int, plane: int, dims: int) -> list[int]:
    """±1 weights of one deterministic hyperplane: sign = parity of
    md5('table:plane:dim'). Public so the DuckDB oracle can embed the
    exact same planes as SQL literals."""
    import hashlib

    out = []
    for d in range(dims):
        h = hashlib.md5(f"{table}:{plane}:{d}".encode()).hexdigest()
        out.append(1 if int(h[:15], 16) % 2 == 1 else -1)
    return out


def checked_dims(vec: Column, dims: int) -> Column:
    """Executor-side fail-fast when a vector's length differs from the
    configured plane dimensionality.  Without this, ``zip_with`` pads
    the shorter array with NULLs, every projection NULLs out to the
    ``otherwise(0)`` bit, and ALL vectors silently share bucket 0 —
    which then either explodes the candidate join or (over
    ``max_bucket_size``) drops every pair with zero recall.  NULL
    vectors pass through (callers decide their semantics)."""
    ok = F.assert_true(
        vec.isNull() | (F.size(vec) == F.lit(dims)),
        F.concat(
            F.lit(f"embedding length != configured dims={dims}: got "),
            F.size(vec).cast("string"),
        ),
    )
    return F.when(ok.isNull(), vec)


def hyperplane_signature(vec: Column, dims: int, n_planes: int, table: int = 0) -> Column:
    """Deterministic random-hyperplane LSH signature (int bucket id).

    Plane p's weight for dimension d is ±1 by the parity of the
    portable hash of 'table:p:d' — computed at PLAN TIME into literal
    arrays, so executors evaluate a pure arithmetic expression.

    Guarded by :func:`checked_dims`: a corpus whose embeddings are not
    ``dims``-long raises at action time instead of silently hashing
    everything to bucket 0."""
    vec = checked_dims(vec, dims)
    bits = []
    for p in range(n_planes):
        weights = F.array(*[F.lit(float(w)) for w in plane_weights(table, p, dims)])
        proj = dot(vec, weights)
        bits.append(F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig + b
    return sig.cast("int")


def lsh_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dims: int = 64,
    n_planes: int = 8,
    n_tables: int = 2,
    quantize_scale: float | None = None,
) -> DataFrame:
    """Approximate top-k: per hash table, candidates = same-bucket
    vectors; exact cosine re-score of the candidate union.
    → (query_id, neighbor_id, rank).

    ``quantize_scale``: if set, signatures are computed over
    ``floor(v * scale)`` integer arrays instead of raw doubles.
    Integer projections are exact (no summation-order sensitivity), so
    bucket assignment is bit-identical across engines — used by the
    oracle-checked catalog entry; recall is unaffected for any
    reasonable scale (1e6)."""
    q = queries.select(
        F.col(id_col).cast("long").alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    c = corpus.select(
        F.col(id_col).cast("long").alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )

    def sig_input(col: Column) -> Column:
        if quantize_scale is None:
            return col
        return F.transform(col, lambda x: F.floor(x * quantize_scale))

    cand = None
    for t in range(n_tables):
        qb = q.withColumn(
            "bucket", hyperplane_signature(sig_input(F.col("qv")), dims, n_planes, t)
        )
        cb = c.withColumn(
            "bucket", hyperplane_signature(sig_input(F.col("cv")), dims, n_planes, t)
        )
        pairs = cb.join(F.broadcast(qb), "bucket").filter(
            F.col("neighbor_id") != F.col("query_id")
        )
        cand = pairs if cand is None else cand.unionByName(pairs)
    scored = (
        cand.select("query_id", "neighbor_id", "qv", "cv")
        .distinct()
        .select(
            "query_id",
            "neighbor_id",
            cosine_sim(F.col("qv"), F.col("cv")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def _qz(col: Column, quantize_scale: float) -> Column:
    """Floor-quantize a double array to int64 — integer dot products
    are exact (no float summation-order sensitivity), making cell
    assignment bit-identical across engines."""
    return F.transform(col, lambda x: F.floor(x * quantize_scale).cast("long"))


def _dot_int(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def ivf_centroids(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int,
    quantize_scale: float,
) -> DataFrame:
    """Deterministic coarse centroids: the ``n_cells`` lowest-id
    corpus vectors — TakeOrdered, so ANY id range works (ids starting
    at 10^6 or sparse ids yield full centroid sets, not the silent
    empty frame a ``id < n_cells`` filter would give) — integer-
    quantized (a k-means stand-in; swap in trained centroids at will).
    → (cell, ci). Fails fast if no usable centroid exists (the cost is
    one extra ≤n_cells-row TakeOrdered pass — the never-silent-empty
    contract of the dedup/ANN family)."""
    cent = (
        corpus.filter(F.col(id_col).isNotNull())
        .orderBy(F.col(id_col).asc())
        .limit(n_cells)
        .select(
            F.col(id_col).cast("long").alias("cell"),
            _qz(F.col(vec_col).cast("array<double>"), quantize_scale).alias("ci"),
        )
    )
    if not cent.limit(1).count():
        raise ValueError(
            "ivf_centroids: no non-null ids in the corpus — cell routing "
            "would silently return zero candidates"
        )
    return cent


def ivf_assign(
    df: DataFrame, centroids: DataFrame, id_name: str, n: int
) -> DataFrame:
    """Assign every row (with a quantized ``vi`` column) to its ``n``
    best cells by exact integer dot product, ties to the lowest cell
    id. Centroids broadcast; one narrow pass over ``df``."""
    scored = df.join(F.broadcast(centroids)).withColumn(
        "cdot", _dot_int(F.col("vi"), F.col("ci"))
    )
    w = Window.partitionBy(id_name).orderBy(
        F.col("cdot").desc(), F.col("cell").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn", "cdot", "ci", "vi")
    )


def ivf_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 2,
    quantize_scale: float = 1_000_000.0,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-bucketed ANN — the inverted-file scale path: a coarse
    quantizer assigns every corpus vector to its nearest cell; a query
    probes only its ``nprobe`` closest cells and re-scores exactly
    inside them, replacing the |Q|×|C| cross product with
    ~|C|·nprobe/n_cells candidates per query.

    Engine-deterministic by construction (so a SQL oracle can replay
    it bit-for-bit): the coarse centroids are the ``n_cells``
    lowest-id corpus vectors (a k-means stand-in — swap in trained
    centroids at will), and cell assignment maximizes the DOT PRODUCT
    OF FLOOR-QUANTIZED INTEGER vectors (products ≤ 1e12 × dims are
    exact in 64-bit arithmetic; no float summation-order sensitivity),
    ties broken by lowest cell id.  Only the final re-score uses real
    cosine.  → (query_id, neighbor_id, rank).

    At cluster scale: centroids broadcast (tiny), corpus assignment is
    one narrow map pass, the candidate join shuffles by cell id (or
    broadcasts the probed query side, as here), and the corpus is
    re-read never.

    ``centroids``: pass a pre-built (cell, ci) frame — e.g.
    :func:`ivf_centroids_refined`'s trained quantizer, or one loaded
    from a previous run — instead of the lowest-id seeds."""
    cent = (
        centroids
        if centroids is not None
        else ivf_centroids(corpus, id_col, vec_col, n_cells, quantize_scale)
    )
    c = corpus.select(
        F.col(id_col).cast("long").alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("vi", _qz(F.col("cv"), quantize_scale))
    q = queries.select(
        F.col(id_col).cast("long").alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("vi", _qz(F.col("qv"), quantize_scale))

    c_assigned = ivf_assign(c, cent, "neighbor_id", 1)
    q_probed = ivf_assign(q, cent, "query_id", nprobe)
    scored = (
        c_assigned.join(F.broadcast(q_probed), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_sim(F.col("qv"), F.col("cv")).alias("cos_sim"),
        )
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def brute_force_topk_vectorized(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine — same semantics as :func:`brute_force_topk`,
    Arrow/BLAS execution: the throughput path when the per-pair
    interpreted ``aggregate``/``zip_with`` lambdas of the JVM baseline
    dominate (they evaluate row-at-a-time outside codegen).

    The query set is tiny by contract (it is the *broadcast* side of
    the JVM path); it ships to every task as a closure-captured
    normalized numpy matrix. Each ``mapInPandas`` Arrow batch does ONE
    gemm of the normalized corpus batch against all queries
    (O(batch × |Q| × d) inside BLAS), keeps the per-batch top-k per
    query, and a window over the ~(#batches × |Q| × k) partials picks
    the global top-k. The corpus is scanned once and never shuffled;
    the shuffle moves only partial top-k rows.

    Float caveat (why the oracle-checked catalog entry stays on the
    JVM path): gemm accumulation order differs from the left-to-right
    fold, so ranks can flip between candidates whose cosines differ
    below ~1e-12 — fine for a similarity pipeline, not for a
    bit-exact cross-engine oracle.
    """
    import numpy as np
    import pandas as pd

    qrows = (
        queries.select(
            F.col(id_col).cast("long").alias("qid"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        )
        .collect()
    )
    if not qrows:
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, rank int"
        )
    qids = np.array([r["qid"] for r in qrows], dtype=np.int64)
    qm = np.stack([np.asarray(r["qv"], dtype=np.float64) for r in qrows])
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)

    def topk_batches(batches):
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            cids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            cm = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["cv"]])
            cm /= np.linalg.norm(cm, axis=1, keepdims=True)
            sims = qm @ cm.T  # (|Q| × batch)
            sims[qids[:, None] == cids[None, :]] = -np.inf  # self-exclude
            kk = min(k, n)
            # argpartition alone drops boundary ties arbitrarily, which
            # breaks the (cos desc, neighbor_id asc) contract the global
            # window assumes.  Keep everything >= the kk-th value, then
            # order those few candidates by the SAME total order as the
            # window and take kk — the per-batch partial is then an exact
            # semigroup of the global top-k (anything cut is strictly
            # below kk surviving rows).
            part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            boundary = np.take_along_axis(sims, part, axis=1).min(axis=1)
            q_out, n_out, s_out = [], [], []
            for qi in range(sims.shape[0]):
                cand = np.flatnonzero(sims[qi] >= boundary[qi])
                keep = cand[np.lexsort((cids[cand], -sims[qi][cand]))][:kk]
                q_out.append(np.full(keep.size, qids[qi], dtype=np.int64))
                n_out.append(cids[keep])
                s_out.append(sims[qi][keep])
            rows = {
                "query_id": np.concatenate(q_out),
                "neighbor_id": np.concatenate(n_out),
                "cos_sim": np.concatenate(s_out),
            }
            out = pd.DataFrame(rows)
            yield out[out["cos_sim"] != -np.inf]

    partials = corpus.select(
        F.col(id_col).cast("long").alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).mapInPandas(topk_batches, "query_id long, neighbor_id long, cos_sim double")
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivf_centroids_refined(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int,
    quantize_scale: float,
    iters: int = 2,
) -> DataFrame:
    """Trained coarse quantizer: Lloyd iterations over the
    INTEGER-QUANTIZED vectors, refining :func:`ivf_centroids`' lowest-id
    seeds → (cell, ci). Replaces the documented k-means stand-in with a
    real trained quantizer while keeping the family's determinism
    contract: assignment maximizes exact integer dot products (ties →
    lowest cell), and the centroid update is floor(elementwise integer
    SUM / count) — the sum is exact 64-bit, so retries and engines
    agree bit-for-bit as long as |per-cell sum| stays under 2^53
    (the double-division envelope: at quantize_scale 1e6 and
    unit-norm embeddings that allows ~10^9 members per cell — size
    ``n_cells`` to the corpus, which IVF wants anyway). A float MEAN
    would reintroduce summation-order sensitivity; the integer sum
    does not.

    Each iteration is one assignment pass over the corpus (broadcast
    centroids, narrow) plus a (cell, dim)-keyed partial aggregation —
    cells × dims rows, never corpus-sized state; the loop runs on the
    driver with only the tiny centroid frame collected. A cell left
    empty by an iteration keeps its previous centroid (standard Lloyd
    fallback, deterministic)."""
    cent = ivf_centroids(corpus, id_col, vec_col, n_cells, quantize_scale)
    c = corpus.select(
        F.col(id_col).cast("long").alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).withColumn("vi", _qz(F.col("_v"), quantize_scale))
    for _ in range(iters):
        assigned = ivf_assign(
            c.withColumn("_vi_keep", F.col("vi")), cent, "_id", 1
        ).withColumn("vi", F.col("_vi_keep"))
        means = (
            assigned.select("cell", F.posexplode("vi").alias("_d", "_x"))
            .groupBy("cell", "_d")
            .agg(
                F.floor(
                    F.sum("_x") / F.count(F.lit(1))
                ).cast("long").alias("_m")
            )
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_d", "_m"))),
                    lambda s: s["_m"],
                ).alias("ci_new")
            )
        )
        cent = (
            cent.join(means, "cell", "left")
            .select(
                "cell", F.coalesce(F.col("ci_new"), F.col("ci")).alias("ci")
            )
        )
        # materialize the tiny frame so the next iteration's lineage
        # doesn't stack assignment plans iters deep
        rows = cent.collect()
        cent = corpus.sparkSession.createDataFrame(
            [(r["cell"], r["ci"]) for r in rows], "cell long, ci array<bigint>"
        )
    return cent


def pq_codebook(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_codes: int,
    quantize_scale: float,
) -> DataFrame:
    """Deterministic product-quantization codebook seed: the
    ``n_codes`` lowest-id corpus vectors, floor-quantized to int64 —
    the same never-silently-empty seeding rule as
    :func:`ivf_centroids` (each codeword's per-SUBSPACE slice is what
    the encoder compares against; swap in per-subspace k-means
    codebooks at will).  → (code, ci).

    Codes are DENSE RANKS 0..n_codes-1 (by ascending seed id), not the
    raw seed ids: the ADC lookup table is indexed by code, so codes
    must be valid array positions for ANY corpus id range (sparse ids,
    ids starting at 10^6, ...)."""
    cent = ivf_centroids(corpus, id_col, vec_col, n_codes, quantize_scale)
    w = Window.orderBy(F.col("cell").asc())  # ≤ n_codes rows — tiny
    return cent.select(
        (F.row_number().over(w) - 1).cast("long").alias("code"), "ci"
    )


def _pq_subdist(vi: Column, ci: Column, s: int, d_sub: int) -> Column:
    """Exact integer squared-L2 distance between subspace ``s`` slices
    of two quantized vectors (products ≤ (2·scale)²·d_sub — inside
    int64 for unit-norm-ish embeddings at scale 1e6)."""
    a, b = F.slice(vi, s * d_sub + 1, d_sub), F.slice(ci, s * d_sub + 1, d_sub)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def ivf_pq_ann_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 2,
    m_sub: int = 8,
    n_codes: int = 16,
    overfetch: int = 4,
    quantize_scale: float = 1_000_000.0,
) -> DataFrame:
    """IVF-PQ ANN (Jégou, Douze & Schmid, "Product Quantization for
    Nearest Neighbor Search", TPAMI 2011) — the MEMORY-scale path: the
    corpus is held as ``m_sub`` one-byte PQ codes per vector (+ its
    coarse cell) instead of the full float embedding, so a 10^12-row
    index fits a cluster that the raw vectors never would.  Plain PQ
    on the raw vectors (no residual encoding) — the IVF cell only
    prunes candidates, matching the oracle's replay.

    Stages (all engine-deterministic, integer arithmetic until the
    final re-score):
    1. coarse cells + PQ codes for every corpus vector: one narrow map
       pass against the broadcast codebook (16 codewords) — at ingest
       time in production, amortized across runs like the digest
       companions;
    2. per-query LUT: integer distance from the query's subvectors to
       every codeword (m_sub × n_codes longs per query — asymmetric
       distance computation, ADC);
    3. candidates = corpus rows in the query's ``nprobe`` probed
       cells; ADC score = one array lookup-sum per candidate (no
       float math, no full-vector read);
    4. the ``overfetch × k`` best ADC candidates (ties → lowest
       neighbor) re-score with exact cosine — only these few rows
       ever touch the raw embeddings again.

    → (query_id, neighbor_id, rank)."""
    d_sub_col = F.size(F.col(vec_col).cast("array<double>"))
    # subspace width from the first vector; validated per-row by slice
    dims = corpus.select(d_sub_col.alias("d")).limit(1).collect()
    if not dims:
        raise ValueError("ivf_pq_ann_topk: empty corpus")
    d = int(dims[0]["d"])
    if d % m_sub:
        raise ValueError(f"ivf_pq_ann_topk: dims {d} not divisible by m_sub {m_sub}")
    d_sub = d // m_sub

    cb = pq_codebook(corpus, id_col, vec_col, n_codes, quantize_scale)
    cent = ivf_centroids(corpus, id_col, vec_col, n_cells, quantize_scale)

    c = corpus.select(
        F.col(id_col).cast("long").alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("vi", _qz(F.col("cv"), quantize_scale))
    # corpus → coarse cell (drops vi/cv internals), then PQ-encode:
    # min (dist, code) struct per subspace → deterministic argmin with
    # lowest-code ties
    c_cell = ivf_assign(c, cent, "neighbor_id", 1).select("neighbor_id", "cell")
    enc_pairs = (
        c.select("neighbor_id", "vi")
        .join(F.broadcast(cb))
        .select(
            "neighbor_id",
            *[
                F.struct(
                    _pq_subdist(F.col("vi"), F.col("ci"), s, d_sub).alias("d"),
                    F.col("code").alias("code"),
                ).alias(f"_s{s}")
                for s in range(m_sub)
            ],
        )
    )
    c_codes = enc_pairs.groupBy("neighbor_id").agg(
        *[F.min(f"_s{s}").getField("code").cast("int").alias(f"_c{s}") for s in range(m_sub)]
    ).select(
        "neighbor_id", F.array(*[f"_c{s}" for s in range(m_sub)]).alias("codes")
    )
    c_index = c_cell.join(c_codes, "neighbor_id")

    q = queries.select(
        F.col(id_col).cast("long").alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("vi", _qz(F.col("qv"), quantize_scale))
    q_probed = ivf_assign(q, cent, "query_id", nprobe).select("query_id", "cell")
    # ADC lookup table: per query, per subspace, dist to each codeword
    # (codeword order pinned by array_sort on (code, d) structs)
    lut_pairs = (
        q.select("query_id", "vi")
        .join(F.broadcast(cb))
        .select(
            "query_id",
            "code",
            *[
                _pq_subdist(F.col("vi"), F.col("ci"), s, d_sub).alias(f"_d{s}")
                for s in range(m_sub)
            ],
        )
    )
    q_lut = lut_pairs.groupBy("query_id").agg(
        *[
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("code"), F.col(f"_d{s}").alias("d")))),
                lambda x: x["d"],
            ).alias(f"_l{s}")
            for s in range(m_sub)
        ]
    ).select("query_id", F.array(*[f"_l{s}" for s in range(m_sub)]).alias("lut"))

    q_side = q_probed.join(q_lut, "query_id")
    adc_expr = F.aggregate(
        F.sequence(F.lit(0), F.lit(m_sub - 1)),
        F.lit(0).cast("long"),
        lambda acc, s: acc
        + F.get(F.get(F.col("lut"), s), F.get(F.col("codes"), s)),
    )
    cands = (
        c_index.join(F.broadcast(q_side), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", adc_expr.alias("adc"))
        .distinct()
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("neighbor_id").asc()
    )
    keep = (
        cands.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= overfetch * k)
        .select("query_id", "neighbor_id")
    )
    # exact re-score of the tiny survivor set only: both vector joins
    # are survivor-sized (AQE broadcasts them against the big tables)
    rescored = (
        keep.join(
            q.select("query_id", "qv").dropDuplicates(["query_id"]), "query_id"
        )
        .join(c.select("neighbor_id", "cv"), "neighbor_id")
        .select("query_id", "neighbor_id", cosine_sim(F.col("qv"), F.col("cv")).alias("cs"))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cs").desc(), F.col("neighbor_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
