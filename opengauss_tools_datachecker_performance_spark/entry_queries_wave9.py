"""Driver-contract query catalog, wave 9: near-dup cluster resolution.

The pair-emitting dedup operators (minhash / ngram / simhash /
embedding) stop at candidate pairs; a real training-data pipeline must
then DECIDE — group the pairs into duplicate clusters and keep one
survivor per cluster. Two oracle-checked entries close that gap:

* ``near_dup_clusters`` — exact n-gram Jaccard pairs over documents
  with a planted two-hop duplicate CHAIN (orig → +200000 → +400000),
  resolved into components by operators.components.connected_components
  (alternating large-star/small-star, Kiveris et al. SoCC'14). The
  chain forces transitivity: orig and its second-hop copy may share no
  qualifying pair yet must land in one cluster. The DuckDB oracle
  computes the same closure with a recursive CTE.
* ``dedup_survivors`` — one survivor per cluster (longest text, ties
  to the smallest id) + member counts, the actual keep/drop decision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.entry_queries import (
    _SQL_NORM,
    _SQL_PHASH,
    _SQL_SHINGLES,
    _SQL_WS_TOKS,
    _sql_minhash_array,
    _t,
    query,
)

_SUFFIX1 = " extra near duplicate suffix words appended here tail"
_SUFFIX2 = " second hop chain extension tokens"

#: documents ∪ first-hop copies (+200000, suffix1) ∪ second-hop copies
#: (+400000, suffix1+suffix2) — a planted duplicate chain per %11 doc.
_SQL_DOCS_CHAIN = f"""
    docs2 AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
      UNION ALL
      SELECT CAST(doc_id + 200000 AS VARCHAR), text || '{_SUFFIX1}'
      FROM documents WHERE doc_id % 11 = 0
      UNION ALL
      SELECT CAST(doc_id + 400000 AS VARCHAR), text || '{_SUFFIX1}' || '{_SUFFIX2}'
      FROM documents WHERE doc_id % 11 = 0
    )
"""

#: exact n-gram Jaccard pairs ≥ 0.3 over docs2 (same pipeline the
#: green ngram_jaccard_pairs oracle uses), then the component closure
#: as a recursive CTE: reach(id, r) = "node r reaches node id";
#: component = min reachable id (graph symmetrized, so min member).
_SQL_CLUSTERS_CTE = f"""
    norm AS (
      SELECT doc_id, {_SQL_WS_TOKS.format(t=_SQL_NORM.format(t='text'))} AS toks FROM docs2
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform({_SQL_SHINGLES}, s -> {_SQL_PHASH.format(x='s')})) AS shset
      FROM norm
    ),
    inv AS (SELECT doc_id, unnest(shset) AS sh FROM sh),
    freq_ok AS (SELECT sh FROM inv GROUP BY sh HAVING COUNT(*) <= 100),
    inv2 AS (SELECT inv.* FROM inv JOIN freq_ok USING (sh)),
    shared AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
      FROM inv2 a JOIN inv2 b USING (sh)
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id_a, id_b
      FROM shared
      JOIN sh sa ON sa.doc_id = id_a
      JOIN sh sb ON sb.doc_id = id_b
      WHERE shared::DOUBLE / (len(sa.shset) + len(sb.shset) - shared) >= 0.3
    ),
    edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach AS (
      SELECT u AS id, u AS r FROM (SELECT DISTINCT u FROM edges) t
      UNION
      SELECT e.v AS id, reach.r FROM reach JOIN edges e ON e.u = reach.id
    ),
    lab AS (SELECT id, MIN(r) AS component FROM reach GROUP BY id)
"""


def _docs_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    base = d.filter(F.col("doc_id").cast("long") % 11 == 0)
    c1 = base.select(
        (F.col("doc_id").cast("long") + 200000).cast("string").alias("doc_id"),
        F.concat("text", F.lit(_SUFFIX1)).alias("text"),
    )
    c2 = base.select(
        (F.col("doc_id").cast("long") + 400000).cast("string").alias("doc_id"),
        F.concat("text", F.lit(_SUFFIX1), F.lit(_SUFFIX2)).alias("text"),
    )
    return d.unionByName(c1).unionByName(c2)


def _cluster_labels(spark: SparkSession, sf_dir: str):
    from opengauss_tools_datachecker_performance_spark.operators.components import (
        connected_components,
    )
    from opengauss_tools_datachecker_performance_spark.operators.dedup import (
        ngram_jaccard_pairs,
    )

    docs2 = _docs_chain(spark, sf_dir)
    pairs = ngram_jaccard_pairs(docs2, "doc_id", "text", threshold=0.3)
    return connected_components(pairs), docs2


@query(
    "near_dup_clusters",
    f"""
    WITH RECURSIVE {_SQL_DOCS_CHAIN}, {_SQL_CLUSTERS_CTE}
    SELECT id AS doc_id, component,
           CAST(COUNT(*) OVER (PARTITION BY component) AS BIGINT) AS cluster_size
    FROM lab
    """,
)
def q_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → duplicate clusters via large-star/small-star
    connected components (operators/components.py). Planted two-hop
    chains make the closure non-trivial: transitive membership, not
    just pair mirroring."""
    labels, _ = _cluster_labels(spark, sf_dir)
    # groupBy+join instead of count-over-window: a window partitioned
    # by component gathers a mega-cluster (boilerplate corpora produce
    # components of 10^6+ members) into one task, while the groupBy
    # partial-aggregates map-side and the components-sized size frame
    # joins back (AQE broadcasts it when small).
    sizes = labels.groupBy("component").agg(
        F.count(F.lit(1)).cast("long").alias("cluster_size")
    )
    return labels.join(sizes, "component").select(
        F.col("id").alias("doc_id"), "component", "cluster_size"
    )


@query(
    "dedup_survivors",
    f"""
    WITH RECURSIVE {_SQL_DOCS_CHAIN}, {_SQL_CLUSTERS_CTE},
    surv AS (
      SELECT l.component, l.id, len(d.text) AS text_len,
             row_number() OVER (PARTITION BY l.component
                                ORDER BY len(d.text) DESC, l.id ASC) AS rn,
             COUNT(*) OVER (PARTITION BY l.component) AS n_members
      FROM lab l JOIN docs2 d ON d.doc_id = l.id
    )
    SELECT component, id AS survivor_id,
           CAST(n_members AS BIGINT) AS n_members,
           CAST(text_len AS BIGINT) AS survivor_len
    FROM surv WHERE rn = 1
    """,
)
def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep/drop decision per duplicate cluster
    (operators.components.dedup_survivors): longest text survives,
    ties to the smallest id — deterministic on both engines."""
    from opengauss_tools_datachecker_performance_spark.operators.components import (
        dedup_survivors,
    )

    labels, docs2 = _cluster_labels(spark, sf_dir)
    return dedup_survivors(labels, docs2)


# ---------------------------------------------------------------------------
# incremental near-dup: persisted MinHash index vs a new batch
# ---------------------------------------------------------------------------

_MINHASH_INCREMENTAL_SQL = f"""
    WITH docs2 AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
      UNION ALL
      SELECT CAST(doc_id + 500000 AS VARCHAR), text || '{_SUFFIX1}'
      FROM documents WHERE doc_id % 13 = 0
    ),
    norm AS (
      SELECT doc_id, {_SQL_WS_TOKS.format(t=_SQL_NORM.format(t='text'))} AS toks FROM docs2
    ),
    sh AS (SELECT doc_id, {_SQL_SHINGLES} AS shingles FROM norm),
    sig0 AS (
      SELECT doc_id,
             list_distinct(list_transform(shingles, s -> {_SQL_PHASH.format(x='s')})) AS shset
      FROM sh
    ),
    sig AS (SELECT doc_id, shset, {{mh}} AS mh FROM sig0),
    buckets AS (
      SELECT doc_id, b.band,
             ('0x' || substr(md5(mh[b.band*2+1]::VARCHAR || ',' || mh[b.band*2+2]::VARCHAR), 1, 15))::BIGINT AS band_key
      FROM sig, (SELECT unnest([0,1,2,3]) AS band) b
    ),
    capped AS (
      SELECT * FROM buckets
      QUALIFY COUNT(*) OVER (PARTITION BY band, band_key) <= 50
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
      FROM capped a JOIN capped c USING (band, band_key)
      WHERE a.doc_id < c.doc_id
        AND (CAST(a.doc_id AS BIGINT) >= 500000 OR CAST(c.doc_id AS BIGINT) >= 500000)
    )
    SELECT cand.id_a, cand.id_b,
           CAST(CAST(round(len(list_intersect(sa.shset, sb.shset))::DOUBLE
                 / len(list_distinct(list_concat(sa.shset, sb.shset))), 6) AS DECIMAL(10,6)) AS VARCHAR) AS jaccard
    FROM cand
    JOIN sig sa ON sa.doc_id = cand.id_a
    JOIN sig sb ON sb.doc_id = cand.id_b
    WHERE len(list_intersect(sa.shset, sb.shset))::DOUBLE
          / len(list_distinct(list_concat(sa.shset, sb.shset))) >= 0.3
"""


@query(
    "minhash_incremental",
    _MINHASH_INCREMENTAL_SQL.format(mh=_sql_minhash_array()),
)
def q_minhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup (operators/dedup_index.py): the corpus's
    MinHash state (band buckets + distinct shingle rows) is treated as
    a persisted ingest-time index; a NEW batch (+500000 near-dup
    copies of every 13th doc) is deduped against it and within itself
    without any corpus text re-scan. Result == the full-corpus run
    restricted to batch-involving pairs, which is exactly what the
    oracle computes (same SQL as minhash_near_dup's green oracle plus
    the batch-involvement predicate)."""
    from opengauss_tools_datachecker_performance_spark.operators.dedup_index import (
        incremental_near_duplicates,
        minhash_index_frames,
    )

    corpus = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    batch = corpus.filter(F.col("doc_id").cast("long") % 13 == 0).select(
        (F.col("doc_id").cast("long") + 500000).cast("string").alias("doc_id"),
        F.concat("text", F.lit(_SUFFIX1)).alias("text"),
    )
    buckets, shingles = minhash_index_frames(corpus)
    out = incremental_near_duplicates(buckets, shingles, batch, threshold=0.3)
    return out.select(
        "id_a",
        "id_b",
        F.round("jaccard", 6).cast("decimal(10,6)").cast("string").alias("jaccard"),
    )


# ---------------------------------------------------------------------------
# corpus curation: stratified sampling + token-budget packing plan
# ---------------------------------------------------------------------------

_PH_ID = _SQL_PHASH.format(x="doc_id")


@query(
    "stratified_sample",
    f"""
    WITH d AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id,
             CASE WHEN len(text) < 200 THEN 'short'
                  WHEN len(text) < 400 THEN 'mid'
                  ELSE 'long' END AS stratum
      FROM documents
    ),
    r AS (
      SELECT doc_id, stratum,
             row_number() OVER (PARTITION BY stratum
                                ORDER BY {_PH_ID}, doc_id) AS sample_rank
      FROM d
    )
    SELECT doc_id, stratum, CAST(sample_rank AS BIGINT) AS sample_rank
    FROM r WHERE sample_rank <= 20
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic seedless stratified sampling
    (operators.curation.stratified_sample): 20 docs per text-length
    stratum under the portable-hash order — membership is stable
    across runs, append orders, and engines."""
    from opengauss_tools_datachecker_performance_spark.operators.curation import (
        stratified_sample,
    )

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.when(F.length("text") < 200, F.lit("short"))
        .when(F.length("text") < 400, F.lit("mid"))
        .otherwise(F.lit("long"))
        .alias("stratum"),
    )
    out = stratified_sample(d, "stratum", 20)
    return out.select(
        "doc_id", "stratum", F.col("sample_rank").cast("long").alias("sample_rank")
    )


_PACK_BUDGET = 512
_PACK_SHARDS = 16

#: shared d/s/c packing CTE block — the single source of truth for the
#: oracle-side token count (NULL text → 0 tokens, mirroring
#: token_pack_plan's guard), shard routing, and shard-local running
#: start offset; used by BOTH the token_pack_plan and pack_manifest
#: oracles so a packing fix can never silently apply to only one.
_SQL_PACK_CTES = f"""
    d AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id,
             COALESCE(CAST(len({_SQL_WS_TOKS.format(t='text')}) AS BIGINT), 0) AS n_tokens
      FROM documents
    ),
    s AS (
      SELECT doc_id, n_tokens,
             ({_PH_ID}) % {_PACK_SHARDS} AS shard, {_PH_ID} AS ph
      FROM d
    ),
    c AS (
      SELECT doc_id, shard, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY shard ORDER BY ph, doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens AS st
      FROM s
    )
"""


@query(
    "token_pack_plan",
    f"""
    WITH {_SQL_PACK_CTES}
    SELECT doc_id, CAST(shard AS BIGINT) AS shard,
           CAST(st // {_PACK_BUDGET} AS BIGINT) AS bin,
           CAST(st % {_PACK_BUDGET} AS BIGINT) AS tok_offset,
           n_tokens,
           CAST({_PACK_BUDGET} AS BIGINT) AS budget
    FROM c
    """,
)
def q_token_pack_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous GPT-style sequence-packing plan
    (operators.curation.token_pack_plan): shard-local token streams
    sliced into 512-token sequences; each doc's (shard, bin, offset)
    is the closed-form image of its running start offset — no global
    window, no per-row state machine."""
    from opengauss_tools_datachecker_performance_spark.operators.curation import (
        token_pack_plan,
    )

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    out = token_pack_plan(d, budget=_PACK_BUDGET, n_shards=_PACK_SHARDS)
    return out.select(
        "doc_id",
        "shard",
        "bin",
        F.col("offset").alias("tok_offset"),
        "n_tokens",
        "budget",
    )


@query(
    "pack_manifest",
    f"""
    WITH {_SQL_PACK_CTES},
    p AS (
      SELECT doc_id, shard, n_tokens,
             st // {_PACK_BUDGET} AS bin,
             st % {_PACK_BUDGET} AS tok_offset
      FROM c
    ),
    m AS (
      SELECT shard, bin, doc_id, tok_offset, n_tokens,
             unnest(range(0, CAST(((tok_offset + n_tokens - 1) // {_PACK_BUDGET}) + 1 AS BIGINT))) AS k
      FROM p WHERE n_tokens > 0
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(bin + k AS BIGINT) AS bin,
           doc_id,
           CAST(CASE WHEN k = 0 THEN tok_offset ELSE 0 END AS BIGINT) AS bin_offset,
           CAST(greatest(0, k * {_PACK_BUDGET} - tok_offset) AS BIGINT) AS doc_from,
           CAST(least(n_tokens, (k + 1) * {_PACK_BUDGET} - tok_offset) AS BIGINT) AS doc_to
    FROM m
    """,
)
def q_pack_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Writer-ready packing manifest
    (operators.curation.pack_manifest): the token_pack_plan expanded
    to one row per (doc, bin) slice — straddling docs split at
    sequence boundaries via a closed-form sequence explode. Each
    (shard, bin) group is an independent writer work unit."""
    from opengauss_tools_datachecker_performance_spark.operators.curation import (
        pack_manifest,
        token_pack_plan,
    )

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    plan = token_pack_plan(d, budget=_PACK_BUDGET, n_shards=_PACK_SHARDS)
    return pack_manifest(plan)


# --- run-to-run report regression -----------------------------------

#: two synthetic "runs" over documents: the previous run flagged short
#: docs under a 500-char rule; the current run flags 300..700. The
#: overlap exercises all three change classes (persisting 300..<500,
#: resolved <300, new 500..700 — 218/244/38 rows at sf0.01).
_SQL_REG_VIO = """
      SELECT CAST(doc_id % 8 AS BIGINT) AS part,
             'min_chars' AS "constraint",
             CAST(doc_id AS VARCHAR) AS key,
             CAST(-1 AS BIGINT) AS span_idx,
             'n_chars' AS detail
      FROM documents WHERE {pred}
"""


@query(
    "report_regression",
    f"""
    WITH prev AS ({_SQL_REG_VIO.format(pred='n_chars < 500')}),
    cur AS ({_SQL_REG_VIO.format(pred='n_chars BETWEEN 300 AND 700')})
    SELECT COALESCE(c.part, p.part) AS part,
           COALESCE(c."constraint", p."constraint") AS "constraint",
           COALESCE(c.key, p.key) AS key,
           COALESCE(c.span_idx, p.span_idx) AS span_idx,
           COALESCE(c.detail, p.detail) AS detail,
           CASE WHEN p.key IS NULL THEN 'new'
                WHEN c.key IS NULL THEN 'resolved'
                ELSE 'persisting' END AS change
    FROM cur c FULL OUTER JOIN prev p
      ON c.part = p.part AND c."constraint" = p."constraint"
     AND c.key = p.key AND c.span_idx = p.span_idx AND c.detail = p.detail
    """,
)
def q_report_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-to-run violation diff (plans.report.run_regression): the
    operator behind --baseline-report-dir, classifying each violation
    identity as new / resolved / persisting across two runs. Reference
    parity: users line up successive report trees
    (SliceCheckResultManager.refreshSummary:218-232 keeps per-table
    totals stable across runs); this makes the comparison itself a
    distributed operator."""
    from opengauss_tools_datachecker_performance_spark.plans.report import (
        run_regression,
    )

    d = _t(spark, sf_dir, "documents")

    def vio(pred):
        return d.filter(pred).select(
            F.pmod(F.col("doc_id"), F.lit(8)).alias("part"),
            F.lit("min_chars").alias("constraint"),
            F.col("doc_id").cast("string").alias("key"),
            F.lit(None).cast("int").alias("span_idx"),
            F.lit("n_chars").alias("detail"),
        )

    prev = vio(F.col("n_chars") < 500)
    cur = vio((F.col("n_chars") >= 300) & (F.col("n_chars") <= 700))
    reg = run_regression(cur, prev)
    return reg.select(
        F.col("part").cast("long").alias("part"),
        "constraint",
        "key",
        F.col("span_idx").cast("long").alias("span_idx"),
        "detail",
        "change",
    )
