"""Driver-contract query catalog, wave 10: corpus hygiene operators.

Three more first-class training-data-pipeline operators, each with a
value-exact DuckDB oracle:

* ``decontaminate`` — benchmark decontamination (GPT-3/Pile
  discipline): flag corpus docs sharing ≥ 2 distinct k-shingles with a
  held-out benchmark set (here: the ``doc_id % 23 = 0`` docs). The
  benchmark's distinct shingle-hash set broadcasts; one corpus-side
  groupBy does both counts (operators/decontamination.py).
* ``repetition_stats`` — Gopher-style repetition signals (Rae et al.
  2021): duplicate-token fraction + top-bigram coverage per doc, with
  planted boilerplate on ``doc_id % 7 = 0`` docs.
* ``pii_scan`` — PII-shaped substring counts (email / IPv4 / phone)
  via RE2-safe regexp_count projections, with planted contacts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.entry_queries import (
    _SQL_NORM,
    _SQL_PHASH,
    _SQL_SHINGLES,
    _SQL_WS_TOKS,
    _t,
    query,
)

_TOKS = _SQL_WS_TOKS.format(t=_SQL_NORM.format(t="text"))


@query(
    "decontaminate",
    f"""
    WITH norm AS (
      SELECT doc_id, {_TOKS} AS toks FROM documents
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform({_SQL_SHINGLES},
                                          s -> {_SQL_PHASH.format(x='s')})) AS shset
      FROM norm
    ),
    b AS (
      SELECT DISTINCT unnest(shset) AS bsh FROM sh WHERE doc_id % 23 = 0
    ),
    flat AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id, unnest(shset) AS s FROM sh
    ),
    agg AS (
      SELECT doc_id, COUNT(*) AS n_shingles, COUNT(b.bsh) AS n_shared
      FROM flat LEFT JOIN b ON flat.s = b.bsh
      GROUP BY doc_id
    )
    SELECT doc_id, n_shingles, n_shared,
           CAST(CAST(round(n_shared::DOUBLE / n_shingles, 6)
                     AS DECIMAL(10,6)) AS VARCHAR) AS shared_frac,
           n_shared >= 2 AS contaminated
    FROM agg
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (operators.decontamination): corpus =
    all documents, benchmark = the doc_id % 23 = 0 subset — those docs
    must flag as contaminated (they ARE the benchmark), everything
    else only via accidental shingle sharing, which the oracle counts
    identically."""
    from opengauss_tools_datachecker_performance_spark.operators.decontamination import (
        decontaminate,
    )

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    bench = d.filter(F.col("doc_id") % 23 == 0)
    out = decontaminate(d, bench, min_shared=2)
    # Driver-hash-stable rendering of the double ratio (same expression
    # IEEE-754-identical on both engines; round→decimal→string).
    return out.withColumn(
        "shared_frac",
        F.round("shared_frac", 6).cast("decimal(10,6)").cast("string"),
    )


_SQL_REP_DOCS = """
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0
                  THEN text || ' buy now buy now buy now'
                  ELSE text END AS text
      FROM documents
"""


@query(
    "repetition_stats",
    f"""
    WITH docs2 AS ({_SQL_REP_DOCS}),
    norm AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id, {_TOKS} AS toks FROM docs2
    ),
    base AS (
      SELECT doc_id, len(toks) AS n_tokens,
             len(list_distinct(toks)) AS n_distinct_tokens,
             CASE WHEN len(toks) >= 2
                  THEN list_transform(range(1, len(toks)),
                                      i -> toks[i] || ' ' || toks[i+1])
                  ELSE [] END AS bigrams
      FROM norm
    ),
    bc AS (
      SELECT doc_id, bg, COUNT(*) AS n
      FROM (SELECT doc_id, unnest(bigrams) AS bg FROM base)
      GROUP BY 1, 2
    ),
    top AS (
      SELECT doc_id, bg AS top_bigram, n,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY n DESC, bg ASC) AS rn
      FROM bc
    )
    SELECT b.doc_id, b.n_tokens, b.n_distinct_tokens,
           CAST(CAST(round(CASE WHEN b.n_tokens > 0
                THEN 1.0::DOUBLE - b.n_distinct_tokens::DOUBLE / b.n_tokens
                ELSE 0.0::DOUBLE END, 6) AS DECIMAL(10,6)) AS VARCHAR)
               AS dup_token_frac,
           t.top_bigram,
           CAST(CAST(round(COALESCE(CASE WHEN b.n_tokens > 0
                         THEN 2.0::DOUBLE * t.n / b.n_tokens END,
                    0.0::DOUBLE), 6) AS DECIMAL(10,6)) AS VARCHAR)
               AS top_bigram_frac
    FROM base b
    LEFT JOIN (SELECT * FROM top WHERE rn = 1) t USING (doc_id)
    """,
)
def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition signals (functions.text.repetition_stats)
    over documents with boilerplate planted on the % 7 docs."""
    from opengauss_tools_datachecker_performance_spark.functions.text import (
        repetition_stats,
    )

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.col("text"), F.lit(" buy now buy now buy now")),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    out = repetition_stats(d)
    return out.withColumns(
        {
            c: F.round(c, 6).cast("decimal(10,6)").cast("string")
            for c in ("dup_token_frac", "top_bigram_frac")
        }
    )


_SQL_PII_DOCS = """
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 13 = 0
                     THEN ' contact user' || doc_id || '@example.com now'
                     ELSE '' END
             || CASE WHEN doc_id % 17 = 0
                     THEN ' host 10.' || (doc_id % 200) || '.0.7 up'
                     ELSE '' END
             || CASE WHEN doc_id % 19 = 0
                     THEN ' call +1-555-' || (1000 + doc_id % 9000) || ' today'
                     ELSE '' END AS text
      FROM documents
"""


@query(
    "pii_scan",
    f"""
    WITH docs2 AS ({_SQL_PII_DOCS})
    SELECT CAST(doc_id AS VARCHAR) AS doc_id,
           len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS n_email,
           len(regexp_extract_all(text,
               '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b')) AS n_ipv4,
           len(regexp_extract_all(text,
               '\\+\\d{{1,3}}-\\d{{3}}-\\d{{3,}}')) AS n_phone,
           (len(regexp_extract_all(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) > 0
            OR len(regexp_extract_all(text,
               '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b')) > 0
            OR len(regexp_extract_all(text,
               '\\+\\d{{1,3}}-\\d{{3}}-\\d{{3,}}')) > 0) AS has_pii
    FROM docs2
    """,
)
def q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII pattern pre-screen (functions.text.pii_scan) over documents
    with synthetic contacts planted on the % 13 / % 17 / % 19 docs."""
    from opengauss_tools_datachecker_performance_spark.functions.text import pii_scan

    d = _t(spark, sf_dir, "documents")
    planted = d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 13 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 17 == 0,
                F.concat(
                    F.lit(" host 10."),
                    (F.col("doc_id") % 200).cast("string"),
                    F.lit(".0.7 up"),
                ),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 19 == 0,
                F.concat(
                    F.lit(" call +1-555-"),
                    (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
                    F.lit(" today"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return pii_scan(planted)


_SQL_MIX_TOKS = _SQL_WS_TOKS.format(t="text")


@query(
    "mixing_plan",
    f"""
    WITH per_source AS (
      SELECT source, COUNT(*) AS n_docs,
             SUM(len({_SQL_MIX_TOKS})) AS n_tokens
      FROM documents GROUP BY source
    ),
    w(source, weight) AS (
      VALUES ('src0', 3.0::DOUBLE), ('src1', 1.0::DOUBLE),
             ('src2', 1.0::DOUBLE)
    ),
    j AS (
      SELECT p.source, p.n_docs, p.n_tokens,
             COALESCE(w.weight, 0.0::DOUBLE) AS weight
      FROM per_source p LEFT JOIN w USING (source)
    ),
    t AS (
      SELECT source, n_docs, n_tokens, weight,
             CASE WHEN SUM(weight) OVER () > 0
                  THEN (weight / SUM(weight) OVER ()) * 50000.0::DOUBLE
                  ELSE 0.0::DOUBLE * 50000.0::DOUBLE END AS target_tokens
      FROM j
    )
    ,
    r AS (
      SELECT source, n_docs, n_tokens, weight, target_tokens,
             CASE WHEN n_tokens > 0
                  THEN target_tokens / CAST(n_tokens AS DOUBLE)
                  ELSE 0.0::DOUBLE END AS epochs,
             LEAST(1.0::DOUBLE,
                   CASE WHEN n_tokens > 0
                        THEN target_tokens / CAST(n_tokens AS DOUBLE)
                        ELSE 0.0::DOUBLE END) AS sample_rate
      FROM t
    )
    SELECT source, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(CAST(round(weight, 6) AS DECIMAL(18,6)) AS VARCHAR) AS weight,
           CAST(CAST(round(target_tokens, 6) AS DECIMAL(18,6)) AS VARCHAR)
             AS target_tokens,
           CAST(CAST(round(epochs, 6) AS DECIMAL(18,6)) AS VARCHAR) AS epochs,
           CAST(CAST(round(sample_rate, 6) AS DECIMAL(18,6)) AS VARCHAR)
             AS sample_rate
    FROM r
    """,
)
def q_mixing_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing plan (operators.curation.mixing_plan): src0 weighted
    3×, src1/src2 1×, every other source weight 0 — target tokens,
    oversampling epochs, and within-epoch sample_rate per source
    against a 50k-token budget. Rate columns are rendered as 6-dp
    decimal strings (both engines compute the same IEEE doubles, then
    round+render identically — the hash-stable canonical form)."""
    from opengauss_tools_datachecker_performance_spark.operators.curation import (
        mixing_plan,
    )

    d = _t(spark, sf_dir, "documents")
    plan = mixing_plan(
        d, {"src0": 3.0, "src1": 1.0, "src2": 1.0}, token_budget=50_000
    )
    canon6 = lambda c: (  # noqa: E731 — local rendering helper
        F.round(F.col(c), 6).cast("decimal(18,6)").cast("string").alias(c)
    )
    return plan.select(
        "source",
        "n_docs",
        "n_tokens",
        canon6("weight"),
        canon6("target_tokens"),
        canon6("epochs"),
        canon6("sample_rate"),
    )


_SQL_SPAN_DOCS = """
      SELECT doc_id,
             CASE WHEN doc_id % 9 = 0
                  THEN text || ' shared passage alpha beta gamma delta epsilon zeta'
                  ELSE text END AS text
      FROM documents
"""

_SQL_POS_SH = _SQL_PHASH.format(
    x="toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]"
)

#: island passage key: hash of the ordered shingle-hash run (mirrors
#: operators.substring_dedup.duplicate_spans' array_sort+array_join)
_SQL_PASSAGE_KEY = _SQL_PHASH.format(
    x="string_agg(sh::VARCHAR, ',' ORDER BY pos)"
)


@query(
    "duplicate_spans",
    f"""
    WITH docs2 AS ({_SQL_SPAN_DOCS}),
    norm AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id, {_TOKS} AS toks FROM docs2
    ),
    flat AS (
      SELECT doc_id, i - 1 AS pos, {_SQL_POS_SH} AS sh
      FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
            FROM norm WHERE len(toks) >= 3)
    ),
    dup AS (
      SELECT sh FROM flat GROUP BY sh HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    hits AS (SELECT doc_id, pos, sh FROM flat JOIN dup USING (sh)),
    isl AS (
      SELECT doc_id, pos, sh,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS g
      FROM hits
    )
    SELECT doc_id, MIN(pos) AS start_pos, MAX(pos) + 2 AS end_pos,
           MAX(pos) + 2 - MIN(pos) + 1 AS span_tokens,
           {_SQL_PASSAGE_KEY} AS passage_key
    FROM isl GROUP BY doc_id, g
    """,
)
def q_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-doc duplicate-passage spans
    (operators.substring_dedup.duplicate_spans): an identical 8-token
    passage planted on every % 9 doc must island into one span per
    carrier; natural cross-doc shingle runs in the synthetic text
    count identically on both sides."""
    from opengauss_tools_datachecker_performance_spark.operators.substring_dedup import (
        duplicate_spans,
    )

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 9 == 0,
            F.concat(
                F.col("text"),
                F.lit(" shared passage alpha beta gamma delta epsilon zeta"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    out = duplicate_spans(d, min_docs=2)
    return out.select(
        "doc_id",
        F.col("start_pos").cast("long").alias("start_pos"),
        F.col("end_pos").cast("long").alias("end_pos"),
        F.col("span_tokens").cast("long").alias("span_tokens"),
        "passage_key",
    )


@query(
    "span_removal",
    f"""
    WITH docs2 AS ({_SQL_SPAN_DOCS}),
    norm AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id, {_TOKS} AS toks FROM docs2
    ),
    flat AS (
      SELECT doc_id, i - 1 AS pos, {_SQL_POS_SH} AS sh
      FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
            FROM norm WHERE len(toks) >= 3)
    ),
    dup AS (
      SELECT sh FROM flat GROUP BY sh HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    hits AS (SELECT doc_id, pos, sh FROM flat JOIN dup USING (sh)),
    isl AS (
      SELECT doc_id, pos, sh,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS g
      FROM hits
    ),
    spans AS (
      SELECT doc_id, MIN(pos) AS start_pos, MAX(pos) + 2 AS end_pos,
             {_SQL_PASSAGE_KEY} AS passage_key
      FROM isl GROUP BY doc_id, g
    ),
    plan AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY passage_key
                ORDER BY doc_id, start_pos) AS rn FROM spans
    ),
    rem AS (
      -- rn = 1 is the kept first carrier; its token range is
      -- PROTECTED from overlapping removals (remove_spans' contract)
      SELECT doc_id,
             list(struct_pack(s := start_pos, e := end_pos))
               FILTER (WHERE rn > 1) AS rm,
             list(struct_pack(s := start_pos, e := end_pos))
               FILTER (WHERE rn = 1) AS kp
      FROM plan GROUP BY doc_id
    ),
    final AS (
      SELECT n.doc_id, n.toks,
             CASE WHEN r.rm IS NULL THEN n.toks
                  ELSE list_filter(n.toks,
                       (x, i) -> len(list_filter(r.rm,
                            s -> (i - 1) >= s.s AND (i - 1) <= s.e)) = 0
                         OR len(list_filter(COALESCE(r.kp, []),
                            s -> (i - 1) >= s.s AND (i - 1) <= s.e)) > 0)
             END AS clean
      FROM norm n LEFT JOIN rem r USING (doc_id)
    )
    SELECT doc_id, len(toks) AS n_tokens,
           len(toks) - len(clean) AS n_removed_tokens,
           md5(COALESCE(array_to_string(clean, ' '), '')) AS clean_fp
    FROM final
    """,
)
def q_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Close the substring-dedup loop: duplicate_spans → keep-first
    removal_plan → remove_spans (operators.substring_dedup). Output is
    count + md5 fingerprint of the cleaned token stream per doc so the
    value compare covers every byte of the edited text without
    shipping it."""
    from opengauss_tools_datachecker_performance_spark.operators.substring_dedup import (
        duplicate_spans,
        removal_plan,
        remove_spans,
    )

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 9 == 0,
            F.concat(
                F.col("text"),
                F.lit(" shared passage alpha beta gamma delta epsilon zeta"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    cleaned = remove_spans(d, removal_plan(duplicate_spans(d, min_docs=2)))
    return cleaned.select(
        "doc_id",
        "n_tokens",
        "n_removed_tokens",
        F.md5(F.col("clean_text")).alias("clean_fp"),
    )
