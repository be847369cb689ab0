"""Driver-contract query catalog, wave 16: JSON schema-on-read audit,
CDC latest-image collapse, asymmetric containment dedup, equi-width
histogram.

* ``json_props_audit`` — checks/constraints.json_field_audit over
  events.props with planted malformed / field-missing / NULL rows.
* ``cdc_latest_image`` — operators/cdc_apply.latest_change_per_key
  over a three-version-per-key synthetic batch.
* ``containment_pairs`` — operators/dedup.containment_pairs: planted
  prefix-docs are ~fully contained in their originals (near-superset
  detection Jaccard misses).
* ``equiwidth_histogram`` — checks/distributions.equiwidth_histogram
  of order totals (identical double bin arithmetic both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.entry_queries import (
    _SQL_NORM,
    _SQL_WS_TOKS,
    _t,
    query,
)

_SQL_PHASH = "('0x' || substr(md5({x}), 1, 15))::BIGINT"
_SQL_SHINGLES3 = """
      CASE WHEN len(toks) >= 3
           THEN list_transform(range(1, len(toks) - 1),
                               i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
           ELSE [array_to_string(toks, ' ')] END
"""


_MUT_PROPS_SQL = """
    SELECT event_id,
           CASE WHEN event_id % 31 = 3 THEN SUBSTR(props, 1, 4)
                WHEN event_id % 37 = 5 THEN '{"other": 1}'
                WHEN event_id % 41 = 7 THEN NULL
                ELSE props END AS props
    FROM events
"""


@query(
    "json_props_audit",
    f"""
    WITH m AS ({_MUT_PROPS_SQL})
    SELECT COUNT(*)::BIGINT AS n_rows,
           SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null_raw,
           SUM(CASE WHEN props IS NOT NULL AND NOT json_valid(props) THEN 1 ELSE 0 END)::BIGINT AS n_malformed,
           SUM(CASE WHEN json_valid(props) AND TRY_CAST(json_extract_string(props, '$.k') AS INT) IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_missing_field,
           SUM(CASE WHEN json_valid(props) AND TRY_CAST(json_extract_string(props, '$.k') AS INT) IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS n_with_field,
           MIN(CASE WHEN json_valid(props) THEN TRY_CAST(json_extract_string(props, '$.k') AS INT) END) AS min_val,
           MAX(CASE WHEN json_valid(props) THEN TRY_CAST(json_extract_string(props, '$.k') AS INT) END) AS max_val,
           SUM(CASE WHEN json_valid(props) THEN TRY_CAST(json_extract_string(props, '$.k') AS INT) END)::BIGINT AS sum_val
    FROM m
    """,
)
def q_json_props_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read JSON audit (checks.constraints.json_field_audit):
    planted malformed strings, field-missing objects, and NULLs in
    events.props — from_json and json_valid/TRY_CAST classify rows
    identically."""
    from opengauss_tools_datachecker_performance_spark.checks.constraints import (
        json_field_audit,
    )

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_id") % 31 == 3, F.substring("props", 1, 4))
        .when(F.col("event_id") % 37 == 5, F.lit('{"other": 1}'))
        .when(F.col("event_id") % 41 == 7, F.lit(None).cast("string"))
        .otherwise(F.col("props"))
        .alias("props"),
    )
    return json_field_audit(ev, "props", "k", "int")


@query(
    "cdc_latest_image",
    """
    WITH versions AS (
      SELECT o_orderkey AS key, v AS ts,
             o_totalprice + v AS price
      FROM orders, (SELECT UNNEST([1, 2, 3]) AS v)
      WHERE o_orderkey % 11 = 0
    )
    SELECT CAST(key AS VARCHAR) AS key, ts,
           CAST(CAST(round(price, 2) AS DECIMAL(18,2)) AS VARCHAR) AS price
    FROM versions
    QUALIFY ROW_NUMBER() OVER (PARTITION BY key ORDER BY ts DESC) = 1
    """,
)
def q_cdc_latest_image(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC batch collapse to the final image per key
    (operators.cdc_apply.latest_change_per_key): three versions per
    key, greatest ts wins — windowed over the BATCH only."""
    from opengauss_tools_datachecker_performance_spark.operators.cdc_apply import (
        latest_change_per_key,
    )

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 0)
    versions = orders.select(
        F.col("o_orderkey").cast("string").alias("key"),
        F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("ts"),
        "o_totalprice",
    ).select(
        "key", "ts", (F.col("o_totalprice") + F.col("ts")).alias("price")
    )
    latest = latest_change_per_key(versions, "key", ["ts"])
    return latest.select(
        "key",
        "ts",
        F.round("price", 2).cast("decimal(18,2)").cast("string").alias("price"),
    )


@query(
    "containment_pairs",
    f"""
    WITH docs2 AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
      UNION ALL
      SELECT CAST(doc_id + 300000 AS VARCHAR),
             array_to_string(
               (regexp_split_to_array(text, ' '))[1:GREATEST(3, CAST(FLOOR(len(regexp_split_to_array(text, ' ')) * 2 / 5) AS INT))],
               ' ')
      FROM documents WHERE doc_id % 13 = 0
    ),
    norm AS (
      SELECT doc_id, {_SQL_WS_TOKS.format(t=_SQL_NORM.format(t='text'))} AS toks FROM docs2
    ),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform({_SQL_SHINGLES3}, s -> {_SQL_PHASH.format(x='s')})) AS shset
      FROM norm
    ),
    inv AS (SELECT doc_id, unnest(shset) AS sh FROM sh),
    freq_ok AS (SELECT sh FROM inv GROUP BY sh HAVING COUNT(*) <= 100),
    inv2 AS (SELECT inv.* FROM inv JOIN freq_ok USING (sh)),
    shared AS (
      SELECT a.doc_id AS doc_id, b.doc_id AS container_id, COUNT(*) AS shared
      FROM inv2 a JOIN inv2 b USING (sh)
      WHERE a.doc_id <> b.doc_id
      GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM inv GROUP BY 1)
    SELECT s.doc_id, s.container_id,
           CAST(CAST(round(s.shared::DOUBLE / z.n_sh, 6) AS DECIMAL(10,6)) AS VARCHAR) AS containment
    FROM shared s JOIN sizes z ON z.doc_id = s.doc_id
    WHERE s.shared::DOUBLE / z.n_sh >= 0.8
    """,
)
def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle containment
    (operators.dedup.containment_pairs): planted 40%-prefix docs are
    ≈fully contained in their originals — high containment, low
    Jaccard; the near-superset family the symmetric path misses."""
    from opengauss_tools_datachecker_performance_spark.operators.dedup import (
        containment_pairs,
    )

    d = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    toks = F.split(F.col("text"), " ")
    n_keep = F.greatest(
        F.lit(3), F.floor(F.size(toks) * 2 / 5).cast("int")
    )
    prefixes = d.filter(F.col("doc_id").cast("long") % 13 == 0).select(
        (F.col("doc_id").cast("long") + 300000).cast("string").alias("doc_id"),
        F.array_join(F.slice(toks, F.lit(1), n_keep), " ").alias("text"),
    )
    out = containment_pairs(
        d.unionByName(prefixes), "doc_id", "text", threshold=0.8
    )
    return out.select(
        "doc_id",
        "container_id",
        F.round("containment", 6)
        .cast("decimal(10,6)")
        .cast("string")
        .alias("containment"),
    )


@query(
    "equiwidth_histogram",
    """
    WITH mm AS (SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders),
    b AS (
      SELECT LEAST(19, CAST(FLOOR((o_totalprice - mm.lo) / ((mm.hi - mm.lo) / 20)) AS INT)) AS bin,
             mm.lo AS lo, (mm.hi - mm.lo) / 20 AS w
      FROM orders, mm WHERE o_totalprice IS NOT NULL
    )
    SELECT bin,
           CAST(CAST(round(lo + bin * w, 6) AS DECIMAL(18,6)) AS VARCHAR) AS bin_lo,
           CAST(CAST(round(lo + (bin + 1) * w, 6) AS DECIMAL(18,6)) AS VARCHAR) AS bin_hi,
           COUNT(*)::BIGINT AS n
    FROM b GROUP BY bin, lo, w
    """,
)
def q_equiwidth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 20-bin histogram of order totals
    (checks.distributions.equiwidth_histogram) — identical double bin
    arithmetic in both engines, max value clamped into the last bin."""
    from opengauss_tools_datachecker_performance_spark.checks.distributions import (
        equiwidth_histogram,
    )

    return equiwidth_histogram(_t(spark, sf_dir, "orders"), "o_totalprice", 20)
