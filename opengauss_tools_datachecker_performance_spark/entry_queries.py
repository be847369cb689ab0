"""Driver-contract query catalog.

One entry per operator from SURVEY.md §2 (+ the training-data-pipeline
operators), each as BOTH a Spark callable ``(spark, sf_dir) -> DataFrame``
and an equivalent DuckDB oracle SQL string over the same parquet views.
Column names/aliases match exactly (the driver sorts columns by name and
hashes values).

Cross-engine ground rules:
* hash values that appear in OUTPUT use the portable md5-60bit hash
  (functions.hashing.portable_hash64) — identical in Spark and DuckDB;
  engine-internal digests stay xxhash64 (tested by pytest, not by the
  oracle).
* float outputs are rounded and cast to DECIMAL so value hashing is
  byte-stable across engines.
* every "sink"/mutated side is derived deterministically from the same
  source tables inside the query, so both engines see identical inputs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.functions.hashing import (
    PK_DELIMITER,
    portable_hash64,
    portable_hash64_sql,
)

US = "\x1f"  # unit separator

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# mutated "sink" for the diff-core queries (shared by several entries)
# ---------------------------------------------------------------------------

_SINK_ORDERS_SQL = """
    SELECT o_orderkey, o_custkey, o_orderstatus,
           CASE WHEN o_orderkey % 101 = 7 THEN o_totalprice + 1 ELSE o_totalprice END AS o_totalprice,
           o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 97 <> 0
    UNION ALL
    SELECT o_orderkey + 10000000, o_custkey, 'X', o_totalprice, o_orderdate, o_orderpriority
    FROM orders WHERE o_orderkey % 103 = 11
"""


def _sink_orders(orders: DataFrame) -> DataFrame:
    """Deterministic mutation of orders: ~1% deleted (→insert), ~1%
    price-bumped (→update), ~1% new keys (→delete)."""
    mutated = orders.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 101 == 7, F.col("o_totalprice") + 1).otherwise(
            F.col("o_totalprice")
        ),
    ).filter(F.col("o_orderkey") % 97 != 0)
    extra = orders.filter(F.col("o_orderkey") % 103 == 11).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_custkey",
        F.lit("X").alias("o_orderstatus"),
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    )
    return mutated.unionByName(extra)


_DIFF_ORDERS_SQL = f"""
    WITH sink AS ({_SINK_ORDERS_SQL}),
    j AS (
      SELECT COALESCE(s.o_orderkey, t.o_orderkey) AS k,
             CASE WHEN t.o_orderkey IS NULL THEN 'insert'
                  WHEN s.o_orderkey IS NULL THEN 'delete'
                  WHEN (s.o_custkey, s.o_orderstatus, s.o_totalprice, s.o_orderdate, s.o_orderpriority)
                       IS DISTINCT FROM
                       (t.o_custkey, t.o_orderstatus, t.o_totalprice, t.o_orderdate, t.o_orderpriority)
                  THEN 'update' END AS diff_type
      FROM orders s FULL OUTER JOIN sink t ON s.o_orderkey = t.o_orderkey
    )
    SELECT CAST(k AS VARCHAR) AS key, diff_type FROM j WHERE diff_type IS NOT NULL
"""


@query("diff_full_outer", _DIFF_ORDERS_SQL)
def q_diff_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1+J3+X2: the diff core — two-phase digest-pruned full-outer
    classification (DataCheckRunnable.java:332-344 semantics)."""
    from opengauss_tools_datachecker_performance_spark.operators.diff import diff_tables

    orders = _t(spark, sf_dir, "orders")
    return diff_tables(orders, _sink_orders(orders), key_cols=["o_orderkey"])


@query(
    "summary_rollup",
    f"""
    WITH diffs AS ({_DIFF_ORDERS_SQL})
    SELECT diff_type, COUNT(*) AS n_diffs,
           MIN(key) AS min_key, MAX(key) AS max_key
    FROM diffs GROUP BY diff_type
    """,
)
def q_summary_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: per-category rollup of the diff result
    (SliceCheckResultManager.java:143-232 totals)."""
    d = q_diff_full_outer(spark, sf_dir)
    return d.groupBy("diff_type").agg(
        F.count(F.lit(1)).alias("n_diffs"),
        F.min("key").alias("min_key"),
        F.max("key").alias("max_key"),
    )


_BUCKET_SQL = f"""
    WITH h AS (
      SELECT {portable_hash64_sql("concat_ws(chr(31), CAST(o_orderkey AS VARCHAR), o_orderstatus, o_orderpriority)")} AS ph
      FROM orders
    )
    SELECT (ph % 256)::INT AS bucket, COUNT(*) AS n_rows, bit_xor(ph) AS sig
    FROM h GROUP BY 1
"""


@query("digest_buckets", _BUCKET_SQL)
def q_digest_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+A2+A3: hash bucket routing + XOR signature fold
    (BuilderBucketHandler.java:116-131, Bucket.java:84-87), with the
    portable hash so both engines land identical signatures."""
    orders = _t(spark, sf_dir, "orders")
    ph = portable_hash64(
        F.concat_ws(US, F.col("o_orderkey").cast("string"), "o_orderstatus", "o_orderpriority")
    )
    return (
        orders.select(ph.alias("ph"))
        .withColumn("bucket", F.pmod(F.col("ph"), F.lit(256)).cast("int"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.expr("bit_xor(ph)").alias("sig"))
    )


@query(
    "digest_tree_rollup",
    f"""
    WITH b AS ({_BUCKET_SQL})
    SELECT (bucket // 16)::INT AS node, SUM(n_rows) AS n_rows, bit_xor(sig) AS sig
    FROM b GROUP BY 1
    """,
)
def q_digest_tree_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7: internal digest-tree level — XOR of child bucket signatures
    (MerkleTree.java:203-212 role)."""
    b = q_digest_buckets(spark, sf_dir)
    return (
        b.withColumn("node", (F.col("bucket") / 16).cast("int"))
        .groupBy("node")
        .agg(F.sum("n_rows").alias("n_rows"), F.expr("bit_xor(sig)").alias("sig"))
    )


@query(
    "canon_lineitem",
    """
    SELECT CAST(l_orderkey AS VARCHAR) || '_#_' || CAST(l_linenumber AS VARCHAR) AS key,
           strftime(l_shipdate, '%Y-%m-%d') AS ship_date_canon,
           printf('%.2f', l_quantity) AS qty_canon,
           CAST(CAST(l_extendedprice AS DECIMAL(20,6)) AS VARCHAR) AS price_canon,
           upper(hex(l_returnflag)) AS flag_hex
    FROM lineitem WHERE l_orderkey % 500 = 1
    """,
)
def q_canon_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§1.2 canonicalization: composite PK join (F3), date format (F5),
    scale-pinned numerics (F6), hex encode (F4) — the type-handler layer
    (SimpleTypeHandlerFactory.java) as vectorized expressions."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 500 == 1)
    return li.select(
        F.concat_ws(
            PK_DELIMITER,
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
        ).alias("key"),
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_date_canon"),
        F.regexp_replace(F.format_number(F.col("l_quantity"), 2), ",", "").alias("qty_canon"),
        F.col("l_extendedprice").cast("decimal(20,6)").cast("string").alias("price_canon"),
        F.upper(F.hex(F.col("l_returnflag"))).alias("flag_hex"),
    )


@query(
    "checkpoint_sample",
    """
    WITH r AS (
      SELECT o_orderkey, row_number() OVER (ORDER BY o_orderkey) AS rn FROM orders
    )
    SELECT rn, CAST(o_orderkey AS VARCHAR) AS boundary_key
    FROM r WHERE rn % 500 = 1
    """,
)
def q_checkpoint_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: equal-height slice boundaries — every Nth PK of sorted order
    (CheckPoint.java:75-100; mapper queryPointList). At scale the engine
    prefers approxQuantile/partition bounds; this is the exact variant."""
    from pyspark.sql.window import Window

    orders = _t(spark, sf_dir, "orders")
    w = Window.orderBy("o_orderkey")
    return (
        orders.select("o_orderkey", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") % 500 == 1)
        .select("rn", F.col("o_orderkey").cast("string").alias("boundary_key"))
    )


@query(
    "column_stats",
    """
    SELECT 'l_quantity' AS column_name, COUNT(*) AS n_rows,
           SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS n_nulls,
           COUNT(DISTINCT l_quantity) AS n_distinct,
           CAST(MIN(l_quantity) AS VARCHAR) AS min_value,
           CAST(MAX(l_quantity) AS VARCHAR) AS max_value,
           CAST(CAST(AVG(l_quantity) AS DECIMAL(20,6)) AS VARCHAR) AS avg_value
    FROM lineitem
    UNION ALL
    SELECT 'l_returnflag', COUNT(*),
           SUM(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END),
           COUNT(DISTINCT l_returnflag), MIN(l_returnflag), MAX(l_returnflag), NULL
    FROM lineitem
    UNION ALL
    SELECT 'l_shipdate', COUNT(*),
           SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END),
           COUNT(DISTINCT l_shipdate),
           CAST(MIN(l_shipdate) AS VARCHAR), CAST(MAX(l_shipdate) AS VARCHAR), NULL
    FROM lineitem
    """,
)
def q_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: per-column profile (exact-distinct variant for oracle
    parity; the engine's checks.stats.column_stats uses HLL at scale)."""
    li = _t(spark, sf_dir, "lineitem")

    def stats(col: str, numeric: bool):
        c = F.col(col)
        return li.agg(
            F.lit(col).alias("column_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(c.isNull().cast("long")).alias("n_nulls"),
            F.countDistinct(c).alias("n_distinct"),
            F.min(c).cast("string").alias("min_value"),
            F.max(c).cast("string").alias("max_value"),
            (
                F.avg(c).cast("decimal(20,6)").cast("string")
                if numeric
                else F.lit(None).cast("string")
            ).alias("avg_value"),
        )

    return (
        stats("l_quantity", True)
        .unionByName(stats("l_returnflag", False))
        .unionByName(stats("l_shipdate", False))
    )


@query(
    "uniqueness_check",
    """
    WITH e AS (
      SELECT event_id FROM events
      UNION ALL
      SELECT event_id FROM events WHERE event_id % 1009 = 3
    )
    SELECT CAST(event_id AS VARCHAR) AS key, COUNT(*) AS n_occurrences
    FROM e GROUP BY 1 HAVING COUNT(*) > 1
    """,
)
def q_uniqueness_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: exact uniqueness via the hash-narrowing scale path
    (checks.uniqueness) over events with planted duplicate ids."""
    from opengauss_tools_datachecker_performance_spark.checks.uniqueness import (
        duplicate_keys,
    )

    ev = _t(spark, sf_dir, "events").select("event_id")
    dup = ev.unionByName(ev.filter(F.col("event_id") % 1009 == 3))
    return duplicate_keys(dup, F.col("event_id"), hash_narrow=True)


@query(
    "referential_check",
    """
    WITH li AS (
      SELECT CASE WHEN l_orderkey % 997 = 13 THEN l_partkey + 5000000 ELSE l_partkey END AS ref_key
      FROM lineitem
    )
    SELECT CAST(ref_key AS VARCHAR) AS dangling_ref, COUNT(*) AS n_rows
    FROM li WHERE ref_key NOT IN (SELECT p_partkey FROM part)
    GROUP BY 1
    """,
)
def q_referential_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5: referential integrity — anti-join of (mutated) lineitem FKs
    against the part catalog; broadcast-anti at this dim size."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.when(F.col("l_orderkey") % 997 == 13, F.col("l_partkey") + 5_000_000)
        .otherwise(F.col("l_partkey"))
        .alias("ref_key")
    )
    part = _t(spark, sf_dir, "part").select(F.col("p_partkey").alias("ref_key"))
    return (
        li.join(F.broadcast(part), "ref_key", "left_anti")
        .groupBy(F.col("ref_key").cast("string").alias("dangling_ref"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@query(
    "row_rule_limit",
    """
    SELECT CAST(o_orderkey AS VARCHAR) AS key, o_orderstatus
    FROM orders ORDER BY o_orderkey LIMIT 50 OFFSET 100
    """,
)
def q_row_rule_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: ROW rule 'offset,count' → order by pk limit offset,count
    (config/application.yml:42-60 semantics) via checks.rules.RowRule."""
    from opengauss_tools_datachecker_performance_spark.checks.rules import RowRule

    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    limited = RowRule.parse("100,50").apply(orders, ["o_orderkey"])
    return limited.select(
        F.col("o_orderkey").cast("string").alias("key"), "o_orderstatus"
    )


@query(
    "set_diff_keys",
    """
    SELECT CAST(o_orderkey AS VARCHAR) AS key, 'orders_only' AS side
    FROM orders WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
    UNION ALL
    SELECT DISTINCT CAST(l_orderkey AS VARCHAR), 'lineitem_only'
    FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
    """,
)
def q_set_diff_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2/U3: two-way anti-join set difference (onlyOnLeft/onlyOnRight,
    DataCheckRunnable.compareBucket:332-344)."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey")
    l = _t(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("o_orderkey"))
    left = o.join(l, "o_orderkey", "left_anti").select(
        F.col("o_orderkey").cast("string").alias("key"), F.lit("orders_only").alias("side")
    )
    right = l.distinct().join(o, "o_orderkey", "left_anti").select(
        F.col("o_orderkey").cast("string").alias("key"),
        F.lit("lineitem_only").alias("side"),
    )
    return left.unionByName(right)
