"""Driver-contract query catalog, wave 8.

Oracle-checked entries for two operators that were previously
pytest-only:

* ``repair_dml_composite`` — the composite-PK batched DELETE builder
  (operators.repair.batch_delete_dml, the reference's
  BatchDeleteDmlBuilder.java / SelectDmlBuilder.java:108-137 row-value
  tuple form). The operator batches per shuffle partition (no driver
  collect); for oracle replay the input is pinned to one partition so
  DuckDB's ``row_number() OVER (ORDER BY key)`` reproduces the batch
  assignment exactly.
* ``skew_salted_agg`` — the explicit skew path (operators.skew.
  salted_repartition + two-level aggregation, SURVEY.md X1 / the north
  rule's "skew handled explicitly"): a deterministic content-derived
  salt spreads a hot grouping key across tasks, partial aggregates
  fold per (key, salt), and the merge level reproduces the plain
  groupBy exactly — which is precisely what the DuckDB oracle checks.
  Sums run in DECIMAL so the two-level fold is associative (a double
  sum would be order-dependent and could never hash-match).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from opengauss_tools_datachecker_performance_spark.entry_queries import _t, query

# ---------------------------------------------------------------------------
# composite-PK batched DELETE (dml builders, row-value-tuple IN form)
# ---------------------------------------------------------------------------

_BATCH = 25

_REPAIR_COMPOSITE_SQL = f"""
    WITH del AS (
      SELECT CAST(l_orderkey AS VARCHAR) || '_#_' || CAST(l_linenumber AS VARCHAR) AS key,
             '(' || CAST(l_orderkey AS VARCHAR) || ', '
                 || CAST(l_linenumber AS VARCHAR) || ')' AS member
      FROM lineitem WHERE l_orderkey % 97 = 0
    ),
    b AS (
      SELECT member,
             CAST(floor((row_number() OVER (ORDER BY key) - 1) / {_BATCH}) AS BIGINT) AS batch
      FROM del
    ),
    g AS (
      SELECT batch,
             string_agg(member, ', ' ORDER BY member) AS inlist,
             COUNT(*) AS n_keys
      FROM b GROUP BY batch
    )
    SELECT 'DELETE FROM lineitem WHERE (l_orderkey, l_linenumber) IN ('
           || inlist || ');' AS sql,
           CAST(n_keys AS BIGINT) AS n_keys
    FROM g
"""


@query("repair_dml_composite", _REPAIR_COMPOSITE_SQL)
def q_repair_dml_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite-PK batched DELETE (BatchDeleteDmlBuilder.java with
    SelectDmlBuilder.java:108-137's multi-column row-value tuples):
    every 97th order's lineitems are treated as delete diffs over the
    (l_orderkey, l_linenumber) joint PK. ``repartition(1)`` pins the
    batch layout for oracle replay — the operator itself batches per
    shuffle partition at scale."""
    from opengauss_tools_datachecker_performance_spark.functions.hashing import pk_key
    from opengauss_tools_datachecker_performance_spark.operators.repair import (
        batch_delete_dml,
    )

    li = _t(spark, sf_dir, "lineitem")
    diff = (
        li.filter(F.col("l_orderkey") % 97 == 0)
        .select(
            pk_key("l_orderkey", "l_linenumber").alias("key"),
            F.lit("delete").alias("diff_type"),
        )
        .repartition(1)
    )
    return batch_delete_dml(
        diff,
        key_col=["l_orderkey", "l_linenumber"],
        table_name="lineitem",
        batch_size=_BATCH,
        key_type=[T.LongType(), T.IntegerType()],
    ).select("sql", F.col("n_keys").cast("long").alias("n_keys"))


# ---------------------------------------------------------------------------
# explicit skew handling: salted repartition + two-level aggregation
# ---------------------------------------------------------------------------

_SKEW_SQL = """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(20,2))
                AS VARCHAR) AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag
"""


@query("skew_salted_agg", _SKEW_SQL)
def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level salted aggregation over a hot grouping key
    (operators.skew.salted_repartition / SURVEY.md X1): partial
    count/sum per (l_returnflag, salt), then merge per l_returnflag —
    bit-identical to the plain GROUP BY the oracle runs, proving the
    salt level is semantics-free. DECIMAL sums keep the two-level fold
    associative."""
    from opengauss_tools_datachecker_performance_spark.operators.skew import (
        salt_col,
        salted_repartition,
    )

    li = _t(spark, sf_dir, "lineitem")
    salt_from = ["l_orderkey", "l_linenumber"]
    salted = salted_repartition(
        li, "l_returnflag", n_partitions=8, salt_from=salt_from
    ).withColumn("_salt", salt_col(salt_from, 32))
    partial = salted.groupBy("l_returnflag", "_salt").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("_sq"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("_n").cast("long").alias("n_rows"),
        # decimal keeps the two-level fold associative; the STRING cast
        # is the driver-facing canonical form (hash-stable both engines)
        F.sum("_sq").cast("decimal(20,2)").cast("string").alias("sum_qty"),
    )
