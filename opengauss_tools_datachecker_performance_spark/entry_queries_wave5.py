"""Driver-contract query catalog, wave 5.

Final §2 coverage rows:

* ``minmax_envelope`` — A5: min/max of the slice column + row count,
  the slice-boundary envelope every checkpoint negotiation starts
  from (reference CheckPoint.java:92,140-153; mapper
  MysqlMetaDataMapper.xml:76-82 ``select min(pk), max(pk)``).
* ``table_metadata_hash`` — A6: a digest of the table *structure* for
  cross-endpoint schema-drift detection (reference
  DataManipulationService.queryTableMetadataHash:289-305 hashes the
  column metadata; CheckTableStructureService compares lowercased
  column-name sets, :65-80). Here: portable md5-based hash over the
  comma-joined, sorted, lowercased column names — computed from the
  live DataFrame schema on the Spark side and from
  ``pragma_table_info`` on the DuckDB side, so the oracle genuinely
  cross-checks what each engine sees in the files.

Registered into entry_queries.QUERIES/ORACLES via the same decorator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.entry_queries import _t, query

_MINMAX_SQL = """
    SELECT CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_key,
           COUNT(*) AS n_rows
    FROM orders
"""


@query("minmax_envelope", _MINMAX_SQL)
def q_minmax_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: slice-column envelope (CheckPoint.java:140-153)."""
    orders = _t(spark, sf_dir, "orders")
    return orders.agg(
        F.min("o_orderkey").cast("long").alias("min_key"),
        F.max("o_orderkey").cast("long").alias("max_key"),
        F.count(F.lit(1)).alias("n_rows"),
    )


_TBLHASH_TABLES = ["orders", "lineitem", "customer", "part"]

_TBLHASH_SQL = "\nUNION ALL\n".join(
    f"""
    SELECT '{t}' AS table_name,
           ('0x' || substr(md5(string_agg(lower(name), ',' ORDER BY lower(name))), 1, 15))::BIGINT AS schema_hash,
           COUNT(*) AS n_cols
    FROM pragma_table_info('{t}')
    """
    for t in _TBLHASH_TABLES
)


@query("table_metadata_hash", _TBLHASH_SQL)
def q_table_metadata_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: structure digest per table, from the live parquet schema
    (DataManipulationService.queryTableMetadataHash:289-305). Both
    engines hash the sorted lowercased column-name list they read
    from the same files; a mismatch = the engines disagree about the
    table's structure — exactly the drift this check exists to catch.
    """
    rows = []
    for t in _TBLHASH_TABLES:
        names = sorted(f.name.lower() for f in _t(spark, sf_dir, t).schema.fields)
        rows.append((t, ",".join(names), len(names)))
    df = spark.createDataFrame(rows, "table_name string, joined string, n_cols int")
    return df.select(
        "table_name",
        F.conv(F.substring(F.md5("joined"), 1, 15), 16, 10)
        .cast("long")
        .alias("schema_hash"),
        F.col("n_cols").cast("long").alias("n_cols"),
    )
