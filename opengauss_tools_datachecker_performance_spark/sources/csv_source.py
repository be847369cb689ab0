"""CSV source with row locators (SURVEY.md S4).

Reference: CsvDataAccessService reads CSV slices listed by a companion
metadata dir, recording each row's index so diffs can point at the
exact CSV line (datachecker-extract/.../data/access/CsvDataAccessService.java:68-280).

Spark-native: schema-pinned csv read + a per-file row index. The
locator is (file, row_in_file) — stable under any partitioning
because it's derived before any shuffle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window


def read_csv_with_idx(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
) -> DataFrame:
    """CSV scan + (src_file, row_idx) locator columns.

    row_idx is the 0-based row number within its file in file order —
    the analogue of the reference's Difference.idx CSV locator. Uses a
    per-file window over monotonically_increasing_id (which is
    ordered within an input partition; files smaller than one split
    get exact CSV line numbers, the reference's granularity)."""
    df = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .csv(path)
        .withColumn("src_file", F.element_at(F.split(F.input_file_name(), "/"), -1))
        .withColumn("_mono", F.monotonically_increasing_id())
    )
    w = Window.partitionBy("src_file").orderBy("_mono")
    return df.withColumn("row_idx", F.row_number().over(w) - 1).drop("_mono")
