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


def read_csv_with_idx(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = True,
) -> DataFrame:
    """CSV scan + (src_file, row_idx) locator columns.

    row_idx is the 0-based row number within its file in file order —
    the analogue of the reference's Difference.idx CSV locator.
    monotonically_increasing_id orders rows within each input split
    (its high 31 bits are the split's partition index), so files
    smaller than one split get exact CSV line numbers — the
    reference's granularity; a file Spark splits further is indexed
    in (split, row-in-split) order.

    Scale-safe ranking: a per-file window would gather a multi-split
    file (one 1 TB CSV) into a single task. Instead, rows rank inside
    (src_file, split) — groups bounded by one input split — and each
    split's starting offset within its file comes from a per-split
    count pass cumulated on the driver (#splits rows, deterministic:
    the scan's split layout is a pure function of the file listing
    and size confs) and joined back as a broadcast."""
    from pyspark.sql.window import Window

    df = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .csv(path)
        .withColumn("src_file", F.element_at(F.split(F.input_file_name(), "/"), -1))
        .withColumn("_mono", F.monotonically_increasing_id())
        .withColumn("_split", F.shiftrightunsigned("_mono", 33).cast("long"))
    )
    counts = (
        df.groupBy("src_file", "_split").agg(F.count(F.lit(1)).alias("_n")).collect()
    )
    offsets = []
    by_file: dict[str, int] = {}
    for r in sorted(counts, key=lambda r: (r["src_file"], r["_split"])):
        cum = by_file.get(r["src_file"], 0)
        offsets.append((r["src_file"], r["_split"], cum))
        by_file[r["src_file"]] = cum + r["_n"]
    if not offsets:
        offsets = [("", -1, 0)]
    off = df.sparkSession.createDataFrame(
        offsets, "src_file string, _split long, _off long"
    )
    w = Window.partitionBy("src_file", "_split").orderBy("_mono")
    return (
        df.withColumn("_lrn", F.row_number().over(w))
        .join(F.broadcast(off), ["src_file", "_split"])
        .withColumn("row_idx", (F.col("_lrn") + F.col("_off") - 1).cast("int"))
        .select(
            *[c for c in df.columns if c not in ("_mono", "_split")], "row_idx"
        )
    )


#: suffix marking a slice file as checked/consumed — the reference's
#: CSV-dir handoff protocol (FileUtils.renameTo appends ".check",
#: datachecker-common/.../FileUtils.java:194-203; renamed on check
#: completion by SliceCheckResultManager.java:197-206 and on skip by
#: SliceDispatcher.java:183-185)
CONSUMED_SUFFIX = ".check"


def list_unconsumed_csv(spark: SparkSession, dir_path: str) -> list[str]:
    """Names of .csv slice files in ``dir_path`` not yet marked
    consumed — the re-dispatch set after a restart.  Hadoop-FS listing
    so remote (hdfs://, s3a://) slice dirs behave like local ones."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(dir_path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return []
    out = []
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if name.endswith(".csv") and not name.endswith(CONSUMED_SUFFIX):
            out.append(name)
    return sorted(out)


def mark_csv_consumed(
    spark: SparkSession, dir_path: str, file_name: str
) -> bool:
    """Rename ``file_name`` → ``file_name + '.check'`` in ``dir_path``
    (idempotent: already-consumed or missing files return False, the
    reference's renameTo contract)."""
    jvm = spark._jvm
    src = jvm.org.apache.hadoop.fs.Path(dir_path, file_name)
    dst = jvm.org.apache.hadoop.fs.Path(dir_path, file_name + CONSUMED_SUFFIX)
    fs = src.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(src)) and bool(fs.rename(src, dst))
