"""Repair-DML generation from a diff result (SURVEY.md S8 tail).

Reference: after a failed check, diff keys are re-queried and rendered
into per-table repair SQL files by the DML builder family
(datachecker-extract/.../dml/{Insert,Replace,Update,Delete,BatchDelete}DmlBuilder.java,
driven from datachecker-check/.../modules/report/SliceCheckResultManager.java:370-449):

* ``insert`` diffs (source-only keys)  → INSERT statements with the
  source row's values;
* ``update`` diffs (vHash mismatch)    → UPDATE ... SET <non-key cols>
  from the source row (the reference uses REPLACE on MySQL — same
  effect);
* ``delete`` diffs (sink-only keys)    → DELETE by primary key.

Spark-native: one left join of the diff keys against the source
digest-input rows (delete keys join to nothing and need nothing), then
pure string expressions render the statements — fully vectorized,
emitted as a ``(key, diff_type, sql)`` DataFrame that the report sink
writes per table. Value literals are rendered deterministically
(strings quoted + escaped, numerics via pinned-scale decimal casts,
timestamps via date_format) so the output is byte-stable across
engines and runs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def sql_literal(col: Column, dtype: T.DataType) -> Column:
    """Render a column value as a SQL literal string.

    NULL → 'NULL'; strings quoted with '' doubling; timestamps as
    'yyyy-MM-dd HH:mm:ss'; fractional numerics via DECIMAL(20,6) cast
    (scale-pinned like the canonicalization layer, SURVEY §1.2 F6)."""
    if isinstance(dtype, T.StringType):
        body = F.concat(F.lit("'"), F.regexp_replace(col, "'", "''"), F.lit("'"))
    elif isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        fmt = "yyyy-MM-dd" if isinstance(dtype, T.DateType) else "yyyy-MM-dd HH:mm:ss"
        body = F.concat(F.lit("'"), F.date_format(col, fmt), F.lit("'"))
    elif isinstance(dtype, (T.DoubleType, T.FloatType, T.DecimalType)):
        body = col.cast("decimal(20,6)").cast("string")
    else:
        body = col.cast("string")
    return F.coalesce(body, F.lit("NULL"))


def repair_dml(
    diff: DataFrame,
    source: DataFrame,
    key_cols: list[str],
    table_name: str,
) -> DataFrame:
    """(key, diff_type) diff + source rows → (key, diff_type, sql).

    ``source`` must contain ``key_cols``; all its other columns are
    treated as value columns. The join is keyed on the same composite
    key string the diff used (functions.hashing.pk_key)."""
    from opengauss_tools_datachecker_performance_spark.functions.hashing import pk_key

    fields = {f.name: f.dataType for f in source.schema.fields}
    value_cols = [c for c in source.columns if c not in key_cols]
    all_cols = list(key_cols) + value_cols

    src = source.select(pk_key(*key_cols).alias("key"), *all_cols)
    j = diff.join(src, "key", "left")

    values_list = F.concat_ws(
        ", ", *[sql_literal(F.col(c), fields[c]) for c in all_cols]
    )
    set_list = F.concat_ws(
        ", ",
        *[
            F.concat(F.lit(f"{c} = "), sql_literal(F.col(c), fields[c]))
            for c in value_cols
        ],
    )
    # WHERE clause from the key columns; for delete diffs the source row
    # is absent, so reconstruct key values by splitting the key string
    # (inverse of pk_key's '_#_' join).
    key_parts = F.split(F.col("key"), "_#_")
    where = F.concat_ws(
        " AND ",
        *[
            F.concat(
                F.lit(f"{c} = "),
                sql_literal(F.element_at(key_parts, i + 1), fields[c])
                if isinstance(
                    fields[c],
                    (T.StringType, T.TimestampType, T.TimestampNTZType, T.DateType),
                )
                else F.element_at(key_parts, i + 1),
            )
            for i, c in enumerate(key_cols)
        ],
    )
    insert_sql = F.concat(
        F.lit(f"INSERT INTO {table_name} ({', '.join(all_cols)}) VALUES ("),
        values_list,
        F.lit(");"),
    )
    update_sql = F.concat(
        F.lit(f"UPDATE {table_name} SET "), set_list, F.lit(" WHERE "), where, F.lit(";")
    )
    delete_sql = F.concat(F.lit(f"DELETE FROM {table_name} WHERE "), where, F.lit(";"))
    return j.select(
        "key",
        "diff_type",
        F.when(F.col("diff_type") == "insert", insert_sql)
        .when(F.col("diff_type") == "update", update_sql)
        .otherwise(delete_sql)
        .alias("sql"),
    )


def repair_dml_replace(
    diff: DataFrame,
    source: DataFrame,
    key_cols: list[str],
    table_name: str,
) -> DataFrame:
    """MySQL-dialect variant: insert AND update diffs render as
    ``REPLACE INTO`` (the reference's ReplaceDmlBuilder.java — upsert
    semantics make the two cases one statement); deletes unchanged."""
    base = repair_dml(diff, source, key_cols, table_name)
    from opengauss_tools_datachecker_performance_spark.functions.hashing import pk_key

    fields = {f.name: f.dataType for f in source.schema.fields}
    all_cols = list(key_cols) + [c for c in source.columns if c not in key_cols]
    src = source.select(pk_key(*key_cols).alias("key"), *all_cols)
    values_list = F.concat_ws(
        ", ", *[sql_literal(F.col(c), fields[c]) for c in all_cols]
    )
    replaced = (
        diff.filter(F.col("diff_type") != "delete")
        .join(src, "key", "left")
        .select(
            "key",
            "diff_type",
            F.concat(
                F.lit(f"REPLACE INTO {table_name} ({', '.join(all_cols)}) VALUES ("),
                values_list,
                F.lit(");"),
            ).alias("sql"),
        )
    )
    return replaced.unionByName(base.filter(F.col("diff_type") == "delete"))


def _normalize_keys(
    key_cols: "str | list[str]", key_types
) -> "tuple[list[str], list[T.DataType]]":
    cols = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if key_types is None:
        types = [T.StringType()] * len(cols)
    elif isinstance(key_types, T.DataType):
        # a single DataType means "every key column has this type"
        types = [key_types] * len(cols)
    else:
        types = list(key_types)
    if len(types) != len(cols):
        raise ValueError(
            f"key_types has {len(types)} entries for {len(cols)} key columns"
        )
    return cols, types


def _key_in_literal(key_cols: list[str], key_types: list[T.DataType]) -> Column:
    """Render one composite ``key`` string ('v1_#_v2', pk_key's join)
    as its IN-list member: a bare/quoted literal for a single PK, a
    row-value tuple ``(v1, v2)`` for composite PKs — the batched
    multi-column equality predicate of the reference's
    SelectDmlBuilder.java:108-137 / BatchDeleteDmlBuilder.java."""
    parts = F.split(F.col("key"), "_#_")

    def render(v: Column, dtype: T.DataType) -> Column:
        if isinstance(
            dtype, (T.StringType, T.TimestampType, T.TimestampNTZType, T.DateType)
        ):
            return sql_literal(v, T.StringType())
        return v

    def lit_at(i: int, dtype: T.DataType) -> Column:
        return render(F.element_at(parts, i + 1), dtype)

    if len(key_cols) == 1:
        # single PK: the composite key IS the value — never split it,
        # or a legitimate key containing '_#_' would be truncated
        return render(F.col("key"), key_types[0])
    return F.concat(
        F.lit("("),
        F.concat_ws(", ", *[lit_at(i, t) for i, t in enumerate(key_types)]),
        F.lit(")"),
    )


def _key_in_lhs(key_cols: list[str]) -> str:
    """Left-hand side of the IN predicate: ``pk`` or ``(a, b)``."""
    return key_cols[0] if len(key_cols) == 1 else f"({', '.join(key_cols)})"


def _batched_key_lists(
    keyed: DataFrame, batch_size: int, member: Column
) -> DataFrame:
    """(key) rows → (_in, n_keys): comma-joined IN-list members
    (``member`` renders one key) of at most ``batch_size`` keys,
    batched per shuffle partition (``row_number`` within a
    hash-partitioned window) — no global sort, no driver collect; at
    scale every executor renders its own statements."""
    from pyspark.sql.window import Window

    # Pin the input partition id as a COLUMN before windowing:
    # spark_partition_id() is evaluated where it appears, so using it
    # both as the window key and in the post-window projection would
    # read two DIFFERENT ids (pre- vs post-exchange) — distinct window
    # groups that colocate after the exchange would then merge into one
    # over-sized batch.
    pinned = keyed.withColumn("_pid", F.spark_partition_id())
    w = Window.partitionBy("_pid").orderBy("key")
    return (
        pinned.withColumn(
            "_batch",
            F.concat_ws(
                "|",
                F.col("_pid"),
                F.floor((F.row_number().over(w) - 1) / batch_size),
            ),
        )
        .groupBy("_batch")
        .agg(
            F.concat_ws(", ", F.sort_array(F.collect_list(member))).alias("_in"),
            F.count(F.lit(1)).alias("n_keys"),
        )
    )


def batch_delete_dml(
    diff: DataFrame,
    key_col: "str | list[str]",
    table_name: str,
    batch_size: int = 100,
    key_type=None,
) -> DataFrame:
    """Batched deletes (the reference's BatchDeleteDmlBuilder.java):
    ``DELETE FROM t WHERE pk IN (...)`` for a single PK, or the
    row-value-tuple form ``DELETE FROM t WHERE (a, b) IN ((..), (..))``
    for composite PKs (keys are pk_key's '_#_'-joined strings).
    ``batch_size`` keys per statement; batches form per shuffle
    partition — no global sort, no driver collect."""
    key_cols, key_types = _normalize_keys(key_col, key_type)
    deletes = diff.filter(F.col("diff_type") == "delete").select("key")
    batched = _batched_key_lists(
        deletes, batch_size, _key_in_literal(key_cols, key_types)
    )
    return batched.select(
        F.concat(
            F.lit(f"DELETE FROM {table_name} WHERE {_key_in_lhs(key_cols)} IN ("),
            F.col("_in"),
            F.lit(");"),
        ).alias("sql"),
        "n_keys",
    )


def doc_repair_statements(
    diff: DataFrame,
    source_table: str,
    sink_table: str,
    key_col: "str | list[str]" = "doc_id",
    batch_size: int = 100,
    key_type=None,
) -> DataFrame:
    """Repair DML for the interleaved-doc table → (sql, n_keys, kind).

    The reference renders per-row INSERT/UPDATE/DELETE from re-queried
    row values (SliceCheckResultManager.java:370-449); a doc row is an
    array of spans, so value-literal DML is the wrong shape. The
    Spark/Iceberg-native repair keeps the VALUES inside the engine:

    * insert/update diffs → batched ``MERGE INTO sink USING (SELECT
      ... FROM source WHERE key IN (...))`` — upsert whole docs from
      the authoritative side (the engine's REPLACE analogue);
    * delete diffs → batched ``DELETE FROM sink WHERE key IN (...)``.

    Statements render per shuffle partition (no driver collect); each
    touches ≤ batch_size keys so a repair executor never builds an
    unbounded IN list. Composite PKs (``key_col`` a list) render the
    row-value-tuple IN form and a conjunctive MERGE ON clause.
    """
    key_cols, key_types = _normalize_keys(key_col, key_type)
    on_clause = " AND ".join(f"t.{c} = s.{c}" for c in key_cols)
    upserts = _batched_key_lists(
        diff.filter(F.col("diff_type").isin(["insert", "update"])).select("key"),
        batch_size,
        _key_in_literal(key_cols, key_types),
    ).select(
        F.concat(
            F.lit(
                f"MERGE INTO {sink_table} t USING (SELECT * FROM {source_table} "
                f"WHERE {_key_in_lhs(key_cols)} IN ("
            ),
            F.col("_in"),
            F.lit(
                f")) s ON {on_clause} "
                "WHEN MATCHED THEN UPDATE SET * "
                "WHEN NOT MATCHED THEN INSERT *;"
            ),
        ).alias("sql"),
        "n_keys",
        F.lit("upsert").alias("kind"),
    )
    deletes = batch_delete_dml(
        diff, key_cols, sink_table, batch_size, key_types
    ).select("sql", "n_keys", F.lit("delete").alias("kind"))
    return upserts.unionByName(deletes)
