"""Driver-contract query catalog, wave 6.

Remaining SURVEY.md §2 rows:

* ``debezium_decode`` — S5: Debezium CDC JSON envelopes decoded with a
  single JVM-side ``from_json`` and consolidated into per-table/op
  changed-key stats (DataConsolidationServiceImpl.java:1-247 →
  SourceDataLog.java:33-62).  Both engines build the SAME event feed
  deterministically from orders+customer rows, then each parses its
  own rendering — the decode/consolidate semantics are what's
  cross-checked.
* ``status_register`` — §2.9 stateful progress registry: per-slice
  status bitmask OR-fold (source=1 | sink=2 | checked=4), readiness
  when status==3, done when status==7
  (datachecker-check/.../cache/TableStatusRegister.java:1-488,
  SliceVo.setStatus:68-70).  Spark/DuckDB: ``bit_or`` aggregate — a
  plain shuffle agg, no driver-side registry needed.
* ``column_rule_projection`` — P1: COLUMN include rule with automatic
  primary-key retention (SelectSqlBuilder.java:54-120; rule semantics
  config/application.yml:61-100) applied through checks.rules.ColumnRule.
* ``topic_naming`` — F8: table-name → Kafka-topic sanitization
  (lowercase, non-alphanumeric → '_', letter prefix enforced, hash-mod
  partition suffix; TopicUtil.java:33-47,131-146) as pure column
  expressions over real catalog strings (part.p_type).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.entry_queries import _t, query
from opengauss_tools_datachecker_performance_spark.functions.hashing import (
    portable_hash64,
    portable_hash64_sql,
)

# ---------------------------------------------------------------------------
# S5: Debezium decode + consolidation
# ---------------------------------------------------------------------------

# op assignment: k % 5 == 0 -> delete (before image only),
# 1,2 -> update (both images), else create (after image only).
_DBZ_EVENTS_SQL = """
    SELECT json_object(
             'before', CASE WHEN k % 5 IN (0, 1, 2)
                            THEN json_object('id', CAST(k AS VARCHAR)) END,
             'after',  CASE WHEN k % 5 <> 0
                            THEN json_object('id', CAST(k AS VARCHAR)) END,
             'source', json_object('db', 'testdb', 'table', tbl),
             'op', CASE WHEN k % 5 = 0 THEN 'd'
                        WHEN k % 5 IN (1, 2) THEN 'u' ELSE 'c' END,
             'ts_ms', k % 1000
           ) AS value
    FROM (
      SELECT o_orderkey AS k, 'orders' AS tbl FROM orders WHERE o_orderkey % 11 = 3
      UNION ALL
      SELECT c_custkey AS k, 'customer' AS tbl FROM customer WHERE c_custkey % 13 = 5
    )
"""

_DBZ_SQL = f"""
    WITH ev AS ({_DBZ_EVENTS_SQL})
    SELECT json_extract_string(value, '$.source.table') AS table_name,
           json_extract_string(value, '$.op') AS op,
           COUNT(*) AS n_events,
           COUNT(DISTINCT COALESCE(json_extract_string(value, '$.after.id'),
                                   json_extract_string(value, '$.before.id'))) AS n_keys,
           MIN(CAST(COALESCE(json_extract_string(value, '$.after.id'),
                             json_extract_string(value, '$.before.id')) AS BIGINT)) AS min_key,
           MAX(CAST(COALESCE(json_extract_string(value, '$.after.id'),
                             json_extract_string(value, '$.before.id')) AS BIGINT)) AS max_key
    FROM ev
    GROUP BY 1, 2
"""


def _dbz_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Debezium-envelope feed built from orders+customer."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 3).select(
        F.col("o_orderkey").alias("k"), F.lit("orders").alias("tbl")
    )
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 13 == 5).select(
        F.col("c_custkey").alias("k"), F.lit("customer").alias("tbl")
    )
    ks = F.col("k").cast("string")
    img = F.create_map(F.lit("id"), ks)
    m5 = F.col("k") % 5
    return orders.unionByName(cust).select(
        F.to_json(
            F.struct(
                F.when(m5.isin(0, 1, 2), img).alias("before"),
                F.when(m5 != 0, img).alias("after"),
                F.struct(
                    F.lit("testdb").alias("db"), F.col("tbl").alias("table")
                ).alias("source"),
                F.when(m5 == 0, "d").when(m5.isin(1, 2), "u").otherwise("c").alias("op"),
                (F.col("k") % 1000).cast("long").alias("ts_ms"),
            )
        ).alias("value")
    )


@query("debezium_decode", _DBZ_SQL)
def q_debezium_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: decode CDC envelopes, consolidate per table/op
    (DataConsolidationServiceImpl.java:1-247)."""
    from opengauss_tools_datachecker_performance_spark.sources.debezium import (
        decode_debezium,
    )

    dec = decode_debezium(_dbz_events(spark, sf_dir), payload_col="value")
    key_l = F.col("key").cast("long")
    return dec.groupBy("table_name", "op").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("key").alias("n_keys"),
        F.min(key_l).alias("min_key"),
        F.max(key_l).alias("max_key"),
    )


# ---------------------------------------------------------------------------
# S5b: Debezium AVRO-encoded envelopes (union-wrapped JSON encoding,
# DebeziumAvroHandler.java; fixture shape datachecker-extract/src/test/
# resources/data/debezium_avro/one_record.json)
# ---------------------------------------------------------------------------

# Avro JSON encoding: unions render as {"<branch>": value}. The row
# image is keyed by the record fullname "<server>.<db>.<table>.Value";
# source.table and ts_ms are union-wrapped. Every 7th event is a
# transaction marker (no op/table) that the decoder must drop.
_DBZ_AVRO_EVENTS_SQL = """
    SELECT CASE WHEN k % 7 = 4 THEN json_object('status', 'END', 'id', CAST(k AS VARCHAR))
           ELSE json_object(
             'before', CASE WHEN k % 5 IN (0, 1, 2)
                            THEN json_object('srv.testdb.' || tbl || '.Value',
                                             json_object('id', CAST(k AS VARCHAR))) END,
             'after',  CASE WHEN k % 5 <> 0
                            THEN json_object('srv.testdb.' || tbl || '.Value',
                                             json_object('id', CAST(k AS VARCHAR))) END,
             'source', json_object('db', 'testdb',
                                   'table', json_object('string', tbl),
                                   'ts_ms', k % 997),
             'op', CASE WHEN k % 5 = 0 THEN 'd'
                        WHEN k % 5 IN (1, 2) THEN 'u' ELSE 'c' END,
             'ts_ms', json_object('long', k % 1000)
           ) END AS value
    FROM (
      SELECT o_orderkey AS k, 'orders' AS tbl FROM orders WHERE o_orderkey % 11 = 3
      UNION ALL
      SELECT c_custkey AS k, 'customer' AS tbl FROM customer WHERE c_custkey % 13 = 5
    )
"""

_DBZ_AVRO_KEY_SQL = """COALESCE(
    json_extract_string(value, '$.after."srv.testdb.orders.Value".id'),
    json_extract_string(value, '$.after."srv.testdb.customer.Value".id'),
    json_extract_string(value, '$.before."srv.testdb.orders.Value".id'),
    json_extract_string(value, '$.before."srv.testdb.customer.Value".id'))"""

_DBZ_AVRO_SQL = f"""
    WITH ev AS ({_DBZ_AVRO_EVENTS_SQL})
    SELECT json_extract_string(value, '$.source.table.string') AS table_name,
           json_extract_string(value, '$.op') AS op,
           COUNT(*) AS n_events,
           COUNT(DISTINCT {_DBZ_AVRO_KEY_SQL}) AS n_keys,
           MIN(CAST({_DBZ_AVRO_KEY_SQL} AS BIGINT)) AS min_key,
           MAX(CAST({_DBZ_AVRO_KEY_SQL} AS BIGINT)) AS max_key
    FROM ev
    WHERE json_extract_string(value, '$.op') IS NOT NULL
      AND json_extract_string(value, '$.source.table.string') IS NOT NULL
    GROUP BY 1, 2
"""


def _dbz_avro_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Avro-JSON-encoded envelope feed (union wrappers),
    with transaction markers interleaved every 7th event."""
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 3).select(
        F.col("o_orderkey").alias("k"), F.lit("orders").alias("tbl")
    )
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 13 == 5).select(
        F.col("c_custkey").alias("k"), F.lit("customer").alias("tbl")
    )
    ks = F.col("k").cast("string")
    fullname = F.concat(F.lit("srv.testdb."), F.col("tbl"), F.lit(".Value"))
    img = F.create_map(fullname, F.create_map(F.lit("id"), ks))
    m5 = F.col("k") % 5
    envelope = F.to_json(
        F.struct(
            F.when(m5.isin(0, 1, 2), img).alias("before"),
            F.when(m5 != 0, img).alias("after"),
            F.struct(
                F.lit("testdb").alias("db"),
                F.create_map(F.lit("string"), F.col("tbl")).alias("table"),
                (F.col("k") % 997).cast("long").alias("ts_ms"),
            ).alias("source"),
            F.when(m5 == 0, "d").when(m5.isin(1, 2), "u").otherwise("c").alias("op"),
            F.create_map(F.lit("long"), (F.col("k") % 1000).cast("long")).alias(
                "ts_ms"
            ),
        )
    )
    txn = F.to_json(
        F.struct(F.lit("END").alias("status"), ks.alias("id"))
    )
    return orders.unionByName(cust).select(
        F.when(F.col("k") % 7 == 4, txn).otherwise(envelope).alias("value")
    )


@query("debezium_avro_decode", _DBZ_AVRO_SQL)
def q_debezium_avro_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5b: decode AVRO-encoded CDC envelopes (union-wrapped JSON
    encoding — DebeziumAvroHandler.java:70-115), dropping transaction
    markers, consolidating per table/op. Full encode→decode round trip
    on both engines."""
    from opengauss_tools_datachecker_performance_spark.sources.debezium import (
        decode_debezium_avro_json,
    )

    dec = decode_debezium_avro_json(
        _dbz_avro_events(spark, sf_dir), payload_col="value"
    )
    key_l = F.col("key").cast("long")
    return dec.groupBy("table_name", "op").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("key").alias("n_keys"),
        F.min(key_l).alias("min_key"),
        F.max(key_l).alias("max_key"),
    )


# S5c: BINARY Avro envelopes — encode each change event to real Avro
# wire bytes (zigzag varints, union branch indexes, block-coded maps;
# functions.avro_codec), then decode through the engine surface.
# The oracle states the ground truth directly off the base tables: the
# encode∘decode round trip plus envelope semantics (marker drop,
# before-fallback for deletes) must reproduce exactly the per-table/op
# consolidation that never left SQL.
_DBZ_AVRO_BIN_SQL = """
    WITH ev AS (
      SELECT k, tbl,
             CASE WHEN k % 5 = 0 THEN 'd'
                  WHEN k % 5 IN (1, 2) THEN 'u' ELSE 'c' END AS op
      FROM (
        SELECT o_orderkey AS k, 'orders' AS tbl FROM orders WHERE o_orderkey % 11 = 3
        UNION ALL
        SELECT c_custkey AS k, 'customer' AS tbl FROM customer WHERE c_custkey % 13 = 5
      )
      WHERE k % 7 <> 4
    )
    SELECT tbl AS table_name, op, COUNT(*) AS n_events,
           COUNT(DISTINCT k) AS n_keys,
           MIN(k) AS min_key, MAX(k) AS max_key
    FROM ev GROUP BY 1, 2
"""


@query("debezium_avro_binary", _DBZ_AVRO_BIN_SQL)
def q_debezium_avro_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5c: binary-Avro CDC envelopes end to end — deterministic event
    rows → Avro wire bytes (encode_debezium_avro_binary) → binary
    decode (decode_debezium_avro_binary, the self-contained codec path
    since the sandbox has no spark-avro jar) → per-table/op
    consolidation. Every 7th event is a transaction marker (no
    table/key) the decoder must drop — DebeziumAvroHandler.java:80-99."""
    from opengauss_tools_datachecker_performance_spark.sources.debezium import (
        decode_debezium_avro_binary,
        encode_debezium_avro_binary,
    )

    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 11 == 3).select(
        F.col("o_orderkey").alias("k"), F.lit("orders").alias("tbl")
    )
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_custkey") % 13 == 5).select(
        F.col("c_custkey").alias("k"), F.lit("customer").alias("tbl")
    )
    m5 = F.col("k") % 5
    marker = F.col("k") % 7 == 4
    rows = orders.unionByName(cust).select(
        F.when(~marker, F.col("tbl")).alias("table_name"),
        F.when(~marker, F.when(m5 == 0, "d").when(m5.isin(1, 2), "u").otherwise("c"))
        .alias("op"),
        F.when(~marker, F.col("k").cast("string")).alias("key"),
        (F.col("k") % 997).cast("long").alias("ts_ms"),
    )
    dec = decode_debezium_avro_binary(encode_debezium_avro_binary(rows))
    key_l = F.col("key").cast("long")
    return dec.groupBy("table_name", "op").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("key").alias("n_keys"),
        F.min(key_l).alias("min_key"),
        F.max(key_l).alias("max_key"),
    )


# ---------------------------------------------------------------------------
# §2.9: slice status bitmask register
# ---------------------------------------------------------------------------

# slice universe: o_orderkey % 40; slice 7 never gets a sink report,
# slices % 3 == 0 (except 7... which isn't %3==0 anyway) got checked.
_STATUS_SQL = """
    WITH ev AS (
      SELECT o_orderkey % 40 AS slice_no, 1 AS st FROM orders
      UNION ALL
      SELECT o_orderkey % 40, 2 FROM orders WHERE o_orderkey % 40 <> 7
      UNION ALL
      SELECT o_orderkey % 40, 4 FROM orders
      WHERE o_orderkey % 40 <> 7 AND (o_orderkey % 40) % 3 = 0
    )
    SELECT slice_no,
           BIT_OR(st) AS status,
           CAST(BIT_OR(st) = 3 AS INT) AS ready_for_check,
           CAST(BIT_OR(st) = 7 AS INT) AS done
    FROM ev GROUP BY slice_no
"""


@query("status_register", _STATUS_SQL)
def q_status_register(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9/X12: per-slice status bitmask OR-fold; ready at 3, done at 7
    (TableStatusRegister.java:1-488). The reference keeps this registry
    in driver-side maps; at 10^12-doc scale it is a shuffle agg."""
    orders = _t(spark, sf_dir, "orders")
    slice_no = (F.col("o_orderkey") % 40).alias("slice_no")
    src = orders.select(slice_no, F.lit(1).alias("st"))
    snk = orders.filter(F.col("o_orderkey") % 40 != 7).select(
        slice_no, F.lit(2).alias("st")
    )
    chk = orders.filter(
        (F.col("o_orderkey") % 40 != 7) & ((F.col("o_orderkey") % 40) % 3 == 0)
    ).select(slice_no, F.lit(4).alias("st"))
    ev = src.unionByName(snk).unionByName(chk)
    st = F.bit_or("st").alias("status")
    return ev.groupBy("slice_no").agg(
        st,
        (F.bit_or("st") == 3).cast("int").alias("ready_for_check"),
        (F.bit_or("st") == 7).cast("int").alias("done"),
    )


# ---------------------------------------------------------------------------
# P1: COLUMN rule projection with PK retention
# ---------------------------------------------------------------------------

_COLRULE_SQL = """
    SELECT l_orderkey, l_linenumber, l_returnflag, l_linestatus,
           strftime(l_shipdate, '%Y-%m-%d') AS l_shipdate
    FROM lineitem WHERE l_orderkey % 199 = 0
"""


@query("column_rule_projection", _COLRULE_SQL)
def q_column_rule_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: include-rule projection; PK columns auto-retained even when
    absent from the include list (SelectSqlBuilder.java:54-120).
    The projected timestamp is rendered as a date string so every
    output column is driver-hash-stable (TZ-independent: timestamp_ntz
    formatted wall-clock on both engines)."""
    from opengauss_tools_datachecker_performance_spark.checks.rules import ColumnRule

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 199 == 0)
    rule = ColumnRule(include=["l_returnflag", "l_linestatus", "l_shipdate"])
    out = rule.apply(li, pk_cols=["l_orderkey", "l_linenumber"])
    return out.withColumn(
        "l_shipdate", F.date_format("l_shipdate", "yyyy-MM-dd")
    )


# ---------------------------------------------------------------------------
# F8: table-name → topic-name sanitization
# ---------------------------------------------------------------------------

_TOPIC_SQL = f"""
    WITH names AS (SELECT DISTINCT p_type AS raw_name FROM part)
    SELECT raw_name,
           'CHECK_p1_S_' ||
           CASE WHEN regexp_matches(lower(raw_name), '^[a-z]')
                THEN regexp_replace(lower(raw_name), '[^a-z0-9_]', '_', 'g')
                ELSE 't' || regexp_replace(lower(raw_name), '[^a-z0-9_]', '_', 'g') END ||
           '_' || CAST({portable_hash64_sql("raw_name")} % 4 AS VARCHAR) AS topic_name
    FROM names
"""


@query("topic_naming", _TOPIC_SQL)
def q_topic_naming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: CHECK_<process>_<endpoint>_<sanitized>_<ptn> topic naming
    (TopicUtil.java:33-47,131-146): lowercase, non-[a-z0-9_] → '_',
    non-letter-initial names get a 't' prefix, partition = hash mod 4."""
    names = _t(spark, sf_dir, "part").select(
        F.col("p_type").alias("raw_name")
    ).distinct()
    low = F.lower(F.col("raw_name"))
    san = F.regexp_replace(low, "[^a-z0-9_]", "_")
    san = F.when(low.rlike("^[a-z]"), san).otherwise(F.concat(F.lit("t"), san))
    ptn = F.pmod(portable_hash64(F.col("raw_name")), F.lit(4)).cast("string")
    return names.select(
        "raw_name",
        F.concat(F.lit("CHECK_p1_S_"), san, F.lit("_"), ptn).alias("topic_name"),
    )


# ---------------------------------------------------------------------------
# U3: miss-table detection (catalog name set diff between endpoints)
# ---------------------------------------------------------------------------

# endpoint catalogs derived deterministically from nation: the source
# endpoint "has" nations of regions 0-3, the sink 1-4 → both miss lists.
_MISS_SQL = """
    WITH src AS (SELECT n_name AS t FROM nation WHERE n_regionkey <= 3),
         snk AS (SELECT n_name AS t FROM nation WHERE n_regionkey >= 1)
    SELECT t AS table_name, 'sink' AS missing_at FROM src
    WHERE t NOT IN (SELECT t FROM snk)
    UNION ALL
    SELECT t, 'source' FROM snk WHERE t NOT IN (SELECT t FROM src)
"""


@query("miss_table_detection", _MISS_SQL)
def q_miss_table_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: table-name set diff between endpoint catalogs
    (CheckTableStructureService.java:119-133,
    EndpointMetaDataManager.getMissTableList) — two anti-joins."""
    nation = _t(spark, sf_dir, "nation")
    src = nation.filter(F.col("n_regionkey") <= 3).select(F.col("n_name").alias("t"))
    snk = nation.filter(F.col("n_regionkey") >= 1).select(F.col("n_name").alias("t"))
    miss_sink = src.join(snk, "t", "left_anti").select(
        F.col("t").alias("table_name"), F.lit("sink").alias("missing_at")
    )
    miss_src = snk.join(src, "t", "left_anti").select(
        F.col("t").alias("table_name"), F.lit("source").alias("missing_at")
    )
    return miss_sink.unionByName(miss_src)


# ---------------------------------------------------------------------------
# §2.9 event-time windowed rate (watermark builder, batch twin)
# ---------------------------------------------------------------------------

_WINDOW_RATE_SQL = """
    SELECT strftime(time_bucket(INTERVAL 30 MINUTE, ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n_events,
           CAST(CAST(round(COUNT(*) / 1800.0, 6) AS DECIMAL(12,6)) AS VARCHAR) AS events_per_sec,
           CAST(CAST(round(SUM(value), 4) AS DECIMAL(18,4)) AS VARCHAR) AS sum_value
    FROM events GROUP BY 1
"""


@query("watermark_window_rate", _WINDOW_RATE_SQL)
def q_watermark_window_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 event-time windowed change rate
    (streaming.windows.windowed_change_rate): tumbling 30-min windows,
    count + events/sec + value rollup.  The SAME builder runs under
    Structured Streaming with the watermark active (late-data drop +
    bounded state + append-mode emit — tests/test_streaming.py); in
    batch mode Spark ignores ``withWatermark`` so the oracle checks
    the shared aggregation semantics."""
    from opengauss_tools_datachecker_performance_spark.streaming.windows import (
        windowed_change_rate,
    )

    return windowed_change_rate(
        _t(spark, sf_dir, "events"),
        time_col="ts",
        window="30 minutes",
        watermark="10 minutes",
        value_col="value",
    )
