"""Debezium-style CDC change-event decoding + consolidation (S5).

Reference: the extract service polls a Debezium topic and consolidates
raw change events into per-table changed-PK logs (``SourceDataLog``)
that drive the incremental check —
datachecker-extract/.../debezium/DataConsolidationServiceImpl.java:1-247
(string-JSON payloads; Avro variant DebeziumAvroHandler.java), output
shape datachecker-common/.../entry/extract/SourceDataLog.java:33-62.

Spark-native shape: the event feed is any DataFrame (batch or
streaming — ``readStream.format('kafka')`` in production, file/memory
sources in tests) with a JSON string column holding the Debezium
envelope.  Decoding is a single JVM-side ``from_json`` with
``before``/``after`` as ``map<string,string>`` so ONE schema serves
every table (the reference likewise treats rows as name→string maps,
ResultSetHandler.java:83-101); consolidation is a distinct-aggregate,
not a driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Debezium envelope (payload part; ``schema`` wrapper assumed stripped
#: i.e. connectors run with value.converter.schemas.enable=false).
#: before/after as string maps: table-agnostic, like the reference's
#: Map<String,String> row model.
DEBEZIUM_PAYLOAD_SCHEMA = (
    "before map<string,string>, after map<string,string>, "
    "source struct<db:string,`table`:string>, op string, ts_ms long"
)


def decode_debezium(
    events: DataFrame, payload_col: str = "value", pk_field: str = "id"
) -> DataFrame:
    """JSON envelope → (table_name, op, key, ts_ms) change records.

    ``key`` comes from ``after`` for creates/updates and falls back to
    ``before`` for deletes (which carry no ``after`` image) — the same
    coalescing DataConsolidationServiceImpl applies when it extracts
    primary values per op type.
    """
    p = F.from_json(F.col(payload_col).cast("string"), DEBEZIUM_PAYLOAD_SCHEMA)
    return (
        events.select(
            p["source"]["table"].alias("table_name"),
            p["op"].alias("op"),
            F.coalesce(p["after"][pk_field], p["before"][pk_field]).alias("key"),
            p["ts_ms"].alias("ts_ms"),
        )
        .filter(F.col("table_name").isNotNull() & F.col("key").isNotNull())
    )


def consolidate_changed_keys(decoded: DataFrame) -> DataFrame:
    """Per-table changed-key log (SourceDataLog.java:33-62 semantics):
    distinct keys per table with the earliest offset/timestamp seen.
    The incremental checker semi-joins these keys against both tables
    (streaming.incremental.check_changed_keys)."""
    return (
        decoded.groupBy("table_name", "key")
        .agg(F.min("ts_ms").alias("begin_offset"), F.count(F.lit(1)).alias("n_events"))
    )
