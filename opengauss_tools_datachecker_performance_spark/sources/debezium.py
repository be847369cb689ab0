"""Debezium-style CDC change-event decoding + consolidation (S5).

Reference: the extract service polls a Debezium topic and consolidates
raw change events into per-table changed-PK logs (``SourceDataLog``)
that drive the incremental check —
datachecker-extract/.../debezium/DataConsolidationServiceImpl.java:1-247
(string-JSON payloads: DebeziumStringHandler; Avro payloads:
DebeziumAvroHandler.java — both covered here), output shape
datachecker-common/.../entry/extract/SourceDataLog.java:33-62.

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

import json

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


#: Avro JSON-encoding of the same envelope (DebeziumAvroHandler.java:
#: 70-115; fixture shape datachecker-extract/src/test/resources/data/
#: debezium_avro/one_record.json): Avro unions render as single-entry
#: objects keyed by the branch type — ``after`` becomes
#: {"<server>.<db>.<table>.Value": {..row..}}, ``source.table``
#: becomes {"string": "t"}, ``ts_ms`` becomes {"long": 123}. Parsing
#: the union wrappers as maps keeps ONE schema for every table.
DEBEZIUM_AVRO_JSON_SCHEMA = (
    "before map<string,map<string,string>>, "
    "after map<string,map<string,string>>, "
    "source struct<db:string,`table`:map<string,string>,ts_ms:long>, "
    "op string, ts_ms map<string,bigint>"
)


def decode_debezium_avro_json(
    events: DataFrame, payload_col: str = "value", pk_field: str = "id"
) -> DataFrame:
    """Avro JSON-encoded envelope → (table_name, op, key, ts_ms).

    Mirrors DebeziumAvroHandler.handler: the row image is ``after``
    falling back to ``before`` (deletes), the table comes from
    ``source``, and messages without a table or an op (transaction
    markers, DDL) are dropped — all as one JVM-side ``from_json`` +
    map lookups; the union wrapper is unwrapped with ``map_values``
    (a record union has exactly one branch present)."""
    p = F.from_json(F.col(payload_col).cast("string"), DEBEZIUM_AVRO_JSON_SCHEMA)
    row = F.coalesce(
        F.element_at(F.map_values(p["after"]), 1),
        F.element_at(F.map_values(p["before"]), 1),
    )
    return (
        events.select(
            p["source"]["table"]["string"].alias("table_name"),
            p["op"].alias("op"),
            row[pk_field].alias("key"),
            p["ts_ms"]["long"].alias("ts_ms"),
        )
        .filter(
            F.col("table_name").isNotNull()
            & F.col("op").isNotNull()
            & F.col("key").isNotNull()
        )
    )


#: Binary-Avro envelope schema (parsed-JSON form for the pure-Python
#: codec): the row image as map<string,string> — the reference's
#: Map<String,String> row model (DebeziumDataBean.java; handler puts
#: after-falling-back-to-before into it) — with union-wrapped
#: nullables exactly like the fixture record
#: (datachecker-extract/src/test/resources/data/debezium_avro/
#: one_record.json: before/after/table/ts_ms are Avro unions).
DEBEZIUM_AVRO_BINARY_SCHEMA: dict = {
    "type": "record",
    "name": "Envelope",
    "fields": [
        {"name": "before", "type": ["null", {"type": "map", "values": "string"}]},
        {"name": "after", "type": ["null", {"type": "map", "values": "string"}]},
        {
            "name": "source",
            "type": {
                "type": "record",
                "name": "Source",
                "fields": [
                    {"name": "db", "type": "string"},
                    {"name": "table", "type": ["null", "string"]},
                    {"name": "ts_ms", "type": "long"},
                ],
            },
        },
        {"name": "op", "type": ["null", "string"]},
        {"name": "ts_ms", "type": ["null", "long"]},
    ],
}

_DECODED_SCHEMA = "table_name string, op string, key string, ts_ms long"


def decode_debezium_avro_binary(
    events: DataFrame,
    reader_schema_json: str | None = None,
    payload_col: str = "value",
    pk_field: str = "id",
    avro_schema: dict | None = None,
) -> DataFrame:
    """Binary Avro payloads → (table_name, op, key, ts_ms).

    Two engines behind one surface:

    * **spark-avro's ``from_avro``** (JVM, vectorized) when the
      connector jar is on the classpath — on a cluster submit with
      ``--packages org.apache.spark:spark-avro_2.13:<ver>`` and pass
      ``reader_schema_json``. Always preferred.
    * **pure-Python codec via mapInPandas** (functions.avro_codec)
      otherwise — Arrow-batched, per-row decode in Python. This is the
      one operator family where a Python hot loop is accepted: the pip
      pyspark distro ships no spark-avro jar and CDC feeds are
      incremental (bounded event batches), never the 100 TB scan path.

    Semantics in both: row image = ``after`` falling back to ``before``
    (deletes carry no after), table from ``source``, and messages
    without a table or a key dropped — DebeziumAvroHandler.java:70-115.
    """
    if reader_schema_json is not None:
        try:
            from pyspark.sql.avro.functions import from_avro
        except ImportError:
            from_avro = None
        if from_avro is not None:
            try:
                rec = from_avro(F.col(payload_col), reader_schema_json)
                out = events.select(
                    rec["source"]["table"].alias("table_name"),
                    rec["op"].alias("op"),
                    F.coalesce(rec["after"][pk_field], rec["before"][pk_field])
                    .cast("string")
                    .alias("key"),
                    rec["ts_ms"].alias("ts_ms"),
                )
                # force analysis so a missing jar surfaces here, not at action
                out.schema
                return out.filter(
                    F.col("table_name").isNotNull() & F.col("key").isNotNull()
                )
            except Exception as e:
                # ONLY a missing spark-avro jar may swap decode engines:
                # AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE (Spark >=3.5's
                # error class) or py4j's "'JavaPackage' object is not
                # callable" (older pyspark where the scala object never
                # materialized). Any other analysis error (malformed
                # reader schema, wrong column) is a real bug the caller
                # must see, not silently decode around with a different
                # engine.
                msg = str(e)
                if "AVRO_NOT_LOADED" not in msg and "JavaPackage" not in msg:
                    raise

    # self-contained codec: decode with the CALLER'S schema when one was
    # provided — falling back to the built-in envelope layout here would
    # parse the varint/union stream against the wrong field order.
    if avro_schema is not None:
        schema = avro_schema
    elif reader_schema_json is not None:
        schema = json.loads(reader_schema_json)
    else:
        schema = DEBEZIUM_AVRO_BINARY_SCHEMA
    from opengauss_tools_datachecker_performance_spark.functions.avro_codec import (
        decode,
    )

    def _decode_batches(batches):
        import pandas as pd

        for pdf in batches:
            tables, ops, keys, tss = [], [], [], []
            for blob in pdf[payload_col]:
                if blob is None:
                    continue
                rec, _ = decode(schema, bytes(blob))
                src = rec.get("source") or {}
                table = src.get("table")
                row = rec.get("after") or rec.get("before") or {}
                key = row.get(pk_field)
                if table is None or key is None:
                    continue  # transaction marker / DDL / unkeyed
                tables.append(table)
                ops.append(rec.get("op"))
                keys.append(key)
                tss.append(rec.get("ts_ms"))
            yield pd.DataFrame(
                {"table_name": tables, "op": ops, "key": keys, "ts_ms": tss}
            )

    return events.select(payload_col).mapInPandas(_decode_batches, _DECODED_SCHEMA)


def encode_debezium_avro_binary(
    decoded_rows: DataFrame, avro_schema: dict | None = None
) -> DataFrame:
    """Inverse of the python decode path — (table_name, op, key, ts_ms)
    rows → one binary Avro envelope per row in a ``value`` column.
    Fixture/test helper (a real deployment reads Kafka-produced
    payloads); deletes get a before-image only, everything else an
    after-image, mirroring Debezium's op semantics."""
    schema = avro_schema or DEBEZIUM_AVRO_BINARY_SCHEMA
    from opengauss_tools_datachecker_performance_spark.functions.avro_codec import (
        encode,
    )

    def _encode_batches(batches):
        import pandas as pd

        for pdf in batches:
            blobs = []
            for r in pdf.itertuples(index=False):
                img = None if r.key is None else {"id": str(r.key)}
                datum = {
                    "before": img if r.op in ("d", "u") else None,
                    "after": img if r.op != "d" else None,
                    "source": {
                        "db": "testdb",
                        "table": r.table_name,
                        "ts_ms": int(r.ts_ms or 0),
                    },
                    "op": r.op,
                    "ts_ms": int(r.ts_ms) if r.ts_ms is not None else None,
                }
                out = bytearray()
                encode(schema, datum, out)
                blobs.append(bytes(out))
            yield pd.DataFrame({"value": blobs})

    return decoded_rows.mapInPandas(_encode_batches, "value binary")


def consolidate_changed_keys(decoded: DataFrame) -> DataFrame:
    """Per-table changed-key log (SourceDataLog.java:33-62 semantics):
    distinct keys per table with the earliest offset/timestamp seen.
    The incremental checker semi-joins these keys against both tables
    (streaming.incremental.check_changed_keys)."""
    return (
        decoded.groupBy("table_name", "key")
        .agg(F.min("ts_ms").alias("begin_offset"), F.count(F.lit(1)).alias("n_events"))
    )
