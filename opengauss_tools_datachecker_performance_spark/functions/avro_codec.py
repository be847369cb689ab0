"""Minimal Avro BINARY codec (pure Python, no third-party deps).

Why this exists: the reference consumes Debezium change events as
binary-Avro Kafka payloads (already deserialized to GenericData.Record
by the Kafka Avro deserializer before DebeziumAvroHandler.java:70-115
sees them). Spark's own binary-Avro path is ``from_avro`` in the
spark-avro CONNECTOR, which the pip pyspark distribution does not
bundle — so the engine carries this self-contained decoder for
environments without the jar (sources.debezium picks the connector
when present, this codec otherwise). Wire format per the Avro 1.11
spec §"Binary encoding": zigzag-varint ints/longs, little-endian IEEE
float/double, length-prefixed bytes/strings, block-encoded arrays and
maps (negative block counts carry a byte size, per spec), and unions
as a varint branch index followed by the branch value.

Supported schema subset — everything a Debezium envelope needs:
null / boolean / int / long / float / double / string / bytes,
record, enum, fixed, array, map, union. Schemas are plain parsed-JSON
values (str or dict or list), no schema-registry machinery.
"""

from __future__ import annotations

import struct
from typing import Any

__all__ = ["encode", "decode", "encode_long", "decode_long"]


# ---------------------------------------------------------------------------
# varint / zigzag primitives
# ---------------------------------------------------------------------------


def encode_long(n: int, out: bytearray) -> None:
    """Zigzag-varint encoding (Avro spec: int and long share it)."""
    n = (n << 1) ^ (n >> 63) if n >= -(1 << 63) else 0
    n &= (1 << 64) - 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def decode_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


# ---------------------------------------------------------------------------
# schema helpers
# ---------------------------------------------------------------------------


def _schema_type(schema: Any) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def _union_branch_for(schema: list, datum: Any) -> int:
    """Pick the union branch for a Python datum (None → 'null' branch,
    else the first non-null branch that type-matches)."""
    for i, br in enumerate(schema):
        if _schema_type(br) == "null" and datum is None:
            return i
    for i, br in enumerate(schema):
        t = _schema_type(br)
        if t == "null":
            continue
        if t == "boolean" and isinstance(datum, bool):
            return i
        if t in ("int", "long") and isinstance(datum, int) and not isinstance(datum, bool):
            return i
        if t in ("float", "double") and isinstance(datum, float):
            return i
        if t in ("string", "enum") and isinstance(datum, str):
            return i
        if t in ("bytes", "fixed") and isinstance(datum, (bytes, bytearray)):
            return i
        if t == "map" and isinstance(datum, dict):
            return i
        if t == "record" and isinstance(datum, dict):
            return i
        if t == "array" and isinstance(datum, (list, tuple)):
            return i
    raise TypeError(f"no union branch for {type(datum).__name__} in {schema}")


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------


def encode(schema: Any, datum: Any, out: bytearray) -> None:
    t = _schema_type(schema)
    if t == "null":
        return
    if t == "boolean":
        out.append(1 if datum else 0)
    elif t in ("int", "long"):
        encode_long(int(datum), out)
    elif t == "float":
        out += struct.pack("<f", float(datum))
    elif t == "double":
        out += struct.pack("<d", float(datum))
    elif t == "string":
        b = str(datum).encode("utf-8")
        encode_long(len(b), out)
        out += b
    elif t == "bytes":
        encode_long(len(datum), out)
        out += bytes(datum)
    elif t == "fixed":
        if len(datum) != schema["size"]:
            raise ValueError(f"fixed size mismatch: {len(datum)} != {schema['size']}")
        out += bytes(datum)
    elif t == "enum":
        out_idx = schema["symbols"].index(datum)
        encode_long(out_idx, out)
    elif t == "union":
        idx = _union_branch_for(schema, datum)
        encode_long(idx, out)
        encode(schema[idx], datum, out)
    elif t == "record":
        for f in schema["fields"]:
            encode(f["type"], datum.get(f["name"]), out)
    elif t == "array":
        if datum:
            encode_long(len(datum), out)
            for item in datum:
                encode(schema["items"], item, out)
        encode_long(0, out)
    elif t == "map":
        if datum:
            encode_long(len(datum), out)
            for k, v in datum.items():
                b = str(k).encode("utf-8")
                encode_long(len(b), out)
                out += b
                encode(schema["values"], v, out)
        encode_long(0, out)
    else:
        raise TypeError(f"unsupported Avro type: {t!r}")


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def decode(schema: Any, buf: bytes, pos: int = 0) -> tuple[Any, int]:
    t = _schema_type(schema)
    if t == "null":
        return None, pos
    if t == "boolean":
        return buf[pos] != 0, pos + 1
    if t in ("int", "long"):
        return decode_long(buf, pos)
    if t == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t == "string":
        n, pos = decode_long(buf, pos)
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if t == "bytes":
        n, pos = decode_long(buf, pos)
        return bytes(buf[pos : pos + n]), pos + n
    if t == "fixed":
        n = schema["size"]
        return bytes(buf[pos : pos + n]), pos + n
    if t == "enum":
        idx, pos = decode_long(buf, pos)
        return schema["symbols"][idx], pos
    if t == "union":
        idx, pos = decode_long(buf, pos)
        return decode(schema[idx], buf, pos)
    if t == "record":
        rec = {}
        for f in schema["fields"]:
            rec[f["name"]], pos = decode(f["type"], buf, pos)
        return rec, pos
    if t == "array":
        items = []
        while True:
            n, pos = decode_long(buf, pos)
            if n == 0:
                return items, pos
            if n < 0:  # block with byte-size prefix (spec: skip support)
                n = -n
                _, pos = decode_long(buf, pos)
            for _ in range(n):
                v, pos = decode(schema["items"], buf, pos)
                items.append(v)
    if t == "map":
        m: dict[str, Any] = {}
        while True:
            n, pos = decode_long(buf, pos)
            if n == 0:
                return m, pos
            if n < 0:
                n = -n
                _, pos = decode_long(buf, pos)
            for _ in range(n):
                kl, pos = decode_long(buf, pos)
                k = buf[pos : pos + kl].decode("utf-8")
                pos += kl
                m[k], pos = decode(schema["values"], buf, pos)
    raise TypeError(f"unsupported Avro type: {t!r}")
