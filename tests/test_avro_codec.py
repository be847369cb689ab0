"""Avro binary codec (functions.avro_codec) + the S5c decode surface.

Wire-format assertions are against the Avro 1.11 spec's published
examples (zigzag: 0→00, -1→01, 1→02, -2→03, 2→04; string 'foo' →
06 66 6f 6f); envelope semantics against DebeziumAvroHandler.java:
70-115 (after-falls-back-to-before, marker/DDL drop).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from opengauss_tools_datachecker_performance_spark.functions.avro_codec import (
    decode,
    decode_long,
    encode,
    encode_long,
)
from opengauss_tools_datachecker_performance_spark.sources.debezium import (
    DEBEZIUM_AVRO_BINARY_SCHEMA,
)


def _rt(schema, datum):
    out = bytearray()
    encode(schema, datum, out)
    val, pos = decode(schema, bytes(out))
    assert pos == len(out), "trailing bytes"
    return val


def test_zigzag_spec_examples():
    for n, expect in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"), (2, b"\x04"), (64, b"\x80\x01")]:
        out = bytearray()
        encode_long(n, out)
        assert bytes(out) == expect, n
        assert decode_long(bytes(out), 0) == (n, len(out))


def test_string_spec_example():
    out = bytearray()
    encode("string", "foo", out)
    assert bytes(out) == b"\x06foo"


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=200, deadline=None)
def test_long_roundtrip(n):
    out = bytearray()
    encode_long(n, out)
    assert decode_long(bytes(out), 0) == (n, len(out))


def test_primitives_roundtrip():
    assert _rt("boolean", True) is True
    assert _rt("double", -1.5e300) == -1.5e300
    assert _rt("string", "héllo \x1f world") == "héllo \x1f world"
    assert _rt("bytes", b"\x00\xff\x1e") == b"\x00\xff\x1e"
    assert _rt(["null", "string"], None) is None
    assert _rt(["null", "long"], -42) == -42


def test_container_roundtrip():
    arr_schema = {"type": "array", "items": ["null", "long"]}
    assert _rt(arr_schema, [1, None, -3]) == [1, None, -3]
    assert _rt(arr_schema, []) == []
    map_schema = {"type": "map", "values": "string"}
    assert _rt(map_schema, {"id": "7", "k": ""}) == {"id": "7", "k": ""}
    assert _rt(map_schema, {}) == {}


def test_negative_block_count_decode():
    # spec: a negative block count is followed by the block's byte size
    arr_schema = {"type": "array", "items": "long"}
    out = bytearray()
    body = bytearray()
    encode_long(7, body)
    encode_long(-7, body)
    encode_long(-2, out)  # 2 items, size-prefixed block
    encode_long(len(body), out)
    out += body
    encode_long(0, out)
    assert decode(arr_schema, bytes(out)) == ([7, -7], len(out))


def test_envelope_roundtrip_fixture_shape():
    # same field inventory as the reference fixture one_record.json
    datum = {
        "before": None,
        "after": {"id": "100340", "k": "43254", "c": "93322-25033", "pad": "63836"},
        "source": {"db": "testdbc", "table": "sbtest8", "ts_ms": 1675319298000},
        "op": "c",
        "ts_ms": 1675319299411,
    }
    assert _rt(DEBEZIUM_AVRO_BINARY_SCHEMA, datum) == datum


def test_envelope_marker_roundtrip():
    marker = {"before": None, "after": None,
              "source": {"db": "testdb", "table": None, "ts_ms": 0},
              "op": None, "ts_ms": None}
    assert _rt(DEBEZIUM_AVRO_BINARY_SCHEMA, marker) == marker


def test_spark_binary_decode_path(spark):
    from opengauss_tools_datachecker_performance_spark.sources.debezium import (
        decode_debezium_avro_binary,
        encode_debezium_avro_binary,
    )

    rows = spark.createDataFrame(
        [
            ("orders", "c", "11", 100),
            ("orders", "d", "12", 101),   # delete: before-image only
            (None, None, None, 0),        # transaction marker → dropped
            ("customer", "u", "5", 102),
        ],
        "table_name string, op string, key string, ts_ms long",
    )
    dec = decode_debezium_avro_binary(encode_debezium_avro_binary(rows))
    got = {(r.table_name, r.op, r.key, r.ts_ms) for r in dec.collect()}
    assert got == {
        ("orders", "c", "11", 100),
        ("orders", "d", "12", 101),
        ("customer", "u", "5", 102),
    }


def test_unknown_type_raises():
    with pytest.raises(TypeError):
        _rt("decimal", 1)
