"""Wave-3 operator tests: repair DML, CSV locators, multimodal stub,
slice planning. (Cross-engine value parity for these is additionally
enforced by the DuckDB oracles in entry_queries_wave3.)"""

import os

from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    synth_payloads,
)
from opengauss_tools_datachecker_performance_spark.operators.repair import repair_dml
from opengauss_tools_datachecker_performance_spark.sources.csv_source import (
    read_csv_with_idx,
)


def test_repair_dml_statement_shapes(spark):
    src = spark.createDataFrame(
        [(1, "a", 10.5), (2, "it's", 20.0), (3, "c", None)],
        "id long, name string, val double",
    )
    diff = spark.createDataFrame(
        [("1", "update"), ("2", "insert"), ("9", "delete")], "key string, diff_type string"
    )
    rows = {r["key"]: r["sql"] for r in repair_dml(diff, src, ["id"], "t").collect()}
    assert rows["1"] == "UPDATE t SET name = 'a', val = 10.500000 WHERE id = 1;"
    # embedded quote doubled; NULL rendered bare
    assert rows["2"] == "INSERT INTO t (id, name, val) VALUES (2, 'it''s', 20.000000);"
    # delete key never existed in source: statement built from the key alone
    assert rows["9"] == "DELETE FROM t WHERE id = 9;"


def test_repair_dml_composite_key(spark):
    src = spark.createDataFrame([(1, 2, "x")], "a long, b long, v string")
    diff = spark.createDataFrame([("1_#_2", "update")], "key string, diff_type string")
    [r] = repair_dml(diff, src, ["a", "b"], "t").collect()
    assert r["sql"] == "UPDATE t SET v = 'x' WHERE a = 1 AND b = 2;"


def test_csv_scan_row_idx(spark, tmp_path):
    p = tmp_path / "f.csv"
    p.write_text("id,name\n" + "".join(f"{i},n{i}\n" for i in range(20)))
    df = read_csv_with_idx(spark, str(p), schema="id int, name string")
    rows = df.orderBy("id").collect()
    assert [r["row_idx"] for r in rows] == list(range(20))
    assert all(r["src_file"] == "f.csv" for r in rows)


def test_multimodal_features_deterministic(spark):
    cat = spark.createDataFrame(
        [("asset-1", "image/png", 128), ("asset-2", "video/mp4", 256)],
        "media_ref string, mime string, bytes long",
    )
    feats = extract_features(synth_payloads(cat, payload_bytes=128)).collect()
    by_ref = {r["media_ref"]: r for r in feats}
    assert by_ref["asset-1"]["n_bytes"] == 128
    assert 16 <= by_ref["asset-1"]["width"] < 80
    assert 0.0 <= by_ref["asset-1"]["mean_luma"] <= 1.0
    assert len(by_ref["asset-1"]["feature"]) == 8
    # determinism: same input -> same features
    feats2 = extract_features(synth_payloads(cat, payload_bytes=128)).collect()
    assert sorted(map(str, feats)) == sorted(map(str, feats2))


def test_multimodal_strict_marks_stub(spark):
    cat = spark.createDataFrame(
        [("asset-1", "image/png", 64)], "media_ref string, mime string, bytes long"
    )
    import pytest

    with pytest.raises(Exception) as ei:
        extract_features(synth_payloads(cat), strict=True).collect()
    assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)


def test_frame_sample_plan_counts(spark):
    cat = spark.createDataFrame(
        [("a", 64), ("b", 1000)], "media_ref string, bytes long"
    )
    rows = frame_sample_plan(cat, every_n_bytes=64, max_frames=8).collect()
    per = {}
    for r in rows:
        per.setdefault(r["media_ref"], []).append(r["byte_offset"])
    assert per["a"] == [0]  # 64 bytes -> single frame
    assert sorted(per["b"]) == [i * 64 for i in range(8)]  # capped at 8


def test_repair_dml_replace_variant(spark):
    from opengauss_tools_datachecker_performance_spark.operators.repair import (
        repair_dml_replace,
    )

    src = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    diff = spark.createDataFrame(
        [("1", "insert"), ("2", "update"), ("9", "delete")],
        "key string, diff_type string",
    )
    rows = {r["key"]: r["sql"] for r in repair_dml_replace(diff, src, ["id"], "t").collect()}
    assert rows["1"] == "REPLACE INTO t (id, v) VALUES (1, 'a');"
    assert rows["2"] == "REPLACE INTO t (id, v) VALUES (2, 'b');"
    assert rows["9"].startswith("DELETE FROM t WHERE ")


def test_batch_delete_dml(spark):
    from opengauss_tools_datachecker_performance_spark.operators.repair import (
        batch_delete_dml,
    )

    diff = spark.createDataFrame(
        [(f"k{i}", "delete") for i in range(7)] + [("u", "update")],
        "key string, diff_type string",
    ).repartition(1)
    out = batch_delete_dml(diff, "doc_id", "t", batch_size=3).collect()
    assert sum(r["n_keys"] for r in out) == 7
    assert all(r["n_keys"] <= 3 for r in out)
    assert all(
        r["sql"].startswith("DELETE FROM t WHERE doc_id IN ('") and r["sql"].endswith("');")
        for r in out
    )


def test_embedding_near_dup_lsh_finds_planted_scaled_dups(spark):
    """Bucketed-LSH near-dup must recover exactly-scaled duplicates
    (projections keep their sign under scaling → guaranteed bucket
    collision in every table) and must plan equi-joins only."""
    import math

    from opengauss_tools_datachecker_performance_spark.operators.dedup import (
        embedding_near_duplicates,
    )

    dims = 64
    base = [
        (i, [math.sin(i * 37.0 + d) for d in range(dims)]) for i in range(40)
    ]
    scaled = [(i + 1000, [x * 1.001 for x in v]) for i, v in base if i % 5 == 0]
    df = spark.createDataFrame(base + scaled, "vid long, emb array<double>")
    out = embedding_near_duplicates(df, id_col="vid", vec_col="emb", threshold=0.99)
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert {(i, i + 1000) for i, _ in base if i % 5 == 0} <= pairs
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_batch_delete_dml_composite_pk(spark):
    """Composite-PK batched deletes render the row-value-tuple IN form
    (SelectDmlBuilder.java:108-137 batched multi-column predicates)."""
    from opengauss_tools_datachecker_performance_spark.operators.repair import (
        batch_delete_dml,
    )
    from pyspark.sql import types as T

    diff = spark.createDataFrame(
        [(f"{i}_#_n{i}", "delete") for i in range(5)],
        "key string, diff_type string",
    )
    out = batch_delete_dml(
        diff, ["a", "b"], "t", batch_size=3,
        key_type=[T.LongType(), T.StringType()],
    ).collect()
    assert sum(r["n_keys"] for r in out) == 5
    for r in out:
        assert r["sql"].startswith("DELETE FROM t WHERE (a, b) IN ((")
        assert r["n_keys"] <= 3
    # numeric part bare, string part quoted
    all_sql = " ".join(r["sql"] for r in out)
    assert "(0, 'n0')" in all_sql and "(4, 'n4')" in all_sql


def test_doc_repair_statements_composite_pk(spark):
    from opengauss_tools_datachecker_performance_spark.operators.repair import (
        doc_repair_statements,
    )

    diff = spark.createDataFrame(
        [("1_#_x", "insert"), ("2_#_y", "update"), ("3_#_z", "delete")],
        "key string, diff_type string",
    )
    rows = doc_repair_statements(
        diff, "src", "snk", key_col=["k1", "k2"], batch_size=10
    ).collect()
    upserts = [r["sql"] for r in rows if r["kind"] == "upsert"]
    deletes = [r["sql"] for r in rows if r["kind"] == "delete"]
    # batches form per input partition, so tuple membership (not
    # statement count) is the contract
    up_all = " ".join(upserts)
    assert upserts and all(
        "MERGE INTO snk t USING (SELECT * FROM src WHERE (k1, k2) IN ((" in s
        for s in upserts
    )
    assert "('1', 'x')" in up_all and "('2', 'y')" in up_all
    assert all("ON t.k1 = s.k1 AND t.k2 = s.k2" in s for s in upserts)
    assert len(deletes) == 1
    assert deletes[0] == "DELETE FROM snk WHERE (k1, k2) IN (('3', 'z'));"


def test_resize_media_stub_and_strict(spark):
    """resize_media: deterministic prefix+digest stub over Arrow
    batches; strict mode raises at the codec boundary."""
    import hashlib

    import pytest

    from opengauss_tools_datachecker_performance_spark.operators.multimodal import (
        resize_media,
        synth_payloads,
    )

    cat = spark.createDataFrame(
        [("m1", "image/png"), ("m2", "video/mp4")], "media_ref string, mime string"
    )
    rows = {
        r["media_ref"]: r
        for r in resize_media(
            synth_payloads(cat, payload_bytes=128), target_w=32, target_h=32
        ).collect()
    }
    assert set(rows) == {"m1", "m2"}
    for r in rows.values():
        assert r["src_bytes"] == 128 and r["out_bytes"] == 33  # 1 + 1024//32
        assert (r["target_w"], r["target_h"]) == (32, 32)
        assert len(r["out_digest"]) == 32
    # digest is the md5 of the prefix's lowercase hex — recompute one
    payload = [
        r["payload"]
        for r in synth_payloads(cat, payload_bytes=128).collect()
        if r["media_ref"] == "m1"
    ][0]
    want = hashlib.md5(bytes(payload)[:33].hex().encode()).hexdigest()
    assert rows["m1"]["out_digest"] == want
    # a payload shorter than the prefix caps at its own length
    short = resize_media(
        synth_payloads(cat, payload_bytes=8), target_w=32, target_h=32
    ).collect()
    assert all(r["out_bytes"] == 8 for r in short)
    with pytest.raises(Exception, match="NotImplementedError|codec"):
        resize_media(synth_payloads(cat), strict=True).collect()


def test_embedding_near_dup_ivf_finds_planted_scaled_dups(spark):
    """IVF-routed near-dup must recover exactly-scaled duplicates
    (scaling preserves the integer-dot cell ranking up to quantization,
    and nprobe=2 covers boundary straddles) with equi-joins only."""
    import math

    from opengauss_tools_datachecker_performance_spark.operators.dedup import (
        embedding_near_duplicates_ivf,
    )

    dims = 64
    base = [
        (i, [math.sin(i * 37.0 + d) for d in range(dims)]) for i in range(40)
    ]
    scaled = [(i + 1000, [x * 1.001 for x in v]) for i, v in base if i % 5 == 0]
    df = spark.createDataFrame(base + scaled, "vid long, emb array<double>")
    out = embedding_near_duplicates_ivf(
        df, id_col="vid", vec_col="emb", threshold=0.99
    )
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert {(i, i + 1000) for i, _ in base if i % 5 == 0} <= pairs
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the only non-equi join allowed is the bounded n_cells-row
    # centroid broadcast of the assignment pass (ann_ivf's pattern);
    # the candidate pair join must be a cell equi-join
    assert "hashpartitioning(cell" in plan or "BroadcastHashJoin [cell" in plan
