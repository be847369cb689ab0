"""Regression tests for the round-2 code-review findings: single-PK
key-literal truncation, single-DataType broadcast for composite keys,
NULL-vs-[] span digests, the LSH dims guard, boundary-tie partial
top-k, Avro-fallback schema fidelity, and CLI coverage wiring."""

import json
import math
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_batch_delete_single_pk_key_with_separator(spark):
    """A single-PK key containing the composite separator '_#_' must
    render whole — splitting it targets the wrong row."""
    from opengauss_tools_datachecker_performance_spark.operators.repair import (
        batch_delete_dml,
    )

    diff = spark.createDataFrame(
        [("user_#_42", "delete"), ("plain", "delete")],
        "key string, diff_type string",
    )
    out = batch_delete_dml(diff, "doc_id", "t", batch_size=10).collect()
    all_sql = " ".join(r["sql"] for r in out)
    assert "'user_#_42'" in all_sql
    assert "'user'" not in all_sql


def test_batch_delete_single_type_broadcasts_to_all_key_cols(spark):
    """One DataType + N key columns = that type for every column; a
    mismatched explicit list raises instead of rendering 1-value
    tuples against an (a, b) LHS."""
    from opengauss_tools_datachecker_performance_spark.operators.repair import (
        batch_delete_dml,
    )

    diff = spark.createDataFrame(
        [("1_#_2", "delete"), ("3_#_4", "delete")],
        "key string, diff_type string",
    )
    out = batch_delete_dml(
        diff, ["a", "b"], "t", batch_size=10, key_type=T.LongType()
    ).collect()
    all_sql = " ".join(r["sql"] for r in out)
    assert "(1, 2)" in all_sql and "(3, 4)" in all_sql

    with pytest.raises(ValueError, match="key_types"):
        batch_delete_dml(
            diff, ["a", "b"], "t", key_type=[T.LongType()]
        )


def test_null_spans_and_empty_spans_digest_differently(spark):
    """spans=NULL vs spans=[] is a real source/sink discrepancy and
    must surface as an update, not silently compare equal."""
    from opengauss_tools_datachecker_performance_spark.digest import doc_digests
    from opengauss_tools_datachecker_performance_spark.operators.diff import (
        classify_diff,
    )

    schema = (
        "doc_id string, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>"
    )
    src = spark.createDataFrame([("d1", [])], schema)
    sink = spark.createDataFrame([("d1", None)], schema)
    sd, kd = doc_digests(src), doc_digests(sink)
    assert (
        sd.select("v_hash").first()[0] != kd.select("v_hash").first()[0]
    )
    rows = classify_diff(sd, kd).collect()
    assert [(r["key"], r["diff_type"]) for r in rows] == [("d1", "update")]


def test_hyperplane_signature_rejects_wrong_dims(spark):
    """Embeddings whose length != configured dims must fail fast, not
    silently hash everything to bucket 0 (zero recall over the cap)."""
    from opengauss_tools_datachecker_performance_spark.operators.dedup import (
        embedding_near_duplicates,
    )

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)],
        "vid long, emb array<double>",
    )
    with pytest.raises(Exception, match="dims=64"):
        embedding_near_duplicates(
            df, id_col="vid", vec_col="emb", threshold=0.9
        ).collect()


def test_vectorized_topk_keeps_boundary_ties_deterministically(spark):
    """Exact duplicate corpus vectors tying at the per-batch top-k
    boundary: the partial must keep the smaller neighbor_id (the
    window's total order), matching the JVM baseline exactly."""
    from opengauss_tools_datachecker_performance_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_vectorized,
    )

    dims = 8
    best = [1.0] + [0.0] * (dims - 1)
    tied = [1.0, 0.5] + [0.0] * (dims - 2)
    rows = (
        [(2, best)]
        + [(10, tied), (11, tied), (12, tied)]
        + [(20 + i, [0.1 * (i + 1), 1.0] + [0.0] * (dims - 2)) for i in range(4)]
    )
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = spark.createDataFrame(
        [(100, [1.0] + [0.0] * (dims - 1))], "vec_id long, embedding array<double>"
    )
    jvm = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in brute_force_topk(queries, corpus, k=3).collect()
    }
    vec = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in brute_force_topk_vectorized(queries, corpus, k=3).collect()
    }
    assert vec == jvm
    # ranks 2 and 3 are the tie group: id-ascending order is the contract
    assert vec[(100, 2)] == 10 and vec[(100, 3)] == 11


def test_avro_binary_fallback_honors_caller_schema(spark):
    """Without the spark-avro jar, the pure-Python fallback must decode
    with the CALLER'S reader schema — a custom field order parsed
    against the built-in envelope layout would produce garbage."""
    from opengauss_tools_datachecker_performance_spark.functions.avro_codec import (
        encode,
    )
    from opengauss_tools_datachecker_performance_spark.sources.debezium import (
        decode_debezium_avro_binary,
    )

    custom = {
        "type": "record",
        "name": "Env2",
        "fields": [
            {"name": "op", "type": ["null", "string"]},
            {"name": "ts_ms", "type": ["null", "long"]},
            {
                "name": "source",
                "type": {
                    "type": "record",
                    "name": "Src2",
                    "fields": [{"name": "table", "type": ["null", "string"]}],
                },
            },
            {"name": "after", "type": ["null", {"type": "map", "values": "string"}]},
            {"name": "before", "type": ["null", {"type": "map", "values": "string"}]},
        ],
    }
    rec = {
        "op": "c",
        "ts_ms": 1000,
        "source": {"table": "widgets"},
        "after": {"id": "7"},
        "before": None,
    }
    buf = bytearray()
    encode(custom, rec, buf)
    df = spark.createDataFrame([(bytearray(buf),)], "value binary")
    out = decode_debezium_avro_binary(df, reader_schema_json=json.dumps(custom))
    rows = [
        (r["table_name"], r["op"], r["key"], r["ts_ms"]) for r in out.collect()
    ]
    assert rows == [("widgets", "c", "7", 1000)]


def test_cli_near_dup_coverage_in_summary(spark, tmp_path):
    """--near-dup-table runs MinHash near-dup alongside validation and
    surfaces the coverage-cap counts in summary.json (never-silent
    caps, wired into the production entrypoint)."""
    from opengauss_tools_datachecker_performance_spark.__main__ import main
    from opengauss_tools_datachecker_performance_spark.synth import write_corpus

    corpus = str(tmp_path / "corpus")
    write_corpus(spark, corpus, n_docs=200, n_assets=30, n_partitions=2)
    docs_tbl = os.path.join(SF_DIR, "documents.parquet")
    report = str(tmp_path / "report")
    main(
        [
            "--source", f"{corpus}/docs_source.parquet",
            "--report-dir", report,
            "--near-dup-table", docs_tbl,
        ],
        spark=spark,
    )
    summary = json.load(open(os.path.join(report, "summary.json")))
    cov = summary["coverage_bounds"]
    assert set(cov) and all(
        isinstance(v, int) and v >= 0 for v in cov.values()
    )
    assert os.path.isdir(os.path.join(report, "near_dup_pairs.parquet"))


def test_cli_near_dup_clusters(spark, tmp_path):
    """--near-dup-clusters turns the emitted pairs into connected
    components + one survivor per cluster, with counts in summary.json;
    a fresh run without the flag clears the stale frames."""
    from opengauss_tools_datachecker_performance_spark.__main__ import main
    from opengauss_tools_datachecker_performance_spark.synth import write_corpus

    corpus = str(tmp_path / "corpus")
    write_corpus(spark, corpus, n_docs=200, n_assets=30, n_partitions=2)
    shared_a = "alpha beta gamma delta epsilon zeta eta theta " * 4
    shared_b = "one two three four five six seven eight nine ten " * 4
    rows = [
        ("a1", shared_a), ("a2", shared_a), ("a3", shared_a + "tail tail2"),
        ("b1", shared_b), ("b2", shared_b),
    ] + [
        # per-doc-disjoint tokens so uniques share no shingles
        ("u%d" % i, " ".join("q%dw%d" % (i, j) for j in range(12)))
        for i in range(10)
    ]
    docs_tbl = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, "doc_id string, text string").write.parquet(
        docs_tbl
    )
    report = str(tmp_path / "report")
    main(
        [
            "--source", f"{corpus}/docs_source.parquet",
            "--report-dir", report,
            "--near-dup-table", docs_tbl,
            "--near-dup-clusters",
        ],
        spark=spark,
    )
    labels = {
        r["id"]: r["component"]
        for r in spark.read.parquet(
            os.path.join(report, "near_dup_clusters.parquet")
        ).collect()
    }
    assert labels == {
        "a1": "a1", "a2": "a1", "a3": "a1", "b1": "b1", "b2": "b1"
    }
    surv = {
        r["component"]: r
        for r in spark.read.parquet(
            os.path.join(report, "near_dup_survivors.parquet")
        ).collect()
    }
    assert surv["a1"]["survivor_id"] == "a3"  # longest text wins
    assert surv["a1"]["n_members"] == 3
    assert surv["b1"]["n_members"] == 2
    summary = json.load(open(os.path.join(report, "summary.json")))
    sec = summary["near_dup_clusters"]
    assert sec == {
        "n_clusters": 2,
        "n_docs_clustered": 5,
        "largest_cluster": 3,
        "n_removable": 3,
    }

    # flag combinations that would mislead are rejected up front
    import pytest

    with pytest.raises(SystemExit):
        main(
            ["--source", f"{corpus}/docs_source.parquet",
             "--report-dir", report, "--near-dup-clusters"],
            spark=spark,
        )
    with pytest.raises(SystemExit):
        main(
            ["--source", f"{corpus}/docs_source.parquet",
             "--report-dir", report,
             "--near-dup-table", docs_tbl,
             "--near-dup-index", str(tmp_path / "idx"),
             "--near-dup-clusters"],
            spark=spark,
        )

    # fresh run without the flag clears the stale frames + section
    main(
        ["--source", f"{corpus}/docs_source.parquet",
         "--report-dir", report],
        spark=spark,
    )
    for frame in (
        "near_dup_pairs.parquet",
        "near_dup_clusters.parquet",
        "near_dup_survivors.parquet",
    ):
        assert not os.path.exists(os.path.join(report, frame))
    assert "near_dup_clusters" not in json.load(
        open(os.path.join(report, "summary.json"))
    )
