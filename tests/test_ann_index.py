"""Persisted IVF ANN index (operators/ann_index.py): disk round-trip,
incremental batch ingest with idempotent replay, query parity with the
unindexed operator, and partition pruning on the probed cells."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _emb(spark, n=120, dims=8):
    # deterministic synthetic embeddings: hash-derived coords
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (F.pmod(F.xxhash64(F.col("id"), F.lit(d)), F.lit(1000)) / 1000.0)
                for d in range(dims)
            ]
        ).alias("embedding"),
    )
    return base


def test_index_roundtrip_and_query_parity(spark, tmp_path):
    from opengauss_tools_datachecker_performance_spark.operators.ann_index import (
        add_batch_to_ivf_index,
        ivf_index_topk,
        read_ivf_index,
        write_ivf_index,
    )
    from opengauss_tools_datachecker_performance_spark.operators.similarity import (
        ivf_ann_topk,
    )

    emb = _emb(spark)
    base = emb.filter(F.col("vec_id") < 100)
    batch = emb.filter(F.col("vec_id") >= 100)
    path = str(tmp_path / "ivf")
    write_ivf_index(base, path)
    add_batch_to_ivf_index(spark, path, batch, "b1")
    cent, vectors = read_ivf_index(spark, path)
    assert vectors.count() == 120
    queries = emb.filter(F.col("vec_id") % 25 == 0)
    got = {
        (r.query_id, r.rank): r.neighbor_id
        for r in ivf_index_topk(cent, vectors, queries, k=3, nprobe=2).collect()
    }
    want = {
        (r.query_id, r.rank): r.neighbor_id
        for r in ivf_ann_topk(queries, emb, k=3, nprobe=2).collect()
    }
    assert got == want and len(got) > 0


def test_batch_replay_is_idempotent(spark, tmp_path):
    from opengauss_tools_datachecker_performance_spark.operators.ann_index import (
        add_batch_to_ivf_index,
        read_ivf_index,
        write_ivf_index,
    )

    emb = _emb(spark, n=60)
    path = str(tmp_path / "ivf")
    write_ivf_index(emb.filter(F.col("vec_id") < 40), path)
    batch = emb.filter(F.col("vec_id") >= 40)
    add_batch_to_ivf_index(spark, path, batch, "b1")
    add_batch_to_ivf_index(spark, path, batch, "b1")  # crash-replay
    _, vectors = read_ivf_index(spark, path)
    assert vectors.count() == 60  # no duplicate postings
    assert vectors.select("neighbor_id").distinct().count() == 60


def test_probe_prunes_cell_partitions(spark, tmp_path):
    from opengauss_tools_datachecker_performance_spark.operators.ann_index import (
        read_ivf_index,
        write_ivf_index,
    )

    emb = _emb(spark, n=80)
    path = str(tmp_path / "ivf")
    write_ivf_index(emb, path)
    # postings are laid out by cell on disk...
    batch_dir = os.path.join(path, "vectors.parquet", "batch=base")
    cells = [d for d in os.listdir(batch_dir) if d.startswith("cell=")]
    assert len(cells) > 1
    # ...and a cell-filtered read plans a partition filter (pruned IO)
    _, vectors = read_ivf_index(spark, path)
    plan = (
        vectors.filter(F.col("cell").isin([0, 1]))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [" in plan and "cell" in plan
