"""Connected components (large-star/small-star) + survivor selection."""

import random

from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.operators.components import (
    connected_components,
    dedup_survivors,
)


def _cc(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a string, id_b string")
    return {
        r["id"]: r["component"]
        for r in connected_components(df).collect()
    }


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min member id
    comp = {}
    for x in list(parent):
        comp.setdefault(find(x), []).append(x)
    out = {}
    for root, members in comp.items():
        m = min(members)
        for x in members:
            out[x] = m
    return out


def test_two_clusters(spark):
    got = _cc(spark, [("b", "a"), ("b", "c"), ("e", "d")])
    assert got == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d"}


def test_long_chain_converges(spark):
    """Diameter-20 chain: needs several alternating rounds, and every
    node must land on the chain head."""
    pairs = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(20)]
    got = _cc(spark, pairs)
    assert set(got.values()) == {"n00"}
    assert len(got) == 21


def test_matches_union_find_on_random_graphs(spark):
    rng = random.Random(7)
    for _ in range(3):
        n = 40
        pairs = [
            (f"v{rng.randrange(n):03d}", f"v{rng.randrange(n):03d}")
            for _ in range(45)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        assert _cc(spark, pairs) == _union_find(pairs)


def test_empty_edges(spark):
    df = spark.createDataFrame([], "id_a string, id_b string")
    assert connected_components(df).count() == 0


def test_dedup_survivors(spark):
    labels = spark.createDataFrame(
        [("a", "a"), ("b", "a"), ("c", "a"), ("e", "d"), ("d", "d")],
        "id string, component string",
    )
    docs = spark.createDataFrame(
        [
            ("a", "xx"),
            ("b", "xxxxx"),   # longest in cluster a → survivor
            ("c", "xx"),
            ("d", "yyy"),     # tie with e on length → min id wins
            ("e", "yyy"),
        ],
        "doc_id string, text string",
    )
    rows = {
        r["component"]: r
        for r in dedup_survivors(labels, docs).collect()
    }
    assert rows["a"]["survivor_id"] == "b"
    assert rows["a"]["n_members"] == 3
    assert rows["a"]["survivor_len"] == 5
    assert rows["d"]["survivor_id"] == "d"
    assert rows["d"]["n_members"] == 2


def test_composes_with_embedding_near_dup(spark):
    """The cluster/survivor layer composes with ANY pair-emitting
    dedup operator — here the embedding-cosine one: planted duplicate
    embeddings resolve into one cluster per duplicate group."""
    import math

    from opengauss_tools_datachecker_performance_spark.operators.dedup import (
        embedding_near_duplicates,
    )

    dims = 8

    def vec(seed):
        v = [math.sin(seed * (j + 1)) for j in range(dims)]
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    rows = []
    for i in range(12):
        v = vec(i + 1)
        rows.append((100 + i, v))
        if i % 4 == 0:  # plant two near-identical copies → 3-clusters
            rows.append((1000 + i * 10 + 1, v))
            rows.append((1000 + i * 10 + 2, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = embedding_near_duplicates(
        emb, threshold=0.999, dims=dims, n_planes=4, n_tables=2
    )
    labels = connected_components(pairs)
    comp = {}
    for r in labels.collect():
        comp.setdefault(r["component"], set()).add(r["id"])
    clusters = sorted(sorted(v) for v in comp.values())
    assert clusters == [
        ["100", "1001", "1002"],
        ["104", "1041", "1042"],
        ["108", "1081", "1082"],
    ]


def test_no_python_row_udfs_in_plan(spark):
    """The component loop must stay JVM-side: no BatchEvalPython /
    PythonRDD in the executed plan."""
    df = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "id_a string, id_b string"
    )
    out = connected_components(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "PythonRDD" not in plan
