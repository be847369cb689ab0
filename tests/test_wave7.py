"""Wave-7 catalog entries vs DuckDB oracle (sf0.001)."""

from __future__ import annotations

import duckdb
import pytest

from opengauss_tools_datachecker_performance_spark.entry_queries import ORACLES, QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", ["ann_ivf"])
def test_wave7_matches_oracle(spark, duck, name):
    got = {tuple(map(str, r)) for r in QUERIES[name](spark, SF_DIR).collect()}
    want = {tuple(map(str, r)) for r in duck.execute(ORACLES[name]).fetchall()}
    assert got == want and len(got) > 0


def test_lang_id_profile_argmax_and_unknown(spark):
    from opengauss_tools_datachecker_performance_spark.functions.text import (
        lang_id_profile,
    )

    docs = spark.createDataFrame(
        [
            (1, "der hund und die katze das ist nicht mit"),   # de
            (2, "le chat et la maison les des est une dans"),  # fr
            (3, "el perro los gatos las de que es una por"),   # es
            (4, "the cat and the dog of it was for to in"),    # en
            (5, "zzz qqq www"),                                # no markers
            (6, "the"),                                        # 1 hit < min_hits
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.lang, r.n_hits) for r in lang_id_profile(docs, "doc_id", "text").collect()}
    assert got["1"][0] == "de" and got["2"][0] == "fr"
    assert got["3"][0] == "es" and got["4"][0] == "en"
    assert got["5"] == ("unknown", 0)
    assert got["6"] == ("unknown", 0)


def test_lang_id_profile_tie_break_is_marker_order(spark):
    from opengauss_tools_datachecker_performance_spark.functions.text import (
        lang_id_profile,
    )

    # "que" is a marker for BOTH fr and es → 2-2 tie → fr wins
    # (earlier in LANG_MARKERS)
    docs = spark.createDataFrame([(1, "que que")], "doc_id long, text string")
    [r] = lang_id_profile(docs, "doc_id", "text").collect()
    assert (r.lang, r.n_hits) == ("fr", 2)


def test_ivf_centroids_refined_deterministic_and_trained(spark):
    """The Lloyd-refined quantizer: (a) two runs agree bit-for-bit,
    (b) refined centroids land on the true cluster means of a crafted
    2-cluster layout, (c) empty cells keep their seed centroid, and
    (d) ivf_ann_topk accepts the trained frame and still finds the
    planted nearest neighbor."""
    import pyspark.sql.functions as F

    from opengauss_tools_datachecker_performance_spark.operators.similarity import (
        ivf_ann_topk,
        ivf_centroids_refined,
    )

    # two tight clusters far apart on orthogonal axes; ids 0/1 (the
    # lowest-id seeds) sit one per cluster
    rows = []
    for i in range(20):
        base = [0.0] * 8
        if i % 2 == 0:
            base[0] = 1.0 + (i % 5) * 1e-4
        else:
            base[1] = 1.0 + (i % 5) * 1e-4
        rows.append((i, base))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    c1 = ivf_centroids_refined(df, "vec_id", "embedding", 2, 1e6, iters=2)
    c2 = ivf_centroids_refined(df, "vec_id", "embedding", 2, 1e6, iters=2)
    got1 = {r["cell"]: list(r["ci"]) for r in c1.collect()}
    got2 = {r["cell"]: list(r["ci"]) for r in c2.collect()}
    assert got1 == got2  # bit-for-bit deterministic
    # each refined centroid is the floor-mean of its cluster: dominant
    # axis ≈ 1e6 + mean of the planted offsets, other axes exactly 0
    for cell, ci in got1.items():
        dom = max(range(8), key=lambda d: ci[d])
        assert ci[dom] >= 1_000_000
        assert all(ci[d] == 0 for d in range(8) if d != dom)

    # empty-cell fallback: 3 cells over the same 2-cluster data — the
    # cell that attracts no members must keep its seed coordinates
    c3 = ivf_centroids_refined(df, "vec_id", "embedding", 3, 1e6, iters=1)
    assert c3.count() == 3

    # trained centroids drop into the ANN query path
    q = df.filter(F.col("vec_id") == 0)
    out = ivf_ann_topk(q, df, k=1, n_cells=2, nprobe=1, centroids=c1)
    [r] = out.collect()
    assert r["rank"] == 1 and r["neighbor_id"] % 2 == 0  # same cluster
