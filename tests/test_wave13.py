"""Wave-13 unit checks: reverse-referential asset usage and the
log2 length histogram."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.checks.referential import (
    asset_usage,
)
from opengauss_tools_datachecker_performance_spark.entry_queries import ORACLES, QUERIES
from opengauss_tools_datachecker_performance_spark.operators.corpus_stats import (
    doc_length_histogram,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", ["asset_usage", "doc_length_histogram"])
def test_wave13_matches_oracle(spark, duck, name):
    got = {tuple(map(str, r)) for r in QUERIES[name](spark, SF_DIR).collect()}
    want = {tuple(map(str, r)) for r in duck.execute(ORACLES[name]).fetchall()}
    assert got == want and len(got) > 0


def test_asset_usage_statuses(spark, corpus):
    got = asset_usage(corpus["docs_source"], corpus["assets"])
    rows = got.collect()
    by_status = {}
    for r in rows:
        by_status.setdefault(r.status, []).append(r)
    # the synth catalog deliberately leaves some refs dangling
    assert by_status.get("dangling"), "expected dangling refs in synth corpus"
    for r in by_status["dangling"]:
        assert not r.in_catalog and r.n_refs > 0
    for r in by_status.get("orphan", []):
        assert r.in_catalog and r.n_refs == 0
    for r in by_status.get("ok", []):
        assert r.in_catalog and r.n_refs > 0
    # every media ref in the docs appears exactly once in the audit
    n_refs_total = sum(r.n_refs for r in rows)
    n_media = (
        corpus["docs_source"]
        .select(
            F.size(
                F.filter(
                    F.col("spans"),
                    lambda sp: (sp["kind"] == "media")
                    & sp["media_ref"].isNotNull(),
                )
            ).alias("n")
        )
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert n_refs_total == n_media


def test_length_histogram_buckets_are_exact_powers(spark):
    docs = spark.createDataFrame(
        [("1", "a", "s"), ("2", "a b c d", "s"), ("3", " ".join(["w"] * 70), "s")],
        "doc_id string, text string, source string",
    )
    got = {r.bucket: r for r in doc_length_histogram(docs).collect()}
    assert set(got) == {0, 2, 6}  # 1 token, 4 tokens, 70 tokens
    assert (got[0].lo_tokens, got[0].hi_tokens) == (1, 1)
    assert (got[2].lo_tokens, got[2].hi_tokens) == (4, 7)
    assert (got[6].lo_tokens, got[6].hi_tokens) == (64, 127)
    assert all(r.n_docs == 1 for r in got.values())


def test_snapshot_drift_oracle_parity(spark, duck):
    got = {tuple(map(str, r)) for r in QUERIES["snapshot_drift"](spark, SF_DIR).collect()}
    want = {tuple(map(str, r)) for r in duck.execute(ORACLES["snapshot_drift"]).fetchall()}
    assert got == want and len(got) > 0


def test_snapshot_drift_statuses_and_scores(spark):
    from opengauss_tools_datachecker_performance_spark.plans.snapshot import (
        snapshot_drift,
    )

    old = spark.createDataFrame(
        [(0, 10), (0, 20), (0, 30), (1, 5), (1, 5), (2, 7)],
        "part int, text_len long",
    )
    new = spark.createDataFrame(
        # part 0 unchanged; part 1 metric doubled (drift); part 3 new
        [(0, 10), (0, 20), (0, 30), (1, 10), (1, 10), (3, 9)],
        "part int, text_len long",
    )
    got = {r.part: r for r in snapshot_drift(old, new, threshold=0.3).collect()}
    assert got[0].status == "compared" and not got[0].drifted
    assert got[0].drift_score == 0.0
    assert got[1].status == "compared" and got[1].drifted
    assert got[1].drift_score == pytest.approx(1.0)  # 5 -> 10 per quantile
    assert got[2].status == "gone" and got[2].drifted
    assert got[2].drift_score is None and got[2].n_new is None
    assert got[3].status == "new" and got[3].drifted and got[3].n_old is None
