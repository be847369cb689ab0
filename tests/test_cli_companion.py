"""Body-free CLI mode: --source-companion / --sink-companion.

The digest-companion fast path (sources/prehashed.py, measured 2.2x
at 3M docs/side in BENCH/BASELINE.md) must be reachable from the
spark-submit entrypoint with an identical report, gated by the
body-free staleness audits (partition presence always; ledger stats
on request), and self-healing via --companion-repair.
"""

import json
import os
import shutil

from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.__main__ import main
from opengauss_tools_datachecker_performance_spark.sources.prehashed import (
    digest_companion_frame,
    write_digest_companion,
)
from opengauss_tools_datachecker_performance_spark.synth import write_corpus


def _setup(spark, tmp_path):
    corpus = str(tmp_path / "corpus")
    write_corpus(spark, corpus, n_docs=800, n_assets=60, n_partitions=4)
    src = spark.read.parquet(f"{corpus}/docs_source.parquet")
    snk = spark.read.parquet(f"{corpus}/docs_sink.parquet")
    write_digest_companion(src, f"{corpus}/comp_source")
    write_digest_companion(snk, f"{corpus}/comp_sink")
    return corpus


def _args(corpus):
    return [
        "--source", f"{corpus}/docs_source.parquet",
        "--sink", f"{corpus}/docs_sink.parquet",
        "--assets", f"{corpus}/assets.parquet",
    ]


def test_cli_companion_matches_body_run(spark, tmp_path):
    """Body-free run produces the same summary (every constraint's
    verdicts + violation counts) as the body-scanning run."""
    corpus = _setup(spark, tmp_path)
    r_body, r_comp = str(tmp_path / "body"), str(tmp_path / "comp")
    rc1 = main(_args(corpus) + ["--report-dir", r_body], spark=spark)
    rc2 = main(
        _args(corpus)
        + [
            "--report-dir", r_comp,
            "--source-companion", f"{corpus}/comp_source",
            "--sink-companion", f"{corpus}/comp_sink",
        ],
        spark=spark,
    )
    assert rc1 == rc2 == 1  # seeded violations fail both runs
    s_body = json.load(open(os.path.join(r_body, "summary.json")))
    s_comp = json.load(open(os.path.join(r_comp, "summary.json")))
    assert s_body["constraints"] == s_comp["constraints"]


def test_cli_companion_presence_gate_and_repair(spark, tmp_path):
    """A partition the raw table has but the companion lacks must abort
    with exit 2 even under the default audit 'none' (presence is
    always checked, body-free); --companion-repair re-derives only
    that partition and the run then matches the body run."""
    corpus = _setup(spark, tmp_path)
    comp_path = f"{corpus}/comp_source"
    shutil.rmtree(os.path.join(comp_path, "part=0"))
    comp_args = _args(corpus) + ["--source-companion", comp_path]
    rc = main(
        comp_args + ["--report-dir", str(tmp_path / "stale")], spark=spark
    )
    assert rc == 2
    stale = spark.read.parquet(
        os.path.join(str(tmp_path / "stale"), "companion_stale.parquet")
    ).collect()
    assert {r["part"] for r in stale} == {0}
    assert {r["reason"] for r in stale} == {"missing_in_companion"}

    r_body, r_fixed = str(tmp_path / "body"), str(tmp_path / "fixed")
    main(_args(corpus) + ["--report-dir", r_body], spark=spark)
    rc = main(
        comp_args + ["--companion-repair", "--report-dir", r_fixed],
        spark=spark,
    )
    assert rc == 1
    s_body = json.load(open(os.path.join(r_body, "summary.json")))
    s_fixed = json.load(open(os.path.join(r_fixed, "summary.json")))
    assert s_body["constraints"] == s_fixed["constraints"]


def test_cli_companion_ledger_audit_catches_row_drift(spark, tmp_path):
    """Ledger audit: a companion partition PRESENT but diverging from
    the ledger's recorded (n_rows, digest) — here one doc dropped, so
    presence alone cannot see it — aborts with exit 2 and repairs."""
    corpus = _setup(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt")
    args = _args(corpus) + ["--checkpoint-dir", ckpt]
    # seed the ledger (and the reference summary) with a body run
    main(args + ["--report-dir", str(tmp_path / "seed")], spark=spark)
    # corrupt the source companion: rewrite part=0 with one doc missing
    src = spark.read.parquet(f"{corpus}/docs_source.parquet")
    victim = (
        src.filter(F.col("part") == 0)
        .select("doc_id")
        .orderBy("doc_id")
        .first()["doc_id"]
    )
    bad = src.filter((F.col("part") == 0) & (F.col("doc_id") != victim))
    comp_path = f"{corpus}/comp_source"
    digest_companion_frame(bad).drop("part").write.mode("overwrite").parquet(
        os.path.join(comp_path, "part=0")
    )
    comp_args = args + [
        "--source-companion", comp_path, "--companion-audit", "ledger",
    ]
    rc = main(
        comp_args + ["--report-dir", str(tmp_path / "stale")], spark=spark
    )
    assert rc == 2
    stale = spark.read.parquet(
        os.path.join(str(tmp_path / "stale"), "companion_stale.parquet")
    ).collect()
    assert {r["part"] for r in stale} == {0}
    assert {r["reason"] for r in stale} == {"row_count"}

    rc = main(
        comp_args + ["--companion-repair", "--report-dir", str(tmp_path / "fixed")],
        spark=spark,
    )
    assert rc == 1
    s_seed = json.load(open(os.path.join(str(tmp_path / "seed"), "summary.json")))
    s_fixed = json.load(open(os.path.join(str(tmp_path / "fixed"), "summary.json")))
    assert s_seed["constraints"] == s_fixed["constraints"]


def test_cli_stale_marker_survives_weaker_audit(spark, tmp_path):
    """A companion_stale.parquet written by a FULL audit must survive a
    later run whose weaker (default 'none') audit passes — that run
    never re-examined the flagged digests, so deleting the marker
    would destroy the only record of the unresolved staleness. A rerun
    at the original level re-detects; repair at that level clears."""
    corpus = _setup(spark, tmp_path)
    comp_path = f"{corpus}/comp_source"
    # digest-only corruption: same row count, shifted v_hash — exactly
    # the staleness class only --companion-audit full can see
    part1 = spark.read.parquet(comp_path).filter(F.col("part") == 1).drop("part")
    part1.withColumn("v_hash", F.col("v_hash") + F.lit(1)).localCheckpoint(
        eager=True
    ).write.mode("overwrite").parquet(os.path.join(comp_path, "part=1"))

    rdir = str(tmp_path / "weak")
    comp_args = _args(corpus) + [
        "--source-companion", comp_path, "--report-dir", rdir,
    ]
    rc = main(comp_args + ["--companion-audit", "full"], spark=spark)
    assert rc == 2
    marker = os.path.join(rdir, "companion_stale.parquet")
    rows = spark.read.parquet(marker).collect()
    assert {r["part"] for r in rows} == {1}
    assert {r["audit_level"] for r in rows} == {"full"}

    # weaker rerun into the SAME report dir: presence audit passes,
    # run proceeds (seeded violations -> 1), marker must survive
    rc = main(comp_args, spark=spark)
    assert rc == 1
    assert os.path.isdir(marker)
    assert {r["part"] for r in spark.read.parquet(marker).collect()} == {1}

    # repair at the detecting level clears the marker
    rc = main(
        comp_args + ["--companion-audit", "full", "--companion-repair"],
        spark=spark,
    )
    assert rc == 1
    assert not os.path.exists(marker)
