"""Body-free CLI mode: --source-companion / --sink-companion.

The digest-companion fast path (sources/prehashed.py, measured 2.2x
at 3M docs/side in BENCH/BASELINE.md) must be reachable from the
spark-submit entrypoint with an identical report, gated by the
body-free ledger staleness audit, and self-healing via
--companion-repair.
"""

import json
import os
import shutil

from opengauss_tools_datachecker_performance_spark.__main__ import main
from opengauss_tools_datachecker_performance_spark.sources.prehashed import (
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
            "--companion-audit", "none",
        ],
        spark=spark,
    )
    assert rc1 == rc2 == 1  # seeded violations fail both runs
    s_body = json.load(open(os.path.join(r_body, "summary.json")))
    s_comp = json.load(open(os.path.join(r_comp, "summary.json")))
    assert s_body["constraints"] == s_comp["constraints"]


def test_cli_companion_ledger_audit_gates_and_repairs(spark, tmp_path):
    """A companion whose partition diverges from the ledger's recorded
    (n_rows, digest) must abort with exit 2 + a companion_stale
    report; --companion-repair re-derives only the stale partitions
    from bodies and the run then matches the body run."""
    corpus = _setup(spark, tmp_path)
    ckpt = str(tmp_path / "ckpt")
    args = _args(corpus) + ["--checkpoint-dir", ckpt]
    # seed the ledger (and the reference summary) with a body run
    main(args + ["--report-dir", str(tmp_path / "seed")], spark=spark)
    # corrupt the source companion: drop one partition wholesale
    comp_path = f"{corpus}/comp_source"
    shutil.rmtree(os.path.join(comp_path, "part=0"))
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
    assert {r["reason"] for r in stale} == {"missing_in_companion"}

    rc = main(
        comp_args + ["--companion-repair", "--report-dir", str(tmp_path / "fixed")],
        spark=spark,
    )
    assert rc == 1
    s_seed = json.load(open(os.path.join(str(tmp_path / "seed"), "summary.json")))
    s_fixed = json.load(open(os.path.join(str(tmp_path / "fixed"), "summary.json")))
    assert s_seed["constraints"] == s_fixed["constraints"]
