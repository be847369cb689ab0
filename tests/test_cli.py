"""spark-submit entrypoint: full lifecycle incl. kill-and-resume."""

import json
import os

from opengauss_tools_datachecker_performance_spark.__main__ import main
from opengauss_tools_datachecker_performance_spark.synth import write_corpus


def _setup(spark, tmp_path):
    corpus = str(tmp_path / "corpus")
    write_corpus(spark, corpus, n_docs=800, n_assets=60, n_partitions=4)
    return corpus


def test_cli_full_run(spark, tmp_path):
    corpus = _setup(spark, tmp_path)
    report = str(tmp_path / "report")
    rc = main(
        [
            "--source", f"{corpus}/docs_source.parquet",
            "--sink", f"{corpus}/docs_sink.parquet",
            "--assets", f"{corpus}/assets.parquet",
            "--report-dir", report,
        ],
        spark=spark,
    )
    assert rc == 1  # seeded violations must fail the run
    summary = json.load(open(os.path.join(report, "summary.json")))
    assert summary["result"] == "failed"
    assert summary["constraints"]["consistency"]["n_violations"] > 0
    assert os.path.exists(os.path.join(report, "violations.parquet"))


def test_cli_resume_skips_done(spark, tmp_path):
    corpus = _setup(spark, tmp_path)
    report = str(tmp_path / "r1")
    ckpt = str(tmp_path / "ckpt")
    args = [
        "--source", f"{corpus}/docs_source.parquet",
        "--sink", f"{corpus}/docs_sink.parquet",
        "--assets", f"{corpus}/assets.parquet",
        "--checkpoint-dir", ckpt,
    ]
    main(args + ["--report-dir", report], spark=spark)
    # every partition is now 'done' → a resumed run validates nothing
    rc = main(
        args + ["--report-dir", str(tmp_path / "r2"), "--resume"], spark=spark
    )
    assert rc == 0
    assert not os.path.exists(os.path.join(str(tmp_path / "r2"), "summary.json"))
