"""spark-submit job entrypoint — the whole check lifecycle in one job.

The reference runs three Spring services (check :9000, source :9001,
sink :9002 — config/application.yml:2,15-16) wired by Feign REST and
Kafka; its /start full-check flow is traced in SURVEY.md §3.1. Here
the entire lifecycle is ONE Spark job: driver = check service,
executors = extract workers, shuffle = Kafka.

Usage (cluster):

    spark-submit --py-files opengauss_tools_datachecker_performance_spark.zip \
        -m opengauss_tools_datachecker_performance_spark \
        --source s3://bucket/docs_source --sink s3://bucket/docs_sink \
        --assets s3://bucket/assets --report-dir out/ \
        --checkpoint-dir ckpt/ --resume

or locally: ``python -m opengauss_tools_datachecker_performance_spark ...``

Lifecycle: read inputs → (resume? anti-join completed partitions from
the checkpoint ledger) → validate_docs (schema pre-check, digest
tree, two-phase diff, uniqueness, referential, null-rule, drift) →
write report (violations + verdicts parquet, summary.json,
success/failed logs) → append per-partition lineage to the ledger.
Exit code 0 iff every validated partition passed every constraint.
"""

from __future__ import annotations

import argparse
import sys
import uuid

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="opengauss_tools_datachecker_performance_spark",
        description="PySpark-native schema + constraint validation of interleaved-doc tables",
    )
    p.add_argument("--source", required=True,
                   help="source docs table: parquet path or iceberg:db.tbl[@snapshot]")
    p.add_argument("--sink", default=None, help="sink docs table to diff against (optional)")
    p.add_argument("--assets", default=None, help="asset catalog for referential check")
    p.add_argument("--report-dir", required=True, help="report output directory")
    p.add_argument("--checkpoint-dir", default=None, help="lineage ledger directory")
    p.add_argument("--resume", action="store_true", help="skip partitions already 'done' in the ledger")
    p.add_argument("--partition-col", default="part")
    p.add_argument("--drift-threshold", type=float, default=0.15)
    p.add_argument(
        "--max-violations", type=int, default=None,
        help="cap ENUMERATED violation rows per (partition, constraint); "
             "verdict counts stay exact (guard rail for flooded diffs)",
    )
    p.add_argument("--run-id", default=None)
    p.add_argument("--master", default=None, help="override master (default: spark-submit / env)")
    return p


def main(argv: list[str] | None = None, spark: SparkSession | None = None) -> int:
    from opengauss_tools_datachecker_performance_spark.plans.lineage import (
        partition_stats,
        pending_partitions,
        record_partitions,
    )
    from opengauss_tools_datachecker_performance_spark.plans.report import write_report
    from opengauss_tools_datachecker_performance_spark.plans.runner import validate_docs

    args = build_parser().parse_args(argv)
    own_session = spark is None
    if own_session:
        from opengauss_tools_datachecker_performance_spark.session import get_spark

        spark = get_spark(app_name="datachecker-validate", master=args.master)

    from opengauss_tools_datachecker_performance_spark.sources.table_io import (
        load_table,
    )

    run_id = args.run_id or uuid.uuid4().hex[:12]
    docs_source = load_table(spark, args.source)
    docs_sink = load_table(spark, args.sink) if args.sink else None
    assets = load_table(spark, args.assets) if args.assets else None

    only: list[int] | None = None
    if args.resume and args.checkpoint_dir:
        universe = [
            r[0]
            for r in docs_source.select(args.partition_col).distinct().collect()
        ]
        only = pending_partitions(spark, args.checkpoint_dir, universe)
        print(f"[resume] {len(universe) - len(only)} partitions done, {len(only)} pending")
        if not only:
            print("[resume] nothing to do")
            if own_session:
                spark.stop()
            return 0

    result = validate_docs(
        docs_source,
        docs_sink,
        assets,
        partition_col=args.partition_col,
        only_partitions=only,
        drift_threshold=args.drift_threshold,
        max_violations_per_partition=args.max_violations,
    )
    summary = write_report(result, args.report_dir)

    if args.checkpoint_dir and result.schema_ok:
        src = docs_source
        if only is not None:
            src = src.filter(F.col(args.partition_col).isin(only))
        record_partitions(
            spark,
            args.checkpoint_dir,
            run_id,
            partition_stats(src, partition_col=args.partition_col),
        )

    ok = summary["result"] == "success"
    print(f"[validate] run={run_id} result={summary['result']}")
    if own_session:
        spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
