#!/usr/bin/env python
"""Phase-by-phase wall-time profile of the flagship validation.

Forces each internal stage of validate_docs with its own action so we
can see where a slow run spends its time. Diagnostic tool only — the
bench measures the fused single-action plan.

Usage: python scripts/profile_validate.py [cpus] [corpus_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from opengauss_tools_datachecker_performance_spark import get_spark  # noqa: E402


def main():
    cpus = sys.argv[1] if len(sys.argv) > 1 else "32"
    corpus = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(REPO, ".bench_cache", "docs_v2_3000000")
    )
    spark = get_spark(
        app_name=f"profile-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus) * 2, 32),
    )
    src = spark.read.parquet(f"{corpus}/docs_source.parquet")
    sink = spark.read.parquet(f"{corpus}/docs_sink.parquet")
    assets = spark.read.parquet(f"{corpus}/assets.parquet")

    from opengauss_tools_datachecker_performance_spark.checks.drift import (
        drift_by_quantiles,
    )
    from opengauss_tools_datachecker_performance_spark.checks.span_rules import (
        span_rule_violations,
    )
    from opengauss_tools_datachecker_performance_spark.checks.uniqueness import (
        duplicate_keys_from_digests,
    )
    from opengauss_tools_datachecker_performance_spark.operators.diff import (
        diff_digests,
        first_divergent_span,
    )
    from opengauss_tools_datachecker_performance_spark.plans.runner import (
        _enriched_digests,
    )

    t = {}

    def phase(name, fn):
        t0 = time.monotonic()
        out = fn()
        t[name] = round(time.monotonic() - t0, 2)
        print(f"  {name}: {t[name]}s -> {out}", flush=True)
        return out

    phase("raw_scan_count_src", lambda: src.count())
    phase("raw_scan_count_src2", lambda: src.count())

    dig_src = _enriched_digests(src).persist()
    dig_sink = _enriched_digests(sink).persist()
    phase("digest_src", lambda: dig_src.count())
    phase("digest_sink", lambda: dig_sink.count())

    diffs = diff_digests(
        dig_src, dig_sink, two_phase=True, carry_cols=["part"], locate_spans=True
    ).persist()
    phase("diff_two_phase_with_span_locate", lambda: diffs.count())

    # body-comparing locator kept as the REFERENCE phase: shows what the
    # retired re-scan formulation would cost (runner now locates spans
    # inside the diff join above)
    upd = F.broadcast(diffs.filter(F.col("diff_type") == "update").select("key"))
    phase("span_locate_body_rescan", lambda: first_divergent_span(src, sink, upd).count())

    phase("uniqueness", lambda: duplicate_keys_from_digests(dig_src).count())
    phase("span_rules", lambda: span_rule_violations(src, assets).count())
    phase(
        "drift",
        lambda: drift_by_quantiles(
            dig_src.select("part", F.col("text_len").alias("metric")),
            group_col="part",
        ).count(),
    )
    print({"cpus": cpus, **t}, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
