#!/usr/bin/env python
"""Interleaved A/B of the two-phase diff formulations in validate_docs:

  A: driver-side signature exchange (barrier = bucket_signatures.collect,
     mismatched buckets pushed back as a literal IN filter)
  B: in-plan exchange (barrier = count, diff job does union+agg +
     broadcast semi-join)

Alternating A,B,A,B,... inside ONE Spark session so the sandbox host's
bursty contention hits both variants equally; min-of-K per variant is
the decision statistic (see BENCH/BASELINE.md methodology).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from opengauss_tools_datachecker_performance_spark import get_spark  # noqa: E402
from opengauss_tools_datachecker_performance_spark.plans.runner import (  # noqa: E402
    validate_docs,
)


def run_once(spark, corpus, driver_exchange: bool) -> float:
    src = spark.read.parquet(f"{corpus}/docs_source.parquet")
    sink = spark.read.parquet(f"{corpus}/docs_sink.parquet")
    assets = spark.read.parquet(f"{corpus}/assets.parquet")
    t0 = time.monotonic()
    res = validate_docs(src, sink, assets, driver_exchange=driver_exchange)
    res.verdicts.collect()
    dt = time.monotonic() - t0
    for df in (
        res.violations,
        res.extras.get("digests_source"),
        res.extras.get("digests_sink"),
        res.extras.get("diffs"),
    ):
        if df is not None:
            df.unpersist()
    return dt


def main():
    cpus = sys.argv[1] if len(sys.argv) > 1 else "32"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    corpus = os.path.join(REPO, ".bench_cache", "docs_v2_3000000")
    spark = get_spark(
        app_name=f"ab-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus) * 2, 32),
    )
    run_once(spark, corpus, True)  # warmup (untimed)
    a, b = [], []
    for i in range(reps):
        a.append(round(run_once(spark, corpus, True), 2))
        print(f"  A(driver_exchange) rep{i}: {a[-1]}s", flush=True)
        b.append(round(run_once(spark, corpus, False), 2))
        print(f"  B(in-plan)         rep{i}: {b[-1]}s", flush=True)
    print({"A_driver_exchange": a, "A_min": min(a), "B_in_plan": b, "B_min": min(b)})
    spark.stop()


if __name__ == "__main__":
    main()
