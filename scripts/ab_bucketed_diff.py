#!/usr/bin/env python
"""A/B: row-level consistency diff over bucketed vs plain parquet tables.

Writes the bench corpus bucketed by doc_id (sources.bucketed), then
times the digest + full-outer classify over both layouts at the same
parallelism, printing the per-layout wall and the number of key
Exchanges in each executed plan. Shows the engine's dominant shuffle
disappearing when the two tables share a bucket layout — the 100 TB
co-location argument (README / sources/bucketed.py) with numbers.

Usage: python scripts/ab_bucketed_diff.py [cpus] [reps]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from opengauss_tools_datachecker_performance_spark import get_spark  # noqa: E402
from opengauss_tools_datachecker_performance_spark.operators.diff import (  # noqa: E402
    classify_diff,
)
from opengauss_tools_datachecker_performance_spark.plans.runner import (  # noqa: E402
    _enriched_digests,
)
from opengauss_tools_datachecker_performance_spark.sources.bucketed import (  # noqa: E402
    read_bucketed,
    write_bucketed_docs,
)


def main() -> None:
    cpus = sys.argv[1] if len(sys.argv) > 1 else "32"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_buckets = 64
    spark = get_spark(
        app_name=f"ab-bucketed-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus) * 2, 32),
    )
    corpus = os.path.join(REPO, ".bench_cache", "docs_v2_3000000")
    src = spark.read.parquet(f"{corpus}/docs_source.parquet")
    sink = spark.read.parquet(f"{corpus}/docs_sink.parquet")

    bdir = os.path.join(REPO, ".bench_cache", f"bucketed_{n_buckets}")
    if not spark.catalog.tableExists("ab_bsrc"):
        write_bucketed_docs(src, "ab_bsrc", n_buckets, path=f"{bdir}/src")
        write_bucketed_docs(sink, "ab_bsnk", n_buckets, path=f"{bdir}/snk")

    def diff_of(a, b):
        # two_phase=False isolates the row-level join — the layout's
        # beneficiary; the signature prune is layout-independent
        return classify_diff(_enriched_digests(a), _enriched_digests(b))

    def measure(name, a, b):
        d = diff_of(a, b)
        plan = d._jdf.queryExecution().executedPlan().toString()
        n_exch = plan.count("Exchange hashpartitioning(key")
        ts = []
        for _ in range(reps + 1):  # first is warmup
            t0 = time.monotonic()
            n = d.count()
            ts.append(time.monotonic() - t0)
        print(
            f"{name}: min={min(ts[1:]):.2f}s reps={[round(t, 2) for t in ts[1:]]} "
            f"key_exchanges={n_exch} diffs={n}",
            flush=True,
        )
        return min(ts[1:]), n_exch

    # interleave to decorrelate host noise
    results = {}
    for i in range(2):
        results.setdefault("parquet", []).append(measure("parquet ", src, sink))
        results.setdefault("bucketed", []).append(
            measure("bucketed", read_bucketed(spark, "ab_bsrc"), read_bucketed(spark, "ab_bsnk"))
        )
    for k, v in results.items():
        print(f"{k}: best={min(t for t, _ in v):.2f}s key_exchanges={v[0][1]}")
    spark.stop()


if __name__ == "__main__":
    main()
