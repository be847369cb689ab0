#!/usr/bin/env python
"""A/B: full validation over digest-companion tables vs raw doc tables.

Writes the digest companion (sources.prehashed) for the cached bench
corpus once, then interleaves min-of-K timed validate_docs runs over
both inputs at the same parallelism. Also prints the on-disk bytes of
each layout — the companion's scan-volume cut is the mechanism (the
digest stage is memory-bandwidth-bound on parquet nested-span text
decode; hashing itself measured cheap in bench_digest_variants.py).

Usage: python scripts/ab_prehashed.py [cpus] [reps] [n_docs]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import _ensure_companions  # noqa: E402  (shared cache protocol)
from opengauss_tools_datachecker_performance_spark import get_spark  # noqa: E402
from opengauss_tools_datachecker_performance_spark.plans.runner import (  # noqa: E402
    validate_docs,
)


def _du(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    cpus = sys.argv[1] if len(sys.argv) > 1 else "32"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 3_000_000
    spark = get_spark(
        app_name=f"ab-prehashed-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus) * 2, 32),
    )
    corpus = os.path.join(REPO, ".bench_cache", f"docs_v2_{n_docs}")
    src = spark.read.parquet(f"{corpus}/docs_source.parquet")
    sink = spark.read.parquet(f"{corpus}/docs_sink.parquet")
    assets = spark.read.parquet(f"{corpus}/assets.parquet")

    t0 = time.monotonic()
    comp_dir = _ensure_companions(
        spark, corpus, os.path.join(REPO, ".bench_cache"), n_docs
    )
    built = time.monotonic() - t0
    if built > 5:
        print(f"companion build: {built:.1f}s (one-time, at ingest)")
    csrc = spark.read.parquet(f"{comp_dir}/docs_source.parquet")
    csnk = spark.read.parquet(f"{comp_dir}/docs_sink.parquet")

    raw_b = _du(f"{corpus}/docs_source.parquet") + _du(f"{corpus}/docs_sink.parquet")
    comp_b = _du(f"{comp_dir}/docs_source.parquet") + _du(f"{comp_dir}/docs_sink.parquet")
    print(
        f"bytes on disk: raw={raw_b / 1e6:.0f}MB companion={comp_b / 1e6:.0f}MB "
        f"({raw_b / max(comp_b, 1):.1f}x smaller scan)"
    )

    def run(a, b) -> float:
        t0 = time.monotonic()
        res = validate_docs(a, b, assets)
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

    run(src, sink)  # warmup (JIT + first-touch paging)
    run(csrc, csnk)
    results: dict[str, list[float]] = {"raw": [], "companion": []}
    for _ in range(reps):  # interleave to decorrelate host noise
        results["raw"].append(run(src, sink))
        results["companion"].append(run(csrc, csnk))
    r, c = min(results["raw"]), min(results["companion"])
    print(f"raw      : min={r:.2f}s reps={[round(t, 2) for t in results['raw']]}")
    print(f"companion: min={c:.2f}s reps={[round(t, 2) for t in results['companion']]}")
    print(f"speedup: {r / c:.2f}x  ({n_docs} docs/side, local[{cpus}])")
    spark.stop()


if __name__ == "__main__":
    main()
