#!/usr/bin/env python
"""Micro-bench of span-sequence digest formulations (diagnostic).

Variants (all preserve: array-order invariance via offset sort, null==''
quirk, no field-boundary collisions):

  A rolling   - F.aggregate rolling xxhash64 fold (current engine path)
  B canonical - transform->concat_ws per span, array_join, one xxhash64
  C structarr - xxhash64 over the sorted array<struct> with nulls
                coalesced to '' (single codegen'd hash call; HOF only
                for the sort projection)
  scan        - sum(size(spans)) floor: array lengths only
  sortonly    - sorted-spans materialization without hashing

Usage: python scripts/bench_digest_variants.py [cpus] [reps]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from opengauss_tools_datachecker_performance_spark import get_spark  # noqa: E402
from opengauss_tools_datachecker_performance_spark.digest import (  # noqa: E402
    _sorted_spans,
    span_sequence_canonical_col,
    span_sequence_hash_col,
)


def variant_structarr(spans_col):
    sorted_arr = _sorted_spans(spans_col)
    clean = F.transform(
        sorted_arr,
        lambda s: F.struct(
            F.coalesce(s["kind"], F.lit("")).alias("kind"),
            F.coalesce(s["text"], F.lit("")).alias("text"),
            F.coalesce(s["media_ref"], F.lit("")).alias("media_ref"),
        ),
    )
    return F.xxhash64(clean)


def main():
    cpus = sys.argv[1] if len(sys.argv) > 1 else "32"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    corpus = os.path.join(REPO, ".bench_cache", "docs_v2_3000000")
    spark = get_spark(
        app_name=f"digbench-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus) * 2, 32),
    )
    src = spark.read.parquet(f"{corpus}/docs_source.parquet")

    cases = {
        "scan_floor": lambda: src.select(F.sum(F.size("spans"))).collect(),
        "sortonly": lambda: src.select(
            F.sum(F.size(_sorted_spans(F.col("spans"))))
        ).collect(),
        "A_rolling": lambda: src.select(
            F.sum(span_sequence_hash_col(F.col("spans")))
        ).collect(),
        "B_canonical": lambda: src.select(
            F.sum(F.xxhash64(span_sequence_canonical_col(F.col("spans"))))
        ).collect(),
        "C_structarr": lambda: src.select(
            F.sum(variant_structarr(F.col("spans")))
        ).collect(),
    }
    out = {}
    for name, fn in cases.items():
        ts = []
        for _ in range(reps):
            t0 = time.monotonic()
            fn()
            ts.append(round(time.monotonic() - t0, 2))
        out[name] = ts
        print(f"{name}: {ts}", flush=True)
    print({"cpus": cpus, **out}, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
