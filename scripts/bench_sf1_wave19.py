#!/usr/bin/env python
"""Data-scaling evidence for the round-4 release-gate operators
(VERDICT r04 "next round" item 6): ``equidepth_histogram`` (bounded
global-rank, operators/skew.py global_rank_cumsum — no single-task
ROW_NUMBER window) and ``remove_boilerplate_report`` (distinct-pair
two-phase line frequency + small_side anti-join).  Both rest on
bounded-global-pass claims benched only at sf0.1 until now; this
script runs each at 1x and 10x the sf0.1 documents table and reports
wall ratios plus a plan-shape identity check.

Corpus construction (deterministic):
* equidepth: value = length(text) + a replica jitter so the 10x corpus
  has 10x distinct (value, tiebreak) rank entries, not 10 ties per
  rank (ties would understate the rank shuffle).
* boilerplate: every doc gets a replica-invariant footer menu of 3
  lines planted on ~1/3 of docs, so the boilerplate line set (the
  frequency table's heavy tail) is SCALE-INVARIANT while per-line
  doc counts scale 10x — the honest "same plan, 10x rows through the
  distinct-pair aggregate" probe.

Plan identity: the OPTIMIZED LOGICAL plan (ids normalized) must be
EQUAL across scales — growth may change numbers, never the operator
DAG.  The PHYSICAL join strategies are reported as info and may
legitimately shift with size (Catalyst/AQE's whole job: e.g. the
boilerplate report's totals⟕rebuilt join is a broadcast join at 1x
and a sort-merge join at 10x, both from the same logical plan —
that shift IS the 100-TB story, not a plan instability).

Usage: python scripts/bench_sf1_wave19.py [repA repB]   # default 1 10
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""
from __future__ import annotations

import io
import json
import os
import re
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark import get_spark
from opengauss_tools_datachecker_performance_spark.checks.distributions import (
    equidepth_histogram,
)
from opengauss_tools_datachecker_performance_spark.operators.lines import (
    remove_boilerplate_report,
)

FOOTER = "SUBSCRIBE NOW\nFOLLOW US ON SOCIAL\nALL RIGHTS RESERVED"


def build_docs(spark, sf_dir: str, rep: int):
    base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    reps = spark.range(rep).select(F.col("id").alias("r"))
    # replica marker INSIDE the natural text line: replicas must not
    # duplicate each other's content lines (that would make every
    # whole document a "boilerplate line" at rep>=3); only the planted
    # footer is replica-invariant, so its doc-count scales with rep
    # while the natural-line universe scales too
    marked = F.concat(
        F.col("text"), F.lit(" r"), F.col("r").cast("string")
    )
    return (
        base.crossJoin(reps)
        .select(
            # fixed stride 128 (> max rep), NOT rep: `* 1` would
            # constant-fold away at rep=1 and make the two scales'
            # plans differ in the harness's own projection
            (F.col("doc_id") * 128 + F.col("r")).alias("doc_id"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(marked, F.lit("\n" + FOOTER)),
            )
            .otherwise(marked)
            .alias("text"),
            # replica jitter: distinct histogram values per replica
            (F.length("text") + F.col("r")).cast("double").alias("val"),
        )
        .repartition(64)
    )


def logical_shape(df) -> str:
    """Optimized logical plan with ids/sizes normalized: the
    size-independent operator DAG."""
    s = df._jdf.queryExecution().optimizedPlan().toString()
    s = re.sub(r"#\d+L?", "#N", s)
    s = re.sub(r"\d+", "N", s)
    return s


def join_strategies(df) -> list[str]:
    """Physical join operators chosen for this frame (static plan)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return sorted(
        set(re.findall(r"(\w*(?:HashJoin|MergeJoin|NestedLoopJoin))", buf.getvalue()))
    )


def plan_shape(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    s = buf.getvalue()
    s = re.sub(r"Statistics\([^)]*\)", "Statistics(...)", s)  # runtime stats
    s = re.sub(r"#\d+L?", "#N", s)  # expression ids
    s = re.sub(r"\(\d+\)", "(N)", s)  # operator ids
    s = re.sub(r"\d+", "N", s)  # partition counts / sizes
    return s


def run_scale(spark, sf_dir: str, rep: int) -> dict:
    docs = build_docs(spark, sf_dir, rep).persist()
    n_docs = docs.count()

    eq = equidepth_histogram(docs, "val", ["doc_id"], n_bins=16)
    static_eq = logical_shape(eq)
    js_eq = join_strategies(eq)
    t0 = time.time()
    eq_rows = eq.collect()
    t_eq = time.time() - t0
    depths = [int(r["n"]) for r in eq_rows]

    bp = remove_boilerplate_report(docs, min_docs=3)
    static_bp = logical_shape(bp)
    js_bp = join_strategies(bp)
    t1 = time.time()
    bp_agg = bp.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_removed").alias("n_removed"),
    ).collect()[0]
    t_bp = time.time() - t1

    docs.unpersist()
    return {
        "rep": rep,
        "n_docs": n_docs,
        "equidepth_sec": round(t_eq, 1),
        "equidepth_bins": len(depths),
        "equidepth_depth_spread": max(depths) - min(depths),
        "boilerplate_sec": round(t_bp, 1),
        "boilerplate_docs": int(bp_agg["n_docs"]),
        "boilerplate_removed": int(bp_agg["n_removed"]),
        # logical shapes captured pre-execution (size-independent
        # invariant); the physical join strategies are the engine's
        # size-adaptive choice, reported as info
        "_shapes": {
            "equidepth": static_eq,
            "boilerplate": static_bp,
        },
        "join_strategies": {
            "equidepth": js_eq,
            "boilerplate": js_bp,
        },
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = [int(x) for x in sys.argv[1:3]] or [1, 10]
    spark = get_spark(app_name="sf1-wave19", shuffle_partitions=64)
    a = run_scale(spark, sf_dir, reps[0])
    b = run_scale(spark, sf_dir, reps[1])
    same_plans = {
        k: a["_shapes"][k] == b["_shapes"][k] for k in a["_shapes"]
    }
    for row in (a, b):
        row.pop("_shapes")
        print(json.dumps(row))
    print(
        json.dumps(
            {
                "docs_ratio": round(b["n_docs"] / a["n_docs"], 2),
                "equidepth_wall_ratio": round(
                    b["equidepth_sec"] / max(a["equidepth_sec"], 0.1), 2
                ),
                "boilerplate_wall_ratio": round(
                    b["boilerplate_sec"] / max(a["boilerplate_sec"], 0.1), 2
                ),
                "removed_ratio": round(
                    b["boilerplate_removed"]
                    / max(a["boilerplate_removed"], 1),
                    2,
                ),
                "logical_plans_identical": same_plans,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
