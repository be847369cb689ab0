#!/usr/bin/env python
"""Benchmark harness.

Runs the headline operators at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric", "value" (total sec), "unit": "sec",
"queries": {name: sec}, "sf", plus docs/sec extras}.

The flagship measurement is the full interleaved-doc validation
(digest tree + diff + uniqueness + referential + null rule + drift)
over a deterministic synthetic corpus (synth.py, cached as parquet
under .bench_cache/) — the north-rule metric is validated docs/sec.
Scaling evidence (N vs 4N cores) comes from running this same script
at two SPARK_GRAFT_CPUS values; see scripts/bench_scaling.py and
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from opengauss_tools_datachecker_performance_spark import get_spark  # noqa: E402

# corpus size for the flagship validation bench (deterministic; cached).
# Docs are heavier than the pytest corpus (8-23 words × 4-13 spans ≈
# 0.8 KB/doc) so the bench is compute-bound, not stage-latency-bound.
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "3000000"))
N_PARTS = 64
_HEAVY = dict(min_spans=4, spans_spread=10, min_words=8, words_spread=16)


def _ensure_corpus(spark, cache_dir: str) -> str:
    """Generate-and-cache the synthetic doc corpus (once per N_DOCS)."""
    out = os.path.join(cache_dir, f"docs_v2_{N_DOCS}")
    marker = os.path.join(out, "_DONE")
    if not os.path.exists(marker):
        from opengauss_tools_datachecker_performance_spark.synth import write_corpus

        write_corpus(
            spark, out, n_docs=N_DOCS, n_assets=max(500, N_DOCS // 100),
            n_partitions=N_PARTS, **_HEAVY,
        )
        with open(marker, "w") as f:
            f.write("ok")
    return out


def _ensure_companions(
    spark, corpus_dir: str, cache_dir: str, n_docs: int | None = None
) -> str:
    """Build-and-cache digest companions for the bench corpus (the
    one-time ingest cost of the X2b production layout). The cache is
    keyed to the corpus build it derives from (the corpus _DONE
    marker's mtime) — a regenerated corpus invalidates the companion,
    otherwise the bench would diff OLD-corpus digests against the new
    corpus and record bogus numbers."""
    comp_dir = os.path.join(cache_dir, f"companion_{n_docs or N_DOCS}")
    marker = os.path.join(comp_dir, "_DONE")
    stamp = str(os.path.getmtime(os.path.join(corpus_dir, "_DONE")))
    if not (os.path.exists(marker) and open(marker).read() == stamp):
        from opengauss_tools_datachecker_performance_spark.sources.prehashed import (
            write_digest_companion,
        )

        for side in ("docs_source", "docs_sink"):
            write_digest_companion(
                spark.read.parquet(f"{corpus_dir}/{side}.parquet"),
                os.path.join(comp_dir, f"{side}.parquet"),
            )
        with open(marker, "w") as f:
            f.write(stamp)
    return comp_dir


def bench_validate_docs(
    spark, corpus_dir: str, docs_dir: str | None = None
) -> tuple[float, dict]:
    from opengauss_tools_datachecker_performance_spark.plans.runner import validate_docs

    d = docs_dir or corpus_dir
    src = spark.read.parquet(f"{d}/docs_source.parquet")
    sink = spark.read.parquet(f"{d}/docs_sink.parquet")
    assets = spark.read.parquet(f"{corpus_dir}/assets.parquet")
    t0 = time.monotonic()
    res = validate_docs(src, sink, assets)
    # single action: the verdict grid already carries per-cell violation
    # counts, so one collect drives the whole DAG
    rows = res.verdicts.collect()
    dt = time.monotonic() - t0
    n_viol = sum(r["n_violations"] for r in rows if r["constraint"] != "drift")
    n_fail = sum(1 for r in rows if r["status"] == "fail")
    for df in (
        res.violations,
        res.extras.get("digests_source"),
        res.extras.get("digests_sink"),
        res.extras.get("diffs"),
    ):
        if df is not None:
            df.unpersist()
    return dt, {"n_violations": n_viol, "n_failed_verdicts": n_fail}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.0
    spark = get_spark(
        app_name=f"bench-{cpus}", master=f"local[{cpus}]",
        shuffle_partitions=max(int(cpus) * 2, 32),
    )
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")
    os.makedirs(cache_dir, exist_ok=True)
    corpus_dir = _ensure_corpus(spark, cache_dir)

    queries: dict[str, float] = {}
    extras: dict = {}

    # flagship: full doc validation (north-rule metric). One untimed
    # warmup first: it absorbs JIT compilation of the generated code
    # and the microVM's first-touch paging of executor/storage memory
    # (see session.py) — one-time costs a long-running cluster job
    # never re-pays, so they don't belong in per-query timings. Then
    # min-of-K: the sandbox host shows bursty external contention
    # (steal + lock-holder-preemption kernel storms; same job varies
    # 5-10× back-to-back), and min is the noise-robust estimator of
    # the job's true cost on a quiet machine. K=5 (was 3): measured
    # multi-hour load drifts make 3 samples too few for the min to
    # find a quiet window; +2 reps ≈ +40 s bench wall, cheap.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "5"))
    extras["n_docs"] = N_DOCS
    # SPARK_GRAFT_BENCH_RAW=0 skips the raw-layout flagship so a
    # companion-only scaling sweep's subprocesses measure one workload
    if os.environ.get("SPARK_GRAFT_BENCH_RAW", "1") != "0":
        bench_validate_docs(spark, corpus_dir)  # warmup (untimed)
        times = []
        for _ in range(reps):
            dt, info = bench_validate_docs(spark, corpus_dir)
            times.append(dt)
        dt = min(times)
        queries["validate_docs"] = round(dt, 3)
        extras.update(info)
        extras["docs_per_sec"] = round(N_DOCS / dt, 1)
        extras["validate_docs_all_reps"] = [round(t, 3) for t in times]

    # the same validation over ingest-time digest companions (X2b,
    # sources/prehashed.py) — the recommended production layout:
    # body-free scan, byte-identical results (tests/test_prehashed.py)
    if os.environ.get("SPARK_GRAFT_BENCH_COMPANION", "1") != "0":
        comp_dir = _ensure_companions(spark, corpus_dir, cache_dir)
        bench_validate_docs(spark, corpus_dir, docs_dir=comp_dir)  # warmup
        ctimes = []
        cinfo: dict = {}
        for _ in range(reps):
            cdt, cinfo = bench_validate_docs(spark, corpus_dir, docs_dir=comp_dir)
            ctimes.append(cdt)
        cdt = min(ctimes)
        # the companion run's own validation-result counts go under
        # suffixed keys ALWAYS (not setdefault: the raw flagship's
        # counts must never mask them) — a silently empty companion
        # cache would otherwise be indistinguishable from a fast
        # correct run
        for k, v in cinfo.items():
            extras[f"{k}_companion"] = v
        queries["validate_docs_companion"] = round(cdt, 3)
        extras["docs_per_sec_companion"] = round(N_DOCS / cdt, 1)
        extras["validate_docs_companion_all_reps"] = [round(t, 3) for t in ctimes]

    # operator benches over the driver testdata tables
    from opengauss_tools_datachecker_performance_spark.entry_queries import QUERIES

    # same methodology as the flagship: first run is the cold one
    # (Janino codegen + stage-scheduling warmup — one-time costs a
    # long-running cluster job never re-pays) and is reported
    # separately; the headline number is min of the warm reps.
    # SPARK_GRAFT_BENCH_OPS=0 skips this block (the N-vs-4N scaling
    # sweep only needs the flagship; see scripts/bench_scaling.py).
    op_names = [
        "diff_full_outer",
        "digest_buckets",
        "uniqueness_check",
        "referential_check",
        "column_stats",
        # training-data-pipeline operators (documents/embeddings tables)
        "dedup_exact",
        "minhash_near_dup",
        "ngram_jaccard_pairs",
        "near_dup_clusters",
        "simhash_near_dup",
        "embedding_near_dup",
        "embedding_near_dup_ivf",
        "cosine_topk",
        "cosine_topk_fast",
        "ann_lsh",
        "ann_ivf",
        "ann_ivf_pq",
        "token_count",
        "vocab_stats",
        "lm_surprisal",
        "tfidf_top_terms",
        "quality_filter",
        "semantic_decontaminate",
        "text_quality",
        "lang_id_profile",
        "drift_quantile_profile",
        # corpus hygiene (wave 10)
        "decontaminate",
        "repetition_stats",
        "pii_scan",
        "mixing_plan",
        "duplicate_spans",
        # wave 12/13: interleaved audits + snapshot scope + profiling
        "media_context_audit",
        "offset_integrity",
        "interleaved_profile",
        "snapshot_delta",
        "snapshot_drift",
        "asset_usage",
        "doc_length_histogram",
        # wave 14: web-corpus curation
        "url_dedup",
        "budget_prune",
        # wave 15: constraint/distribution checks, CDC merge, temporal
        "fd_check",
        "pk_gap_scan",
        "benford_profile",
        "chi2_drift",
        "outlier_mad",
        "merge_upsert",
        "as_of_join",
        "sessionize",
        "range_join_count",
        # wave 16/17: operational validation
        "json_props_audit",
        "containment_pairs",
        "equiwidth_histogram",
        "rate_anomaly",
        "join_explosion_audit",
        "group_quantile_profile",
        "cluster_size_histogram",
        "dedup_rate_report",
        # wave 18: persisted ANN index, FD discovery, winnowing
        "ann_index_query",
        "fd_discovery",
        "winnow_fingerprints",
        # wave 19: release gates (splits, equi-depth, k-anonymity,
        # line-level boilerplate removal)
        "dataset_split",
        "equidepth_histogram_price",
        "k_anonymity",
        "boilerplate_removal",
        "span_transitions",
    ]
    if os.environ.get("SPARK_GRAFT_BENCH_OPS", "1") == "0":
        op_names = []
    queries_cold: dict[str, float] = {}
    for name in op_names:
        reps_t = []
        for i in range(3):
            t0 = time.monotonic()
            QUERIES[name](spark, sf_dir).count()
            reps_t.append(time.monotonic() - t0)
            # operators that persist intermediates (minhash LSH buckets
            # etc.) would otherwise accumulate cached partitions across
            # reps — drop them so each rep is self-contained
            spark.catalog.clearCache()
        queries_cold[name] = round(reps_t[0], 3)
        queries[name] = round(min(reps_t[1:]), 3)
    extras["queries_cold_first_run"] = queries_cold

    total = round(sum(queries.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_headline_runtime",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": sf,
                "cpus": int(cpus),
                **extras,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
