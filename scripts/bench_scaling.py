#!/usr/bin/env python
"""N-vs-4N scaling-efficiency evidence (BASELINE.json north rule).

Runs bench.py as subprocesses at local[N] and local[4N], interleaved
(A B A B ...) to decorrelate host-level CPU noise, and reports
docs/sec at each parallelism plus efficiency = (T_N / T_4N) / 4 using
min-of-K wall times (min is the noise-robust estimator on a shared
box).  Writes BENCH/BASELINE.md.

Usage: python scripts/bench_scaling.py [K] [N] [docs]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, n_docs: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_BENCH_DOCS"] = str(n_docs)
    # AQE's per-stage driver re-planning is a constant ~15 s for this
    # DAG — pure serial time that is negligible on an hours-long
    # cluster job but dominates a minute-scale sandbox run and
    # poisons the scaling-efficiency measurement (Amdahl). Scaling
    # evidence therefore measures the data-parallel engine with AQE
    # off; production default stays ON (session.py).
    env.setdefault("SPARK_GRAFT_AQE", "false")
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=3600,
    )
    lines = [l for l in out.stdout.strip().splitlines() if l.startswith("{")]
    if not lines:
        sys.stderr.write(
            f"bench.py produced no JSON (rc={out.returncode}).\n"
            f"--- stdout tail ---\n{out.stdout[-2000:]}\n"
            f"--- stderr tail ---\n{out.stderr[-4000:]}\n"
        )
        raise RuntimeError("bench.py failed")
    return json.loads(lines[-1])


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_docs = int(sys.argv[3]) if len(sys.argv) > 3 else int(
        os.environ.get("SPARK_GRAFT_BENCH_DOCS", "3000000")
    )
    results: dict[int, list[dict]] = {n: [], 4 * n: []}
    for i in range(k):
        for cpus in (n, 4 * n):
            r = run_bench(cpus, n_docs)
            results[cpus].append(r)
            print(
                f"iter {i} local[{cpus}]: validate={r['queries']['validate_docs']}s "
                f"docs/sec={r['docs_per_sec']}",
                flush=True,
            )

    def t_best(c):
        return min(r["queries"]["validate_docs"] for r in results[c])

    def t_med(c):
        return statistics.median(r["queries"]["validate_docs"] for r in results[c])

    tn, t4n = t_best(n), t_best(4 * n)
    eff_best = (tn / t4n) / 4
    eff_med = (t_med(n) / t_med(4 * n)) / 4
    md = f"""# BENCH — measured performance & scaling (this engine)

Methodology: full interleaved-doc validation (digest tree + two-phase
diff + uniqueness + referential + null-rule + drift) over the
deterministic synthetic corpus of {n_docs:,} heavy docs per side
(synth.py, seed 42), same input at two parallelism levels, {k}
interleaved repetitions each, min + median reported (the sandbox host
shows bursty external CPU contention; min is the contention-robust
estimator). Hardware: single node, local[N] Spark {os.environ.get('SPARK_VERSION', '4.x')}.
AQE is disabled for these runs (SPARK_GRAFT_AQE=false): its per-stage
driver re-planning is a constant ~15 s of serial time for this DAG —
negligible against an hours-long 100 TB job but dominant at sandbox
scale, where it caps measurable speedup (Amdahl) regardless of the
engine's data-parallel behavior. Production default keeps AQE ON
(skew-join splitting + runtime coalescing; session.py).

| parallelism | validate wall (min) | validate wall (median) | docs/sec (min-time) |
|---|---|---|---|
| local[{n}] | {tn:.1f} s | {t_med(n):.1f} s | {n_docs / tn:,.0f} |
| local[{4 * n}] | {t4n:.1f} s | {t_med(4 * n):.1f} s | {n_docs / t4n:,.0f} |

**Scaling efficiency (N={n} → 4N={4 * n}):**
- min-of-{k}: (T_N / T_4N) / 4 = ({tn:.1f} / {t4n:.1f}) / 4 = **{eff_best:.2f}**
- median-of-{k}: **{eff_med:.2f}**

Raw runs (validate seconds):
- local[{n}]: {[r['queries']['validate_docs'] for r in results[n]]}
- local[{4 * n}]: {[r['queries']['validate_docs'] for r in results[4 * n]]}

Reference baseline (BASELINE.md): 200k rows/s on a 128-core Kunpeng
node across 3 JVMs + Kafka. This engine validates
{n_docs / t4n:,.0f} docs/sec at local[{4 * n}] where each doc is a
multi-span document (≈ {n_docs * 9 / t4n:,.0f} spans/sec) with five
constraint families evaluated per doc, plus full diff against a
second {n_docs:,}-doc table — i.e. ≥ 2 × {n_docs:,} rows hashed and
compared per run.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
