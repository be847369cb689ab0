"""Deterministic dataset splitting — the train/val/test assignment a
training-data pipeline runs after curation (beyond-reference LLM-ops
layer, same family as operators/curation.py).

Assignment must be (a) reproducible across runs and engines — no
``rand()``; (b) stable under corpus growth — adding documents must not
reassign existing ones (the classic leakage bug when val docs drift
into train between data refreshes); (c) shuffle-free — a pure
projection.  All three fall out of hashing the document id with the
portable seeded md5 hash (functions/hashing.py) onto a fixed integer
wheel and carving the wheel by cumulative fractions: one map-side
expression, identical in DuckDB for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.functions.hashing import (
    portable_hash64_seeded,
    portable_hash64_seeded_sql,
)

WHEEL = 1_000_000


def _wheel_bounds(fractions: list[tuple[str, float]]) -> list[tuple[str, int, int]]:
    """[(name, lo, hi)) wheel slices from ordered (name, fraction)
    pairs; the last slice absorbs rounding so the wheel is exactly
    covered.  Fraction order is part of the split contract (document
    it with the seed)."""
    total = sum(f for _, f in fractions)
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bounds, acc = [], 0.0
    for i, (name, frac) in enumerate(fractions):
        lo = int(round(acc * WHEEL))
        acc += frac
        hi = WHEEL if i == len(fractions) - 1 else int(round(acc * WHEEL))
        bounds.append((name, lo, hi))
    return bounds


def hash_split(
    df: DataFrame,
    id_col: str,
    fractions: list[tuple[str, float]],
    seed: int = 0,
    split_name: str = "split",
) -> DataFrame:
    """Append a deterministic ``split`` column: the id's seeded
    portable hash mod WHEEL, mapped through the cumulative-fraction
    slices.  Pure projection — no shuffle, no state, stable under
    appends (an id's slice never depends on other rows)."""
    # NULL ids hash via a reserved sentinel on BOTH engines: Spark's
    # concat_ws would silently drop a NULL component (hashing just the
    # seed) while DuckDB's || propagates NULL (assigning no split) —
    # the coalesce makes the two agree AND keeps NULL distinct from
    # any real id string
    id_str = F.coalesce(F.col(id_col).cast("string"), F.lit("\x00null"))
    wheel = F.pmod(portable_hash64_seeded(id_str, seed), F.lit(WHEEL))
    expr = None
    for name, lo, hi in _wheel_bounds(fractions):
        cond = (wheel >= lo) & (wheel < hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(split_name, expr)


def hash_split_sql(id_expr: str, fractions: list[tuple[str, float]], seed: int = 0) -> str:
    """DuckDB rendering of the identical assignment (oracle parity),
    including the NULL-id sentinel."""
    safe = f"COALESCE(CAST({id_expr} AS VARCHAR), chr(0) || 'null')"
    wheel = f"(({portable_hash64_seeded_sql(safe, seed)}) % {WHEEL})"
    cases = " ".join(
        f"WHEN {wheel} >= {lo} AND {wheel} < {hi} THEN '{name}'"
        for name, lo, hi in _wheel_bounds(fractions)
    )
    return f"CASE {cases} END"


def split_report(
    df: DataFrame,
    id_col: str,
    fractions: list[tuple[str, float]],
    group_col: str | None = None,
    seed: int = 0,
) -> DataFrame:
    """Split-quality rollup → (group?, split, n_docs, share): realized
    per-split document share (6-dp decimal string) so a skewed or
    mis-seeded split is visible before training reads a byte.  One
    partial-aggregated groupBy; the share denominator is a per-group
    window over the split-count frame (groups x splits rows, tiny)."""
    from pyspark.sql.window import Window

    s = hash_split(df, id_col, fractions, seed)
    keys = ([group_col] if group_col else []) + ["split"]
    counts = s.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_docs"))
    denom = F.sum("n_docs").over(
        Window.partitionBy(*([group_col] if group_col else []))
    )
    return counts.select(
        *keys,
        "n_docs",
        F.round(F.col("n_docs") / denom, 6)
        .cast("decimal(10,6)")
        .cast("string")
        .alias("share"),
    )
