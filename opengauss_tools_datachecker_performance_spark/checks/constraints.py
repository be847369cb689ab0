"""Declarative data-quality constraints (deequ-style) as Spark plans.

The reference validates tables by diffing two copies; a validation
engine also needs SINGLE-TABLE contract checks — the rule families
every warehouse-quality harness ships: functional dependencies, value
domains, cross-column predicates, pattern conformance, completeness,
and key-sequence gaps.  Each check is one declarative aggregation (or
partitioned window) so Catalyst keeps it partial-aggregated and
shuffle-minimal; none collects per-group row sets.

Reference anchors: the rule plumbing generalizes the reference's
row/column rule filters (datachecker-common/.../ConditionLimit.java,
datachecker-extract/.../CheckPoint.java auto-increment slicing); the
verdict shape (constraint, status, violations) matches
plans/report.py's grid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def fd_violations(
    df: DataFrame, lhs_cols: list[str], rhs_cols: list[str]
) -> DataFrame:
    """Functional-dependency check lhs → rhs: one row per lhs group
    that maps to MORE than one distinct rhs tuple —
    → (<lhs...>, n_rows, n_distinct_rhs, rhs_min, rhs_max).

    Two-phase aggregate: distinct (lhs, rhs) pairs first (partial
    aggregation collapses duplicates map-side), then a count per lhs —
    no COUNT(DISTINCT) expand, no skew amplification on hot lhs keys.
    ``rhs_min``/``rhs_max`` give a witness pair of conflicting values.

    The rhs tuple encoding is NULL-safe: concat_ws silently drops NULL
    components, which would make a NULL rhs collide with '' and make
    ('a', NULL) encode like (NULL, 'a') — so each component is
    coalesced to a reserved sentinel before joining.  SQL NULL
    semantics for the dependency itself: NULL is treated as a distinct
    marked value (matching GROUP BY), so a group mapping to {'x', NULL}
    counts 2 distinct rhs tuples.
    """
    rhs_tuple = F.concat_ws(
        "\x1f",
        *[
            F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
            for c in rhs_cols
        ],
    )
    pairs = (
        df.select(*lhs_cols, rhs_tuple.alias("_rhs"))
        .groupBy(*lhs_cols, "_rhs")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    return (
        pairs.groupBy(*lhs_cols)
        .agg(
            F.sum("_n").alias("n_rows"),
            F.count(F.lit(1)).alias("n_distinct_rhs"),
            F.min("_rhs").alias("rhs_min"),
            F.max("_rhs").alias("rhs_max"),
        )
        .filter(F.col("n_distinct_rhs") > 1)
    )


def domain_violations(
    df: DataFrame, col: str, allowed: list[str], key_col: str
) -> DataFrame:
    """Value-set containment: rows whose ``col`` is outside ``allowed``
    (NULL counts as a violation — an allowed NULL belongs in the list
    explicitly) → (value, n_rows, min_key, max_key) per bad value."""
    bad = df.filter(
        ~F.col(col).isin(allowed) | F.col(col).isNull()
    )
    return bad.groupBy(F.col(col).alias("value")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min(F.col(key_col).cast("string")).alias("min_key"),
        F.max(F.col(key_col).cast("string")).alias("max_key"),
    )


def cross_column_violations(
    df: DataFrame, predicates: dict[str, Column], key_col: str
) -> DataFrame:
    """Row-level inter-column invariants: ``predicates`` maps a
    constraint name to a boolean Column that must hold on every row →
    (constraint, n_violations, min_key, max_key), one row per
    constraint INCLUDING fully-passing ones (n_violations=0) — absence
    of evidence is not evidence of checking.

    One scan evaluates every predicate (a 0/1 projection per rule,
    summed in a single partial aggregate); NULL predicate results count
    as violations (unknown is not satisfied)."""
    aggs = []
    for name, pred in predicates.items():
        viol = F.when(pred.isNull() | ~pred, 1).otherwise(0)
        key = F.when(viol == 1, F.col(key_col).cast("string"))
        aggs.append(
            F.struct(
                F.lit(name).alias("constraint"),
                F.sum(viol).cast("long").alias("n_violations"),
                F.min(key).alias("min_key"),
                F.max(key).alias("max_key"),
            ).alias(f"_c_{name}")
        )
    rolled = df.agg(*aggs)
    # one input row (the single agg row) explodes to #constraints rows
    cols = rolled.columns
    return rolled.select(
        F.explode(F.array(*[F.col(c) for c in cols])).alias("c")
    ).select("c.constraint", "c.n_violations", "c.min_key", "c.max_key")


def regex_conformance(
    df: DataFrame, rules: dict[str, str]
) -> DataFrame:
    """Pattern-conformance rates: ``rules`` maps column → regex the
    values should fully match → (column, pattern, n_rows, n_matching,
    conform_rate).  NULLs count as non-matching.  Single scan, one
    partial aggregate; rate emitted as a 6-dp decimal string so both
    engines hash identically."""
    aggs = []
    for col, pattern in rules.items():
        m = F.when(F.col(col).rlike(pattern), 1).otherwise(0)
        aggs.append(
            F.struct(
                F.lit(col).alias("column_name"),
                F.lit(pattern).alias("pattern"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(m).cast("long").alias("n_matching"),
            ).alias(f"_r_{col}")
        )
    rolled = df.agg(*aggs)
    cols = rolled.columns
    flat = rolled.select(
        F.explode(F.array(*[F.col(c) for c in cols])).alias("r")
    ).select("r.column_name", "r.pattern", "r.n_rows", "r.n_matching")
    return flat.withColumn(
        "conform_rate",
        F.round(F.col("n_matching") / F.col("n_rows"), 6)
        .cast("decimal(10,6)")
        .cast("string"),
    )


def completeness(
    df: DataFrame, cols: list[str], min_ratio: float = 0.95
) -> DataFrame:
    """Per-column completeness: non-NULL, non-blank ratio with a
    pass/fail verdict → (column_name, n_rows, n_null, n_blank,
    completeness, status).  Blank = empty/whitespace-only string (only
    meaningful for string columns; others report n_blank=0)."""
    aggs = []
    for col in cols:
        c = F.col(col)
        is_null = F.when(c.isNull(), 1).otherwise(0)
        is_blank = F.when(
            c.isNotNull() & (F.trim(c.cast("string")) == ""), 1
        ).otherwise(0)
        aggs.append(
            F.struct(
                F.lit(col).alias("column_name"),
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(is_null).cast("long").alias("n_null"),
                F.sum(is_blank).cast("long").alias("n_blank"),
            ).alias(f"_k_{col}")
        )
    rolled = df.agg(*aggs)
    cols_out = rolled.columns
    flat = rolled.select(
        F.explode(F.array(*[F.col(c) for c in cols_out])).alias("k")
    ).select("k.column_name", "k.n_rows", "k.n_null", "k.n_blank")
    ratio = (F.col("n_rows") - F.col("n_null") - F.col("n_blank")) / F.col(
        "n_rows"
    )
    return flat.select(
        "column_name",
        "n_rows",
        "n_null",
        "n_blank",
        F.round(ratio, 6).cast("decimal(10,6)").cast("string").alias(
            "completeness"
        ),
        F.when(ratio >= min_ratio, F.lit("pass"))
        .otherwise(F.lit("fail"))
        .alias("status"),
    )


def pk_gaps(df: DataFrame, key_col: str, n_buckets: int = 256) -> DataFrame:
    """Missing runs in a dense integer key sequence →
    (gap_start, gap_end, gap_len): every maximal run of absent keys
    strictly inside [min(key), max(key)].

    The reference slices auto-increment tables BETWEEN checkpoints
    (CheckPoint.java); a gap scan is the integrity dual — it proves the
    slicing key is actually dense.  Scale shape: keys are value-range
    bucketed (same trick as slice planning), the lag() window runs
    PARTITIONED per bucket, and only the #buckets boundary rows travel
    to a second pass — no global sort, no single-task window."""
    k = F.col(key_col).cast("long")
    keys = df.select(k.alias("k")).filter(F.col("k").isNotNull()).distinct()
    mm = keys.agg(F.min("k").alias("lo"), F.max("k").alias("hi")).collect()[0]
    if mm["lo"] is None:
        return keys.sparkSession.createDataFrame(
            [], "gap_start long, gap_end long, gap_len long"
        )
    lo, hi = int(mm["lo"]), int(mm["hi"])
    span = max(hi - lo + 1, 1)
    # bucket in DOUBLE space: long math ((k-lo) * n_buckets) overflows
    # for 64-bit-wide key ranges (snowflake ids, span near 2^63) and
    # silently breaks bucket monotonicity; the double ratio is monotone
    # non-decreasing, and the least() cap absorbs the k=hi edge where
    # rounding could land exactly on n_buckets
    bucket = F.least(
        F.lit(n_buckets - 1),
        (
            (F.col("k").cast("double") - F.lit(float(lo)))
            / F.lit(float(span))
            * F.lit(n_buckets)
        ).cast("int"),
    )
    b = keys.withColumn("_b", bucket)
    w = Window.partitionBy("_b").orderBy("k")
    intra = (
        b.withColumn("_prev", F.lag("k").over(w))
        .filter(F.col("_prev").isNotNull() & (F.col("k") - F.col("_prev") > 1))
        .select(
            (F.col("_prev") + 1).alias("gap_start"),
            (F.col("k") - 1).alias("gap_end"),
        )
    )
    # cross-bucket seams: compare each bucket's min against the
    # previous NON-EMPTY bucket's max — #buckets rows, tiny window
    edges = b.groupBy("_b").agg(F.min("k").alias("_bmin"), F.max("k").alias("_bmax"))
    ew = Window.partitionBy(F.lit(0)).orderBy("_b")
    seams = (
        edges.withColumn("_pmax", F.lag("_bmax").over(ew))
        .filter(F.col("_pmax").isNotNull() & (F.col("_bmin") - F.col("_pmax") > 1))
        .select(
            (F.col("_pmax") + 1).alias("gap_start"),
            (F.col("_bmin") - 1).alias("gap_end"),
        )
    )
    return intra.unionByName(seams).select(
        "gap_start",
        "gap_end",
        (F.col("gap_end") - F.col("gap_start") + 1).alias("gap_len"),
    )


def json_field_audit(
    df: DataFrame, col: str, field: str, field_type: str = "int"
) -> DataFrame:
    """Schema-on-read JSON audit of a string column carrying JSON
    objects → ONE row: (n_rows, n_null_raw, n_malformed,
    n_missing_field, n_with_field, min_val, max_val, sum_val).

    ``n_malformed`` counts non-NULL strings ``from_json`` cannot parse
    (surfaced through the PERMISSIVE corrupt-record column — a
    malformed row yields a struct of NULL fields, NOT a NULL struct,
    so ``parsed.isNull()`` alone cannot see it); ``n_missing_field``
    counts parseable objects where ``field`` is absent or not
    coercible to ``field_type`` — matching the DuckDB oracle's
    json_valid / TRY_CAST(json_extract) split.  Single scan, single
    partial aggregate."""
    raw = F.col(col)
    parsed = F.from_json(
        raw,
        f"{field} {field_type}, _corrupt string",
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
    )
    val = parsed[field]
    malformed = raw.isNotNull() & parsed["_corrupt"].isNotNull()
    missing = raw.isNotNull() & ~malformed & val.isNull()
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(raw.isNull(), 1).otherwise(0)).cast("long").alias("n_null_raw"),
        F.sum(F.when(malformed, 1).otherwise(0)).cast("long").alias("n_malformed"),
        F.sum(F.when(missing, 1).otherwise(0)).cast("long").alias("n_missing_field"),
        F.sum(F.when(val.isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_with_field"),
        F.min(val).alias("min_val"),
        F.max(val).alias("max_val"),
        F.sum(val).cast("long").alias("sum_val"),
    )


def fd_discovery(
    df: DataFrame, cols: list[str], max_violation_rate: float = 0.05
) -> DataFrame:
    """Functional-dependency DISCOVERY (profiling, not checking): for
    every ordered pair (lhs, rhs) of ``cols``, measure how close
    lhs → rhs is to holding → (lhs, rhs, n_lhs_groups,
    n_violating_groups, violation_rate, holds).

    One scan melts each row into its #pairs (pair, lhs_val, rhs_val)
    tuples; three stacked partial aggregates do the rest (distinct
    pair-values → per-lhs distinct-rhs counts → per-pair rollup) — the
    same skew-immune two-phase shape as :func:`fd_violations`, never a
    COUNT(DISTINCT) expand.  ``holds`` = violation_rate ≤
    ``max_violation_rate`` — the approximate-FD acceptance used by
    profilers (exact FDs at 0.0)."""
    pairs = [(a, b) for a in cols for b in cols if a != b]
    melted = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f"{a}->{b}").alias("pair"),
                        F.col(a).cast("string").alias("lhs_val"),
                        F.col(b).cast("string").alias("rhs_val"),
                    )
                    for a, b in pairs
                ]
            )
        ).alias("p")
    ).select("p.pair", "p.lhs_val", "p.rhs_val")
    distinct_pairs = melted.groupBy("pair", "lhs_val", "rhs_val").agg(
        F.count(F.lit(1)).alias("_n")
    )
    per_lhs = distinct_pairs.groupBy("pair", "lhs_val").agg(
        F.count(F.lit(1)).alias("_n_rhs")
    )
    out = per_lhs.groupBy("pair").agg(
        F.count(F.lit(1)).alias("n_lhs_groups"),
        F.sum(F.when(F.col("_n_rhs") > 1, 1).otherwise(0)).alias(
            "n_violating_groups"
        ),
    )
    rate = F.col("n_violating_groups") / F.col("n_lhs_groups")
    return out.select(
        F.substring_index("pair", "->", 1).alias("lhs"),
        F.substring_index("pair", "->", -1).alias("rhs"),
        "n_lhs_groups",
        "n_violating_groups",
        F.round(rate, 6).cast("decimal(10,6)").cast("string").alias(
            "violation_rate"
        ),
        (rate <= max_violation_rate).alias("holds"),
    )
