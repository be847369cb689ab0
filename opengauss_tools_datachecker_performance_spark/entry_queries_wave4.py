"""Driver-contract query catalog, wave 4.

Remaining coverage rows:

* ``ann_lsh`` — the similarity-search *scale path*: LSH-bucketed ANN
  (random-hyperplane signatures → bucket-equality candidates → exact
  cosine re-score) vs brute force (``cosine_topk``). Signatures are
  computed over floor-quantized integer projections so bucket
  assignment is bit-identical in Spark and DuckDB.
* ``table_rules`` — P5 table black/white regex selection (reference
  RuleParser semantics: white list wins when both set;
  datachecker-check/.../modules/rule/RuleParser.java:42-70,
  config/application.yml:24-41).
* ``throughput_window`` — A8 sliding-window throughput aggregation
  (reference CheckRateCache.java:35-117 keeps a 30s sliding rows/sec
  rate); here a 1h window sliding by 30min over the events table —
  the same ``F.window`` agg runs unchanged under Structured Streaming
  (readStream + watermark), which is the §2.9 growth path.

Registered into entry_queries.QUERIES/ORACLES via the same decorator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.entry_queries import _t, query
from opengauss_tools_datachecker_performance_spark.operators.similarity import (
    plane_weights,
)

# ---------------------------------------------------------------------------
# similarity scale path: LSH-bucketed ANN (operators.similarity.lsh_ann_topk)
# ---------------------------------------------------------------------------

_DIMS, _N_PLANES, _N_TABLES, _QSCALE = 64, 8, 2, 1_000_000.0


def _sql_sig(var: str, table: int) -> str:
    """DuckDB expression for the hyperplane signature of integer-array
    ``var`` — same planes as operators.similarity.hyperplane_signature."""
    terms = []
    for p in range(_N_PLANES):
        w = plane_weights(table, p, _DIMS)
        arr = "[" + ",".join(str(x) for x in w) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product({var}, {arr}) > 0 THEN {1 << p} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


_ANN_LSH_SQL = f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv,
             list_transform(embedding::DOUBLE[], x -> CAST(floor(x * {_QSCALE}) AS BIGINT)) AS qi
      FROM embeddings WHERE vec_id % 50 = 0
    ),
    c AS (
      SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv,
             list_transform(embedding::DOUBLE[], x -> CAST(floor(x * {_QSCALE}) AS BIGINT)) AS ci
      FROM embeddings
    ),
    cand AS (
      SELECT query_id, neighbor_id, qv, cv FROM q, c
      WHERE neighbor_id <> query_id AND {_sql_sig('ci', 0)} = {_sql_sig('qi', 0)}
      UNION
      SELECT query_id, neighbor_id, qv, cv FROM q, c
      WHERE neighbor_id <> query_id AND {_sql_sig('ci', 1)} = {_sql_sig('qi', 1)}
    ),
    s AS (
      SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS cs FROM cand
    ),
    r AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS rank
      FROM s
    )
    SELECT query_id, neighbor_id, rank FROM r WHERE rank <= 5
"""


@query("ann_lsh", _ANN_LSH_SQL)
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate nearest neighbors
    (operators.similarity.lsh_ann_topk): 2 hash tables × 8
    deterministic hyperplanes, candidates by bucket equality, exact
    cosine re-score of candidates only. At scale the candidate join
    replaces the |Q|×|C| cross product with ~|C|/2^planes per query."""
    from opengauss_tools_datachecker_performance_spark.operators.similarity import (
        lsh_ann_topk,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.filter(F.col("vec_id") % 50 == 0)
    return lsh_ann_topk(
        queries_df,
        emb,
        k=5,
        dims=_DIMS,
        n_planes=_N_PLANES,
        n_tables=_N_TABLES,
        quantize_scale=_QSCALE,
    )


# ---------------------------------------------------------------------------
# P5 table black/white regex rules
# ---------------------------------------------------------------------------

_ALL_TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

#: scenario → (white, black). Scenario 'both' shows white-wins; 'black'
#: shows exclusion; 'none' passes everything through.
_RULE_SCENARIOS: dict[str, tuple[list[str] | None, list[str] | None]] = {
    "both": (["part.*", "order.*"], ["orders"]),
    "black": (["e.*", "nation"], None),  # black-only
    "none": (None, None),
}

_TABLE_VALUES = ", ".join(f"('{n}')" for n in _ALL_TABLES)


def _sql_rule_case(scenario: str, white: list[str] | None, black: list[str] | None) -> str:
    if white:
        cond = " OR ".join(f"regexp_full_match(name, '{p}')" for p in white)
    elif black:
        cond = "NOT (" + " OR ".join(f"regexp_full_match(name, '{p}')" for p in black) + ")"
    else:
        cond = "TRUE"
    return f"SELECT '{scenario}' AS scenario, name AS table_name FROM names WHERE {cond}"


_TABLE_RULES_SQL = (
    f"WITH names AS (SELECT name FROM (VALUES {_TABLE_VALUES}) t(name))\n    "
    + "\n    UNION ALL\n    ".join(
        _sql_rule_case(s, w, b)
        for s, (w, b) in _RULE_SCENARIOS.items()
        # note: scenario 'both' passes black=["orders"] to the engine but
        # the SQL applies only the white list — that asymmetry IS the
        # assertion that white wins over black.
    )
)


@query("table_rules", _TABLE_RULES_SQL)
def q_table_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 table selection rules (checks.rules.TableRules): regex
    white/black lists over the catalog's table names; white wins when
    both are set (RuleParser.java:42-70). Control-plane logic — runs at
    plan time exactly like the reference — surfaced as a DataFrame so
    the oracle can check the selection semantics independently."""
    from opengauss_tools_datachecker_performance_spark.checks.rules import TableRules

    rows = []
    for scenario, (white, black) in _RULE_SCENARIOS.items():
        for name in TableRules(white=white, black=black).select_tables(_ALL_TABLES):
            rows.append((scenario, name))
    return spark.createDataFrame(rows, "scenario string, table_name string")


# ---------------------------------------------------------------------------
# A8 sliding-window throughput aggregation
# ---------------------------------------------------------------------------

# Each event belongs to exactly two (1h, slide 30m) windows: the one
# starting at its 30-min bucket and the one 30 minutes earlier.
_THROUGHPUT_SQL = """
    WITH w AS (
      SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS ws, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL 30 MINUTE, ts) - INTERVAL 30 MINUTE AS ws, value FROM events
    )
    SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n_events,
           CAST(CAST(round(COUNT(*) / 3600.0, 6) AS DECIMAL(12,6)) AS VARCHAR) AS events_per_sec,
           CAST(CAST(round(SUM(value), 4) AS DECIMAL(18,4)) AS VARCHAR) AS sum_value
    FROM w GROUP BY ws
"""


@query("throughput_window", _THROUGHPUT_SQL)
def q_throughput_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 sliding-window throughput (reference CheckRateCache.java:35-117):
    1-hour windows sliding by 30 minutes over events → events/sec +
    value rollup. Pure ``F.window`` tumbling/sliding agg — identical
    code runs under Structured Streaming (readStream + watermark)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.count(F.lit(1)) / 3600.0, 6)
            .cast("decimal(12,6)")
            .cast("string")
            .alias("events_per_sec"),
            F.round(F.sum("value"), 4)
            .cast("decimal(18,4)")
            .cast("string")
            .alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "events_per_sec",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# brute-force cosine top-k, Arrow/BLAS execution (same semantics/oracle
# as cosine_topk; integer-only output so the float-accumulation-order
# difference between gemm and the JVM fold is invisible unless two
# candidates tie below ~1e-12 — not the case on these fixtures)
# ---------------------------------------------------------------------------

_COSINE_FAST_SQL = """
    WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id % 50 = 0),
    c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings),
    s AS (
      SELECT query_id, neighbor_id, list_cosine_similarity(qv, cv) AS cs
      FROM q, c WHERE neighbor_id <> query_id
    ),
    r AS (
      SELECT query_id, neighbor_id,
             row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS rank
      FROM s
    )
    SELECT query_id, neighbor_id, rank FROM r WHERE rank <= 5
"""


@query("cosine_topk_fast", _COSINE_FAST_SQL)
def q_cosine_topk_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k on the Arrow/BLAS path
    (operators.similarity.brute_force_topk_vectorized): one gemm per
    corpus Arrow batch against the closure-shipped query matrix,
    per-batch partial top-k, global window top-k — the throughput
    variant of ``cosine_topk`` (same oracle)."""
    from opengauss_tools_datachecker_performance_spark.operators.similarity import (
        brute_force_topk_vectorized,
    )

    emb = _t(spark, sf_dir, "embeddings")
    return brute_force_topk_vectorized(emb.filter(F.col("vec_id") % 50 == 0), emb, k=5)
