"""Driver-contract query catalog, wave 17: operational validation —
rate anomalies, join-explosion pre-flight, parent-cardinality checks,
SLA quantile profiles, dedup reporting rollups.

* ``rate_anomaly`` — operators/temporal.rate_anomaly: tumbling-window
  event rates vs a trailing per-group baseline, with a dense window
  spine so outages score as anomalies.
* ``join_explosion_audit`` — operators/skew.join_explosion_audit: the
  top fan-out keys of a prospective join (n_left × n_right), the
  pre-flight that catches a 10^10-row join before it runs.
* ``childless_parents`` — checks/referential.childless_parents: 1:N
  parent-cardinality violations (planted parent rows with no child).
* ``group_quantile_profile`` — checks/stats.group_quantile_profile:
  exact per-group p50/p95/p99.
* ``cluster_size_histogram`` — operators/components.
  cluster_size_histogram over the wave-9 near-dup components (the
  recursive-CTE oracle re-derives the closure independently).
* ``dedup_rate_report`` — operators/dedup.dedup_rate_by_group:
  per-source duplicate-rate rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.entry_queries import (
    _t,
    query,
)
from opengauss_tools_datachecker_performance_spark.entry_queries_wave9 import (
    _SQL_CLUSTERS_CTE,
    _SQL_DOCS_CHAIN,
    _cluster_labels,
)

_DEC6 = "CAST(CAST(round({x}, 6) AS DECIMAL(18,6)) AS VARCHAR)"


@query(
    "rate_anomaly",
    f"""
    WITH b AS (
      SELECT event_type AS grp, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS bk FROM events
    ),
    counts AS (SELECT grp, bk, COUNT(*)::BIGINT AS n_events FROM b GROUP BY 1, 2),
    spine AS (
      SELECT grp, UNNEST(range(lo, hi + 1)) AS bk
      FROM (SELECT grp, MIN(bk) AS lo, MAX(bk) AS hi FROM counts GROUP BY 1)
    ),
    dense AS (
      SELECT s.grp, s.bk, COALESCE(c.n_events, 0) AS n_events
      FROM spine s LEFT JOIN counts c ON c.grp = s.grp AND c.bk = s.bk
    ),
    scored AS (
      SELECT grp, bk, n_events,
             AVG(n_events) OVER w AS m,
             STDDEV_SAMP(n_events) OVER w AS sd,
             COUNT(n_events) OVER w AS c
      FROM dense
      WINDOW w AS (PARTITION BY grp ORDER BY bk ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT grp AS "group",
           (bk * 3600)::BIGINT AS window_start,
           n_events,
           COALESCE({_DEC6.format(x='m')}, '') AS trailing_mean,
           COALESCE({_DEC6.format(x='CASE WHEN c >= 2 AND sd > 0 THEN (n_events - m) / sd END')}, '') AS z,
           COALESCE(CAST(CASE WHEN c >= 2 AND sd > 0 THEN ABS((n_events - m) / sd) > 3.0 WHEN c >= 2 AND sd = 0 THEN n_events <> m END AS VARCHAR), '') AS anomalous
    FROM scored
    """,
)
def q_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-rate anomaly scan (operators.temporal.rate_anomaly):
    per-type hourly rates vs the trailing-24h baseline; the dense
    window spine makes zero-traffic hours visible."""
    from opengauss_tools_datachecker_performance_spark.operators.temporal import (
        rate_anomaly,
    )

    out = rate_anomaly(
        _t(spark, sf_dir, "events"), "ts", "event_type", 60, 24, 3.0
    )
    dec6 = lambda c: F.round(c, 6).cast("decimal(18,6)").cast("string")  # noqa: E731
    return out.select(
        "group",
        # epoch seconds, not a formatted local time: engine- and
        # session-TZ-neutral
        F.col("window_start").cast("long").alias("window_start"),
        "n_events",
        # tri-state columns render NULL ("no verdict yet") as '' — a
        # nullable boolean reaches pandas as None from Spark but NaN
        # from DuckDB, which the driver's exact hasher sees as a diff
        F.coalesce(dec6(F.col("trailing_mean")), F.lit("")).alias("trailing_mean"),
        F.coalesce(dec6(F.col("z")), F.lit("")).alias("z"),
        F.coalesce(F.col("anomalous").cast("string"), F.lit("")).alias("anomalous"),
    )


@query(
    "join_explosion_audit",
    """
    WITH lc AS (SELECT l_orderkey, COUNT(*)::BIGINT AS n_left FROM lineitem GROUP BY 1),
    rc AS (SELECT l_orderkey, COUNT(*)::BIGINT AS n_right FROM lineitem GROUP BY 1)
    SELECT lc.l_orderkey, n_left, n_right, (n_left * n_right)::BIGINT AS n_out
    FROM lc JOIN rc USING (l_orderkey)
    ORDER BY n_out DESC, l_orderkey ASC LIMIT 20
    """,
)
def q_join_explosion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join fan-out pre-flight (operators.skew.join_explosion_audit):
    top-20 keys of a prospective lineitem self-join by output
    cardinality — two partial aggregates + a bounded top-k, no join
    executed."""
    from opengauss_tools_datachecker_performance_spark.operators.skew import (
        join_explosion_audit,
    )

    li = _t(spark, sf_dir, "lineitem")
    return join_explosion_audit(li, li, ["l_orderkey"], top_k=20)


@query(
    "childless_parents",
    """
    WITH parents AS (
      SELECT c_custkey FROM customer
      UNION ALL
      SELECT c_custkey + 100000 FROM customer WHERE c_custkey % 13 = 0
    )
    SELECT p.c_custkey
    FROM parents p
    LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
      ON o.o_custkey = p.c_custkey
    WHERE o.o_custkey IS NULL
    """,
)
def q_childless_parents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1:N parent-cardinality check
    (checks.referential.childless_parents): planted phantom customers
    own zero orders — the dual of the dangling-reference check."""
    from opengauss_tools_datachecker_performance_spark.checks.referential import (
        childless_parents,
    )

    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    phantom = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 13 == 0)
        .select((F.col("c_custkey") + 100000).alias("c_custkey"))
    )
    parents = cust.unionByName(phantom)
    orders = _t(spark, sf_dir, "orders")
    return childless_parents(
        parents, orders, ["o_custkey"], parent_key_cols=["c_custkey"]
    )


@query(
    "group_quantile_profile",
    f"""
    SELECT event_type AS "group",
           {_DEC6.format(x='quantile_cont(value, 0.5)')} AS q5,
           {_DEC6.format(x='quantile_cont(value, 0.95)')} AS q95,
           {_DEC6.format(x='quantile_cont(value, 0.99)')} AS q99,
           COUNT(*)::BIGINT AS n
    FROM events GROUP BY 1
    """,
)
def q_group_quantile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group exact quantile profile
    (checks.stats.group_quantile_profile): the SLA shape — p50/p95/p99
    of event values per type, one hash aggregate."""
    from opengauss_tools_datachecker_performance_spark.checks.stats import (
        group_quantile_profile,
    )

    out = group_quantile_profile(
        _t(spark, sf_dir, "events"), "event_type", "value"
    )
    dec6 = lambda c: F.round(c, 6).cast("decimal(18,6)").cast("string")  # noqa: E731
    return out.select(
        "group",
        dec6(F.col("q5")).alias("q5"),
        dec6(F.col("q95")).alias("q95"),
        dec6(F.col("q99")).alias("q99"),
        "n",
    )


@query(
    "cluster_size_histogram",
    f"""
    WITH RECURSIVE {_SQL_DOCS_CHAIN}, {_SQL_CLUSTERS_CTE},
    sizes AS (SELECT component, COUNT(*)::BIGINT AS cluster_size FROM lab GROUP BY 1)
    SELECT cluster_size, COUNT(*)::BIGINT AS n_clusters
    FROM sizes GROUP BY 1
    """,
)
def q_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size distribution of the near-dup components
    (operators.components.cluster_size_histogram) — the dedup-report
    headline; the oracle re-derives the closure via its independent
    recursive CTE."""
    from opengauss_tools_datachecker_performance_spark.operators.components import (
        cluster_size_histogram,
    )

    labels, _ = _cluster_labels(spark, sf_dir)
    return cluster_size_histogram(labels)


@query(
    "dedup_rate_report",
    f"""
    WITH docs2 AS (
      SELECT source, CAST(doc_id AS VARCHAR) AS doc_id, text FROM documents
      UNION ALL
      SELECT source, CAST(doc_id + 100000 AS VARCHAR), text
      FROM documents WHERE doc_id % 7 = 0
    ),
    per_fp AS (
      SELECT source AS "group",
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
             COUNT(*)::BIGINT AS n
      FROM docs2 GROUP BY 1, 2
    )
    SELECT "group",
           SUM(n)::BIGINT AS n_docs,
           SUM(n - 1)::BIGINT AS n_dup_docs,
           SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END)::BIGINT AS n_groups_with_dups,
           CAST(CAST(round(SUM(n - 1) / SUM(n)::DOUBLE, 6) AS DECIMAL(10,6)) AS VARCHAR) AS dup_rate
    FROM per_fp GROUP BY 1
    """,
)
def q_dedup_rate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplicate-rate rollup
    (operators.dedup.dedup_rate_by_group) over documents with the
    planted %7 duplicates — which source floods the corpus with
    copies."""
    from opengauss_tools_datachecker_performance_spark.operators.dedup import (
        dedup_rate_by_group,
    )

    d = _t(spark, sf_dir, "documents").select("source", "doc_id", "text")
    dups = d.filter(F.col("doc_id") % 7 == 0).select(
        "source", (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    return dedup_rate_by_group(
        d.unionByName(dups), "doc_id", "text", "source"
    )
