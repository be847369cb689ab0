"""Driver-contract query catalog, wave 15: single-table contract
checks (deequ-style), distribution-shape checks, CDC merge, and
temporal operators.

* ``fd_check`` / ``domain_check`` / ``cross_column_check`` /
  ``regex_conformance`` / ``completeness_check`` / ``pk_gap_scan`` —
  checks/constraints.py: the declarative data-quality rule families
  over planted deterministic violations.
* ``benford_profile`` / ``chi2_drift`` / ``outlier_mad`` —
  checks/distributions.py.
* ``merge_upsert`` — operators/cdc_apply.py: folding the deterministic
  CDC batch into orders must reproduce the _sink_orders mutation
  EXACTLY, so the oracle runs over the independent sink SQL.
* ``as_of_join`` / ``sessionize`` / ``range_join_count`` —
  operators/temporal.py: union-carry-forward as-of, gap-and-island
  sessionization, bucketed interval join (no non-equi join).
* ``oracle_canon`` — canon.py Oracle-dialect expressions
  (OracleResultSetHandler.java:40-54) over derived RAW/BLOB/CLOB/
  NUMBER columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opengauss_tools_datachecker_performance_spark.entry_queries import (
    _SINK_ORDERS_SQL,
    _sink_orders,
    _t,
    query,
)

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_SQL = "%Y-%m-%d %H:%M:%S.%f"


# ---------------------------------------------------------------------------
# constraint checks
# ---------------------------------------------------------------------------


@query(
    "fd_check",
    """
    WITH pairs AS (
      SELECT o_custkey, o_orderpriority AS _rhs, COUNT(*) AS _n
      FROM orders GROUP BY 1, 2
    )
    SELECT o_custkey, SUM(_n)::BIGINT AS n_rows,
           COUNT(*)::BIGINT AS n_distinct_rhs,
           MIN(_rhs) AS rhs_min, MAX(_rhs) AS rhs_max
    FROM pairs GROUP BY 1 HAVING COUNT(*) > 1
    """,
)
def q_fd_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit o_custkey → o_orderpriority
    (checks.constraints.fd_violations): customers whose orders carry
    conflicting priorities, two-phase distinct-pair aggregate (no
    COUNT(DISTINCT) expand)."""
    from opengauss_tools_datachecker_performance_spark.checks.constraints import (
        fd_violations,
    )

    return fd_violations(
        _t(spark, sf_dir, "orders"), ["o_custkey"], ["o_orderpriority"]
    )


@query(
    "domain_check",
    f"""
    WITH sink AS ({_SINK_ORDERS_SQL})
    SELECT o_orderstatus AS value, COUNT(*)::BIGINT AS n_rows,
           MIN(CAST(o_orderkey AS VARCHAR)) AS min_key,
           MAX(CAST(o_orderkey AS VARCHAR)) AS max_key
    FROM sink WHERE o_orderstatus NOT IN ('O', 'F', 'P')
              OR o_orderstatus IS NULL
    GROUP BY 1
    """,
)
def q_domain_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-domain containment (checks.constraints.domain_violations):
    the mutated sink's planted 'X' statuses fall outside the allowed
    {O,F,P} set."""
    from opengauss_tools_datachecker_performance_spark.checks.constraints import (
        domain_violations,
    )

    sink = _sink_orders(_t(spark, sf_dir, "orders"))
    return domain_violations(
        sink, "o_orderstatus", ["O", "F", "P"], "o_orderkey"
    )


_MUT_LINEITEM_SQL = """
    SELECT l_orderkey, l_linenumber, l_quantity,
           CASE WHEN l_orderkey % 89 = 3 THEN l_discount + 1.0 ELSE l_discount END AS l_discount,
           CASE WHEN l_orderkey % 97 = 5 THEN -0.01 ELSE l_tax END AS l_tax
    FROM lineitem
"""


def _mut_lineitem(li: DataFrame) -> DataFrame:
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.when(F.col("l_orderkey") % 89 == 3, F.col("l_discount") + 1.0)
        .otherwise(F.col("l_discount"))
        .alias("l_discount"),
        F.when(F.col("l_orderkey") % 97 == 5, F.lit(-0.01))
        .otherwise(F.col("l_tax"))
        .alias("l_tax"),
    )


@query(
    "cross_column_check",
    f"""
    WITH m AS ({_MUT_LINEITEM_SQL}),
    k AS (
      SELECT *, CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR) AS key
      FROM m
    )
    SELECT 'disc_range' AS constraint_name, SUM(CASE WHEN l_discount BETWEEN 0 AND 0.1 THEN 0 ELSE 1 END)::BIGINT AS n_violations,
           MIN(CASE WHEN NOT (l_discount BETWEEN 0 AND 0.1) THEN key END) AS min_key,
           MAX(CASE WHEN NOT (l_discount BETWEEN 0 AND 0.1) THEN key END) AS max_key
    FROM k
    UNION ALL
    SELECT 'tax_nonneg', SUM(CASE WHEN l_tax >= 0 THEN 0 ELSE 1 END)::BIGINT,
           MIN(CASE WHEN NOT (l_tax >= 0) THEN key END),
           MAX(CASE WHEN NOT (l_tax >= 0) THEN key END)
    FROM k
    UNION ALL
    SELECT 'qty_positive', SUM(CASE WHEN l_quantity > 0 THEN 0 ELSE 1 END)::BIGINT,
           MIN(CASE WHEN NOT (l_quantity > 0) THEN key END),
           MAX(CASE WHEN NOT (l_quantity > 0) THEN key END)
    FROM k
    """,
)
def q_cross_column_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level inter-column invariants
    (checks.constraints.cross_column_violations): planted discount /
    tax violations in a mutated lineitem; every constraint reports a
    row even at zero violations.  One scan evaluates all rules."""
    from opengauss_tools_datachecker_performance_spark.checks.constraints import (
        cross_column_violations,
    )

    m = _mut_lineitem(_t(spark, sf_dir, "lineitem")).withColumn(
        "key",
        F.concat_ws(
            "_",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
        ),
    )
    out = cross_column_violations(
        m,
        {
            "disc_range": (F.col("l_discount") >= 0) & (F.col("l_discount") <= 0.1),
            "tax_nonneg": F.col("l_tax") >= 0,
            "qty_positive": F.col("l_quantity") > 0,
        },
        "key",
    )
    return out.withColumnRenamed("constraint", "constraint_name")


@query(
    "regex_conformance",
    r"""
    SELECT 'p_brand' AS column_name, '^Brand#[0-9]+$' AS pattern,
           COUNT(*)::BIGINT AS n_rows,
           SUM(CASE WHEN regexp_matches(p_brand, '^Brand#[0-9]+$') THEN 1 ELSE 0 END)::BIGINT AS n_matching,
           CAST(CAST(round(SUM(CASE WHEN regexp_matches(p_brand, '^Brand#[0-9]+$') THEN 1 ELSE 0 END) / COUNT(*)::DOUBLE, 6) AS DECIMAL(10,6)) AS VARCHAR) AS conform_rate
    FROM part
    UNION ALL
    SELECT 'p_name', '^[a-z ]+$', COUNT(*)::BIGINT,
           SUM(CASE WHEN regexp_matches(p_name, '^[a-z ]+$') THEN 1 ELSE 0 END)::BIGINT,
           CAST(CAST(round(SUM(CASE WHEN regexp_matches(p_name, '^[a-z ]+$') THEN 1 ELSE 0 END) / COUNT(*)::DOUBLE, 6) AS DECIMAL(10,6)) AS VARCHAR)
    FROM part
    UNION ALL
    SELECT 'p_type', '^[A-Z]+$', COUNT(*)::BIGINT,
           SUM(CASE WHEN regexp_matches(p_type, '^[A-Z]+$') THEN 1 ELSE 0 END)::BIGINT,
           CAST(CAST(round(SUM(CASE WHEN regexp_matches(p_type, '^[A-Z]+$') THEN 1 ELSE 0 END) / COUNT(*)::DOUBLE, 6) AS DECIMAL(10,6)) AS VARCHAR)
    FROM part
    """,
)
def q_regex_conformance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern-conformance rates (checks.constraints.regex_conformance)
    over the part dimension — anchored full-match semantics in both
    engines (rlike / regexp_matches share the RE2-safe patterns)."""
    from opengauss_tools_datachecker_performance_spark.checks.constraints import (
        regex_conformance,
    )

    return regex_conformance(
        _t(spark, sf_dir, "part"),
        {
            "p_brand": "^Brand#[0-9]+$",
            "p_name": "^[a-z ]+$",
            "p_type": "^[A-Z]+$",
        },
    )


_MUT_DOCS_SQL = """
    SELECT doc_id, source, lang,
           CASE WHEN doc_id % 11 = 5 THEN NULL
                WHEN doc_id % 13 = 4 THEN ''
                ELSE text END AS text
    FROM documents
"""


@query(
    "completeness_check",
    f"""
    WITH m AS ({_MUT_DOCS_SQL}),
    f AS (
      SELECT 'text' AS column_name, COUNT(*)::BIGINT AS n_rows,
             SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
             SUM(CASE WHEN text IS NOT NULL AND TRIM(text) = '' THEN 1 ELSE 0 END)::BIGINT AS n_blank
      FROM m
      UNION ALL
      SELECT 'lang', COUNT(*)::BIGINT,
             SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END)::BIGINT,
             SUM(CASE WHEN lang IS NOT NULL AND TRIM(lang) = '' THEN 1 ELSE 0 END)::BIGINT
      FROM m
      UNION ALL
      SELECT 'source', COUNT(*)::BIGINT,
             SUM(CASE WHEN source IS NULL THEN 1 ELSE 0 END)::BIGINT,
             SUM(CASE WHEN source IS NOT NULL AND TRIM(source) = '' THEN 1 ELSE 0 END)::BIGINT
      FROM m
    )
    SELECT column_name, n_rows, n_null, n_blank,
           CAST(CAST(round((n_rows - n_null - n_blank) / n_rows::DOUBLE, 6) AS DECIMAL(10,6)) AS VARCHAR) AS completeness,
           CASE WHEN (n_rows - n_null - n_blank) / n_rows::DOUBLE >= 0.9
                THEN 'pass' ELSE 'fail' END AS status
    FROM f
    """,
)
def q_completeness_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column completeness with pass/fail verdicts
    (checks.constraints.completeness) over documents with planted NULL
    and blank texts."""
    from opengauss_tools_datachecker_performance_spark.checks.constraints import (
        completeness,
    )

    d = _t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "lang",
        F.when(F.col("doc_id") % 11 == 5, F.lit(None).cast("string"))
        .when(F.col("doc_id") % 13 == 4, F.lit(""))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return completeness(d, ["text", "lang", "source"], min_ratio=0.9)


@query(
    "pk_gap_scan",
    f"""
    WITH sink AS ({_SINK_ORDERS_SQL}),
    k AS (SELECT DISTINCT o_orderkey AS k FROM sink),
    g AS (SELECT k, LAG(k) OVER (ORDER BY k) AS pk FROM k)
    SELECT pk + 1 AS gap_start, k - 1 AS gap_end, k - pk - 1 AS gap_len
    FROM g WHERE pk IS NOT NULL AND k - pk > 1
    """,
)
def q_pk_gap_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-key gap scan (checks.constraints.pk_gaps): the mutated
    sink's deleted keys (every 97th) and sparse high-range inserts
    surface as missing runs — bucketed lag windows, no global sort."""
    from opengauss_tools_datachecker_performance_spark.checks.constraints import (
        pk_gaps,
    )

    sink = _sink_orders(_t(spark, sf_dir, "orders"))
    return pk_gaps(sink, "o_orderkey")


# ---------------------------------------------------------------------------
# distribution checks
# ---------------------------------------------------------------------------


@query(
    "benford_profile",
    """
    WITH d AS (
      SELECT CAST(SUBSTR(CAST(CAST(round(ABS(o_totalprice) * 100) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
      FROM orders WHERE o_totalprice IS NOT NULL AND ABS(o_totalprice) >= 0.01
    ),
    c AS (SELECT digit, COUNT(*)::BIGINT AS n FROM d GROUP BY 1)
    SELECT digit, n,
           CAST(CAST(round(n / SUM(n) OVER (), 6) AS DECIMAL(18,6)) AS VARCHAR) AS observed_p,
           CAST(CAST(round(log10(1.0 + 1.0 / digit), 6) AS DECIMAL(18,6)) AS VARCHAR) AS expected_p,
           CAST(CAST(round(ABS(n / SUM(n) OVER () - log10(1.0 + 1.0 / digit)), 6) AS DECIMAL(18,6)) AS VARCHAR) AS abs_dev
    FROM c
    """,
)
def q_benford_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit profile
    (checks.distributions.benford_profile) of order totals — digit
    derived integer-side (cents string) so both engines agree bit-for-
    bit."""
    from opengauss_tools_datachecker_performance_spark.checks.distributions import (
        benford_profile,
    )

    return benford_profile(_t(spark, sf_dir, "orders"), "o_totalprice")


@query(
    "chi2_drift",
    f"""
    WITH sink AS ({_SINK_ORDERS_SQL}),
    a AS (SELECT o_orderstatus AS category, COUNT(*)::BIGINT AS n_src FROM orders GROUP BY 1),
    b AS (SELECT o_orderstatus AS category, COUNT(*)::BIGINT AS n_sink FROM sink GROUP BY 1),
    j AS (
      SELECT COALESCE(a.category, b.category) AS category,
             COALESCE(n_src, 0) AS n_src, COALESCE(n_sink, 0) AS n_sink
      FROM a FULL OUTER JOIN b ON a.category = b.category
    )
    SELECT category, n_src, n_sink,
           CAST(CAST(round(n_src / SUM(n_src) OVER (), 6) AS DECIMAL(18,6)) AS VARCHAR) AS p_src,
           CAST(CAST(round(n_sink / SUM(n_sink) OVER (), 6) AS DECIMAL(18,6)) AS VARCHAR) AS p_sink,
           CAST(CAST(round(
             CASE WHEN n_src > 0 THEN
               POW(n_sink / SUM(n_sink) OVER () - n_src / SUM(n_src) OVER (), 2)
                 / (n_src / SUM(n_src) OVER ())
             END, 8) AS DECIMAL(18,8)) AS VARCHAR) AS chi2_term
    FROM j
    """,
)
def q_chi2_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical drift with chi-square contributions
    (checks.distributions.categorical_drift_chi2): orders vs the
    mutated sink over o_orderstatus; the planted 'X' category reports
    chi2_term NULL (new category, not averaged away)."""
    from opengauss_tools_datachecker_performance_spark.checks.distributions import (
        categorical_drift_chi2,
    )

    orders = _t(spark, sf_dir, "orders")
    return categorical_drift_chi2(orders, _sink_orders(orders), "o_orderstatus")


@query(
    "outlier_mad",
    """
    WITH m AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 601 = 7 THEN o_totalprice * 1000
                  ELSE o_totalprice END AS price
      FROM orders
    ),
    med AS (SELECT median(price) AS med FROM m),
    mad AS (SELECT median(ABS(price - (SELECT med FROM med))) AS mad FROM m)
    SELECT CAST(o_orderkey AS VARCHAR) AS key,
           CAST(CAST(round(price, 2) AS DECIMAL(18,2)) AS VARCHAR) AS value
    FROM m
    WHERE ABS(price - (SELECT med FROM med))
          / (1.4826 * (SELECT mad FROM mad)) > 3.5
    """,
)
def q_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust median/MAD outliers (checks.distributions.mad_outliers):
    planted ×1000 prices sit thousands of robust σ out — exact
    percentile aggregates, broadcast scalar threshold."""
    from opengauss_tools_datachecker_performance_spark.checks.distributions import (
        mad_outliers,
    )

    m = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 601 == 7, F.col("o_totalprice") * 1000)
        .otherwise(F.col("o_totalprice"))
        .alias("price"),
    )
    out = mad_outliers(m, "o_orderkey", "price", k=3.5)
    return out.select(
        "key",
        F.round(F.col("value"), 2).cast("decimal(18,2)").cast("string").alias("value"),
    )


# ---------------------------------------------------------------------------
# CDC merge
# ---------------------------------------------------------------------------


@query(
    "merge_upsert",
    f"""
    WITH sink AS ({_SINK_ORDERS_SQL})
    SELECT o_orderstatus, COUNT(*)::BIGINT AS n_orders,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                     AS DECIMAL(28,2)) AS VARCHAR) AS sum_price,
           MIN(CAST(o_orderkey AS VARCHAR)) AS min_key,
           MAX(CAST(o_orderkey AS VARCHAR)) AS max_key
    FROM sink GROUP BY 1
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE semantics (operators.cdc_apply.apply_cdc): a CDC batch
    built from the same deterministic rules as the sink mutation
    (delete %97, update %101, insert %103+10M) folded into orders must
    reproduce _sink_orders EXACTLY — the oracle aggregates the
    independent sink SQL, so any merge defect (lost delete, stale
    update, dropped insert) breaks the hash."""
    from opengauss_tools_datachecker_performance_spark.operators.cdc_apply import (
        apply_cdc,
    )

    orders = _t(spark, sf_dir, "orders")
    deletes = orders.filter(F.col("o_orderkey") % 97 == 0).select(
        *orders.columns, F.lit("d").alias("op")
    )
    updates = (
        orders.filter(
            (F.col("o_orderkey") % 101 == 7) & (F.col("o_orderkey") % 97 != 0)
        )
        .withColumn("o_totalprice", F.col("o_totalprice") + 1)
        .select(*orders.columns, F.lit("u").alias("op"))
    )
    inserts = orders.filter(F.col("o_orderkey") % 103 == 11).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_custkey",
        F.lit("X").alias("o_orderstatus"),
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
        F.lit("c").alias("op"),
    )
    changes = deletes.unionByName(updates).unionByName(inserts)
    merged = apply_cdc(orders, changes, "o_orderkey")
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        # exact decimal fold, STRING render (catalog hash-stable form)
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(28,2)")
        .cast("string")
        .alias("sum_price"),
        F.min(F.col("o_orderkey").cast("string")).alias("min_key"),
        F.max(F.col("o_orderkey").cast("string")).alias("max_key"),
    )


# ---------------------------------------------------------------------------
# temporal operators
# ---------------------------------------------------------------------------


@query(
    "as_of_join",
    f"""
    WITH u AS (
      SELECT event_id, user_id, ts, 1 AS side, NULL::DOUBLE AS rv
      FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT event_id, user_id, ts, 0 AS side, value AS rv
      FROM events WHERE event_type = 'purchase'
    ),
    c AS (
      SELECT event_id, side,
             LAST_VALUE(rv IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, side, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS av
      FROM u
    )
    SELECT event_id,
           CAST(CAST(round(av, 4) AS DECIMAL(18,4)) AS VARCHAR) AS asof_value
    FROM c WHERE side = 1
    """,
)
def q_as_of_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (operators.temporal.as_of_join): each click event
    picks up the latest prior purchase value of the same user — union
    + keyed carry-forward window, one shuffle, no per-row probe."""
    from opengauss_tools_datachecker_performance_spark.operators.temporal import (
        as_of_join,
    )

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    j = as_of_join(
        clicks,
        purchases,
        "user_id",
        "ts",
        ["value"],
        tiebreak_cols=["event_id"],
    )
    return j.select(
        "event_id",
        F.round(F.col("asof_value"), 4)
        .cast("decimal(18,4)")
        .cast("string")
        .alias("asof_value"),
    )


@query(
    "sessionize",
    f"""
    WITH g AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                       OR epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)) > 86400000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    s AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_id
      FROM g
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*)::BIGINT AS n_events,
           strftime(MIN(ts), '{_TS_SQL}') AS session_start,
           strftime(MAX(ts), '{_TS_SQL}') AS session_end
    FROM s GROUP BY 1, 2
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (operators.temporal.sessionize, 24 h
    gap): keyed lag + running-sum windows, one aggregate — the
    distributed gap-and-island."""
    from opengauss_tools_datachecker_performance_spark.operators.temporal import (
        sessionize,
    )

    s = sessionize(
        _t(spark, sf_dir, "events"), "user_id", "ts", gap_minutes=1440.0
    )
    return s.select(
        "user_id",
        "session_id",
        "n_events",
        F.date_format("session_start", _TS_FMT).alias("session_start"),
        F.date_format("session_end", _TS_FMT).alias("session_end"),
    )


@query(
    "range_join_count",
    """
    WITH iv AS (
      SELECT user_id AS interval_id, MIN(ts) AS s, MIN(ts) + INTERVAL 2 HOUR AS e
      FROM events WHERE user_id % 10 = 0 GROUP BY 1
    )
    SELECT interval_id,
           (SELECT COUNT(*) FROM events p WHERE p.ts >= iv.s AND p.ts <= iv.e)::BIGINT AS n_points
    FROM iv
    """,
)
def q_range_join_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval containment counts
    (operators.temporal.interval_count_bucketed): per-interval event
    counts via coarse-bucket equi-join + exact filter — the oracle
    uses a genuine non-equi subquery; the Spark plan must reach the
    same counts with equi-joins only."""
    from opengauss_tools_datachecker_performance_spark.operators.temporal import (
        interval_count_bucketed,
    )

    ev = _t(spark, sf_dir, "events")
    iv = (
        ev.filter(F.col("user_id") % 10 == 0)
        .groupBy(F.col("user_id").alias("interval_id"))
        .agg(F.min("ts").alias("start_ts"))
        .withColumn("end_ts", F.col("start_ts") + F.expr("INTERVAL 2 HOURS"))
    )
    return interval_count_bucketed(ev, iv, "ts")


# ---------------------------------------------------------------------------
# Oracle-dialect canonicalization
# ---------------------------------------------------------------------------


@query(
    "oracle_canon",
    r"""
    SELECT CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR) AS key,
           hex(encode(l_returnflag)) AS raw_hex,
           regexp_replace(hex(encode(l_linestatus) || '\x00\x00'::BLOB), '(00)+$', '') AS blob_hex,
           replace(l_returnflag || chr(10) || l_linestatus, chr(10), '') AS clob_str,
           CAST(CAST(l_quantity AS DECIMAL(38,0)) AS VARCHAR) AS num_int
    FROM lineitem WHERE l_orderkey < 40
    """,
)
def q_oracle_canon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-dialect canonicalization matrix
    (canon.canon_oracle_{raw,blob,clob,number};
    OracleResultSetHandler.java:40-54): RAW keeps zero bytes, BLOB
    trims trailing zero bytes (HexUtil.byteToHexTrim), CLOB drops line
    terminators, NUMBER(scale 0) renders BigInteger-style."""
    from opengauss_tools_datachecker_performance_spark.canon import (
        canon_oracle_blob,
        canon_oracle_clob,
        canon_oracle_number,
        canon_oracle_raw,
    )

    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 40)
    return li.select(
        F.concat_ws(
            "_",
            F.col("l_orderkey").cast("string"),
            F.col("l_linenumber").cast("string"),
        ).alias("key"),
        canon_oracle_raw(F.encode(F.col("l_returnflag"), "UTF-8")).alias("raw_hex"),
        canon_oracle_blob(
            F.concat(
                F.encode(F.col("l_linestatus"), "UTF-8"), F.lit(bytes([0, 0]))
            )
        ).alias("blob_hex"),
        canon_oracle_clob(
            F.concat_ws("\n", F.col("l_returnflag"), F.col("l_linestatus"))
        ).alias("clob_str"),
        canon_oracle_number(F.col("l_quantity"), scale=0).alias("num_int"),
    )
