"""Scalar function layer (SURVEY.md §2.8): hashing, text analysis,
vector math — all built from native pyspark.sql.functions so they
stay inside whole-stage codegen; no row-at-a-time Python anywhere."""

from opengauss_tools_datachecker_performance_spark.functions.hashing import (  # noqa: F401
    PK_DELIMITER,
    k_hash,
    pk_key,
    portable_hash64,
    portable_hash64_sql,
    v_hash,
)
