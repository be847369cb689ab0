"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: full schema+constraint validation of an
interleaved-doc table (derived deterministically from the sf0.001
documents table) against a mutated sink copy → per-partition verdict
grid.

``queries()`` / ``oracle_sql()`` — operator catalog with DuckDB
oracles; implementations live in
opengauss_tools_datachecker_performance_spark/entry_queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: validate docs-vs-mutated-sink at sf0.001 → verdicts."""
    from opengauss_tools_datachecker_performance_spark.plans.runner import validate_docs
    from opengauss_tools_datachecker_performance_spark.sources.docs_builder import (
        assets_catalog,
        docs_from_documents,
        mutate_docs,
    )

    documents = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs = docs_from_documents(documents)
    sink = mutate_docs(docs)
    assets = assets_catalog(spark)
    res = validate_docs(docs, sink, assets)
    return res.verdicts


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from opengauss_tools_datachecker_performance_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from opengauss_tools_datachecker_performance_spark.entry_queries import ORACLES

    return dict(ORACLES)
