"""Driver contract for the spark-graft builder (PySpark target).

Thin views over ``hadoop_brotli_spark.registry``: the engine's query
surface (SURVEY.md §2) with per-query DuckDB oracle SQL. Queries with
``oracle=None`` (approx sketches, streaming-only ops) get the
driver's weaker rows-only check, as documented in their docstrings.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hadoop_brotli_spark.registry import load_all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    specs = load_all_queries()
    return specs["q01_pricing_summary"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in load_all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable query."""
    return {
        name: spec.oracle
        for name, spec in load_all_queries().items()
        if spec.oracle is not None
    }
