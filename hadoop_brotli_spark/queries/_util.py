"""Shared helpers for oracle-deterministic query authoring.

Float determinism (FIXTURES.md): every double column in the test data
carries exactly 2 decimal digits. Casting values to DECIMAL before
SUM makes aggregation exact integer arithmetic — order-independent
across Spark partitions and bit-identical to DuckDB — and casting the
exact result back to DOUBLE yields the same float64 in both engines.
Products of 2-decimal values are exact 4-/6-decimal values, so wider
scales stay exact too. Plain IEEE double division of identical
operands is bit-identical across engines, so averages derived from
exact sums need no rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def dsum(col: Column, scale: int = 2) -> Column:
    """Exact sum of fixed-decimal doubles, returned as DOUBLE.

    Mirrors the SQL pattern
    ``CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)``.
    """
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


def davg(col: Column, scale: int = 2) -> Column:
    """Exact-sum-based average as DOUBLE: dsum(x) / count(*)."""
    return dsum(col, scale) / F.count(F.lit(1))


def sql_dsum(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 2) -> str:
    return f"{sql_dsum(expr, scale)} / COUNT(*)"


def ts(date_str: str) -> Column:
    """UTC-naive timestamp literal matching DuckDB ``TIMESTAMP '...'``."""
    return F.lit(date_str).cast("timestamp")
