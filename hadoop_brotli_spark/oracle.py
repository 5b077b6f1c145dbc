"""DuckDB-oracle comparison under DRIVER-IDENTICAL canonicalization.

This is the engine's user-facing correctness tool (CLI:
``python -m hadoop_brotli_spark verify <query> [--sf-dir ...]``) and
the core the test suite's ``tests/oracle_harness.py`` re-exports.

Driver contract recap: both sides go through pandas; columns sort by
name; rows sort by all columns (list cells crash, by design); cells
canonicalize via repr so int64 150 != float64 150.0.
"""


from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from . import TABLES
from .registry import QuerySpec


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _cell(v: Any) -> str:
    """Driver-style cell canonicalization: repr-level, so int64 150 and
    float64 150.0 DIFFER (that is the point — see module docstring)."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v + 0.0)  # collapse -0.0
    if isinstance(v, bytes):
        return "0x" + v.hex()
    if hasattr(v, "isoformat"):
        # Spark DATE -> datetime.date; DuckDB DATE -> midnight
        # Timestamp. The driver's round-1 results show these hash
        # equal (q118 passed with a DATE column), so canonicalize
        # dates to midnight timestamps.
        iso = v.isoformat()
        if len(iso) == 10:  # bare date
            iso += "T00:00:00"
        return iso
    if pd.isna(v):  # pd.NaT / pd.NA
        return "NULL"
    return repr(v)


def _norm_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    """Spark-vs-Spark row normalization (partition-invariance / SQL-
    surface tests): column-name ordering + repr cells. List cells are
    allowed here — both sides are Spark, so dtype artifacts don't
    apply; tuples keep them hashable."""

    def cell(v: Any) -> Any:
        if isinstance(v, (list, tuple)):
            return tuple(cell(x) for x in v)
        if isinstance(v, dict):
            return tuple(sorted((k, cell(x)) for k, x in v.items()))
        return _cell(v)

    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(cell(r[i]) for i in order) for r in rows),
        key=lambda t: tuple(repr(x) for x in t),
    )


def canonize(pdf: pd.DataFrame) -> tuple[list[str], list[tuple[str, ...]]]:
    """Sort columns by name, sort rows by all columns (raises TypeError
    on list cells, exactly like the driver), repr every cell."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    if len(pdf):
        pdf = pdf.sort_values(by=cols)  # driver step; list cells crash here
    rows = [tuple(_cell(v) for v in row) for row in pdf.itertuples(index=False)]
    # Secondary sort on reprs so NULL-vs-value ordering quirks between
    # pandas versions don't produce spurious diffs.
    rows.sort()
    return cols, rows


def spark_pdf(spec: QuerySpec, spark, sf_dir: str) -> pd.DataFrame:
    return spec.fn(spark, sf_dir).toPandas()


def oracle_pdf(spec: QuerySpec, sf_dir: str) -> pd.DataFrame:
    assert spec.oracle is not None, f"{spec.name} has no oracle"
    con = duckdb_conn(sf_dir)
    try:
        return con.execute(spec.oracle).df()
    finally:
        con.close()


def compare(spec: QuerySpec, spark, sf_dir: str) -> None:
    """Assert the Spark query matches its DuckDB oracle under
    driver-identical pandas canonicalization."""
    spdf = spark_pdf(spec, spark, sf_dir)
    dpdf = oracle_pdf(spec, sf_dir)

    assert sorted(spdf.columns) == sorted(dpdf.columns), (
        f"{spec.name}: column mismatch spark={sorted(spdf.columns)} "
        f"duckdb={sorted(dpdf.columns)}"
    )
    assert len(spdf) == len(dpdf), (
        f"{spec.name}: row count spark={len(spdf)} duckdb={len(dpdf)}"
    )

    try:
        s_cols, s_rows = canonize(spdf)
    except TypeError as e:  # pragma: no cover - fails the test with context
        raise AssertionError(
            f"{spec.name}: Spark output not canonicalizable (driver would "
            f"crash): {e}"
        ) from e
    try:
        d_cols, d_rows = canonize(dpdf)
    except TypeError as e:  # pragma: no cover
        raise AssertionError(
            f"{spec.name}: oracle output not canonicalizable (driver would "
            f"crash): {e}"
        ) from e

    if s_rows != d_rows:
        diffs = [(a, b) for a, b in zip(s_rows, d_rows) if a != b][:5]
        raise AssertionError(
            f"{spec.name}: value mismatch under driver canonicalization; "
            f"columns={s_cols}; first diffs (spark vs duckdb): {diffs}"
        )
