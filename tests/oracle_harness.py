"""Local replica of the driver's DuckDB-oracle comparison: run a
registered Spark query and its oracle SQL over the same sf dir and
compare row count, column names/order-insensitive values.

Stricter than a hash: reports the first mismatching rows for debug.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb

from hadoop_brotli_spark import TABLES
from hadoop_brotli_spark.registry import QuerySpec


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm_cell(v: Any) -> Any:
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 vs 0.0 and represent exactly
        return repr(v + 0.0)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm_cell(r[i]) for i in order) for r in rows),
        key=lambda t: tuple(repr(x) for x in t),
    )


def compare(spec: QuerySpec, spark, sf_dir: str) -> None:
    """Assert the Spark query matches its DuckDB oracle."""
    sdf = spec.fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    assert spec.oracle is not None, f"{spec.name} has no oracle"
    con = duckdb_conn(sf_dir)
    try:
        res = con.execute(spec.oracle)
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
    finally:
        con.close()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{spec.name}: column mismatch spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{spec.name}: row count spark={len(s_rows)} duckdb={len(d_rows)}"
    )

    sn = _norm_rows(s_cols, s_rows)
    dn = _norm_rows(d_cols, d_rows)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        raise AssertionError(
            f"{spec.name}: value mismatch; first diffs (spark vs duckdb): {diffs}"
        )
