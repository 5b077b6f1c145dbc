"""Driver output-contract guards (round-1 VERDICT tasks 2/3).

The driver canonicalizes results through pandas: Spark via
``toPandas()``, DuckDB via ``res.df()``, then ``sort_values`` over all
columns and a value hash of cell reprs.  Two classes of output are
permanently red under that contract:

- **non-scalar columns** (array/map/struct, and binary — Spark hands
  pandas ``bytearray`` cells, which are unhashable, so ``sort_values``
  crashes exactly like list cells did for round-1 q28/q38);
- **engine-dependent dtypes** — the DuckDB side must never emit
  HUGEINT (``SUM`` of integers) or other types pandas widens to
  float64 while Spark stays int64.

Both are checked registry-wide here, schema-only (no execution), so
the suite stays fast and every future query is covered the moment it
registers.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql.types import ArrayType, BinaryType, MapType, StructType

from hadoop_brotli_spark.registry import load_all_queries

from .oracle_harness import duckdb_conn

SF_DIR = "/root/testdata/sf0.001"

SPECS = sorted(load_all_queries().items())


@pytest.mark.parametrize("name", [n for n, _ in SPECS])
def test_spark_output_scalar_columns(spark, name):
    spec = dict(SPECS)[name]
    df = spec.fn(spark, SF_DIR)
    for f in df.schema.fields:
        assert not isinstance(
            f.dataType, (ArrayType, MapType, StructType, BinaryType)
        ), (
            f"{name}.{f.name} is {f.dataType.simpleString()} — the driver's "
            "pandas canonicalizer cannot sort/hash non-scalar cells"
        )


def test_oracle_no_hugeint_columns():
    """DuckDB-side dtype audit: PREPARE each oracle and reject any
    output column DuckDB types as HUGEINT/UHUGEINT (pandas converts
    those to float64, breaking the int64 hash parity with Spark)."""
    con = duckdb_conn(SF_DIR)
    offenders = []
    try:
        for name, spec in SPECS:
            if spec.oracle is None:
                continue
            try:
                desc = con.execute(
                    f"DESCRIBE {spec.oracle}"
                ).fetchall()
            except duckdb.Error as e:  # pragma: no cover
                offenders.append((name, f"DESCRIBE failed: {e}"))
                continue
            for col, typ, *_ in desc:
                base = typ.upper()
                if "HUGEINT" in base:
                    offenders.append((name, f"{col}: {typ}"))
                if base.startswith(("STRUCT", "MAP")) or base.endswith("[]"):
                    offenders.append((name, f"{col}: {typ} (non-scalar)"))
    finally:
        con.close()
    assert not offenders, f"oracle dtype traps: {offenders}"
