"""Every registered query with an oracle must match DuckDB exactly at
sf0.001 (the driver repeats this at sf0.01). Oracle-less queries get
a smoke run (executes, stable schema)."""

from __future__ import annotations

import pytest

from hadoop_brotli_spark.registry import load_all_queries

SPECS = load_all_queries()
WITH_ORACLE = [n for n, s in SPECS.items() if s.oracle is not None]
NO_ORACLE = [n for n, s in SPECS.items() if s.oracle is None]


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(name, spark, sf_dir):
    from .oracle_harness import compare

    compare(SPECS[name], spark, sf_dir)


@pytest.mark.parametrize("name", NO_ORACLE)
def test_runs_without_oracle(name, spark, sf_dir):
    df = SPECS[name].fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0


def test_every_query_callable_in_contract():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 30


def test_q49_group_spanning_arrow_batches(spark):
    """q49's mapInPandas carries a group across Arrow batch
    boundaries; force 7-row batches so every customer group spans
    batches and the carry logic is actually exercised."""
    from hadoop_brotli_spark.registry import load_all_queries

    from .conftest import SF_DIR
    from .oracle_harness import compare

    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        compare(
            load_all_queries()["q49_grouped_pandas_gaps"], spark, SF_DIR
        )
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
