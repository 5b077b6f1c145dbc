"""SQL entry point: the engine's relational surface is reachable via
``spark.sql`` over registered temp views, not only the DataFrame API.

For every query whose oracle SQL is engine-portable ANSI, running
that exact SQL string in Spark must produce the same result as the
DataFrame implementation — one SQL text, three engines in agreement
(Spark DataFrame, Spark SQL, DuckDB)."""

from __future__ import annotations

import pytest

from hadoop_brotli_spark.catalog import register_views
from hadoop_brotli_spark.registry import load_all_queries

from .oracle_harness import _norm_rows

SPECS = load_all_queries()

# Oracles written in portable ANSI (no DuckDB-only functions like
# string_split / generate_subscripts / list aggregates).
ANSI_PORTABLE = [
    "q01_pricing_summary",
    "q02_filter_project",
    "q03_shipping_priority",
    "q04_order_priority",
    "q05_local_supplier_volume",
    "q06_revenue_forecast",
    "q07_volume_shipping",
    "q08_market_share",
    "q09_product_profit",
    "q10_join_left_outer",
    "q12_join_semi",
    "q13_join_anti",
    "q19_discount_revenue",
    "q20_agg_distinct",
    "q24_agg_having",
    "q30_sort_limit",
    "q31_set_union",
    "q34_scalar_subquery",
    "q36_subquery_exists",
]


@pytest.fixture(scope="module", autouse=True)
def views(spark, sf_dir):
    register_views(spark, sf_dir)


@pytest.mark.parametrize("name", ANSI_PORTABLE)
def test_oracle_sql_runs_in_spark(name, spark, sf_dir):
    spec = SPECS[name]
    via_sql = spark.sql(spec.oracle)
    via_df = spec.fn(spark, sf_dir)
    a = _norm_rows(list(via_sql.columns), [tuple(r) for r in via_sql.collect()])
    b = _norm_rows(list(via_df.columns), [tuple(r) for r in via_df.collect()])
    assert sorted(via_sql.columns) == sorted(via_df.columns)
    assert a == b
