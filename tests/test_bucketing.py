"""Bucketed co-located join: the join on the bucket key must plan
without any Exchange (the stored bucket layout IS the shuffle)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hadoop_brotli_spark.catalog import load_table
from hadoop_brotli_spark.sources.bucketing import read_table, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(
        orders, "orders_b", ["o_orderkey"], 4,
        sort_cols=["o_orderkey"], path=str(base / "orders_b"),
    )
    write_bucketed(
        lineitem, "lineitem_b", ["l_orderkey"], 4,
        sort_cols=["l_orderkey"], path=str(base / "lineitem_b"),
    )
    yield "orders_b", "lineitem_b"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_no_exchange(spark, sf_dir, bucketed_tables):
    ot, lt = bucketed_tables
    o, li = read_table(spark, ot), read_table(spark, lt)
    # disable broadcast so the co-located sort-merge path is exercised
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "l_orderkey", "o_totalprice", "l_extendedprice"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and the result matches the plain (shuffled) join
        plain = (
            load_table(spark, sf_dir, "lineitem")
            .join(
                load_table(spark, sf_dir, "orders"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert joined.count() == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_bucketed_groupby_no_exchange(spark, bucketed_tables):
    _, lt = bucketed_tables
    li = read_table(spark, lt)
    agg = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
