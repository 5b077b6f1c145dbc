"""Physical-plan quality gates: the optimizations the 100 TB design
depends on must actually appear in the executed plan — predicate
pushdown into the parquet scan, column pruning, broadcast joins for
dimension/small sides, and whole-stage codegen on hot paths.

These guard against regressions like a filter silently becoming
post-scan (e.g. wrapped in a UDF) or a broadcast degrading to a
shuffle join."""

from __future__ import annotations

import pytest

from hadoop_brotli_spark.registry import load_all_queries

SPECS = load_all_queries()


def plan_of(spark, sf_dir: str, name: str) -> str:
    df = SPECS[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "name, token",
    [
        # shipdate predicate reaches the parquet reader
        ("q01_pricing_summary", "PushedFilters: [IsNotNull(l_shipdate)"),
        # conjunctive predicates pushed (p_size/p_retailprice)
        ("q02_filter_project", "GreaterThanOrEqual(p_size,10)"),
    ],
)
def test_filter_pushdown(spark, sf_dir, name, token):
    assert token in plan_of(spark, sf_dir, name)


def test_column_pruning(spark, sf_dir):
    # q02 projects 3 columns + 2 filter-only columns; the scan must
    # not read the full part schema
    plan = plan_of(spark, sf_dir, "q02_filter_project")
    scan = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "p_brand" not in scan


@pytest.mark.parametrize(
    "name",
    [
        "q03_shipping_priority",   # broadcast customer
        "q05_local_supplier_volume",  # broadcast dims
        "q70_knn_bruteforce",      # broadcast query set
        "q74_ann_ivf",             # broadcast centroid codebook
    ],
)
def test_broadcast_join_used(spark, sf_dir, name):
    assert "Broadcast" in plan_of(spark, sf_dir, name)


def test_range_join_is_broadcast_not_cartesian(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q17_join_range_bands")
    assert "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_whole_stage_codegen(spark, sf_dir):
    # flagship agg runs inside whole-stage codegen ("*(n)" markers;
    # AQE wrapping hides them, so disable it for the plan inspection)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_of(spark, sf_dir, "q01_pricing_summary")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "*(" in plan


def test_asof_join_has_no_inequality_join(spark, sf_dir):
    # the union+window formulation must not plan any join at all
    plan = plan_of(spark, sf_dir, "q16_join_asof")
    assert "Join" not in plan
    assert "Window" in plan


def test_minhash_no_seed_explode(spark, sf_dir):
    # q62 derives 8 minhashes from 2 digests. Two Generates are
    # legitimate (shingle explode + band explode), each appearing
    # twice because the signature subtree feeds both sides of the
    # band self-join (ReuseExchange dedups at runtime). The old 8x
    # per-seed explode would add two more.
    plan = plan_of(spark, sf_dir, "q62_dedup_minhash_lsh")
    assert plan.count("Generate explode") <= 4
