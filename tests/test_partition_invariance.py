"""Results must not depend on physical parallelism.

At 100 TB the same query runs with thousands of shuffle partitions and
AQE re-planning; any order- or partitioning-sensitive expression
(float accumulation order, window ties, non-deterministic hashing)
would silently change answers between cluster sizes. This suite runs
a representative slice of the registry — window sequences, exact
decimal/float moments, dedup hashing, packing, sampling — under
deliberately different shuffle-partition counts with AQE toggled, and
asserts bit-identical normalized results.
"""

from __future__ import annotations

import pytest

from hadoop_brotli_spark.registry import load_all_queries

from .conftest import SF_DIR_MED
from .oracle_harness import _norm_rows

SPECS = load_all_queries()

# One representative per sensitivity class: window-over-sequence,
# cumulative packing, hash dedup, float sufficient statistics,
# window-normalized probabilities, interpolation, hash sampling.
SAMPLE = [
    "q41_window_running_sum",
    "q62_dedup_minhash_lsh",
    "q88_data_split",
    "q116_activity_streaks",
    "q117_stats_moments",
    "q120_interp_resample",
    "q121_event_transitions",
    "q126_sequence_packing",
    "q131_histogram_cdf",
    "q135_percent_of_parent",
    "q136_pareto_frontier",
    "q137_basket_lift",
    "q139_outlier_audit",
    # exact-decimal scalar-threshold join and centroid rounding must
    # not depend on partial-aggregation order
    "q165_pipeline_value_share",
    "q177_label_centroid_similarity",
    "q174_order_reconciliation",
    # round-2 additions: fixed-point iteration, framed percentile
    # window, sketch-space estimates, struct-ordered argmax
    "q197_argmax_order",
    "q198_rolling_median",
    "q199_minhash_jaccard_estimate",
    "q201_pagerank_fixed_point",
    "q207_bitmap_distinct",
    # round-2 session-3 additions: decimal-roundtrip cross-group
    # sums (ANOVA, OLS moments), window-hash dedup reduce, ln-product
    # survival, order-embedding first/last tags, EWMA literal chain
    "q253_exact_substring_dup",
    "q261_kaplan_meier",
    "q267_anova_oneway",
    "q276_ewma_smoothing",
    "q282_ols_normal_equations",
    "q294_cdc_compaction",
    "q300_pipeline_funnel_v2",
]


def _normalized(spark, name: str) -> list[tuple]:
    df = SPECS[name].fn(spark, SF_DIR_MED)
    return _norm_rows(list(df.columns), [tuple(r) for r in df.collect()])


@pytest.mark.parametrize("name", SAMPLE)
def test_partition_invariance(spark, name):
    conf = spark.conf
    orig_parts = conf.get("spark.sql.shuffle.partitions")
    orig_aqe = conf.get("spark.sql.adaptive.enabled")
    try:
        conf.set("spark.sql.shuffle.partitions", "3")
        conf.set("spark.sql.adaptive.enabled", "true")
        r_small = _normalized(spark, name)

        conf.set("spark.sql.shuffle.partitions", "17")
        conf.set("spark.sql.adaptive.enabled", "false")
        r_large = _normalized(spark, name)
    finally:
        conf.set("spark.sql.shuffle.partitions", orig_parts)
        conf.set("spark.sql.adaptive.enabled", orig_aqe)

    assert r_small == r_large, (
        f"{name}: result depends on partitioning "
        f"(3-partition AQE run != 17-partition no-AQE run)"
    )
