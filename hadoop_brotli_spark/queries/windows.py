"""Window-function surface: ranking (row_number/rank/dense_rank/
ntile), offsets (lag/lead), running and frame aggregates
(rowsBetween / rangeBetween), first/last per group, top-k per group.

Determinism: every ORDER BY inside a window carries a unique-key
tie-breaker so ranking is total-ordered (FIXTURES.md).

Scale notes (100 TB): a window = one shuffle on partitionBy keys +
per-partition sort. Top-k per group via row_number + filter is the
scalable idiom (no global sort); partition keys here (suppkey,
user_id, nationkey) have high cardinality so partitions stay small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ._util import dsum, t


@register(
    "q40_window_topk_per_group",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice, rn
    FROM (
      SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY l_suppkey
               ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
             ) AS BIGINT) AS rn
      FROM lineitem
    ) ranked
    WHERE rn <= 3
    """,
)
def q40_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 line items by price per supplier (row_number ≤ k)."""
    w = W.partitionBy("l_suppkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey").asc(), F.col("l_linenumber").asc()
    )
    return (
        t(spark, sf_dir, "lineitem")
        .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 3)
    )


@register(
    "q41_window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def q41_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running spend (cumulative frame, exact decimal
    accumulation so the running values hash-match)."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("running_spend"),
    )


@register(
    "q42_window_lag_lead",
    oracle="""
    SELECT user_id, event_id, ts,
           LAG(event_type) OVER w AS prev_type,
           LEAD(event_type) OVER w AS next_type,
           EPOCH_US(ts) - EPOCH_US(LAG(ts) OVER w) AS usecs_since_prev
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
)
def q42_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG/LEAD offsets + inter-event gap in seconds per user."""
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "user_id",
        "event_id",
        "ts",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias(
            "usecs_since_prev"
        ),
    )


@register(
    "q43_window_rank_ntile",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC)
    """,
)
def q43_window_rank_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANK / DENSE_RANK / NTILE over account balance per nation."""
    w = W.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return t(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_custkey",
        "c_acctbal",
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


@register(
    "q44_window_sliding_frame",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
             / COUNT(*) OVER w AS avg_last3
    FROM orders
    WINDOW w AS (
      PARTITION BY o_custkey
      ORDER BY o_orderdate ASC, o_orderkey ASC
      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
    )
    """,
)
def q44_window_sliding_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving average over a bounded ROWS frame (last 3 orders).

    Computed as exact-decimal frame SUM (cast DOUBLE) / frame COUNT —
    identical IEEE division in both engines (AVG-over-DECIMAL result
    types differ between Spark and DuckDB, so we avoid it).
    """
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(-2, W.currentRow)
    )
    return t(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("avg_last3"),
    )


@register(
    "q45_window_first_last",
    oracle="""
    SELECT DISTINCT user_id,
           FIRST_VALUE(event_type) OVER w AS first_type,
           LAST_VALUE(event_type) OVER w AS last_type,
           COUNT(*) OVER (PARTITION BY user_id) AS n_events
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
    """,
)
def q45_window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last event type per user via an unbounded frame, reduced
    with DISTINCT to one row per user."""
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.first("event_type").over(w).alias("first_type"),
            F.last("event_type").over(w).alias("last_type"),
            F.count(F.lit(1)).over(W.partitionBy("user_id")).alias("n_events"),
        )
        .distinct()
    )


@register(
    "q100_forward_fill",
    oracle="""
    SELECT event_id, user_id,
           LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END
                      IGNORE NULLS)
             OVER (PARTITION BY user_id
                   ORDER BY ts ASC, event_id ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_purchase_value
    FROM events
    """,
)
def q100_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (last observation carried forward): every event
    carries the user's most recent purchase value, via
    ``last(..., ignorenulls=True)`` over a running frame.

    The standard sparse→dense gap-filling operator for feature
    pipelines. Partitioned by user with a total order (ts, event_id)
    so the fill is deterministic; one shuffle, sort within partition.
    """
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    purchase_value = F.when(F.col("event_type") == "purchase", F.col("value"))
    return t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.last(purchase_value, ignorenulls=True).over(w).alias("last_purchase_value"),
    )


@register(
    "q134_topk_with_ties",
    oracle="""
    WITH ranked AS (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             RANK() OVER (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal DESC) AS rk
      FROM customer
    )
    SELECT c_mktsegment, c_custkey, c_acctbal, rk
    FROM ranked WHERE rk <= 3
    """,
)
def q134_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group WITH ties: RANK() <= k admits every row tied
    at the boundary — the correct semantics for leaderboards and
    "top 3 balances" questions, distinct from q40's row_number()
    (exactly k, needs a tie-break to be deterministic). RANK output
    is deterministic even on ties because equal keys get equal
    ranks, so no tie-break column is required.

    Scale: window partitions by the group key; rows beyond the
    per-group boundary are dropped before anything downstream.
    """
    c = t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc())
    return (
        c.select("c_mktsegment", "c_custkey", "c_acctbal")
        .withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= 3)
    )


@register(
    "q135_percent_of_parent",
    oracle="""
    WITH nat AS (
      SELECT n.n_regionkey, n.n_name,
             CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS nat_bal
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_regionkey, n.n_name
    )
    SELECT r.r_name, nat.n_name, nat.nat_bal,
           nat.nat_bal
             / CAST(SUM(CAST(nat.nat_bal AS DECIMAL(18,2)))
                    OVER (PARTITION BY nat.n_regionkey) AS DOUBLE)
             AS pct_of_region
    FROM nat JOIN region r ON r.r_regionkey = nat.n_regionkey
    """,
)
def q135_percent_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent in a dimension hierarchy: each nation's
    share of its region's customer balance — the ratio-to-report
    pattern dashboards use for drill-downs.

    The parent total is a window over the ALREADY-AGGREGATED nation
    rows (25 rows regardless of input size), so no second pass over
    the fact table and no data-sized window. Determinism: summing
    doubles inside a window would be iteration-order-dependent, so
    the window sum re-casts the (exactly 2-decimal) nation totals to
    DECIMAL — exact in any order — and only the final share division
    happens in IEEE doubles, identically in both engines.
    """
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    nat = (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_regionkey", "n_name")
        .agg(dsum(F.col("c_acctbal")).alias("nat_bal"))
    )
    w = W.partitionBy("n_regionkey")
    return (
        nat.join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select(
            "r_name",
            "n_name",
            "nat_bal",
            (
                F.col("nat_bal")
                / F.sum(F.col("nat_bal").cast("decimal(18,2)"))
                .over(w)
                .cast("double")
            ).alias("pct_of_region"),
        )
    )


@register(
    "q136_pareto_frontier",
    oracle="""
    WITH ordered AS (
      SELECT p_brand, p_partkey, p_retailprice, p_size,
             MAX(p_size) OVER (PARTITION BY p_brand
                               ORDER BY p_retailprice, p_size DESC, p_partkey
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING) AS best_size_so_far
      FROM part
    )
    SELECT p_brand, p_partkey, p_retailprice, p_size
    FROM ordered
    WHERE best_size_so_far IS NULL OR p_size > best_size_so_far
    """,
)
def q136_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (skyline) per brand: parts not dominated on
    (lower price, larger size) by any other part of the same brand —
    the two-criteria shortlist query (cheapest-for-its-size).

    Single window sweep instead of the naive NOT EXISTS self-join:
    ordered by price, a part is on the frontier iff its size beats
    the running max of everything cheaper. The (price, size DESC,
    partkey) total order makes survivors deterministic for exact
    (price, size) duplicates — first key wins.

    Scale: O(n log n) per brand vs the self-join's O(n²) candidate
    pairs; the window partitions by brand (never global).
    """
    p = t(spark, sf_dir, "part")
    w = (
        W.partitionBy("p_brand")
        .orderBy(
            F.col("p_retailprice"), F.col("p_size").desc(), F.col("p_partkey")
        )
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        p.select("p_brand", "p_partkey", "p_retailprice", "p_size")
        .withColumn("best_size_so_far", F.max("p_size").over(w))
        .filter(
            F.col("best_size_so_far").isNull()
            | (F.col("p_size") > F.col("best_size_so_far"))
        )
        .drop("best_size_so_far")
    )
