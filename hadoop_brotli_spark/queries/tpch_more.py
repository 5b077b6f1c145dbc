"""Remaining classic TPC-H-shaped queries (Q4/Q7/Q8/Q9/Q19 analogs),
adapted to the driver's star schema (FIXTURES.md §B — no partsupp /
commitdate columns, synthetic NATION_* names).

These fill the operator gaps the earlier q-numbers skipped: EXISTS
with a correlated non-equi predicate (q04), dual-role dimension joins
(nation joined twice, q07/q08), conditional market-share ratios (q08),
computed-profit aggregation (q09), and a disjunctive multi-column
join predicate (q19).

The reference codec has none of this (SURVEY.md §2b — relational ops
are absent from the 19-file census; capability inherited from the
host framework). Spark-first: every join declares its small side with
``F.broadcast``; facts shuffle once on the join key.

Scale notes (100 TB): nation/region/supplier/part are broadcast at
any realistic scale (part is the largest at ~2 GB for 100 TB TPC-H —
still under the executor budget; if not, it degrades to one shuffle
join that AQE plans). The only unavoidable shuffle is
orders⋈lineitem; year-grouped outputs keep final aggregation tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ._util import dsum, sql_dsum, t, ts

# Exact-arithmetic note (_util docstring): all money columns carry two
# decimal digits, so products with 1-/2-decimal factors stay exact at
# DECIMAL scale 4-6 and hash-match DuckDB bit-for-bit.


@register(
    "q04_order_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o.o_orderpriority
    """,
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-style: correlated EXISTS → left-semi join → agg.

    The EXISTS carries a non-equi conjunct (l_shipdate > o_orderdate,
    standing in for the reference schema's commitdate check). Spark
    plans it as a left-semi hash join on l_orderkey with the
    inequality as a post-join filter — one shuffle, and the semi join
    stops probing an order after its first late lineitem.
    """
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts("1996-01-01"))
        & (F.col("o_orderdate") < ts("1997-01-01"))
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q07_volume_shipping",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(YEAR(l.l_shipdate) AS BIGINT) AS l_year,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, CAST(YEAR(l.l_shipdate) AS BIGINT)
    """,
)
def q07_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-style volume shipping between two nations.

    nation joins twice under different roles (supplier side vs
    customer side) — aliased broadcasts keep both JVM-side. The
    cross-nation disjunction runs after both dimension joins, as in
    the spec; only orders⋈lineitem shuffles.
    """
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ts("1996-01-01"))
        & (F.col("l_shipdate") < ts("1998-01-01"))
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .withColumn("l_year", F.year("l_shipdate").cast("bigint"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue")
        )
    )


@register(
    "q08_market_share",
    oracle=f"""
    SELECT CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
           {sql_dsum("CASE WHEN n2.n_name = 'NATION_3' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END", 4)}
             / {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS mkt_share
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
    JOIN region r   ON n1.n_regionkey = r.r_regionkey
    JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
    WHERE r.r_name = 'AMERICA' AND p.p_type = 'STANDARD'
    GROUP BY CAST(YEAR(o.o_orderdate) AS BIGINT)
    """,
)
def q08_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8-style national market share: conditional-sum ratio.

    Ratio of two exact decimal sums over identical rows — the same
    IEEE division in both engines, so the hash matches without
    rounding. Customer-side nation restricts the region; supplier-
    side nation (second role) feeds the CASE numerator.
    """
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n1 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_regionkey")
    )
    n2 = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .withColumn("o_year", F.year("o_orderdate").cast("bigint"))
        .groupBy("o_year")
        .agg(
            (
                dsum(
                    F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(F.lit(0)),
                    4,
                )
                / dsum(volume, 4)
            ).alias("mkt_share")
        )
    )


@register(
    "q09_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount) - 0.5 * p.p_retailprice * l.l_quantity', 6)} AS profit
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%green%'
    GROUP BY n.n_name, CAST(YEAR(o.o_orderdate) AS BIGINT)
    """,
)
def q09_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9-style product-type profit by supplier nation and year.

    No partsupp table in this schema, so supply cost is modeled as
    half the part's retail price (0.5 is exactly representable, so
    the profit expression stays exact at DECIMAL scale 6 — see
    _util's determinism note). part is filtered by name substring
    before its broadcast.
    """
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%green%"))
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders")
    n = t(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.5 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .withColumn("o_year", F.year("o_orderdate").cast("bigint"))
        .groupBy(F.col("n_name").alias("nation"), F.col("o_year"))
        .agg(dsum(profit, 6).alias("profit"))
    )


@register(
    "q19_discount_revenue",
    oracle=f"""
    SELECT {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#3'  AND l.l_quantity BETWEEN 1 AND 11
           AND p.p_size BETWEEN 1 AND 5)
       OR (p.p_brand = 'Brand#14' AND l.l_quantity BETWEEN 10 AND 20
           AND p.p_size BETWEEN 1 AND 10)
       OR (p.p_brand = 'Brand#21' AND l.l_quantity BETWEEN 20 AND 30
           AND p.p_size BETWEEN 1 AND 15)
    """,
)
def q19_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19-style disjunctive join predicate → global agg.

    The three-branch OR mixes columns from both sides, so it cannot
    be fully pushed to either scan; Catalyst still derives the
    residual single-side implications (brand IN (...) on part,
    quantity range on lineitem) via constraint propagation, and the
    equi-key p_partkey keeps this a hash join (never cartesian).
    """
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#3") & q.between(1, 11) & sz.between(1, 5))
        | ((F.col("p_brand") == "Brand#14") & q.between(10, 20) & sz.between(1, 10))
        | ((F.col("p_brand") == "Brand#21") & q.between(20, 30) & sz.between(1, 15))
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


@register(
    "q99_nullsafe_join",
    oracle="""
    WITH a AS (
      SELECT NULLIF(o_orderstatus, 'O') AS status_a, COUNT(*) AS n_orders
      FROM orders GROUP BY NULLIF(o_orderstatus, 'O')
    ),
    b AS (
      SELECT NULLIF(l_linestatus, 'O') AS status_b, COUNT(*) AS n_lines
      FROM lineitem GROUP BY NULLIF(l_linestatus, 'O')
    )
    SELECT a.status_a, a.n_orders, b.status_b, b.n_lines
    FROM a FULL JOIN b ON a.status_a IS NOT DISTINCT FROM b.status_b
    """,
)
def q99_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM) under
    a full outer join: NULL keys pair with NULL keys instead of
    dropping out — the semantics ETL needs when the join key itself
    is nullable (here NULLIF-derived status codes).
    """
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    a = (
        o.select(F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_a"))
        .groupBy("status_a")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    b = (
        li.select(F.nullif(F.col("l_linestatus"), F.lit("O")).alias("status_b"))
        .groupBy("status_b")
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )
    return a.join(b, F.col("status_a").eqNullSafe(F.col("status_b")), "full").select(
        "status_a", "n_orders", "status_b", "n_lines"
    )


@register(
    "q111_cust_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) per_cust
    GROUP BY c_count
    """,
)
def q111_cust_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13-style customer order distribution: a histogram of
    per-customer order counts, including zero-order customers.

    Two-level aggregation with a filtered LEFT join: the predicate on
    orders lives on the join (not a WHERE, which would turn the outer
    join inner). COUNT(o_orderkey) counts matched rows only, so
    unmatched customers land in the c_count=0 bucket.

    Scale: one shuffle join on custkey (AQE-planned; orders is the
    bigger side), then the second aggregate groups on c_count — at
    most a few hundred distinct values regardless of input size, so
    the final exchange is tiny. The reference codec has no join or
    aggregate surface (SURVEY.md §2b).
    """
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count(F.col("o_orderkey")).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q112_waiting_suppliers",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY s.s_name
    """,
)
def q112_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21-style "suppliers who kept orders waiting": late lines
    on finished orders where another supplier participated but only
    this supplier was late (shipdate > orderdate + 60 days stands in
    for the reference schema's receipt/commit dates, FIXTURES.md §B).

    Spark-first rewrite: instead of two correlated self-joins (the
    EXISTS / NOT EXISTS above), attach per-order distinct supplier
    count and distinct *late* supplier count with window
    collect_sets OVER the order key — the window runs on the
    partitioning the join just produced (no second pass over the
    fact table, no aggregate-then-rejoin) — and filter late lines
    against those two numbers (n_supp > 1 ∧ n_late_supp = 1 ⟺
    "someone else shipped, nobody else was late"). Supplier is
    broadcast for the name lookup. Per-order supplier sets are
    bounded by lines-per-order, so window state is small.
    """
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    lo = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).withColumn(
        "is_late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"),
    )
    w = Window.partitionBy("l_orderkey")
    sole_late = (
        lo.withColumn("n_supp", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late_supp",
            F.size(
                F.collect_set(
                    F.when(F.col("is_late"), F.col("l_suppkey"))
                ).over(w)
            ),
        )
        .filter(
            F.col("is_late") & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
        )
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole_late.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "q113_dormant_high_balance",
    oracle="""
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM (
      SELECT SUBSTRING(c.c_name, 17, 2) AS cntrycode, c.c_acctbal
      FROM customer c
      WHERE c.c_acctbal > (
          SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                 / COUNT(*)
          FROM customer c2 WHERE c2.c_acctbal > 0.0
        )
        AND NOT EXISTS (
          SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        )
    ) dormant
    GROUP BY cntrycode
    """,
)
def q113_dormant_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22-style sales opportunity: customers with above-average
    positive balance and NO orders, bucketed by a code derived from
    the customer name (chars 17-18 — the name's trailing digits —
    standing in for Q22's phone country code).

    Three classic shapes in one plan: an uncorrelated scalar subquery
    (global average as a broadcast 1-row cross join — no collect),
    NOT EXISTS as a left-anti join, and post-aggregation over a
    derived grouping key.

    Scale: the scalar aggregate is one partial+final pass; the anti
    join shuffles customer against the orders key projection (AQE
    handles size); everything after operates on the dormant subset.
    """
    c = t(spark, sf_dir, "customer")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg((dsum(F.col("c_acctbal")) / F.count(F.lit(1))).alias("avg_bal"))
    )
    o = t(spark, sf_dir, "orders").select("o_custkey")
    dormant = (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select(
            F.substring(F.col("c_name"), 17, 2).alias("cntrycode"),
            F.col("c_acctbal"),
        )
    )
    return dormant.groupBy("cntrycode").agg(
        F.count(F.lit(1)).alias("numcust"),
        dsum(F.col("c_acctbal")).alias("totacctbal"),
    )


@register(
    "q114_small_qty_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
      SELECT l2.l_partkey AS a_partkey,
             CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_qty
      FROM lineitem l2 GROUP BY l2.l_partkey
    ) a ON a.a_partkey = l.l_partkey
    WHERE p.p_brand IN ('Brand#11', 'Brand#13')
      AND l.l_quantity < 0.5 * a.avg_qty
    """,
)
def q114_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17-style small-quantity-order revenue: lines whose
    quantity is below half the part's average quantity, for two
    brands, expressed as a decorrelated aggregate join (the
    textbook form is a correlated scalar subquery per part).

    Determinism: avg_qty is the exact-decimal sum divided by the
    count (identical double in both engines, _util docstring), and
    0.5 * avg_qty is one IEEE multiply of that identical value, so
    the comparison cuts the same rows everywhere.

    Scale: the per-part average is one partial+final pass over
    lineitem keyed by partkey; re-joining it to lineitem reuses the
    same key, so AQE plans back-to-back shuffles on one partitioning;
    part is broadcast. Output is a single global aggregate row.
    """
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_q = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (dsum(F.col("l_quantity")) / F.count(F.lit(1))).alias("avg_qty")
    )
    p = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_brand").isin("Brand#11", "Brand#13"))
        .select("p_partkey")
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(avg_q, F.col("a_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg((dsum(F.col("l_extendedprice")) / 7.0).alias("avg_yearly"))
    )


@register(
    "q115_large_volume_customers",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           big.sum_qty
    FROM (
      SELECT l.l_orderkey,
             CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem l
      GROUP BY l.l_orderkey
      HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > 250
    ) big
    JOIN orders o ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def q115_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18-style large-volume customers: orders whose total
    line quantity exceeds a threshold, with customer detail.

    The textbook form filters via `o_orderkey IN (GROUP BY ...
    HAVING)` and then re-aggregates; since the IN-set and the final
    group are the same key, we aggregate ONCE, filter, and join the
    survivors outward — halving the fact-table passes. sum_qty is
    exact decimal arithmetic (order-insensitive, hash-stable).

    Scale: one shuffle of lineitem on orderkey; HAVING cuts the
    result to the rare heavy orders BEFORE the joins, so the joins
    move only qualifying keys (runtime bloom/DPP-friendly shape).
    """
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 250.0)
    )
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            "sum_qty",
        )
    )


@register(
    "q159_sla_bands",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_lines,
           COUNT(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 30
                      THEN 1 END) AS within_30d,
           COUNT(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 30
                       AND date_diff('day', o.o_orderdate, l.l_shipdate) <= 90
                      THEN 1 END) AS d31_to_90,
           COUNT(CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) > 90
                      THEN 1 END) AS over_90d,
           CAST(COUNT(CASE WHEN date_diff('day', o.o_orderdate,
                                          l.l_shipdate) <= 30
                           THEN 1 END) AS DOUBLE) / COUNT(*) AS sla_30d_rate
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def q159_sla_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfillment SLA banding: order-to-ship latency bucketed into
    ≤30 / 31-90 / >90 day bands per order priority, with the 30-day
    SLA attainment rate — the operations scorecard query.

    Latency is an integer day-diff, bands are conditional counts in
    ONE aggregation pass (no per-band scans), and the rate divides
    exact integers. One fact-fact shuffle on the order key.
    """
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lat = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    within30 = F.count(F.when(lat <= 30, 1))
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            within30.alias("within_30d"),
            F.count(F.when((lat > 30) & (lat <= 90), 1)).alias("d31_to_90"),
            F.count(F.when(lat > 90, 1)).alias("over_90d"),
            (within30.cast("double") / F.count(F.lit(1))).alias("sla_30d_rate"),
        )
    )


@register(
    "q163_discount_elasticity",
    oracle="""
    SELECT CAST(FLOOR(l_discount * 100 / 2) AS BIGINT) AS disc_band,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE)
             / COUNT(*) AS avg_net_revenue
    FROM lineitem
    GROUP BY CAST(FLOOR(l_discount * 100 / 2) AS BIGINT)
    """,
)
def q163_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discount-band elasticity proxy: average quantity and net
    revenue per 2-percentage-point discount band — the pricing
    team's first look at whether discounts actually move volume.

    Banding is a pure row-wise floor on the (2-decimal) discount;
    averages are exact decimal sums over counts. One aggregation
    pass, ~25 output rows.
    """
    li = t(spark, sf_dir, "lineitem")
    band = F.floor(F.col("l_discount") * 100 / 2).cast("bigint")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy(band.alias("disc_band")).agg(
        F.count(F.lit(1)).alias("n_lines"),
        (dsum(F.col("l_quantity")) / F.count(F.lit(1))).alias("avg_qty"),
        (dsum(net, 4) / F.count(F.lit(1))).alias("avg_net_revenue"),
    )


@register(
    "q164_keyset_pagination",
    oracle="""
    SELECT o_orderdate, o_orderkey, o_totalprice
    FROM orders
    WHERE (o_orderdate, o_orderkey) > (TIMESTAMP '1997-06-01', 700)
    ORDER BY o_orderdate, o_orderkey
    LIMIT 20
    """,
)
def q164_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (seek-method) pagination: fetch the next page strictly
    after a (date, key) cursor with a composite-key comparison —
    the OFFSET-free pattern that serves "page 50,000" in constant
    work, because the cursor predicate pushes into the scan instead
    of skipping rows.

    The row-value comparison ``(a,b) > (x,y)`` decomposes to
    ``a > x OR (a = x AND b > y)`` on the Spark side (pushdown-
    friendly conjuncts); the page itself is a total-ordered
    TakeOrderedAndProject.
    """
    o = t(spark, sf_dir, "orders")
    cur_d, cur_k = F.lit("1997-06-01").cast("timestamp"), F.lit(700)
    seek = (F.col("o_orderdate") > cur_d) | (
        (F.col("o_orderdate") == cur_d) & (F.col("o_orderkey") > cur_k)
    )
    return (
        o.filter(seek)
        .select("o_orderdate", "o_orderkey", "o_totalprice")
        .orderBy("o_orderdate", "o_orderkey")
        .limit(20)
    )


@register(
    "q165_pipeline_value_share",
    oracle="""
    WITH partval AS (
      SELECT l.l_partkey,
             SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                      AS DECIMAL(18,4))) AS val
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus = 'O'
      GROUP BY l.l_partkey
    ),
    total AS (SELECT SUM(val) AS tot FROM partval)
    SELECT p.l_partkey, CAST(p.val AS DOUBLE) AS pipeline_value
    FROM partval p, total
    WHERE p.val * 1000 > total.tot
    """,
)
def q165_pipeline_value_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11-style value concentration (no partsupp table in this
    schema, so "stock value" becomes open-order pipeline revenue per
    part): parts holding more than 0.1% of the total open pipeline.

    Shape: fact-fact join → per-part aggregate → scalar grand total →
    HAVING against the broadcast scalar. The grand total re-aggregates
    the per-part aggregate (tiny — one row per part), never the raw
    fact. The 0.1% threshold is compared as ``val * 1000 > total`` in
    exact decimal arithmetic — no float epsilon, hash-identical to
    DuckDB. Reference has no aggregation at all (SURVEY.md §2b).

    100 TB: two shuffles total (join key, then part key); the scalar
    total is a 1-row broadcast, so the final filter is map-side.
    """
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice", "l_discount"
    )
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey"
    )
    partval = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ).alias("val")
        )
    )
    total = partval.agg(F.sum("val").alias("tot"))
    return (
        partval.join(F.broadcast(total))
        .filter(F.col("val") * 1000 > F.col("tot"))
        .select("l_partkey", F.col("val").cast("double").alias("pipeline_value"))
    )


@register(
    "q166_promo_revenue_share",
    oracle="""
    SELECT CAST(DATE_TRUNC('month', l.l_shipdate) AS TIMESTAMP) AS ship_month,
           CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                         THEN CAST(l.l_extendedprice * (1 - l.l_discount)
                                   AS DECIMAL(18,4))
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             * 100.0 /
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS promo_share
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY DATE_TRUNC('month', l.l_shipdate)
    """,
)
def q166_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14-style promotion effect, by ship month: percentage of
    revenue from PROMO-type parts.

    Conditional aggregation (CASE inside SUM) computes both the promo
    and total sums in ONE pass over the joined rows — no second scan,
    no self-join. part is broadcast; the only shuffle is the 12-group
    month aggregation. Both sums are exact decimals; the final ratio
    is one double division, bit-identical across engines.
    """
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ts("1997-01-01"))
        & (F.col("l_shipdate") < ts("1998-01-01"))
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            (
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero))
                .cast("double")
                * 100.0
                / F.sum(rev).cast("double")
            ).alias("promo_share")
        )
    )


@register(
    "q167_top_supplier_revenue",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice * (1 - l_discount)
                      AS DECIMAL(18,4))) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM rev r
    JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def q167_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-style top supplier: supplier(s) with the maximum
    revenue in 1996Q1, ties kept (the spec's VIEW + scalar-max shape).

    The revenue aggregate is computed once and reused for both the
    scalar MAX and the final filter (Spark caches nothing here — the
    plan simply re-derives the 10-row aggregate, which AQE executes as
    two tiny stages). Equality against the max is safe because the
    revenue is an exact decimal, not a float. supplier is broadcast.

    100 TB: one shuffle on l_suppkey (bounded by supplier count); the
    scalar max is a 1-row broadcast join, not a global sort.
    """
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ts("1996-01-01"))
        & (F.col("l_shipdate") < ts("1996-04-01"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(18,4)"
            )
        ).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


@register(
    "q168_supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q168_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16-style parts/supplier relationship: how many distinct
    suppliers ship each surviving (brand, type, size) combination.

    The exclusion predicates live on the broadcast part side, so they
    prune BEFORE the join fans out (Catalyst pushes them into the part
    scan — `p_size IN (...)` arrives as a PushedFilter). COUNT
    DISTINCT over the group triggers Spark's two-phase distinct
    expansion; keys are (brand,type,size,suppkey) — uniform, no skew.
    """
    p = (
        t(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & (F.col("p_type") != "PROMO")
            & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q169_dominant_supplier",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty
      FROM lineitem
      GROUP BY l_partkey, l_suppkey
    ),
    pt AS (SELECT l_partkey, SUM(qty) AS total FROM ps GROUP BY l_partkey)
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM ps
    JOIN pt ON ps.l_partkey = pt.l_partkey
    JOIN supplier s ON ps.l_suppkey = s.s_suppkey
    WHERE ps.qty * 2 > pt.total
    """,
)
def q169_dominant_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20-style excess-availability probe, adapted: suppliers
    that shipped MORE THAN HALF of some part's total quantity.

    The per-part total re-aggregates the (part, supplier) partial —
    the classic partial-reuse shape: the expensive fact scan happens
    once, the second aggregate and the join both operate on the
    already-reduced key space. The 50% share test is exact decimal
    (``qty * 2 > total``). Output is DISTINCT suppliers (semi-join
    semantics via dropDuplicates on the bounded supplier key space).

    100 TB: one fact shuffle on (l_partkey, l_suppkey); everything
    after is proportional to |part|×avg-suppliers-per-part, orders of
    magnitude smaller; supplier is broadcast.
    """
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty")
    )
    pt = ps.groupBy("l_partkey").agg(F.sum("qty").alias("total"))
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        ps.join(pt, "l_partkey")
        .filter(F.col("qty") * 2 > F.col("total"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name")
        .dropDuplicates()
    )


@register(
    "q222_returned_item_ranking",
    oracle=f"""
    WITH agg AS (
      SELECT c.c_custkey, c.c_name, n.n_name, c.c_acctbal,
             {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)}
               AS revenue
      FROM customer c
      JOIN orders o ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      WHERE o.o_orderdate >= TIMESTAMP '1996-07-01'
        AND o.o_orderdate < TIMESTAMP '1996-10-01'
        AND l.l_returnflag = 'R'
      GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY revenue DESC, c_custkey ASC)
               AS rn
      FROM agg
    )
    SELECT c_custkey, c_name, n_name, c_acctbal, revenue
    FROM ranked WHERE rn <= 20
    """,
)
def q222_returned_item_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-style: top-20 customers by revenue lost to RETURNED
    items in one quarter — the classic 4-way star join → agg →
    deterministic top-k (revenue is decimal-exact, ties break on
    custkey, so the limit hashes identically on both engines).

    Plan: lineitem is pre-filtered to 'R' rows AND orders to the
    quarter BEFORE the fact-fact join (both predicates reach their
    parquet scans); customer joins the aggregated per-custkey result
    (aggregate-then-join — the Q10 trick that shrinks the join input
    from fact-sized to customer-sized), and nation broadcasts onto
    the final 20-row frame.
    """
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts("1996-07-01"))
        & (F.col("o_orderdate") < ts("1996-10-01"))
    )
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    per_cust = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
    )
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    joined = (
        per_cust.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    w = Window.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
    return (
        joined.select(
            "c_custkey", "c_name", "n_name", "c_acctbal", "revenue",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 20)
        .drop("rn")
    )
