"""Relational operator surface: scan/filter/project, joins (all
types), aggregation (hash agg, distinct, rollup/cube/grouping sets,
having, pivot-style conditional agg), sorts/limits/top-k, set ops,
and subquery patterns (semi/anti/scalar).

These are the capabilities the reference codec inherits from its host
framework (SURVEY.md §2b); here they are first-class Catalyst plans.

Scale notes (100 TB):
- Dimension joins use ``F.broadcast`` explicitly (region/nation/
  supplier are tiny at every TPC-H-like SF); fact-fact joins
  (orders⋈lineitem) shuffle on the join key — AQE handles skew.
- Filters are expressed on scan columns so Catalyst pushes them into
  the parquet reader (verified via ``.explain`` in tests/bench).
- Aggregations are plain ``groupBy().agg()`` → Catalyst emits
  partial (map-side) + final hash aggregation automatically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._util import davg, dsum, sql_davg, sql_dsum, t, ts

# ---------------------------------------------------------------- scans


@register(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary: scan→filter→hash agg→sort.

    Flagship query. Catalyst pushes the shipdate filter into the
    parquet scan and plans partial+final aggregation; the 4-group
    output makes the final shuffle trivial at any scale.
    """
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= ts("1998-09-02"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price, 4).alias("sum_disc_price"),
            dsum(charge, 6).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q02_filter_project",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_size >= 10 AND p_type LIKE '%BRASS%' AND p_retailprice > 950.0
    """,
)
def q02_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + conjunctive predicate (comparison, LIKE).

    All three predicates are pushed to the parquet scan; only three
    columns are read (column pruning).
    """
    return (
        t(spark, sf_dir, "part")
        .filter(
            (F.col("p_size") >= 10)
            & F.col("p_type").like("%BRASS%")
            & (F.col("p_retailprice") > 950.0)
        )
        .select("p_partkey", "p_name", "p_retailprice")
    )


@register(
    "q06_revenue_forecast",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount', 4)} AS revenue,
           COUNT(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q06_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-style: highly selective filter → global agg.

    No group keys: Catalyst plans a partial agg per partition and a
    single-row final combine — no wide shuffle at any scale.
    """
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= ts("1996-01-01"))
        & (F.col("l_shipdate") < ts("1997-01-01"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# ---------------------------------------------------------------- joins


@register(
    "q03_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1996-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey ASC
    LIMIT 10
    """,
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-style: 3-way join → agg → deterministic top-10.

    customer is broadcast (small side after its segment filter);
    orders⋈lineitem is the only shuffle join. Top-k uses a total
    order (revenue DESC, l_orderkey ASC) so the limit is
    deterministic for the oracle hash.
    """
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < ts("1998-03-15"))
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > ts("1996-03-15"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "q05_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-style 6-way join with broadcast dimensions.

    region/nation/supplier are broadcast; the star join reduces to
    one shuffle on the fact-fact edge (orders⋈lineitem).
    """
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts("1996-01-01"))
        & (F.col("o_orderdate") < ts("1998-01-01"))
    )
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue")
        )
    )


@register(
    "q10_join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def q10_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving customers with zero orders.

    COUNT(col) (not COUNT(*)) so null-extended rows count as 0 —
    identical semantics in DuckDB.
    """
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count(F.col("o_orderkey")).alias("n_orders"))
    )


@register(
    "q11_join_full_outer",
    oracle="""
    SELECT n.n_nationkey, n.n_name, s.s_suppkey, s.s_name
    FROM nation n
    FULL OUTER JOIN supplier s ON n.n_nationkey = s.s_nationkey
    """,
)
def q11_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: nations without suppliers and vice versa."""
    n = t(spark, sf_dir, "nation")
    s = t(spark, sf_dir, "supplier")
    return n.join(s, F.col("n_nationkey") == F.col("s_nationkey"), "full").select(
        "n_nationkey", "n_name", "s_suppkey", "s_name"
    )


@register(
    "q12_join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0
    )
    """,
)
def q12_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join ≡ EXISTS subquery: customers with a big order."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0)
    return c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "q13_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
    )
    """,
)
def q13_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join ≡ NOT EXISTS: customers with no orders."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q14_join_cross",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
)
def q14_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS join of two broadcast-size dims (5 × 25 rows).

    At scale a cross join is only ever sane when one side broadcasts;
    Catalyst plans BroadcastNestedLoopJoin here.
    """
    r = t(spark, sf_dir, "region")
    n = t(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@register(
    "q15_join_theta",
    oracle="""
    SELECT s.s_suppkey, s.s_name, c.c_custkey
    FROM supplier s
    JOIN customer c
      ON s.s_nationkey = c.c_nationkey AND c.c_acctbal > s.s_acctbal
    """,
)
def q15_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi part (nationkey) + inequality (acctbal).

    Catalyst uses the equi conjunct as the hash-join key and applies
    the inequality as a post-join filter — the scalable shape for
    mixed predicates.
    """
    s = t(spark, sf_dir, "supplier")
    c = t(spark, sf_dir, "customer")
    return s.join(
        c,
        (F.col("s_nationkey") == F.col("c_nationkey"))
        & (F.col("c_acctbal") > F.col("s_acctbal")),
    ).select("s_suppkey", "s_name", "c_custkey")


# ---------------------------------------------------------- aggregation


@register(
    "q20_agg_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q20_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — Catalyst expands to a two-phase plan
    (distinct-aggregate then final), shuffling only the key+value."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@register(
    "q21_agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_exact,
           TRUE AS est_ok
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q21_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) vs exact distinct.

    HLL internals differ per engine, so the checkable invariant is
    emitted instead of the raw estimate: ``est_ok`` asserts the
    rsd=0.01 estimate lands within 5% (≈5σ) of the exact count
    (round-1 VERDICT task 7 — no permanently-red oracle-less rows).
    At 100 TB the sketch is the right default over exact distinct —
    no shuffle of the distinct values, only fixed-size sketches
    merge; the exact column here is the verification harness.
    """
    li = t(spark, sf_dir, "lineitem")
    # exact and approx run as SEPARATE aggregations joined on the
    # 3-row result: mixing them in one agg makes Catalyst's
    # distinct-aggregate rewrite carry the rsd=0.01 HLL++ buffer
    # (1,640 longs) per (flag, partkey) group through the exchange —
    # ~0.5 GB of sketch state at sf0.1, measured 20 s vs 0.15 s
    exact = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_exact")
    )
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.01).alias("n_approx")
    )
    return exact.join(F.broadcast(approx), "l_returnflag").select(
        "l_returnflag",
        "n_exact",
        (
            F.abs(F.col("n_approx") - F.col("n_exact"))
            <= 0.05 * F.col("n_exact")
        ).alias("est_ok"),
    )


@register(
    "q22_agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           {sql_dsum('l_quantity')} AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q22_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING id to disambiguate subtotal rows."""
    return (
        t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            dsum(F.col("l_quantity")).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n")
    )


@register(
    "q23_agg_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
           {sql_dsum('l_extendedprice')} AS sum_price
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q23_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two keys (all 4 grouping sets)."""
    return (
        t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            dsum(F.col("l_extendedprice")).alias("sum_price"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "sum_price")
    )


@register(
    "q24_agg_having",
    oracle=f"""
    SELECT l_suppkey, {sql_dsum('l_quantity')} AS total_qty
    FROM lineitem
    GROUP BY l_suppkey
    HAVING {sql_dsum('l_quantity')} > 1000.0
    """,
)
def q24_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation filter)."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
        .filter(F.col("total_qty") > 1000.0)
    )


@register(
    "q25_agg_conditional_pivot",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END")} AS qty_open,
           {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END")} AS qty_fulfilled,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q25_agg_conditional_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot expressed as conditional aggregation (the scalable form —
    a fixed column set, no second pass to discover pivot values)."""
    li = t(spark, sf_dir, "lineitem")
    qty_if = lambda status: F.when(F.col("l_linestatus") == status, F.col("l_quantity")).otherwise(F.lit(0))  # noqa: E731
    return li.groupBy("l_returnflag").agg(
        dsum(qty_if("O")).alias("qty_open"),
        dsum(qty_if("F")).alias("qty_fulfilled"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q26_agg_minmax_stats",
    oracle="""
    SELECT o_orderstatus,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           MIN(o_orderdate) AS first_order,
           MAX(o_orderdate) AS last_order,
           COUNT(*) AS n
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q26_agg_minmax_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIN/MAX over doubles and timestamps (order-independent aggs —
    no decimal cast needed)."""
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ------------------------------------------------------- sorts / top-k


@register(
    "q30_sort_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
)
def q30_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N: Spark plans TakeOrderedAndProject — each
    partition keeps N rows, driver merges; no full sort at scale.
    Tie-break on o_orderkey makes the cut deterministic."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


# ---------------------------------------------------------------- set ops


@register(
    "q31_set_union",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q31_set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "q32_set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q32_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: nations having both customers and suppliers."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "q33_set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def q33_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics): nations with customers but no
    suppliers. ``subtract`` is Spark's EXCEPT DISTINCT."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


# ------------------------------------------------------------ subqueries


@register(
    "q34_scalar_subquery",
    oracle="""
    SELECT p.p_partkey, p.p_retailprice
    FROM part p
    WHERE p.p_retailprice > (
      SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) + 40.0
      FROM part
    )
    """,
)
def q34_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (TPC-H-Q17 pattern).

    Expressed as a crossJoin with a 1-row aggregate — Catalyst
    broadcasts the single row; equivalent to the SQL scalar subquery.
    The comparison is strict-> so float equality at the boundary is
    not an issue (avg is a ratio of exact sums; identical doubles in
    both engines).
    """
    p = t(spark, sf_dir, "part")
    threshold = p.agg((davg(F.col("p_retailprice")) + 40.0).alias("thr"))
    return (
        p.crossJoin(F.broadcast(threshold))
        .filter(F.col("p_retailprice") > F.col("thr"))
        .select("p_partkey", "p_retailprice")
    )


@register(
    "q35_correlated_agg_join",
    oracle=f"""
    SELECT o.o_orderkey, o.o_totalprice, agg.line_total
    FROM orders o
    JOIN (
      SELECT l_orderkey,
             {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS line_total
      FROM lineitem GROUP BY l_orderkey
    ) agg ON agg.l_orderkey = o.o_orderkey
    WHERE agg.line_total > 350000.0
    """,
)
def q35_correlated_agg_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived-table join (correlated-subquery rewrite): per-order
    line totals joined back to orders — aggregate-then-join, which
    shrinks the shuffle versus join-then-aggregate."""
    o = t(spark, sf_dir, "orders")
    agg = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
                "line_total"
            )
        )
        .filter(F.col("line_total") > 350000.0)
    )
    return o.join(agg, F.col("o_orderkey") == F.col("l_orderkey")).select(
        "o_orderkey", "o_totalprice", "line_total"
    )


@register(
    "q133_not_in_null_semantics",
    oracle="""
    WITH clean AS (
      SELECT o_orderpriority, COUNT(*) AS n_not_in_clean
      FROM orders
      WHERE o_custkey NOT IN (
        SELECT c_custkey FROM customer WHERE c_acctbal < 0.0
      )
      GROUP BY o_orderpriority
    ),
    nullable AS (
      SELECT COUNT(*) AS n_not_in_nullable
      FROM orders
      WHERE o_custkey NOT IN (
        SELECT NULLIF(c_custkey, 0) FROM customer WHERE c_acctbal < 0.0
      )
    )
    SELECT c.o_orderpriority, c.n_not_in_clean, n.n_not_in_nullable
    FROM clean c CROSS JOIN nullable n
    """,
)
def q133_not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI ``NOT IN`` subquery semantics, including the NULL trap:
    against a NULL-free subquery NOT IN behaves as an anti join, but
    one NULL in the subquery (here NULLIF(c_custkey, 0)) makes the
    predicate UNKNOWN for every probe row — so n_not_in_nullable is
    0 whenever customer 0 has negative balance. The registry's other
    anti joins (q13, q36) use NOT EXISTS, which has no such trap;
    this query pins the difference.

    Runs through the SQL entry point (``spark.sql`` over registered
    views — same Catalyst pipeline), because DataFrame ``isin``
    cannot express a null-aware subquery; Spark plans it as a
    NullAwareAntiJoin (broadcast-only, build side is the subquery).
    """
    from ..catalog import load_table

    for name in ("orders", "customer"):
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
    return spark.sql(
        """
        WITH clean AS (
          SELECT o_orderpriority, COUNT(*) AS n_not_in_clean
          FROM orders
          WHERE o_custkey NOT IN (
            SELECT c_custkey FROM customer WHERE c_acctbal < 0.0
          )
          GROUP BY o_orderpriority
        ),
        nullable AS (
          SELECT COUNT(*) AS n_not_in_nullable
          FROM orders
          WHERE o_custkey NOT IN (
            SELECT NULLIF(c_custkey, 0) FROM customer WHERE c_acctbal < 0.0
          )
        )
        SELECT c.o_orderpriority, c.n_not_in_clean, n.n_not_in_nullable
        FROM clean c CROSS JOIN nullable n
        """
    )


@register(
    "q150_table_stats",
    oracle="""
    SELECT 'orders' AS table_name, COUNT(*) AS n_rows,
           COUNT(DISTINCT o_orderkey) AS n_distinct_key,
           MIN(o_orderkey) AS min_key, MAX(o_orderkey) AS max_key,
           COUNT(*) - COUNT(o_custkey) AS n_null_fk
    FROM orders
    UNION ALL
    SELECT 'lineitem', COUNT(*), COUNT(DISTINCT l_orderkey),
           MIN(l_orderkey), MAX(l_orderkey),
           COUNT(*) - COUNT(l_partkey)
    FROM lineitem
    UNION ALL
    SELECT 'customer', COUNT(*), COUNT(DISTINCT c_custkey),
           MIN(c_custkey), MAX(c_custkey),
           COUNT(*) - COUNT(c_nationkey)
    FROM customer
    UNION ALL
    SELECT 'documents', COUNT(*), COUNT(DISTINCT doc_id),
           MIN(doc_id), MAX(doc_id),
           COUNT(*) - COUNT(source)
    FROM documents
    """,
)
def q150_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog statistics collection (the ANALYZE TABLE equivalent):
    per-table row counts, key cardinality and range, and FK null
    counts in one unioned snapshot — the numbers a cost-based
    optimizer's join ordering and the q145 cardinality profile feed
    on, and the drift baseline an ingest pipeline re-computes per
    batch.

    Each branch is one partial+final aggregation over its own scan
    (column-pruned to the profiled columns); the union is plan
    concatenation, no shuffle between branches.
    """

    def stats(name, df, key, fk):
        return df.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct(key).alias("n_distinct_key"),
            F.min(key).alias("min_key"),
            F.max(key).alias("max_key"),
            (F.count(F.lit(1)) - F.count(fk)).alias("n_null_fk"),
        )

    return (
        stats("orders", t(spark, sf_dir, "orders"), "o_orderkey", "o_custkey")
        .unionByName(
            stats(
                "lineitem", t(spark, sf_dir, "lineitem"), "l_orderkey", "l_partkey"
            )
        )
        .unionByName(
            stats(
                "customer", t(spark, sf_dir, "customer"), "c_custkey", "c_nationkey"
            )
        )
        .unionByName(
            stats("documents", t(spark, sf_dir, "documents"), "doc_id", "source")
        )
    )


# ------------------------------ q356 recursive CTE hierarchy


@register(
    "q356_recursive_hierarchy",
    oracle="""
    WITH RECURSIVE h AS (
      SELECT c_custkey AS k, c_custkey AS root, 0 AS depth,
             CAST(c_acctbal AS DECIMAL(18,2)) AS bal
      FROM customer WHERE c_custkey < 10
      UNION ALL
      SELECT c.c_custkey, h.root, h.depth + 1,
             CAST(c.c_acctbal AS DECIMAL(18,2))
      FROM customer c JOIN h ON h.k = c.c_custkey // 10
      WHERE c.c_custkey >= 10
    )
    SELECT CAST(depth AS BIGINT) AS depth,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(COUNT(DISTINCT root) AS BIGINT) AS n_roots,
           CAST(SUM(bal) AS DOUBLE) AS total_bal,
           CAST(MIN(k) AS BIGINT) AS min_key,
           CAST(MAX(k) AS BIGINT) AS max_key
    FROM h GROUP BY depth ORDER BY depth
    """,
)
def q356_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE hierarchy traversal — new in Spark 4 (finally
    closing the classic org-chart/BOM gap that previously forced
    driver-side iteration): customers form a synthetic decimal tree
    (parent = custkey div 10, roots are custkey < 10), and the
    recursion flattens every node to (root, depth), aggregated per
    level with DECIMAL-exact balance sums.

    The oracle is the SAME recursive SQL in DuckDB (integer division
    spelled `//` there, `div` here — the one dialect difference).
    Scale note: Spark executes each recursion step as a join against
    the previous frontier — the same iterate-and-union plan the
    manual loops (q64's propagation, q305's BFS) build by hand, but
    optimizer-managed; depth here is ≤ log10(max key).
    """
    t(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_hier_src"
    )
    return spark.sql("""
      WITH RECURSIVE h AS (
        SELECT c_custkey AS k, c_custkey AS root, 0 AS depth,
               CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        FROM customer_hier_src WHERE c_custkey < 10
        UNION ALL
        SELECT c.c_custkey, h.root, h.depth + 1,
               CAST(c.c_acctbal AS DECIMAL(18,2))
        FROM customer_hier_src c JOIN h ON h.k = c.c_custkey div 10
        WHERE c.c_custkey >= 10
      )
      SELECT CAST(depth AS BIGINT) AS depth,
             CAST(COUNT(*) AS BIGINT) AS n_nodes,
             CAST(COUNT(DISTINCT root) AS BIGINT) AS n_roots,
             CAST(SUM(bal) AS DOUBLE) AS total_bal,
             CAST(MIN(k) AS BIGINT) AS min_key,
             CAST(MAX(k) AS BIGINT) AS max_key
      FROM h GROUP BY depth ORDER BY depth
    """)
