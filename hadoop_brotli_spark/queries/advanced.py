"""Advanced operator surface: as-of / range joins, GROUPING SETS,
exact percentiles, correlated subqueries, distribution window
functions, funnel analysis, higher-order array functions, and an
IVF-style ANN probe.

These extend the host-framework capabilities the reference codec
relies on (SURVEY.md §2b — the reference itself implements none of
this; its relational surface is inherited from Hadoop/Spark) with the
operators a large-scale training-data pipeline needs.

Scale notes (100 TB):
- The as-of join (q16) is the union+window formulation: O(n log n)
  sort within user partitions instead of the O(n·m) inequality join a
  naive formulation would plan. One shuffle on user_id, no skew
  beyond the user-activity distribution (AQE skew-split covers it).
- The range join (q17) broadcasts the band table — a theta join that
  executes map-side with zero shuffle.
- IVF ANN (q74) broadcasts the centroid set; cell assignment is a
  map-side argmax and the probe is an equi-join on cell id — the
  standard inverted-file trade: cost drops from O(n²) to
  O(n·K + Σ|cell|·|queries in cell|).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..registry import register
from ._util import dround, dsum, fan_out, sql_dsum, t
from .similarity import dot_double, norm_double

# ------------------------------------------------------------- joins


@register(
    "q16_join_asof",
    oracle="""
    SELECT p.event_id, p.user_id, p.ts,
           (SELECT MAX(c.ts) FROM events c
            WHERE c.user_id = p.user_id
              AND c.event_type = 'click'
              AND c.ts <= p.ts) AS last_click_ts
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
)
def q16_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event paired with the most recent
    click (ts <= purchase ts) by the same user.

    Implemented as union + sorted window (last non-null click ts over
    an unbounded-preceding frame) — the scale path: one shuffle on
    user_id and a per-partition sort, never the O(n·m) inequality
    join. Same-ts clicks sort before the purchase probe so the
    closed bound (<=) is honored.
    """
    ev = t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("ts").alias("click_ts"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(0).alias("is_probe"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(None).cast("timestamp").alias("click_ts"),
        "event_id",
        F.lit(1).alias("is_probe"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_probe")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        clicks.unionByName(purchases)
        .withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(w))
        .filter(F.col("is_probe") == 1)
        .select("event_id", "user_id", "ts", "last_click_ts")
    )


@register(
    "q17_join_range_bands",
    oracle=f"""
    SELECT b.band,
           COUNT(*) AS n_items,
           {sql_dsum('l.l_extendedprice')} AS band_revenue
    FROM lineitem l
    JOIN (VALUES ('low', 0.0, 15.0),
                 ('mid', 15.0, 35.0),
                 ('high', 35.0, 60.0)) AS b(band, lo, hi)
      ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
    GROUP BY b.band
    """,
)
def q17_join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: lineitem rows bucketed into quantity
    bands via lo <= q < hi predicates against a broadcast band table.

    Broadcasting turns the theta join into a map-side nested loop
    over 3 rows — zero shuffle regardless of fact-table size. The
    probe side is fanned out first: the BNLJ probe is row-expensive,
    and a single-row-group test file would otherwise run it on one
    task (3.1 s → 0.9 s at sf0.1; no-op on well-split inputs).
    """
    bands = spark.createDataFrame(
        [("low", 0.0, 15.0), ("mid", 15.0, 35.0), ("high", 35.0, 60.0)],
        "band string, lo double, hi double",
    )
    li = fan_out(
        t(spark, sf_dir, "lineitem").select("l_quantity", "l_extendedprice")
    )
    return (
        li.join(
            F.broadcast(bands),
            (F.col("l_quantity") >= F.col("lo")) & (F.col("l_quantity") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice")).alias("band_revenue"),
        )
    )


# ------------------------------------------------------ aggregations

_GROUPING_SETS_SQL = """
SELECT c_mktsegment, c_nationkey,
       CAST(GROUPING(c_mktsegment) AS BIGINT) AS g_seg,
       CAST(GROUPING(c_nationkey) AS BIGINT) AS g_nat,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
FROM customer
GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
"""


@register("q27_agg_grouping_sets", oracle=_GROUPING_SETS_SQL)
def q27_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with GROUPING() markers — the general form of
    rollup/cube (q22/q23). The same ANSI SQL runs on both engines;
    Catalyst expands it to an Expand + single hash aggregate (one
    pass over the data for all three sets)."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_GROUPING_SETS_SQL)


@register(
    "q28_agg_percentiles",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           (FLOOR(CAST(quantile_cont(o_totalprice, 0.25) AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS p25,
           (FLOOR(CAST(quantile_cont(o_totalprice, 0.5) AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS p50,
           (FLOOR(CAST(quantile_cont(o_totalprice, 0.75) AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS p75
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q28_agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated percentiles (quartiles as scalar
    p25/p50/p75 columns) of order totals per priority class.

    Spark's `percentile` and DuckDB's `quantile_cont` share the
    p*(n-1) interpolation definition; results are rounded on both
    sides to absorb last-ULP arithmetic-order differences. Scalar
    output columns only — the driver's pandas canonicalizer cannot
    sort list cells (round-1 red row). Exact percentiles sort
    within groups; at 100 TB switch to `approx_percentile`
    (t-digest, mergeable map-side sketch).
    """
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dround(F.percentile("o_totalprice", F.lit(0.25)), 4).alias("p25"),
        dround(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        dround(F.percentile("o_totalprice", F.lit(0.75)), 4).alias("p75"),
    )


# -------------------------------------------------------- subqueries

_EXISTS_SQL = """
SELECT c.c_custkey, c.c_name, c.c_mktsegment
FROM customer c
WHERE c.c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
  AND EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_totalprice > 300000.0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'F'
                    AND o.o_totalprice < 1000.0)
"""


@register("q36_subquery_exists", oracle=_EXISTS_SQL)
def q36_subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS + IN-list — one ANSI string for
    both engines. Catalyst rewrites the subqueries to left-semi and
    left-anti hash joins on o_custkey (no per-row re-execution)."""
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_EXISTS_SQL)


# ----------------------------------------------------------- windows


@register(
    "q46_window_percent_rank",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           (FLOOR(CAST(PERCENT_RANK() OVER w AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS acctbal_pct_rank,
           (FLOOR(CAST(CUME_DIST() OVER w AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS acctbal_cume_dist
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def q46_window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank + cume_dist of
    account balance within market segment (c_custkey tie-break makes
    ranks total-ordered)."""
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        t(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            "c_mktsegment",
            dround(F.percent_rank().over(w), 6).alias("acctbal_pct_rank"),
            dround(F.cume_dist().over(w), 6).alias("acctbal_cume_dist"),
        )
    )


# ------------------------------------------------------------ events


@register(
    "q57_event_funnel",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(ts) AS s_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS c_ts
      FROM events e JOIN s ON e.user_id = s.user_id AND e.ts > s.s_ts
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.c_ts
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT COUNT(*) AS n_signup_users,
           COUNT(c.c_ts) AS n_click_after,
           COUNT(p.p_ts) AS n_purchase_after
    FROM s
    LEFT JOIN c ON s.user_id = c.user_id
    LEFT JOIN p ON s.user_id = p.user_id
    """,
)
def q57_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: signup → first later click → first later
    purchase, counting users surviving each stage.

    One-shuffle formulation: a single groupBy(user_id) collects each
    user's funnel-relevant events (filtered map-side to the three
    types), and the stage timestamps fall out of array lambdas —
    s_ts = min signup ts, c_ts = min click ts after s_ts, p_ts = min
    purchase ts after c_ts. The naive per-stage join chain shuffles
    the fact table once per stage (10 exchanges); this is 2.

    Scale: per-user state is the user's own funnel events only
    (bounded; types filtered before the shuffle); stage logic is
    Catalyst higher-order functions, fully codegen'd, no Python.
    """
    ev = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("signup", "click", "purchase"))
        .select("user_id", "event_type", "ts")
    )
    per_user = ev.groupBy("user_id").agg(
        F.collect_list(F.struct("ts", "event_type")).alias("evs")
    )
    staged = (
        per_user.withColumn(
            "s_ts",
            F.array_min(
                F.expr(
                    "transform(filter(evs, e -> e.event_type = 'signup'),"
                    " e -> e.ts)"
                )
            ),
        )
        .withColumn(
            "c_ts",
            F.array_min(
                F.expr(
                    "transform(filter(evs, e -> e.event_type = 'click'"
                    " AND e.ts > s_ts), e -> e.ts)"
                )
            ),
        )
        .withColumn(
            "p_ts",
            F.array_min(
                F.expr(
                    "transform(filter(evs, e -> e.event_type = 'purchase'"
                    " AND e.ts > c_ts), e -> e.ts)"
                )
            ),
        )
        .filter(F.col("s_ts").isNotNull())
    )
    return staged.agg(
        F.count(F.lit(1)).alias("n_signup_users"),
        F.count("c_ts").alias("n_click_after"),
        F.count("p_ts").alias("n_purchase_after"),
    )


# ------------------------------------------------------------ arrays


@register(
    "q58_array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(length(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           (FLOOR(CAST(list_sum(list_transform(embedding,
                 x -> ABS(CAST(x AS DOUBLE)))) AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS l1_norm,
           (FLOOR(CAST(CAST(list_max(embedding[1:4]) AS DOUBLE) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS head4_max
    FROM embeddings
    """,
)
def q58_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over the embedding column:
    lambda filter (positive count), transform+aggregate (L1 norm),
    slice+max. All are Catalyst expressions inside whole-stage
    codegen — no Python, no explode, no shuffle.
    """
    emb = t(spark, sf_dir, "embeddings")
    l1 = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + F.abs(x.cast("double")),
    )
    return emb.select(
        "vec_id",
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).cast("bigint").alias(
            "n_pos"
        ),
        dround(l1, 4).alias("l1_norm"),
        dround(
            F.array_max(F.slice(F.col("embedding"), 1, 4)).cast("double"), 6
        ).alias("head4_max"),
    )


# -------------------------------------------------- skew / generators

N_SALTS = 8


@register(
    "q18_agg_salted",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_rows,
           {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q18_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation: group keys are widened with a
    deterministic {N_SALTS}-way salt for the first (wide) shuffle,
    then partials are re-aggregated on the true key.

    The manual form of what AQE skew-split does adaptively — on a
    100 TB input where one l_returnflag value dominates, the salt
    spreads the hot key over {N_SALTS} reducers. Decimal partial sums
    make the re-aggregation exact, so the result is bit-identical to
    the unsalted plan (the oracle is the plain GROUP BY).
    """
    li = t(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(N_SALTS))
    )
    partial = li.groupBy("l_returnflag", "l_linestatus", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("pq"),
    )
    return partial.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("pn").alias("n_rows"),
        F.sum("pq").cast("double").alias("sum_qty"),
    )


@register(
    "q47_window_range_frame",
    oracle="""
    SELECT event_id, user_id, ts,
           COUNT(*) OVER w AS n_last_hour,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
             AS value_last_hour
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
    )
    """,
)
def q47_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per user, rolling count and exact sum
    of event values over the trailing hour [ts - 1h, ts].

    Spark's rangeBetween needs a numeric ordering column, so both
    sides order by truncated epoch seconds with a [-3600, 0] frame —
    identical peer sets by construction (an INTERVAL RANGE frame over
    raw timestamps would differ on sub-second fractions).
    """
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias(
            "value_last_hour"
        ),
    )


@register(
    "q59_explode_tokens",
    oracle="""
    SELECT d.doc_id, CAST(r.i - 1 AS INTEGER) AS pos, d.arr[r.i] AS token
    FROM (SELECT doc_id, string_split(text, ' ') AS arr
          FROM documents WHERE doc_id < 100) d,
         UNNEST(range(1, 4)) AS r(i)
    WHERE r.i <= len(d.arr)
    """,
)
def q59_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator (UDTF-family) surface: posexplode of the first three
    tokens per document — one input row fanning out to N output rows
    with ordinality, entirely JVM-side."""
    return (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.posexplode(F.slice(F.split("text", " "), 1, 3)).alias("pos", "token"),
        )
    )


@register(
    "q85_pandas_udf_score",
    oracle="""
    SELECT doc_id,
           (FLOOR(CAST(LN(1 + n_chars) + 0.1 * len(string_split(text, ' ')) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS readability
    FROM documents
    """,
)
def q85_pandas_udf_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar Pandas UDF: a per-document score
    computed in numpy over Arrow batches.

    The sanctioned Python escape hatch (SURVEY.md §2b UDF row):
    columnar Arrow transfer + whole-batch numpy, ~10-100× faster
    than a row-at-a-time Python UDF. The formula is reproduced in the
    oracle SQL, so the vectorized path is correctness-checked too.
    """
    from ..functions.text_udfs import readability_score

    return (
        t(spark, sf_dir, "documents")
        .select("doc_id", readability_score("text", "n_chars").alias("readability"))
    )


# --------------------------------------------------------------- ann

N_CENTROIDS = 8


@register(
    "q74_ann_ivf",
    oracle=f"""
    WITH cent AS (
      SELECT vec_id AS cid, embedding AS ce FROM embeddings
      WHERE vec_id < {N_CENTROIDS}
    ),
    pairs AS (
      SELECT v.vec_id, c.cid,
             CAST(UNNEST(v.embedding) AS DOUBLE) AS x,
             CAST(UNNEST(c.ce) AS DOUBLE) AS y
      FROM embeddings v, cent c
    ),
    dots AS (
      SELECT vec_id, cid, SUM(x * y) AS dot,
             SQRT(SUM(x * x)) AS nv, SQRT(SUM(y * y)) AS nc
      FROM pairs GROUP BY vec_id, cid
    ),
    assign AS (
      SELECT vec_id, cid AS cell FROM (
        SELECT vec_id, cid,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY (FLOOR(CAST(dot / (nv * nc) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) DESC, cid ASC) AS rn
        FROM dots
      ) WHERE rn = 1
    ),
    probe AS (
      SELECT q.vec_id AS query_id, v.vec_id AS cand_id, qa.cell,
             CAST(UNNEST(q.embedding) AS DOUBLE) AS x,
             CAST(UNNEST(v.embedding) AS DOUBLE) AS y
      FROM embeddings q
      JOIN assign qa ON q.vec_id = qa.vec_id
      JOIN assign va ON va.cell = qa.cell AND va.vec_id <> q.vec_id
      JOIN embeddings v ON v.vec_id = va.vec_id
      WHERE q.vec_id < 5
    ),
    pdots AS (
      SELECT query_id, cand_id, cell, SUM(x * y) AS dot,
             SQRT(SUM(x * x)) AS nq, SQRT(SUM(y * y)) AS nc
      FROM probe GROUP BY query_id, cand_id, cell
    ),
    scored AS (
      SELECT query_id, cand_id, cell,
             (FLOOR(CAST(dot / (nq * nc) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS cosine,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY (FLOOR(CAST(dot / (nq * nc) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) DESC, cand_id ASC)
               AS BIGINT) AS rn
      FROM pdots
    )
    SELECT query_id, cand_id, cell, cosine, rn FROM scored WHERE rn <= 5
    """,
)
def q74_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: vectors are assigned to the nearest of
    {N_CENTROIDS} fixed centroids (inverted-file cells), then each
    query (vec_id < 5) probes only its own cell — top-5 by cosine.

    Centroids here are the first {N_CENTROIDS} vectors (a stand-in
    for a k-means codebook, which would be trained offline); the
    operator shape — broadcast codebook, map-side argmax assignment,
    equi-join probe on cell id — is the production IVF plan.
    """
    # norms hoisted to per-row frames (the q70 r3 rule)
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", norm_double("embedding").alias("nrm")
    )
    cent = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce"),
        F.col("nrm").alias("cnrm"),
    )
    sim = dround(
        dot_double("embedding", "ce") / (F.col("nrm") * F.col("cnrm")), 6
    )
    rn_w = W.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cid").asc())
    assign = (
        emb.crossJoin(F.broadcast(cent))
        .select("vec_id", "cid", sim.alias("sim"))
        .withColumn("rn", F.row_number().over(rn_w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("cid").alias("cell"))
    )
    q = (
        emb.filter(F.col("vec_id") < 5)
        .join(assign, "vec_id")
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            "cell",
            F.col("nrm").alias("qn"),
        )
    )
    cands = (
        emb.join(assign, "vec_id")
        .select(
            F.col("vec_id").alias("cand_id"),
            F.col("embedding").alias("ve"),
            F.col("cell").alias("cell_v"),
            F.col("nrm").alias("vn"),
        )
    )
    pairs = q.join(
        cands,
        (F.col("cell") == F.col("cell_v")) & (F.col("cand_id") != F.col("query_id")),
    )
    cosine = dround(dot_double("qe", "ve") / (F.col("qn") * F.col("vn")), 6)
    topk_w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("cand_id").asc()
    )
    return (
        pairs.select("query_id", "cand_id", "cell", cosine.alias("cosine"))
        .withColumn("rn", F.row_number().over(topk_w).cast("bigint"))
        .filter(F.col("rn") <= 5)
        .select("query_id", "cand_id", "cell", "cosine", "rn")
    )


# ----------------------------------------------------- pivot / melt


@register(
    "q29_pivot_native",
    oracle=f"""
    SELECT o_orderpriority,
           {sql_dsum('CASE WHEN o_orderstatus = %s THEN o_totalprice END' % "'F'")}
             AS status_F,
           {sql_dsum('CASE WHEN o_orderstatus = %s THEN o_totalprice END' % "'O'")}
             AS status_O,
           {sql_dsum('CASE WHEN o_orderstatus = %s THEN o_totalprice END' % "'P'")}
             AS status_P
    FROM orders GROUP BY o_orderpriority
    """,
)
def q29_pivot_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``.pivot()`` with an explicit value list (no extra
    distinct-values pass — at scale ALWAYS pass the list): order
    totals per priority, one column per status."""
    piv = (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(dsum(F.col("o_totalprice")))
    )
    return piv.select(
        "o_orderpriority",
        F.col("F").alias("status_F"),
        F.col("O").alias("status_O"),
        F.col("P").alias("status_P"),
    )


@register(
    "q39_unpivot_melt",
    oracle="""
    WITH wide AS (
      SELECT c_mktsegment,
             CAST(MIN(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS min_bal,
             CAST(MAX(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS max_bal
      FROM customer GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, 'min_bal' AS stat, min_bal AS value FROM wide
    UNION ALL
    SELECT c_mktsegment, 'max_bal' AS stat, max_bal AS value FROM wide
    """,
)
def q39_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide per-segment stats back to long
    (segment, stat, value) rows via ``DataFrame.unpivot`` — the
    inverse of q29's pivot, a narrow zero-shuffle transform."""
    wide = (
        t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.min(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("min_bal"),
            F.max(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("max_bal"),
        )
    )
    return wide.unpivot(
        ids=["c_mktsegment"],
        values=["min_bal", "max_bal"],
        variableColumnName="stat",
        valueColumnName="value",
    )


# ------------------------------------------------------- multimodal


@register(
    "q92_audio_features",
    oracle="""
    WITH samples AS (
      SELECT doc_id, ascii(substr(text, CAST(i AS INTEGER), 1)) AS v
      FROM documents, UNNEST(range(1, len(text) + 1)) AS r(i)
    ),
    sums AS (
      SELECT doc_id, COUNT(*) AS n,
             SUM(v) AS s, SUM(v * v) AS ss
      FROM samples GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_samples,
           CAST(s AS DOUBLE) / n AS mean_amp,
           SQRT(CAST(ss AS DOUBLE) / n) AS rms,
           (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n) / n AS variance
    FROM sums
    """,
)
def q92_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction over an opaque binary column: treat
    payload bytes as 8-bit PCM samples, compute mean amplitude / RMS
    / variance whole-batch in numpy via mapInPandas.

    The "waveform" is the documents payload (no audio libs in this
    container — a real deployment swaps np.frombuffer for a proper
    codec decode with identical schema/batch shape). Byte sums are
    exact integers in both engines, so the derived doubles are
    bit-identical to the SQL oracle with no rounding.
    """
    from collections.abc import Iterator

    import pandas as pd

    blobs = t(spark, sf_dir, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload")
    )

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out = {"doc_id": [], "n_samples": [], "mean_amp": [], "rms": [], "variance": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                n = len(arr)
                s = int(arr.sum())
                ss = int((arr * arr).sum())
                out["doc_id"].append(doc_id)
                out["n_samples"].append(n)
                out["mean_amp"].append(s / n)
                out["rms"].append(float(np.sqrt(ss / n)))
                out["variance"].append((ss - s * s / n) / n)
            yield pd.DataFrame(out)

    schema = (
        "doc_id long, n_samples long, mean_amp double, rms double,"
        " variance double"
    )
    return blobs.mapInPandas(features, schema=schema)


# ------------------------------------------------------- merge / CDC


@register(
    "q37_merge_upsert",
    oracle="""
    WITH updates AS (
      -- +10% in EXACT integer cents, rounded half-up on the cent
      -- grid: (cents*11/10) half-up = (22*cents + 10) // 20. The
      -- engines' decimal-vs-double literal typing of `* 1.1` differs
      -- at .xx5 boundaries (r9 migration find), integer cents don't;
      -- cents themselves come from FLOOR(x*100 + 0.5) because
      -- double->BIGINT CAST rounds in DuckDB but truncates in Spark.
      SELECT o_orderkey,
             ((22 * CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) + 10)
               // 20) / 100.0 AS o_totalprice,
             'R' AS o_orderstatus
      FROM orders WHERE o_orderstatus = 'F'
    ),
    inserts AS (
      SELECT o_orderkey + (SELECT MAX(o_orderkey) FROM orders) + 1
               AS o_orderkey,
             CAST(o_totalprice AS DOUBLE) AS o_totalprice,
             'N' AS o_orderstatus
      FROM orders WHERE o_orderkey < 10
    ),
    kept AS (
      SELECT o.o_orderkey, CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
             o.o_orderstatus
      FROM orders o ANTI JOIN updates u ON o.o_orderkey = u.o_orderkey
    )
    SELECT * FROM kept
    UNION ALL
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE), o_orderstatus FROM updates
    UNION ALL
    SELECT * FROM inserts
    """,
)
def q37_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Emulated MERGE INTO (no Delta in v1): updates = F-status
    orders repriced +10%, inserts = synthetic rows keyed above the
    max orderkey. Snapshot = (target anti-join updates) + updated +
    inserts — the standard CDC upsert recipe from narrow joins on
    the merge key. The max-key scalar joins in via a broadcast
    single-row cross join (no driver collect)."""
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    updates = o.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey",
        (
            F.expr(
                "(22 * CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"
                " + 10) DIV 20"
            )
            / F.lit(100.0)
        ).alias("o_totalprice"),
        F.lit("R").alias("o_orderstatus"),
    )
    max_key = o.agg(F.max("o_orderkey").alias("mk"))
    inserts = (
        o.filter(F.col("o_orderkey") < 10)
        .crossJoin(F.broadcast(max_key))
        .select(
            (F.col("o_orderkey") + F.col("mk") + 1).alias("o_orderkey"),
            "o_totalprice",
            F.lit("N").alias("o_orderstatus"),
        )
    )
    kept = o.join(updates.select("o_orderkey"), "o_orderkey", "left_anti")
    return kept.unionByName(updates).unionByName(inserts)


@register(
    "q38_approx_percentile",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q38_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch: ``approx_percentile`` (t-digest-
    style, combines map-side) — the 100 TB path where q28's exact
    sort-based percentiles stop scaling.

    Sketch internals differ per engine, so the checkable invariant
    is emitted instead of raw sketch values: each approximate
    quartile must land within 2% relative error of the exact
    percentile (accuracy=1000 bounds rank error at 0.1%, far
    tighter). Scalar boolean columns only (driver canonicalizer
    contract — no arrays).
    """
    o = t(spark, sf_dir, "orders")

    def ok(p: float) -> Column:
        approx = F.approx_percentile("o_totalprice", F.lit(p), F.lit(1000))
        exact = F.percentile("o_totalprice", F.lit(p))
        return (F.abs(approx - exact) <= 0.02 * F.abs(exact)).alias(
            f"p{int(p * 100)}_ok"
        )

    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"), ok(0.25), ok(0.5), ok(0.75)
    )


@register(
    "q48_window_nth_value",
    oracle="""
    SELECT DISTINCT o_custkey,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_orderkey,
           NTH_VALUE(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (
      PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
    """,
)
def q48_window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over an unbounded frame: each customer's second
    order (NULL for single-order customers), reduced with DISTINCT
    to one row per customer."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.nth_value("o_orderkey", 2).over(w).alias("second_orderkey"),
            F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
        )
        .distinct()
    )


# ------------------------------------------------- grouped map (UDAF)


@register(
    "q49_grouped_pandas_gaps",
    oracle="""
    WITH ordered AS (
      SELECT o_custkey, epoch_us(o_orderdate) AS ts_us,
             LAG(epoch_us(o_orderdate)) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate ASC, o_orderkey ASC
             ) AS prev_us
      FROM orders
    )
    SELECT o_custkey,
           COUNT(*) AS n_orders,
           CAST(SUM(ts_us - prev_us) AS DOUBLE)
             / COUNT(ts_us - prev_us) / 86400000000.0 AS mean_gap_days,
           CAST(MAX(ts_us - prev_us) AS DOUBLE) / 86400000000.0
             AS max_gap_days
    FROM ordered GROUP BY o_custkey
    HAVING COUNT(*) >= 2
    """,
)
def q49_grouped_pandas_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group Python logic at scale: per-customer inter-order gap
    statistics in pandas — via ``mapInPandas`` over key-repartitioned,
    key-sorted partitions with a VECTORIZED cross-group pandas
    groupby, not per-group ``applyInPandas``.

    Why not applyInPandas here: it makes one Python call (plus Arrow
    round-trip) PER GROUP — ~2.5 ms each, 38 s for 15k customers at
    sf0.1, fatal for 10^9 groups at 100 TB. mapInPandas amortizes
    thousands of groups per Arrow batch (same workload: 0.4 s, ~90×).
    A group can span two Arrow batches within a partition, so the
    generator carries the tail group forward — the production pattern
    for many-small-groups Python aggregation. (For BOUNDED group
    domains where per-group calls are fine, see q210's true
    applyInPandas.)

    Gaps are integer microseconds (sums exact below 2^53), so the
    derived doubles match the SQL oracle bit-for-bit. One shuffle on
    the group key; carry state is one group's rows, never a
    partition.
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    def emit(pdf: pd.DataFrame) -> pd.DataFrame:
        us = pdf["o_orderdate"].astype("datetime64[us]").astype("int64").to_numpy()
        key = pdf["o_custkey"].to_numpy()
        d = np.diff(us).astype("float64")
        dd = np.where(key[1:] == key[:-1], d, np.nan)
        g = pd.DataFrame(
            {"o_custkey": key, "dd": np.concatenate([[np.nan], dd])}
        ).groupby("o_custkey", sort=False)
        agg = g.agg(
            n_orders=("o_custkey", "size"),
            sum_d=("dd", "sum"),
            cnt_d=("dd", "count"),
            max_d=("dd", "max"),
        ).reset_index()
        agg = agg[agg["n_orders"] >= 2]
        return pd.DataFrame(
            {
                "o_custkey": agg["o_custkey"].astype("int64"),
                "n_orders": agg["n_orders"].astype("int64"),
                "mean_gap_days": agg["sum_d"] / agg["cnt_d"] / 86400000000.0,
                "max_gap_days": agg["max_d"] / 86400000000.0,
            }
        )

    def gaps(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if pdf.empty:
                continue
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
            # hold back the last key's rows: the next batch may continue it
            mask = (pdf["o_custkey"] == pdf["o_custkey"].iloc[-1]).to_numpy()
            carry = pdf[mask]
            body = pdf[~mask]
            if len(body):
                yield emit(body)
        if carry is not None and len(carry):
            yield emit(carry)

    return (
        t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .repartition("o_custkey")
        .sortWithinPartitions("o_custkey", "o_orderdate", "o_orderkey")
        .mapInPandas(
            gaps,
            schema="o_custkey long, n_orders long, mean_gap_days double,"
            " max_gap_days double",
        )
    )


@register(
    "q196_hierarchy_flatten",
    oracle="""
    WITH RECURSIVE walk(doc_id, anc, depth) AS (
      SELECT doc_id, doc_id, 0
      FROM documents WHERE doc_id < 64
      UNION ALL
      SELECT w.doc_id, w.anc // 2, w.depth + 1
      FROM walk w WHERE w.anc > 1
    )
    SELECT doc_id,
           CAST(MAX(depth) AS BIGINT) AS depth,
           CAST(MIN(anc) AS BIGINT) AS root
    FROM walk GROUP BY doc_id
    """,
)
def q196_hierarchy_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-CTE capability: flatten a parent hierarchy (here the
    implicit tree ``parent = floor(id / 2)``) to per-node depth and
    root — the org-chart / bill-of-materials traversal SQL expresses
    with WITH RECURSIVE, which Spark lacks natively.

    The Spark side uses pointer jumping (path halving): each round
    replaces every node's ancestor pointer with its ancestor's
    ancestor, so rounds = O(log depth), not O(depth) — 20 rounds
    cover depth ~10^6. Each round is one self-join on the CURRENT
    ancestor frontier (bounded by node count), with localCheckpoint
    truncating lineage like q64's label propagation.

    100 TB note: pointer jumping is the scalable recursion pattern —
    a literal row-per-step recursion would need depth rounds and
    carry the full path; here state is one (node, anc, depth) row.
    """
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 64)
    # state: (doc_id, anc, depth climbed so far)
    state = d.select(
        "doc_id", F.col("doc_id").alias("anc"), F.lit(0).alias("depth")
    )
    # Jump table starts as one parent step: anc -> (anc/2, 1 step),
    # built over the full id RANGE (2..63), not over the doc_ids
    # present in documents: a walk passes through intermediate
    # ancestors that need not exist as document rows, and a gapped
    # doc_id domain would otherwise stall the pointer chase at the
    # first missing ancestor (silently diverging from the oracle).
    jump = spark.range(2, 64).select(
        F.col("id").alias("j_from"),
        F.floor(F.col("id") / 2).cast("long").alias("j_to"),
        F.lit(1).alias("j_steps"),
    )
    for _ in range(7):  # 2^7 = 128 levels > log2(64)
        stepped = (
            state.join(jump, state.anc == jump.j_from, "left")
            .select(
                "doc_id",
                F.coalesce("j_to", "anc").alias("anc"),
                (F.col("depth") + F.coalesce("j_steps", F.lit(0))).alias(
                    "depth"
                ),
            )
            .localCheckpoint()
        )
        j2 = jump.select(
            F.col("j_from").alias("f2"), F.col("j_to").alias("t2"),
            F.col("j_steps").alias("s2"),
        )
        jump = (
            jump.join(j2, jump.j_to == j2.f2, "left")
            .select(
                "j_from",
                F.coalesce("t2", "j_to").alias("j_to"),
                (F.col("j_steps") + F.coalesce("s2", F.lit(0))).alias(
                    "j_steps"
                ),
            )
            .localCheckpoint()
        )
        state = stepped
    return state.select(
        "doc_id",
        F.col("depth").cast("bigint").alias("depth"),
        F.col("anc").cast("bigint").alias("root"),
    )


# --------------------------------- q347 mergeable quantile sketch

QSK_BINS = 128
QSK_QS = (0.5, 0.9, 0.99)


@register(
    "q347_quantile_sketch_merge",
    oracle=f"""
    WITH rng AS (
      SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx,
             COUNT(*) AS n
      FROM orders
    ),
    binned AS (
      -- mx = mn (constant column / single row) collapses the grid to
      -- bin 0 on both engines instead of dividing by zero
      SELECT CASE WHEN r.mx = r.mn THEN 0
                  ELSE LEAST({QSK_BINS} - 1,
                             CAST(FLOOR((o.o_totalprice - r.mn)
                                        / (r.mx - r.mn)
                                        * {QSK_BINS}) AS BIGINT)) END AS bin,
             o.o_orderpriority AS shard
      FROM orders o CROSS JOIN rng r
    ),
    partials AS (
      -- per-shard partial sketches: the mergeable state a
      -- 1000-executor cluster would emit
      SELECT shard, bin, COUNT(*) AS c FROM binned GROUP BY shard, bin
    ),
    merged AS (
      -- sketch MERGE = bin-wise SUM (associative/commutative)
      SELECT bin, SUM(c) AS c FROM partials GROUP BY bin
    ),
    cum AS (
      SELECT bin, SUM(c) OVER (ORDER BY bin) AS cum FROM merged
    ),
    est AS (
      SELECT {", ".join(
        f"r.mn + (r.mx - r.mn) * ((SELECT MIN(bin) FROM cum, rng r2 "
        f"WHERE cum >= {q} * r2.n) + 1.0) / {QSK_BINS} AS est_p{int(q * 100)}"
        for q in QSK_QS)}
      FROM rng r
    ),
    exact AS (
      SELECT {", ".join(
        f"quantile_cont(o_totalprice, {q}) AS exact_p{int(q * 100)}"
        for q in QSK_QS)}
      FROM orders
    )
    SELECT CAST(r.n AS BIGINT) AS n,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM partials)
             AS n_partial_bins,
           {", ".join(
             f"(FLOOR(CAST(e.est_p{int(q * 100)} AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS est_p{int(q * 100)}, "
             f"(FLOOR(CAST(x.exact_p{int(q * 100)} AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS exact_p{int(q * 100)}, "
             f"(FLOOR(CAST(ABS(e.est_p{int(q * 100)} - x.exact_p{int(q * 100)})"
             f" / NULLIF(x.exact_p{int(q * 100)}, 0.0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)"
             f" AS relerr_p{int(q * 100)}"
             for q in QSK_QS)}
    FROM rng r CROSS JOIN est e CROSS JOIN exact x
    """,
)
def q347_quantile_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable fixed-grid quantile sketch — the distributed-
    percentile design beside CMS (q219), HLL (q246) and KMV (q271):
    each shard (order priority stands in for an executor) emits a
    {QSK_BINS}-bin histogram over the global [min, max] range; the
    global sketch is the BIN-WISE SUM of partials (associative and
    commutative, so any merge tree gives the same answer — the
    property that replaces a full sort with {QSK_BINS} integers per
    shard at 100 TB); quantiles read off the cumulative histogram as
    upper bin edges, compared against the exact sorted percentiles
    with per-quantile relative error.

    Everything is integer counts until the final edge arithmetic, so
    the estimate is bit-identical across engines and partitionings.
    """
    orders = t(spark, sf_dir, "orders")
    rng = orders.agg(
        F.min("o_totalprice").alias("mn"),
        F.max("o_totalprice").alias("mx"),
        F.count(F.lit(1)).alias("n"),
    )
    # mx = mn (constant column / single row) collapses the grid to
    # bin 0 on both engines instead of dividing by zero (ANSI error
    # on Spark, inf on DuckDB — property-hunt find, r3)
    binned = orders.crossJoin(F.broadcast(rng)).select(
        F.when(F.col("mx") == F.col("mn"), F.lit(0).cast("bigint"))
        .otherwise(
            F.least(
                F.lit(QSK_BINS - 1),
                F.floor(
                    (F.col("o_totalprice") - F.col("mn"))
                    / (F.col("mx") - F.col("mn"))
                    * QSK_BINS
                ).cast("bigint"),
            )
        )
        .alias("bin"),
        F.col("o_orderpriority").alias("shard"),
    )
    partials = binned.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("c")
    )
    partials_ck = partials.localCheckpoint(eager=True)
    merged = partials_ck.groupBy("bin").agg(F.sum("c").alias("c"))
    cum = merged.select(
        "bin",
        F.sum("c").over(W.orderBy("bin")).alias("cum"),
    )
    est_cols = []
    for q in QSK_QS:
        p = int(q * 100)
        sel = (
            cum.crossJoin(F.broadcast(rng.select("n")))
            .filter(F.col("cum") >= F.lit(q) * F.col("n"))
            .agg(F.min("bin").alias(f"bin_p{p}"))
        )
        est_cols.append(sel)
    est = est_cols[0]
    for extra in est_cols[1:]:
        est = est.crossJoin(F.broadcast(extra))
    exact = orders.agg(
        *[
            F.expr(f"percentile(o_totalprice, {q})").alias(f"exact_raw_p{int(q*100)}")
            for q in QSK_QS
        ]
    )
    out = (
        rng.crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(exact))
        .crossJoin(
            F.broadcast(
                partials_ck.agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_partial_bins")
                )
            )
        )
    )
    sel = [
        F.col("n").cast("bigint").alias("n"),
        F.col("n_partial_bins"),
    ]
    for q in QSK_QS:
        p = int(q * 100)
        est_v = (
            F.col("mn")
            + (F.col("mx") - F.col("mn"))
            * (F.col(f"bin_p{p}") + F.lit(1.0))
            / QSK_BINS
        )
        sel += [
            dround(est_v, 4).alias(f"est_p{p}"),
            dround(F.col(f"exact_raw_p{p}"), 4).alias(f"exact_p{p}"),
            # NULLIF: an all-zero price column zeroes the exact
            # percentile — ANSI Spark would error on /0 while DuckDB
            # returns inf (property-hunt find, r3)
            dround(
                F.abs(est_v - F.col(f"exact_raw_p{p}"))
                / F.nullif(F.col(f"exact_raw_p{p}"), F.lit(0.0)),
                6,
            ).alias(f"relerr_p{p}"),
        ]
    return out.select(*sel)
