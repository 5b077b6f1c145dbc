"""Round-5 continuation operators: columnar-encoding advisor,
Krippendorff's alpha, AR(1) Yule-Walker fit, and Page-Hinkley drift
detection — four classic engine/stats/stream-monitoring ops the
451-query registry did not yet cover.

Shares the repo's determinism contract (FIXTURES.md): md5-derived
uniforms for anything random, exact integer / DECIMAL reductions for
cross-row sums, integer half-up DIV grids instead of float ROUND on
tie-prone ratios, and total-order tie-breakers on every ranked
output.

Reference parity note: the reference (tesseract2048/hadoop-brotli)
is a compression codec (`BroCodec.java`) with no query surface;
these extend the engine's analytics layer per SURVEY.md §2b. q452
is a direct cousin of the reference's raison d'être — choosing a
physical encoding by measured byte cost (`BroCompressor.java`'s
quality/ratio trade) — lifted to the columnar-layout layer.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — resolves pandas_udf type hints
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ._util import dround, fan_out, t

# ---------------------------------------------------------------------------
# q452 columnar encoding advisor (plain vs dictionary vs RLE)
#
# The Parquet/ORC writer decision (Abadi, Madden & Ferreira, SIGMOD
# 2006: "Integrating Compression and Execution in Column-Oriented
# Database Systems"): per column, estimate the encoded size under
# PLAIN (raw bytes), DICTIONARY (distinct-value dictionary + fixed-
# width indexes), and RLE (runs × (value + 32-bit length)), and
# recommend the cheapest. Run boundaries are physical-order-
# dependent, so the advisor pins the order to the table's natural
# key (l_orderkey, l_linenumber) and counts runs WITHIN each order —
# a partitioned window, never a global sort. Index bit-width is
# LENGTH(BIN(ndv-1)) — pure integer, no log2 float boundary.

ENC_COLS_SQL = """
      SELECT 'l_returnflag' AS col_name,
             CAST(l_returnflag AS VARCHAR) AS v,
             l_orderkey, l_linenumber FROM lineitem
      UNION ALL
      SELECT 'l_linestatus', CAST(l_linestatus AS VARCHAR),
             l_orderkey, l_linenumber FROM lineitem
      UNION ALL
      SELECT 'l_quantity',
             CAST(CAST(l_quantity AS DECIMAL(12,2)) AS VARCHAR),
             l_orderkey, l_linenumber FROM lineitem
      UNION ALL
      SELECT 'l_discount',
             CAST(CAST(l_discount AS DECIMAL(12,2)) AS VARCHAR),
             l_orderkey, l_linenumber FROM lineitem
      UNION ALL
      SELECT 'l_suppkey', CAST(l_suppkey AS VARCHAR),
             l_orderkey, l_linenumber FROM lineitem
      UNION ALL
      SELECT 'l_shipdate',
             CAST(CAST(l_shipdate AS DATE) AS VARCHAR),
             l_orderkey, l_linenumber FROM lineitem
"""


@register(
    "q452_encoding_advisor",
    category="mixed-extensions",
    oracle=f"""
    WITH long AS (
      {ENC_COLS_SQL}
    ),
    vals AS (
      SELECT col_name, v, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(LENGTH(v) AS BIGINT) AS len
      FROM long GROUP BY col_name, v
    ),
    colstats AS (
      SELECT col_name,
             CAST(SUM(n) AS BIGINT) AS n_rows,
             CAST(COUNT(*) AS BIGINT) AS ndv,
             CAST(SUM(n * len) AS BIGINT) AS data_bytes,
             CAST(SUM(len) AS BIGINT) AS dict_bytes,
             CAST(MAX(len) AS BIGINT) AS max_len
      FROM vals GROUP BY col_name
    ),
    runs AS (
      SELECT col_name, CAST(COUNT(*) AS BIGINT) AS n_runs
      FROM (
        SELECT col_name,
               CASE WHEN LAG(v) OVER (
                      PARTITION BY col_name, l_orderkey
                      ORDER BY l_linenumber, v)
                    IS DISTINCT FROM v
                    THEN 1 ELSE 0 END AS run_start
        FROM long
      )
      WHERE run_start = 1
      GROUP BY col_name
    ),
    sized AS (
      SELECT c.col_name, c.n_rows, c.ndv, r.n_runs,
             CAST(8 * c.data_bytes AS BIGINT) AS plain_bits,
             CAST(8 * c.dict_bytes
                  + c.n_rows * LENGTH(BIN(c.ndv - 1)) AS BIGINT)
               AS dict_bits,
             CAST(r.n_runs * (8 * c.max_len + 32) AS BIGINT)
               AS rle_bits
      FROM colstats c JOIN runs r USING (col_name)
    )
    SELECT col_name, n_rows, ndv, n_runs,
           plain_bits, dict_bits, rle_bits,
           CASE WHEN dict_bits <= plain_bits AND dict_bits <= rle_bits
                  THEN 'dict'
                WHEN rle_bits <= plain_bits THEN 'rle'
                ELSE 'plain' END AS encoding
    FROM sized
    ORDER BY col_name
    """,
)
def q452_encoding_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar encoding advisor — the Parquet/ORC writer's
    plain-vs-dictionary-vs-RLE decision (Abadi et al., SIGMOD 2006)
    as a query: melt six lineitem columns to (col_name, value) long
    form in ONE scan (``stack``), size each encoding from exact
    integer stats, and recommend the cheapest.

    * PLAIN = 8 × total value bytes.
    * DICT  = 8 × distinct-value bytes + n_rows × ceil(log2(ndv))
      index bits, where the bit-width is ``LENGTH(BIN(ndv-1))`` —
      pure integer on both engines, no log2 float boundary.
    * RLE   = runs × (8 × max value bytes + 32-bit run length),
      runs counted WITHIN each (col, orderkey) group ordered by
      (l_linenumber, v) — the table's natural clustering, with the
      value itself breaking the fixture's duplicate line numbers —
      so the metric is deterministic and needs no global sort.

    Determinism: numeric columns are stringified through
    DECIMAL(12,2) (exact 2-decimal fixtures) so both engines render
    identical text; every byte/bit count is BIGINT; the recommend
    CASE has a fixed dict > rle > plain tie preference.

    Scale: one scan + one (col,value)-grain exchange that partial
    aggregation collapses, one partitioned window at the table's
    natural key (no global sort), and a 6-row join. At 100 TB the
    value-grain pre-aggregate is the standard two-level NDV plan;
    run counting stays co-partitioned with the scan order.
    """
    li = t(spark, sf_dir, "lineitem")
    long_df = li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(6, "
            "'l_returnflag', CAST(l_returnflag AS STRING), "
            "'l_linestatus', CAST(l_linestatus AS STRING), "
            "'l_quantity', CAST(CAST(l_quantity AS DECIMAL(12,2)) AS STRING), "
            "'l_discount', CAST(CAST(l_discount AS DECIMAL(12,2)) AS STRING), "
            "'l_suppkey', CAST(l_suppkey AS STRING), "
            "'l_shipdate', CAST(CAST(l_shipdate AS DATE) AS STRING)"
            ") AS (col_name, v)"
        ),
    )
    vals = long_df.groupBy("col_name", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    colstats = vals.select(
        "col_name", "n", F.length("v").cast("bigint").alias("len")
    ).groupBy("col_name").agg(
        F.sum("n").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("ndv"),
        F.sum(F.col("n") * F.col("len")).cast("bigint").alias("data_bytes"),
        F.sum("len").cast("bigint").alias("dict_bytes"),
        F.max("len").cast("bigint").alias("max_len"),
    )
    # run counting via groupBy(order) + in-array adjacency (r9): the
    # old (col, orderkey)-partitioned lag window shuffled and SORTED
    # the full 6-way melt (3.6M rows, 72 MB at sf0.1); grouping the
    # PRE-melt rows ships each (orderkey, linenumber, 6 values) tuple
    # once (~half the bytes) and the per-order sort is an array_sort
    # over <= a basket of lines x 6 columns — same (linenumber, v)
    # order, same "first row of each group starts a run" count
    enc_cols = [
        "l_returnflag",
        "l_linestatus",
        "l_quantity",
        "l_discount",
        "l_suppkey",
        "l_shipdate",
    ]
    pre_melt = li.select(
        "l_orderkey",
        "l_linenumber",
        F.expr("CAST(l_returnflag AS STRING)").alias("c0"),
        F.expr("CAST(l_linestatus AS STRING)").alias("c1"),
        F.expr(
            "CAST(CAST(l_quantity AS DECIMAL(12,2)) AS STRING)"
        ).alias("c2"),
        F.expr(
            "CAST(CAST(l_discount AS DECIMAL(12,2)) AS STRING)"
        ).alias("c3"),
        F.expr("CAST(l_suppkey AS STRING)").alias("c4"),
        F.expr("CAST(CAST(l_shipdate AS DATE) AS STRING)").alias("c5"),
    )
    grouped = pre_melt.groupBy("l_orderkey").agg(
        F.collect_list(
            F.struct("l_linenumber", "c0", "c1", "c2", "c3", "c4", "c5")
        ).alias("rows")
    )
    # sort each column's (linenumber, value) array ONCE per order in
    # a projection (a lambda-inlined variant re-sorted per adjacency
    # probe and measured slower than the window it replaced), then
    # count adjacent changes; sequence(2, n) counts DOWN for n < 2
    # (Spark picks step -1), so guard the single-line basket
    sorted_arrs = grouped.select(
        F.size("rows").alias("n"),
        *[
            F.expr(
                f"transform(array_sort(transform(rows, r -> "
                f"struct(r.l_linenumber AS ln, r.c{i} AS v))), "
                f"s -> s.v)"
            ).alias(f"a{i}")
            for i in range(6)
        ],
    )
    run_sums = sorted_arrs.select(
        "n",
        *[
            F.expr(
                f"CASE WHEN n < 2 THEN 1 ELSE "
                f"1 + size(filter(sequence(2, n), j -> "
                f"element_at(a{i}, j) != element_at(a{i}, j - 1))) END"
            ).alias(f"r{i}")
            for i in range(6)
        ],
    ).agg(*[F.sum(f"r{i}").cast("bigint").alias(f"nr{i}") for i in range(6)])
    runs = run_sums.select(
        F.expr(
            "stack(6, "
            + ", ".join(
                f"'{enc_cols[i]}', nr{i}" for i in range(6)
            )
            + ") AS (col_name, n_runs)"
        )
    )
    sized = colstats.join(F.broadcast(runs), "col_name").select(
        "col_name",
        "n_rows",
        "ndv",
        "n_runs",
        (8 * F.col("data_bytes")).cast("bigint").alias("plain_bits"),
        (
            8 * F.col("dict_bytes")
            + F.col("n_rows") * F.length(F.bin(F.col("ndv") - 1))
        ).cast("bigint").alias("dict_bits"),
        (F.col("n_runs") * (8 * F.col("max_len") + 32))
        .cast("bigint")
        .alias("rle_bits"),
    )
    return sized.select(
        "col_name",
        "n_rows",
        "ndv",
        "n_runs",
        "plain_bits",
        "dict_bits",
        "rle_bits",
        F.when(
            (F.col("dict_bits") <= F.col("plain_bits"))
            & (F.col("dict_bits") <= F.col("rle_bits")),
            F.lit("dict"),
        )
        .when(F.col("rle_bits") <= F.col("plain_bits"), F.lit("rle"))
        .otherwise(F.lit("plain"))
        .alias("encoding"),
    ).orderBy("col_name")


# ---------------------------------------------------------------------------
# q453 Krippendorff's alpha (nominal, with missing ratings)
#
# The content-analysis reliability standard (Krippendorff 2004) —
# the generalization Fleiss' kappa (q350) cannot make: arbitrary
# missingness and any number of raters. Three deterministic
# md5-raters label each document with one of 4 categories; each
# rater skips ~20% of docs. Units with <2 ratings drop out. The
# whole statistic reduces to integers: with m_u ∈ {2,3}, doubling
# the per-unit pair terms clears the (m_u - 1) denominators, so
# alpha = 1 - O2·(n-1) / (2·(n² - Σ n_c²)) is one final division
# of exact BIGINTs.

KRA_SALT = "kra_r5"
KRA_RATERS = 3
KRA_CATS = 4
KRA_MISS_MOD = 5  # rater r skips doc when md5 % 5 == 0 (~20%)


def _kra_hash_sql(field: str) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|{KRA_SALT}|'"
        f" || CAST(r AS VARCHAR) || '|{field}'), 1, 13)) AS BIGINT)"
    )


@register(
    "q453_krippendorff_alpha",
    category="ml-eval-calibration",
    oracle=f"""
    WITH ratings AS (
      SELECT doc_id, r, {_kra_hash_sql("c")} % {KRA_CATS} AS cat
      FROM documents
      CROSS JOIN (SELECT UNNEST([1, 2, 3]) AS r) AS raters
      WHERE {_kra_hash_sql("m")} % {KRA_MISS_MOD} <> 0
    ),
    unit AS (
      SELECT doc_id, cat, CAST(COUNT(*) AS BIGINT) AS n_uc
      FROM ratings GROUP BY doc_id, cat
    ),
    mu AS (
      SELECT doc_id, CAST(SUM(n_uc) AS BIGINT) AS m_u,
             CAST(SUM(n_uc * n_uc) AS BIGINT) AS ss
      FROM unit GROUP BY doc_id
      HAVING SUM(n_uc) >= 2
    ),
    oterm AS (
      SELECT CAST(SUM(((m_u * m_u - ss) * 2) // (m_u - 1)) AS BIGINT)
               AS o2
      FROM mu
    ),
    margins AS (
      SELECT u.cat, CAST(SUM(u.n_uc) AS BIGINT) AS n_c
      FROM unit u JOIN mu USING (doc_id)
      GROUP BY u.cat
    ),
    tot AS (
      SELECT CAST(SUM(n_c) AS BIGINT) AS n,
             CAST(SUM(n_c * n_c) AS BIGINT) AS sq,
             CAST(COUNT(*) AS BIGINT) AS n_categories
      FROM margins
    ),
    units AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_units FROM mu
    )
    SELECT u.n_units, tt.n AS n_values, tt.n_categories,
           CAST(o.o2 AS DOUBLE) / (2 * tt.n) AS d_o,
           CAST(tt.n * tt.n - tt.sq AS DOUBLE)
             / (tt.n * (tt.n - 1)) AS d_e,
           1 - CAST(o.o2 * (tt.n - 1) AS DOUBLE)
             / NULLIF(2 * (tt.n * tt.n - tt.sq), 0) AS alpha
    FROM tot tt, oterm o, units u
    """,
)
def q453_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (nominal) — the chance-corrected
    inter-annotator agreement that, unlike Fleiss' kappa (q350),
    tolerates MISSING ratings and any rater count; the reliability
    gate every labeling pipeline runs before trusting its gold set.
    Three md5-derived raters each label ~80% of documents with one
    of {KRA_CATS} categories.

    Math: for pairable units (m_u >= 2), total observed disagreement
    Sum_(c!=k) o_ck = Sum_u (m_u^2 - Sum_c n_uc^2)/(m_u - 1); with
    m_u in {{2,3}} the doubled terms are exact integers (the *2 //
    (m_u-1) trick), the coincidence margins are plain category
    counts over pairable units, and
    alpha = 1 - O2*(n-1) / (2*(n^2 - Sum n_c^2)) — one double
    division of identical BIGINTs on both engines, so no rounding
    grid is needed anywhere.

    Scale: two group-bys at (doc, cat) then doc grain — partial-agg
    collapsible — and three 1-row scalar aggregates combined with
    broadcast joins. No window, no sort; linear in ratings.
    """
    docs = t(spark, sf_dir, "documents").select("doc_id")
    raters = docs.select(
        "doc_id", F.explode(F.array(*[F.lit(i) for i in range(1, KRA_RATERS + 1)])).alias("r")
    )

    def _h(field: str):
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(f"|{KRA_SALT}|"),
                        F.col("r").cast("string"),
                        F.lit(f"|{field}"),
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("bigint")

    ratings = raters.filter(_h("m") % KRA_MISS_MOD != 0).select(
        "doc_id", "r", (_h("c") % KRA_CATS).alias("cat")
    )
    unit = ratings.groupBy("doc_id", "cat").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_uc")
    )
    mu = (
        unit.groupBy("doc_id")
        .agg(
            F.sum("n_uc").cast("bigint").alias("m_u"),
            F.sum(F.col("n_uc") * F.col("n_uc")).cast("bigint").alias("ss"),
        )
        .filter(F.col("m_u") >= 2)
    )
    oterm = mu.agg(
        F.sum(
            F.expr("((m_u * m_u - ss) * 2) DIV (m_u - 1)")
        ).cast("bigint").alias("o2")
    )
    margins = unit.join(mu.select("doc_id"), "doc_id").groupBy("cat").agg(
        F.sum("n_uc").cast("bigint").alias("n_c")
    )
    tot = margins.agg(
        F.sum("n_c").cast("bigint").alias("n"),
        F.sum(F.col("n_c") * F.col("n_c")).cast("bigint").alias("sq"),
        F.count(F.lit(1)).cast("bigint").alias("n_categories"),
    )
    units = mu.agg(F.count(F.lit(1)).cast("bigint").alias("n_units"))
    joined = tot.crossJoin(F.broadcast(oterm)).crossJoin(F.broadcast(units))
    return joined.select(
        "n_units",
        F.col("n").alias("n_values"),
        "n_categories",
        (F.col("o2").cast("double") / (2 * F.col("n"))).alias("d_o"),
        (
            (F.col("n") * F.col("n") - F.col("sq")).cast("double")
            / (F.col("n") * (F.col("n") - 1))
        ).alias("d_e"),
        (
            F.lit(1)
            - (F.col("o2") * (F.col("n") - 1)).cast("double")
            / F.nullif(
                2 * (F.col("n") * F.col("n") - F.col("sq")), F.lit(0)
            )
        ).alias("alpha"),
    )


# ---------------------------------------------------------------------------
# q454 AR(1) fit by Yule-Walker (lag-1 autocorrelation)
#
# The first rung of the Box-Jenkins ladder the registry's smoothers
# (q365 Holt) skip: fit y_t = mu + phi*(y_{t-1} - mu) + eps on the
# daily-revenue series. phi is the lag-1 sample autocorrelation;
# demeaning happens on the integer CENT grid (half-up DIV) so both
# numerator and denominator are exact DECIMAL sums of BIGINT
# products — phi is one double division.


@register(
    "q454_ar1_yule_walker",
    category="analytics-stats (regression/tests/causal)",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                  AS BIGINT) AS cents
      FROM orders GROUP BY CAST(o_orderdate AS DATE)
    ),
    m AS (
      SELECT CAST((2 * SUM(cents) + COUNT(*)) // (2 * COUNT(*))
                  AS BIGINT) AS mean_cents,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM daily
    ),
    d AS (
      SELECT day, cents - m.mean_cents AS dev,
             LAG(cents - m.mean_cents) OVER (ORDER BY day) AS dev_prev,
             CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS tk,
             m.mean_cents, m.n_days
      FROM daily, m
    ),
    acc AS (
      SELECT MAX(mean_cents) AS mean_cents,
             MAX(n_days) AS n_days,
             CAST(SUM(CAST(dev AS DECIMAL(18,0))
                      * CAST(dev AS DECIMAL(18,0)))
                  AS DECIMAL(38,0)) AS c0,
             CAST(SUM(CASE WHEN dev_prev IS NULL THEN
                        CAST(0 AS DECIMAL(18,0))
                      ELSE CAST(dev AS DECIMAL(18,0))
                           * CAST(dev_prev AS DECIMAL(18,0)) END)
                  AS DECIMAL(38,0)) AS c1,
             CAST(MAX(CASE WHEN tk = n_days THEN dev END) AS BIGINT)
               AS dev_last
      FROM d
    )
    SELECT n_days, mean_cents,
           CAST(mean_cents AS DOUBLE) / 100 AS mean_revenue,
           CAST(c1 AS DOUBLE) / NULLIF(CAST(c0 AS DOUBLE), 0) AS phi,
           (CAST(mean_cents AS DOUBLE)
            + (CAST(c1 AS DOUBLE) / NULLIF(CAST(c0 AS DOUBLE), 0))
              * CAST(dev_last AS DOUBLE)) / 100 AS forecast_next,
           1 - (CAST(c1 AS DOUBLE) / NULLIF(CAST(c0 AS DOUBLE), 0))
             * (CAST(c1 AS DOUBLE) / NULLIF(CAST(c0 AS DOUBLE), 0)) AS noise_ratio
    FROM acc
    """,
)
def q454_ar1_yule_walker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(1) fit of the daily-revenue series by Yule-Walker: phi is
    the lag-1 sample autocorrelation Sum d_t*d_{t-1} / Sum d_t^2
    with deviations taken from the half-up integer-CENT mean — the
    autoregressive first rung of Box-Jenkins that the registry's
    exponential smoothers (q365 Holt) skip. Emits the one-step-ahead
    forecast mu + phi*d_n and the innovation-variance ratio
    (1 - phi^2).

    Determinism: revenue becomes exact BIGINT cents via DECIMAL; the
    mean is half-up integer DIV (no float mean); c0/c1 are exact
    DECIMAL(38) sums of DECIMAL(18)xDECIMAL(18) products (sf0.1
    deviations ~1e9 cents, squares 1e18, x2500 days = 2.5e21; even
    at 1000x scale 3e29 — inside DECIMAL(38)); phi and the forecast
    are the same double ops on identical operands in both engines,
    so no rounding grid is needed.

    Scale: one date-grain aggregate (map-side combinable), one
    scalar pass, then windows over the ~2.4k-row daily series — the
    heavy table never sorts.
    """
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents")
        )
    )
    m = daily.agg(
        F.expr(
            "CAST((2 * SUM(cents) + COUNT(*)) DIV (2 * COUNT(*)) AS BIGINT)"
        ).alias("mean_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    w = Window.orderBy("day")
    d = (
        daily.crossJoin(F.broadcast(m))
        .withColumn("dev", F.col("cents") - F.col("mean_cents"))
        .withColumn("dev_prev", F.lag("dev").over(w))
        .withColumn("tk", F.row_number().over(w).cast("bigint"))
    )
    acc = d.agg(
        F.max("mean_cents").alias("mean_cents"),
        F.max("n_days").alias("n_days"),
        F.sum(
            F.col("dev").cast("decimal(18,0)")
            * F.col("dev").cast("decimal(18,0)")
        )
        .cast("decimal(38,0)")
        .alias("c0"),
        F.sum(
            F.when(
                F.col("dev_prev").isNull(), F.lit(0).cast("decimal(18,0)")
            ).otherwise(
                F.col("dev").cast("decimal(18,0)")
                * F.col("dev_prev").cast("decimal(18,0)")
            )
        )
        .cast("decimal(38,0)")
        .alias("c1"),
        F.max(F.when(F.col("tk") == F.col("n_days"), F.col("dev")))
        .cast("bigint")
        .alias("dev_last"),
    )
    phi = F.col("c1").cast("double") / F.nullif(
        F.col("c0").cast("double"), F.lit(0.0)
    )
    return acc.select(
        "n_days",
        "mean_cents",
        (F.col("mean_cents").cast("double") / 100).alias("mean_revenue"),
        phi.alias("phi"),
        (
            (F.col("mean_cents").cast("double") + phi * F.col("dev_last").cast("double"))
            / 100
        ).alias("forecast_next"),
        (F.lit(1) - phi * phi).alias("noise_ratio"),
    )


# ---------------------------------------------------------------------------
# q455 Page-Hinkley drift detection
#
# The classic sequential mean-shift monitor (Page 1954; the standard
# concept-drift detector in the stream-mining literature): per day t,
# U_t = Sum_{i<=t} (x_i - mean_i - delta) with mean_i the RUNNING
# mean, PH_t = U_t - min_{i<=t} U_i, drift when PH_t > lambda. The
# running mean lands on a half-up 1e-6 integer grid so U is an exact
# BIGINT cumulative sum — no float accumulation-order hazard (DuckDB
# windows sum via segment trees, Spark left-to-right; integers make
# the tree shape irrelevant).

PH_DELTA_MICRO = 500_000  # delta = 0.5 events/day drift allowance
PH_LAMBDA_MICRO = 40_000_000  # lambda = 40 events of accumulated drift


@register(
    "q455_page_hinkley",
    category="events-temporal",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    seq AS (
      SELECT day, x,
             CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS tk,
             CAST(SUM(x) OVER (ORDER BY day
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s
      FROM daily
    ),
    stepped AS (
      SELECT day, tk, x,
             (2000000 * s + tk) // (2 * tk) AS mean_micro,
             x * 1000000 - ((2000000 * s + tk) // (2 * tk))
               - {PH_DELTA_MICRO} AS step_micro
      FROM seq
    ),
    walk AS (
      SELECT day, tk, x, mean_micro,
             CAST(SUM(step_micro) OVER (ORDER BY day
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS u_micro
      FROM stepped
    )
    SELECT day, tk, x, mean_micro, u_micro,
           CAST(u_micro - MIN(u_micro) OVER (ORDER BY day
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ph_micro,
           u_micro - MIN(u_micro) OVER (ORDER BY day
                  ROWS UNBOUNDED PRECEDING) > {PH_LAMBDA_MICRO} AS drift
    FROM walk
    ORDER BY day
    """,
)
def q455_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley mean-shift drift detector over the daily event
    count series (Page 1954, Biometrika; the standard streaming
    concept-drift monitor): cumulative U_t = Sum (x_i - mean_i -
    delta) against its running minimum, flagging drift when the gap
    exceeds lambda. The distinctive piece vs the CUSUM family the
    registry already has is the RUNNING mean m_i — each day's
    reference level adapts.

    Determinism: m_i lands on an exact half-up 1e-6 grid via pure
    integer DIV ((2e6*S_i + i) DIV (2i)), so U and PH are exact
    BIGINT cumulative sums/minima — immune to the float
    window-accumulation-order difference between DuckDB's segment
    trees and Spark's running frames.

    Scale: the heavy table collapses to date grain map-side; all
    windows run over the tiny daily series. The drift monitor
    itself is O(1) state per step — the streaming sibling would be
    a trivial applyInPandasWithState.
    """
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    w = Window.orderBy("day")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    seq = daily.withColumn(
        "tk", F.row_number().over(w).cast("bigint")
    ).withColumn("s", F.sum("x").over(wrun).cast("bigint"))
    stepped = seq.withColumn(
        "mean_micro", F.expr("(2000000 * s + tk) DIV (2 * tk)")
    ).withColumn(
        "step_micro",
        F.col("x") * 1000000 - F.col("mean_micro") - PH_DELTA_MICRO,
    )
    walk = stepped.withColumn(
        "u_micro", F.sum("step_micro").over(wrun).cast("bigint")
    )
    return walk.select(
        "day",
        "tk",
        "x",
        "mean_micro",
        "u_micro",
        (F.col("u_micro") - F.min("u_micro").over(wrun))
        .cast("bigint")
        .alias("ph_micro"),
        (
            F.col("u_micro") - F.min("u_micro").over(wrun)
            > PH_LAMBDA_MICRO
        ).alias("drift"),
    ).orderBy("day")


def _gsum(col, scale: int):
    """Order-independent exact sum: grid-round each term, accumulate
    in DECIMAL (int128-exact, partition-order-free), read back as
    DOUBLE — the q282/q324 memory-bank roundtrip idiom."""
    return (
        F.sum(dround(col, scale).cast(f"decimal(38,{scale})")).cast("double")
    )


# ---------------------------------------------------------------------------
# q456 k-selection: simplified silhouette + inertia elbow
#
# The model-selection companion the registry's clustering ops (q359
# Lloyd step, q74/q344 IVF routers) never answer: WHICH k? For each
# k in 2..8, assign every vector to its nearest of the first k seed
# vectors and score the partition two classic ways — the inertia
# elbow (SSE the Lloyd loop descends) and the SIMPLIFIED silhouette
# (Hruschka et al. 2004: a = distance to own centroid, b = distance
# to the nearest OTHER centroid, s = (b-a)/max(a,b)) — the O(n*k)
# surrogate for the O(n^2) full silhouette, which is the version
# that survives 100 TB. One distance table (n x 8) is computed once
# and shared by all seven k values.

SIL_KMAX = 8
SIL_KS = list(range(2, SIL_KMAX + 1))


@register(
    "q456_silhouette_elbow",
    category="llm-similarity-ann",
    oracle=f"""
    WITH xl AS (
      SELECT vec_id, CAST(i AS BIGINT) AS j,
             CAST(embedding[CAST(i + 1 AS INTEGER)] AS DOUBLE) AS x
      FROM embeddings, UNNEST(range(len(embedding))) AS r(i)
    ),
    seeds AS (
      SELECT vec_id AS cid, j, x AS sx FROM xl WHERE vec_id < {SIL_KMAX}
    ),
    dist AS (
      SELECT xl.vec_id, seeds.cid,
             (FLOOR(CAST(CAST(SUM(CAST((FLOOR(CAST((xl.x - seeds.sx)
                                       * (xl.x - seeds.sx) AS DOUBLE) * 1000000000000.0 + 0.5) / 1000000000000.0)
                                 AS DECIMAL(38,12))) AS DOUBLE) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS d2
      FROM xl JOIN seeds USING (j)
      GROUP BY xl.vec_id, seeds.cid
    ),
    fanned AS (
      SELECT k, vec_id, cid, d2,
             ROW_NUMBER() OVER (PARTITION BY k, vec_id
                                ORDER BY d2 ASC, cid ASC) AS rn
      FROM dist
      CROSS JOIN (SELECT UNNEST([{",".join(str(k) for k in SIL_KS)}])
                  AS k) AS ks
      WHERE cid < k
    ),
    scored AS (
      SELECT a.k, a.vec_id, a.d2 AS d2own,
             (SQRT(b.d2) - SQRT(a.d2))
               / NULLIF(GREATEST(SQRT(a.d2), SQRT(b.d2)), 0) AS s
      FROM (SELECT * FROM fanned WHERE rn = 1) a
      LEFT JOIN (SELECT * FROM fanned WHERE rn = 2) b
        ON a.k = b.k AND a.vec_id = b.vec_id
    ),
    per_k AS (
      SELECT CAST(k AS BIGINT) AS k,
             CAST(COUNT(*) AS BIGINT) AS n_vectors,
             CAST(SUM(CAST(d2own AS DECIMAL(38,6))) AS DOUBLE)
               AS inertia,
             (FLOOR(CAST(CAST(SUM(CAST((FLOOR(CAST(s AS DOUBLE) * 1000000000.0 + 0.5) / 1000000000.0) AS DECIMAL(38,9)))
                        AS DOUBLE)
                   / NULLIF(COUNT(s), 0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS mean_silhouette
      FROM scored GROUP BY k
    )
    SELECT k, n_vectors, inertia, mean_silhouette,
           CAST(ROW_NUMBER() OVER (
             ORDER BY mean_silhouette DESC NULLS LAST, k ASC)
             AS BIGINT) AS sil_rank
    FROM per_k
    ORDER BY k
    """,
)
def q456_silhouette_elbow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-selection scan for the embedding corpus: for every k in
    2..{SIL_KMAX}, nearest-seed assignment (seeds = vectors
    0..k-1, ties to the lower cid) scored by the inertia ELBOW and
    the SIMPLIFIED silhouette (Hruschka et al. 2004) — a = distance
    to own centroid, b = distance to nearest other centroid,
    s = (b-a)/max(a,b) — the O(n*k) silhouette surrogate that
    scales where the classic O(n^2) form cannot. ``sil_rank``
    orders the k values by mean silhouette; the elbow reads off the
    inertia column.

    Determinism: squared distances ride the grid-round -> DECIMAL ->
    DOUBLE roundtrip (q359's idiom) and land on a 1e-6 grid, so the
    (d2, cid) argmin/arg-second tie-breaks agree engine-for-engine;
    sqrt is IEEE-correctly-rounded and safe unrounded; per-vector s
    values grid-round at 1e-9 before the exact DECIMAL mean.

    Scale: ONE n x {SIL_KMAX} distance table (fan-out join against a
    broadcast 8 x 64 seed table, partial-aggregated) shared by all
    seven k values, collapsed to a per-vector SORTED (d2, cid)
    array — each k then reads its argmin/arg-second from the array
    prefix as a JVM expression, so the k fan-out never re-shuffles
    or re-windows (the original 7x windowed fan-out was the one
    superlinear plan in the r5 sf1 smoke); nothing quadratic in the
    corpus.
    """
    from pyspark.sql import Window as W

    xl = (
        t(spark, sf_dir, "embeddings")
        .select("vec_id", F.posexplode("embedding").alias("jp", "xf"))
        .select(
            "vec_id",
            F.col("jp").cast("bigint").alias("j"),
            F.col("xf").cast("double").alias("x"),
        )
    )
    seeds = xl.filter(F.col("vec_id") < SIL_KMAX).select(
        F.col("vec_id").alias("cid"), "j", F.col("x").alias("sx")
    )
    dist = (
        xl.join(F.broadcast(seeds), "j")
        .groupBy("vec_id", "cid")
        .agg(
            dround(
                _gsum(
                    (F.col("x") - F.col("sx")) * (F.col("x") - F.col("sx")),
                    12,
                ),
                6,
            ).alias("d2")
        )
    )
    ks = spark.createDataFrame([(k,) for k in SIL_KS], "k int")
    # per-vector sorted (d2, cid) array ONCE, then every k reads its
    # argmin/arg-second from the array prefix — replaces a 7x
    # windowed fan-out (one giant row_number pass per k) with one
    # vec-grain aggregate + JVM array expressions; same (d2, cid)
    # total order as the oracle's ROW_NUMBER (sf1 smoke: the window
    # form was the one superlinear plan in the batch)
    arrs = dist.groupBy("vec_id").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("d2"), F.col("cid")))
        ).alias("arr")
    )
    scored = (
        arrs.crossJoin(F.broadcast(ks))
        .withColumn("sub", F.expr("filter(arr, e -> e.cid < k)"))
        .withColumn("d2own", F.expr("try_element_at(sub, 1).d2"))
        .withColumn("d2alt", F.expr("try_element_at(sub, 2).d2"))
        .filter(F.col("d2own").isNotNull())
        .withColumn(
            "s",
            (F.sqrt("d2alt") - F.sqrt("d2own"))
            / F.nullif(
                F.greatest(F.sqrt("d2own"), F.sqrt("d2alt")), F.lit(0.0)
            ),
        )
    )
    per_k = scored.groupBy(F.col("k").cast("bigint").alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.sum(F.col("d2own").cast("decimal(38,6)"))
        .cast("double")
        .alias("inertia"),
        dround(
            _gsum(F.col("s"), 9) / F.nullif(F.count("s"), F.lit(0)), 6
        ).alias("mean_silhouette"),
    )
    return per_k.select(
        "k",
        "n_vectors",
        "inertia",
        "mean_silhouette",
        F.row_number()
        .over(
            W.orderBy(
                F.col("mean_silhouette").desc_nulls_last(), F.col("k").asc()
            )
        )
        .cast("bigint")
        .alias("sil_rank"),
    ).orderBy("k")


# ---------------------------------------------------------------------------
# q457 Jaro-Winkler string-similarity linkage
#
# The record-linkage similarity the Fellegi-Sunter scorer (q286)
# treats as a black box, computed for real: Jaro's match-window /
# transposition similarity plus Winkler's common-prefix boost
# (Winkler 1990, the Census Bureau linkage standard). Spark has no
# builtin; the matcher is a vectorized pandas UDF (the honest
# "genuinely not expressible in DataFrame ops" case — the match
# window is a stateful greedy scan). DuckDB HAS builtins — so the
# oracle certifies the UDF against an independent C++
# implementation, bit-for-bit (a 40k-pair fuzz matched exactly; the
# one convention pinned here: empty-vs-empty scores 0.0, DuckDB's
# choice).

JW_THRESHOLD = 0.85


@register(
    "q457_jaro_winkler_linkage",
    category="llm-dedup",
    oracle=f"""
    WITH pairs AS (
      SELECT a.p_partkey AS pair_id,
             a.p_name AS name_a, b.p_name AS name_b
      FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
    )
    SELECT pair_id, name_a, name_b,
           jaro_similarity(name_a, name_b) AS jaro,
           jaro_winkler_similarity(name_a, name_b) AS jw,
           jaro_winkler_similarity(name_a, name_b)
             >= {JW_THRESHOLD} AS close_match
    FROM pairs
    ORDER BY pair_id
    """,
)
def q457_jaro_winkler_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaro-Winkler similarity over consecutive part-name pairs —
    the fuzzy-match kernel of record linkage (Winkler 1990; the
    Census Bureau standard behind q286's Fellegi-Sunter weights,
    here computed rather than assumed). Jaro = (m/l1 + m/l2 +
    (m-t)/m)/3 with the floor(max_len/2)-1 match window and
    half-transposition count; Winkler adds p=0.1 per common prefix
    char (<=4) when jaro > 0.7.

    Cross-engine proof: the Spark side is a vectorized pandas UDF
    (the match window is a stateful greedy scan — genuinely outside
    DataFrame algebra); the DuckDB oracle calls its independent
    native ``jaro_winkler_similarity``. A 40k-random-pair fuzz
    matched BIT-FOR-BIT (same double op order), so the values ship
    unrounded; the one convention pinned: any empty side scores 0.0.

    Scale: the pair generator is a co-partitionable equi-join on
    partkey+1 (no sort, no window); the UDF is Arrow-batched and
    embarrassingly parallel, linear in pairs.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def jaro_udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
        return pd.Series(
            [_jaro(a, b) for a, b in zip(s1, s2)], dtype="float64"
        )

    @pandas_udf("double")
    def jw_udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
        return pd.Series(
            [_jaro_winkler(a, b) for a, b in zip(s1, s2)], dtype="float64"
        )

    part = t(spark, sf_dir, "part").select("p_partkey", "p_name")
    pairs = part.alias("a").join(
        part.alias("b"),
        F.col("b.p_partkey") == F.col("a.p_partkey") + 1,
    ).select(
        F.col("a.p_partkey").alias("pair_id"),
        F.col("a.p_name").alias("name_a"),
        F.col("b.p_name").alias("name_b"),
    )
    return pairs.select(
        "pair_id",
        "name_a",
        "name_b",
        jaro_udf("name_a", "name_b").alias("jaro"),
        jw_udf("name_a", "name_b").alias("jw"),
        (jw_udf("name_a", "name_b") >= JW_THRESHOLD).alias("close_match"),
    ).orderBy("pair_id")


def _jaro(s1: str, s2: str) -> float:
    """Classic Jaro similarity; empty-side convention 0.0 (matches
    DuckDB's native implementation bit-for-bit — see q457)."""
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    window = max(max(l1, l2) // 2 - 1, 0)
    m1 = [False] * l1
    m2 = [False] * l2
    m = 0
    for i in range(l1):
        lo = max(0, i - window)
        hi = min(l2, i + window + 1)
        for j in range(lo, hi):
            if not m2[j] and s1[i] == s2[j]:
                m1[i] = m2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    tr = 0
    k = 0
    for i in range(l1):
        if m1[i]:
            while not m2[k]:
                k += 1
            if s1[i] != s2[k]:
                tr += 1
            k += 1
    tr //= 2
    return (m / l1 + m / l2 + (m - tr) / m) / 3.0


def _jaro_winkler(s1: str, s2: str, boost_threshold: float = 0.7) -> float:
    j = _jaro(s1, s2)
    if j > boost_threshold:
        p = 0
        for a, b in zip(s1[:4], s2[:4]):
            if a != b:
                break
            p += 1
        j = j + p * 0.1 * (1 - j)
    return j


# ---------------------------------------------------------------------------
# q458 Gorilla delta-of-delta timestamp compression audit
#
# Facebook Gorilla (Pelkonen et al., VLDB 2015) §4.1: time-series
# stores compress timestamps as delta-of-deltas bucketed into
# variable-width codes — the reason monitoring systems store 16x
# more data than raw 64-bit stamps would allow. This advisor replays
# the exact bit schedule over each user's event stream and reports
# the per-bucket population and achieved bits/stamp — the
# time-series sibling of q452's columnar-encoding advisor and the
# reference codec's ratio question asked of timestamps.

GOR_BUCKETS = """
  CASE WHEN rn = 1 THEN 64
       WHEN dod = 0 THEN 1
       WHEN dod BETWEEN -63 AND 64 THEN 9
       WHEN dod BETWEEN -255 AND 256 THEN 12
       WHEN dod BETWEEN -2047 AND 2048 THEN 16
       ELSE 36 END
"""


@register(
    "q458_gorilla_timestamp_cost",
    category="events-temporal",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec
      FROM events
    ),
    seq AS (
      SELECT user_id, sec,
             LAG(sec) OVER w AS prev,
             LAG(sec, 2) OVER w AS prev2,
             CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)
    ),
    classed AS (
      SELECT CAST({GOR_BUCKETS.replace("dod", '''
               (CASE WHEN rn = 2 THEN sec - prev
                     ELSE (sec - prev) - (prev - prev2) END)''')}
             AS BIGINT) AS bits
      FROM seq
    ),
    per_bucket AS (
      SELECT bits AS bucket_bits,
             CAST(COUNT(*) AS BIGINT) AS n_stamps,
             CAST(bits * COUNT(*) AS BIGINT) AS total_bits
      FROM classed GROUP BY bits
    )
    SELECT bucket_bits, n_stamps, total_bits,
           CAST(FLOOR(n_stamps * 2000000.0
                      / SUM(n_stamps) OVER () + 0.5) AS BIGINT)
             // 2 AS stamp_share_micro,
           CAST(FLOOR(SUM(total_bits) OVER () * 1000000.0
                      / SUM(n_stamps) OVER () + 0.5) AS BIGINT)
             AS bits_per_stamp_micro
    FROM per_bucket
    ORDER BY bucket_bits
    """,
)
def q458_gorilla_timestamp_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gorilla delta-of-delta timestamp compression audit (Pelkonen
    et al., VLDB 2015 §4.1): per user stream (ordered by epoch
    second, event_id tie-break), the first stamp costs a 64-bit
    header, the second buckets its raw delta, and every later stamp
    buckets delta-of-delta into the paper's code widths — 1 bit for
    dod=0, 9 for [-63,64], 12 for [-255,256], 16 for [-2047,2048],
    36 otherwise. Emits the bucket census, total bits, and the
    achieved bits/stamp — the number that makes time-series stores
    16x denser than raw 64-bit stamps.

    Determinism: seconds via the proven ``unix_timestamp`` <->
    ``floor(epoch(ts))`` pairing; every delta, bucket bound, and bit
    count is BIGINT; the shares land on half-up integer micro
    grids (the x*2e6 DIV 2 form keeps the .5 tie exact).

    Scale: one partitioned window per user stream (co-partitioned
    with the groupBy), then a <=6-row bucket table; the unpartitioned
    share window runs over those 6 rows only.
    """
    from pyspark.sql import Window as W

    e = t(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").cast("bigint").alias("sec"),
    )
    w = W.partitionBy("user_id").orderBy("sec", "event_id")
    seq = e.select(
        "user_id",
        "sec",
        F.lag("sec").over(w).alias("prev"),
        F.lag("sec", 2).over(w).alias("prev2"),
        F.row_number().over(w).cast("bigint").alias("rn"),
    )
    dod = F.when(
        F.col("rn") == 2, F.col("sec") - F.col("prev")
    ).otherwise(
        (F.col("sec") - F.col("prev")) - (F.col("prev") - F.col("prev2"))
    )
    bits = (
        F.when(F.col("rn") == 1, F.lit(64))
        .when(dod == 0, F.lit(1))
        .when(dod.between(-63, 64), F.lit(9))
        .when(dod.between(-255, 256), F.lit(12))
        .when(dod.between(-2047, 2048), F.lit(16))
        .otherwise(F.lit(36))
        .cast("bigint")
    )
    per_bucket = (
        seq.select(bits.alias("bits"))
        .groupBy(F.col("bits").alias("bucket_bits"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_stamps"),
            (F.col("bucket_bits") * F.count(F.lit(1)))
            .cast("bigint")
            .alias("total_bits"),
        )
    )
    return per_bucket.select(
        "bucket_bits",
        "n_stamps",
        "total_bits",
        F.expr(
            "CAST(FLOOR(n_stamps * 2000000.0 / "
            "SUM(n_stamps) OVER () + 0.5) AS BIGINT) DIV 2"
        ).alias("stamp_share_micro"),
        F.expr(
            "CAST(FLOOR(SUM(total_bits) OVER () * 1000000.0 / "
            "SUM(n_stamps) OVER () + 0.5) AS BIGINT)"
        ).alias("bits_per_stamp_micro"),
    ).orderBy("bucket_bits")


# ---------------------------------------------------------------------------
# q459 facility-location greedy selection (submodular coverage)
#
# The data-selection objective behind coverage-based coreset pickers
# (Nemhauser-Wolsey-Fisher 1978 gives the greedy a (1-1/e)
# guarantee): choose K centers maximizing Sum_u max_{s in S}
# sim(u, s). Complements q392 (k-center = worst-case radius) and
# q404 (MMR = relevance-diversity): facility location optimizes
# AVERAGE coverage, the pretraining-subset objective. Greedy = K
# unrolled rounds of "argmax marginal gain", each a single pass over
# a precomputed n x CAND similarity table.

FL_CAND = 16  # candidate pool: vec_id < 16
FL_K = 6  # greedy picks


def _fl_oracle() -> str:
    head = f"""
    WITH xl AS (
      SELECT vec_id, CAST(i AS BIGINT) AS j,
             CAST(embedding[CAST(i + 1 AS INTEGER)] AS DOUBLE) AS x
      FROM embeddings, UNNEST(range(len(embedding))) AS r(i)
    ),
    cand AS (
      SELECT vec_id AS c, j, x AS cx FROM xl WHERE vec_id < {FL_CAND}
    ),
    sims AS MATERIALIZED (
      SELECT xl.vec_id AS u, cand.c,
             GREATEST((FLOOR(CAST(CAST(SUM(CAST((FLOOR(CAST(xl.x * cand.cx AS DOUBLE) * 1000000000000.0 + 0.5) / 1000000000000.0)
                        AS DECIMAL(38,12))) AS DOUBLE) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0), 0) AS sim
      FROM xl JOIN cand USING (j)
      GROUP BY xl.vec_id, cand.c
    ),
    cov0 AS MATERIALIZED (
      SELECT DISTINCT u, CAST(0 AS DOUBLE) AS cov FROM sims
    )"""
    stages = []
    chosen: list[str] = []
    for r in range(1, FL_K + 1):
        not_in = (
            f"WHERE s.c NOT IN ({' UNION ALL '.join(chosen)})"
            if chosen
            else ""
        )
        stages.append(f""",
    g{r} AS MATERIALIZED (
      SELECT s.c,
             CAST(SUM(CAST((FLOOR(CAST(GREATEST(s.sim - v.cov, 0) AS DOUBLE) * 1000000000.0 + 0.5) / 1000000000.0)
                  AS DECIMAL(38,9))) AS DOUBLE) AS gain
      FROM sims s JOIN cov{r - 1} v USING (u)
      {not_in}
      GROUP BY s.c
    ),
    p{r} AS MATERIALIZED (
      SELECT c, gain FROM g{r} ORDER BY gain DESC, c ASC LIMIT 1
    ),
    cov{r} AS MATERIALIZED (
      SELECT v.u, GREATEST(v.cov, COALESCE(s.sim, 0)) AS cov
      FROM cov{r - 1} v
      LEFT JOIN (SELECT u, sim FROM sims
                 WHERE c = (SELECT c FROM p{r})) s USING (u)
    )""")
        chosen.append(f"SELECT c FROM p{r}")
    finals = [
        f"""
      SELECT CAST({r} AS BIGINT) AS round_idx,
             c AS center_id, (FLOOR(CAST(gain AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS gain,
             (SELECT (FLOOR(CAST(CAST(SUM(CAST((FLOOR(CAST(cov AS DOUBLE) * 1000000000.0 + 0.5) / 1000000000.0)
                AS DECIMAL(38,9))) AS DOUBLE) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) FROM cov{r})
               AS total_coverage
      FROM p{r}"""
        for r in range(1, FL_K + 1)
    ]
    return (
        head
        + "".join(stages)
        + "\n    SELECT * FROM ("
        + "\n      UNION ALL".join(finals)
        + "\n    ) ORDER BY round_idx"
    )


@register(
    "q459_facility_location_greedy",
    category="llm-similarity-ann",
    oracle=_fl_oracle(),
)
def q459_facility_location_greedy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Facility-location greedy data selection: {FL_K} rounds of
    argmax-marginal-gain over the submodular coverage objective
    Sum_u max_{{s in S}} sim(u, s) — the (1-1/e)-approximate picker
    (Nemhauser et al. 1978) behind coverage-based pretraining-subset
    selection; the AVERAGE-coverage sibling of q392's k-center
    (worst-case radius) and q404's MMR (relevance-diversity).
    Similarity = clamped dot product GREATEST(<u,c>, 0), candidates
    = vectors 0..{FL_CAND - 1}. Emits each round's pick, marginal
    gain, and the total coverage after the pick.

    Determinism: sims ride the grid-round -> DECIMAL -> DOUBLE
    roundtrip at 1e-6; marginal gains grid at 1e-9 before the exact
    DECIMAL sum, so the argmax compares identical doubles with a
    candidate-id tie-break; coverage updates are GREATEST over
    identical grid values.

    Scale: the n x {FL_CAND} similarity table is computed ONCE
    (fan-out join against a broadcast candidate table, partial-
    aggregated) and checkpointed; each greedy round is one
    aggregate over it plus a 1-row TakeOrdered pick — O(K * n *
    CAND) total work, no quadratic blowup, lineage cut per round
    (the q64 rule).
    """
    from pyspark.sql import Window as W  # noqa: F401

    # fan the one-file embeddings scan across cores BEFORE the
    # dim x {FL_CAND} fan-out join (measured: the whole dot-product
    # aggregation otherwise ran as ONE scan task at sf0.1)
    xl = (
        fan_out(t(spark, sf_dir, "embeddings"))
        .select("vec_id", F.posexplode("embedding").alias("jp", "xf"))
        .select(
            "vec_id",
            F.col("jp").cast("bigint").alias("j"),
            F.col("xf").cast("double").alias("x"),
        )
    )
    cand = xl.filter(F.col("vec_id") < FL_CAND).select(
        F.col("vec_id").alias("c"), "j", F.col("x").alias("cx")
    )
    # u-grain sim VECTOR (r9 restructure): one fan-out join + ONE
    # aggregation produces all {FL_CAND} candidate sims per vector as
    # an array (element i+1 = candidate i; the candidate ids are the
    # compile-time constants 0..{FL_CAND}-1, so the per-candidate
    # conditional sums are static expressions). Each greedy round is
    # then a single JOIN-FREE aggregation pass over this frame with
    # the coverage max computed inline from the chosen-id array — the
    # r5 shape instead ran per round: an anti-join, an n-row cov SMJ
    # (the checkpointed cov table has no stats, so the planner can
    # never broadcast it), a pick broadcast, a cov-update join and a
    # cov checkpoint. Per-term grids are unchanged (grid-12 dot terms
    # DECIMAL-summed, grid-6 sims, grid-9 gain/coverage terms), so
    # every number matches the oracle bit-for-bit.
    # two-level: the (u,c)-grain dot products first (ONE decimal sum
    # per fan-out row — a single-level 16-conditional-sum variant
    # measured 2x slower because every fan-out row paid 16 decimal
    # ops), then the tiny n x {FL_CAND} frame pivots to the array
    sim_uc = (
        xl.join(F.broadcast(cand), "j")
        .groupBy(F.col("vec_id").alias("u"), "c")
        .agg(
            F.greatest(
                dround(_gsum(F.col("x") * F.col("cx"), 12), 6),
                F.lit(0.0),
            ).alias("sim")
        )
    )
    su = (
        sim_uc.groupBy("u")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("c", "sim"))),
                lambda s: s["sim"],
            ).alias("sims")
        )
        .localCheckpoint(eager=True)
    )
    # chosen-so-far rides a 1-row broadcast frame; cov(u) is the max
    # of the chosen sims (empty -> 0.0), identical to the iterated
    # GREATEST of the unrolled oracle
    state = spark.range(1).select(
        F.array().cast("array<int>").alias("chosen")
    )
    cov_col = F.coalesce(
        F.array_max(
            F.transform(
                F.col("chosen"),
                lambda i: F.element_at(F.col("sims"), i + F.lit(1)),
            )
        ),
        F.lit(0.0),
    )
    # FL_K passes, not FL_K+1 (r10): round r's post-pick total used
    # to need pass r+1's coverage sum, so a 7th coverage-only pass
    # closed the chain. The decimal sums make it foldable instead:
    # per vector, round9(max(cov, sim_pick)) == round9(cov) +
    # round9(max(sim_pick - cov, 0)) EXACTLY on the 1e-9 grid (cov
    # and sims are grid-6 values), so summing each side in
    # DECIMAL(38,9) gives total_after_r = round6(double(S_{r-1} +
    # G_pick)) with S and G the pass-r decimal sums — one sequential
    # checkpoint job fewer and no cross-pass total joins. The argmax
    # still compares the gains' DOUBLE casts (identical tie surface
    # to r9, which compared _gsum doubles).
    def gdec(col):  # grid-round terms, exact DECIMAL(38,9) sum
        return F.sum(dround(col, 9).cast("decimal(38,9)"))

    picks = []
    for r in range(1, FL_K + 1):
        agg_exprs = [
            F.first("chosen").alias("chosen"),
            gdec(cov_col).alias("prev_dec"),
        ] + [
            gdec(
                F.greatest(
                    F.element_at(F.col("sims"), i + 1) - cov_col,
                    F.lit(0.0),
                )
            ).alias(f"gain_{i}")
            for i in range(FL_CAND)
        ]
        agg = su.crossJoin(F.broadcast(state)).agg(*agg_exprs)
        # argmax over the still-unchosen candidates with the
        # (gain DESC, c ASC) tie-break: lexicographic array_max
        # over (gain-as-double, -c) structs
        best = F.array_max(
            F.filter(
                F.array(
                    *[
                        F.struct(
                            F.col(f"gain_{i}").cast("double").alias("gain"),
                            F.lit(-i).alias("negc"),
                        )
                        for i in range(FL_CAND)
                    ]
                ),
                lambda x: ~F.array_contains(
                    F.col("chosen"), -x["negc"]
                ),
            )
        )
        gain_dec_pick = F.element_at(
            F.array(*[F.col(f"gain_{i}") for i in range(FL_CAND)]),
            (-best["negc"]) + F.lit(1),
        )
        agg = agg.select(
            best["gain"].alias("gain"),
            (-best["negc"]).alias("pick"),
            dround(
                (F.col("prev_dec") + gain_dec_pick).cast("double"), 6
            ).alias("total_coverage"),
            F.concat(
                F.col("chosen"), F.array(-best["negc"])
            ).alias("chosen"),
        ).localCheckpoint(eager=True)
        state = agg.select("chosen")
        picks.append(
            agg.select(
                F.lit(r).cast("bigint").alias("round_idx"),
                F.col("pick").cast("bigint").alias("center_id"),
                dround("gain", 6).alias("gain"),
                "total_coverage",
            )
        )
    out = picks[0]
    for pk in picks[1:]:
        out = out.unionByName(pk)
    return out.orderBy("round_idx")


# ---------------------------------------------------------------------------
# q460 Cochran-Mantel-Haenszel stratified association test
#
# THE stratified 2x2 test (Mantel & Haenszel 1959) — association
# between exposure and outcome controlling for a confounder, the
# epidemiology/AB-testing guard against Simpson's paradox that the
# registry's diff-in-diff (q327) and propensity (q326) ops
# approximate from other angles. Strata = day-of-month mod 7,
# exposure = even user_id, outcome = purchase event.


@register(
    "q460_cmh_test",
    category="analytics-stats (regression/tests/causal)",
    oracle="""
    WITH cells AS (
      SELECT CAST(EXTRACT(day FROM ts) AS BIGINT) % 7 AS stratum,
             CAST(SUM(CASE WHEN user_id % 2 = 0
                       AND event_type = 'purchase'
                      THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN user_id % 2 = 0
                       AND event_type <> 'purchase'
                      THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(SUM(CASE WHEN user_id % 2 = 1
                       AND event_type = 'purchase'
                      THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(SUM(CASE WHEN user_id % 2 = 1
                       AND event_type <> 'purchase'
                      THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM events
      GROUP BY CAST(EXTRACT(day FROM ts) AS BIGINT) % 7
    ),
    terms AS (
      SELECT stratum, a, b, c, d, a + b + c + d AS n
      FROM cells WHERE a + b + c + d >= 2
    ),
    acc AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
             CAST(SUM(a) AS BIGINT) AS sum_a,
             CAST(SUM(CAST((FLOOR(CAST(CAST((a + b) AS DOUBLE) * (a + c) / n AS DOUBLE) * 1000000000.0 + 0.5) / 1000000000.0) AS DECIMAL(38,9))) AS DOUBLE) AS sum_e,
             CAST(SUM(CAST((FLOOR(CAST((CAST((a + b) * (c + d) AS DOUBLE) / n)
                  * (CAST((a + c) * (b + d) AS DOUBLE) / n)
                  / (n - 1) AS DOUBLE) * 1000000000.0 + 0.5) / 1000000000.0) AS DECIMAL(38,9))) AS DOUBLE) AS sum_v,
             CAST(SUM(CAST((FLOOR(CAST(CAST(a * d AS DOUBLE) / n AS DOUBLE) * 1000000000.0 + 0.5) / 1000000000.0)
                  AS DECIMAL(38,9))) AS DOUBLE) AS sum_ad,
             CAST(SUM(CAST((FLOOR(CAST(CAST(b * c AS DOUBLE) / n AS DOUBLE) * 1000000000.0 + 0.5) / 1000000000.0)
                  AS DECIMAL(38,9))) AS DOUBLE) AS sum_bc
      FROM terms
    )
    SELECT n_strata, sum_a,
           (FLOOR(CAST(sum_e AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS sum_expected,
           (FLOOR(CAST(sum_v AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS sum_variance,
           (FLOOR(CAST(GREATEST(ABS(sum_a - sum_e) - 0.5, 0)
                 * GREATEST(ABS(sum_a - sum_e) - 0.5, 0)
                 / NULLIF(sum_v, 0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS cmh_statistic,
           (FLOOR(CAST(sum_ad / NULLIF(sum_bc, 0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS mh_odds_ratio
    FROM acc
    """,
)
def q460_cmh_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Mantel-Haenszel stratified 2x2 association test
    (Mantel & Haenszel 1959): does exposure (even user_id) associate
    with outcome (purchase) after controlling for the stratum
    (day-of-month mod 7)? Emits the continuity-corrected CMH
    chi-square and the MH common odds ratio — the Simpson's-paradox
    guard the registry's causal ops (q326/q327) approximate from
    other angles.

    Determinism: every cell count is BIGINT from one map-side-
    combinable aggregate; per-stratum E = (a+b)(a+c)/n, the variance
    V (computed as ((a+b)(c+d)/n) * ((a+c)(b+d)/n) / (n-1) so no
    int64 product ever exceeds n^2 — safe to ~3e9 rows/stratum), and
    the odds-ratio terms are int-ratio doubles grid-rounded at 1e-9
    before the exact DECIMAL sum; singleton strata (n < 2) drop on
    both engines; zero denominators NULL via NULLIF.

    Scale: one pass over events to a 7-row stratum table; everything
    after is scalar.
    """
    ev = t(spark, sf_dir, "events")
    exposed = F.col("user_id") % 2 == 0
    outcome = F.col("event_type") == "purchase"
    cells = ev.groupBy(
        (F.dayofmonth("ts").cast("bigint") % 7).alias("stratum")
    ).agg(
        F.sum(F.when(exposed & outcome, 1).otherwise(0))
        .cast("bigint")
        .alias("a"),
        F.sum(F.when(exposed & ~outcome, 1).otherwise(0))
        .cast("bigint")
        .alias("b"),
        F.sum(F.when(~exposed & outcome, 1).otherwise(0))
        .cast("bigint")
        .alias("c"),
        F.sum(F.when(~exposed & ~outcome, 1).otherwise(0))
        .cast("bigint")
        .alias("d"),
    )
    terms = cells.withColumn(
        "n", F.col("a") + F.col("b") + F.col("c") + F.col("d")
    ).filter(F.col("n") >= 2)

    def grid9(col):
        return dround(col, 9).cast("decimal(38,9)")

    acc = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_strata"),
        F.sum("a").cast("bigint").alias("sum_a"),
        F.sum(
            grid9(
                (F.col("a") + F.col("b")).cast("double")
                * (F.col("a") + F.col("c"))
                / F.col("n")
            )
        )
        .cast("double")
        .alias("sum_e"),
        F.sum(
            grid9(
                (
                    ((F.col("a") + F.col("b")) * (F.col("c") + F.col("d")))
                    .cast("double")
                    / F.col("n")
                )
                * (
                    ((F.col("a") + F.col("c")) * (F.col("b") + F.col("d")))
                    .cast("double")
                    / F.col("n")
                )
                / (F.col("n") - 1)
            )
        )
        .cast("double")
        .alias("sum_v"),
        F.sum(grid9((F.col("a") * F.col("d")).cast("double") / F.col("n")))
        .cast("double")
        .alias("sum_ad"),
        F.sum(grid9((F.col("b") * F.col("c")).cast("double") / F.col("n")))
        .cast("double")
        .alias("sum_bc"),
    )
    corrected = F.greatest(
        F.abs(F.col("sum_a") - F.col("sum_e")) - 0.5, F.lit(0.0)
    )
    return acc.select(
        "n_strata",
        "sum_a",
        dround("sum_e", 6).alias("sum_expected"),
        dround("sum_v", 6).alias("sum_variance"),
        dround(
            corrected * corrected / F.nullif(F.col("sum_v"), F.lit(0.0)), 6
        ).alias("cmh_statistic"),
        dround(
            F.col("sum_ad") / F.nullif(F.col("sum_bc"), F.lit(0.0)), 6
        ).alias("mh_odds_ratio"),
    )


# ---------------------------------------------------------------------------
# q461 Brown-Forsythe (median-based Levene) equal-variance test
#
# The variance-equality family the registry lacked: one-way ANOVA on
# absolute deviations from the GROUP MEDIAN (Brown & Forsythe 1974
# — the robust Levene variant every stats package defaults to).
# Groups = o_orderpriority over order totals.


@register(
    "q461_brown_forsythe",
    category="analytics-stats (regression/tests/causal)",
    oracle="""
    WITH vals AS (
      SELECT o_orderpriority AS grp,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM orders
    ),
    ranked AS (
      SELECT grp, cents,
             ROW_NUMBER() OVER (PARTITION BY grp ORDER BY cents) AS rk,
             COUNT(*) OVER (PARTITION BY grp) AS n_g
      FROM vals
    ),
    med AS (
      SELECT grp, CAST(cents AS BIGINT) AS med_cents
      FROM ranked WHERE rk = (n_g + 1) // 2
    ),
    z AS (
      SELECT v.grp, ABS(v.cents - m.med_cents) AS z_cents
      FROM vals v JOIN med m USING (grp)
    ),
    gstats AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_g,
             CAST(SUM(z_cents) AS BIGINT) AS s_g,
             CAST((2 * SUM(z_cents) + COUNT(*))
                  // (2 * COUNT(*)) AS BIGINT) AS zbar_g
      FROM z GROUP BY grp
    ),
    tot AS (
      SELECT CAST(SUM(n_g) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST((2 * SUM(s_g) + SUM(n_g))
                  // (2 * SUM(n_g)) AS BIGINT) AS zbar
      FROM gstats
    ),
    ssb AS (
      SELECT CAST(SUM(CAST(n_g AS DECIMAL(19,0))
                      * CAST((zbar_g - t.zbar) * (zbar_g - t.zbar)
                             AS DECIMAL(19,0)))
                  AS DECIMAL(38,0)) AS ssb
      FROM gstats, tot t
    ),
    ssw AS (
      SELECT CAST(SUM(CAST((z.z_cents - g.zbar_g)
                           * (z.z_cents - g.zbar_g)
                           AS DECIMAL(19,0)))
                  AS DECIMAL(38,0)) AS ssw
      FROM z JOIN gstats g USING (grp)
    )
    SELECT t.n, t.k,
           CAST(b.ssb AS DOUBLE) / 1e4 AS ss_between,
           CAST(w.ssw AS DOUBLE) / 1e4 AS ss_within,
           (FLOOR(CAST(CAST((t.n - t.k) AS DOUBLE) / NULLIF(t.k - 1, 0)
                 * CAST(b.ssb AS DOUBLE)
                 / NULLIF(CAST(w.ssw AS DOUBLE), 0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS bf_statistic
    FROM tot t, ssb b, ssw w
    """,
)
def q461_brown_forsythe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brown-Forsythe equal-variance test (the median-based Levene,
    Brown & Forsythe 1974): one-way ANOVA on absolute deviations
    from each group's MEDIAN order total, groups =
    ``o_orderpriority``. W = ((N-k)/(k-1)) * SSB/SSW over
    z = |x - med_g| — the robust variance-homogeneity gate every
    stats package defaults to, new territory for the registry's
    test shelf (MWU q376, KS q352, log-rank q419 are location/shape
    tests).

    Determinism: order totals become exact BIGINT cents; the group
    median is the exact lower order statistic (rank (n+1)//2);
    group/global means of z land on half-up integer CENT grids, so
    SSB and SSW are exact DECIMAL(38) sums of int64 squares —
    deviations are bounded by the max order price (~5e7 cents,
    SCALE-INDEPENDENT), so dev^2 <= 2.5e15 never overflows int64
    and the DECIMAL sums stay exact at any corpus size — W is one
    double expression over identical operands.

    Scale: the median needs one per-group sort (partitioned window,
    5 groups) — at 100 TB swap in q444's bucket-refinement selection
    per group; everything else is two map-side-combinable
    aggregates.
    """
    vals = t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    wg = Window.partitionBy("grp").orderBy("cents")
    ranked = vals.withColumn("rk", F.row_number().over(wg)).withColumn(
        "n_g", F.count(F.lit(1)).over(Window.partitionBy("grp"))
    )
    med = ranked.filter(
        F.col("rk") == F.expr("(n_g + 1) DIV 2")
    ).select("grp", F.col("cents").alias("med_cents"))
    z = vals.join(med, "grp").select(
        "grp",
        F.abs(F.col("cents") - F.col("med_cents")).alias("z_cents"),
    )
    gstats = z.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
        F.sum("z_cents").cast("bigint").alias("s_g"),
        F.expr(
            "CAST((2 * SUM(z_cents) + COUNT(*)) DIV (2 * COUNT(*)) "
            "AS BIGINT)"
        ).alias("zbar_g"),
    )
    tot = gstats.agg(
        F.sum("n_g").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.expr(
            "CAST((2 * SUM(s_g) + SUM(n_g)) DIV (2 * SUM(n_g)) AS BIGINT)"
        ).alias("zbar"),
    )
    ssb = (
        gstats.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(
                F.col("n_g").cast("decimal(19,0)")
                * (
                    (F.col("zbar_g") - F.col("zbar"))
                    * (F.col("zbar_g") - F.col("zbar"))
                ).cast("decimal(19,0)")
            )
            .cast("decimal(38,0)")
            .alias("ssb")
        )
    )
    ssw = (
        z.join(F.broadcast(gstats.select("grp", "zbar_g")), "grp")
        .agg(
            F.sum(
                (
                    (F.col("z_cents") - F.col("zbar_g"))
                    * (F.col("z_cents") - F.col("zbar_g"))
                ).cast("decimal(19,0)")
            )
            .cast("decimal(38,0)")
            .alias("ssw")
        )
    )
    return (
        tot.crossJoin(F.broadcast(ssb))
        .crossJoin(F.broadcast(ssw))
        .select(
            "n",
            "k",
            (F.col("ssb").cast("double") / 1e4).alias("ss_between"),
            (F.col("ssw").cast("double") / 1e4).alias("ss_within"),
            dround(
                (F.col("n") - F.col("k")).cast("double")
                / F.nullif(F.col("k") - 1, F.lit(0))
                * F.col("ssb").cast("double")
                / F.nullif(F.col("ssw").cast("double"), F.lit(0.0)),
                6,
            ).alias("bf_statistic"),
        )
    )


# ---------------------------------------------------------------------------
# q462 McNemar's paired test
#
# The PAIRED categorical test (McNemar 1947): did user behavior
# change between the first and second half of the window? Only the
# discordant pairs matter — b = clicked in H1 but not H2, c = the
# reverse; chi2 = (|b-c|-1)^2/(b+c). Pure integer arithmetic end to
# end — the cheapest test in the book and the registry lacked it.

MCN_SPLIT = "2024-01-16"


@register(
    "q462_mcnemar_test",
    category="analytics-stats (regression/tests/causal)",
    oracle=f"""
    WITH users AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'click'
                  AND ts < TIMESTAMP '{MCN_SPLIT}'
                 THEN 1 ELSE 0 END) AS h1,
             MAX(CASE WHEN event_type = 'click'
                  AND ts >= TIMESTAMP '{MCN_SPLIT}'
                 THEN 1 ELSE 0 END) AS h2
      FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(CASE WHEN h1 = 1 AND h2 = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS both_halves,
           CAST(SUM(CASE WHEN h1 = 1 AND h2 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS only_h1,
           CAST(SUM(CASE WHEN h1 = 0 AND h2 = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS only_h2,
           CAST(SUM(CASE WHEN h1 = 0 AND h2 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS neither,
           CAST(GREATEST(ABS(SUM(CASE WHEN h1 = 1 AND h2 = 0
                                 THEN 1 ELSE 0 END)
                             - SUM(CASE WHEN h1 = 0 AND h2 = 1
                                   THEN 1 ELSE 0 END)) - 1, 0) AS DOUBLE)
           * GREATEST(ABS(SUM(CASE WHEN h1 = 1 AND h2 = 0
                              THEN 1 ELSE 0 END)
                          - SUM(CASE WHEN h1 = 0 AND h2 = 1
                                THEN 1 ELSE 0 END)) - 1, 0)
           / NULLIF(SUM(CASE WHEN h1 <> h2 THEN 1 ELSE 0 END), 0)
             AS mcnemar_statistic
    FROM users
    """,
)
def q462_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's test for paired binary outcomes (McNemar 1947): per
    user, did-click in the window's first half (before {MCN_SPLIT})
    vs the second half; only the DISCORDANT users enter the
    statistic chi2 = (|b - c| - 1)^2 / (b + c) (continuity-
    corrected, floored at 0). The paired sibling of the 2x2 tests
    (q460 CMH, q266 Wilson) the registry now spans.

    Determinism: the entire statistic is integer counts from one
    user-grain aggregate; the single division runs on identical
    BIGINTs (NULLIF for the no-discordant-users corner) — no
    rounding grid anywhere.

    Scale: one map-side-combinable user aggregate, one scalar
    reduce.
    """
    ev = t(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") < F.lit(MCN_SPLIT).cast("timestamp")),
                1,
            ).otherwise(0)
        ).alias("h1"),
        F.max(
            F.when(
                (F.col("event_type") == "click")
                & (F.col("ts") >= F.lit(MCN_SPLIT).cast("timestamp")),
                1,
            ).otherwise(0)
        ).alias("h2"),
    )
    b = F.sum(
        F.when((F.col("h1") == 1) & (F.col("h2") == 0), 1).otherwise(0)
    )
    c = F.sum(
        F.when((F.col("h1") == 0) & (F.col("h2") == 1), 1).otherwise(0)
    )
    corrected = F.greatest(F.abs(b - c) - 1, F.lit(0))
    return users.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(
            F.when((F.col("h1") == 1) & (F.col("h2") == 1), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("both_halves"),
        b.cast("bigint").alias("only_h1"),
        c.cast("bigint").alias("only_h2"),
        F.sum(
            F.when((F.col("h1") == 0) & (F.col("h2") == 0), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("neither"),
        (
            corrected.cast("double")
            * corrected
            / F.nullif(
                F.sum(F.when(F.col("h1") != F.col("h2"), 1).otherwise(0)),
                F.lit(0),
            )
        ).alias("mcnemar_statistic"),
    )


# ---------------------------------------------------------------------------
# q463 market concentration & diversity indices
#
# The concentration readouts (Herfindahl-Hirschman, Simpson,
# Shannon, effective-category count) every marketplace/antitrust/
# ecology dashboard computes — here per ship-year over brand revenue
# shares. HHI and Simpson reduce to exact integer ratios; Shannon
# rides the ln-under-ROUND-6 convention (q261 precedent).


@register(
    "q463_concentration_indices",
    category="aggregation-advanced (rollup/percentile/sketch/pivot)",
    oracle="""
    WITH brand_rev AS (
      SELECT CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS year,
             p.p_brand AS brand,
             CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100)
                  AS BIGINT) AS cents,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT),
               p.p_brand
    ),
    shared AS (
      SELECT year, cents, n,
             CAST(cents AS DOUBLE)
               / SUM(cents) OVER (PARTITION BY year) AS share
      FROM brand_rev
    ),
    peryear AS (
      SELECT year,
             CAST(COUNT(*) AS BIGINT) AS n_brands,
             CAST(SUM(cents) AS BIGINT) AS tot_cents,
             CAST(SUM(n) AS BIGINT) AS tot_n,
             CAST(SUM(CAST(cents AS DECIMAL(19,0)) * cents)
                  AS DECIMAL(38,0)) AS sq_cents,
             CAST(SUM(CAST(n AS DECIMAL(19,0)) * (n - 1))
                  AS DECIMAL(38,0)) AS pair_n,
             CAST(SUM(CAST((FLOOR(CAST(-1.0 * share * LN(share) AS DOUBLE) * 1000000000.0 + 0.5) / 1000000000.0)
               AS DECIMAL(38,9))) AS DOUBLE) AS shannon_raw
      FROM shared
      GROUP BY year
    )
    SELECT year, n_brands,
           CAST(tot_cents AS DOUBLE) / 100 AS total_revenue,
           (FLOOR(CAST(CAST(sq_cents AS DOUBLE)
                 / (CAST(tot_cents AS DOUBLE)
                    * CAST(tot_cents AS DOUBLE)) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS hhi,
           (FLOOR(CAST(CAST(pair_n AS DOUBLE)
                 / NULLIF(CAST(tot_n AS DOUBLE)
                          * (tot_n - 1), 0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS simpson,
           (FLOOR(CAST(shannon_raw AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS shannon,
           (FLOOR(CAST(CAST(tot_cents AS DOUBLE)
                 * CAST(tot_cents AS DOUBLE)
                 / NULLIF(CAST(sq_cents AS DOUBLE), 0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS effective_brands
    FROM peryear
    ORDER BY year
    """,
)
def q463_concentration_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concentration & diversity indices per ship-year over brand
    revenue: Herfindahl-Hirschman (sum of squared shares — the
    antitrust standard), Simpson's lambda on line counts (the
    probability two random lines share a brand), Shannon entropy of
    revenue shares, and the effective brand count 1/HHI. The
    marketplace-concentration dashboard the registry's Gini/zipf
    ops circle without computing.

    Determinism: revenue is exact BIGINT cents; HHI = sum(s_b^2) /
    S^2 and Simpson = sum(n(n-1)) / (N(N-1)) are ratios of exact
    DECIMAL/BIGINT reductions (one double division each, NULLIF
    guards); Shannon's ln rides the ROUND-6 convention with 1e-9
    term grids (q261 precedent).

    Scale: the lineitem-part join shuffles on partkey (or
    broadcasts part when small); the rest is a two-level aggregate
    ending at year x brand then year grain — map-side combinable
    throughout. The Shannon share window runs over <=30 brand rows
    per year.
    """
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.year("l_shipdate").cast("bigint").alias("year"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100).alias(
            "cents_d"
        ),
    )
    pt = t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), F.col("p_brand").alias("brand")
    )
    brand_rev = (
        li.join(pt, "l_partkey")
        .groupBy("year", "brand")
        .agg(
            F.sum("cents_d").cast("bigint").alias("cents"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    wyear = Window.partitionBy("year")
    shares = brand_rev.withColumn(
        "share",
        F.col("cents").cast("double") / F.sum("cents").over(wyear),
    )
    peryear = shares.groupBy("year").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_brands"),
        F.sum("cents").cast("bigint").alias("tot_cents"),
        F.sum("n").cast("bigint").alias("tot_n"),
        F.sum(F.col("cents").cast("decimal(19,0)") * F.col("cents"))
        .cast("decimal(38,0)")
        .alias("sq_cents"),
        F.sum(F.col("n").cast("decimal(19,0)") * (F.col("n") - 1))
        .cast("decimal(38,0)")
        .alias("pair_n"),
        F.sum(
            dround(
                F.lit(-1.0) * F.col("share") * F.log(F.col("share")), 9
            ).cast("decimal(38,9)")
        )
        .cast("double")
        .alias("shannon_raw"),
    )
    return peryear.select(
        "year",
        "n_brands",
        (F.col("tot_cents").cast("double") / 100).alias("total_revenue"),
        dround(
            F.col("sq_cents").cast("double")
            / (
                F.col("tot_cents").cast("double")
                * F.col("tot_cents").cast("double")
            ),
            6,
        ).alias("hhi"),
        dround(
            F.col("pair_n").cast("double")
            / F.nullif(
                F.col("tot_n").cast("double") * (F.col("tot_n") - 1),
                F.lit(0.0),
            ),
            6,
        ).alias("simpson"),
        dround("shannon_raw", 6).alias("shannon"),
        dround(
            F.col("tot_cents").cast("double")
            * F.col("tot_cents").cast("double")
            / F.nullif(F.col("sq_cents").cast("double"), F.lit(0.0)),
            6,
        ).alias("effective_brands"),
    ).orderBy("year")


# ---------------------------------------------------------------------------
# q464 Granger causality (does clicking "Granger-cause" purchasing?)
#
# The bivariate lag test (Granger 1969): regress purchases_t on its
# own lag with and without the click lag; the F-ratio of the SSE
# drop is the causality readout. Distinct from q454 (univariate AR)
# and q327 (DiD): this is the PREDICTIVE-causality family. All
# regression moments are exact integer sums; betas/SSEs are double
# expressions over identical operands on both engines.


@register(
    "q464_granger_causality",
    category="analytics-stats (regression/tests/causal)",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                      THEN 1 ELSE 0 END) AS BIGINT) AS y,
             CAST(SUM(CASE WHEN event_type = 'click'
                      THEN 1 ELSE 0 END) AS BIGINT) AS x
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    lagged AS (
      SELECT day, y,
             LAG(y) OVER (ORDER BY day) AS y1,
             LAG(x) OVER (ORDER BY day) AS x1
      FROM daily
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(y1) AS DECIMAL(38,0)) AS s1,
             CAST(SUM(x1) AS DECIMAL(38,0)) AS s2,
             CAST(SUM(CAST(y AS DECIMAL(19,0)) * y) AS DECIMAL(38,0))
               AS syy,
             CAST(SUM(CAST(y1 AS DECIMAL(19,0)) * y1) AS DECIMAL(38,0))
               AS s11,
             CAST(SUM(CAST(x1 AS DECIMAL(19,0)) * x1) AS DECIMAL(38,0))
               AS s22,
             CAST(SUM(CAST(y1 AS DECIMAL(19,0)) * x1) AS DECIMAL(38,0))
               AS s12,
             CAST(SUM(CAST(y AS DECIMAL(19,0)) * y1) AS DECIMAL(38,0))
               AS s1y,
             CAST(SUM(CAST(y AS DECIMAL(19,0)) * x1) AS DECIMAL(38,0))
               AS s2y
      FROM lagged WHERE y1 IS NOT NULL
    ),
    m AS (
      SELECT n,
             CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS myy,
             CAST(n AS DOUBLE) * CAST(s11 AS DOUBLE)
               - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) AS m11,
             CAST(n AS DOUBLE) * CAST(s22 AS DOUBLE)
               - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) AS m22,
             CAST(n AS DOUBLE) * CAST(s12 AS DOUBLE)
               - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) AS m12,
             CAST(n AS DOUBLE) * CAST(s1y AS DOUBLE)
               - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE) AS m1y,
             CAST(n AS DOUBLE) * CAST(s2y AS DOUBLE)
               - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE) AS m2y
      FROM s
    ),
    fit AS (
      SELECT n, myy, m11, m22, m12, m1y, m2y,
             (m1y * m22 - m2y * m12)
               / NULLIF(m11 * m22 - m12 * m12, 0) AS b1,
             (m2y * m11 - m1y * m12)
               / NULLIF(m11 * m22 - m12 * m12, 0) AS b2,
             m1y / NULLIF(m11, 0) AS a1
      FROM m
    )
    SELECT n AS n_samples,
           (FLOOR(CAST(a1 AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS ar_coef,
           (FLOOR(CAST(b1 AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS y_lag_coef,
           (FLOOR(CAST(b2 AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS x_lag_coef,
           (FLOOR(CAST((myy - a1 * m1y) / n AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS sse_restricted,
           (FLOOR(CAST((myy - b1 * m1y - b2 * m2y) / n AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS sse_unrestricted,
           (FLOOR(CAST(((myy - a1 * m1y) - (myy - b1 * m1y - b2 * m2y))
                 * (n - 3)
                 / NULLIF(myy - b1 * m1y - b2 * m2y, 0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS f_statistic
    FROM fit
    """,
)
def q464_granger_causality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger causality from daily clicks to daily purchases
    (Granger 1969): fit purchases_t ~ purchases_{t-1} with and
    without clicks_{t-1}; F = (SSE_r - SSE_u)(n-3)/SSE_u tests
    whether the click lag adds predictive power — the PREDICTIVE-
    causality family next to the registry's AR(1) (q454) and DiD
    (q327). Betas come from the centered normal equations.

    Determinism: all ten regression moments are exact
    DECIMAL(38) sums of integer daily-count products (counts <=
    ~3e7/day even at 1000x — products < 1e15, int64-safe before the
    DECIMAL cast); the centered moments, betas, SSEs, and F are the
    same double expressions over identical operands on both
    engines, with NULLIF guarding singular designs (constant series)
    and everything ROUND-6 at the boundary.

    Scale: one map-side-combinable date-grain aggregate; windows run
    over the tiny daily series; the rest is scalar.
    """
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("y"),
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("bigint")
            .alias("x"),
        )
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "day",
        "y",
        F.lag("y").over(w).alias("y1"),
        F.lag("x").over(w).alias("x1"),
    ).filter(F.col("y1").isNotNull())

    def dprod(a, b):
        return F.sum(
            F.col(a).cast("decimal(19,0)") * F.col(b)
        ).cast("decimal(38,0)")

    s = lagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum("y1").cast("decimal(38,0)").alias("s1"),
        F.sum("x1").cast("decimal(38,0)").alias("s2"),
        dprod("y", "y").alias("syy"),
        dprod("y1", "y1").alias("s11"),
        dprod("x1", "x1").alias("s22"),
        dprod("y1", "x1").alias("s12"),
        dprod("y", "y1").alias("s1y"),
        dprod("y", "x1").alias("s2y"),
    )

    def ctr(ab, a, b):
        return (
            F.col("n").cast("double") * F.col(ab).cast("double")
            - F.col(a).cast("double") * F.col(b).cast("double")
        )

    m = s.select(
        "n",
        ctr("syy", "sy", "sy").alias("myy"),
        ctr("s11", "s1", "s1").alias("m11"),
        ctr("s22", "s2", "s2").alias("m22"),
        ctr("s12", "s1", "s2").alias("m12"),
        ctr("s1y", "s1", "sy").alias("m1y"),
        ctr("s2y", "s2", "sy").alias("m2y"),
    )
    det = F.col("m11") * F.col("m22") - F.col("m12") * F.col("m12")
    b1 = (
        F.col("m1y") * F.col("m22") - F.col("m2y") * F.col("m12")
    ) / F.nullif(det, F.lit(0.0))
    b2 = (
        F.col("m2y") * F.col("m11") - F.col("m1y") * F.col("m12")
    ) / F.nullif(det, F.lit(0.0))
    a1 = F.col("m1y") / F.nullif(F.col("m11"), F.lit(0.0))
    sse_r = (F.col("myy") - a1 * F.col("m1y")) / F.col("n")
    sse_u = (
        F.col("myy") - b1 * F.col("m1y") - b2 * F.col("m2y")
    ) / F.col("n")
    return m.select(
        F.col("n").alias("n_samples"),
        dround(a1, 6).alias("ar_coef"),
        dround(b1, 6).alias("y_lag_coef"),
        dround(b2, 6).alias("x_lag_coef"),
        dround(sse_r, 6).alias("sse_restricted"),
        dround(sse_u, 6).alias("sse_unrestricted"),
        dround(
            (
                (F.col("myy") - a1 * F.col("m1y"))
                - (
                    F.col("myy")
                    - b1 * F.col("m1y")
                    - b2 * F.col("m2y")
                )
            )
            * (F.col("n") - 3)
            / F.nullif(
                F.col("myy") - b1 * F.col("m1y") - b2 * F.col("m2y"),
                F.lit(0.0),
            ),
            6,
        ).alias("f_statistic"),
    )


# ---------------------------------------------------------------------------
# q465 consistent-hash RING audit (vs q446's rendezvous)
#
# The OTHER classic sharding scheme (Karger et al. 1997): shards
# project VNODES onto a hash ring; a key belongs to the first vnode
# clockwise. Adding a shard must move ONLY keys that land on the new
# shard (minimal disruption) — certified in-query, per shard, like
# q446 does for rendezvous. Ownership is a packed-integer MIN over a
# broadcast 128-row vnode table — no per-doc window, no sort.

RING_SHARDS = 8
RING_VNODES = 16
RING_SALT = "ring_r5"


def _ring_vnode_sql(n_shards: int) -> str:
    return f"""
      SELECT s.sidx, v.vidx,
             CAST(('0x' || substr(md5('{RING_SALT}|' ||
                    CAST(s.sidx AS VARCHAR) || '|' ||
                    CAST(v.vidx AS VARCHAR)), 1, 12)) AS BIGINT)
               AS vp
      FROM (SELECT UNNEST(range({n_shards})) AS sidx) s
      CROSS JOIN (SELECT UNNEST(range({RING_VNODES})) AS vidx) v
    """


@register(
    "q465_consistent_hash_ring",
    category="llm-pipeline-ops",
    oracle=f"""
    WITH v1 AS ({_ring_vnode_sql(RING_SHARDS)}),
    v2 AS ({_ring_vnode_sql(RING_SHARDS + 1)}),
    keys AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                    || '|{RING_SALT}'), 1, 12)) AS BIGINT) AS h
      FROM documents
    ),
    own1 AS (
      SELECT k.doc_id,
             CAST(COALESCE(MIN(CASE WHEN v.vp >= k.h
                                THEN v.vp * 32 + v.sidx END),
                           MIN(v.vp * 32 + v.sidx)) % 32 AS BIGINT)
               AS shard1
      FROM keys k CROSS JOIN v1 v
      GROUP BY k.doc_id
    ),
    own2 AS (
      SELECT k.doc_id,
             CAST(COALESCE(MIN(CASE WHEN v.vp >= k.h
                                THEN v.vp * 32 + v.sidx END),
                           MIN(v.vp * 32 + v.sidx)) % 32 AS BIGINT)
               AS shard2
      FROM keys k CROSS JOIN v2 v
      GROUP BY k.doc_id
    ),
    joined AS (
      SELECT o1.doc_id, o1.shard1, o2.shard2,
             CASE WHEN o1.shard1 <> o2.shard2 THEN 1 ELSE 0 END
               AS moved
      FROM own1 o1 JOIN own2 o2 USING (doc_id)
    )
    SELECT shard1 AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs_before,
           CAST(SUM(moved) AS BIGINT) AS moved_out,
           CAST(SUM(CASE WHEN moved = 1
                     AND shard2 = {RING_SHARDS} THEN 1 ELSE 0 END)
                AS BIGINT) AS moved_to_new,
           BOOL_AND(moved = 0 OR shard2 = {RING_SHARDS})
             AS minimal_disruption_ok
    FROM joined
    GROUP BY shard1
    ORDER BY shard1
    """,
)
def q465_consistent_hash_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hash RING sharding audit (Karger et al. 1997), the
    ring-with-virtual-nodes counterpart of q446's rendezvous
    hashing: {RING_SHARDS} shards x {RING_VNODES} md5 vnodes; each
    document belongs to the first vnode clockwise from its hash
    point (wrap to the ring minimum). Adding shard {RING_SHARDS}
    re-routes documents; the ring's minimal-disruption property —
    every mover must land on the NEW shard — is CERTIFIED per
    source shard in-row.

    Determinism: every hash point is a 48-bit md5 integer;
    ownership is COALESCE(MIN(point*32 + shard | point >= h),
    MIN(point*32 + shard)) — a packed-integer aggregate with the
    shard index as the (never-needed in practice) collision
    tie-break; no floats anywhere.

    Scale: ownership is a fan-out join against a broadcast 128-row
    vnode table collapsed by partial aggregation (doc x 128 narrow
    rows, map-side combined) — no per-doc window, no sort, no
    shuffle beyond the doc-grain combine. The moved/landed
    certification is one equi-join on doc_id.
    """
    docs = t(spark, sf_dir, "documents").select("doc_id")
    keys = docs.select(
        "doc_id",
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(f"|{RING_SALT}"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("h"),
    )

    def vnodes(n_shards: int) -> DataFrame:
        rows = [
            (s, v)
            for s in range(n_shards)
            for v in range(RING_VNODES)
        ]
        vdf = spark.createDataFrame(rows, "sidx int, vidx int")
        return vdf.select(
            "sidx",
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(f"{RING_SALT}|"),
                            F.col("sidx").cast("string"),
                            F.lit("|"),
                            F.col("vidx").cast("string"),
                        )
                    ),
                    1,
                    12,
                ),
                16,
                10,
            )
            .cast("bigint")
            .alias("vp"),
        )

    def owners(vn: DataFrame, out: str) -> DataFrame:
        packed = F.col("vp") * 32 + F.col("sidx")
        return (
            keys.crossJoin(F.broadcast(vn))
            .groupBy("doc_id")
            .agg(
                (
                    F.coalesce(
                        F.min(F.when(F.col("vp") >= F.col("h"), packed)),
                        F.min(packed),
                    )
                    % 32
                )
                .cast("bigint")
                .alias(out)
            )
        )

    own1 = owners(vnodes(RING_SHARDS), "shard1")
    own2 = owners(vnodes(RING_SHARDS + 1), "shard2")
    joined = own1.join(own2, "doc_id").withColumn(
        "moved", F.when(F.col("shard1") != F.col("shard2"), 1).otherwise(0)
    )
    return (
        joined.groupBy(F.col("shard1").alias("shard"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs_before"),
            F.sum("moved").cast("bigint").alias("moved_out"),
            F.sum(
                F.when(
                    (F.col("moved") == 1)
                    & (F.col("shard2") == RING_SHARDS),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("moved_to_new"),
            F.bool_and(
                (F.col("moved") == 0)
                | (F.col("shard2") == RING_SHARDS)
            ).alias("minimal_disruption_ok"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# q466 EWMA control chart (Roberts 1959)
#
# The exponentially-weighted control chart every SPC/monitoring
# stack runs: z_t = lambda*x_t + (1-lambda)*z_{t-1} against
# +-L*sigma*sqrt(lambda/(2-lambda)) limits. lambda = 1/2 makes every
# weight a dyadic rational: with a {EWMA_W}-step truncated kernel
# the weighted sum is an EXACT BIGINT in units of 2^-{EWMA_W}, and
# the early-step normalization divides by the exact used-weight
# total — no float recursion anywhere.

EWMA_W = 20  # truncated kernel horizon (2^-20 tail mass ~1e-6)
EWMA_L = 3.0


@register(
    "q466_ewma_control_chart",
    category="events-temporal",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    seq AS (
      SELECT day, x,
             CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS tk
      FROM daily
    ),
    kernel AS (
      SELECT a.tk, a.day, a.x AS x_t,
             CAST(SUM(b.x * (CAST(1 AS BIGINT)
                  << CAST({EWMA_W} - 1 - (a.tk - b.tk) AS INTEGER)))
                  AS BIGINT) AS z_num,
             CAST(SUM(CAST(1 AS BIGINT)
                  << CAST({EWMA_W} - 1 - (a.tk - b.tk) AS INTEGER))
                  AS BIGINT) AS z_den
      FROM seq a JOIN seq b
        ON b.tk <= a.tk AND b.tk > a.tk - {EWMA_W}
      GROUP BY a.tk, a.day, a.x
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS s,
             CAST(SUM(CAST(x AS DECIMAL(19,0)) * x) AS DECIMAL(38,0))
               AS q
      FROM daily
    )
    SELECT k.day, k.tk, k.x_t,
           CAST(k.z_num AS DOUBLE) / k.z_den AS ewma,
           CAST(s.s AS DOUBLE) / s.n AS center,
           {EWMA_L} * SQRT((CAST(s.n AS DOUBLE) * CAST(s.q AS DOUBLE)
                 - CAST(s.s AS DOUBLE) * CAST(s.s AS DOUBLE))
                / (CAST(s.n AS DOUBLE) * s.n * GREATEST(s.n - 1, 1)))
             * SQRT(1.0 / 3.0) AS limit_width,
           ABS(CAST(k.z_num AS DOUBLE) / k.z_den
               - CAST(s.s AS DOUBLE) / s.n)
             > {EWMA_L} * SQRT((CAST(s.n AS DOUBLE) * CAST(s.q AS DOUBLE)
                 - CAST(s.s AS DOUBLE) * CAST(s.s AS DOUBLE))
                / (CAST(s.n AS DOUBLE) * s.n * GREATEST(s.n - 1, 1)))
             * SQRT(1.0 / 3.0) AS out_of_control
    FROM kernel k, stats s
    ORDER BY k.day
    """,
)
def q466_ewma_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart over daily event counts (Roberts 1959,
    the SPC standard): z_t = lambda x_t + (1-lambda) z_{{t-1}} with
    lambda = 1/2, flagged when |z - xbar| exceeds
    L*sigma*sqrt(lambda/(2-lambda)) = {EWMA_L}*sigma*sqrt(1/3). The
    recursion is unrolled into a {EWMA_W}-step truncated kernel
    (tail mass 2^-{EWMA_W} ~ 1e-6, documented): every weight is a
    power of two, so the weighted numerator and the used-weight
    denominator are EXACT BIGINTs (the q395 dyadic-grid trick) and
    z is one division of identical integers — no float recursion,
    no window-summation-order hazard.

    Determinism: counts, kernel weights, and both z terms are
    BIGINT; sigma comes from exact DECIMAL moments (n*q - s^2);
    sqrt is IEEE-correctly-rounded; every comparison runs on
    identical doubles.

    Scale: the heavy table collapses to date grain map-side; the
    kernel self-join fans the tiny daily series x{EWMA_W} (a
    banded range join at series grain, never at event grain).
    """
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    w = Window.orderBy("day")
    seq = daily.withColumn(
        "tk", F.row_number().over(w).cast("bigint")
    )
    a = seq.select(
        F.col("tk").alias("tk"), "day", F.col("x").alias("x_t")
    )
    b = seq.select(F.col("tk").alias("btk"), F.col("x").alias("bx"))
    shift = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST({EWMA_W} - 1 - (tk - btk) AS INT))"
    )
    kernel = (
        a.join(
            b,
            (F.col("btk") <= F.col("tk"))
            & (F.col("btk") > F.col("tk") - EWMA_W),
        )
        .groupBy("tk", "day", "x_t")
        .agg(
            F.sum(F.col("bx") * shift).cast("bigint").alias("z_num"),
            F.sum(shift).cast("bigint").alias("z_den"),
        )
    )
    stats = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("q"),
    )
    joined = kernel.crossJoin(F.broadcast(stats))
    ewma = F.col("z_num").cast("double") / F.col("z_den")
    center = F.col("s").cast("double") / F.col("n")
    sigma = F.sqrt(
        (
            F.col("n").cast("double") * F.col("q").cast("double")
            - F.col("s").cast("double") * F.col("s").cast("double")
        )
        / (
            F.col("n").cast("double")
            * F.col("n")
            * F.greatest(F.col("n") - 1, F.lit(1))
        )
    )
    width = F.lit(EWMA_L) * sigma * F.sqrt(F.lit(1.0) / 3.0)
    return joined.select(
        "day",
        "tk",
        "x_t",
        ewma.alias("ewma"),
        center.alias("center"),
        width.alias("limit_width"),
        (F.abs(ewma - center) > width).alias("out_of_control"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# q467 edit-distance suite (Levenshtein builtin parity + TRUE
# Damerau-Levenshtein)
#
# String-distance kernels for record linkage: Levenshtein runs as
# the BUILTIN on both engines (Spark's JVM DP vs DuckDB's C++ DP —
# a genuine cross-engine builtin-parity certification), and
# Damerau-Levenshtein (the transposition-aware variant) as a pandas
# UDF implementing the TRUE DL algorithm (alphabet-indexed
# Lowrance-Wagner), pinned against DuckDB's native
# ``damerau_levenshtein`` — an 8k-pair fuzz proved DuckDB implements
# true DL, NOT the restricted OSA variant (45/8000 differ).


@register(
    "q467_edit_distance_suite",
    category="llm-dedup",
    oracle="""
    WITH pairs AS (
      SELECT a.p_partkey AS pair_id,
             a.p_name AS name_a, b.p_name AS name_b
      FROM part a JOIN part b ON b.p_partkey = a.p_partkey + 1
    )
    SELECT pair_id, name_a, name_b,
           CAST(levenshtein(name_a, name_b) AS BIGINT) AS lev,
           CAST(damerau_levenshtein(name_a, name_b) AS BIGINT) AS dl,
           CAST(levenshtein(name_a, name_b)
                - damerau_levenshtein(name_a, name_b) AS BIGINT)
             AS transposition_savings,
           levenshtein(name_a, name_b)
             <= CAST(GREATEST(LENGTH(name_a), LENGTH(name_b))
                     AS BIGINT) // 4 AS close_match
    FROM pairs
    ORDER BY pair_id
    """,
)
def q467_edit_distance_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance suite over consecutive part-name pairs: plain
    Levenshtein via the BUILTIN on both engines (Spark JVM vs DuckDB
    C++ — a genuine independent-implementation parity check on
    integer outputs), plus TRUE Damerau-Levenshtein (Lowrance-Wagner
    1975 with alphabet tracking, where a transposition costs 1 even
    across intervening edits) as a pandas UDF — an 8k-pair fuzz
    showed DuckDB's native ``damerau_levenshtein`` is true DL, not
    the restricted OSA variant (they differ on 45/8000 random
    triples like 'ab'->'bca'). ``transposition_savings`` = lev - dl
    isolates the transposition credit; ``close_match`` gates at
    distance <= max_len/4.

    Determinism: every output is an integer — no rounding grid
    anywhere; the pair generator is the q457 partkey+1 equi-join.

    Scale: co-partitionable equi-join, Arrow-batched UDF, linear in
    pairs; the builtin Levenshtein stays whole-stage-codegen'd
    JVM-side.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def dl_udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
        return pd.Series(
            [_damerau_levenshtein(a, b) for a, b in zip(s1, s2)],
            dtype="int64",
        )

    part = t(spark, sf_dir, "part").select("p_partkey", "p_name")
    pairs = part.alias("a").join(
        part.alias("b"),
        F.col("b.p_partkey") == F.col("a.p_partkey") + 1,
    ).select(
        F.col("a.p_partkey").alias("pair_id"),
        F.col("a.p_name").alias("name_a"),
        F.col("b.p_name").alias("name_b"),
    )
    lev = F.levenshtein("name_a", "name_b").cast("bigint")
    return pairs.select(
        "pair_id",
        "name_a",
        "name_b",
        lev.alias("lev"),
        dl_udf("name_a", "name_b").cast("bigint").alias("dl"),
        (lev - dl_udf("name_a", "name_b")).cast("bigint").alias(
            "transposition_savings"
        ),
        (
            lev
            <= F.expr(
                "CAST(GREATEST(LENGTH(name_a), LENGTH(name_b)) AS BIGINT) "
                "DIV 4"
            )
        ).alias("close_match"),
    ).orderBy("pair_id")


def _damerau_levenshtein(s1: str, s2: str) -> int:
    """TRUE Damerau-Levenshtein (Lowrance-Wagner with alphabet
    tracking) — matches DuckDB's native implementation exactly on an
    8k-pair fuzz (see q467); distinct from restricted OSA."""
    da: dict[str, int] = {}
    l1, l2 = len(s1), len(s2)
    inf = l1 + l2
    d = [[inf] * (l2 + 2) for _ in range(l1 + 2)]
    for i in range(l1 + 1):
        d[i + 1][1] = i
        d[i + 1][0] = inf
    for j in range(l2 + 1):
        d[1][j + 1] = j
        d[0][j + 1] = inf
    for i in range(1, l1 + 1):
        db = 0
        for j in range(1, l2 + 1):
            k = da.get(s2[j - 1], 0)
            ll = db
            if s1[i - 1] == s2[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][ll] + (i - k - 1) + 1 + (j - ll - 1),
            )
        da[s1[i - 1]] = i
    return d[l1 + 1][l2 + 1]


# ---------------------------------------------------------------------------
# q468 Mondrian k-anonymity partitioner
#
# The greedy multidimensional generalization algorithm (LeFevre,
# DeWitt & Ramakrishnan, ICDE 2006) behind k-anonymous data
# releases — the PARTITIONER whose output q399's l-diversity audit
# assumes: recursively cut the quasi-identifier space on the
# widest dimension at its median. Three unrolled rounds -> up to 8
# boxes; each box reports its generalization rectangle and whether
# it satisfies k-anonymity.

MON_ROUNDS = 3
MON_K = 50


def _mondrian_stage_sql(r: int) -> str:
    """One Mondrian round: per box, widest-dim median cut."""
    return f""",
    stats{r} AS MATERIALIZED (
      SELECT box, CAST(MAX(cents) - MIN(cents) AS BIGINT) AS range1,
             CAST(MAX(dom) - MIN(dom) AS BIGINT) AS range2
      FROM m{r - 1} GROUP BY box
    ),
    val{r} AS MATERIALIZED (
      SELECT m.*, CASE WHEN s.range1 >= s.range2
                       THEN m.cents ELSE m.dom END AS cutval
      FROM m{r - 1} m JOIN stats{r} s USING (box)
    ),
    med{r} AS MATERIALIZED (
      SELECT box, CAST(cutval AS BIGINT) AS med FROM (
        SELECT box, cutval,
               ROW_NUMBER() OVER (PARTITION BY box ORDER BY cutval)
                 AS rk,
               COUNT(*) OVER (PARTITION BY box) AS nb
        FROM val{r}
      ) WHERE rk = (nb + 1) // 2
    ),
    m{r} AS MATERIALIZED (
      SELECT v.o_orderkey, v.cents, v.dom,
             v.box * 2 + CASE WHEN v.cutval <= d.med
                              THEN 0 ELSE 1 END AS box
      FROM val{r} v JOIN med{r} d USING (box)
    )"""


@register(
    "q468_mondrian_kanonymity",
    category="llm-pipeline-extended",
    oracle="""
    WITH m0 AS MATERIALIZED (
      SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents,
             CAST(EXTRACT(day FROM o_orderdate) AS BIGINT) AS dom,
             CAST(0 AS BIGINT) AS box
      FROM orders
    )"""
    + "".join(_mondrian_stage_sql(r) for r in range(1, MON_ROUNDS + 1))
    + f"""
    SELECT box, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(cents) AS BIGINT) AS cents_lo,
           CAST(MAX(cents) AS BIGINT) AS cents_hi,
           CAST(MIN(dom) AS BIGINT) AS dom_lo,
           CAST(MAX(dom) AS BIGINT) AS dom_hi,
           COUNT(*) >= {MON_K} AS k_anonymous
    FROM m{MON_ROUNDS}
    GROUP BY box
    ORDER BY box
    """,
)
def q468_mondrian_kanonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mondrian k-anonymity partitioning (LeFevre et al., ICDE
    2006): {MON_ROUNDS} rounds of "cut the widest quasi-identifier
    dimension at its median" over (order total cents, day-of-month),
    then report each box's generalization rectangle and whether it
    holds k >= {MON_K} — the PARTITIONER that produces the
    anonymized release q399's l-diversity audit then grades.

    Determinism: both QIs are exact integers; the cut dimension is
    a (range1 >= range2) integer comparison; the cut point is the
    exact lower-median order statistic of the chosen dimension
    (value grain — ties collapse, no row tie-break needed); box ids
    are binary path integers. Degenerate boxes (all values equal)
    send every row left identically on both engines.

    Scale: each round is one per-box window sort + a 2-8-row stats
    join — at 100 TB the exact median swaps for q444's bucket
    refinement per box (the cut only needs the median VALUE). The
    oracle CTEs are MATERIALIZED to stop exponential inlining of
    the recursive box lineage (the q459 lesson).
    """
    cur = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("dom"),
        F.lit(0).cast("bigint").alias("box"),
    )
    for _ in range(MON_ROUNDS):
        stats = cur.groupBy("box").agg(
            (F.max("cents") - F.min("cents")).cast("bigint").alias("range1"),
            (F.max("dom") - F.min("dom")).cast("bigint").alias("range2"),
        )
        val = cur.join(F.broadcast(stats), "box").withColumn(
            "cutval",
            F.when(
                F.col("range1") >= F.col("range2"), F.col("cents")
            ).otherwise(F.col("dom")),
        )
        wb = Window.partitionBy("box").orderBy("cutval")
        med = (
            val.withColumn("rk", F.row_number().over(wb))
            .withColumn(
                "nb", F.count(F.lit(1)).over(Window.partitionBy("box"))
            )
            .filter(F.col("rk") == F.expr("(nb + 1) DIV 2"))
            .select("box", F.col("cutval").cast("bigint").alias("med"))
        )
        cur = val.join(F.broadcast(med), "box").select(
            "o_orderkey",
            "cents",
            "dom",
            (
                F.col("box") * 2
                + F.when(F.col("cutval") <= F.col("med"), 0).otherwise(1)
            ).alias("box"),
        )
    return (
        cur.groupBy("box")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("cents").cast("bigint").alias("cents_lo"),
            F.max("cents").cast("bigint").alias("cents_hi"),
            F.min("dom").cast("bigint").alias("dom_lo"),
            F.max("dom").cast("bigint").alias("dom_hi"),
            (F.count(F.lit(1)) >= MON_K).alias("k_anonymous"),
        )
        .orderBy("box")
    )


# ---------------------------------------------------------------------------
# q469 Hurst exponent via rescaled-range (R/S) analysis
#
# The long-memory diagnostic (Hurst 1951; Mandelbrot's R/S): slope
# of ln(R/S) against ln(block size) over the daily-revenue series.
# H ~ 0.5 = random walk increments; H > 0.5 = persistent trends.
# The range R of cumulative deviations is computed on an EXACT
# m-scaled integer grid (m*prefix - j*block_sum), so only S (the
# block sigma) and the final lns touch floats.

HURST_SIZES = [8, 16, 32, 64]


@register(
    "q469_hurst_exponent",
    category="analytics-stats (regression/tests/causal)",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                  AS BIGINT) AS cents
      FROM orders GROUP BY CAST(o_orderdate AS DATE)
    ),
    seq AS (
      SELECT cents,
             CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS tk
      FROM daily
    ),
    fanned AS (
      SELECT s.m, (q.tk - 1) // s.m AS blk, q.tk, q.cents,
             ROW_NUMBER() OVER (PARTITION BY s.m, (q.tk - 1) // s.m
                                ORDER BY q.tk) AS j,
             SUM(q.cents) OVER (PARTITION BY s.m, (q.tk - 1) // s.m
                                ORDER BY q.tk
                                ROWS UNBOUNDED PRECEDING) AS pref,
             SUM(q.cents) OVER (PARTITION BY s.m, (q.tk - 1) // s.m)
               AS bs_w
      FROM seq q
      CROSS JOIN (SELECT UNNEST([{",".join(map(str, HURST_SIZES))}])
                  AS m) s
    ),
    blocks AS (
      SELECT m, blk,
             CAST(COUNT(*) AS BIGINT) AS nb,
             CAST(SUM(cents) AS BIGINT) AS bs,
             CAST(SUM(CAST(cents AS DECIMAL(19,0)) * cents)
                  AS DECIMAL(38,0)) AS bq,
             CAST(MAX(m * pref - j * bs_w) AS BIGINT) AS dev_max,
             CAST(MIN(m * pref - j * bs_w) AS BIGINT) AS dev_min
      FROM fanned
      GROUP BY m, blk
    ),
    rs AS (
      SELECT m,
             (FLOOR(CAST(LN(
               (CAST(dev_max - LEAST(dev_min, 0) AS DOUBLE) / m)
               / NULLIF(SQRT((CAST(nb AS DOUBLE) * CAST(bq AS DOUBLE)
                    - CAST(bs AS DOUBLE) * CAST(bs AS DOUBLE))
                   / (CAST(nb AS DOUBLE) * nb)), 0)) AS DOUBLE) * 1000000000.0 + 0.5) / 1000000000.0) AS ln_rs
      FROM blocks WHERE nb = m
    ),
    pts AS (
      SELECT CAST(m AS BIGINT) AS m, LN(CAST(m AS DOUBLE)) AS lx,
             CAST(COUNT(ln_rs) AS BIGINT) AS n_blocks,
             CAST(SUM(CAST(ln_rs AS DECIMAL(38,9))) AS DOUBLE)
               / NULLIF(COUNT(ln_rs), 0) AS mean_ln_rs
      FROM rs GROUP BY m
    ),
    fit AS (
      SELECT (COUNT(*) * SUM(lx * mean_ln_rs) - SUM(lx) * SUM(mean_ln_rs))
             / NULLIF(COUNT(*) * SUM(lx * lx) - SUM(lx) * SUM(lx), 0)
               AS hurst
      FROM pts WHERE mean_ln_rs IS NOT NULL
    )
    SELECT p.m, p.n_blocks, (FLOOR(CAST(p.mean_ln_rs AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS mean_ln_rs,
           (FLOOR(CAST(f.hurst AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS hurst
    FROM pts p, fit f
    ORDER BY p.m
    """,
)
def q469_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of daily revenue by rescaled-range analysis
    (Hurst 1951; the Mandelbrot R/S long-memory diagnostic): chop
    the series into blocks of m in {HURST_SIZES}, per FULL block
    compute R = range of cumulative mean-deviations and S = the
    population sigma, then H = the OLS slope of mean ln(R/S) on
    ln m. H ~ 0.5 marks independent increments; persistent trends
    push H above it.

    Determinism: the cumulative deviation rides an EXACT m-scaled
    integer grid (m*prefix_j - j*block_sum — no rational means), so
    R is integer arithmetic; S comes from exact DECIMAL moments;
    ln(R/S) grids at 1e-9 before the exact DECIMAL mean (q261 ln
    convention); the 4-point OLS slope is the same double
    expression on both engines. R uses max(dev) - min(dev, 0)
    with the 0 anchor so single-row blocks give R = 0, not NULL
    asymmetries.

    Scale: the heavy table collapses to date grain first; the x4
    block fan-out, windows, and fits all run on the tiny daily
    series.
    """
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents")
        )
    )
    seq = daily.select(
        "cents",
        F.row_number().over(Window.orderBy("day")).cast("bigint").alias("tk"),
    )
    sizes = spark.createDataFrame([(m,) for m in HURST_SIZES], "m int")
    fanned = seq.crossJoin(F.broadcast(sizes)).withColumn(
        "blk", F.expr("(tk - 1) DIV m")
    )
    wb = Window.partitionBy("m", "blk").orderBy("tk")
    wball = Window.partitionBy("m", "blk")
    fanned = (
        fanned.withColumn("j", F.row_number().over(wb).cast("bigint"))
        .withColumn(
            "pref",
            F.sum("cents")
            .over(wb.rowsBetween(Window.unboundedPreceding, 0))
            .cast("bigint"),
        )
        .withColumn("bs_w", F.sum("cents").over(wball).cast("bigint"))
        .withColumn(
            "dev", F.col("m") * F.col("pref") - F.col("j") * F.col("bs_w")
        )
    )
    blocks = fanned.groupBy("m", "blk").agg(
        F.count(F.lit(1)).cast("bigint").alias("nb"),
        F.sum("cents").cast("bigint").alias("bs"),
        F.sum(F.col("cents").cast("decimal(19,0)") * F.col("cents"))
        .cast("decimal(38,0)")
        .alias("bq"),
        F.max("dev").cast("bigint").alias("dev_max"),
        F.min("dev").cast("bigint").alias("dev_min"),
    ).filter(F.col("nb") == F.col("m"))
    sigma = F.sqrt(
        (
            F.col("nb").cast("double") * F.col("bq").cast("double")
            - F.col("bs").cast("double") * F.col("bs").cast("double")
        )
        / (F.col("nb").cast("double") * F.col("nb"))
    )
    rs = blocks.select(
        "m",
        dround(
            F.log(
                (
                    (
                        F.col("dev_max")
                        - F.least(F.col("dev_min"), F.lit(0))
                    ).cast("double")
                    / F.col("m")
                )
                / F.nullif(sigma, F.lit(0.0))
            ),
            9,
        ).alias("ln_rs"),
    )
    pts = (
        rs.groupBy(F.col("m").cast("bigint").alias("m"))
        .agg(
            F.count("ln_rs").cast("bigint").alias("n_blocks"),
            (
                F.sum(F.col("ln_rs").cast("decimal(38,9)")).cast("double")
                / F.nullif(F.count("ln_rs"), F.lit(0))
            ).alias("mean_ln_rs"),
        )
        .withColumn("lx", F.log(F.col("m").cast("double")))
    )
    fitted = pts.filter(F.col("mean_ln_rs").isNotNull()).agg(
        (
            (
                F.count(F.lit(1)) * F.sum(F.col("lx") * F.col("mean_ln_rs"))
                - F.sum("lx") * F.sum("mean_ln_rs")
            )
            / F.nullif(
                F.count(F.lit(1)) * F.sum(F.col("lx") * F.col("lx"))
                - F.sum("lx") * F.sum("lx"),
                F.lit(0.0),
            )
        ).alias("hurst")
    )
    return (
        pts.crossJoin(F.broadcast(fitted))
        .select(
            "m",
            "n_blocks",
            dround("mean_ln_rs", 6).alias("mean_ln_rs"),
            dround("hurst", 6).alias("hurst"),
        )
        .orderBy("m")
    )


# ---------------------------------------------------------------------------
# q470 empirical-Bayes beta-binomial shrinkage
#
# The James-Stein move every ranking dashboard needs: per-user CTR
# estimates shrunk toward a beta prior fit by METHOD OF MOMENTS on
# the user-level rate distribution (Morris 1983 parametric EB). A
# user with 1/1 clicks must rank below a user with 45/50 — raw
# rates can't do that; shrunk posteriors can.

EB_TOP = 15


@register(
    "q470_beta_binomial_shrinkage",
    category="ml-eval-calibration",
    oracle=f"""
    WITH users AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x
      FROM events GROUP BY user_id
    ),
    rates AS (
      SELECT user_id, n, x, CAST(x AS DOUBLE) / n AS p FROM users
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nu,
             CAST(SUM(CAST((FLOOR(CAST(p AS DOUBLE) * 1000000000.0 + 0.5) / 1000000000.0) AS DECIMAL(38,9))) AS DOUBLE)
               / COUNT(*) AS pbar,
             (CAST(SUM(CAST((FLOOR(CAST(p * p AS DOUBLE) * 1000000000.0 + 0.5) / 1000000000.0) AS DECIMAL(38,9)))
                   AS DOUBLE)
              - CAST(COUNT(*) AS DOUBLE)
                * (CAST(SUM(CAST((FLOOR(CAST(p AS DOUBLE) * 1000000000.0 + 0.5) / 1000000000.0) AS DECIMAL(38,9)))
                        AS DOUBLE) / COUNT(*))
                * (CAST(SUM(CAST((FLOOR(CAST(p AS DOUBLE) * 1000000000.0 + 0.5) / 1000000000.0) AS DECIMAL(38,9)))
                        AS DOUBLE) / COUNT(*)))
               / NULLIF(COUNT(*) - 1, 0) AS pvar
      FROM rates
    ),
    prior AS (
      SELECT nu, pbar, pvar,
             pbar * (pbar * (1 - pbar) / NULLIF(pvar, 0) - 1) AS alpha,
             (1 - pbar) * (pbar * (1 - pbar) / NULLIF(pvar, 0) - 1)
               AS beta
      FROM mom
    )
    SELECT r.user_id, r.n, r.x,
           (FLOOR(CAST(r.p AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS raw_rate,
           (FLOOR(CAST(pr.alpha AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS alpha,
           (FLOOR(CAST(pr.beta AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS beta,
           (FLOOR(CAST((r.x + pr.alpha) / NULLIF(r.n + pr.alpha + pr.beta, 0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS shrunk_rate
    FROM rates r, prior pr
    ORDER BY r.n DESC, r.user_id ASC
    LIMIT {EB_TOP}
    """,
)
def q470_beta_binomial_shrinkage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Empirical-Bayes beta-binomial shrinkage of per-user click
    rates (Morris 1983 parametric EB; the James-Stein fix for
    small-sample leaderboards): fit Beta(alpha, beta) by METHOD OF
    MOMENTS on the user-level rate distribution, then report each
    top-{EB_TOP} user's raw vs posterior-mean rate
    (x + alpha)/(n + alpha + beta) — 1/1 click users shrink hard
    toward the prior, 45/50 users barely move.

    Determinism: per-user rates are exact-operand divisions
    (identical doubles); the moment sums grid at 1e-9 before exact
    DECIMAL accumulation; alpha/beta/shrunk are the same double
    expressions on both engines with NULLIF guarding zero variance
    (all-equal rates) and the n-1 Bessel corner; the top-{EB_TOP}
    carries the (n DESC, user_id) total order.

    Scale: one map-side-combinable user aggregate, one scalar
    moment pass, a broadcast of two prior scalars, TakeOrdered for
    the display slice.
    """
    users = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
            .cast("bigint")
            .alias("x"),
        )
    )
    rates = users.withColumn("p", F.col("x").cast("double") / F.col("n"))
    sp = F.sum(dround(F.col("p"), 9).cast("decimal(38,9)")).cast("double")
    spp = F.sum(
        dround(F.col("p") * F.col("p"), 9).cast("decimal(38,9)")
    ).cast("double")
    cnt = F.count(F.lit(1))
    mom = rates.agg(
        cnt.cast("bigint").alias("nu"),
        (sp / cnt).alias("pbar"),
        (
            (spp - cnt.cast("double") * (sp / cnt) * (sp / cnt))
            / F.nullif(cnt - 1, F.lit(0))
        ).alias("pvar"),
    )
    m = (
        F.col("pbar")
        * (F.lit(1) - F.col("pbar"))
        / F.nullif(F.col("pvar"), F.lit(0.0))
        - 1
    )
    prior = mom.select(
        "nu",
        "pbar",
        "pvar",
        (F.col("pbar") * m).alias("alpha"),
        ((F.lit(1) - F.col("pbar")) * m).alias("beta"),
    )
    return (
        rates.crossJoin(F.broadcast(prior))
        .select(
            "user_id",
            "n",
            "x",
            dround("p", 6).alias("raw_rate"),
            dround("alpha", 6).alias("alpha"),
            dround("beta", 6).alias("beta"),
            dround(
                (F.col("x") + F.col("alpha"))
                / F.nullif(
                    F.col("n") + F.col("alpha") + F.col("beta"),
                    F.lit(0.0),
                ),
                6,
            ).alias("shrunk_rate"),
        )
        .orderBy(F.col("n").desc(), F.col("user_id").asc())
        .limit(EB_TOP)
    )


# ---------------------------------------------------------------------------
# q471 OLS influence diagnostics (leverage / studentized / Cook's D)
#
# The regression-diagnostics family the registry's fitters (q316
# elasticity, q412 RANSAC, q415 segmented) never emit: per-point
# leverage h_i, internally studentized residual, and Cook's distance
# over the daily-revenue-vs-time OLS — the influence audit run
# before trusting any fitted trend.

COOK_TOP = 10


@register(
    "q471_regression_influence",
    category="analytics-stats (regression/tests/causal)",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                  AS BIGINT) AS y
      FROM orders GROUP BY CAST(o_orderdate AS DATE)
    ),
    seq AS (
      SELECT day, y,
             CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS tk
      FROM daily
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(tk) AS DECIMAL(38,0)) AS st,
             CAST(SUM(CAST(tk AS DECIMAL(19,0)) * tk) AS DECIMAL(38,0))
               AS stt,
             CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(tk AS DECIMAL(19,0)) * y) AS DECIMAL(38,0))
               AS sty
      FROM seq
    ),
    fit AS (
      SELECT n,
             (CAST(n AS DOUBLE) * CAST(sty AS DOUBLE)
              - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
             / NULLIF(CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
              - CAST(st AS DOUBLE) * CAST(st AS DOUBLE), 0) AS slope,
             CAST(st AS DOUBLE) / n AS tbar,
             CAST(sy AS DOUBLE) / n AS ybar,
             (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
              - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
               / CAST(n AS DOUBLE) AS s_tt
      FROM s
    ),
    resid AS (
      SELECT q.day, q.tk, q.y, f.n,
             q.y - (f.ybar + f.slope * (q.tk - f.tbar)) AS e,
             1.0 / f.n + (q.tk - f.tbar) * (q.tk - f.tbar)
               / NULLIF(f.s_tt, 0) AS h
      FROM seq q, fit f
    ),
    sse AS (
      SELECT CAST(SUM(CAST((FLOOR(CAST(e * e AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS DECIMAL(38,6)))
                  AS DOUBLE) AS sse
      FROM resid
    ),
    scored AS (
      SELECT r.day, r.tk, r.y, r.h, r.e,
             r.e / NULLIF(SQRT(s.sse / NULLIF(r.n - 2, 0))
                          * SQRT(1 - r.h), 0) AS rstud
      FROM resid r, sse s
    )
    SELECT day, tk,
           CAST(y AS DOUBLE) / 100 AS revenue,
           (FLOOR(CAST(h AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS leverage,
           (FLOOR(CAST(rstud AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS studentized,
           (FLOOR(CAST(rstud * rstud * h / NULLIF(2 * (1 - h), 0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS cooks_d
    FROM scored
    ORDER BY (FLOOR(CAST(rstud * rstud * h / NULLIF(2 * (1 - h), 0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
      DESC NULLS LAST, day ASC
    LIMIT {COOK_TOP}
    """,
)
def q471_regression_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS influence diagnostics for the daily-revenue-vs-time fit:
    leverage h_i = 1/n + (t-tbar)^2/S_tt, internally studentized
    residual e_i/(s*sqrt(1-h_i)), and Cook's distance
    r^2 h/(p(1-h)) with p=2 — the top-{COOK_TOP} most influential
    days. The diagnostics audit every regression consumer should
    run and the registry's fitters (q316/q412/q415) skip.

    Determinism: all five OLS moments are exact DECIMAL sums of
    integer products; slope/means/leverage are identical double
    expressions; SSE grid-rounds each squared residual at 1e-6
    before the exact DECIMAL sum; NULLIF guards n<=2, zero-spread,
    and h=1 corners; the top-{COOK_TOP} orders by the ROUNDED
    Cook's D with a day tie-break.

    Scale: one date-grain aggregate, one scalar moment pass, then
    per-row doubles on the tiny daily series with a TakeOrdered
    final.
    """
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("y")
        )
    )
    seq = daily.select(
        "day",
        "y",
        F.row_number().over(Window.orderBy("day")).cast("bigint").alias("tk"),
    )
    s = seq.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("tk").cast("decimal(38,0)").alias("st"),
        F.sum(F.col("tk").cast("decimal(19,0)") * F.col("tk"))
        .cast("decimal(38,0)")
        .alias("stt"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("tk").cast("decimal(19,0)") * F.col("y"))
        .cast("decimal(38,0)")
        .alias("sty"),
    )
    nd = F.col("n").cast("double")
    fit = s.select(
        "n",
        (
            (nd * F.col("sty").cast("double")
             - F.col("st").cast("double") * F.col("sy").cast("double"))
            / F.nullif(
                nd * F.col("stt").cast("double")
                - F.col("st").cast("double") * F.col("st").cast("double"),
                F.lit(0.0),
            )
        ).alias("slope"),
        (F.col("st").cast("double") / F.col("n")).alias("tbar"),
        (F.col("sy").cast("double") / F.col("n")).alias("ybar"),
        (
            (nd * F.col("stt").cast("double")
             - F.col("st").cast("double") * F.col("st").cast("double"))
            / nd
        ).alias("s_tt"),
    )
    resid = seq.crossJoin(F.broadcast(fit)).select(
        "day",
        "tk",
        "y",
        "n",
        (
            F.col("y")
            - (
                F.col("ybar")
                + F.col("slope") * (F.col("tk") - F.col("tbar"))
            )
        ).alias("e"),
        (
            F.lit(1.0) / F.col("n")
            + (F.col("tk") - F.col("tbar"))
            * (F.col("tk") - F.col("tbar"))
            / F.nullif(F.col("s_tt"), F.lit(0.0))
        ).alias("h"),
    )
    sse = resid.agg(
        F.sum(dround(F.col("e") * F.col("e"), 6).cast("decimal(38,6)"))
        .cast("double")
        .alias("sse")
    )
    rstud = F.col("e") / F.nullif(
        F.sqrt(F.col("sse") / F.nullif(F.col("n") - 2, F.lit(0)))
        * F.sqrt(1 - F.col("h")),
        F.lit(0.0),
    )
    cooks = dround(
        rstud * rstud * F.col("h")
        / F.nullif(2 * (1 - F.col("h")), F.lit(0.0)),
        6,
    )
    return (
        resid.crossJoin(F.broadcast(sse))
        .select(
            "day",
            "tk",
            (F.col("y").cast("double") / 100).alias("revenue"),
            dround("h", 6).alias("leverage"),
            dround(rstud, 6).alias("studentized"),
            cooks.alias("cooks_d"),
        )
        .orderBy(F.col("cooks_d").desc_nulls_last(), F.col("day").asc())
        .limit(COOK_TOP)
    )


# ---------------------------------------------------------------------------
# q472 mean average precision @ k (MAP@k)
#
# The third classic ranking metric, completing recall@k (q98), MRR
# (q233), and nDCG (q382): AP@k averages precision at each relevant
# hit (normalized by min(R, k)), MAP averages over queries. Binary
# relevance = label match; ranking = the repo's rounded-cosine +
# cand_id total order (the q382 shape). Every P@i lands on an exact
# half-up integer NANO grid ((2*cum*1e9 + i) DIV (2i)), so the AP
# numerator is a pure BIGINT sum.

MAP_K = 10
MAP_NQ = 5


@register(
    "q472_map_at_k",
    category="ml-eval-calibration",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qe, label AS ql
      FROM embeddings WHERE vec_id < {MAP_NQ}
    ),
    pairs AS (
      SELECT q.query_id, c.vec_id AS cand_id, q.ql, c.label AS cl,
             CAST(UNNEST(q.qe) AS DOUBLE) AS x,
             CAST(UNNEST(c.embedding) AS DOUBLE) AS y
      FROM q, embeddings c
      WHERE c.vec_id <> q.query_id
    ),
    dots AS (
      SELECT query_id, cand_id, ql, cl,
             SUM(x * y) AS dot,
             SQRT(SUM(x * x)) AS nq, SQRT(SUM(y * y)) AS nc
      FROM pairs GROUP BY 1, 2, 3, 4
    ),
    ranked AS (
      SELECT query_id, cand_id,
             CASE WHEN cl = ql THEN 1 ELSE 0 END AS rel,
             ROW_NUMBER() OVER (
               PARTITION BY query_id
               ORDER BY (FLOOR(CAST(dot / (nq * nc) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) DESC, cand_id ASC
             ) AS rk
      FROM dots
    ),
    relq AS (
      SELECT query_id, CAST(SUM(rel) AS BIGINT) AS n_relevant
      FROM ranked GROUP BY query_id
    ),
    hits AS (
      SELECT query_id, rk, rel,
             CAST(SUM(rel) OVER (PARTITION BY query_id ORDER BY rk
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_rel
      FROM ranked WHERE rk <= {MAP_K}
    ),
    perq AS (
      SELECT query_id,
             CAST(SUM(rel) AS BIGINT) AS hits_at_k,
             CAST(SUM(CASE WHEN rel = 1
                  THEN (2 * cum_rel * 1000000000 + rk) // (2 * rk)
                  ELSE 0 END) AS BIGINT) AS ap_nano
      FROM hits GROUP BY query_id
    ),
    ap AS (
      SELECT r.query_id, r.n_relevant, p.hits_at_k,
             CAST(p.ap_nano AS DOUBLE) / 1000000000
               / NULLIF(LEAST(r.n_relevant, {MAP_K}), 0) AS ap_at_k
      FROM relq r JOIN perq p USING (query_id)
    )
    SELECT query_id, n_relevant, hits_at_k,
           (FLOOR(CAST(ap_at_k AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS ap_at_k,
           (FLOOR(CAST(CAST(SUM(CAST((FLOOR(CAST(ap_at_k AS DOUBLE) * 1000000000.0 + 0.5) / 1000000000.0) AS DECIMAL(38,9)))
                      OVER () AS DOUBLE)
                 / COUNT(*) OVER () AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS map_at_k
    FROM ap
    ORDER BY query_id
    """,
)
def q472_map_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean average precision at k={MAP_K} over {MAP_NQ} query
    vectors — the third classic ranking metric beside recall@k
    (q98), MRR (q233), and nDCG (q382): AP@k = sum of precision at
    each relevant hit / min(R, k), MAP = the mean over queries.
    Relevance is binary label match; the ranking is the repo's
    rounded-cosine + cand_id total order.

    Determinism: each precision-at-hit lands on an exact half-up
    integer NANO grid ((2*cum*1e9 + rk) DIV (2*rk) — pure integer,
    no float division), so AP numerators are BIGINT sums; the only
    doubles are the final normalizations (identical operands both
    engines), and MAP grid-rounds per-query APs at 1e-9 before the
    exact DECIMAL mean. NULLIF guards zero-relevant queries.

    Scale: queries x corpus with the 5-query side broadcast (q70's
    shape), partial-aggregated dot products, k-bounded windows per
    query.
    """
    from .similarity import dot_double, norm_double  # noqa: F401

    emb = t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < MAP_NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("ql"),
    )
    xl = emb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("label").alias("cl"),
        F.posexplode("embedding").alias("j", "yf"),
    ).select(
        "cand_id", "cl", "j", F.col("yf").cast("double").alias("y")
    )
    ql = q.select(
        "query_id",
        "ql",
        F.posexplode("qe").alias("j", "xf"),
    ).select(
        "query_id", "ql", "j", F.col("xf").cast("double").alias("x")
    )
    dots = (
        xl.join(F.broadcast(ql), "j")
        .filter(F.col("cand_id") != F.col("query_id"))
        .groupBy("query_id", "cand_id", "ql", "cl")
        .agg(
            F.sum(F.col("x") * F.col("y")).alias("dot"),
            F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("nq"),
            F.sqrt(F.sum(F.col("y") * F.col("y"))).alias("nc"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(
        dround(F.col("dot") / (F.col("nq") * F.col("nc")), 6).desc(),
        F.col("cand_id").asc(),
    )
    ranked = dots.select(
        "query_id",
        "cand_id",
        F.when(F.col("cl") == F.col("ql"), 1).otherwise(0).alias("rel"),
        F.row_number().over(wr).alias("rk"),
    )
    relq = ranked.groupBy("query_id").agg(
        F.sum("rel").cast("bigint").alias("n_relevant")
    )
    wcum = (
        Window.partitionBy("query_id")
        .orderBy("rk")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    hits = ranked.filter(F.col("rk") <= MAP_K).withColumn(
        "cum_rel", F.sum("rel").over(wcum).cast("bigint")
    )
    perq = hits.groupBy("query_id").agg(
        F.sum("rel").cast("bigint").alias("hits_at_k"),
        F.sum(
            F.when(
                F.col("rel") == 1,
                F.expr("(2 * cum_rel * 1000000000 + rk) DIV (2 * rk)"),
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("ap_nano"),
    )
    ap = relq.join(perq, "query_id").select(
        "query_id",
        "n_relevant",
        "hits_at_k",
        (
            F.col("ap_nano").cast("double")
            / 1000000000
            / F.nullif(
                F.least(F.col("n_relevant"), F.lit(MAP_K)), F.lit(0)
            )
        ).alias("ap_at_k"),
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return ap.select(
        "query_id",
        "n_relevant",
        "hits_at_k",
        dround("ap_at_k", 6).alias("ap_at_k"),
        dround(
            F.sum(dround(F.col("ap_at_k"), 9).cast("decimal(38,9)"))
            .over(wall)
            .cast("double")
            / F.count(F.lit(1)).over(wall),
            6,
        ).alias("map_at_k"),
    ).orderBy("query_id")


# ---------------------------------------------------------------------------
# q473 Kish design effect + intraclass correlation
#
# The survey-sampling readout (Kish 1965) every cluster-sampled
# experiment needs: how much variance does sampling whole USERS
# (clusters) instead of independent events cost? ICC rho from the
# one-way ANOVA components with the unequal-size m0 correction;
# DEFF = 1 + (m0 - 1) * rho.


@register(
    "q473_design_effect",
    category="analytics-stats (regression/tests/causal)",
    oracle="""
    WITH vals AS (
      SELECT user_id,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM events
    ),
    grp AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(cents) AS BIGINT) AS sg
      FROM vals GROUP BY user_id
    ),
    tots AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(m) AS BIGINT) AS n,
             CAST(SUM(sg) AS DECIMAL(38,0)) AS s,
             CAST(SUM(CAST(m AS DECIMAL(19,0)) * m) AS DECIMAL(38,0))
               AS sum_m2,
             CAST(SUM(CAST((FLOOR(CAST(CAST(sg AS DOUBLE)
                    * CAST(sg AS DOUBLE) / m AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS DECIMAL(38,6)))
                  AS DOUBLE) AS sum_sg2_over_m
      FROM grp
    ),
    ss AS (
      SELECT t.k, t.n,
             (SELECT CAST(SUM(CAST(cents AS DECIMAL(19,0)) * cents)
                          AS DECIMAL(38,0)) FROM vals) AS sq,
             t.s, t.sum_m2, t.sum_sg2_over_m
      FROM tots t
    ),
    comp AS (
      SELECT k, n,
             CAST(sq AS DOUBLE) - sum_sg2_over_m AS ssw,
             sum_sg2_over_m
               - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n AS ssb,
             (CAST(n AS DOUBLE) - CAST(sum_m2 AS DOUBLE) / n)
               / NULLIF(k - 1, 0) AS m0
      FROM ss
    ),
    ms AS (
      SELECT k, n, m0,
             ssb / NULLIF(k - 1, 0) AS msb,
             ssw / NULLIF(n - k, 0) AS msw
      FROM comp
    )
    SELECT k AS n_clusters, n AS n_events,
           (FLOOR(CAST(m0 AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS m0,
           (FLOOR(CAST(msb / 10000 AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS msb,
           (FLOOR(CAST(msw / 10000 AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS msw,
           (FLOOR(CAST((msb - msw) / NULLIF(msb + (m0 - 1) * msw, 0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS icc,
           (FLOOR(CAST(1 + (m0 - 1)
                 * ((msb - msw) / NULLIF(msb + (m0 - 1) * msw, 0)) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS design_effect
    FROM ms
    """,
)
def q473_design_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kish design effect for user-clustered sampling of event
    values (Kish 1965): one-way ANOVA components over users as
    clusters give the intraclass correlation rho = (MSB - MSW) /
    (MSB + (m0-1) MSW) with the unequal-size correction
    m0 = (N - sum m^2 / N)/(k-1), and DEFF = 1 + (m0 - 1) rho — the
    variance penalty an A/B test pays for randomizing whole users
    instead of events. Complements q461's Brown-Forsythe (same
    ANOVA machinery, different question).

    Determinism: values become exact BIGINT cents; sum of squares
    and cluster sums are exact DECIMAL reductions; the per-cluster
    sg^2/m terms grid-round at 1e-6 before the exact DECIMAL sum
    (sg^2 can pass int64 at scale, so the division runs in doubles
    over exact-cast operands); every later step is the same double
    expression with NULLIF on the k=1 / n=k corners. MSB/MSW report
    in dollars^2 (cents^2 / 1e4).

    Scale: two map-side-combinable aggregates (user grain, then
    scalar) — nothing else.
    """
    vals = t(spark, sf_dir, "events").select(
        "user_id",
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    grp = vals.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("cents").cast("bigint").alias("sg"),
    )
    tots = grp.agg(
        F.count(F.lit(1)).cast("bigint").alias("k"),
        F.sum("m").cast("bigint").alias("n"),
        F.sum("sg").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("m").cast("decimal(19,0)") * F.col("m"))
        .cast("decimal(38,0)")
        .alias("sum_m2"),
        F.sum(
            dround(
                F.col("sg").cast("double")
                * F.col("sg").cast("double")
                / F.col("m"),
                6,
            ).cast("decimal(38,6)")
        )
        .cast("double")
        .alias("sum_sg2_over_m"),
    )
    sq = vals.agg(
        F.sum(F.col("cents").cast("decimal(19,0)") * F.col("cents"))
        .cast("decimal(38,0)")
        .alias("sq")
    )
    comp = tots.crossJoin(F.broadcast(sq)).select(
        "k",
        "n",
        (F.col("sq").cast("double") - F.col("sum_sg2_over_m")).alias("ssw"),
        (
            F.col("sum_sg2_over_m")
            - F.col("s").cast("double")
            * F.col("s").cast("double")
            / F.col("n")
        ).alias("ssb"),
        (
            (F.col("n").cast("double") - F.col("sum_m2").cast("double") / F.col("n"))
            / F.nullif(F.col("k") - 1, F.lit(0))
        ).alias("m0"),
    )
    msb = F.col("ssb") / F.nullif(F.col("k") - 1, F.lit(0))
    msw = F.col("ssw") / F.nullif(F.col("n") - F.col("k"), F.lit(0))
    icc = (msb - msw) / F.nullif(msb + (F.col("m0") - 1) * msw, F.lit(0.0))
    return comp.select(
        F.col("k").alias("n_clusters"),
        F.col("n").alias("n_events"),
        dround("m0", 6).alias("m0"),
        dround(msb / 10000, 6).alias("msb"),
        dround(msw / 10000, 6).alias("msw"),
        dround(icc, 6).alias("icc"),
        dround(1 + (F.col("m0") - 1) * icc, 6).alias("design_effect"),
    )


# ---------------------------------------------------------------------------
# q474 Cramer's V association strength
#
# The normalized effect size for categorical association (Cramer
# 1946) — the chi-square tests elsewhere in the registry say
# "dependent or not"; V says HOW MUCH, on [0,1], comparably across
# tables of different shape. chi2 = N * (sum o^2/(r c) - 1), the
# contingency identity, so only one grid-rounded term family floats.


@register(
    "q474_cramers_v",
    category="analytics-stats (regression/tests/causal)",
    oracle="""
    WITH cells AS (
      SELECT lang AS a, source AS b, CAST(COUNT(*) AS BIGINT) AS o
      FROM documents GROUP BY lang, source
    ),
    rows_ AS (
      SELECT a, CAST(SUM(o) AS BIGINT) AS ra FROM cells GROUP BY a
    ),
    cols_ AS (
      SELECT b, CAST(SUM(o) AS BIGINT) AS cb FROM cells GROUP BY b
    ),
    tot AS (
      SELECT CAST(SUM(o) AS BIGINT) AS n,
             CAST(COUNT(DISTINCT a) AS BIGINT) AS r,
             CAST(COUNT(DISTINCT b) AS BIGINT) AS c
      FROM cells
    ),
    terms AS (
      SELECT CAST(SUM(CAST((FLOOR(CAST(CAST(e.o AS DOUBLE) * e.o
                  / (r1.ra * CAST(c1.cb AS DOUBLE)) AS DOUBLE) * 1000000000.0 + 0.5) / 1000000000.0)
                AS DECIMAL(38,9))) AS DOUBLE) AS sum_t
      FROM cells e JOIN rows_ r1 USING (a) JOIN cols_ c1 USING (b)
    )
    SELECT t.n, t.r, t.c,
           (FLOOR(CAST(t.n * (x.sum_t - 1) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS chi2,
           (FLOOR(CAST(SQRT(GREATEST(x.sum_t - 1, 0)
                 / NULLIF(LEAST(t.r - 1, t.c - 1), 0)) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS cramers_v
    FROM tot t, terms x
    """,
)
def q474_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramer's V between document language and source (Cramer
    1946): the [0,1]-normalized categorical association strength —
    chi2 via the contingency identity N*(sum o^2/(r_a c_b) - 1) and
    V = sqrt(chi2 / (N min(r-1, c-1))) = sqrt((sum_t - 1) /
    min(r-1, c-1)). The effect-SIZE companion to the registry's
    chi-square-style dependence tests (q332 mutual information
    measures the same thing in bits; V is the bounded comparable
    form).

    Determinism: all marginals are exact BIGINTs; the only float
    family is o^2/(ra*cb), grid-rounded at 1e-9 before the exact
    DECIMAL sum; GREATEST(.,0) clamps the tiny negative the grid
    can leave on perfectly independent tables; NULLIF guards 1xC /
    Rx1 tables.

    Scale: one (a,b)-grain aggregate plus two marginal reductions —
    all map-side combinable; the term join runs at cell grain
    (r x c rows).
    """
    cells = (
        t(spark, sf_dir, "documents")
        .groupBy(F.col("lang").alias("a"), F.col("source").alias("b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
    )
    rows_ = cells.groupBy("a").agg(F.sum("o").cast("bigint").alias("ra"))
    cols_ = cells.groupBy("b").agg(F.sum("o").cast("bigint").alias("cb"))
    tot = cells.agg(
        F.sum("o").cast("bigint").alias("n"),
        F.countDistinct("a").cast("bigint").alias("r"),
        F.countDistinct("b").cast("bigint").alias("c"),
    )
    terms = (
        cells.join(F.broadcast(rows_), "a")
        .join(F.broadcast(cols_), "b")
        .agg(
            F.sum(
                dround(
                    F.col("o").cast("double")
                    * F.col("o")
                    / (F.col("ra") * F.col("cb").cast("double")),
                    9,
                ).cast("decimal(38,9)")
            )
            .cast("double")
            .alias("sum_t")
        )
    )
    return tot.crossJoin(F.broadcast(terms)).select(
        "n",
        "r",
        "c",
        dround(F.col("n") * (F.col("sum_t") - 1), 6).alias("chi2"),
        dround(
            F.sqrt(
                F.greatest(F.col("sum_t") - 1, F.lit(0.0))
                / F.nullif(
                    F.least(F.col("r") - 1, F.col("c") - 1), F.lit(0)
                )
            ),
            6,
        ).alias("cramers_v"),
    )


# ---------------------------------------------------------------------------
# q475 one-sample Kolmogorov-Smirnov: are inter-arrival gaps
# exponential?
#
# The one-sample sibling of q352's two-sample KS: fit lambda =
# 1/mean to the event inter-arrival gaps and test the empirical CDF
# against Exponential(lambda) — the Poisson-process sanity check
# every traffic model starts with. D uses both one-sided gaps at
# each order statistic (the correct discrete-vs-continuous form).


@register(
    "q475_ks_exponential_arrivals",
    category="events-temporal",
    oracle="""
    WITH seq AS (
      SELECT CAST(floor(epoch(ts)) AS BIGINT) AS sec, event_id
      FROM events
    ),
    gaps AS (
      SELECT sec - LAG(sec) OVER (ORDER BY sec, event_id) AS gap
      FROM seq
    ),
    g AS (SELECT gap FROM gaps WHERE gap IS NOT NULL),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(gap) AS BIGINT) AS s
      FROM g
    ),
    ranked AS (
      SELECT gap, CAST(ROW_NUMBER() OVER (ORDER BY gap) AS BIGINT)
               AS rk
      FROM g
    ),
    scored AS (
      SELECT r.rk, r.gap, m.n,
             1 - EXP(-CAST(r.gap AS DOUBLE) * m.n / NULLIF(m.s, 0)) AS fx
      FROM ranked r, m
    ),
    d AS (
      SELECT MAX((FLOOR(CAST(GREATEST(
               ABS(CAST(rk AS DOUBLE) / n - fx),
               ABS((CAST(rk AS DOUBLE) - 1) / n - fx)) AS DOUBLE) * 1000000000.0 + 0.5) / 1000000000.0)) AS d_stat
      FROM scored
    )
    SELECT m.n AS n_gaps,
           CAST(m.s AS DOUBLE) / NULLIF(m.n, 0) AS mean_gap_sec,
           (FLOOR(CAST(d.d_stat AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS d_stat,
           (FLOOR(CAST(SQRT(CAST(m.n AS DOUBLE)) * d.d_stat AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS sqrt_n_d,
           COALESCE(SQRT(CAST(m.n AS DOUBLE)) * d.d_stat > 1.358,
                    FALSE) AS reject_exponential_05
    FROM m, d
    """,
)
def q475_ks_exponential_arrivals(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One-sample Kolmogorov-Smirnov test of event inter-arrival
    gaps against Exponential(1/mean) — the Poisson-process check
    every traffic/queueing model starts with, and the one-sample
    sibling of q352's two-sample KS. D takes the max of BOTH
    one-sided gaps at each order statistic (the correct
    discrete-vs-continuous form); sqrt(n)*D > 1.358 rejects at 5%.

    Determinism: gaps are exact integer seconds over the proven
    (sec, event_id) total order; the fitted CDF uses
    exp(-gap*n/s) on identical integer-ratio operands (exp rides
    the q261 ROUND convention — each per-row deviation rounds at
    1e-9 before the MAX, which is order-free); ties in gap values
    contribute the same {i} rank set regardless of tie order, so D
    is tie-safe.

    Scale: gaps come from DAY-partitioned lags + boundary stitching
    over the bounded day-grain aggregate (no global-order window
    ever sees the event stream), and D evaluates at gap-VALUE grain
    via the tie-group endpoint rule; everything after is scalar
    reductions.
    """
    # r6 scale fix #1 (the docstring's own commitment): gaps come
    # from DAY-partitioned lags plus boundary stitching — each day's
    # in-day gaps run in parallel, and the cross-day boundary gaps
    # (next day's first sec minus this day's last sec) come from a
    # lag over the bounded day-grain aggregate.  The gap multiset is
    # identical to the global (sec, event_id)-ordered lag: within a
    # tied-sec run every gap is 0 regardless of event_id order, and
    # day boundaries partition the sorted sec sequence.
    seq = t(spark, sf_dir, "events").select(
        F.unix_timestamp("ts").cast("bigint").alias("sec"), "event_id"
    ).withColumn("day", F.expr("sec DIV 86400"))
    wd = Window.partitionBy("day").orderBy("sec", "event_id")
    in_day = (
        seq.select((F.col("sec") - F.lag("sec").over(wd)).alias("gap"))
        .filter(F.col("gap").isNotNull())
    )
    days = seq.groupBy("day").agg(
        F.min("sec").alias("fsec"), F.max("sec").alias("lsec")
    )
    wdy = Window.orderBy("day")
    bnd = (
        days.select(
            (F.col("fsec") - F.lag("lsec").over(wdy)).alias("gap")
        )
        .filter(F.col("gap").isNotNull())
    )
    g = in_day.unionByName(bnd)
    m = g.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("gap").cast("bigint").alias("s"),
    )
    # r6 scale fix #2: the per-gap rank window is replaced by the
    # gap-VALUE-grain endpoint evaluation.  For a tie group occupying
    # ranks (lo, lo+c] the oracle's per-rank deviations sweep the
    # grid {lo..lo+c}/n against the SAME fx, and |t - fx| over that
    # set is maximized at the endpoints — so max-of-rounded per-rank
    # terms equals round(greatest(|lo/n - fx|, |(lo+c)/n - fx|), 9)
    # (round is monotone).  Gap seconds are a bounded grain, so the
    # cumulative-count window runs over the small distinct-gap table.
    gc = g.groupBy("gap").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wg = Window.orderBy("gap").rowsBetween(Window.unboundedPreceding, -1)
    gl = gc.select(
        "gap",
        "c",
        F.coalesce(F.sum("c").over(wg), F.lit(0))
        .cast("bigint")
        .alias("lo"),
    )
    scored = gl.crossJoin(F.broadcast(m)).withColumn(
        "fx",
        F.lit(1)
        - F.exp(
            -F.col("gap").cast("double") * F.col("n")
            / F.nullif(F.col("s"), F.lit(0))
        ),
    )
    d = scored.agg(
        F.max(
            dround(
                F.greatest(
                    F.abs(
                        F.col("lo").cast("double") / F.col("n")
                        - F.col("fx")
                    ),
                    F.abs(
                        (F.col("lo") + F.col("c")).cast("double")
                        / F.col("n")
                        - F.col("fx")
                    ),
                ),
                9,
            )
        ).alias("d_stat")
    )
    return m.crossJoin(F.broadcast(d)).select(
        F.col("n").alias("n_gaps"),
        (F.col("s").cast("double") / F.nullif(F.col("n"), F.lit(0))).alias(
            "mean_gap_sec"
        ),
        dround("d_stat", 6).alias("d_stat"),
        dround(
            F.sqrt(F.col("n").cast("double")) * F.col("d_stat"), 6
        ).alias("sqrt_n_d"),
        F.coalesce(
            F.sqrt(F.col("n").cast("double")) * F.col("d_stat") > 1.358,
            F.lit(False),
        ).alias("reject_exponential_05"),
    )


# ---------------------------------------------------------------------------
# q476 MinHash-LSH parameter planner (the S-curve, data-weighted)
#
# THE dedup tuning table (Leskovec/Rajaraman/Ullman, MMDS ch.3):
# for each (rows r, bands b), collision probability p(s) =
# 1 - (1 - s^r)^b. Rather than the textbook's uniform similarity
# axis, the expected FP/FN mass is weighted by the CORPUS's OWN
# pair-similarity histogram, measured exactly on a hash-sampled doc
# subset. All powers are computed by repeated-squaring chains
# (generated once, handed verbatim to both engines) — no libm pow.

LSH_TAU = 0.5  # dedup threshold the plan must serve
LSH_BINS = 20
LSH_SAMPLE_MOD = 12  # ~8% of docs measured exactly
LSH_GRID = [(2, 4), (2, 8), (2, 16), (4, 4), (4, 8), (4, 16), (4, 32),
            (8, 8), (8, 16)]  # (rows r, bands b)


def _sq_chain(expr: str, e: int) -> str:
    """x^e for power-of-two e via repeated squaring — identical
    float op sequence on both engines, no libm pow()."""
    while e > 1:
        expr = f"({expr} * {expr})"
        e //= 2
    return expr


def _lsh_p_case() -> str:
    """CASE expression for p = 1 - (1 - s_mid^r)^b over the grid."""
    branches = []
    for r, b in LSH_GRID:
        sr = _sq_chain("s_mid", r)
        p = f"1.0 - {_sq_chain(f'(1.0 - {sr})', b)}"
        branches.append(f"WHEN r = {r} AND b = {b} THEN {p}")
    return "CASE " + " ".join(branches) + " END"


@register(
    "q476_lsh_parameter_planner",
    category="llm-dedup",
    oracle=f"""
    WITH sample AS (
      SELECT doc_id, string_split(text, ' ') AS w
      FROM documents
      WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)
              || '|lshp'), 1, 13)) AS BIGINT) % {LSH_SAMPLE_MOD} = 0
        AND len(string_split(text, ' ')) >= 3
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS tri
      FROM (
        SELECT doc_id, w, UNNEST(generate_series(1, len(w) - 2)) AS i
        FROM sample
      )
    ),
    sizes AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nsh
      FROM sh GROUP BY doc_id
    ),
    ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM sizes),
    inter AS (
      SELECT a.doc_id AS da, b.doc_id AS db,
             CAST(COUNT(*) AS BIGINT) AS isz
      FROM sh a JOIN sh b ON b.tri = a.tri AND b.doc_id > a.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    binned AS (
      SELECT LEAST((i.isz * {LSH_BINS})
                   // (sa.nsh + sb.nsh - i.isz),
                   {LSH_BINS - 1}) AS bin,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM inter i
      JOIN sizes sa ON sa.doc_id = i.da
      JOIN sizes sb ON sb.doc_id = i.db
      GROUP BY 1
    ),
    spine AS (
      SELECT UNNEST(generate_series(0, {LSH_BINS - 1})) AS bin
    ),
    weights AS (
      SELECT s.bin,
             COALESCE(b.w, 0)
               + CASE WHEN s.bin = 0 THEN
                   (SELECT n_docs * (n_docs - 1) // 2 FROM ns)
                   - (SELECT COALESCE(SUM(w), 0) FROM binned)
                 ELSE 0 END AS w,
             (s.bin + 0.5) / {LSH_BINS} AS s_mid
      FROM spine s LEFT JOIN binned b ON b.bin = s.bin
    ),
    grid AS (
      SELECT UNNEST([{", ".join(f"{r}" for r, b in LSH_GRID)}]) AS r,
             UNNEST([{", ".join(f"{b}" for r, b in LSH_GRID)}]) AS b
    ),
    curve AS (
      SELECT g.r, g.b, w.bin, w.w, w.s_mid,
             {_lsh_p_case()} AS p
      FROM grid g CROSS JOIN weights w
    ),
    masses AS (
      SELECT r, b,
             CAST(SUM(CAST((FLOOR(CAST(CASE WHEN s_mid < {LSH_TAU}
                  THEN w * p ELSE 0 END AS DOUBLE) * 1000000000.0 + 0.5) / 1000000000.0) AS DECIMAL(38,9)))
                  AS DOUBLE) AS exp_fp,
             CAST(SUM(CAST((FLOOR(CAST(CASE WHEN s_mid >= {LSH_TAU}
                  THEN w * (1 - p) ELSE 0 END AS DOUBLE) * 1000000000.0 + 0.5) / 1000000000.0) AS DECIMAL(38,9)))
                  AS DOUBLE) AS exp_fn
      FROM curve GROUP BY r, b
    )
    SELECT CAST(r AS BIGINT) AS rows_per_band,
           CAST(b AS BIGINT) AS bands,
           CAST(r * b AS BIGINT) AS signature_len,
           (FLOOR(CAST(exp_fp AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS exp_fp,
           (FLOOR(CAST(exp_fn AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS exp_fn,
           (FLOOR(CAST(exp_fp + exp_fn AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS exp_cost,
           CAST(ROW_NUMBER() OVER (
             ORDER BY (FLOOR(CAST(exp_fp + exp_fn AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) ASC, r * b ASC, b ASC)
             AS BIGINT) AS plan_rank
    FROM masses
    ORDER BY rows_per_band, bands
    """,
)
def q476_lsh_parameter_planner(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MinHash-LSH (bands, rows) planner — the MMDS ch.3 S-curve
    p(s) = 1 - (1 - s^r)^b evaluated for nine (r, b) designs, with
    the FP/FN mass weighted by the CORPUS'S OWN pair-similarity
    histogram (exact trigram-shingle Jaccard over an ~8% md5 doc
    sample, {LSH_BINS} bins, zero-overlap pairs folded into bin 0
    by total-pair accounting) against the tau = {LSH_TAU} dedup
    threshold. The tuning table that sizes q62/q71's parameters
    instead of folklore.

    Determinism: the histogram is pure integer arithmetic (bin =
    isz*{LSH_BINS} DIV union, exact C(n,2) bin-0 fold); every power
    in the S-curve is a repeated-squaring chain GENERATED ONCE and
    handed verbatim to both engines (no libm pow), so p values are
    bit-identical; mass terms grid at 1e-9 before exact DECIMAL
    sums; the plan rank orders by rounded cost with signature-length
    and band tie-breaks.

    Scale: the exact-Jaccard measurement runs only on the hash
    sample (pairs sharing >=1 shingle via a shingle-grain join —
    never an all-pairs product); the curve math is 180 rows.
    """
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("|lshp"))),
            1,
            13,
        ),
        16,
        10,
    ).cast("bigint")
    sample = docs.filter(h % LSH_SAMPLE_MOD == 0).select(
        "doc_id", F.split("text", " ").alias("w")
    ).filter(F.size("w") >= 3)
    sh = (
        sample.select(
            "doc_id",
            F.posexplode(F.expr("slice(w, 1, size(w) - 2)")).alias(
                "i0", "w1"
            ),
            "w",
        )
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                F.col("w1"),
                F.expr("w[i0 + 1]"),
                F.expr("w[i0 + 2]"),
            ).alias("tri"),
        )
        .distinct()
    )
    sizes = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("nsh")
    )
    ns = sizes.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    a = sh.select(F.col("doc_id").alias("da"), "tri")
    b_ = sh.select(F.col("doc_id").alias("db"), "tri")
    inter = (
        a.join(b_, "tri")
        .filter(F.col("db") > F.col("da"))
        .groupBy("da", "db")
        .agg(F.count(F.lit(1)).cast("bigint").alias("isz"))
    )
    # sizes is doc-grain over the SAMPLE — a fraction of the corpus,
    # not a bounded cap, so NO broadcast hint (the r5 audit rule);
    # AQE picks the strategy at runtime
    binned = (
        inter.join(
            sizes.select(F.col("doc_id").alias("da"),
                         F.col("nsh").alias("na")), "da"
        )
        .join(
            sizes.select(F.col("doc_id").alias("db"),
                         F.col("nsh").alias("nb")), "db"
        )
        .select(
            F.least(
                F.expr(f"(isz * {LSH_BINS}) DIV (na + nb - isz)"),
                F.lit(LSH_BINS - 1),
            ).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    )
    covered = binned.agg(
        F.coalesce(F.sum("w"), F.lit(0)).cast("bigint").alias("wsum")
    )
    spine = spark.createDataFrame(
        [(i,) for i in range(LSH_BINS)], "bin int"
    )
    weights = (
        spine.join(F.broadcast(binned), "bin", "left")
        .crossJoin(F.broadcast(ns))
        .crossJoin(F.broadcast(covered))
        .select(
            "bin",
            (
                F.coalesce(F.col("w"), F.lit(0))
                + F.when(
                    F.col("bin") == 0,
                    F.expr("n_docs * (n_docs - 1) DIV 2") - F.col("wsum"),
                ).otherwise(0)
            ).alias("w"),
            ((F.col("bin") + 0.5) / LSH_BINS).alias("s_mid"),
        )
    )
    grid = spark.createDataFrame(LSH_GRID, "r int, b int")
    curve = (
        grid.crossJoin(F.broadcast(weights))
        .withColumn("p", F.expr(_lsh_p_case()))
    )
    masses = curve.groupBy("r", "b").agg(
        F.sum(
            dround(
                F.when(
                    F.col("s_mid") < LSH_TAU, F.col("w") * F.col("p")
                ).otherwise(0.0),
                9,
            ).cast("decimal(38,9)")
        )
        .cast("double")
        .alias("exp_fp"),
        F.sum(
            dround(
                F.when(
                    F.col("s_mid") >= LSH_TAU,
                    F.col("w") * (1 - F.col("p")),
                ).otherwise(0.0),
                9,
            ).cast("decimal(38,9)")
        )
        .cast("double")
        .alias("exp_fn"),
    )
    return masses.select(
        F.col("r").cast("bigint").alias("rows_per_band"),
        F.col("b").cast("bigint").alias("bands"),
        (F.col("r") * F.col("b")).cast("bigint").alias("signature_len"),
        dround("exp_fp", 6).alias("exp_fp"),
        dround("exp_fn", 6).alias("exp_fn"),
        dround(F.col("exp_fp") + F.col("exp_fn"), 6).alias("exp_cost"),
        F.row_number()
        .over(
            Window.orderBy(
                dround(F.col("exp_fp") + F.col("exp_fn"), 6).asc(),
                (F.col("r") * F.col("b")).asc(),
                F.col("b").asc(),
            )
        )
        .cast("bigint")
        .alias("plan_rank"),
    ).orderBy("rows_per_band", "bands")


# ---------------------------------------------------------------------------
# q477 A/B sample-size & minimum-detectable-effect calculator
#
# The pre-experiment arithmetic (two-proportion z approximation)
# every experimentation platform runs before launch, parameterized
# by the CORPUS's observed conversion rate: what lift can the
# current traffic detect at alpha=.05 / power=.8, and how many
# users per arm would a 10% relative lift need? Complements the
# registry's post-hoc shelf (q234 CUPED, q298 SPRT, q266 Wilson).

PWR_Z_A = 1.959963984540054  # z_{0.975}
PWR_Z_B = 0.8416212335729143  # z_{0.80}
PWR_REL_LIFT = 0.10


@register(
    "q477_power_mde_calculator",
    category="analytics-stats (regression/tests/causal)",
    oracle=f"""
    WITH users AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id
    ),
    base AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(converted) AS BIGINT) AS n_conv
      FROM users
    ),
    calc AS (
      SELECT n_users, n_conv,
             CAST(n_conv AS DOUBLE) / n_users AS p,
             CAST(n_users AS BIGINT) // 2 AS n_arm
      FROM base
    )
    SELECT n_users, n_conv,
           (FLOOR(CAST(p AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS conversion_rate,
           n_arm,
           (FLOOR(CAST(({PWR_Z_A} + {PWR_Z_B})
                 * SQRT(2 * p * (1 - p) / NULLIF(n_arm, 0)) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS mde_abs,
           (FLOOR(CAST(({PWR_Z_A} + {PWR_Z_B})
                 * SQRT(2 * p * (1 - p) / NULLIF(n_arm, 0))
                 / NULLIF(p, 0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS mde_rel,
           CAST(CEIL(({PWR_Z_A} + {PWR_Z_B}) * ({PWR_Z_A} + {PWR_Z_B})
                 * (p * (1 - p)
                    + (p * {1 + PWR_REL_LIFT})
                      * (1 - p * {1 + PWR_REL_LIFT}))
                 / NULLIF((p * {PWR_REL_LIFT}) * (p * {PWR_REL_LIFT}),
                          0)) AS BIGINT)
             AS n_per_arm_for_10pct_lift
    FROM calc
    """,
)
def q477_power_mde_calculator(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two-proportion power arithmetic on the corpus's OWN
    conversion rate (user-grain purchase conversion): the minimum
    detectable effect at alpha=.05/power=.8 for the current traffic
    split into two arms, and the users-per-arm a {PWR_REL_LIFT:.0%}
    relative lift would need — the pre-experiment calculator beside
    the registry's in-flight (q298 SPRT) and post-hoc (q234 CUPED,
    q266 Wilson) experimentation ops.

    Determinism: conversion counts are exact integers; z quantiles
    are shared literals; every float is the same expression over
    identical operands (sqrt is IEEE-exact), ROUND-6 at the
    boundary; CEIL runs on identical doubles; NULLIF guards the
    empty/zero-rate corners.

    Scale: one map-side-combinable user aggregate and one scalar
    row.
    """
    users = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted")
        )
    )
    base = users.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_conv"),
    )
    p = F.col("n_conv").cast("double") / F.col("n_users")
    n_arm = F.expr("n_users DIV 2")
    z = PWR_Z_A + PWR_Z_B
    mde = F.lit(z) * F.sqrt(
        2 * p * (1 - p) / F.nullif(n_arm, F.lit(0))
    )
    p2 = p * (1 + PWR_REL_LIFT)
    return base.select(
        "n_users",
        "n_conv",
        dround(p, 6).alias("conversion_rate"),
        n_arm.cast("bigint").alias("n_arm"),
        dround(mde, 6).alias("mde_abs"),
        dround(mde / F.nullif(p, F.lit(0.0)), 6).alias("mde_rel"),
        F.ceil(
            F.lit(z * z)
            * (p * (1 - p) + p2 * (1 - p2))
            / F.nullif(
                (p * PWR_REL_LIFT) * (p * PWR_REL_LIFT), F.lit(0.0)
            )
        )
        .cast("bigint")
        .alias("n_per_arm_for_10pct_lift"),
    )


# ---------------------------------------------------------------------------
# q478 quantile treatment effects
#
# The distributional readout the average treatment effect (q326)
# flattens: at each decile, the difference between the treatment
# and control groups' EXACT order statistics — where in the outcome
# distribution the effect lives (Doksum 1974). Hash-assigned arms;
# the repo's explicit value[FLOOR((n-1)p)] order-statistic rule.


@register(
    "q478_quantile_treatment_effects",
    category="analytics-stats (regression/tests/causal)",
    oracle="""
    WITH outcomes AS (
      SELECT user_id, user_id % 2 = 0 AS treated,
             CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS cents
      FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT treated, cents,
             ROW_NUMBER() OVER (PARTITION BY treated
                                ORDER BY cents) AS rk,
             COUNT(*) OVER (PARTITION BY treated) AS n
      FROM outcomes
    ),
    deciles AS (
      SELECT UNNEST(generate_series(1, 9)) AS decile
    ),
    qs AS (
      SELECT d.decile, r.treated, r.cents
      FROM deciles d
      JOIN ranked r
        ON r.rk = ((r.n - 1) * d.decile) // 10 + 1
    )
    SELECT t.decile,
           CAST(t.cents AS DOUBLE) / 100 AS q_treated,
           CAST(c.cents AS DOUBLE) / 100 AS q_control,
           CAST(t.cents - c.cents AS DOUBLE) / 100 AS qte
    FROM (SELECT decile, cents FROM qs WHERE treated) t
    JOIN (SELECT decile, cents FROM qs WHERE NOT treated) c
      USING (decile)
    ORDER BY t.decile
    """,
)
def q478_quantile_treatment_effects(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quantile treatment effects (Doksum 1974): per decile, the
    difference between the treatment (even user_id) and control
    arms' EXACT order statistics of per-user spend — the
    distributional effect profile that q326's single ATE number
    flattens (an effect concentrated in the top decile looks
    identical to a uniform shift on average).

    Determinism: outcomes are exact BIGINT cents; each quantile is
    the explicit value[FLOOR((n-1)p)] order statistic via pure
    integer rank arithmetic (((n-1)*k) DIV 10 + 1) — the q441
    convention — so every output is an exact integer ratio; rank
    ties collapse on equal values.

    Scale: one user-grain aggregate, one per-arm sort window (two
    partitions — at 100 TB swap in q444's bucket refinement per
    arm), a 9-row decile join.
    """
    outcomes = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents")
        )
        .select(
            (F.col("user_id") % 2 == 0).alias("treated"), "cents"
        )
    )
    wt = Window.partitionBy("treated").orderBy("cents")
    ranked = outcomes.select(
        "treated",
        "cents",
        F.row_number().over(wt).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("treated")).alias("n"),
    )
    deciles = spark.createDataFrame([(i,) for i in range(1, 10)], "decile int")
    qs = ranked.join(
        F.broadcast(deciles),
        F.col("rk") == F.expr("((n - 1) * decile) DIV 10 + 1"),
    ).select("decile", "treated", "cents")
    tr = qs.filter(F.col("treated")).select(
        "decile", F.col("cents").alias("tc")
    )
    ct = qs.filter(~F.col("treated")).select(
        "decile", F.col("cents").alias("cc")
    )
    return (
        tr.join(ct, "decile")
        .select(
            "decile",
            (F.col("tc").cast("double") / 100).alias("q_treated"),
            (F.col("cc").cast("double") / 100).alias("q_control"),
            ((F.col("tc") - F.col("cc")).cast("double") / 100).alias("qte"),
        )
        .orderBy("decile")
    )


# ---------------------------------------------------------------------------
# q479 k-core decomposition (bounded peeling)
#
# The graph-pruning standard (Seidman 1983): iteratively peel nodes
# of degree < k until fixed point — the community-detection /
# spam-filter preprocessing step beside the registry's PageRank
# (q407), HITS (q319), and label propagation (q406). Six unrolled
# peel rounds over the part co-purchase graph with a support floor;
# convergence certified in-row by comparing the last two rounds.

KCORE_K = 4
KCORE_ROUNDS = 6
KCORE_MIN_SUP = 2  # co-purchase support floor sparsifies the graph


def _kcore_stage_sql(r: int) -> str:
    return f""",
    d{r} AS MATERIALIZED (
      SELECT e.a AS v, CAST(COUNT(*) AS BIGINT) AS deg
      FROM edges e
      JOIN n{r - 1} na ON na.v = e.a
      JOIN n{r - 1} nb ON nb.v = e.b
      GROUP BY e.a
    ),
    n{r} AS MATERIALIZED (
      SELECT v FROM d{r} WHERE deg >= {KCORE_K}
    )"""


@register(
    "q479_kcore_decomposition",
    category="mixed-extensions",
    oracle="""
    WITH pairs AS MATERIALIZED (
      SELECT a.l_partkey AS a, b.l_partkey AS b
      FROM lineitem a JOIN lineitem b
        ON b.l_orderkey = a.l_orderkey AND b.l_partkey <> a.l_partkey
      GROUP BY a.l_orderkey, a.l_partkey, b.l_partkey
    ),
    edges AS MATERIALIZED (
      SELECT a, b FROM (
        SELECT a, b, CAST(COUNT(*) AS BIGINT) AS sup
        FROM pairs GROUP BY a, b
      ) WHERE sup >= """ + str(KCORE_MIN_SUP) + """
    ),
    n0 AS MATERIALIZED (SELECT DISTINCT a AS v FROM edges)"""
    + "".join(_kcore_stage_sql(r) for r in range(1, KCORE_ROUNDS + 1))
    + f"""
    , conv AS (
      SELECT (SELECT COUNT(*) FROM n{KCORE_ROUNDS})
             = (SELECT COUNT(*) FROM n{KCORE_ROUNDS - 1}) AS converged
    )
    SELECT d.v AS part, d.deg AS core_degree, c.converged
    FROM d{KCORE_ROUNDS} d
    JOIN n{KCORE_ROUNDS} n ON n.v = d.v, conv c
    ORDER BY d.v
    """,
)
def q479_kcore_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{KCORE_K}-core of the part co-purchase graph (Seidman 1983):
    {KCORE_ROUNDS} unrolled peel rounds of "drop nodes with fewer
    than {KCORE_K} surviving neighbors" over edges = part pairs
    co-purchased in >= {KCORE_MIN_SUP} orders. Emits the surviving
    core members with their within-core degree and an in-row
    convergence certificate (round {KCORE_ROUNDS} == round
    {KCORE_ROUNDS - 1}) — the MEMBERSHIP-grain sibling of q277's
    k-core peeling (which traces per-round survivor COUNTS on the
    supplier co-supply graph): this one answers "which nodes, at
    what final degree, did the peel converge" on the
    support-floored co-PURCHASE graph.

    Determinism: degrees and support are exact integer counts; the
    peel set is a pure threshold — no tie-breaking anywhere; the
    basket pair generator dedups at (order, a, b) grain first so
    duplicate lineitems can't inflate support.

    Scale: the pair expansion is basket-bounded (q417's shape, with
    the support floor sparsifying before any iteration); each peel
    round is one join + partial-aggregated degree count; membership
    frames stay node-grain. The oracle CTEs are MATERIALIZED
    against exponential lineage inlining (the q459 lesson);
    the Spark side localCheckpoints per round (the q64 rule).
    """
    # basket posting lists (r9): groupBy(order).collect_set(part) is
    # simultaneously the per-basket dedup and the pair source — the
    # old basket self-join + (order, a, b)-grain distinct shuffled
    # the pair expansion twice before support counting. Support is
    # symmetric, so count canonical (a < b) pairs once and mirror the
    # surviving edges.
    baskets = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ss"))
    )
    cpairs = baskets.select(
        F.explode(
            F.expr(
                "flatten(transform(ss, (x, i) -> "
                "transform(slice(ss, i + 2, size(ss)), "
                "y -> struct(x AS a, y AS b))))"
            )
        ).alias("e")
    ).select("e.a", "e.b")
    cedges = (
        cpairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("sup"))
        .filter(F.col("sup") >= KCORE_MIN_SUP)
        .select("a", "b")
    )
    edges = (
        cedges.select(
            F.explode(
                F.array(
                    F.struct(F.col("a"), F.col("b")),
                    F.struct(F.col("b").alias("a"), F.col("a").alias("b")),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .localCheckpoint(eager=True)
    )
    nodes = edges.select(F.col("a").alias("v")).distinct()
    deg = None
    prev_nodes = nodes
    for _ in range(KCORE_ROUNDS):
        nodes_a = prev_nodes.select(F.col("v").alias("a"))
        nodes_b = prev_nodes.select(F.col("v").alias("b"))
        deg = (
            edges.join(nodes_a, "a")
            .join(nodes_b, "b")
            .groupBy(F.col("a").alias("v"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
            .localCheckpoint(eager=False)
        )
        new_nodes = deg.filter(F.col("deg") >= KCORE_K).select("v")
        prev_count = prev_nodes
        prev_nodes, last_prev = new_nodes, prev_count
    conv = (
        prev_nodes.agg(F.count(F.lit(1)).alias("c_now"))
        .crossJoin(
            F.broadcast(last_prev.agg(F.count(F.lit(1)).alias("c_prev")))
        )
        .select((F.col("c_now") == F.col("c_prev")).alias("converged"))
    )
    return (
        deg.join(prev_nodes, "v")
        .crossJoin(F.broadcast(conv))
        .select(
            F.col("v").alias("part"),
            F.col("deg").alias("core_degree"),
            "converged",
        )
        .orderBy("part")
    )


# ---------------------------------------------------------------------------
# q480 TextRank keywords
#
# The unsupervised keyword extractor (Mihalcea & Tarau, EMNLP 2004):
# PageRank over the word co-occurrence (adjacency) graph. The
# complement to q360's RAKE (degree/frequency heuristic) — TextRank
# propagates importance through the graph instead of scoring
# locally. Four unrolled weighted-PageRank rounds on the corpus
# bigram graph.

TR_ROUNDS = 4
TR_DAMP_NUM = 85  # damping 0.85 as an exact integer ratio
TR_TOP = 15


def _textrank_stage_sql(r: int) -> str:
    return f""",
    pr{r} AS MATERIALIZED (
      SELECT e.dst AS word,
             FLOOR((0.15 + 0.85 * (CAST(SUM(CAST(FLOOR(
               p.pr * e.w / d.wdeg * 1e9 + 0.5) AS BIGINT))
               AS DOUBLE) / 1e9)) * 1e9 + 0.5) / 1e9 AS pr
      FROM edges e
      JOIN pr{r - 1} p ON p.word = e.src
      JOIN wdeg d ON d.word = e.src
      GROUP BY e.dst
    )"""


@register(
    "q480_textrank_keywords",
    category="llm-text-analysis",
    oracle="""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, string_split(text, ' ') AS w
      FROM documents WHERE len(string_split(text, ' ')) >= 2
    ),
    big AS MATERIALIZED (
      SELECT w[i] AS x, w[i + 1] AS y
      FROM (SELECT doc_id, w,
                   UNNEST(generate_series(1, len(w) - 1)) AS i
            FROM toks)
      WHERE w[i] <> w[i + 1]
    ),
    edges AS MATERIALIZED (
      SELECT src, dst, CAST(SUM(c) AS BIGINT) AS w FROM (
        SELECT x AS src, y AS dst, COUNT(*) AS c FROM big GROUP BY 1, 2
        UNION ALL
        SELECT y AS src, x AS dst, COUNT(*) AS c FROM big GROUP BY 1, 2
      ) GROUP BY src, dst
    ),
    wdeg AS MATERIALIZED (
      SELECT src AS word, CAST(SUM(w) AS BIGINT) AS wdeg
      FROM edges GROUP BY src
    ),
    pr0 AS MATERIALIZED (
      SELECT word, CAST(1.0 AS DOUBLE) AS pr FROM wdeg
    )"""
    + "".join(_textrank_stage_sql(r) for r in range(1, TR_ROUNDS + 1))
    + f"""
    SELECT word, pr AS textrank,
           CAST(ROW_NUMBER() OVER (ORDER BY pr DESC, word ASC)
                AS BIGINT) AS rk
    FROM pr{TR_ROUNDS}
    ORDER BY rk
    LIMIT {TR_TOP}
    """,
)
def q480_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004):
    {TR_ROUNDS} unrolled weighted-PageRank rounds (damping 0.85)
    over the corpus word-adjacency graph — importance PROPAGATES
    through co-occurrence edges, the graph-global complement to
    q360's local RAKE scores. Top-{TR_TOP} words by final rank.

    Determinism: edge weights and weighted degrees are exact
    integer counts; each round's incoming mass terms land on the
    half-up FLOOR(x*1e9+0.5) NANO grid as BIGINTs (exact integer
    sums) and the round's output re-grids the same way — BOTH grid
    points had to be half-up FLOOR, not ROUND: the outer tie was
    caught at sf0.01 and the inner one by the doc hunt;
    the final ranking orders by (pr, word).

    Scale: the bigram edge list aggregates at word-pair grain
    (map-side combinable, vocabulary-bounded); each round is one
    shuffle join at edge grain joined to the word-grain rank frame
    — the q406/q407 iteration shape with the same per-round
    checkpoint rule. Self-loops are dropped (w[i] <> w[i+1]) so
    mass cannot recirculate through repeated tokens.
    """
    docs = t(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("w")
    ).filter(F.size("w") >= 2)
    big = (
        docs.select(
            F.posexplode(F.expr("slice(w, 1, size(w) - 1)")).alias(
                "i0", "x"
            ),
            "w",
        )
        .select("x", F.expr("w[i0 + 1]").alias("y"))
        .filter(F.col("x") != F.col("y"))
    )
    fwd = big.groupBy(
        F.col("x").alias("src"), F.col("y").alias("dst")
    ).agg(F.count(F.lit(1)).alias("c"))
    rev = big.groupBy(
        F.col("y").alias("src"), F.col("x").alias("dst")
    ).agg(F.count(F.lit(1)).alias("c"))
    edges = (
        fwd.unionByName(rev)
        .groupBy("src", "dst")
        .agg(F.sum("c").cast("bigint").alias("w"))
        .localCheckpoint(eager=True)
    )
    wdeg = edges.groupBy(F.col("src").alias("word")).agg(
        F.sum("w").cast("bigint").alias("wdeg")
    )
    pr = wdeg.select("word", F.lit(1.0).alias("pr"))
    ed = edges.join(
        wdeg.select(F.col("word").alias("src"), "wdeg"), "src"
    ).localCheckpoint(eager=True)
    for _ in range(TR_ROUNDS):
        pr = (
            ed.join(
                pr.select(F.col("word").alias("src"), "pr"), "src"
            )
            .groupBy(F.col("dst").alias("word"))
            .agg(
                (
                    F.floor(
                        (
                            F.lit(0.15)
                            + F.lit(0.85)
                            * (
                                F.sum(
                                    F.floor(
                                        F.col("pr")
                                        * F.col("w")
                                        / F.col("wdeg")
                                        * 1e9
                                        + 0.5
                                    ).cast("bigint")
                                ).cast("double")
                                / 1e9
                            )
                        )
                        * 1e9
                        + 0.5
                    )
                    / 1e9
                ).alias("pr")
            )
            .localCheckpoint(eager=False)
        )
    # TakeOrdered-then-rank (r6 scale fix): orderBy+limit compiles to
    # TakeOrderedAndProject (per-partition top-K + driver merge of K
    # rows), so the vocabulary-grain rank table never funnels through
    # a single-task global window; the row_number below runs over the
    # TR_TOP survivors only (bounded grain).
    top = (
        pr.select("word", F.col("pr").alias("textrank"))
        .orderBy(F.col("textrank").desc(), F.col("word").asc())
        .limit(TR_TOP)
    )
    return (
        top.withColumn(
            "rk",
            F.row_number()
            .over(
                Window.orderBy(
                    F.col("textrank").desc(), F.col("word").asc()
                )
            )
            .cast("bigint"),
        )
        .orderBy("rk")
    )


# ---------------------------------------------------------------------------
# q481 association-rule metrics (the second half of Apriori)
#
# q417 mines the frequent itemsets; this derives the RULES: for
# each frequent pair, both directed rules A=>B with confidence,
# lift, leverage, and conviction (Brin et al. 1997) — the four
# metrics every market-basket readout reports. Pure integer
# supports; every metric is an exact-ratio double.

AR_MIN_SUP = 3
AR_TOP = 20


@register(
    "q481_association_rules",
    category="aggregation-advanced (rollup/percentile/sketch/pivot)",
    oracle=f"""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    nb AS (
      SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n
      FROM baskets
    ),
    item AS (
      SELECT l_partkey AS it, CAST(COUNT(*) AS BIGINT) AS sup
      FROM baskets GROUP BY l_partkey
    ),
    pair AS (
      SELECT a.l_partkey AS x, b.l_partkey AS y,
             CAST(COUNT(*) AS BIGINT) AS sup
      FROM baskets a JOIN baskets b
        ON b.l_orderkey = a.l_orderkey AND b.l_partkey > a.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
      HAVING COUNT(*) >= {AR_MIN_SUP}
    ),
    rules AS (
      SELECT x AS ante, y AS cons, sup FROM pair
      UNION ALL
      SELECT y AS ante, x AS cons, sup FROM pair
    ),
    scored AS (
      SELECT r.ante, r.cons, r.sup,
             ia.sup AS sup_a, ic.sup AS sup_c, nb.n,
             CAST(r.sup AS DOUBLE) / ia.sup AS confidence,
             CAST(r.sup AS DOUBLE) * nb.n
               / (ia.sup * CAST(ic.sup AS DOUBLE)) AS lift,
             CAST(r.sup AS DOUBLE) / nb.n
               - (CAST(ia.sup AS DOUBLE) / nb.n)
                 * (CAST(ic.sup AS DOUBLE) / nb.n) AS leverage,
             (1 - CAST(ic.sup AS DOUBLE) / nb.n)
               / NULLIF(1 - CAST(r.sup AS DOUBLE) / ia.sup, 0)
               AS conviction
      FROM rules r
      JOIN item ia ON ia.it = r.ante
      JOIN item ic ON ic.it = r.cons
      CROSS JOIN nb
    )
    SELECT ante, cons, sup AS support,
           (FLOOR(CAST(confidence AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS confidence,
           (FLOOR(CAST(lift AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS lift,
           (FLOOR(CAST(leverage AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS leverage,
           (FLOOR(CAST(conviction AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS conviction
    FROM scored
    ORDER BY (FLOOR(CAST(lift AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) DESC, ante ASC, cons ASC
    LIMIT {AR_TOP}
    """,
)
def q481_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule metrics over co-purchase baskets — the
    second half of Apriori that q417's frequent itemsets feed: both
    directed rules A=>B per frequent pair (support >=
    {AR_MIN_SUP}), scored by confidence, lift, leverage, and
    conviction (Brin et al. 1997). Top-{AR_TOP} by lift with a
    total (ante, cons) order.

    Determinism: all supports are exact integer counts over
    deduplicated (order, part) baskets; every metric is the same
    exact-ratio double expression on both engines (conviction
    NULLIFs the confidence=1 pole); ranking uses the ROUNDED lift.

    Scale: the pair expansion is the within-basket self-join
    (bounded by basket size, q417's shape) with the support floor
    applied in the same aggregate; item supports broadcast-join
    onto rules at pair grain.
    """
    baskets = (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    nb = baskets.agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("n")
    )
    item = baskets.groupBy(F.col("l_partkey").alias("it")).agg(
        F.count(F.lit(1)).cast("bigint").alias("sup")
    )
    a = baskets.alias("a")
    b = baskets.alias("b")
    pair = (
        a.join(b, "l_orderkey")
        .filter(F.col("b.l_partkey") > F.col("a.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("x"),
            F.col("b.l_partkey").alias("y"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("sup"))
        .filter(F.col("sup") >= AR_MIN_SUP)
    )
    rules = pair.select(
        F.col("x").alias("ante"), F.col("y").alias("cons"), "sup"
    ).unionByName(
        pair.select(
            F.col("y").alias("ante"), F.col("x").alias("cons"), "sup"
        )
    )
    scored = (
        rules.join(
            item.select(F.col("it").alias("ante"), F.col("sup").alias("sup_a")),
            "ante",
        )
        .join(
            item.select(F.col("it").alias("cons"), F.col("sup").alias("sup_c")),
            "cons",
        )
        .crossJoin(F.broadcast(nb))
    )
    conf = F.col("sup").cast("double") / F.col("sup_a")
    lift = (
        F.col("sup").cast("double")
        * F.col("n")
        / (F.col("sup_a") * F.col("sup_c").cast("double"))
    )
    return (
        scored.select(
            "ante",
            "cons",
            F.col("sup").alias("support"),
            dround(conf, 6).alias("confidence"),
            dround(lift, 6).alias("lift"),
            dround(
                F.col("sup").cast("double") / F.col("n")
                - (F.col("sup_a").cast("double") / F.col("n"))
                * (F.col("sup_c").cast("double") / F.col("n")),
                6,
            ).alias("leverage"),
            dround(
                (1 - F.col("sup_c").cast("double") / F.col("n"))
                / F.nullif(F.lit(1) - conf, F.lit(0.0)),
                6,
            ).alias("conviction"),
        )
        .orderBy(
            dround(lift, 6).desc(), F.col("ante").asc(), F.col("cons").asc()
        )
        .limit(AR_TOP)
    )


# ---------------------------------------------------------------------------
# q482 greedy set cover (corpus selection by coverage)
#
# Chvatal's ln(n)-approximate greedy for SET COVER: pick the
# document covering the most still-uncovered trigram types, repeat.
# The discrete sibling of q459's facility location (which maximizes
# a SUM of similarities; set cover maximizes coverage of a type
# UNIVERSE) — the "smallest eval set that exercises every feature"
# selection primitive.

SC_ROUNDS = 6


def _sc_stage_sql(r: int) -> str:
    prev_picks = " UNION ALL ".join(
        f"SELECT doc_id FROM p{i}" for i in range(1, r)
    )
    not_in = (
        f"AND s.doc_id NOT IN ({prev_picks})" if r > 1 else ""
    )
    return f""",
    g{r} AS MATERIALIZED (
      SELECT s.doc_id, CAST(COUNT(*) AS BIGINT) AS gain
      FROM sh s LEFT JOIN cov{r - 1} c ON c.tri = s.tri
      WHERE c.tri IS NULL {not_in}
      GROUP BY s.doc_id
    ),
    p{r} AS MATERIALIZED (
      SELECT doc_id, gain FROM g{r}
      ORDER BY gain DESC, doc_id ASC LIMIT 1
    ),
    cov{r} AS MATERIALIZED (
      SELECT tri FROM cov{r - 1}
      UNION
      SELECT s.tri FROM sh s
      WHERE s.doc_id = (SELECT doc_id FROM p{r})
    )"""


@register(
    "q482_greedy_set_cover",
    category="llm-corpus-pipeline",
    oracle="""
    WITH toks AS MATERIALIZED (
      SELECT doc_id, string_split(text, ' ') AS w
      FROM documents WHERE len(string_split(text, ' ')) >= 3
    ),
    sh AS MATERIALIZED (
      SELECT DISTINCT doc_id,
             w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS tri
      FROM (SELECT doc_id, w,
                   UNNEST(generate_series(1, len(w) - 2)) AS i
            FROM toks)
    ),
    uni AS MATERIALIZED (
      SELECT CAST(COUNT(DISTINCT tri) AS BIGINT) AS n_types FROM sh
    ),
    cov0 AS MATERIALIZED (
      SELECT tri FROM sh WHERE 1 = 0
    )"""
    + "".join(_sc_stage_sql(r) for r in range(1, SC_ROUNDS + 1))
    + f"""
    SELECT * FROM (
    {" UNION ALL ".join(
        f'''SELECT CAST({r} AS BIGINT) AS round_idx,
               p{r}.doc_id AS picked_doc, p{r}.gain,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM cov{r})
                 AS covered_types,
               (2000000 * (SELECT COUNT(*) FROM cov{r})
                + (SELECT n_types FROM uni))
                 // (2 * (SELECT n_types FROM uni)) AS coverage_micro
            FROM p{r}''' for r in range(1, SC_ROUNDS + 1))}
    ) ORDER BY round_idx
    """,
)
def q482_greedy_set_cover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy set cover over the corpus (Chvatal 1979, the ln(n)
    approximation): {SC_ROUNDS} rounds of "pick the document whose
    trigram types cover the most still-uncovered universe" — the
    coverage-universe sibling of q459's facility location and the
    primitive behind minimal-eval-set / test-suite-reduction
    selection. Emits each pick's marginal gain and the running
    coverage share on a half-up 1e-6 integer grid.

    Determinism: gains are exact integer counts over DISTINCT
    (doc, trigram) pairs; the argmax carries a doc_id tie-break;
    coverage share is pure integer DIV arithmetic — no floats
    anywhere in the loop.

    Scale: the (doc, type) bipartite frame is computed ONCE and
    checkpointed; each round is one anti-join + count + 1-row
    TakeOrdered, with the covered-type state growing by one doc's
    types per round (type-grain, never broadcast — the universe is
    corpus-sized). The oracle's recursive lineage is MATERIALIZED
    (the q459 lesson).
    """
    docs = t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("w")
    ).filter(F.size("w") >= 3)
    sh = (
        docs.select(
            "doc_id",
            F.posexplode(F.expr("slice(w, 1, size(w) - 2)")).alias(
                "i0", "w1"
            ),
            "w",
        )
        .select(
            "doc_id",
            F.concat_ws(
                " ", F.col("w1"), F.expr("w[i0 + 1]"), F.expr("w[i0 + 2]")
            ).alias("tri"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    uni = sh.agg(F.countDistinct("tri").cast("bigint").alias("n_types"))
    covered = None  # type-grain frame of covered tris
    chosen = None
    picks = []
    for r in range(1, SC_ROUNDS + 1):
        pool = sh if chosen is None else sh.join(
            F.broadcast(chosen), "doc_id", "left_anti"
        )
        remaining = pool if covered is None else pool.join(
            covered, "tri", "left_anti"
        )
        g = remaining.groupBy("doc_id").agg(
            F.count(F.lit(1)).cast("bigint").alias("gain")
        )
        p = (
            g.orderBy(F.col("gain").desc(), F.col("doc_id").asc())
            .limit(1)
            .localCheckpoint(eager=True)
        )
        new_types = sh.join(F.broadcast(p.select("doc_id")), "doc_id").select(
            "tri"
        )
        covered = (
            new_types
            if covered is None
            else covered.unionByName(new_types).distinct()
        ).localCheckpoint(eager=False)
        ctot = covered.agg(
            F.count(F.lit(1)).cast("bigint").alias("covered_types")
        )
        picks.append(
            p.crossJoin(F.broadcast(ctot))
            .crossJoin(F.broadcast(uni))
            .select(
                F.lit(r).cast("bigint").alias("round_idx"),
                F.col("doc_id").alias("picked_doc"),
                "gain",
                "covered_types",
                F.expr(
                    "(2000000 * covered_types + n_types) "
                    "DIV (2 * n_types)"
                ).alias("coverage_micro"),
            )
        )
        chosen = (
            p.select("doc_id")
            if chosen is None
            else chosen.unionByName(p.select("doc_id"))
        )
    out = picks[0]
    for pk in picks[1:]:
        out = out.unionByName(pk)
    return out.orderBy("round_idx")


# ---------------------------------------------------------------------------
# q483 ABC-XYZ inventory classification
#
# The operations-planning standard: parts classed A/B/C by
# cumulative revenue share (80/95 cuts, EXACT integer boundary
# arithmetic) crossed with X/Y/Z by demand variability (weekly
# coefficient of variation, 0.5/1.0 cuts) — the 3x3 matrix every
# supply planner starts from.


@register(
    "q483_abc_xyz_classification",
    category="analytics-stats (regression/tests/causal)",
    oracle="""
    WITH part_rev AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * 100)
                  AS BIGINT) AS cents
      FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
      SELECT l_partkey, cents,
             SUM(cents) OVER (ORDER BY cents DESC, l_partkey ASC
                              ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cents) OVER () AS tot
      FROM part_rev
    ),
    abc AS (
      SELECT l_partkey,
             CASE WHEN cum * 100 <= tot * 80 THEN 'A'
                  WHEN cum * 100 <= tot * 95 THEN 'B'
                  ELSE 'C' END AS abc
      FROM ranked
    ),
    weekly AS (
      SELECT l_partkey,
             (CAST(floor(epoch(l_shipdate)) AS BIGINT) // 604800)
               AS wk,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * 100)
                  AS BIGINT) AS qty
      FROM lineitem GROUP BY 1, 2
    ),
    cv AS (
      SELECT l_partkey,
             CAST(COUNT(*) AS BIGINT) AS nw,
             CAST(SUM(qty) AS BIGINT) AS s,
             CAST(SUM(CAST(qty AS DECIMAL(19,0)) * qty)
                  AS DECIMAL(38,0)) AS q
      FROM weekly GROUP BY l_partkey
    ),
    xyz AS (
      SELECT l_partkey,
             CASE WHEN s = 0 OR nw < 2 THEN 'Z'
                  WHEN SQRT((CAST(nw AS DOUBLE) * CAST(q AS DOUBLE)
                        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                       / (CAST(nw AS DOUBLE) * (nw - 1)))
                       * nw / s < 0.5 THEN 'X'
                  WHEN SQRT((CAST(nw AS DOUBLE) * CAST(q AS DOUBLE)
                        - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                       / (CAST(nw AS DOUBLE) * (nw - 1)))
                       * nw / s < 1.0 THEN 'Y'
                  ELSE 'Z' END AS xyz
      FROM cv
    )
    SELECT a.abc, x.xyz,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(p.cents) AS BIGINT) AS revenue_cents,
           CAST((2000000 * SUM(p.cents) + SUM(SUM(p.cents)) OVER ())
             // (2 * SUM(SUM(p.cents)) OVER ()) AS BIGINT)
             AS revenue_share_micro
    FROM abc a
    JOIN xyz x ON x.l_partkey = a.l_partkey
    JOIN part_rev p ON p.l_partkey = a.l_partkey
    GROUP BY a.abc, x.xyz
    ORDER BY a.abc, x.xyz
    """,
)
def q483_abc_xyz_classification(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ABC-XYZ inventory classification — the supply-planning
    standard: A/B/C by cumulative revenue share (parts ranked by
    revenue; A up to 80%, B to 95% — EXACT integer boundary tests
    cum*100 <= tot*80, no float share), crossed with X/Y/Z by the
    coefficient of variation of weekly demand (X < 0.5, Y < 1.0,
    zero-demand/single-week parts -> Z). Emits the 3x3 matrix with
    part counts and revenue share on a half-up integer micro grid.

    Determinism: revenue and weekly quantities are exact BIGINT
    cents (quantity x100); the ABC ranking carries a (cents DESC,
    partkey) total order; CV comes from exact integer moments with
    the sample-variance Bessel denominator and compares on
    identical doubles; week ids are pure integer epoch DIV 604800.

    Scale: two part-grain aggregates (map-side combinable); the
    cumulative-share ranking is RECONSTRUCTED from <=64 exact
    bit-length revenue buckets (in-bucket partitioned cumsums +
    bounded bucket-grain offsets — no single-partition window ever
    sees part-grain data), a 9-row final.
    """
    li = t(spark, sf_dir, "lineitem")
    part_rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents")
    )
    # r6 scale fix (the q242/q444 reconstruction): the cumulative
    # revenue share used to run through ONE task via a global
    # ORDER BY cents window.  The cumsum is now reconstructed from
    # revenue-magnitude buckets: bkt = bit-length of cents (exact
    # integer, monotone in cents, <= 64 buckets at any scale), so
    # bucket DESC order is contiguous with the (cents DESC) ranking.
    # In-bucket cumsums partition by bkt (parallel); the cross-bucket
    # offsets cumulate over the <=64-row bucket aggregate; ties
    # across equal cents values stay inside one bucket so the
    # (cents DESC, l_partkey ASC) total order is preserved exactly.
    bucketed = part_rev.withColumn(
        "bkt", F.length(F.conv(F.col("cents").cast("string"), 10, 2))
    )
    woff = Window.orderBy(F.col("bkt").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = (
        bucketed.groupBy("bkt")
        .agg(F.sum("cents").alias("bsum"))
        .select(
            "bkt",
            F.coalesce(F.sum("bsum").over(woff), F.lit(0)).alias("off"),
        )
    )
    tot_rev = part_rev.agg(F.sum("cents").alias("tot"))
    win_b = Window.partitionBy("bkt").orderBy(
        F.col("cents").desc(), F.col("l_partkey").asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    cum = F.col("off") + F.sum("cents").over(win_b)
    abc = (
        bucketed.join(F.broadcast(offs), "bkt")
        .crossJoin(F.broadcast(tot_rev))
        .select(
            "l_partkey",
            "cents",
            "off",
            "bkt",
            F.when(cum * 100 <= F.col("tot") * 80, F.lit("A"))
            .when(cum * 100 <= F.col("tot") * 95, F.lit("B"))
            .otherwise(F.lit("C"))
            .alias("abc"),
        )
        .select("l_partkey", "abc")
    )
    weekly = li.groupBy(
        "l_partkey",
        (F.unix_timestamp("l_shipdate").cast("bigint") / F.lit(604800))
        .cast("bigint")
        .alias("wk"),
    ).agg(
        F.sum(F.col("l_quantity").cast("decimal(12,2)") * 100)
        .cast("bigint")
        .alias("qty")
    )
    cv = weekly.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("nw"),
        F.sum("qty").cast("bigint").alias("s"),
        F.sum(F.col("qty").cast("decimal(19,0)") * F.col("qty"))
        .cast("decimal(38,0)")
        .alias("q"),
    )
    cv_expr = (
        F.sqrt(
            (
                F.col("nw").cast("double") * F.col("q").cast("double")
                - F.col("s").cast("double") * F.col("s").cast("double")
            )
            / (F.col("nw").cast("double") * (F.col("nw") - 1))
        )
        * F.col("nw")
        / F.col("s")
    )
    xyz = cv.select(
        "l_partkey",
        F.when((F.col("s") == 0) | (F.col("nw") < 2), F.lit("Z"))
        .when(cv_expr < 0.5, F.lit("X"))
        .when(cv_expr < 1.0, F.lit("Y"))
        .otherwise(F.lit("Z"))
        .alias("xyz"),
    )
    joined = abc.join(xyz, "l_partkey").join(part_rev, "l_partkey")
    grouped = joined.groupBy("abc", "xyz").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum("cents").cast("bigint").alias("revenue_cents"),
    )
    return grouped.select(
        "abc",
        "xyz",
        "n_parts",
        "revenue_cents",
        F.expr(
            "(2000000 * revenue_cents + SUM(revenue_cents) OVER ()) "
            "DIV (2 * SUM(revenue_cents) OVER ())"
        ).alias("revenue_share_micro"),
    ).orderBy("abc", "xyz")


# ---------------------------------------------------------------------------
# q484 zone-map (min/max) skipping audit
#
# The data-skipping readout behind every columnar format's row-group
# pruning (ORC/Parquet zone maps; Moerkotte's SMAs): simulate
# 64-row-group min/max indexes on l_shipdate under the table's
# NATURAL (orderkey-clustered) layout vs a shipdate-SORTED layout,
# and measure the scan fraction three range predicates actually
# touch — the quantified argument for sort-on-write that q213's
# Z-order audit makes for two dimensions.

ZM_GROUP = 64
ZM_PREDS = [
    ("1994-01-01", "1994-03-31"),
    ("1996-06-01", "1996-06-30"),
    ("1998-01-01", "1998-12-31"),
]


@register(
    "q484_zonemap_skipping_audit",
    category="mixed-extensions",
    oracle=f"""
    WITH rows_ AS (
      SELECT CAST(l_shipdate AS DATE) AS d,
             l_orderkey, l_linenumber
      FROM lineitem
    ),
    nat AS (
      SELECT 'natural' AS layout,
             CAST(ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber,
                                     d) - 1 AS BIGINT)
               // {ZM_GROUP} AS rg, d
      FROM rows_
    ),
    srt AS (
      SELECT 'sorted' AS layout,
             CAST(ROW_NUMBER() OVER (ORDER BY d, l_orderkey,
                                     l_linenumber) - 1 AS BIGINT)
               // {ZM_GROUP} AS rg, d
      FROM rows_
    ),
    zones AS (
      SELECT layout, rg, MIN(d) AS lo, MAX(d) AS hi
      FROM (SELECT * FROM nat UNION ALL SELECT * FROM srt)
      GROUP BY layout, rg
    ),
    preds AS (
      {" UNION ALL ".join(
        f"SELECT {i} AS pred_id, DATE '{lo}' AS plo, DATE '{hi}' AS phi"
        for i, (lo, hi) in enumerate(ZM_PREDS))}
    )
    SELECT p.pred_id, z.layout,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN z.hi < p.plo OR z.lo > p.phi
                    THEN 1 ELSE 0 END) AS BIGINT) AS skipped,
           CAST((2000000 * SUM(CASE WHEN z.hi < p.plo OR z.lo > p.phi
                          THEN 0 ELSE 1 END) + COUNT(*))
             // (2 * COUNT(*)) AS BIGINT) AS scan_fraction_micro
    FROM zones z CROSS JOIN preds p
    GROUP BY p.pred_id, z.layout
    ORDER BY p.pred_id, z.layout
    """,
)
def q484_zonemap_skipping_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Zone-map data-skipping audit (the ORC/Parquet row-group
    min/max pruning model; Moerkotte's small materialized
    aggregates): simulate {ZM_GROUP}-row-group min/max indexes on
    ``l_shipdate`` under the NATURAL (orderkey-clustered) layout vs
    a shipdate-SORTED layout and measure, for three range
    predicates, how many groups a scan can skip — the quantified
    sort-on-write argument beside q213's two-dimensional Z-order
    audit and q368's layout advisor.

    Determinism: both layouts pin total row orders ((orderkey,
    linenumber, date) and (date, orderkey, linenumber) — the
    fixture's duplicate keys need the full tie-break); group ids
    are pure integer DIV; skip tests are date comparisons; the scan
    fraction lands on a half-up integer micro grid.

    Scale: each layout's rank is RECONSTRUCTED from order-contiguous
    buckets of its leading sort key (64 equi-width orderkey ranges /
    calendar months) — partitioned in-bucket row_numbers + bounded
    bucket-grain offsets, never a single-task global window; on a
    real table the zones come free from file footers, and the audit
    join is zones x 3 predicates.
    """
    rows_ = t(spark, sf_dir, "lineitem").select(
        F.col("l_shipdate").cast("date").alias("d"),
        "l_orderkey",
        "l_linenumber",
    )

    # r6 scale fix (q242 rank reconstruction): each layout's global
    # ROW_NUMBER used to funnel ALL of lineitem through one task
    # (6.9x superlinear at the sf1 smoke).  Both ranks are now
    # reconstructed from order-contiguous buckets of the LEADING sort
    # key — buckets partition the window (parallel), cross-bucket
    # offsets cumulate over the bounded bucket-grain aggregate, and
    # because (l_orderkey, l_linenumber) is unique the total order
    # (hence every rg assignment) is reproduced exactly.
    def bucketed_rank(df: DataFrame, order_cols: list) -> DataFrame:
        wloc = Window.partitionBy("bkt").orderBy(*order_cols)
        local = df.withColumn("r_in", F.row_number().over(wloc))
        woff = Window.orderBy("bkt").rowsBetween(
            Window.unboundedPreceding, -1
        )
        offs = (
            df.groupBy("bkt")
            .agg(F.count(F.lit(1)).alias("sz"))
            .select(
                "bkt",
                F.coalesce(F.sum("sz").over(woff), F.lit(0)).alias("off"),
            )
        )
        return local.join(F.broadcast(offs), "bkt").withColumn(
            "rn", F.col("off") + F.col("r_in")
        )

    # natural layout: 64 equi-width l_orderkey ranges (scale-free —
    # widths derive from the broadcast max key, never a constant)
    mx = rows_.agg(F.max("l_orderkey").alias("max_ok"))
    # GREATEST(...,1): hunt-generated corpora can have max_ok = 0
    # (ANSI divide-by-zero); bucket stays monotone in l_orderkey for
    # any positive divisor, which is all order-contiguity needs
    nat_b = rows_.crossJoin(F.broadcast(mx)).withColumn(
        "bkt",
        F.expr("((l_orderkey - 1) * 64) DIV GREATEST(max_ok, 1)").cast(
            "bigint"
        ),
    )
    nat = bucketed_rank(
        nat_b, [F.col("l_orderkey"), F.col("l_linenumber"), F.col("d")]
    ).select(
        F.lit("natural").alias("layout"),
        F.expr(f"CAST(rn - 1 AS BIGINT) DIV {ZM_GROUP}").alias("rg"),
        "d",
    )
    # sorted layout: calendar-month buckets of the leading date key
    srt_b = rows_.withColumn(
        "bkt",
        (F.year("d") * 12 + F.month("d")).cast("bigint"),
    )
    srt = bucketed_rank(
        srt_b, [F.col("d"), F.col("l_orderkey"), F.col("l_linenumber")]
    ).select(
        F.lit("sorted").alias("layout"),
        F.expr(f"CAST(rn - 1 AS BIGINT) DIV {ZM_GROUP}").alias("rg"),
        "d",
    )
    zones = (
        nat.unionByName(srt)
        .groupBy("layout", "rg")
        .agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    )
    preds = spark.createDataFrame(
        [(i, lo, hi) for i, (lo, hi) in enumerate(ZM_PREDS)],
        "pred_id int, plo string, phi string",
    ).select(
        "pred_id",
        F.col("plo").cast("date").alias("plo"),
        F.col("phi").cast("date").alias("phi"),
    )
    skip = (F.col("hi") < F.col("plo")) | (F.col("lo") > F.col("phi"))
    return (
        zones.crossJoin(F.broadcast(preds))
        .groupBy("pred_id", "layout")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum(F.when(skip, 1).otherwise(0))
            .cast("bigint")
            .alias("skipped"),
            F.expr(
                "(2000000 * SUM(CASE WHEN hi < plo OR lo > phi "
                "THEN 0 ELSE 1 END) + COUNT(*)) DIV (2 * COUNT(*))"
            ).alias("scan_fraction_micro"),
        )
        .orderBy("pred_id", "layout")
    )


# ---------------------------------------------------------------------------
# q485 Dunning log-likelihood (G^2) collocations
#
# THE collocation statistic (Dunning 1993, "Accurate Methods for the
# Statistics of Surprise and Coincidence"): the likelihood-ratio
# G^2 over the bigram 2x2 table — famously robust where q355's PMI
# over-rewards rare pairs. G^2 = 2 * sum o*ln(o/e) over the four
# cells; zero cells contribute zero.

G2_MIN_COUNT = 3
G2_TOP = 20


@register(
    "q485_dunning_collocations",
    category="llm-text-analysis",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS w
      FROM documents WHERE len(string_split(text, ' ')) >= 2
    ),
    big AS (
      SELECT w[i] AS a, w[i + 1] AS b
      FROM (SELECT doc_id, w,
                   UNNEST(generate_series(1, len(w) - 1)) AS i
            FROM toks)
    ),
    pair AS (
      SELECT a, b, CAST(COUNT(*) AS BIGINT) AS o11
      FROM big GROUP BY a, b HAVING COUNT(*) >= {G2_MIN_COUNT}
    ),
    lefts AS (
      SELECT a, CAST(COUNT(*) AS BIGINT) AS ca FROM big GROUP BY a
    ),
    rights AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS cb FROM big GROUP BY b
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM big),
    cells AS (
      SELECT p.a, p.b, p.o11,
             l.ca - p.o11 AS o12,
             r.cb - p.o11 AS o21,
             nn.n - l.ca - r.cb + p.o11 AS o22,
             l.ca, r.cb, nn.n
      FROM pair p JOIN lefts l USING (a) JOIN rights r USING (b)
      CROSS JOIN nn
    ),
    scored AS (
      SELECT a, b, o11, ca, cb,
             (FLOOR(CAST(2 * (
               (CASE WHEN o11 > 0 THEN o11 * (FLOOR(CAST(LN(o11 * CAST(n AS
                  DOUBLE) / (ca * CAST(cb AS DOUBLE))) AS DOUBLE) * 1000000000.0 + 0.5) / 1000000000.0)
                ELSE 0 END)
             + (CASE WHEN o12 > 0 THEN o12 * (FLOOR(CAST(LN(o12 * CAST(n AS
                  DOUBLE) / (ca * CAST(n - cb AS DOUBLE))) AS DOUBLE) * 1000000000.0 + 0.5) / 1000000000.0)
                ELSE 0 END)
             + (CASE WHEN o21 > 0 THEN o21 * (FLOOR(CAST(LN(o21 * CAST(n AS
                  DOUBLE) / (CAST(n - ca AS DOUBLE) * cb)) AS DOUBLE) * 1000000000.0 + 0.5) / 1000000000.0)
                ELSE 0 END)
             + (CASE WHEN o22 > 0 THEN o22 * (FLOOR(CAST(LN(o22 * CAST(n AS
                  DOUBLE) / (CAST(n - ca AS DOUBLE) * (n - cb))) AS DOUBLE) * 1000000000.0 + 0.5) / 1000000000.0)
                ELSE 0 END)) AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS g2
      FROM cells
    )
    SELECT a, b, o11 AS pair_count, ca AS left_count,
           cb AS right_count, g2,
           CAST(ROW_NUMBER() OVER (ORDER BY g2 DESC, a ASC, b ASC)
                AS BIGINT) AS rk
    FROM scored
    ORDER BY rk
    LIMIT {G2_TOP}
    """,
)
def q485_dunning_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning log-likelihood (G^2) collocation extraction (Dunning
    1993): the likelihood-ratio statistic over each bigram's 2x2
    contingency table — the collocation standard that stays
    calibrated on rare pairs where q355's PMI explodes. Zero cells
    contribute zero by the CASE guards; top-{G2_TOP} by G^2 with an
    (a, b) total order; pairs below {G2_MIN_COUNT} occurrences are
    floored out.

    Determinism: all cell counts and marginals are exact BIGINTs;
    each of the four o*ln(o/e) terms computes ln on identical
    integer-ratio doubles and grids at 1e-9 (q261 convention)
    before the 4-term sum, with the final G^2 on a ROUND-4 grid.

    Scale: bigram extraction is one in-row explode; marginals are
    word-grain partial aggregates; the cell join runs at surviving-
    pair grain (floored), all map-side combinable — no vocabulary
    table is ever broadcast.
    """
    docs = t(spark, sf_dir, "documents").select(
        F.split("text", " ").alias("w")
    ).filter(F.size("w") >= 2)
    big = docs.select(
        F.posexplode(F.expr("slice(w, 1, size(w) - 1)")).alias("i0", "a"),
        "w",
    ).select("a", F.expr("w[i0 + 1]").alias("b"))
    pair = (
        big.groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("o11"))
        .filter(F.col("o11") >= G2_MIN_COUNT)
    )
    lefts = big.groupBy("a").agg(
        F.count(F.lit(1)).cast("bigint").alias("ca")
    )
    rights = big.groupBy("b").agg(
        F.count(F.lit(1)).cast("bigint").alias("cb")
    )
    nn = big.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    cells = (
        pair.join(lefts, "a")
        .join(rights, "b")
        .crossJoin(F.broadcast(nn))
        .withColumn("o12", F.col("ca") - F.col("o11"))
        .withColumn("o21", F.col("cb") - F.col("o11"))
        .withColumn(
            "o22", F.col("n") - F.col("ca") - F.col("cb") + F.col("o11")
        )
    )

    def term(o, row_m, col_m):
        return F.when(
            o > 0,
            o
            * dround(
                F.log(
                    o * F.col("n").cast("double")
                    / (row_m * col_m.cast("double"))
                ),
                9,
            ),
        ).otherwise(0.0)

    g2 = dround(
        2
        * (
            term(F.col("o11"), F.col("ca"), F.col("cb"))
            + term(F.col("o12"), F.col("ca"), F.col("n") - F.col("cb"))
            + term(F.col("o21"), F.col("n") - F.col("ca"), F.col("cb"))
            + term(
                F.col("o22"),
                F.col("n") - F.col("ca"),
                F.col("n") - F.col("cb"),
            )
        ),
        4,
    )
    # TakeOrdered-then-rank (r6 scale fix): the limit-first form
    # compiles to TakeOrderedAndProject over the pair-grain scored
    # table; only the G2_TOP survivors see a (bounded) rank window.
    top = cells.select(
        "a",
        "b",
        F.col("o11").alias("pair_count"),
        F.col("ca").alias("left_count"),
        F.col("cb").alias("right_count"),
        g2.alias("g2"),
    ).orderBy(
        F.col("g2").desc(), F.col("a").asc(), F.col("b").asc()
    ).limit(G2_TOP)
    return top.withColumn(
        "rk",
        F.row_number()
        .over(
            Window.orderBy(
                F.col("g2").desc(), F.col("a").asc(), F.col("b").asc()
            )
        )
        .cast("bigint"),
    ).orderBy("rk")


# ---------------------------------------------------------------------------
# q486 overdispersion / burstiness audit (Fano factor + NB moments)
#
# The point-process sanity check: a Poisson arrival stream has
# variance == mean (Fano factor 1); real traffic is BURSTY. Per
# event type, the index of dispersion over daily counts plus the
# method-of-moments negative-binomial fit (r, p) that models the
# overdispersion — the count-model family the registry lacked.


@register(
    "q486_overdispersion_audit",
    category="events-temporal",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    m AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(x) AS BIGINT) AS s,
             CAST(SUM(CAST(x AS DECIMAL(19,0)) * x) AS DECIMAL(38,0))
               AS q
      FROM daily GROUP BY event_type
    ),
    stats AS (
      SELECT event_type, n_days, s,
             CAST(s AS DOUBLE) / n_days AS mean_daily,
             (CAST(n_days AS DOUBLE) * CAST(q AS DOUBLE)
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
             / (CAST(n_days AS DOUBLE) * NULLIF(n_days - 1, 0))
               AS var_daily
      FROM m
    )
    SELECT event_type, n_days, s AS total_events,
           (FLOOR(CAST(mean_daily AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS mean_daily,
           (FLOOR(CAST(var_daily AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS var_daily,
           (FLOOR(CAST(var_daily / NULLIF(mean_daily, 0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS fano_factor,
           COALESCE(var_daily > mean_daily, FALSE) AS overdispersed,
           (FLOOR(CAST(CASE WHEN var_daily > mean_daily
                 THEN mean_daily * mean_daily
                      / (var_daily - mean_daily) END AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS nb_r,
           (FLOOR(CAST(CASE WHEN var_daily > mean_daily
                 THEN mean_daily / var_daily END AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS nb_p
    FROM stats
    ORDER BY event_type
    """,
)
def q486_overdispersion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overdispersion / burstiness audit per event type: the Fano
    factor (index of dispersion, variance/mean of daily counts —
    exactly 1 for a Poisson process) plus the method-of-moments
    negative-binomial fit r = m^2/(v-m), p = m/v for overdispersed
    types — the count-model diagnostic behind capacity planning and
    anomaly baselines, complementing q475's inter-arrival KS (same
    Poisson question, count domain instead of gap domain).

    Determinism: daily counts are integers; mean/variance come from
    exact DECIMAL moments with the Bessel NULLIF; every comparison
    and NB parameter is the same double expression on both engines,
    CASE-guarded to NULL for under-dispersed types (never an ANSI
    /0); the overdispersed boolean COALESCEs to FALSE on NULL
    variance (single-day types) — possibly-NULL booleans
    canonicalize asymmetrically across engines (the q475 hunt
    find); ROUND-6 at the boundary.

    Scale: one (type, day) map-side-combinable aggregate, then a
    handful of per-type scalars.
    """
    daily = (
        t(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    )
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("x").cast("bigint").alias("s"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("q"),
    )
    mean_d = F.col("s").cast("double") / F.col("n_days")
    var_d = (
        F.col("n_days").cast("double") * F.col("q").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double")
    ) / (
        F.col("n_days").cast("double")
        * F.nullif(F.col("n_days") - 1, F.lit(0))
    )
    return m.select(
        "event_type",
        "n_days",
        F.col("s").alias("total_events"),
        dround(mean_d, 6).alias("mean_daily"),
        dround(var_d, 6).alias("var_daily"),
        dround(var_d / F.nullif(mean_d, F.lit(0.0)), 6).alias(
            "fano_factor"
        ),
        F.coalesce(var_d > mean_d, F.lit(False)).alias("overdispersed"),
        dround(
            F.when(var_d > mean_d, mean_d * mean_d / (var_d - mean_d)),
            6,
        ).alias("nb_r"),
        dround(F.when(var_d > mean_d, mean_d / var_d), 6).alias("nb_p"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# q487 Hellinger / Bhattacharyya source drift
#
# The bounded distribution distances the drift shelf lacked: between
# every source pair's language distributions, the Bhattacharyya
# coefficient BC = sum sqrt(p*q), Hellinger H = sqrt(1 - BC) (a true
# metric on [0,1]) and Bhattacharyya distance -ln BC — the bounded
# complements of KL (unbounded) and Wasserstein (scale-dependent).


@register(
    "q487_hellinger_source_drift",
    category="llm-corpus-pipeline",
    oracle="""
    WITH cells AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY source, lang
    ),
    tot AS (
      SELECT source, CAST(SUM(n) AS BIGINT) AS nt
      FROM cells GROUP BY source
    ),
    pairs AS (
      SELECT a.source AS source_a, b.source AS source_b,
             a.lang,
             CAST(a.n AS DOUBLE) / ta.nt AS p,
             CAST(b.n AS DOUBLE) / tb.nt AS q
      FROM cells a
      JOIN cells b ON b.lang = a.lang AND b.source > a.source
      JOIN tot ta ON ta.source = a.source
      JOIN tot tb ON tb.source = b.source
    ),
    bc AS (
      SELECT source_a, source_b,
             CAST(SUM(CAST(FLOOR(SQRT(p * q) * 1e9 + 0.5) AS BIGINT))
                  AS DOUBLE) / 1e9 AS bc
      FROM pairs GROUP BY source_a, source_b
    )
    SELECT source_a, source_b,
           (FLOOR(CAST(bc AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS bhattacharyya_coef,
           (FLOOR(CAST(SQRT(GREATEST(1 - bc, 0)) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS hellinger,
           (FLOOR(CAST(-LN(NULLIF(bc, 0)) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS bhattacharyya_dist
    FROM bc
    ORDER BY source_a, source_b
    """,
)
def q487_hellinger_source_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hellinger and Bhattacharyya distances between every source
    pair's language distributions — the BOUNDED drift metrics
    ([0,1]; a true metric, unlike KL) that complement the
    registry's Wasserstein (q409) and PSI (q250) drift readouts.
    BC = sum sqrt(p_l * q_l) over shared languages (missing
    languages contribute zero, so the inner lang join is exact),
    H = sqrt(1 - BC), BD = -ln(BC).

    Determinism: shares are exact-integer-ratio doubles; each
    sqrt(p*q) term lands on the repo's half-up FLOOR(x*1e9 + 0.5)
    nano grid before the exact BIGINT sum (sqrt is IEEE-exact, and
    unlike q485's tie-free ln terms a sqrt(p*q) CAN be exactly
    dyadic — identical distributions with power-of-two totals give
    p = q = odd/2^k — so ROUND's half-up-Spark vs half-even-DuckDB
    divergence is reachable here; r6 advice); GREATEST clamps the
    1-BC
    identical-distribution corner where the grid can leave a tiny
    negative; -ln NULLIFs disjoint-support pairs; ROUND-6 at the
    boundary.

    Scale: one (source, lang) aggregate — both marginals map-side
    combinable; the pair join runs at category grain (sources x
    langs), never at document grain.
    """
    cells = (
        t(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = cells.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("nt")
    )
    a = cells.join(tot, "source").select(
        F.col("source").alias("source_a"),
        "lang",
        (F.col("n").cast("double") / F.col("nt")).alias("p"),
    )
    b = cells.join(tot, "source").select(
        F.col("source").alias("source_b"),
        "lang",
        (F.col("n").cast("double") / F.col("nt")).alias("q"),
    )
    pairs = a.join(b, "lang").filter(
        F.col("source_b") > F.col("source_a")
    )
    bc = pairs.groupBy("source_a", "source_b").agg(
        (
            F.sum(
                F.floor(
                    F.sqrt(F.col("p") * F.col("q")) * 1e9 + 0.5
                ).cast("bigint")
            ).cast("double")
            / 1e9
        ).alias("bc")
    )
    return bc.select(
        "source_a",
        "source_b",
        dround("bc", 6).alias("bhattacharyya_coef"),
        dround(
            F.sqrt(F.greatest(F.lit(1) - F.col("bc"), F.lit(0.0))), 6
        ).alias("hellinger"),
        dround(-F.log(F.nullif(F.col("bc"), F.lit(0.0))), 6).alias(
            "bhattacharyya_dist"
        ),
    ).orderBy("source_a", "source_b")
