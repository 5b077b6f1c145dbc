"""Round-6 operators (q488+): benchmark decontamination, time-series
regression diagnostics, repeated-measures tests, engine advisors,
forecast-calibration decomposition, RAG packing, robust statistics.

Every operator follows the repo's determinism conventions: exact
integer/DECIMAL arithmetic until a final division, the half-up
FLOOR(x*G + 0.5) grid before any cross-partition DOUBLE sum, NULLIF
guards for ANSI division, ROUND-6 only at the output boundary — and
the r6 scale conventions: no unpartitioned window over a
corpus-bound grain (tests/test_window_audit.py), no unaudited
broadcast hint (tests/test_broadcast_audit.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ._util import dround, fan_out, t

# ---------------------------------------------------------------------------
# q488 benchmark n-gram decontamination (GPT-3 appendix-C style)

DECON_N = 13          # the GPT-3 decontamination n-gram width
DECON_BENCH_MOD = 37  # doc_id % MOD == 0 -> "benchmark" membership


@register(
    "q488_ngram_decontamination",
    category="llm-corpus-pipeline",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, string_split(text, ' ') AS w
      FROM documents
    ),
    grams AS (
      SELECT doc_id, source,
             md5(array_to_string(w[i : i + {DECON_N - 1}], ' ')) AS h
      FROM d, UNNEST(range(1, len(w) - {DECON_N - 2})) r(i)
    ),
    bench AS (
      SELECT DISTINCT h FROM grams WHERE doc_id % {DECON_BENCH_MOD} = 0
    ),
    contaminated AS (
      SELECT DISTINCT doc_id FROM grams
      WHERE doc_id % {DECON_BENCH_MOD} <> 0
        AND h IN (SELECT h FROM bench)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_train,
           CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated,
           CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS contamination_rate
    FROM documents t LEFT JOIN contaminated c ON c.doc_id = t.doc_id
    WHERE t.doc_id % {DECON_BENCH_MOD} <> 0
    GROUP BY source
    ORDER BY source
    """,
)
def q488_ngram_decontamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Benchmark decontamination audit (the GPT-3 appendix-C
    procedure): a training document is CONTAMINATED if it shares any
    {DECON_N}-gram with the evaluation/benchmark set (here a
    deterministic doc_id % {DECON_BENCH_MOD} == 0 slice standing in
    for the benchmark). Reports per-source train counts and
    contamination rates — the eval-integrity gate beside q68's
    exact-hash split contamination (whole-doc membership) and q230's
    thresholded similarity join: n-gram ANY-overlap catches partial
    quoting those miss.

    Determinism: grams are md5 digests of identical word joins; the
    membership probe is an exact distinct semi-join; rates are exact
    integer ratios.

    Scale: grams shuffle as 16-byte digests at (gram-type) grain; the
    benchmark side is the distinct digest set of a fixed slice (a
    real pipeline broadcasts its benchmark suite); the final probe is
    a doc-grain LEFT join carrying a boolean marker — one aggregation
    yields totals and contaminated counts (q68's pattern).
    """
    d = t(spark, sf_dir, "documents")
    grams = fan_out(d).select(
        "doc_id",
        F.explode(
            # sequence(1, 0) DESCENDS in Spark (never empty), so docs
            # shorter than the n-gram width need an explicit empty
            F.expr(
                f"CASE WHEN size(split(text, ' ')) < {DECON_N} "
                f"THEN array() ELSE "
                f"transform(sequence(1, size(split(text, ' ')) "
                f"- {DECON_N - 1}), i -> "
                f"md5(array_join(slice(split(text, ' '), i, {DECON_N}), "
                f"' '))) END"
            )
        ).alias("h"),
    )
    bench = (
        grams.filter(F.col("doc_id") % DECON_BENCH_MOD == 0)
        .select("h")
        .distinct()
    )
    contaminated = (
        grams.filter(F.col("doc_id") % DECON_BENCH_MOD != 0)
        .join(bench, "h")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    train = d.filter(F.col("doc_id") % DECON_BENCH_MOD != 0).select(
        "doc_id", "source"
    )
    marked = train.join(contaminated, "doc_id", "left")
    return (
        marked.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_train"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_contaminated"),
            (
                F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("double")
                / F.count(F.lit(1))
            ).alias("contamination_rate"),
        )
        .orderBy("source")
    )

# ---------------------------------------------------------------------------
# q489 Durbin-Watson serial-correlation diagnostic

# grid factor for the squared-residual term sums: residuals are in
# CENTS (~1e8 at sf1), so e^2 ~ 1e16 — a 1e-4 factor keeps each
# gridded term ~1e12 (BIGINT-safe at any SF) while the common factor
# cancels in the DW ratio; half-up FLOOR on both engines
DW_GRID = 0.0001


@register(
    "q489_durbin_watson",
    category="analytics-stats (regression/tests/causal)",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(epoch(CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP))
                  // 86400 AS BIGINT) AS x,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100)
                  AS BIGINT) AS y
      FROM orders GROUP BY 1
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(19,0)) * y) AS DECIMAL(38,0))
               AS sxy,
             CAST(SUM(CAST(x AS DECIMAL(19,0)) * x) AS DECIMAL(38,0))
               AS sxx
      FROM daily
    ),
    fit AS (
      SELECT n,
             (n * CAST(sxy AS DOUBLE) - sx * CAST(sy AS DOUBLE))
               / NULLIF(n * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * sx, 0) AS b,
             sx, sy
      FROM m
    ),
    resid AS (
      SELECT d.x,
             CAST(d.y AS DOUBLE)
               - ((CAST(f.sy AS DOUBLE) - f.b * f.sx) / f.n)
               - f.b * d.x AS e
      FROM daily d, fit f
    ),
    lagged AS (
      SELECT e, LAG(e) OVER (ORDER BY x) AS ep FROM resid
    ),
    sums AS (
      SELECT CAST(SUM(CAST(FLOOR(e * e * {DW_GRID} + 0.5) AS BIGINT))
                  AS BIGINT) AS see,
             CAST(SUM(CASE WHEN ep IS NULL THEN 0
                      ELSE CAST(FLOOR((e - ep) * (e - ep) * {DW_GRID}
                                      + 0.5) AS BIGINT) END)
                  AS BIGINT) AS sdd,
             CAST(COUNT(*) AS BIGINT) AS n_days
      FROM lagged
    )
    SELECT n_days,
           (FLOOR(CAST(CAST(sdd AS DOUBLE) / NULLIF(see, 0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS dw,
           (FLOOR(CAST(1.0 - CAST(sdd AS DOUBLE) / NULLIF(see, 0) / 2 AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS rho_approx,
           CAST(CASE WHEN CAST(sdd AS DOUBLE) / NULLIF(see, 0) < 1.5
                     THEN 1 ELSE 0 END AS BIGINT) AS positive_autocorr
    FROM sums
    """,
)
def q489_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson test on the residuals of the daily-revenue OLS
    trend — THE first-order serial-correlation diagnostic for a
    regression (DW ~ 2(1-rho); < 1.5 flags positive autocorrelation,
    meaning the trend's standard errors are lies). Completes the
    time-series diagnostic shelf: q338 Ljung-Box tests the raw
    series, q454 fits AR(1), this one tests what a REGRESSION leaves
    behind.

    Determinism: the OLS fit comes from exact BIGINT/DECIMAL moments
    on the cent grid (q321/q265 convention); residuals are identical
    double expressions of identical exact inputs; each e^2 and
    (e_t - e_t-1)^2 term lands on the half-up FLOOR 1e-6 grid before
    the BIGINT sums, so partition order cannot move the ratio; one
    ROUND-6 at the boundary; NULLIF guards the all-zero-residual
    corner.

    Scale: one day-grain aggregate (map-side combinable); the lag
    window runs over the bounded day spine (calendar-bound, audited);
    moments are 1-row scalars.
    """
    daily = (
        t(spark, sf_dir, "orders")
        .groupBy(
            (
                F.unix_timestamp(F.col("o_orderdate").cast("date").cast("timestamp"))
                / 86400
            )
            .cast("bigint")
            .alias("x")
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("y")
        )
    )
    m = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("y"))
        .cast("decimal(38,0)")
        .alias("sxy"),
        F.sum(F.col("x").cast("decimal(19,0)") * F.col("x"))
        .cast("decimal(38,0)")
        .alias("sxx"),
    )
    fit = m.select(
        "n",
        "sx",
        "sy",
        (
            (
                F.col("n") * F.col("sxy").cast("double")
                - F.col("sx") * F.col("sy").cast("double")
            )
            / F.nullif(
                F.col("n") * F.col("sxx").cast("double")
                - F.col("sx").cast("double") * F.col("sx"),
                F.lit(0.0),
            )
        ).alias("b"),
    )
    resid = daily.crossJoin(F.broadcast(fit)).select(
        "x",
        (
            F.col("y").cast("double")
            - (
                (F.col("sy").cast("double") - F.col("b") * F.col("sx"))
                / F.col("n")
            )
            - F.col("b") * F.col("x")
        ).alias("e"),
    )
    lagged = resid.select(
        "e", F.lag("e").over(Window.orderBy("x")).alias("ep")
    )
    sums = lagged.agg(
        F.sum(
            F.floor(F.col("e") * F.col("e") * DW_GRID + 0.5).cast("bigint")
        )
        .cast("bigint")
        .alias("see"),
        F.sum(
            F.when(F.col("ep").isNull(), F.lit(0)).otherwise(
                F.floor(
                    (F.col("e") - F.col("ep"))
                    * (F.col("e") - F.col("ep"))
                    * DW_GRID
                    + 0.5
                ).cast("bigint")
            )
        )
        .cast("bigint")
        .alias("sdd"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    dw = F.col("sdd").cast("double") / F.nullif(
        F.col("see"), F.lit(0)
    )
    return sums.select(
        "n_days",
        dround(dw, 6).alias("dw"),
        dround(F.lit(1.0) - dw / 2, 6).alias("rho_approx"),
        F.when(dw < 1.5, 1).otherwise(0).cast("bigint").alias(
            "positive_autocorr"
        ),
    )

# ---------------------------------------------------------------------------
# q490 Cochran's Q repeated-measures test

# chi-square 0.05 critical values for df 1..10 (literal lookup so the
# data-derived df never needs a stats library; identical CASE on both
# engines)
_CHI2_05 = {
    1: 3.841459, 2: 5.991465, 3: 7.814728, 4: 9.487729, 5: 11.070498,
    6: 12.591587, 7: 14.067140, 8: 15.507313, 9: 16.918978, 10: 18.307038,
}
_CHI2_CASE_SQL = "CASE df " + " ".join(
    f"WHEN {d} THEN {v!r}" for d, v in _CHI2_05.items()
) + " ELSE NULL END"


@register(
    "q490_cochran_q",
    category="analytics-stats (regression/tests/causal)",
    oracle=f"""
    WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events
    ),
    k AS (SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS k FROM ut),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS gj FROM ut GROUP BY event_type
    ),
    gs AS (
      SELECT CAST(SUM(gj) AS BIGINT) AS t,
             CAST(SUM(gj * gj) AS BIGINT) AS sg2
      FROM g
    ),
    l AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS li FROM ut GROUP BY user_id
    ),
    ls AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
             CAST(SUM(li) AS BIGINT) AS sl,
             CAST(SUM(li * li) AS BIGINT) AS sl2
      FROM l
    ),
    stat AS (
      SELECT ls.n_users, k.k, k.k - 1 AS df,
             CAST((k.k - 1) * (k.k * gs.sg2 - gs.t * gs.t) AS DOUBLE)
               / NULLIF(k.k * ls.sl - ls.sl2, 0) AS q
      FROM ls, k, gs
    )
    SELECT n_users, k AS n_treatments, df,
           (FLOOR(CAST(q AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS q_stat,
           CAST(CASE WHEN q > ({_CHI2_CASE_SQL})
                     THEN 1 ELSE 0 END AS BIGINT) AS significant_05
    FROM stat
    """,
)
def q490_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q test: do the k event types differ in the FRACTION
    of users who perform them at least once? The k-treatment
    generalization of McNemar (q462) for binary repeated measures —
    each user is their own block, so between-user variation cancels
    exactly (the within-subject sibling of the q142 chi-square, which
    wrongly treats the k observations per user as independent).
    Q = (k-1)[k*sum(G_j^2) - T^2] / [k*sum(L_i) - sum(L_i^2)] ~
    chi-square(k-1).

    Determinism: every term is a pure BIGINT count (users who did a
    type, types per user); one double division; the data-derived df
    reads its 0.05 critical value from a literal CASE table (df
    1..10) identical on both engines; NULLIF guards the degenerate
    all-users-do-everything corpus.

    Scale: one (user, type) distinct reduce, then a type-grain
    aggregate (<= k rows) and a user-grain aggregate folded straight
    into scalars — all map-side combinable, no windows, no lattice
    materialization (absent cells contribute zero to every sum).
    """
    ut = (
        t(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
    )
    k = ut.agg(
        F.countDistinct("event_type").cast("bigint").alias("k")
    )
    gs = (
        ut.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("gj"))
        .agg(
            F.sum("gj").cast("bigint").alias("t"),
            F.sum(F.col("gj") * F.col("gj")).cast("bigint").alias("sg2"),
        )
    )
    ls = (
        ut.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("li"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("li").cast("bigint").alias("sl"),
            F.sum(F.col("li") * F.col("li")).cast("bigint").alias("sl2"),
        )
    )
    stat = (
        ls.crossJoin(F.broadcast(k))
        .crossJoin(F.broadcast(gs))
        .select(
            "n_users",
            "k",
            (F.col("k") - 1).alias("df"),
            (
                (
                    (F.col("k") - 1)
                    * (F.col("k") * F.col("sg2") - F.col("t") * F.col("t"))
                ).cast("double")
                / F.nullif(
                    F.col("k") * F.col("sl") - F.col("sl2"), F.lit(0)
                )
            ).alias("q"),
        )
    )
    crit = F.lit(None).cast("double")
    for d, v in _CHI2_05.items():
        crit = F.when(F.col("df") == d, F.lit(v)).otherwise(crit)
    return stat.select(
        "n_users",
        F.col("k").alias("n_treatments"),
        "df",
        dround("q", 6).alias("q_stat"),
        F.when(F.col("q") > crit, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("significant_05"),
    )

# ---------------------------------------------------------------------------
# q491 Friedman rank test (repeated measures, tie-corrected)


@register(
    "q491_friedman_test",
    category="analytics-stats (regression/tests/causal)",
    oracle=f"""
    WITH users AS (SELECT DISTINCT user_id FROM events),
    types AS (SELECT DISTINCT event_type FROM events),
    counts AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY user_id, event_type
    ),
    lattice AS (
      SELECT u.user_id, ty.event_type, COALESCE(c.c, 0) AS c
      FROM users u CROSS JOIN types ty
      LEFT JOIN counts c
        ON c.user_id = u.user_id AND c.event_type = ty.event_type
    ),
    ranked AS (
      SELECT user_id, event_type,
             2 * RANK() OVER (PARTITION BY user_id ORDER BY c)
               + COUNT(*) OVER (PARTITION BY user_id, c) - 1 AS r2
      FROM lattice
    ),
    per_type AS (
      SELECT event_type, CAST(SUM(r2) AS BIGINT) AS r2j FROM ranked
      GROUP BY event_type
    ),
    scal AS (
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM users) AS n,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM types) AS k,
             (SELECT CAST(SUM(CAST(r2 AS BIGINT) * r2) AS BIGINT)
              FROM ranked) AS sr22
    ),
    stat AS (
      SELECT n, k, k - 1 AS df,
             CAST((k - 1) * (SELECT SUM((r2j - n * (k + 1))
                                        * (r2j - n * (k + 1)))
                             FROM per_type) AS DOUBLE)
               / NULLIF(sr22 - n * k * (k + 1) * (k + 1), 0) AS f
      FROM scal
    )
    SELECT n AS n_users, k AS n_treatments, df,
           (FLOOR(CAST(f AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS friedman_stat,
           CAST(CASE WHEN f > ({_CHI2_CASE_SQL})
                     THEN 1 ELSE 0 END AS BIGINT) AS significant_05
    FROM stat
    """,
)
def q491_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test: do users rank the k event types
    consistently (by per-user activity counts)? The nonparametric
    repeated-measures ANOVA — each user is their own block, ranks
    kill scale differences between heavy and light users, so it
    detects systematic TYPE preference that q142's independence
    chi-square and q490's binary Q cannot (this one uses the full
    count ordering, not just presence). Tie-corrected via midranks in
    Conover's general form chi2 = (k-1)*sum_j(R_j - N(k+1)/2)^2 /
    (sum r^2 - N*k*(k+1)^2/4).

    Determinism: midranks are carried DOUBLED (2*RANK + ties - 1) so
    every rank sum and square is pure BIGINT — the 1/2s cancel in the
    statistic exactly (numerator and denominator both scale by 4);
    one double division; the df-indexed 0.05 critical value comes
    from the shared literal CASE table; NULLIF guards the all-tied
    corpus.

    Scale: the lattice is users x k (k = event types, ~5); the rank
    window partitions BY USER (parallel, k rows per partition); type
    sums are a k-row aggregate; no unpartitioned window anywhere.
    """
    ev = t(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    types = ev.select("event_type").distinct()
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    lattice = (
        users.crossJoin(F.broadcast(types))
        .join(counts, ["user_id", "event_type"], "left")
        .select(
            "user_id",
            "event_type",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        )
    )
    wr = Window.partitionBy("user_id").orderBy("c")
    wt = Window.partitionBy("user_id", "c")
    ranked = lattice.select(
        "user_id",
        "event_type",
        (
            2 * F.rank().over(wr) + F.count(F.lit(1)).over(wt) - 1
        ).alias("r2"),
    )
    per_type = ranked.groupBy("event_type").agg(
        F.sum("r2").cast("bigint").alias("r2j")
    )
    n = users.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    k = types.agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    sr22 = ranked.agg(
        F.sum(F.col("r2").cast("bigint") * F.col("r2"))
        .cast("bigint")
        .alias("sr22")
    )
    num = (
        per_type.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(k))
        .agg(
            F.sum(
                (F.col("r2j") - F.col("n") * (F.col("k") + 1))
                * (F.col("r2j") - F.col("n") * (F.col("k") + 1))
            )
            .cast("bigint")
            .alias("s4")
        )
    )
    stat = (
        n.crossJoin(F.broadcast(k))
        .crossJoin(F.broadcast(sr22))
        .crossJoin(F.broadcast(num))
        .select(
            "n",
            "k",
            (F.col("k") - 1).alias("df"),
            (
                ((F.col("k") - 1) * F.col("s4")).cast("double")
                / F.nullif(
                    F.col("sr22")
                    - F.col("n")
                    * F.col("k")
                    * (F.col("k") + 1)
                    * (F.col("k") + 1),
                    F.lit(0),
                )
            ).alias("f"),
        )
    )
    crit = F.lit(None).cast("double")
    for d, v in _CHI2_05.items():
        crit = F.when(F.col("df") == d, F.lit(v)).otherwise(crit)
    return stat.select(
        F.col("n").alias("n_users"),
        F.col("k").alias("n_treatments"),
        "df",
        dround("f", 6).alias("friedman_stat"),
        F.when(F.col("f") > crit, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("significant_05"),
    )

# ---------------------------------------------------------------------------
# q492 partition-pruning advisor

# the advisor's workload: literal predicates over the partition key
# (DATE(ts)), the shapes a warehouse actually runs
PRUNE_FILTERS = [
    ("q_range_spring", "1997-03-01", "1997-06-01"),
    ("q_tail_open", "1997-11-15", "9999-12-31"),
    ("q_single_day", "1997-07-04", "1997-07-05"),
]
_PRUNE_VALUES_SQL = ", ".join(
    f"('{n}', DATE '{lo}', DATE '{hi}')" for n, lo, hi in PRUNE_FILTERS
)


@register(
    "q492_partition_pruning_advisor",
    category="mixed-extensions",
    oracle=f"""
    WITH days AS (
      SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS rows_
      FROM events GROUP BY 1
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS p_total,
             CAST(SUM(rows_) AS BIGINT) AS r_total
      FROM days
    ),
    filters(name, lo, hi) AS (VALUES {_PRUNE_VALUES_SQL}),
    hit AS (
      SELECT f.name,
             CAST(COUNT(d.d) AS BIGINT) AS p_scanned,
             CAST(COALESCE(SUM(d.rows_), 0) AS BIGINT) AS r_scanned
      FROM filters f
      LEFT JOIN days d ON d.d >= f.lo AND d.d < f.hi
      GROUP BY f.name
    )
    SELECT h.name AS workload_query,
           t.p_total AS partitions_total,
           h.p_scanned AS partitions_scanned,
           t.r_total AS rows_total,
           h.r_scanned AS rows_scanned,
           CAST(t.p_total - h.p_scanned AS DOUBLE) / t.p_total
             AS prune_fraction,
           CAST(h.r_scanned AS DOUBLE) / t.r_total AS row_scan_fraction
    FROM hit h, tot t
    ORDER BY workload_query
    """,
)
def q492_partition_pruning_advisor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Partition-pruning advisor: for a daily-partitioned layout of
    the event stream and a literal workload of partition-key
    predicates, report exactly how many partitions (and rows) each
    query touches vs prunes — the number that decides whether a
    PARTITIONED BY (date) layout pays for itself. The table-layout
    sibling of q484's row-group zone-map audit (file-internal
    skipping) and q213's Z-order advisor (multi-column clustering);
    this is the coarsest, cheapest pruning tier.

    Determinism: pure integer day-histogram arithmetic; exact
    integer-ratio doubles at the boundary.

    Scale: ONE map-side-combinable day-grain aggregate of the fact
    table; the workload join runs at (filters x days) grain — both
    bounded (days are calendar-bound). At 100 TB the same plan reads
    the day histogram from table metadata instead of a scan.
    """
    days = (
        t(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("rows_"))
    )
    tot = days.agg(
        F.count(F.lit(1)).cast("bigint").alias("p_total"),
        F.sum("rows_").cast("bigint").alias("r_total"),
    )
    filters = spark.createDataFrame(
        [(n, lo, hi) for n, lo, hi in PRUNE_FILTERS],
        "name string, lo string, hi string",
    ).select(
        "name",
        F.col("lo").cast("date").alias("lo"),
        F.col("hi").cast("date").alias("hi"),
    )
    hit = (
        F.broadcast(filters)
        .join(
            days,
            (F.col("d") >= F.col("lo")) & (F.col("d") < F.col("hi")),
            "left",
        )
        .groupBy("name")
        .agg(
            F.count(F.col("d")).cast("bigint").alias("p_scanned"),
            F.coalesce(F.sum("rows_"), F.lit(0))
            .cast("bigint")
            .alias("r_scanned"),
        )
    )
    return (
        hit.crossJoin(F.broadcast(tot))
        .select(
            F.col("name").alias("workload_query"),
            F.col("p_total").alias("partitions_total"),
            F.col("p_scanned").alias("partitions_scanned"),
            F.col("r_total").alias("rows_total"),
            F.col("r_scanned").alias("rows_scanned"),
            (
                (F.col("p_total") - F.col("p_scanned")).cast("double")
                / F.col("p_total")
            ).alias("prune_fraction"),
            (
                F.col("r_scanned").cast("double") / F.col("r_total")
            ).alias("row_scan_fraction"),
        )
        .orderBy("workload_query")
    )

# ---------------------------------------------------------------------------
# q493 Murphy decomposition of the Brier score

BRIER_GRID = 1_000_000_000  # 1e-9 half-up grid for the 10-bin term sums


@register(
    "q493_brier_decomposition",
    category="ml-eval-calibration",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
               AS clicks,
             COUNT(*) AS n_events,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS y
      FROM events GROUP BY user_id
    ),
    binned AS (
      SELECT LEAST(9, 10 * clicks // n_events) AS b, y FROM per_user
    ),
    bins AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS nb,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(2 * b + 1 AS DOUBLE) / 20 AS fb
      FROM binned GROUP BY b
    ),
    tot AS (
      SELECT CAST(SUM(nb) AS BIGINT) AS n, CAST(SUM(sy) AS BIGINT) AS s
      FROM bins
    ),
    terms AS (
      SELECT
        CAST(FLOOR(nb * (fb - CAST(sy AS DOUBLE) / nb)
                      * (fb - CAST(sy AS DOUBLE) / nb)
                   * {BRIER_GRID} + 0.5) AS BIGINT) AS rel_t,
        CAST(FLOOR(nb * (CAST(sy AS DOUBLE) / nb
                         - CAST(t.s AS DOUBLE) / t.n)
                      * (CAST(sy AS DOUBLE) / nb
                         - CAST(t.s AS DOUBLE) / t.n)
                   * {BRIER_GRID} + 0.5) AS BIGINT) AS res_t,
        CAST(FLOOR((nb * fb * fb - 2 * fb * sy + sy)
                   * {BRIER_GRID} + 0.5) AS BIGINT) AS bs_t
      FROM bins, tot t
    ),
    agg AS (
      SELECT CAST(SUM(rel_t) AS BIGINT) AS rel,
             CAST(SUM(res_t) AS BIGINT) AS res,
             CAST(SUM(bs_t) AS BIGINT) AS bs
      FROM terms
    )
    SELECT t.n AS n_users,
           (FLOOR(CAST(CAST(t.s AS DOUBLE) / t.n AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS base_rate,
           (FLOOR(CAST(CAST(a.bs AS DOUBLE) / {BRIER_GRID} / t.n AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS brier_score,
           (FLOOR(CAST(CAST(a.rel AS DOUBLE) / {BRIER_GRID} / t.n AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS reliability,
           (FLOOR(CAST(CAST(a.res AS DOUBLE) / {BRIER_GRID} / t.n AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS resolution,
           (FLOOR(CAST((CAST(t.s AS DOUBLE) / t.n)
                 * (1 - CAST(t.s AS DOUBLE) / t.n) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS uncertainty,
           (FLOOR(CAST(CAST(a.bs - (a.rel - a.res) AS DOUBLE) / {BRIER_GRID}
                   / t.n
                 - (CAST(t.s AS DOUBLE) / t.n)
                   * (1 - CAST(t.s AS DOUBLE) / t.n) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS decomposition_gap
    FROM agg a, tot t
    """,
)
def q493_brier_decomposition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Murphy (1973) decomposition of the Brier score,
    BS = REL - RES + UNC: reliability (calibration error of the
    binned forecast), resolution (how much the bins separate
    outcomes), uncertainty (base-rate variance). The WHY behind
    q306's raw Brier number — a model can have a good BS purely from
    low uncertainty while being badly calibrated. Forecast = each
    user's click-share decile midpoint (2b+1)/20; outcome = did they
    purchase. The identity is CERTIFIED in-query: decomposition_gap
    must be 0 (exact for binned forecasts, where within-bin
    forecasts are constant).

    Determinism: bins/counts are integers; bin means are exact
    integer-ratio doubles; every per-bin term (including the direct
    BS via nb*f^2 - 2f*sy + sy, exact because y^2 = y) lands on the
    half-up FLOOR 1e-9 grid before the BIGINT sums, so the <=10-row
    final aggregation is partition-order-free; ROUND-6 at the
    boundary.

    Scale: one user-grain aggregate, one <=10-row bin aggregate,
    scalars — no windows, no joins beyond 1-row broadcasts.
    """
    per_user = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("clicks"),
            F.count(F.lit(1)).alias("n_events"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("y"),
        )
    )
    bins = (
        per_user.select(
            F.least(
                F.lit(9),
                F.expr("10 * clicks DIV n_events"),
            ).alias("b"),
            "y",
        )
        .groupBy("b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("nb"),
            F.sum("y").cast("bigint").alias("sy"),
        )
        .withColumn("fb", (2 * F.col("b") + 1).cast("double") / 20)
    )
    tot = bins.agg(
        F.sum("nb").cast("bigint").alias("n"),
        F.sum("sy").cast("bigint").alias("s"),
    )
    yb = F.col("sy").cast("double") / F.col("nb")
    ybar = F.col("s").cast("double") / F.col("n")
    terms = bins.crossJoin(F.broadcast(tot)).select(
        F.floor(
            F.col("nb") * (F.col("fb") - yb) * (F.col("fb") - yb)
            * BRIER_GRID
            + 0.5
        )
        .cast("bigint")
        .alias("rel_t"),
        F.floor(
            F.col("nb") * (yb - ybar) * (yb - ybar) * BRIER_GRID + 0.5
        )
        .cast("bigint")
        .alias("res_t"),
        F.floor(
            (
                F.col("nb") * F.col("fb") * F.col("fb")
                - 2 * F.col("fb") * F.col("sy")
                + F.col("sy")
            )
            * BRIER_GRID
            + 0.5
        )
        .cast("bigint")
        .alias("bs_t"),
    )
    agg = terms.agg(
        F.sum("rel_t").cast("bigint").alias("rel"),
        F.sum("res_t").cast("bigint").alias("res"),
        F.sum("bs_t").cast("bigint").alias("bs"),
    )
    out = agg.crossJoin(F.broadcast(tot))
    unc = ybar * (1 - ybar)
    return out.select(
        F.col("n").alias("n_users"),
        dround(ybar, 6).alias("base_rate"),
        dround(F.col("bs").cast("double") / BRIER_GRID / F.col("n"), 6)
        .alias("brier_score"),
        dround(F.col("rel").cast("double") / BRIER_GRID / F.col("n"), 6)
        .alias("reliability"),
        dround(F.col("res").cast("double") / BRIER_GRID / F.col("n"), 6)
        .alias("resolution"),
        dround(unc, 6).alias("uncertainty"),
        dround(
            (F.col("bs") - (F.col("rel") - F.col("res"))).cast("double")
            / BRIER_GRID
            / F.col("n")
            - unc,
            6,
        ).alias("decomposition_gap"),
    )

# ---------------------------------------------------------------------------
# q494 RAG context-window packing

RAG_QUERIES = 20     # query vectors: vec_id < 20
RAG_TOPC = 50        # candidate pool per query (rank-filtered)
RAG_BUDGET = 1200    # context token budget per query
RAG_COST_MOD = 400   # deterministic per-candidate token cost fixture


@register(
    "q494_rag_context_packing",
    category="llm-similarity-ann",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qe FROM embeddings
      WHERE vec_id < {RAG_QUERIES}
    ),
    c AS (
      SELECT vec_id AS cand_id, embedding AS ce,
             vec_id % {RAG_COST_MOD} + 100 AS cost
      FROM embeddings WHERE vec_id >= {RAG_QUERIES}
    ),
    pairs AS (
      SELECT q.query_id, c.cand_id, c.cost,
             CAST(UNNEST(q.qe) AS DOUBLE) AS x,
             CAST(UNNEST(c.ce) AS DOUBLE) AS y
      FROM q, c
    ),
    scored AS (
      SELECT query_id, cand_id, cost,
             (FLOOR(CAST(SUM(x * y) / (SQRT(SUM(x * x)) * SQRT(SUM(y * y))) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
               AS score
      FROM pairs GROUP BY query_id, cand_id, cost
    ),
    pool AS (
      SELECT * FROM (
        SELECT query_id, cand_id, cost, score,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, cand_id) AS rk
        FROM scored
      ) WHERE rk <= {RAG_TOPC}
    ),
    packed AS (
      SELECT query_id, cand_id, score, cost,
             SUM(cost) OVER (PARTITION BY query_id
                             ORDER BY rk
                             ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS cum
      FROM pool
    )
    SELECT query_id,
           CAST(COUNT(*) AS BIGINT) AS n_pool,
           CAST(SUM(CASE WHEN cum <= {RAG_BUDGET} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(COALESCE(MAX(CASE WHEN cum <= {RAG_BUDGET} THEN cum END),
                         0) AS BIGINT) AS tokens_used,
           MIN(CASE WHEN cum <= {RAG_BUDGET} THEN score END)
             AS min_kept_score,
           MAX(score) AS top_score
    FROM packed GROUP BY query_id ORDER BY query_id
    """,
)
def q494_rag_context_packing(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """RAG context-window packing: for each query vector, retrieve
    the top-{RAG_TOPC} candidates by cosine, then PACK them into a
    {RAG_BUDGET}-token context in relevance order until the budget
    overflows (the standard stuff-the-context retrieval step, with a
    deterministic per-candidate token-cost fixture standing in for
    chunk lengths). Reports per query how many chunks fit, tokens
    used, and the relevance floor the budget forces — the quantity a
    RAG operator tunes chunk size against. Completes the retrieval
    shelf: q98/q382 score ranked lists, q249 re-ranks, q233 fuses;
    this is the step that turns a ranking into a prompt.

    Determinism: cosine on the ROUND-6 grid with cand_id tie-break;
    token costs and cumulative sums are pure integers; packing is a
    prefix rule (first overflow stops the context), so the kept set
    is a rank prefix — no knapsack ambiguity.

    Scale: broadcast query set x streamed corpus (q70's shape) with
    norms precomputed per side; the per-query top-{RAG_TOPC} is
    rank-filtered (WindowGroupLimit pre-limits every partition) and
    both windows partition by query_id. Nothing unpartitioned.
    """
    from .similarity import dot_double, norm_double

    emb = t(spark, sf_dir, "embeddings")
    q = (
        emb.filter(F.col("vec_id") < RAG_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
        )
        .withColumn("qn", norm_double("qe"))
    )
    c = (
        emb.filter(F.col("vec_id") >= RAG_QUERIES)
        .select(
            F.col("vec_id").alias("cand_id"),
            F.col("embedding").alias("ce"),
            (F.col("vec_id") % RAG_COST_MOD + 100).alias("cost"),
        )
        .withColumn("cn", norm_double("ce"))
    )
    scored = F.broadcast(q).join(c).select(
        "query_id",
        "cand_id",
        "cost",
        dround(
            dot_double("qe", "ce") / (F.col("qn") * F.col("cn")), 6
        ).alias("score"),
    )
    wrk = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("cand_id").asc()
    )
    pool = scored.withColumn("rk", F.row_number().over(wrk)).filter(
        F.col("rk") <= RAG_TOPC
    )
    wcum = (
        Window.partitionBy("query_id")
        .orderBy("rk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = pool.withColumn("cum", F.sum("cost").over(wcum))
    kept = F.col("cum") <= RAG_BUDGET
    return (
        packed.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pool"),
            F.sum(F.when(kept, 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.coalesce(F.max(F.when(kept, F.col("cum"))), F.lit(0))
            .cast("bigint")
            .alias("tokens_used"),
            F.min(F.when(kept, F.col("score"))).alias("min_kept_score"),
            F.max("score").alias("top_score"),
        )
        .orderBy("query_id")
    )

# ---------------------------------------------------------------------------
# q495 exact trimmed & winsorized means (distributed, no global sort)

TRIM_FRAC_NUM, TRIM_FRAC_DEN = 1, 10  # 10% two-sided trim


@register(
    "q495_trimmed_winsorized_mean",
    category="analytics-stats (regression/tests/causal)",
    oracle=f"""
    WITH c AS (
      SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM orders
    ),
    ranked AS (
      SELECT cents,
             ROW_NUMBER() OVER (ORDER BY cents, o_orderkey) AS rk,
             COUNT(*) OVER () AS n
      FROM c
    ),
    scal AS (
      SELECT CAST(MAX(n) AS BIGINT) AS n,
             CAST(MAX(n) * {TRIM_FRAC_NUM} // {TRIM_FRAC_DEN} AS BIGINT)
               AS t
      FROM ranked
    ),
    mid AS (
      SELECT CAST(SUM(r.cents) AS DECIMAL(38,0)) AS s_mid,
             CAST(COUNT(*) AS BIGINT) AS n_mid
      FROM ranked r, scal
      WHERE r.rk > scal.t AND r.rk <= scal.n - scal.t
    ),
    bounds AS (
      SELECT
        (SELECT cents FROM ranked, scal WHERE rk = scal.t + 1) AS lo_v,
        (SELECT cents FROM ranked, scal WHERE rk = scal.n - scal.t)
          AS hi_v
    ),
    plain AS (
      SELECT CAST(SUM(cents) AS DECIMAL(38,0)) AS s_all FROM c
    )
    SELECT scal.n AS n_rows, scal.t AS n_trimmed_each_side,
           (FLOOR(CAST(CAST(plain.s_all AS DOUBLE) / NULLIF(scal.n, 0) / 100 AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS mean,
           (FLOOR(CAST(CAST(mid.s_mid AS DOUBLE) / NULLIF(mid.n_mid, 0) / 100 AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS trimmed_mean,
           (FLOOR(CAST((CAST(mid.s_mid AS DOUBLE)
                  + scal.t * CAST(bounds.lo_v AS DOUBLE)
                  + scal.t * CAST(bounds.hi_v AS DOUBLE))
                 / NULLIF(scal.n, 0) / 100 AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS winsorized_mean,
           CAST(bounds.lo_v AS DOUBLE) / 100 AS lo_cut,
           CAST(bounds.hi_v AS DOUBLE) / 100 AS hi_cut
    FROM scal, mid, bounds, plain
    """,
)
def q495_trimmed_winsorized_mean(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT 10% two-sided trimmed and winsorized means of order
    totals WITHOUT a global sort — the robust-location pair beside
    q193's MAD (robust scale) and q444's median: trimming drops the
    t = floor(n/10) smallest/largest, winsorizing clamps them to the
    cut values, and both need exact order statistics plus an exact
    mid-range sum.

    Distributed shape (the q444/q484 generalization, here for EVERY
    row's rank, not one): 256 equi-width cent buckets from broadcast
    min/max bounds are order-contiguous, so global rank = bounded
    bucket-offset + in-bucket row_number — the in-bucket windows
    partition by bucket (parallel ~n/256 slices), the offset cumsum
    runs over the 256-row histogram. Rank ties collapse because the
    tie-break key (cents, o_orderkey) is unique.

    Determinism: cents are exact integers; the mid-range sum is an
    exact DECIMAL aggregate; cut values are order STATISTICS (values,
    not ranks); exact-integer-ratio doubles at the boundary with
    NULLIF for the degenerate n = 0 / all-trimmed corpora.
    """
    c = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    bounds = c.agg(
        F.min("cents").alias("lo"),
        F.max("cents").alias("hi"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    bucketed = c.crossJoin(F.broadcast(bounds)).withColumn(
        "bkt",
        F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
            F.expr("CAST((cents - lo) * 256 DIV (hi - lo + 1) AS BIGINT)")
        ),
    )
    woff = Window.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = (
        bucketed.groupBy("bkt")
        .agg(F.count(F.lit(1)).cast("bigint").alias("sz"))
        .select(
            "bkt",
            F.coalesce(F.sum("sz").over(woff), F.lit(0)).alias("off"),
        )
    )
    win_b = Window.partitionBy("bkt").orderBy("cents", "o_orderkey")
    ranked = (
        bucketed.join(F.broadcast(offs), "bkt")
        .withColumn("rk", F.col("off") + F.row_number().over(win_b))
        .withColumn(
            "t",
            F.expr(f"CAST(n * {TRIM_FRAC_NUM} DIV {TRIM_FRAC_DEN} AS BIGINT)"),
        )
    )
    mid = ranked.filter(
        (F.col("rk") > F.col("t")) & (F.col("rk") <= F.col("n") - F.col("t"))
    ).agg(
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s_mid"),
        F.count(F.lit(1)).cast("bigint").alias("n_mid"),
    )
    lo_v = ranked.filter(F.col("rk") == F.col("t") + 1).select(
        F.col("cents").alias("lo_v")
    )
    hi_v = ranked.filter(F.col("rk") == F.col("n") - F.col("t")).select(
        F.col("cents").alias("hi_v")
    )
    plain = c.agg(
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s_all")
    )
    scal = bounds.select(
        "n",
        F.expr(
            f"CAST(n * {TRIM_FRAC_NUM} DIV {TRIM_FRAC_DEN} AS BIGINT)"
        ).alias("t"),
    )
    out = (
        scal.crossJoin(F.broadcast(mid))
        .crossJoin(F.broadcast(lo_v))
        .crossJoin(F.broadcast(hi_v))
        .crossJoin(F.broadcast(plain))
    )
    return out.select(
        F.col("n").alias("n_rows"),
        F.col("t").alias("n_trimmed_each_side"),
        dround(
            F.col("s_all").cast("double")
            / F.nullif(F.col("n"), F.lit(0))
            / 100,
            6,
        ).alias("mean"),
        dround(
            F.col("s_mid").cast("double")
            / F.nullif(F.col("n_mid"), F.lit(0))
            / 100,
            6,
        ).alias("trimmed_mean"),
        dround(
            (
                F.col("s_mid").cast("double")
                + F.col("t") * F.col("lo_v").cast("double")
                + F.col("t") * F.col("hi_v").cast("double")
            )
            / F.nullif(F.col("n"), F.lit(0))
            / 100,
            6,
        ).alias("winsorized_mean"),
        (F.col("lo_v").cast("double") / 100).alias("lo_cut"),
        (F.col("hi_v").cast("double") / 100).alias("hi_cut"),
    )

# ---------------------------------------------------------------------------
# q496 sample-ratio-mismatch (SRM) check

SRM_SALT = "srm_r6"
CHI2_1DF_05 = 3.841459


@register(
    "q496_ab_srm_check",
    category="analytics-stats (regression/tests/causal)",
    oracle=f"""
    WITH assign AS (
      SELECT DISTINCT user_id,
             CAST(('0x' || substr(md5('{SRM_SALT}:'
                   || CAST(user_id AS VARCHAR)), 1, 7)) AS BIGINT) % 2
               AS grp
      FROM events
    ),
    first_day AS (
      SELECT e.user_id, a.grp, MIN(CAST(e.ts AS DATE)) AS d
      FROM events e JOIN assign a ON a.user_id = e.user_id
      GROUP BY e.user_id, a.grp
    ),
    daily AS (
      SELECT d,
             CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS na,
             CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS nb
      FROM first_day GROUP BY d
    ),
    per_day AS (
      SELECT d, na, nb,
             CAST((na - nb) * (na - nb) AS DOUBLE) / NULLIF(na + nb, 0)
               AS chi2
      FROM daily
    ),
    tot AS (
      SELECT CAST(SUM(na) AS BIGINT) AS na,
             CAST(SUM(nb) AS BIGINT) AS nb
      FROM daily
    ),
    worst AS (
      SELECT d, chi2 FROM per_day ORDER BY chi2 DESC, d LIMIT 1
    )
    SELECT t.na AS n_a, t.nb AS n_b,
           (FLOOR(CAST(CAST((t.na - t.nb) * (t.na - t.nb) AS DOUBLE)
                 / NULLIF(t.na + t.nb, 0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS srm_chi2,
           CAST(CASE WHEN CAST((t.na - t.nb) * (t.na - t.nb) AS DOUBLE)
                          / NULLIF(t.na + t.nb, 0) > {CHI2_1DF_05}
                     THEN 1 ELSE 0 END AS BIGINT) AS srm_detected,
           w.d AS worst_day,
           (FLOOR(CAST(w.chi2 AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS worst_day_chi2
    FROM tot t, worst w
    """,
)
def q496_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check — the FIRST gate any A/B readout
    must pass (before q151's effect z, q287's sequential looks, or
    q473's design effect mean anything): a 1-df chi-square of the
    observed 50/50 hash-assignment counts against the intended
    ratio, overall AND at enrollment-day grain (a broken bucketing
    deploy shows up as one divergent day long before the total
    drifts). SRM detected => the experiment is invalid, full stop.

    Determinism: assignment is the repo's portable md5-nibble idiom;
    counts are exact integers; chi2 = (na-nb)^2/(na+nb) is an exact
    integer ratio; the worst day resolves by (chi2 DESC, day) with a
    LIMIT 1 (TakeOrdered — no global window); NULLIF guards empty
    corpora.

    Scale: one user-grain reduce for enrollment day, one bounded
    day-grain aggregate, scalars.
    """
    ev = t(spark, sf_dir, "events")
    grp = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"{SRM_SALT}:"),
                        F.col("user_id").cast("string"),
                    )
                ),
                1,
                7,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    first_day = (
        ev.select("user_id", F.col("ts").cast("date").alias("d"))
        .groupBy("user_id")
        .agg(F.min("d").alias("d"))
        .withColumn("grp", grp)
    )
    daily = first_day.groupBy("d").agg(
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("na"),
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("nb"),
    )
    per_day = daily.select(
        "d",
        (
            ((F.col("na") - F.col("nb")) * (F.col("na") - F.col("nb")))
            .cast("double")
            / F.nullif(F.col("na") + F.col("nb"), F.lit(0))
        ).alias("chi2"),
    )
    tot = daily.agg(
        F.sum("na").cast("bigint").alias("na"),
        F.sum("nb").cast("bigint").alias("nb"),
    )
    worst = per_day.orderBy(F.col("chi2").desc(), F.col("d")).limit(1)
    chi2_tot = (
        ((F.col("na") - F.col("nb")) * (F.col("na") - F.col("nb")))
        .cast("double")
        / F.nullif(F.col("na") + F.col("nb"), F.lit(0))
    )
    return tot.crossJoin(F.broadcast(worst)).select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        dround(chi2_tot, 6).alias("srm_chi2"),
        F.when(chi2_tot > CHI2_1DF_05, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("srm_detected"),
        F.col("d").alias("worst_day"),
        dround(F.col("chi2"), 6).alias("worst_day_chi2"),
    )

# ---------------------------------------------------------------------------
# q497 Jonckheere-Terpstra ordered-alternative trend test

Z_95_TWO_SIDED = 1.959964


@register(
    "q497_jonckheere_terpstra",
    category="analytics-stats (regression/tests/causal)",
    oracle=f"""
    WITH vals AS (
      SELECT o_orderpriority AS grp,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS v
      FROM orders
    ),
    counts AS (
      SELECT v, grp, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM vals GROUP BY v, grp
    ),
    grid AS (SELECT DISTINCT v FROM vals),
    grps AS (SELECT DISTINCT grp FROM vals),
    lattice AS (
      SELECT g.v, p.grp, COALESCE(c.cnt, 0) AS cnt
      FROM grid g CROSS JOIN grps p
      LEFT JOIN counts c ON c.v = g.v AND c.grp = p.grp
    ),
    cum AS (
      SELECT v, grp, cnt,
             SUM(cnt) OVER (PARTITION BY grp ORDER BY v
                            ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) - cnt AS cumlt
      FROM lattice
    ),
    jt AS (
      SELECT CAST(SUM(CAST(b.cnt AS DECIMAL(19,0))
                      * (2 * a.cumlt + a.cnt)) AS DECIMAL(38,0)) AS jt2
      FROM cum a JOIN cum b ON b.v = a.v AND b.grp > a.grp
    ),
    sizes AS (
      SELECT CAST(SUM(ng) AS BIGINT) AS n,
             CAST(SUM(CAST(ng AS DECIMAL(19,0)) * ng) AS DECIMAL(38,0))
               AS sn2,
             CAST(SUM(CAST(ng AS DECIMAL(19,0)) * ng * (2 * ng + 3))
                  AS DECIMAL(38,0)) AS sn23,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM (SELECT grp, CAST(SUM(cnt) AS BIGINT) AS ng
            FROM counts GROUP BY grp)
    ),
    stat AS (
      SELECT s.n, s.k,
             CAST(j.jt2 AS DOUBLE) / 2 AS jt,
             (CAST(s.n AS DOUBLE) * s.n - CAST(s.sn2 AS DOUBLE)) / 4
               AS e_jt,
             (CAST(s.n AS DOUBLE) * s.n * (2 * s.n + 3)
              - CAST(s.sn23 AS DOUBLE)) / 72 AS var_jt
      FROM jt j, sizes s
    )
    SELECT n AS n_rows, k AS n_groups,
           (FLOOR(CAST(jt AS DOUBLE) * 10.0 + 0.5) / 10.0) AS jt_stat,
           (FLOOR(CAST(e_jt AS DOUBLE) * 10.0 + 0.5) / 10.0) AS jt_mean,
           (FLOOR(CAST((jt - e_jt) / NULLIF(SQRT(var_jt), 0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS z,
           CAST(CASE WHEN ABS((jt - e_jt) / NULLIF(SQRT(var_jt), 0))
                          > {Z_95_TWO_SIDED} THEN 1 ELSE 0 END
                AS BIGINT) AS significant_95
    FROM stat
    """,
)
def q497_jonckheere_terpstra(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Jonckheere-Terpstra test for an ORDERED alternative: do order
    totals trend monotonically across the ordered priority classes?
    JT = sum over ordered group pairs (g < h) of the Mann-Whitney
    count #(x_g < x_h) + ties/2 — strictly more powerful than
    Kruskal-Wallis/q376 when the alternative is a monotone trend,
    which is exactly the "does priority buy bigger orders" question.

    Determinism: JT is carried DOUBLED (2U = sum cnt_h*(2*cumlt_g +
    cnt_g)) so every term is exact integer arithmetic in DECIMAL(38)
    (JT is O(n^2) — a BIGINT would overflow at ~10^9 rows); the
    normal approximation uses the standard no-tie variance
    [n^2(2n+3) - sum n_g^2(2n_g+3)]/72 (documented choice — cent
    values make heavy ties rare) with identical double ops both
    sides; NULLIF guards the single-group corner.

    Scale: one (value, group) reduce; the per-group cumulative over
    the near-unique value grain is RECONSTRUCTED from 256 equi-width
    cent buckets (in-bucket cumsums partition by (group, bucket);
    offsets cumulate over the bounded (group x bucket) histogram
    PARTITIONED BY GROUP — no unpartitioned window anywhere); the
    pair join runs at (value x group-pair) grain.
    """
    vals = t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("v"),
    )
    counts = vals.groupBy("v", "grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    grid = vals.select("v").distinct()
    grps = vals.select("grp").distinct()
    lattice = (
        grid.crossJoin(F.broadcast(grps))
        .join(counts, ["v", "grp"], "left")
        .select(
            "v", "grp", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
        )
    )
    bounds = grid.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    bucketed = lattice.crossJoin(F.broadcast(bounds)).withColumn(
        "bkt",
        F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
            F.expr("CAST((v - lo) * 256 DIV (hi - lo + 1) AS BIGINT)")
        ),
    )
    woff = Window.partitionBy("grp").orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = (
        bucketed.groupBy("grp", "bkt")
        .agg(F.sum("cnt").cast("bigint").alias("bsum"))
        .select(
            "grp",
            "bkt",
            F.coalesce(F.sum("bsum").over(woff), F.lit(0)).alias("off"),
        )
    )
    win_b = (
        Window.partitionBy("grp", "bkt")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = bucketed.join(F.broadcast(offs), ["grp", "bkt"]).select(
        "v",
        "grp",
        "cnt",
        (F.col("off") + F.sum("cnt").over(win_b) - F.col("cnt")).alias(
            "cumlt"
        ),
    )
    a = cum.select(
        F.col("v").alias("va"),
        F.col("grp").alias("ga"),
        F.col("cnt").alias("cnta"),
        "cumlt",
    )
    b = cum.select(
        F.col("v").alias("vb"),
        F.col("grp").alias("gb"),
        F.col("cnt").alias("cntb"),
    )
    jt = a.join(
        b, (F.col("vb") == F.col("va")) & (F.col("gb") > F.col("ga"))
    ).agg(
        F.sum(
            F.col("cntb").cast("decimal(19,0)")
            * (2 * F.col("cumlt") + F.col("cnta"))
        )
        .cast("decimal(38,0)")
        .alias("jt2")
    )
    sizes = (
        counts.groupBy("grp")
        .agg(F.sum("cnt").cast("bigint").alias("ng"))
        .agg(
            F.sum("ng").cast("bigint").alias("n"),
            F.sum(F.col("ng").cast("decimal(19,0)") * F.col("ng"))
            .cast("decimal(38,0)")
            .alias("sn2"),
            F.sum(
                F.col("ng").cast("decimal(19,0)")
                * F.col("ng")
                * (2 * F.col("ng") + 3)
            )
            .cast("decimal(38,0)")
            .alias("sn23"),
            F.count(F.lit(1)).cast("bigint").alias("k"),
        )
    )
    stat = jt.crossJoin(F.broadcast(sizes)).select(
        "n",
        "k",
        (F.col("jt2").cast("double") / 2).alias("jt"),
        (
            (F.col("n").cast("double") * F.col("n")
             - F.col("sn2").cast("double"))
            / 4
        ).alias("e_jt"),
        (
            (
                F.col("n").cast("double") * F.col("n") * (2 * F.col("n") + 3)
                - F.col("sn23").cast("double")
            )
            / 72
        ).alias("var_jt"),
    )
    z = (F.col("jt") - F.col("e_jt")) / F.nullif(
        F.sqrt(F.col("var_jt")), F.lit(0.0)
    )
    return stat.select(
        F.col("n").alias("n_rows"),
        F.col("k").alias("n_groups"),
        dround("jt", 1).alias("jt_stat"),
        dround("e_jt", 1).alias("jt_mean"),
        dround(z, 6).alias("z"),
        F.when(F.abs(z) > Z_95_TWO_SIDED, 1)
        .otherwise(0)
        .cast("bigint")
        .alias("significant_95"),
    )

# ---------------------------------------------------------------------------
# q498 merge-on-read vs copy-on-write table-format advisor


@register(
    "q498_mor_cow_advisor",
    category="mixed-extensions",
    oracle="""
    WITH firstd AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS home
      FROM events GROUP BY user_id
    ),
    classified AS (
      SELECT CAST(e.ts AS DATE) AS d, f.home,
             CASE WHEN CAST(e.ts AS DATE) = f.home THEN 0 ELSE 1 END
               AS is_update
      FROM events e JOIN firstd f ON f.user_id = e.user_id
    ),
    psize AS (
      SELECT home AS p, CAST(COUNT(*) AS BIGINT) AS rows_
      FROM classified WHERE is_update = 0 GROUP BY home
    ),
    touched AS (
      SELECT DISTINCT d, home AS p FROM classified WHERE is_update = 1
    ),
    cow AS (
      SELECT CAST(SUM(ps.rows_) AS BIGINT) AS cow_write_rows,
             CAST(COUNT(*) AS BIGINT) AS partition_rewrites
      FROM touched t JOIN psize ps ON ps.p = t.p
    ),
    tot AS (
      SELECT CAST(SUM(1 - is_update) AS BIGINT) AS n_inserts,
             CAST(SUM(is_update) AS BIGINT) AS n_updates
      FROM classified
    )
    SELECT t.n_inserts, t.n_updates,
           c.partition_rewrites,
           c.cow_write_rows,
           t.n_updates AS mor_write_rows,
           (FLOOR(CAST(CAST(c.cow_write_rows AS DOUBLE)
                 / NULLIF(t.n_updates, 0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS cow_write_amplification,
           (FLOOR(CAST(CAST(t.n_updates AS DOUBLE)
                 / NULLIF(t.n_inserts, 0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS mor_read_overhead,
           CASE WHEN CAST(c.cow_write_rows AS DOUBLE)
                     / NULLIF(t.n_updates, 0) >
                     10 * (1 + CAST(t.n_updates AS DOUBLE)
                               / NULLIF(t.n_inserts, 0))
                THEN 'merge-on-read' ELSE 'copy-on-write' END
             AS recommendation
    FROM tot t, cow c
    """,
)
def q498_mor_cow_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read vs copy-on-write advisor — the Iceberg/Delta/
    Hudi table-format decision, computed from the workload itself: a
    user's first event is an INSERT into their home (first-day)
    partition, every later event is an UPDATE targeting it. CoW
    rewrites each touched partition once per day it is touched
    (write_rows = sum of touched-partition sizes); MoR writes only
    the update deltas but taxes every read with a merge
    (read_overhead = deltas/base). Recommend MoR when CoW's write
    amplification exceeds 10x the MoR read tax — the knob a lakehouse
    operator actually turns. Completes the table-maintenance shelf:
    q432 certifies IVM, q433 plans compaction, q447 certifies CDC
    MERGE; this chooses the write path those ops run on.

    Determinism: insert/update classification is an exact MIN-date
    join; every quantity is an integer count until the two final
    ratios; NULLIF guards empty corpora; the recommendation threshold
    is a literal.

    Scale: one user-grain reduce, one fact-grain classify join
    (user-keyed, no skew beyond the data's own), and the
    (day x partition) touched set — bounded by calendar^2, not
    corpus. No windows.
    """
    ev = t(spark, sf_dir, "events")
    firstd = (
        ev.select("user_id", F.col("ts").cast("date").alias("d"))
        .groupBy("user_id")
        .agg(F.min("d").alias("home"))
    )
    classified = (
        ev.select("user_id", F.col("ts").cast("date").alias("d"))
        .join(firstd, "user_id")
        .select(
            "d",
            "home",
            F.when(F.col("d") == F.col("home"), 0)
            .otherwise(1)
            .alias("is_update"),
        )
    )
    psize = (
        classified.filter(F.col("is_update") == 0)
        .groupBy(F.col("home").alias("p"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("rows_"))
    )
    touched = (
        classified.filter(F.col("is_update") == 1)
        .select("d", F.col("home").alias("p"))
        .distinct()
    )
    cow = touched.join(psize, "p").agg(
        F.sum("rows_").cast("bigint").alias("cow_write_rows"),
        F.count(F.lit(1)).cast("bigint").alias("partition_rewrites"),
    )
    tot = classified.agg(
        F.sum(1 - F.col("is_update")).cast("bigint").alias("n_inserts"),
        F.sum("is_update").cast("bigint").alias("n_updates"),
    )
    out = tot.crossJoin(F.broadcast(cow))
    cow_amp = F.col("cow_write_rows").cast("double") / F.nullif(
        F.col("n_updates"), F.lit(0)
    )
    mor_tax = F.col("n_updates").cast("double") / F.nullif(
        F.col("n_inserts"), F.lit(0)
    )
    return out.select(
        "n_inserts",
        "n_updates",
        "partition_rewrites",
        "cow_write_rows",
        F.col("n_updates").alias("mor_write_rows"),
        dround(cow_amp, 6).alias("cow_write_amplification"),
        dround(mor_tax, 6).alias("mor_read_overhead"),
        F.when(cow_amp > 10 * (1 + mor_tax), "merge-on-read")
        .otherwise("copy-on-write")
        .alias("recommendation"),
    )

# ---------------------------------------------------------------------------
# q499 intra-document code-switch (language-mixture) audit

CS_PROFILE_K = 20  # q82's per-lang trigram profile width


@register(
    "q499_code_switch_audit",
    category="llm-text-analysis",
    oracle=f"""
    WITH grams AS (
      SELECT doc_id, lang, substr(text, i + 1, 3) AS tri
      FROM documents, UNNEST(range(length(text) - 2)) AS u(i)
      WHERE length(text) >= 6
    ),
    profile_counts AS (
      SELECT lang, tri, COUNT(*) AS cnt
      FROM grams GROUP BY lang, tri
    ),
    profile AS (
      SELECT lang, tri, cnt FROM (
        SELECT lang, tri, cnt,
               ROW_NUMBER() OVER (
                 PARTITION BY lang ORDER BY cnt DESC, tri ASC
               ) AS rk
        FROM profile_counts
      ) WHERE rk <= {CS_PROFILE_K}
    ),
    halves AS (
      SELECT doc_id, source, 1 AS half,
             substr(text, 1, length(text) // 2) AS seg
      FROM documents WHERE length(text) >= 6
      UNION ALL
      SELECT doc_id, source, 2 AS half,
             substr(text, length(text) // 2 + 1,
                    length(text) - length(text) // 2) AS seg
      FROM documents WHERE length(text) >= 6
    ),
    half_tris AS (
      SELECT DISTINCT doc_id, source, half, substr(seg, i + 1, 3) AS tri
      FROM halves, UNNEST(range(length(seg) - 2)) AS u(i)
      WHERE length(seg) >= 3
    ),
    scores AS (
      SELECT h.doc_id, h.source, h.half, p.lang AS cand_lang,
             CAST(SUM(p.cnt) AS BIGINT) AS score
      FROM half_tris h JOIN profile p ON p.tri = h.tri
      GROUP BY h.doc_id, h.source, h.half, p.lang
    ),
    best AS (
      SELECT doc_id, source, half, cand_lang FROM (
        SELECT doc_id, source, half, cand_lang,
               ROW_NUMBER() OVER (
                 PARTITION BY doc_id, half
                 ORDER BY score DESC, cand_lang ASC
               ) AS rk
        FROM scores
      ) WHERE rk = 1
    ),
    paired AS (
      SELECT a.doc_id, a.source,
             CASE WHEN a.cand_lang <> b.cand_lang THEN 1 ELSE 0 END
               AS mixed
      FROM best a JOIN best b
        ON b.doc_id = a.doc_id AND a.half = 1 AND b.half = 2
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_scored,
           CAST(SUM(mixed) AS BIGINT) AS n_mixed,
           CAST(SUM(mixed) AS DOUBLE) / COUNT(*) AS mixed_rate
    FROM paired GROUP BY source ORDER BY source
    """,
)
def q499_code_switch_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document code-switch audit: split every document into
    two character halves, language-ID each half independently with
    the corpus-trained top-{CS_PROFILE_K} trigram profiles (q82's
    detector), and flag documents whose halves DISAGREE — mixed-
    language documents that a doc-level lang label (and doc-level
    lang-ID like q82/q191/q377) silently mislabels, poisoning
    monolingual training mixtures. Reports per-source mixed rates;
    docs where either half draws no profile hit drop from the
    denominator (no prediction, both engines).

    Determinism: profiles and scores are pure integer counts with
    (score DESC, lang ASC) argmax tie-breaks; rates are exact
    integer ratios.

    Scale: q82's plan shape x2 — profile branch partial-aggregates
    the trigram stream to vocabulary grain before its exchange; the
    half-scoring branch explodes in-row-deduped trigrams into the
    broadcast profile join, so its exchange runs at
    (doc, half) x cand_lang grain. The per-(doc, half) argmax
    windows partition by doc — nothing unpartitioned.
    """
    docs = fan_out(
        t(spark, sf_dir, "documents").filter(F.length("text") >= 6)
    )
    tri_expr = (
        "transform(sequence(1, length(text) - 2),"
        " i -> substring(text, i, 3))"
    )
    profile_counts = (
        docs.select("lang", F.explode(F.expr(tri_expr)).alias("tri"))
        .groupBy("lang", "tri")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wprof = Window.partitionBy("lang").orderBy(
        F.col("cnt").desc(), F.col("tri").asc()
    )
    profile = (
        profile_counts.withColumn("rk", F.row_number().over(wprof))
        .filter(F.col("rk") <= CS_PROFILE_K)
        .select(F.col("lang").alias("cand_lang"), "tri", "cnt")
    )
    h1 = docs.select(
        "doc_id",
        "source",
        F.lit(1).alias("half"),
        F.expr("substring(text, 1, length(text) DIV 2)").alias("seg"),
    )
    h2 = docs.select(
        "doc_id",
        "source",
        F.lit(2).alias("half"),
        F.expr(
            "substring(text, length(text) DIV 2 + 1,"
            " length(text) - length(text) DIV 2)"
        ).alias("seg"),
    )
    seg_tris = (
        h1.unionByName(h2)
        .filter(F.length("seg") >= 3)
        .select(
            "doc_id",
            "source",
            "half",
            F.explode(
                F.expr(
                    "array_distinct(transform("
                    "sequence(1, length(seg) - 2),"
                    " i -> substring(seg, i, 3)))"
                )
            ).alias("tri"),
        )
    )
    scores = (
        seg_tris.join(F.broadcast(profile), "tri")
        .groupBy("doc_id", "source", "half", "cand_lang")
        .agg(F.sum("cnt").cast("bigint").alias("score"))
    )
    wbest = Window.partitionBy("doc_id", "half").orderBy(
        F.col("score").desc(), F.col("cand_lang").asc()
    )
    best = (
        scores.withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .select("doc_id", "source", "half", "cand_lang")
    )
    a = best.filter(F.col("half") == 1).select(
        "doc_id", "source", F.col("cand_lang").alias("l1")
    )
    b = best.filter(F.col("half") == 2).select(
        "doc_id", F.col("cand_lang").alias("l2")
    )
    paired = a.join(b, "doc_id").select(
        "source",
        F.when(F.col("l1") != F.col("l2"), 1).otherwise(0).alias("mixed"),
    )
    return (
        paired.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_scored"),
            F.sum("mixed").cast("bigint").alias("n_mixed"),
            (
                F.sum("mixed").cast("double") / F.count(F.lit(1))
            ).alias("mixed_rate"),
        )
        .orderBy("source")
    )

# ---------------------------------------------------------------------------
# q500 histogram bin-count advisor (Sturges / Scott / Freedman-Diaconis)


@register(
    "q500_histogram_bin_advisor",
    category="mixed-extensions",
    oracle="""
    WITH c AS (
      SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM orders
    ),
    m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MIN(cents) AS BIGINT) AS lo,
             CAST(MAX(cents) AS BIGINT) AS hi,
             CAST(SUM(cents) AS DECIMAL(38,0)) AS s,
             CAST(SUM(CAST(cents AS DECIMAL(19,0)) * cents)
                  AS DECIMAL(38,0)) AS q
      FROM c
    ),
    ranked AS (
      SELECT cents, ROW_NUMBER() OVER (ORDER BY cents, o_orderkey) AS rk
      FROM c
    ),
    quart AS (
      SELECT
        (SELECT cents FROM ranked, m
         WHERE rk = GREATEST(1, CAST(ceil(0.25 * m.n) AS BIGINT))) AS q1,
        (SELECT cents FROM ranked, m
         WHERE rk = GREATEST(1, CAST(ceil(0.75 * m.n) AS BIGINT))) AS q3
    ),
    stat AS (
      SELECT m.n, m.lo, m.hi,
             SQRT((m.n * CAST(m.q AS DOUBLE)
                   - CAST(m.s AS DOUBLE) * CAST(m.s AS DOUBLE))
                  / (CAST(m.n AS DOUBLE) * NULLIF(m.n - 1, 0))) AS sigma,
             CAST(qt.q3 - qt.q1 AS DOUBLE) AS iqr
      FROM m, quart qt
    )
    SELECT n AS n_rows,
           (FLOOR(CAST(sigma / 100 AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS sigma,
           (FLOOR(CAST(iqr / 100 AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS iqr,
           CAST(CEIL(LN(n) / LN(2)) + 1 AS BIGINT) AS k_sturges,
           CAST(CEIL((hi - lo)
                / NULLIF(3.5 * sigma / EXP(LN(CAST(n AS DOUBLE)) / 3),
                         0)) AS BIGINT) AS k_scott,
           CAST(CEIL((hi - lo)
                / NULLIF(2 * iqr / EXP(LN(CAST(n AS DOUBLE)) / 3), 0))
                AS BIGINT) AS k_fd
    FROM stat
    """,
)
def q500_histogram_bin_advisor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Histogram bin-count advisor: Sturges (ceil(log2 n)+1), Scott
    (3.5 sigma n^-1/3), and Freedman-Diaconis (2 IQR n^-1/3) bin
    recommendations for the order-total distribution — the rule
    choice behind every histogram op in the registry (q186 builds
    equi-depth, q416 optimizes boundaries, q131 reads CDFs; this
    picks HOW MANY bins a fixed-width layout should use, and FD vs
    Scott quantifies how much the heavy tail inflates sigma).

    Determinism: moments are exact BIGINT/DECIMAL sums; the
    quartiles are exact order statistics at ceil(n/4)/ceil(3n/4)
    (values, not interpolations) selected WITHOUT a global sort (the
    q444/q375 two-target bucket selection); n^(1/3) runs as
    EXP(LN(n)/3) with identical op order on both engines (the
    POWER-avoidance rule); NULLIF guards the all-equal corpus
    (sigma = IQR = 0 -> NULL recommendations, honestly).

    Scale: one scalar-moment scan + a 256-bucket histogram + two
    bucket-slice ranks; no global sort, no unpartitioned windows.
    """
    c = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )
    m = c.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.min("cents").cast("bigint").alias("lo"),
        F.max("cents").cast("bigint").alias("hi"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s"),
        F.sum(F.col("cents").cast("decimal(19,0)") * F.col("cents"))
        .cast("decimal(38,0)")
        .alias("q"),
    )
    bucketed = c.crossJoin(F.broadcast(m.select("n", "lo", "hi"))).withColumn(
        "bkt",
        F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
            F.expr("CAST((cents - lo) * 256 DIV (hi - lo + 1) AS BIGINT)")
        ),
    )
    woff = Window.orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    hist = (
        bucketed.groupBy("bkt")
        .agg(F.count(F.lit(1)).cast("bigint").alias("sz"))
        .select(
            "bkt",
            "sz",
            F.coalesce(F.sum("sz").over(woff), F.lit(0)).alias("cb"),
        )
    )
    targets = (
        spark.range(2)
        .select(
            F.when(F.col("id") == 0, "q1").otherwise("q3").alias("which"),
            F.when(F.col("id") == 0, 0.25).otherwise(0.75).alias("p"),
        )
        .crossJoin(F.broadcast(m.select("n")))
        .select(
            "which",
            F.greatest(
                F.lit(1), F.ceil(F.col("p") * F.col("n")).cast("bigint")
            ).alias("k"),
        )
        .join(
            F.broadcast(hist),
            (F.col("cb") < F.col("k"))
            & (F.col("k") <= F.col("cb") + F.col("sz")),
        )
        .select("which", "k", "bkt", "cb")
    )
    picked = (
        bucketed.join(F.broadcast(targets), "bkt")
        .withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy("which", "bkt").orderBy(
                    "cents", "o_orderkey"
                )
            ),
        )
        .filter(F.col("r") == F.col("k") - F.col("cb"))
        .select("which", "cents")
    )
    q1 = picked.filter(F.col("which") == "q1").select(
        F.col("cents").alias("q1")
    )
    q3 = picked.filter(F.col("which") == "q3").select(
        F.col("cents").alias("q3")
    )
    stat = (
        m.crossJoin(F.broadcast(q1))
        .crossJoin(F.broadcast(q3))
        .select(
            "n",
            "lo",
            "hi",
            F.sqrt(
                (
                    F.col("n") * F.col("q").cast("double")
                    - F.col("s").cast("double") * F.col("s").cast("double")
                )
                / (
                    F.col("n").cast("double")
                    * F.nullif(F.col("n") - 1, F.lit(0))
                )
            ).alias("sigma"),
            (F.col("q3") - F.col("q1")).cast("double").alias("iqr"),
        )
    )
    cuberoot = F.exp(F.log(F.col("n").cast("double")) / 3)
    return stat.select(
        F.col("n").alias("n_rows"),
        dround(F.col("sigma") / 100, 4).alias("sigma"),
        dround(F.col("iqr") / 100, 4).alias("iqr"),
        (F.ceil(F.log(F.col("n").cast("double")) / F.log(F.lit(2.0))) + 1)
        .cast("bigint")
        .alias("k_sturges"),
        F.ceil(
            (F.col("hi") - F.col("lo"))
            / F.nullif(3.5 * F.col("sigma") / cuberoot, F.lit(0.0))
        )
        .cast("bigint")
        .alias("k_scott"),
        F.ceil(
            (F.col("hi") - F.col("lo"))
            / F.nullif(2 * F.col("iqr") / cuberoot, F.lit(0.0))
        )
        .cast("bigint")
        .alias("k_fd"),
    )
