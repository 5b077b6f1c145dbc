"""Classic warehouse-analytics and corpus-prep patterns over the
events/lineitem/documents fixtures: gaps-and-islands streaks, exact
distributed statistical moments, cohort retention, RFM segmentation,
interpolation resampling, Markov transitions, rolling distinct
counts, dwell times, cross-source contamination, document chunking,
and training sequence packing.

The reference codec has no analytics surface at all (SURVEY.md §2b —
the 19-file census contains only stream compression); these queries
are part of the engine's north-star extension set, expressed
Spark-first and DuckDB-oracle-checked.

Determinism notes follow `_util`: counts and decimal-cast sums are
exact; every derived double is produced by the *same* sequence of
IEEE operations on identical operands in both engines, so comparisons
and hashes match bit-for-bit without rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ._util import dround, dsum, fan_out, t, ts


@register(
    "q116_activity_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    seq AS (
      SELECT user_id, d,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS rn
      FROM days
    ),
    islands AS (
      SELECT user_id, d - CAST(rn AS INTEGER) AS anchor,
             COUNT(*) AS streak_len
      FROM seq
      GROUP BY user_id, d - CAST(rn AS INTEGER)
    )
    SELECT user_id,
           MAX(streak_len) AS max_streak,
           COUNT(*) AS n_streaks,
           CAST(SUM(streak_len) AS BIGINT) AS active_days
    FROM islands
    GROUP BY user_id
    """,
)
def q116_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user consecutive-day activity streaks.

    The classic trick — ``day - row_number()`` is constant within a
    run of consecutive days — turns streak detection into a plain
    groupBy, with no self-join and no iterative logic.

    Scale: the window partitions by user_id (never global), and its
    input is the *distinct* (user, day) set — bounded by users ×
    calendar days, far smaller than raw events. Everything after is
    two keyed aggregations on the same user_id partitioning, which
    Catalyst plans without an extra exchange.
    """
    ev = t(spark, sf_dir, "events")
    days = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = (
        days.withColumn("rn", F.row_number().over(w))
        .withColumn("anchor", F.date_sub(F.col("d"), F.col("rn")))
        .groupBy("user_id", "anchor")
        .agg(F.count(F.lit(1)).alias("streak_len"))
    )
    return islands.groupBy("user_id").agg(
        F.max("streak_len").alias("max_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.sum("streak_len").alias("active_days"),
    )


@register(
    "q117_stats_moments",
    oracle="""
    SELECT l_returnflag, n_rows,
           (n * sxy - sx * sy)
             / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy))
             AS corr_qty_price,
           (sxy - sx * sy / n) / (n - 1.0) AS covar_qty_price,
           (sxx - sx * sx / n) / (n - 1.0) AS var_qty,
           SQRT((syy - sy * sy / n) / (n - 1.0)) AS stddev_price
    FROM (
      SELECT l_returnflag,
             COUNT(*) AS n_rows,
             CAST(COUNT(*) AS DOUBLE) AS n,
             -- DECIMAL(38,·) sums are int128-backed in DuckDB, whose
             -- direct ->DOUBLE cast is not correctly rounded (off by
             -- one ulp vs Spark's BigDecimal path); the VARCHAR
             -- round-trip forces a correctly-rounded parse.
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS VARCHAR) AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS syy,
             CAST(CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE) AS sxy
      FROM lineitem
      GROUP BY l_returnflag
    ) s
    """,
)
def q117_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation / covariance / variance per group via exact
    sufficient statistics (n, Σx, Σy, Σx², Σy², Σxy).

    Built-in ``corr``/``covar_samp`` stream doubles in partition
    order, so their results differ across engines and even across
    runs; accumulating the five sums as DECIMAL(38,·) instead makes
    the sufficient statistics exact integers (inputs carry ≤2
    decimals, products ≤4), and the closed-form moments then come out
    of identical IEEE arithmetic in any engine.

    Scale: one partial+final aggregation pass — the sufficient
    statistics are trivially mergeable, which is exactly why this
    formulation (not a two-pass mean-then-deviation loop) is the
    100 TB shape. DECIMAL(38,4) headroom: Σ(price²) at 100 TB TPC-H
    is ~10²⁰, well under the 10³⁴ cap.
    """
    li = t(spark, sf_dir, "lineitem")
    qty, price = F.col("l_quantity"), F.col("l_extendedprice")
    stats = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(qty.cast("decimal(38,2)")).cast("double").alias("sx"),
        F.sum(price.cast("decimal(38,2)")).cast("double").alias("sy"),
        F.sum((qty * qty).cast("decimal(38,4)")).cast("double").alias("sxx"),
        F.sum((price * price).cast("decimal(38,4)")).cast("double").alias("syy"),
        F.sum((qty * price).cast("decimal(38,4)")).cast("double").alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    return stats.select(
        "l_returnflag",
        "n_rows",
        ((n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))).alias(
            "corr_qty_price"
        ),
        ((sxy - sx * sy / n) / (n - 1.0)).alias("covar_qty_price"),
        ((sxx - sx * sx / n) / (n - 1.0)).alias("var_qty"),
        F.sqrt((syy - sy * sy / n) / (n - 1.0)).alias("stddev_price"),
    )


@register(
    "q118_cohort_retention",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    firstd AS (
      SELECT user_id, MIN(d) AS cohort_d FROM ud GROUP BY user_id
    ),
    sizes AS (
      SELECT cohort_d, COUNT(*) AS cohort_size FROM firstd GROUP BY cohort_d
    )
    SELECT f.cohort_d,
           CAST(FLOOR(date_diff('day', f.cohort_d, u.d) / 7.0) AS BIGINT)
             AS week_offset,
           s.cohort_size,
           COUNT(DISTINCT u.user_id) AS n_active,
           CAST(COUNT(DISTINCT u.user_id) AS DOUBLE) / s.cohort_size
             AS retention
    FROM ud u
    JOIN firstd f ON u.user_id = f.user_id
    JOIN sizes s ON s.cohort_d = f.cohort_d
    GROUP BY f.cohort_d,
             CAST(FLOOR(date_diff('day', f.cohort_d, u.d) / 7.0) AS BIGINT),
             s.cohort_size
    """,
)
def q118_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day,
    tracked by week-offset activity, with retention as a fraction of
    cohort size.

    Scale: ONE user_id aggregation collects each user's distinct
    active days (bounded by the calendar, not event volume — with
    map-side partial aggregation, so the shuffle moves day-sets, not
    events) and derives the cohort day as its minimum. Exploding to
    (user, cohort, week) rows and de-duplicating makes the final
    count a plain COUNT — no two-phase countDistinct — and the
    cohort-size table is dates-sized and broadcast. Half the
    exchanges of the naive distinct→first-seen→join→countDistinct
    plan.
    """
    ev = t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.collect_set(F.col("ts").cast("date")).alias("days")
    )
    uw = (
        per_user.select(
            "user_id",
            F.array_min("days").alias("cohort_d"),
            F.explode("days").alias("d"),
        )
        .select(
            "user_id",
            "cohort_d",
            F.floor(F.datediff(F.col("d"), F.col("cohort_d")) / 7.0)
            .cast("bigint")
            .alias("week_offset"),
        )
        .dropDuplicates(["user_id", "cohort_d", "week_offset"])
    )
    sizes = per_user.groupBy(F.array_min("days").alias("cohort_d")).agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        uw.groupBy("cohort_d", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(F.broadcast(sizes), "cohort_d")
        .select(
            "cohort_d",
            "week_offset",
            "cohort_size",
            "n_active",
            (F.col("n_active").cast("double") / F.col("cohort_size")).alias(
                "retention"
            ),
        )
    )


@register(
    "q119_rfm_segments",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             COUNT(*) AS freq,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS monetary,
             MAX(CAST(ts AS DATE)) AS last_d
      FROM events
      WHERE event_type = 'purchase'
      GROUP BY user_id
    ),
    stats AS (
      SELECT MAX(last_d) AS anchor_d,
             CAST(SUM(freq) AS DOUBLE) / COUNT(*) AS avg_freq,
             CAST(SUM(CAST(monetary AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_monetary
      FROM per_user
    )
    SELECT user_id,
           CAST(date_diff('day', last_d, anchor_d) AS BIGINT) AS recency_days,
           freq, monetary,
           CASE WHEN date_diff('day', last_d, anchor_d) <= 3 THEN 3
                WHEN date_diff('day', last_d, anchor_d) <= 10 THEN 2
                ELSE 1 END AS r_score,
           CASE WHEN freq >= 1.25 * avg_freq THEN 3
                WHEN freq >= 0.75 * avg_freq THEN 2
                ELSE 1 END AS f_score,
           CASE WHEN monetary >= 1.25 * avg_monetary THEN 3
                WHEN monetary >= 0.75 * avg_monetary THEN 2
                ELSE 1 END AS m_score,
           CASE WHEN date_diff('day', last_d, anchor_d) <= 3
                     AND freq >= 1.25 * avg_freq
                     AND monetary >= 1.25 * avg_monetary THEN 'champion'
                WHEN date_diff('day', last_d, anchor_d) <= 10
                     AND freq >= 0.75 * avg_freq THEN 'loyal'
                WHEN date_diff('day', last_d, anchor_d) > 10
                     AND monetary >= 1.25 * avg_monetary THEN 'at_risk'
                ELSE 'casual' END AS segment
    FROM per_user CROSS JOIN stats
    """,
)
def q119_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation
    with corpus-relative score thresholds.

    Thresholds derive from global purchase statistics (latest
    purchase date, average frequency, average spend) broadcast as a
    1-row table — so the scoring is a pure row-wise expression, no
    global rank/ntile window (SURVEY.md §8: no global-order windows;
    rank-based quantiles are covered by q28/q38). Corpus-relative
    cutoffs also keep the segmentation meaningful at any scale
    factor.

    Determinism: freq/counts are integers, monetary is an exact
    decimal sum, and every threshold (1.25·avg etc.) is the same IEEE
    expression on identical operands in both engines.
    """
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("freq"),
        dsum(F.col("value")).alias("monetary"),
        F.max(F.col("ts").cast("date")).alias("last_d"),
    )
    stats = per_user.agg(
        F.max("last_d").alias("anchor_d"),
        (F.sum("freq").cast("double") / F.count(F.lit(1))).alias("avg_freq"),
        (dsum(F.col("monetary")) / F.count(F.lit(1))).alias("avg_monetary"),
    )
    rec = F.datediff(F.col("anchor_d"), F.col("last_d"))
    freq, mon = F.col("freq"), F.col("monetary")
    af, am = F.col("avg_freq"), F.col("avg_monetary")
    r_score = F.when(rec <= 3, 3).when(rec <= 10, 2).otherwise(1)
    f_score = F.when(freq >= 1.25 * af, 3).when(freq >= 0.75 * af, 2).otherwise(1)
    m_score = F.when(mon >= 1.25 * am, 3).when(mon >= 0.75 * am, 2).otherwise(1)
    segment = (
        F.when((rec <= 3) & (freq >= 1.25 * af) & (mon >= 1.25 * am), "champion")
        .when((rec <= 10) & (freq >= 0.75 * af), "loyal")
        .when((rec > 10) & (mon >= 1.25 * am), "at_risk")
        .otherwise("casual")
    )
    return per_user.crossJoin(F.broadcast(stats)).select(
        "user_id",
        rec.cast("bigint").alias("recency_days"),
        "freq",
        "monetary",
        r_score.alias("r_score"),
        f_score.alias("f_score"),
        m_score.alias("m_score"),
        segment.alias("segment"),
    )


@register(
    "q120_interp_resample",
    oracle="""
    WITH obs AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS v
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    bounds AS (
      SELECT user_id, MIN(d) AS min_d, MAX(d) AS max_d FROM obs GROUP BY user_id
    ),
    spine AS (
      SELECT user_id,
             CAST(UNNEST(generate_series(CAST(min_d AS TIMESTAMP),
                                         CAST(max_d AS TIMESTAMP),
                                         INTERVAL 1 DAY)) AS DATE) AS d
      FROM bounds
    ),
    filled AS (
      SELECT s.user_id, s.d, o.v,
             LAST_VALUE(CASE WHEN o.v IS NOT NULL THEN o.d END IGNORE NULLS)
               OVER (PARTITION BY s.user_id ORDER BY s.d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_d,
             LAST_VALUE(o.v IGNORE NULLS)
               OVER (PARTITION BY s.user_id ORDER BY s.d
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
             FIRST_VALUE(CASE WHEN o.v IS NOT NULL THEN o.d END IGNORE NULLS)
               OVER (PARTITION BY s.user_id ORDER BY s.d
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_d,
             FIRST_VALUE(o.v IGNORE NULLS)
               OVER (PARTITION BY s.user_id ORDER BY s.d
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v
      FROM spine s LEFT JOIN obs o ON s.user_id = o.user_id AND s.d = o.d
    )
    SELECT user_id, d, v,
           CASE WHEN v IS NOT NULL THEN v
                WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                THEN prev_v + (next_v - prev_v)
                       * (CAST(date_diff('day', prev_d, d) AS DOUBLE)
                          / CAST(date_diff('day', prev_d, next_d) AS DOUBLE))
                ELSE NULL END AS v_filled
    FROM filled
    """,
)
def q120_interp_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling with linear interpolation: each user's
    daily average value on a gap-free per-user day spine, missing
    days filled by interpolating between the surrounding
    observations (timescale/pandas-`interpolate` semantics).

    The neighbor lookup is two IGNORE-NULLS window passes (last
    non-null before, first non-null after) — no self-join against
    the observation table.

    Determinism: observed values are exact decimal averages; the
    interpolation `v0 + (v1-v0)·Δt/Δtotal` runs the identical IEEE
    sequence on identical operands in both engines.

    Scale: spine size is user-count × their active date span (never
    event volume); all windows partition by user_id; the spine⋈obs
    join and both windows share the user_id partitioning, so
    Catalyst plans a single exchange.
    """
    ev = t(spark, sf_dir, "events")
    obs = (
        ev.groupBy("user_id", F.col("ts").cast("date").alias("d"))
        .agg((dsum(F.col("value")) / F.count(F.lit(1))).alias("v"))
    )
    bounds = obs.groupBy("user_id").agg(
        F.min("d").alias("min_d"), F.max("d").alias("max_d")
    )
    spine = bounds.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("min_d").cast("timestamp"),
                F.col("max_d").cast("timestamp"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("d_ts"),
    ).select("user_id", F.col("d_ts").cast("date").alias("d"))
    joined = spine.join(obs, ["user_id", "d"], "left")
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("d")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_d = F.when(F.col("v").isNotNull(), F.col("d"))
    filled = joined.select(
        "user_id",
        "d",
        "v",
        F.last(obs_d, ignorenulls=True).over(w_back).alias("prev_d"),
        F.last(F.col("v"), ignorenulls=True).over(w_back).alias("prev_v"),
        F.first(obs_d, ignorenulls=True).over(w_fwd).alias("next_d"),
        F.first(F.col("v"), ignorenulls=True).over(w_fwd).alias("next_v"),
    )
    interp = F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * (
        F.datediff(F.col("d"), F.col("prev_d")).cast("double")
        / F.datediff(F.col("next_d"), F.col("prev_d")).cast("double")
    )
    return filled.select(
        "user_id",
        "d",
        "v",
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("prev_v").isNotNull() & F.col("next_v").isNotNull(), interp)
        .alias("v_filled"),
    )


@register(
    "q121_event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type, COUNT(*) AS n_trans,
           CAST(COUNT(*) AS DOUBLE)
             / SUM(COUNT(*)) OVER (PARTITION BY prev_type) AS p_trans
    FROM seq
    WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
)
def q121_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for each (state → next state) pair, the transition
    count and row-normalized probability.

    A window over a grouped aggregate (SUM(COUNT(*)) OVER state)
    computes the per-source normalizer without a second scan or a
    self-join. Sequence order is total (ts, event_id) so lag pairs
    are reproducible under any partitioning.

    Scale: the lag window partitions by user_id; the aggregate
    reduces to |states|² rows, so the normalizing window is over a
    tiny relation. One fact shuffle on user_id, one on the pair key.
    """
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n_trans")
    )
    w_norm = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n_trans",
        (F.col("n_trans").cast("double") / F.sum("n_trans").over(w_norm)).alias(
            "p_trans"
        ),
    )


@register(
    "q122_rolling_distinct_users",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    contrib AS (
      SELECT user_id,
             CAST(UNNEST(generate_series(CAST(d AS TIMESTAMP),
                                         CAST(d AS TIMESTAMP) + INTERVAL 6 DAY,
                                         INTERVAL 1 DAY)) AS DATE) AS window_end
      FROM ud
    )
    SELECT window_end, COUNT(DISTINCT user_id) AS users_7d
    FROM contrib
    GROUP BY window_end
    """,
)
def q122_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per day — the metric SQL
    windows cannot express (COUNT(DISTINCT) is not a supported
    window aggregate in Spark or DuckDB).

    Scatter formulation: each distinct (user, day) contributes to
    the 7 window-end days it falls in, then a plain distinct-count
    groups by window end. Trailing windows past the last active day
    are included (they are still valid 7-day windows ending there).

    Scale: fan-out is a fixed ×7 on the *distinct* user-day set, far
    cheaper at 100 TB than a 7-way self-join or re-scanning raw
    events per day; the distinct and the final count shuffle on
    bounded keys (users × days, days).
    """
    ev = t(spark, sf_dir, "events")
    ud = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    contrib = ud.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("d").cast("timestamp"),
                F.col("d").cast("timestamp") + F.expr("INTERVAL 6 DAY"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("we_ts"),
    ).select("user_id", F.col("we_ts").cast("date").alias("window_end"))
    return contrib.groupBy("window_end").agg(
        F.countDistinct("user_id").alias("users_7d")
    )


@register(
    "q123_dwell_time",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts,
             LEAD(ts) OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS next_ts
      FROM events
    )
    SELECT event_type,
           COUNT(next_ts) AS n_intervals,
           CAST(SUM(CASE WHEN next_ts IS NOT NULL
                         THEN epoch_us(next_ts) - epoch_us(ts)
                         ELSE 0 END) AS BIGINT) AS total_dwell_us,
           CAST(SUM(CASE WHEN next_ts IS NOT NULL
                         THEN epoch_us(next_ts) - epoch_us(ts)
                         ELSE 0 END) AS DOUBLE)
             / COUNT(next_ts) AS avg_dwell_us
    FROM seq
    GROUP BY event_type
    """,
)
def q123_dwell_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dwell-time analysis: how long users linger on each event type
    before their next action (lead-timestamp deltas, aggregated per
    type).

    Durations are exact integer microseconds (``unix_micros`` /
    ``epoch_us`` on the micros-truncated timestamps both engines
    read — catalog.load_table docstring), so sums are
    order-insensitive and the average is one exact division.

    Scale: the lead window partitions by user_id; the aggregate
    reduces to |event types| rows. One fact shuffle.
    """
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", "ts", F.lead("ts").over(w).alias("next_ts")
    )
    dwell = F.when(
        F.col("next_ts").isNotNull(),
        F.unix_micros(F.col("next_ts")) - F.unix_micros(F.col("ts")),
    ).otherwise(F.lit(0))
    return seq.groupBy("event_type").agg(
        F.count("next_ts").alias("n_intervals"),
        F.sum(dwell).alias("total_dwell_us"),
        (F.sum(dwell).cast("double") / F.count("next_ts")).alias("avg_dwell_us"),
    )


@register(
    "q124_source_vocab_overlap",
    oracle="""
    WITH sw AS (
      SELECT DISTINCT source, w
      FROM documents, UNNEST(string_split(text, ' ')) AS u(w)
      WHERE w <> ''
    ),
    sizes AS (
      SELECT source, COUNT(*) AS vocab FROM sw GROUP BY source
    ),
    inter AS (
      SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_common
      FROM sw a JOIN sw b ON a.w = b.w AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT i.src_a, i.src_b, i.n_common,
           sa.vocab AS vocab_a, sb.vocab AS vocab_b,
           CAST(i.n_common AS DOUBLE)
             / (sa.vocab + sb.vocab - i.n_common) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.source = i.src_a
    JOIN sizes sb ON sb.source = i.src_b
    """,
)
def q124_source_vocab_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: pairwise vocabulary overlap
    (Jaccard) between document sources — the corpus-level audit that
    flags sources copying from each other before near-dup pair
    hunting (q61/q62) drills into documents.

    Scale: the distinct (source, word) reduction shrinks the fact
    side to vocabulary size first; then — instead of a vocabulary
    self-join, which would plan the distinct subtree twice — one
    groupBy(word) collects each word's source set (bounded by
    |sources|, ~10) and emits the co-occurrence pairs by a double
    explode with src_a < src_b: bounded ×(|sources|²/2) fan-out on
    shared words only, zero joins on the big side. Source-count
    tables are broadcast; the output matrix is tiny.
    """
    docs = t(spark, sf_dir, "documents")
    sw = (
        docs.select("source", F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .distinct()
    )
    # the vocabulary-grain source-set table feeds BOTH the sizes and
    # the co-occurrence branches; checkpoint it so the corpus-sized
    # explode+distinct+collect_set pipeline runs once, not once per
    # branch (exchange reuse alone does not survive the diverging
    # column pruning)
    word_srcs = (
        sw.groupBy("w")
        .agg(F.collect_set("source").alias("srcs"))
        .localCheckpoint(eager=False)
    )
    sizes = (
        word_srcs.select(F.explode("srcs").alias("source"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("vocab"))
        # tiny (|sources| rows) but consumed twice (sa and sb)
        .localCheckpoint(eager=False)
    )
    inter = (
        word_srcs.select(F.explode("srcs").alias("src_a"), "srcs")
        .select("src_a", F.explode("srcs").alias("src_b"))
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = F.broadcast(sizes.select(F.col("source").alias("src_a"), F.col("vocab").alias("vocab_a")))
    sb = F.broadcast(sizes.select(F.col("source").alias("src_b"), F.col("vocab").alias("vocab_b")))
    return (
        inter.join(sa, "src_a")
        .join(sb, "src_b")
        .select(
            "src_a",
            "src_b",
            "n_common",
            "vocab_a",
            "vocab_b",
            (
                F.col("n_common").cast("double")
                / (F.col("vocab_a") + F.col("vocab_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )


@register(
    "q125_doc_chunking",
    oracle="""
    SELECT doc_id, i AS chunk_idx,
           SUBSTRING(text, CAST(i * 200 + 1 AS INTEGER), 200) AS chunk_text,
           LENGTH(SUBSTRING(text, CAST(i * 200 + 1 AS INTEGER), 200))
             AS chunk_len
    FROM documents,
         UNNEST(generate_series(
           0, CAST(GREATEST(CEIL(LENGTH(text) / 200.0), 1) AS BIGINT) - 1
         )) AS u(i)
    """,
)
def q125_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size document chunking for training ingestion: split
    every document into 200-char chunks with provenance
    (doc_id, chunk_idx) — the step between raw corpus and
    tokenizer-sized training records.

    Empty or short docs still emit one (possibly short) chunk
    (GREATEST(…,1)), so no document silently disappears.

    Scale: pure row-local generate+substring — no shuffle at all;
    the explode fan-out is bounded by doc length / chunk size.
    Chunk text stays JVM-side (no Python), and downstream writers
    can partition on a hash of doc_id for even file sizing.
    """
    docs = t(spark, sf_dir, "documents")
    n_chunks = F.greatest(F.ceil(F.length("text") / 200.0), F.lit(1)).cast("bigint")
    return (
        docs.select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)).alias(
                "chunk_idx"
            ),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.expr("substring(text, CAST(chunk_idx * 200 + 1 AS INT), 200)").alias(
                "chunk_text"
            ),
            F.length(
                F.expr("substring(text, CAST(chunk_idx * 200 + 1 AS INT), 200)")
            ).alias("chunk_len"),
        )
    )


@register(
    "q126_sequence_packing",
    oracle="""
    WITH toks AS (
      SELECT source, doc_id,
             LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1 AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT source, doc_id, n_tokens,
             CAST(FLOOR(
               CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - n_tokens AS DOUBLE) / 512.0
             ) AS BIGINT) AS seq_id
      FROM toks
    )
    SELECT source, seq_id, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(n_tokens) AS DOUBLE) / 512.0 AS fill_ratio
    FROM packed
    GROUP BY source, seq_id
    """,
)
def q126_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training sequence packing: assign documents (in stable doc_id
    order per source) to fixed-capacity 512-token sequences by
    cumulative token offset — the scalable one-pass approximation of
    greedy sample packing used to batch short documents for LLM
    training.

    A document's sequence is determined by the cumulative token
    count *before* it (cumsum − n_tokens), so assignment is a pure
    running-sum window — no iterative packer, no driver loop.

    Scale: the window partitions by source and orders by doc_id
    (deterministic, resumable); output is one row per packed
    sequence with its fill ratio, flagging sources whose doc-length
    distribution packs poorly.
    """
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        "doc_id",
        (
            F.length("text") - F.length(F.regexp_replace("text", " ", "")) + 1
        ).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn(
        "seq_id",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("double") / 512.0
        ).cast("bigint"),
    )
    return packed.groupBy("source", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.sum("n_tokens").cast("double") / 512.0).alias("fill_ratio"),
    )


@register(
    "q131_histogram_cdf",
    oracle="""
    WITH b AS (
      SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bucket,
             COUNT(*) AS n
      FROM orders GROUP BY CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT)
    )
    SELECT bucket, n,
           CAST(SUM(n) OVER (ORDER BY bucket
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_n,
           CAST(SUM(n) OVER (ORDER BY bucket
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE)
             / SUM(n) OVER () AS cdf
    FROM b
    """,
)
def q131_histogram_cdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram with cumulative distribution: bucket
    counts plus running total and CDF share — the scalable way to
    see a distribution at 100 TB (vs exact percentiles, which need
    a global sort).

    The only global-order window here runs over the HISTOGRAM — a
    few dozen buckets regardless of input size — never over
    data-sized input (SURVEY.md §8). Bucketing itself is a pure
    row-wise floor, one aggregation pass.
    """
    o = t(spark, sf_dir, "orders")
    b = (
        o.select(
            F.floor(F.col("o_totalprice") / 50000.0).cast("bigint").alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_cum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_tot = Window.partitionBy()
    return b.select(
        "bucket",
        "n",
        F.sum("n").over(w_cum).alias("cum_n"),
        (F.sum("n").over(w_cum).cast("double") / F.sum("n").over(w_tot)).alias(
            "cdf"
        ),
    )


@register(
    "q132_weighted_stats",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_w,
           CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(18,4)))
                AS DOUBLE)
             / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS wavg_price,
           CAST(SUM(CAST(l_quantity * (1 - l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS effective_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q132_weighted_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted aggregates: quantity-weighted average price and
    discount-effective quantity per group — plain AVG treats a
    1-unit line and a 50-unit line equally; weighted stats are what
    pricing and inventory actually need.

    Exact decimal sums on both numerator and denominator (2-decimal
    factors ⇒ 4-decimal products, _util docstring) make the ratio a
    single identical IEEE division — order-free, partition-free.
    One partial+final aggregation pass.
    """
    li = t(spark, sf_dir, "lineitem")
    qty, price, disc = (
        F.col("l_quantity"),
        F.col("l_extendedprice"),
        F.col("l_discount"),
    )
    return li.groupBy("l_returnflag").agg(
        dsum(qty).alias("total_w"),
        (dsum(qty * price, 4) / dsum(qty)).alias("wavg_price"),
        dsum(qty * (1 - disc), 4).alias("effective_qty"),
    )


@register(
    "q137_basket_lift",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d, event_type
      FROM events
    ),
    n_baskets AS (
      SELECT COUNT(*) AS total FROM (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
      ) b
    ),
    singles AS (
      SELECT event_type, COUNT(*) AS n FROM baskets GROUP BY event_type
    ),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n_ab
      FROM baskets a
      JOIN baskets b ON a.user_id = b.user_id AND a.d = b.d
                    AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT p.type_a, p.type_b, p.n_ab,
           CAST(p.n_ab AS DOUBLE) / sa.n AS confidence_a_to_b,
           CAST(p.n_ab AS DOUBLE) * t.total / (sa.n * sb.n) AS lift
    FROM pairs p
    JOIN singles sa ON sa.event_type = p.type_a
    JOIN singles sb ON sb.event_type = p.type_b
    CROSS JOIN n_baskets t
    """,
)
def q137_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association metrics over user-day baskets:
    pair support, confidence, and lift for event-type
    co-occurrence — the data-mining classic, sized so the itemset
    alphabet (event types) keeps pair fan-out bounded.

    One groupBy(basket) collects each basket's distinct types (≤5)
    and emits pairs via in-row double explode — no basket self-join
    (the oracle spells the equivalent self-join for DuckDB). Ratios
    divide exact integers, identically in both engines.
    """
    ev = t(spark, sf_dir, "events")
    # ONE corpus pass: collect_set dedups within the basket, so the
    # old pre-groupBy distinct was a redundant extra exchange; and
    # the basket table feeds THREE aggregates (total, singles,
    # pairs), so without the checkpoint each branch replayed the
    # events scan + wide groupBy — the basket table is user-day
    # grain, tiny to materialize at any scale (guide: materialize
    # multi-consumer intermediates).
    per_basket = (
        ev.select("user_id", F.col("ts").cast("date").alias("d"), "event_type")
        .groupBy("user_id", "d")
        .agg(F.collect_set("event_type").alias("types"))
        .localCheckpoint(eager=False)
    )
    n_baskets = per_basket.agg(F.count(F.lit(1)).alias("total"))
    singles = (
        per_basket.select(F.explode("types").alias("event_type"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pairs = (
        per_basket.select(F.explode("types").alias("type_a"), "types")
        .select("type_a", F.explode("types").alias("type_b"))
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    sa = F.broadcast(
        singles.select(F.col("event_type").alias("type_a"), F.col("n").alias("na"))
    )
    sb = F.broadcast(
        singles.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb"))
    )
    return (
        pairs.join(sa, "type_a")
        .join(sb, "type_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            (F.col("n_ab").cast("double") / F.col("na")).alias(
                "confidence_a_to_b"
            ),
            (
                F.col("n_ab").cast("double") * F.col("total")
                / (F.col("na") * F.col("nb"))
            ).alias("lift"),
        )
    )


@register(
    "q138_time_to_event",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) AS signup_ts,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END)
               AS purchase_ts
      FROM events
      GROUP BY user_id
    )
    SELECT CASE WHEN purchase_ts IS NULL THEN 'censored'
                WHEN purchase_ts <= signup_ts THEN 'pre_signup'
                ELSE CAST(date_diff('day', CAST(signup_ts AS DATE),
                                    CAST(purchase_ts AS DATE)) AS VARCHAR)
           END AS days_to_purchase,
           COUNT(*) AS n_users
    FROM firsts
    WHERE signup_ts IS NOT NULL
    GROUP BY 1
    """,
)
def q138_time_to_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-event distribution (survival-analysis input): days
    from first signup to first purchase per user, with explicit
    censoring buckets (never purchased / purchased before signup) —
    the shape a conversion-latency or churn model trains on.

    One aggregation computes both first-event timestamps
    (conditional MINs — no per-stage joins); the day-diff histogram
    is integer-exact.
    """
    ev = t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "signup_ts"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "purchase_ts"
        ),
    )
    days = F.datediff(
        F.col("purchase_ts").cast("date"), F.col("signup_ts").cast("date")
    )
    bucket = (
        F.when(F.col("purchase_ts").isNull(), "censored")
        .when(F.col("purchase_ts") <= F.col("signup_ts"), "pre_signup")
        .otherwise(days.cast("string"))
    )
    return (
        firsts.filter(F.col("signup_ts").isNotNull())
        .groupBy(bucket.alias("days_to_purchase"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "q139_outlier_audit",
    oracle="""
    WITH stats AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS s1,
             CAST(CAST(SUM(CAST(l_extendedprice * l_extendedprice
                                AS DECIMAL(38,4))) AS VARCHAR) AS DOUBLE)
               AS s2
      FROM lineitem GROUP BY l_returnflag
    ),
    scored AS (
      SELECT l.l_returnflag, l.l_extendedprice,
             s1 / n AS mu,
             SQRT((s2 - s1 * s1 / n) / (n - 1.0)) AS sigma
      FROM lineitem l JOIN stats s ON l.l_returnflag = s.l_returnflag
    )
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           COUNT(CASE WHEN ABS(l_extendedprice - mu) > 2.0 * sigma
                      THEN 1 END) AS n_outliers,
           CAST(COUNT(CASE WHEN ABS(l_extendedprice - mu) > 2.0 * sigma
                           THEN 1 END) AS DOUBLE) / COUNT(*) AS outlier_rate
    FROM scored
    GROUP BY l_returnflag
    """,
)
def q139_outlier_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-score outlier audit per group: rows beyond 2σ of their
    group's mean, as a count and rate — the data-quality gate a
    pipeline runs before training ingestion.

    Group statistics come from the exact-sufficient-statistics
    pattern (q117): one aggregation pass, mergeable, no two-pass
    mean-then-deviation. The per-row z-test is identical IEEE
    arithmetic on identical operands, so the cut is reproducible
    across engines and partitionings. The tiny stats table is
    broadcast back onto the fact rows.
    """
    li = t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    stats = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(price).alias("s1"),
        F.sum((price * price).cast("decimal(38,4)")).cast("double").alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    enriched = li.join(F.broadcast(stats), "l_returnflag").select(
        "l_returnflag",
        "l_extendedprice",
        (s1 / n).alias("mu"),
        F.sqrt((s2 - s1 * s1 / n) / (n - 1.0)).alias("sigma"),
    )
    is_out = F.abs(F.col("l_extendedprice") - F.col("mu")) > 2.0 * F.col("sigma")
    return enriched.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(is_out, 1)).alias("n_outliers"),
        (F.count(F.when(is_out, 1)).cast("double") / F.count(F.lit(1))).alias(
            "outlier_rate"
        ),
    )


@register(
    "q141_distribution_drift",
    oracle="""
    WITH binned AS (
      SELECT source, CAST(FLOOR(n_chars / 50.0) AS BIGINT) AS bin,
             COUNT(*) AS n
      FROM documents
      GROUP BY source, CAST(FLOOR(n_chars / 50.0) AS BIGINT)
    ),
    totals AS (
      SELECT source, SUM(n) AS total FROM binned GROUP BY source
    ),
    grid AS (
      SELECT s.source, b.bin FROM totals s
      CROSS JOIN (SELECT DISTINCT bin FROM binned) b
    ),
    cdf AS (
      SELECT g.source, g.bin,
             CAST(SUM(COALESCE(bi.n, 0)) OVER (PARTITION BY g.source
                    ORDER BY g.bin
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE)
               / t.total AS cum_share
      FROM grid g
      LEFT JOIN binned bi ON bi.source = g.source AND bi.bin = g.bin
      JOIN totals t ON t.source = g.source
    )
    SELECT a.source AS src_a, b.source AS src_b,
           MAX(ABS(a.cum_share - b.cum_share)) AS ks_stat
    FROM cdf a
    JOIN cdf b ON a.bin = b.bin AND a.source < b.source
    GROUP BY a.source, b.source
    """,
)
def q141_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: a binned two-sample KS statistic
    (max CDF gap) for document length between every pair of
    sources — the check a training pipeline runs to catch a source
    whose content shifted between snapshots.

    Each source's CDF is evaluated on the SHARED bin grid (missing
    bins zero-filled) so gaps compare aligned points. Everything
    after the per-source histogram operates on |sources| × |bins|
    rows — the pair join and windows are on bounded aggregates, not
    data. CDF shares divide exact integers; MAX of identical doubles
    is order-free.
    """
    docs = t(spark, sf_dir, "documents")
    binned = (
        docs.select(
            "source", F.floor(F.col("n_chars") / 50.0).cast("bigint").alias("bin")
        )
        .groupBy("source", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        # |sources| x |bins| bounded aggregate feeding THREE branches
        # (totals, the bin grid, and the CDF left join) — checkpoint
        # so the corpus scan+histogram runs once, not three times
        .localCheckpoint(eager=False)
    )
    totals = binned.groupBy("source").agg(F.sum("n").alias("total"))
    bins = binned.select("bin").distinct()
    grid = totals.select("source", "total").crossJoin(F.broadcast(bins))
    w = (
        Window.partitionBy("source")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cdf = (
        # binned is |sources| x |bins| (the checkpointed histogram);
        # the ExistingRDD has no stats, so without the hint the zero-
        # fill left join planned a SortMergeJoin that re-exchanged
        # both bounded sides (the r9 verdict's "reappeared" exchanges)
        grid.join(F.broadcast(binned), ["source", "bin"], "left")
        .select(
            "source",
            "bin",
            "total",
            F.coalesce(F.col("n"), F.lit(0)).alias("n0"),
        )
        .select(
            "source",
            "bin",
            (F.sum("n0").over(w).cast("double") / F.col("total")).alias(
                "cum_share"
            ),
        )
    )
    a = cdf.select(
        F.col("source").alias("src_a"), "bin", F.col("cum_share").alias("ca")
    )
    b = cdf.select(
        F.col("source").alias("src_b"), "bin", F.col("cum_share").alias("cb")
    )
    return (
        # b is the same bounded CDF grain — broadcast kills the pair
        # join's exchange+sort pair on both sides
        a.join(F.broadcast(b), "bin")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.max(F.abs(F.col("ca") - F.col("cb"))).alias("ks_stat"))
    )


@register(
    "q142_chi_square_cells",
    oracle="""
    WITH obs AS (
      SELECT lang, source, COUNT(*) AS o
      FROM documents GROUP BY lang, source
    ),
    row_t AS (SELECT lang, SUM(o) AS rt FROM obs GROUP BY lang),
    col_t AS (SELECT source, SUM(o) AS ct FROM obs GROUP BY source),
    tot AS (SELECT SUM(o) AS n FROM obs)
    SELECT obs.lang, obs.source, obs.o,
           CAST(r.rt AS DOUBLE) * c.ct / t.n AS expected,
           (obs.o - CAST(r.rt AS DOUBLE) * c.ct / t.n)
             * (obs.o - CAST(r.rt AS DOUBLE) * c.ct / t.n)
             / (CAST(r.rt AS DOUBLE) * c.ct / t.n) AS chi2_cell
    FROM obs
    JOIN row_t r ON r.lang = obs.lang
    JOIN col_t c ON c.source = obs.source
    CROSS JOIN tot t
    """,
)
def q142_chi_square_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence audit between two categorical columns
    (lang × source): per-cell observed vs expected counts and the
    cell's χ² contribution — the test that catches a source
    over-represented in one language before a sampler bakes the
    bias in.

    Emitted per cell (not summed): a float total would be
    accumulation-order-dependent, while per-cell values are pure
    functions of exact integers — reproducible anywhere, and more
    actionable (the offending cells are visible). Row/column totals
    derive from the contingency aggregate itself (languages ×
    sources rows), so the fact table is scanned once.
    """
    docs = t(spark, sf_dir, "documents")
    obs = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("o"))
    row_t = obs.groupBy("lang").agg(F.sum("o").alias("rt"))
    col_t = obs.groupBy("source").agg(F.sum("o").alias("ct"))
    tot = obs.agg(F.sum("o").alias("n"))
    e = F.col("rt").cast("double") * F.col("ct") / F.col("n")
    return (
        obs.join(F.broadcast(row_t), "lang")
        .join(F.broadcast(col_t), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "source",
            "o",
            e.alias("expected"),
            ((F.col("o") - e) * (F.col("o") - e) / e).alias("chi2_cell"),
        )
    )


@register(
    "q143_bounce_rate",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ),
    sessions AS (
      SELECT user_id, ts,
             CAST(SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS session_id
      FROM flagged
    ),
    per_session AS (
      SELECT user_id, session_id,
             CAST(MIN(ts) AS DATE) AS d,
             COUNT(*) AS n_events
      FROM sessions GROUP BY user_id, session_id
    )
    SELECT d,
           COUNT(*) AS n_sessions,
           COUNT(CASE WHEN n_events = 1 THEN 1 END) AS n_bounces,
           CAST(COUNT(CASE WHEN n_events = 1 THEN 1 END) AS DOUBLE)
             / COUNT(*) AS bounce_rate
    FROM per_session
    GROUP BY d
    """,
)
def q143_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily bounce rate: share of sessions (30-minute inactivity
    gap, q56's definition) containing exactly one event — the
    engagement-quality metric sitting on top of sessionization.

    Scale: the gap-flag and session-id windows partition by user_id
    on one shuffle; everything after operates on per-session rows
    (bounded by sessions, not events), and the daily rate divides
    exact integers.
    """
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull() | (gap_us > 1_800_000_000), 1
        ).otherwise(0).alias("is_new"),
    )
    sessions = flagged.select(
        "user_id",
        "ts",
        F.sum("is_new").over(w_cum).cast("bigint").alias("session_id"),
    )
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").cast("date").alias("d"),
        F.count(F.lit(1)).alias("n_events"),
    )
    bounce = F.count(F.when(F.col("n_events") == 1, 1))
    return per_session.groupBy("d").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        bounce.alias("n_bounces"),
        (bounce.cast("double") / F.count(F.lit(1))).alias("bounce_rate"),
    )


@register(
    "q144_priority_sample",
    oracle="""
    WITH ranked AS (
      SELECT lang, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk
      FROM documents
    )
    SELECT lang, doc_id, n_chars, rk
    FROM ranked WHERE rk <= 5
    """,
)
def q144_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic priority sampling: exactly k rows per stratum,
    chosen by hash-of-key order — reproducible across engines, runs,
    and partitionings (unlike rand()-based sampling), and
    automatically stable under data appends that don't change the
    winning hashes. Complements q89's hash-mod stratified sample
    (fixed RATE, variable count) with a fixed-COUNT guarantee.

    Scale: one window per stratum key; the md5 priority is computed
    row-side, so the sort key is a fixed-width hash, and rows beyond
    rank k drop before anything downstream.
    """
    docs = t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string").cast("binary")), F.col("doc_id")
    )
    return (
        docs.select("lang", "doc_id", "n_chars")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
    )


@register(
    "q145_join_cardinality",
    oracle="""
    WITH ko AS (
      SELECT o_orderkey AS k, COUNT(*) AS n_o FROM orders GROUP BY o_orderkey
    ),
    kl AS (
      SELECT l_orderkey AS k, COUNT(*) AS n_l FROM lineitem
      GROUP BY l_orderkey
    )
    SELECT COUNT(ko.k) AS n_matching_keys,
           CAST(SUM(ko.n_o * kl.n_l) AS BIGINT) AS join_rows,
           MAX(kl.n_l) AS max_fanout,
           CAST(SUM(ko.n_o * kl.n_l) AS DOUBLE) / COUNT(ko.k)
             AS avg_rows_per_key
    FROM ko JOIN kl ON ko.k = kl.k
    """,
)
def q145_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality profiling WITHOUT executing the join: the
    exact orders⋈lineitem output size is Σ(count_o(k)·count_l(k))
    over shared keys — per-key count aggregates joined instead of
    the fact tables themselves. The pre-flight check that catches a
    fan-out (many-to-many key) before it materializes a
    trillion-row join at 100 TB; max_fanout pinpoints skewed keys
    that need salting or AQE skew splitting.

    All-integer arithmetic: exact under any partitioning; the
    key-count relations are as big as the key space, not the data.
    """
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    ko = o.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n_o")
    )
    kl = li.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n_l")
    )
    return ko.join(kl, "k").agg(
        F.count("k").alias("n_matching_keys"),
        F.sum(F.col("n_o") * F.col("n_l")).alias("join_rows"),
        F.max("n_l").alias("max_fanout"),
        (
            F.sum(F.col("n_o") * F.col("n_l")).cast("double") / F.count("k")
        ).alias("avg_rows_per_key"),
    )


@register(
    "q147_timeseries_anomaly",
    oracle="""
    WITH per_hour AS (
      SELECT date_trunc('hour', ts) AS h, COUNT(*) AS n
      FROM events GROUP BY date_trunc('hour', ts)
    ),
    scored AS (
      SELECT h, n,
             SUM(n) OVER w AS s1,
             SUM(n * n) OVER w AS s2,
             COUNT(*) OVER w AS k
      FROM per_hour
      WINDOW w AS (ORDER BY h ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT CAST(h AS TIMESTAMP) AS h, n, k AS window_hours,
           CAST(s1 AS DOUBLE) / k AS mu,
           (n - CAST(s1 AS DOUBLE) / k)
             / SQRT((s2 - CAST(s1 AS DOUBLE) * s1 / k) / (k - 1.0))
             AS zscore
    FROM scored
    WHERE k >= 12
      AND (s2 - CAST(s1 AS DOUBLE) * s1 / k) > 0
    """,
)
def q147_timeseries_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window anomaly scores for event volume: each hour's
    count z-scored against the previous 24 hours — the streaming-ops
    alerting primitive (traffic spike / outage dip detection),
    expressed batch-side.

    The trailing mean/std come from window sums of n and n² —
    integer-exact in any order — so the z-score is one identical
    IEEE expression per row. Warm-up hours (fewer than 12 trailing
    points) and zero-variance windows are excluded.

    Scale: the window runs over the per-hour aggregate (8,760 rows
    per year regardless of event volume), never raw events. For
    per-entity alerting the same window partitions by entity key.
    """
    ev = t(spark, sf_dir, "events")
    per_hour = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.orderBy("h").rowsBetween(-24, -1)
    n, s1, s2, k = (
        F.col("n"),
        F.sum("n").over(w),
        F.sum(F.col("n") * F.col("n")).over(w),
        F.count(F.lit(1)).over(w),
    )
    scored = per_hour.select(
        F.col("h").cast("timestamp").alias("h"),
        "n",
        s1.alias("s1"),
        s2.alias("s2"),
        k.alias("k"),
    )
    s1c, s2c, kc = F.col("s1"), F.col("s2"), F.col("k")
    mu = s1c.cast("double") / kc
    var = (s2c - s1c.cast("double") * s1c / kc) / (kc - 1.0)
    return (
        scored.filter(
            (kc >= 12) & ((s2c - s1c.cast("double") * s1c / kc) > 0)
        )
        .select(
            "h",
            "n",
            kc.alias("window_hours"),
            mu.alias("mu"),
            ((F.col("n") - mu) / F.sqrt(var)).alias("zscore"),
        )
    )


@register(
    "q148_journey_paths",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ),
    paths AS (
      SELECT user_id,
             string_agg(event_type, '>' ORDER BY rn) AS path3
      FROM ranked WHERE rn <= 3
      GROUP BY user_id
    )
    SELECT path3, COUNT(*) AS n_users
    FROM paths GROUP BY path3
    """,
)
def q148_journey_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer journey path analysis: each user's first three
    events joined into a path string, counted across users — the
    entry-funnel fingerprint product analytics asks for ("what do
    new users do first?").

    Path assembly is rank-filter (first 3 per user, total-ordered)
    then an ORDER-BY string aggregation — deterministic because the
    rank order is total. Output cardinality is |event types|³ at
    most.
    """
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path3")
        )
    )
    return paths.groupBy("path3").agg(F.count(F.lit(1)).alias("n_users"))


@register(
    "q149_recency_features",
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(rn - last_purchase_rn AS BIGINT) AS events_since_purchase,
           epoch_us(ts) - epoch_us(last_purchase_ts) AS usecs_since_purchase
    FROM (
      SELECT event_id, user_id, event_type, ts,
             ROW_NUMBER() OVER w AS rn,
             MAX(CASE WHEN event_type = 'purchase' THEN ts END) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_purchase_ts,
             MAX(CASE WHEN event_type = 'purchase'
                      THEN rn0 END) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_purchase_rn
      FROM (
        SELECT *, ROW_NUMBER() OVER w AS rn0 FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ) base
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ) feat
    WHERE last_purchase_ts IS NOT NULL
    """,
)
def q149_recency_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event recency feature engineering: for every event after
    a user's first purchase, how many events and how many
    microseconds since that user's most recent PRIOR purchase — the
    point-in-time-correct features a propensity model trains on
    (strictly-preceding frame ⇒ no label leakage).

    The "last prior purchase" lookup is a conditional running MAX
    over a 1-PRECEDING frame — no self-join against a purchase
    table, and timestamps/row-numbers are integer-exact.

    Scale: both windows share the same (user_id, ts, event_id)
    partitioning and sort — one shuffle, one sort, two frame passes.
    """
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_prev = w.rowsBetween(Window.unboundedPreceding, -1)
    base = ev.withColumn("rn0", F.row_number().over(w))
    feat = base.select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.row_number().over(w).alias("rn"),
        F.max(
            F.when(F.col("event_type") == "purchase", F.col("ts"))
        ).over(w_prev).alias("last_purchase_ts"),
        F.max(
            F.when(F.col("event_type") == "purchase", F.col("rn0"))
        ).over(w_prev).alias("last_purchase_rn"),
    )
    return feat.filter(F.col("last_purchase_ts").isNotNull()).select(
        "event_id",
        "user_id",
        "event_type",
        (F.col("rn") - F.col("last_purchase_rn")).cast("bigint").alias(
            "events_since_purchase"
        ),
        (
            F.unix_micros(F.col("ts"))
            - F.unix_micros(F.col("last_purchase_ts"))
        ).alias("usecs_since_purchase"),
    )


@register(
    "q151_ab_test",
    oracle="""
    WITH spend AS (
      SELECT user_id,
             CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7)
                       AS BIGINT) % 2 AS BIGINT) AS variant,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS monetary
      FROM events
      WHERE event_type = 'purchase'
      GROUP BY user_id
    ),
    avg_spend AS (
      SELECT CAST(SUM(CAST(monetary AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_m
      FROM spend
    ),
    assigned AS (
      SELECT s.user_id, s.variant,
             CASE WHEN s.monetary > a.avg_m THEN 1 ELSE 0 END AS converted
      FROM spend s CROSS JOIN avg_spend a
    ),
    per_variant AS (
      SELECT variant, COUNT(*) AS n_users,
             CAST(SUM(converted) AS BIGINT) AS n_converted,
             CAST(SUM(converted) AS DOUBLE) / COUNT(*) AS conv_rate
      FROM assigned GROUP BY variant
    ),
    paired AS (
      SELECT a.n_users AS n_a, a.n_converted AS c_a, a.conv_rate AS rate_a,
             b.n_users AS n_b, b.n_converted AS c_b, b.conv_rate AS rate_b,
             CAST(a.n_converted + b.n_converted AS DOUBLE)
               / (a.n_users + b.n_users) AS pooled
      FROM per_variant a JOIN per_variant b
        ON a.variant = 0 AND b.variant = 1
    )
    SELECT n_a, c_a, rate_a, n_b, c_b, rate_b,
           (rate_a - rate_b)
             / SQRT(pooled * (1 - pooled)
                    * (1.0 / n_a + 1.0 / n_b)) AS z_stat
    FROM paired
    """,
)
def q151_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: deterministic hash-based variant
    assignment (md5(user) % 2 — reproducible, no stored assignment
    table), per-variant conversion (purchase spend above the corpus
    average — corpus-relative so it splits at any scale factor), and
    the pooled two-proportion z-statistic.

    Every input to the z formula is an exact integer ratio, so the
    statistic is the same IEEE expression in both engines. The
    hash-assignment trick is the same membership rule as the q88
    train/valid/test split — one convention across experiments and
    data splits.

    Scale: one user-grouped pass over events, then all arithmetic on
    a 2-row aggregate.
    """
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    variant = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 7),
            16,
            10,
        ).cast("long")
        % 2
    ).cast("bigint")
    spend = ev.groupBy("user_id").agg(dsum(F.col("value")).alias("monetary")).select(
        "user_id", variant.alias("variant"), "monetary"
    )
    avg_spend = spend.agg(
        (dsum(F.col("monetary")) / F.count(F.lit(1))).alias("avg_m")
    )
    assigned = spend.crossJoin(F.broadcast(avg_spend)).select(
        "variant",
        F.when(F.col("monetary") > F.col("avg_m"), 1).otherwise(0).alias(
            "converted"
        ),
    )
    per_variant = assigned.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").alias("n_converted"),
        (F.sum("converted").cast("double") / F.count(F.lit(1))).alias(
            "conv_rate"
        ),
    )
    a = per_variant.filter(F.col("variant") == 0).select(
        F.col("n_users").alias("n_a"),
        F.col("n_converted").alias("c_a"),
        F.col("conv_rate").alias("rate_a"),
    )
    b = per_variant.filter(F.col("variant") == 1).select(
        F.col("n_users").alias("n_b"),
        F.col("n_converted").alias("c_b"),
        F.col("conv_rate").alias("rate_b"),
    )
    paired = a.crossJoin(F.broadcast(b)).withColumn(
        "pooled",
        (F.col("c_a") + F.col("c_b")).cast("double")
        / (F.col("n_a") + F.col("n_b")),
    )
    z = (F.col("rate_a") - F.col("rate_b")) / F.sqrt(
        F.col("pooled")
        * (1 - F.col("pooled"))
        * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
    )
    return paired.select(
        "n_a", "c_a", "rate_a", "n_b", "c_b", "rate_b", z.alias("z_stat")
    )


@register(
    "q152_adoption_curve",
    oracle="""
    WITH firstd AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d FROM events
      GROUP BY user_id
    ),
    per_day AS (
      SELECT d, COUNT(*) AS n_new FROM firstd GROUP BY d
    )
    SELECT d, n_new,
           CAST(SUM(n_new) OVER (ORDER BY d
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS BIGINT) AS cum_users
    FROM per_day
    """,
)
def q152_adoption_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative adoption curve: new users per first-seen day and
    the running total — the growth chart every product dashboard
    leads with.

    The running sum is a global-order window over the per-DAY
    aggregate (calendar-bounded, like q131/q147 — never data-sized);
    first-seen derivation is one user-keyed aggregation.
    """
    ev = t(spark, sf_dir, "events")
    firstd = ev.groupBy("user_id").agg(F.min(F.col("ts").cast("date")).alias("d"))
    per_day = firstd.groupBy("d").agg(F.count(F.lit(1)).alias("n_new"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return per_day.select(
        "d", "n_new", F.sum("n_new").over(w).alias("cum_users")
    )


@register(
    "q153_user_concentration",
    oracle="""
    WITH per_user AS (
      SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
    ),
    top10 AS (
      SELECT n FROM per_user ORDER BY n DESC, user_id ASC LIMIT 10
    )
    SELECT (SELECT COUNT(*) FROM per_user) AS n_users,
           (SELECT CAST(SUM(n) AS BIGINT) FROM per_user) AS total_events,
           (SELECT CAST(SUM(n) AS BIGINT) FROM top10) AS top10_events,
           CAST((SELECT SUM(n) FROM top10) AS DOUBLE)
             / (SELECT SUM(n) FROM per_user) AS top10_share
    """,
)
def q153_user_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity concentration: what share of all events the ten most
    active users generate — the power-law health check that decides
    whether per-user keys need skew handling (SURVEY.md §8 salting).

    Top-k goes through orderBy().limit() → TakeOrderedAndProject
    (per-partition top-k + driver merge of k·p rows, the scalable
    global-top-k idiom) with a total-order tie-break; everything
    else is exact integer sums combined by a 1-row broadcast cross
    join.
    """
    ev = t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    totals = per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n").alias("total_events"),
    )
    top10 = (
        per_user.orderBy(F.col("n").desc(), F.col("user_id").asc())
        .limit(10)
        .agg(F.sum("n").alias("top10_events"))
    )
    return (
        totals.crossJoin(F.broadcast(top10))
        .select(
            "n_users",
            "total_events",
            "top10_events",
            (
                F.col("top10_events").cast("double") / F.col("total_events")
            ).alias("top10_share"),
        )
    )


@register(
    "q154_growth_accounting",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    seq AS (
      SELECT user_id, d,
             LAG(d) OVER (PARTITION BY user_id ORDER BY d) AS prev_d,
             LEAD(d) OVER (PARTITION BY user_id ORDER BY d) AS next_d
      FROM ud
    ),
    states AS (
      SELECT d,
             COUNT(CASE WHEN prev_d IS NULL THEN 1 END) AS n_new,
             COUNT(CASE WHEN prev_d = d - 1 THEN 1 END) AS n_retained,
             COUNT(CASE WHEN prev_d IS NOT NULL AND prev_d < d - 1 THEN 1 END)
               AS n_resurrected
      FROM seq GROUP BY d
    ),
    churn AS (
      SELECT d + 1 AS d, COUNT(*) AS n_churned
      FROM seq
      WHERE next_d IS NULL OR next_d > d + 1
      GROUP BY d + 1
    )
    SELECT s.d, s.n_new, s.n_retained, s.n_resurrected,
           COALESCE(c.n_churned, 0) AS n_churned
    FROM states s LEFT JOIN churn c ON c.d = s.d
    """,
)
def q154_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily growth accounting: every active user classified as new
    (first day), retained (active yesterday too), or resurrected
    (returning after a gap), plus how many of the previous day's
    actives churned — the four-quadrant DAU decomposition growth teams
    live by.

    One distinct (user, day) reduction feeds both a lag and a lead
    window on the same user partitioning (one shuffle, one sort);
    churn attributes to the day AFTER the user's last consecutive
    active day. All counts are exact integers.
    """
    ev = t(spark, sf_dir, "events")
    ud = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    seq = ud.select(
        "user_id",
        "d",
        F.lag("d").over(w).alias("prev_d"),
        F.lead("d").over(w).alias("next_d"),
    )
    states = seq.groupBy("d").agg(
        F.count(F.when(F.col("prev_d").isNull(), 1)).alias("n_new"),
        F.count(
            F.when(F.col("prev_d") == F.date_sub(F.col("d"), 1), 1)
        ).alias("n_retained"),
        F.count(
            F.when(
                F.col("prev_d").isNotNull()
                & (F.col("prev_d") < F.date_sub(F.col("d"), 1)),
                1,
            )
        ).alias("n_resurrected"),
    )
    churn = (
        seq.filter(
            F.col("next_d").isNull()
            | (F.col("next_d") > F.date_add(F.col("d"), 1))
        )
        .groupBy(F.date_add(F.col("d"), 1).alias("d"))
        .agg(F.count(F.lit(1)).alias("n_churned"))
    )
    return states.join(churn, "d", "left").select(
        "d",
        "n_new",
        "n_retained",
        "n_resurrected",
        F.coalesce(F.col("n_churned"), F.lit(0)).alias("n_churned"),
    )


@register(
    "q156_period_over_period",
    oracle="""
    WITH monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS m,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
      FROM orders GROUP BY date_trunc('month', o_orderdate)
    )
    SELECT m, revenue,
           LAG(revenue) OVER (ORDER BY m) AS prev_revenue,
           (revenue - LAG(revenue) OVER (ORDER BY m))
             / NULLIF(LAG(revenue) OVER (ORDER BY m), 0.0) AS mom_growth
    FROM monthly
    """,
)
def q156_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month growth: monthly revenue with the previous
    month's value and the growth rate — the period-comparison shape
    every KPI report uses (LAG over the time grain, NULLIF-guarded
    division for ANSI mode).

    The lag window orders the bounded monthly aggregate (12 rows per
    year regardless of order volume — q131/q147's rule); revenue is
    an exact decimal sum, so prev/current and their ratio are
    identical doubles in both engines.
    """
    o = t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", "o_orderdate").alias("m")
    ).agg(dsum(F.col("o_totalprice")).alias("revenue"))
    w = Window.orderBy("m")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "m",
        "revenue",
        prev.alias("prev_revenue"),
        ((F.col("revenue") - prev) / F.nullif(prev, F.lit(0.0))).alias(
            "mom_growth"
        ),
    )


@register(
    "q157_contribution_analysis",
    oracle="""
    WITH by_nation AS (
      SELECT n.n_name,
             CAST(SUM(CAST(CASE WHEN o.o_orderdate >= TIMESTAMP '1996-01-01'
                                 AND o.o_orderdate < TIMESTAMP '1997-01-01'
                                THEN o.o_totalprice ELSE 0 END
                           AS DECIMAL(18,2))) AS DOUBLE) AS rev_1996,
             CAST(SUM(CAST(CASE WHEN o.o_orderdate >= TIMESTAMP '1997-01-01'
                                 AND o.o_orderdate < TIMESTAMP '1998-01-01'
                                THEN o.o_totalprice ELSE 0 END
                           AS DECIMAL(18,2))) AS DOUBLE) AS rev_1997
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name
    ),
    total AS (
      SELECT CAST(SUM(CAST(rev_1997 - rev_1996 AS DECIMAL(18,2)))
                  AS DOUBLE) AS total_delta
      FROM by_nation
    )
    SELECT b.n_name, b.rev_1996, b.rev_1997,
           b.rev_1997 - b.rev_1996 AS delta,
           (b.rev_1997 - b.rev_1996) / NULLIF(t.total_delta, 0.0)
             AS share_of_change
    FROM by_nation b CROSS JOIN total t
    """,
)
def q157_contribution_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contribution analysis: which nation drove the year-over-year
    revenue change — per-group deltas and each group's share of the
    total movement, the "explain this change" decomposition analysts
    run after every KPI shift.

    Both periods aggregate in ONE pass (conditional decimal sums, no
    second scan or self-join); the total delta re-sums the exact
    per-group deltas as decimals, so shares divide identical
    doubles.
    """
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    def year_rev(y0, y1):
        return dsum(
            F.when(
                (F.col("o_orderdate") >= F.lit(y0).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(y1).cast("timestamp")),
                F.col("o_totalprice"),
            ).otherwise(0.0)
        )

    by_nation = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            year_rev("1996-01-01", "1997-01-01").alias("rev_1996"),
            year_rev("1997-01-01", "1998-01-01").alias("rev_1997"),
        )
    )
    total = by_nation.agg(
        dsum(F.col("rev_1997") - F.col("rev_1996")).alias("total_delta")
    )
    return by_nation.crossJoin(F.broadcast(total)).select(
        "n_name",
        "rev_1996",
        "rev_1997",
        (F.col("rev_1997") - F.col("rev_1996")).alias("delta"),
        (
            (F.col("rev_1997") - F.col("rev_1996"))
            / F.nullif(F.col("total_delta"), F.lit(0.0))
        ).alias("share_of_change"),
    )


@register(
    "q158_abc_classification",
    oracle="""
    WITH part_rev AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS revenue_dec
      FROM lineitem GROUP BY l_partkey
    ),
    ranked AS (
      SELECT l_partkey, revenue,
             CAST(SUM(revenue_dec) OVER (ORDER BY revenue_dec DESC,
                                                  l_partkey ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS DOUBLE)
               / CAST(SUM(revenue_dec) OVER () AS DOUBLE) AS cum_share
      FROM part_rev
    )
    SELECT CASE WHEN cum_share <= 0.5 THEN 'A'
                WHEN cum_share <= 0.8 THEN 'B'
                ELSE 'C' END AS abc_class,
           COUNT(*) AS n_parts,
           CAST(SUM(CAST(revenue AS DECIMAL(18,2))) AS DOUBLE)
             AS class_revenue
    FROM ranked
    GROUP BY CASE WHEN cum_share <= 0.5 THEN 'A'
                  WHEN cum_share <= 0.8 THEN 'B'
                  ELSE 'C' END
    """,
)
def q158_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification: parts bucketed by cumulative
    revenue share — A carries the first 50% of revenue, B to 80%,
    C the tail — the inventory-prioritization classic.

    The cumulative runs over the PER-PART aggregate (catalog-sized,
    not lineitem-sized) and accumulates DECIMAL (exact in any order,
    q135's rule) before one double division per row; the class cut
    then re-aggregates to three rows. r6 window audit: even the
    part grain is corpus-bound (20k rows through ONE task at sf0.1),
    so the cumulative is RECONSTRUCTED from <=64 exact bit-length
    revenue buckets (the q483 pattern): in-bucket partitioned DECIMAL
    cumsums + bounded bucket-grain offsets; equal revenues share a
    bucket, so the (revenue DESC, partkey ASC) total order is
    preserved exactly and the decimal prefix sums are identical.
    """
    li = t(spark, sf_dir, "lineitem")
    part_rev = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias(
            "revenue_dec"
        )
    )
    bucketed = part_rev.withColumn(
        "bkt",
        F.length(
            F.conv(
                (F.col("revenue_dec") * 100).cast("bigint").cast("string"),
                10,
                2,
            )
        ),
    )
    woff = Window.orderBy(F.col("bkt").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = (
        bucketed.groupBy("bkt")
        .agg(F.sum("revenue_dec").alias("bsum"))
        .select(
            "bkt",
            F.coalesce(
                F.sum("bsum").over(woff), F.lit(0).cast("decimal(28,2)")
            ).alias("off"),
        )
    )
    tot = part_rev.agg(F.sum("revenue_dec").alias("tot_dec"))
    win_b = Window.partitionBy("bkt").orderBy(
        F.col("revenue_dec").desc(), F.col("l_partkey").asc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    ranked = (
        bucketed.join(F.broadcast(offs), "bkt")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("revenue_dec").cast("double").alias("revenue"),
            (
                (F.col("off") + F.sum("revenue_dec").over(win_b)).cast(
                    "double"
                )
                / F.col("tot_dec").cast("double")
            ).alias("cum_share"),
        )
    )
    abc = (
        F.when(F.col("cum_share") <= 0.5, "A")
        .when(F.col("cum_share") <= 0.8, "B")
        .otherwise("C")
    )
    return ranked.groupBy(abc.alias("abc_class")).agg(
        F.count(F.lit(1)).alias("n_parts"),
        dsum(F.col("revenue")).alias("class_revenue"),
    )


@register(
    "q170_dau_mau_stickiness",
    oracle="""
    WITH d AS (
      SELECT CAST(DATE_TRUNC('month', ts) AS TIMESTAMP) AS month,
             CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
             COUNT(DISTINCT user_id) AS dau
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT CAST(DATE_TRUNC('month', ts) AS TIMESTAMP) AS month,
             COUNT(DISTINCT user_id) AS mau
      FROM events GROUP BY 1
    )
    SELECT m.month, m.mau,
           CAST(SUM(d.dau) AS DOUBLE) / COUNT(*) AS avg_dau,
           CAST(SUM(d.dau) AS DOUBLE) / COUNT(*) / m.mau AS stickiness
    FROM d JOIN m ON d.month = m.month
    GROUP BY m.month, m.mau
    """,
)
def q170_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-analytics stickiness: per month, average daily active
    users over monthly active users (the DAU/MAU ratio).

    Two distinct-count reductions at different grains, joined at the
    month grain. Both reductions shuffle the DISTINCT (user, period)
    key space — far smaller than raw events — and the join input is
    bounded by the calendar (≤31 day rows per month row), so the mau
    side is broadcast. All ratios divide exact integers as doubles in
    the same order on both engines.

    100 TB: the only data-sized shuffles are the two distinct
    expansions; everything downstream is calendar-sized.
    """
    ev = t(spark, sf_dir, "events").select(
        F.date_trunc("month", "ts").alias("month"),
        F.date_trunc("day", "ts").alias("day"),
        "user_id",
    )
    d = ev.groupBy("month", "day").agg(F.countDistinct("user_id").alias("dau"))
    m = ev.groupBy("month").agg(F.countDistinct("user_id").alias("mau"))
    avg_dau = F.sum("dau").cast("double") / F.count(F.lit(1))
    return (
        d.join(F.broadcast(m), "month")
        .groupBy("month", "mau")
        .agg(
            avg_dau.alias("avg_dau"),
            (avg_dau / F.col("mau")).alias("stickiness"),
        )
        .select("month", "mau", "avg_dau", "stickiness")
    )


@register(
    "q171_last_touch_attribution",
    oracle="""
    WITH attributed AS (
      SELECT event_type, value,
             LAST_VALUE(CASE WHEN event_type IN ('click', 'view')
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS touch
      FROM events
    )
    SELECT COALESCE(touch, 'none') AS touch_type,
           COUNT(*) AS purchases,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
             AS attributed_value
    FROM attributed
    WHERE event_type = 'purchase'
    GROUP BY COALESCE(touch, 'none')
    """,
)
def q171_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: each purchase credits the most recent
    preceding click/view by the same user (or 'none').

    One IGNORE-NULLS last() over a per-user window — the streaming
    frame (UNBOUNDED PRECEDING .. 1 PRECEDING) is O(1) per row, no
    self-join, no per-purchase scan-back. Ties are broken by
    (ts, event_id) for cross-engine determinism. The filter to
    purchases happens AFTER the window (earlier rows are the
    candidate touches), then a 3-group aggregate.

    100 TB: one shuffle on user_id for the window, then a tiny agg;
    attributed value sums exact cents.
    """
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type").isin("click", "view"), F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.select("event_type", "value", touch.alias("touch"))
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("touch", F.lit("none")).alias("touch_type"))
        .agg(
            F.count(F.lit(1)).alias("purchases"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("attributed_value"),
        )
    )


@register(
    "q172_event_cooccurrence",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           COUNT(*) AS users_both
    FROM ut a
    JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
    """,
)
def q172_event_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-type co-occurrence matrix: for each unordered pair of
    event types, how many users did both.

    The self-join runs on the DISTINCT (user, type) reduction — at
    most |types| rows per user (5 here), so the join fan-out is
    bounded by |types|² per user regardless of raw event volume. The
    ``<`` conjunct keeps each unordered pair once and rides along as
    a post-join filter on the user_id hash join.

    100 TB: the distinct reduction is the data-sized shuffle; the
    self-join shuffles the already-reduced key space and cannot
    explode (bounded multiplicity per key).
    """
    ut = t(spark, sf_dir, "events").select("user_id", "event_type").distinct()
    a = ut.alias("a")
    b = ut.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("users_both"))
    )


@register(
    "q173_scd2_intervals",
    oracle="""
    WITH marked AS (
      SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
             LAG(o_orderstatus) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ) AS prev_status
      FROM orders
    ),
    changes AS (
      SELECT o_custkey, o_orderstatus, o_orderdate AS valid_from, o_orderkey
      FROM marked
      WHERE prev_status IS NULL OR prev_status <> o_orderstatus
    )
    SELECT o_custkey, o_orderstatus, valid_from,
           LEAD(valid_from) OVER (
             PARTITION BY o_custkey ORDER BY valid_from, o_orderkey
           ) AS valid_to
    FROM changes
    """,
)
def q173_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 (slowly-changing-dimension) interval construction from a
    change log: per customer, collapse consecutive orders with the
    same status and emit [valid_from, valid_to) validity intervals
    (NULL valid_to = current). This is the history-table build step a
    warehouse runs before any point-in-time join.

    Two windows over the SAME (o_custkey, date, key) ordering — the
    change-detection LAG and the interval-closing LEAD — so Spark
    sorts the partition once and reuses it; no self-join, no
    gaps-and-islands grouping pass. Ties on order date are broken by
    o_orderkey for cross-engine determinism.

    100 TB: one shuffle on o_custkey; the LEAD runs on the
    change-compressed rows (≤ raw, typically ≪).
    """
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changes = (
        o.select(
            "o_custkey",
            "o_orderstatus",
            "o_orderdate",
            "o_orderkey",
            F.lag("o_orderstatus").over(w).alias("prev_status"),
        )
        .filter(
            F.col("prev_status").isNull()
            | (F.col("prev_status") != F.col("o_orderstatus"))
        )
        .select(
            "o_custkey",
            "o_orderstatus",
            F.col("o_orderdate").alias("valid_from"),
            "o_orderkey",
        )
    )
    w2 = Window.partitionBy("o_custkey").orderBy("valid_from", "o_orderkey")
    return changes.select(
        "o_custkey",
        "o_orderstatus",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    )


@register(
    "q174_order_reconciliation",
    oracle="""
    WITH lines AS (
      SELECT l_orderkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS line_total
      FROM lineitem GROUP BY l_orderkey
    ),
    cls AS (
      SELECT o.o_orderkey,
             CASE WHEN l.l_orderkey IS NULL THEN 'no_lines'
                  WHEN CAST(l.line_total AS DOUBLE) >= o.o_totalprice
                    THEN 'lines_gte_header'
                  ELSE 'lines_lt_header' END AS recon_class,
             CASE WHEN l.l_orderkey IS NULL THEN NULL
                  ELSE CAST((FLOOR(CAST(CAST(l.line_total AS DOUBLE)
                                  / o.o_totalprice AS DOUBLE) * 10000.0 + 0.5) / 10000.0)
                            AS DECIMAL(12,4)) END AS ratio
      FROM orders o
      LEFT JOIN lines l ON o.o_orderkey = l.l_orderkey
    )
    SELECT recon_class, COUNT(*) AS n_orders,
           CAST(SUM(ratio) AS DOUBLE) / COUNT(ratio) AS avg_ratio
    FROM cls GROUP BY recon_class
    """,
)
def q174_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header/detail reconciliation audit: compare each order's header
    total against the sum of its line amounts and band the outcome —
    the standard cross-source integrity check before a warehouse
    publishes a fact table.

    The per-row ratio is rounded FIRST (deterministic per row) and
    summed as an exact decimal, so the average is partition-order-free
    — the 100 TB-safe way to average a float expression. One fact
    aggregate + one key join; orders-side attributes never shuffle
    with the lineitem fan-in.
    """
    li = t(spark, sf_dir, "lineitem")
    lines = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("line_total")
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    cls = o.join(lines, F.col("o_orderkey") == F.col("l_orderkey"), "left").select(
        F.when(F.col("l_orderkey").isNull(), "no_lines")
        .when(
            F.col("line_total").cast("double") >= F.col("o_totalprice"),
            "lines_gte_header",
        )
        .otherwise("lines_lt_header")
        .alias("recon_class"),
        F.when(
            F.col("l_orderkey").isNotNull(),
            dround(
                F.col("line_total").cast("double") / F.col("o_totalprice"), 4
            ).cast("decimal(12,4)"),
        ).alias("ratio"),
    )
    return cls.groupBy("recon_class").agg(
        F.count(F.lit(1)).alias("n_orders"),
        (F.sum("ratio").cast("double") / F.count("ratio")).alias("avg_ratio"),
    )


@register(
    "q175_linenumber_gap_audit",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey, COUNT(*) AS n_lines,
             MIN(l_linenumber) AS min_ln, MAX(l_linenumber) AS max_ln
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT CASE WHEN min_ln = 1 AND max_ln = n_lines THEN 'contiguous'
                ELSE 'gapped' END AS seq_class,
           COUNT(*) AS n_orders,
           CAST(SUM(n_lines) AS BIGINT) AS n_lines
    FROM per_order GROUP BY 1
    """,
)
def q175_linenumber_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-completeness audit: per order, are line numbers the
    contiguous run 1..n? (min=1 ∧ max=count is the O(1)-state test —
    no sort, no lag, no explode of expected numbers.)

    Complements the q109 referential-integrity audit: that checks
    keys exist across tables; this checks intra-group sequence
    integrity. One partial+final aggregate on the order key, then a
    2-group rollup — nothing here grows with data beyond the first
    aggregate.
    """
    li = t(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.min("l_linenumber").alias("min_ln"),
        F.max("l_linenumber").alias("max_ln"),
    )
    seq_class = (
        F.when(
            (F.col("min_ln") == 1) & (F.col("max_ln") == F.col("n_lines")),
            "contiguous",
        )
        .otherwise("gapped")
        .alias("seq_class")
    )
    return per_order.groupBy(seq_class).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("n_lines").cast("bigint").alias("n_lines"),
    )


@register(
    "q180_merge_upsert",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_orderdate < TIMESTAMP '1997-06-01'
    ),
    chg AS (
      SELECT o_orderkey,
             CAST(CAST(o_totalprice * 1.1 AS DECIMAL(18,3)) AS DOUBLE)
               AS new_price
      FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01'
    ),
    merged AS (
      SELECT COALESCE(b.o_orderkey, c.o_orderkey) AS o_orderkey,
             CASE WHEN c.o_orderkey IS NULL THEN 'keep'
                  WHEN b.o_orderkey IS NULL THEN 'insert'
                  ELSE 'update' END AS action,
             COALESCE(c.new_price, b.o_totalprice) AS price
      FROM base b FULL OUTER JOIN chg c ON b.o_orderkey = c.o_orderkey
    )
    SELECT action, COUNT(*) AS n_rows,
           CAST(SUM(CAST(price AS DECIMAL(18,3))) AS DOUBLE) AS total_price
    FROM merged GROUP BY action
    """,
)
def q180_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE / upsert semantics expressed relationally: apply a
    changeset to a base snapshot via FULL OUTER join + COALESCE,
    classifying every key as keep / update / insert — what Spark
    users do without a Delta/Iceberg MERGE INTO, and the audit a
    MERGE implementation must pass.

    The changeset simulates repricing (+10%, rounded to an exact
    3-decimal value BEFORE the merge so downstream sums stay exact
    decimals). One shuffle on the merge key; both sides are
    pre-projected to (key, payload) so the wide order row never
    shuffles.

    100 TB: this is the shape where bucketed tables pay off — if base
    and changes are bucketed on the key (sources/bucketing.py), the
    full-outer join is Exchange-free.
    """
    o = t(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderdate") < ts("1997-06-01")).select(
        F.col("o_orderkey").alias("b_key"), "o_totalprice"
    )
    chg = o.filter(F.col("o_orderdate") >= ts("1997-01-01")).select(
        F.col("o_orderkey").alias("c_key"),
        (F.col("o_totalprice") * 1.1)
        .cast("decimal(18,3)")
        .cast("double")
        .alias("new_price"),
    )
    merged = base.join(chg, F.col("b_key") == F.col("c_key"), "full_outer").select(
        F.when(F.col("c_key").isNull(), "keep")
        .when(F.col("b_key").isNull(), "insert")
        .otherwise("update")
        .alias("action"),
        F.coalesce("new_price", "o_totalprice").alias("price"),
    )
    return merged.groupBy("action").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("price").cast("decimal(18,3)")).cast("double").alias(
            "total_price"
        ),
    )


@register(
    "q185_overlap_conflicts",
    oracle="""
    WITH spans AS (
      SELECT o.o_custkey, l.l_orderkey,
             MIN(l.l_shipdate) AS s, MAX(l.l_shipdate) AS e
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_custkey, l.l_orderkey
    )
    SELECT a.o_custkey, COUNT(*) AS overlapping_pairs
    FROM spans a
    JOIN spans b ON a.o_custkey = b.o_custkey
               AND a.l_orderkey < b.l_orderkey
               AND a.s <= b.e AND b.s <= a.e
    GROUP BY a.o_custkey
    """,
)
def q185_overlap_conflicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join: per customer, how many pairs of
    their orders have overlapping shipping spans [first ship, last
    ship] — the schedule-conflict shape (double-booking detection,
    resource contention) over derived intervals.

    Intervals are first REDUCED per order (min/max aggregate), then
    the self-join runs as an equi-join on the partition key
    (customer) with the overlap test `a.s <= b.e AND b.s <= a.e` and
    key ordering as post-join filters — never an unbounded interval
    cross-join. Per-key multiplicity is bounded (orders per
    customer), so the fan-out is quadratic only in that small factor.

    100 TB: one fact shuffle to build spans, one equi-join shuffle on
    the key; a global interval join without an equi key would instead
    need range bucketing (the q17 pattern).
    """
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    spans = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey", "l_orderkey")
        .agg(F.min("l_shipdate").alias("s"), F.max("l_shipdate").alias("e"))
    )
    a = spans.alias("a")
    b = spans.alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.l_orderkey") < F.col("b.l_orderkey"))
            & (F.col("a.s") <= F.col("b.e"))
            & (F.col("b.s") <= F.col("a.e")),
        )
        .groupBy(F.col("a.o_custkey").alias("o_custkey"))
        .agg(F.count(F.lit(1)).alias("overlapping_pairs"))
    )


@register(
    "q186_equidepth_histogram",
    oracle="""
    WITH b AS (
      SELECT quantile_cont(o_totalprice, 0.25) AS q1,
             quantile_cont(o_totalprice, 0.50) AS q2,
             quantile_cont(o_totalprice, 0.75) AS q3
      FROM orders
    )
    SELECT CASE WHEN o_totalprice <= q1 THEN 'p00_25'
                WHEN o_totalprice <= q2 THEN 'p25_50'
                WHEN o_totalprice <= q3 THEN 'p50_75'
                ELSE 'p75_100' END AS bucket,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS bucket_total
    FROM orders, b
    GROUP BY 1
    """,
)
def q186_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram: quartile boundaries from exact
    interpolated percentiles, then per-bucket counts and exact
    totals — the histogram a cost-based optimizer keeps for skewed
    columns, complementing q131's fixed-width (equi-WIDTH) bins.

    Two passes by construction (boundaries, then classification) —
    the classify pass compares against a broadcast 1-row boundary
    set, so it is map-side; no rank/ntile window over raw rows
    (NTILE would need a global sort). Spark's `percentile` and
    DuckDB's `quantile_cont` share the linear-interpolation
    definition, so boundaries agree bit-for-bit (q28 precedent).
    """
    o = t(spark, sf_dir, "orders").select("o_totalprice")
    b = o.agg(
        F.percentile("o_totalprice", 0.25).alias("q1"),
        F.percentile("o_totalprice", 0.50).alias("q2"),
        F.percentile("o_totalprice", 0.75).alias("q3"),
    )
    bucket = (
        F.when(F.col("o_totalprice") <= F.col("q1"), "p00_25")
        .when(F.col("o_totalprice") <= F.col("q2"), "p25_50")
        .when(F.col("o_totalprice") <= F.col("q3"), "p50_75")
        .otherwise("p75_100")
    )
    return (
        o.join(F.broadcast(b))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("bucket_total"),
        )
    )


@register(
    "q189_trend_slope",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(FLOOR(epoch(DATE_TRUNC('day', ts)) / 86400.0) AS BIGINT)
               AS x,
             CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS y
      FROM events
      GROUP BY event_type, DATE_TRUNC('day', ts)
    ),
    stats AS (
      SELECT event_type, COUNT(*) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM daily GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / NULLIF(CAST(n * sxx - sx * sx AS DOUBLE), 0)
             AS slope_cents_per_day
    FROM stats
    """,
)
def q189_trend_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares trend: slope of daily revenue over
    time for each event type, from ONE pass of integer sufficient
    statistics (n, Σx, Σy, Σxy, Σx²) — the scalable regression shape
    (no centering pass, no collect, mergeable partials).

    x is the epoch-day index and y exact cents, so every sum is
    integer-exact and the closed-form slope divides two exactly-
    computed numbers — bit-identical across engines and partition
    orders. The daily grain reduction comes first, so the sufficient
    statistics aggregate over ≤ |types|×|days| rows.
    """
    ev = t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("y")
    ).select(
        "event_type",
        F.floor(F.unix_timestamp("day") / 86400.0).cast("bigint").alias("x"),
        "y",
    )
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    # den = 0 when a type has a single distinct day: Spark's non-ANSI
    # double 0/0 is NULL but recent DuckDB yields IEEE NaN, so both
    # sides guard explicitly (NULLIF in the oracle) to agree on NULL.
    slope = F.when(den != 0, num.cast("double") / den.cast("double"))
    return stats.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        slope.alias("slope_cents_per_day"),
    )


@register(
    "q190_topn_with_other",
    oracle="""
    WITH rev AS (
      SELECT p.p_brand, p.p_type,
             SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                      AS DECIMAL(18,4))) AS revenue
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand, p.p_type
    ),
    ranked AS (
      SELECT p_brand, p_type, revenue,
             ROW_NUMBER() OVER (
               PARTITION BY p_brand ORDER BY revenue DESC, p_type ASC
             ) AS rk
      FROM rev
    )
    SELECT p_brand,
           CASE WHEN rk <= 3 THEN p_type ELSE 'OTHER' END AS type_bucket,
           CAST(SUM(revenue) AS DOUBLE) AS revenue
    FROM ranked
    GROUP BY p_brand, CASE WHEN rk <= 3 THEN p_type ELSE 'OTHER' END
    """,
)
def q190_topn_with_other(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group with remainder rollup: each brand's top-3 part
    types by revenue, everything else collapsed into one OTHER row —
    the BI presentation shape (dashboards can't show 50 slices).

    Rank runs over the ALREADY-AGGREGATED (brand, type) grain — never
    a window over raw lineitem — and the collapse is a second tiny
    aggregate over the same grain. Deterministic: exact-decimal
    revenue with a p_type tie-break in the rank, and OTHER sums exact
    decimals.
    """
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_type")
    rev = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,4)"
                )
            ).alias("revenue")
        )
    )
    w = Window.partitionBy("p_brand").orderBy(
        F.col("revenue").desc(), F.col("p_type").asc()
    )
    ranked = rev.withColumn("rk", F.row_number().over(w))
    bucket = F.when(F.col("rk") <= 3, F.col("p_type")).otherwise("OTHER")
    return (
        ranked.groupBy("p_brand", bucket.alias("type_bucket"))
        .agg(F.sum("revenue").cast("double").alias("revenue"))
    )


@register(
    "q192_activation_latency",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) AS first_signup,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END)
               AS first_purchase
      FROM events GROUP BY user_id
    ),
    lat AS (
      SELECT CAST(FLOOR(epoch(first_purchase)) 
                  - FLOOR(epoch(first_signup)) AS BIGINT) AS latency_sec
      FROM firsts
      WHERE first_signup IS NOT NULL AND first_purchase IS NOT NULL
        AND first_purchase >= first_signup
    )
    SELECT COUNT(*) AS n_activated,
           quantile_cont(latency_sec, 0.50) AS p50_sec,
           quantile_cont(latency_sec, 0.90) AS p90_sec,
           quantile_cont(latency_sec, 0.99) AS p99_sec
    FROM lat
    """,
)
def q192_activation_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activation latency: per user, time from first signup to first
    purchase, summarized as exact p50/p90/p99 — the activation-funnel
    health metric.

    Both "firsts" come from ONE conditional-MIN aggregate per user
    (no per-type scans, no join of events to events — the q138
    single-pass shape); percentiles run over the user-grain
    reduction, which is orders of magnitude smaller than raw events.
    Latencies are integer seconds, so interpolated percentiles agree
    across engines (q28 precedent).
    """
    ev = t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "first_signup"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    lat = firsts.filter(
        F.col("first_signup").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_signup"))
    ).select(
        (
            F.floor(F.unix_timestamp("first_purchase"))
            - F.floor(F.unix_timestamp("first_signup"))
        )
        .cast("bigint")
        .alias("latency_sec")
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_activated"),
        F.percentile("latency_sec", 0.50).alias("p50_sec"),
        F.percentile("latency_sec", 0.90).alias("p90_sec"),
        F.percentile("latency_sec", 0.99).alias("p99_sec"),
    )


@register(
    "q193_mad_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med_v
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, e.value, m.med_v,
             ABS(e.value - m.med_v) AS adev
      FROM events e JOIN med m ON e.event_type = m.event_type
    ),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad_v
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           COUNT(*) AS n_events,
           COUNT(*) FILTER (
             WHERE d.adev > 3.0 * 1.4826 * m.mad_v
           ) AS n_outliers
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    GROUP BY d.event_type
    """,
)
def q193_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation: flag
    events whose |value − median| exceeds 3 scaled MADs — the
    outlier rule that, unlike the z-score audit (q139), is not itself
    corrupted by the outliers it hunts.

    Two percentile passes by necessity (median, then MAD of
    deviations), each over a per-type aggregate that is broadcast
    back — the raw table is scanned twice but never self-joined on
    data-sized keys. The threshold comparison is pure per-row
    arithmetic on identically-computed doubles.
    """
    ev = t(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("med_v")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med_v")).alias("adev")
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", 0.5).alias("mad_v")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_if(
                F.col("adev") > 3.0 * 1.4826 * F.col("mad_v")
            ).alias("n_outliers"),
        )
    )


# ------------------------------- q348 Neyman stratified sampling

NEYMAN_BUDGET = 500


@register(
    "q348_neyman_stratified_sample",
    oracle=f"""
    WITH s AS (
      SELECT o_orderpriority AS stratum,
             COUNT(*) AS nh,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                      * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sxx
      FROM orders GROUP BY o_orderpriority
    ),
    sd AS (
      SELECT stratum, nh, sx / nh AS mean_h,
             SQRT(GREATEST((sxx - sx * sx / nh) / nh, 0.0)) AS sd_h
      FROM s
    ),
    tot AS (SELECT SUM(nh * sd_h) AS w FROM sd),
    nn AS (SELECT SUM(nh) AS n_total FROM sd),
    alloc AS (
      -- all-constant strata zero every sd_h and hence w: fall back
      -- to PROPORTIONAL allocation (nh / N) instead of dividing by 0
      SELECT d.stratum, d.nh, d.mean_h, d.sd_h,
             GREATEST(1, CAST(FLOOR(CASE WHEN t.w = 0
                  THEN {NEYMAN_BUDGET} * d.nh / CAST(nn.n_total AS DOUBLE)
                  ELSE {NEYMAN_BUDGET} * d.nh * d.sd_h / t.w END)
                              AS BIGINT)) AS n_alloc
      FROM sd d CROSS JOIN tot t CROSS JOIN nn
    ),
    ranked AS (
      SELECT o.o_orderpriority AS stratum, o.o_totalprice,
             ROW_NUMBER() OVER (
               PARTITION BY o.o_orderpriority
               ORDER BY md5(CAST(o.o_orderkey AS VARCHAR)), o.o_orderkey
             ) AS rn
      FROM orders o
    ),
    sampled AS (
      SELECT r.stratum,
             COUNT(*) AS n_sampled,
             CAST(SUM(CAST(r.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS sample_mean
      FROM ranked r JOIN alloc a ON a.stratum = r.stratum
      WHERE r.rn <= a.n_alloc
      GROUP BY r.stratum
    )
    SELECT a.stratum,
           CAST(a.nh AS BIGINT) AS pop_size,
           (FLOOR(CAST(a.mean_h AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS pop_mean,
           (FLOOR(CAST(a.sd_h AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS pop_sd,
           a.n_alloc,
           CAST(p.n_sampled AS BIGINT) AS n_sampled,
           (FLOOR(CAST(p.sample_mean AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS sample_mean
    FROM alloc a JOIN sampled p ON p.stratum = a.stratum
    """,
)
def q348_neyman_stratified_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Neyman-allocation stratified sampling — the audit/eval-set
    construction rule that beats proportional sampling when strata
    have unequal variance: budget {NEYMAN_BUDGET} rows are allocated
    nh ∝ Nh·Sh (stratum size × stratum standard deviation), and
    membership is HASH-RANKED per stratum (md5 of the key, id
    tie-break) — deterministic across engines, retries and
    partitionings, the same draw-free idiom as q144/q324.

    One pass of DECIMAL-exact sufficient statistics gives every
    stratum's mean/sd (no second scan); the allocation table is
    |strata| rows broadcast back to rank-filter the sample. Output:
    per stratum, population size/mean/sd, allocated and realized
    sample sizes, and the realized sample mean.
    """
    from pyspark.sql import Window as W

    orders = t(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    s = orders.groupBy(F.col("o_orderpriority").alias("stratum")).agg(
        F.count(F.lit(1)).alias("nh"),
        F.sum(dec).cast("double").alias("sx"),
        F.sum(dec * dec).cast("double").alias("sxx"),
    )
    sd = s.select(
        "stratum",
        "nh",
        (F.col("sx") / F.col("nh")).alias("mean_h"),
        F.sqrt(
            F.greatest(
                (F.col("sxx") - F.col("sx") * F.col("sx") / F.col("nh"))
                / F.col("nh"),
                F.lit(0.0),
            )
        ).alias("sd_h"),
    )
    tot = sd.agg(
        F.sum(F.col("nh") * F.col("sd_h")).alias("w"),
        F.sum("nh").alias("n_total"),
    )
    # all-constant strata zero every sd_h and hence w: fall back to
    # PROPORTIONAL allocation instead of dividing by zero (ANSI
    # error on Spark, inf on DuckDB — property-hunt find, r3)
    alloc = sd.crossJoin(F.broadcast(tot)).select(
        "stratum",
        "nh",
        "mean_h",
        "sd_h",
        F.greatest(
            F.lit(1),
            F.floor(
                F.when(
                    F.col("w") == 0,
                    F.lit(NEYMAN_BUDGET)
                    * F.col("nh")
                    / F.col("n_total").cast("double"),
                ).otherwise(
                    F.lit(NEYMAN_BUDGET)
                    * F.col("nh")
                    * F.col("sd_h")
                    / F.col("w")
                )
            ).cast("bigint"),
        ).alias("n_alloc"),
    )
    rw = W.partitionBy("o_orderpriority").orderBy(
        F.md5(F.col("o_orderkey").cast("string")), F.col("o_orderkey")
    )
    ranked = orders.select(
        F.col("o_orderpriority").alias("stratum"),
        "o_totalprice",
        F.row_number().over(rw).alias("rn"),
    )
    sampled = (
        ranked.join(F.broadcast(alloc.select("stratum", "n_alloc")), "stratum")
        .filter(F.col("rn") <= F.col("n_alloc"))
        .groupBy("stratum")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            (
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                / F.count(F.lit(1))
            ).alias("sample_mean"),
        )
    )
    return alloc.join(sampled, "stratum").select(
        "stratum",
        F.col("nh").cast("bigint").alias("pop_size"),
        dround("mean_h", 6).alias("pop_mean"),
        dround("sd_h", 6).alias("pop_sd"),
        "n_alloc",
        F.col("n_sampled").cast("bigint").alias("n_sampled"),
        dround("sample_mean", 6).alias("sample_mean"),
    )


# ------------------------------------ q349 correlation matrix

CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@register(
    "q349_corr_matrix",
    oracle=f"""
    WITH pairs AS (
      {" UNION ALL ".join(
        f'''SELECT '{a}~{b}' AS pair,
               CAST({a} AS DECIMAL(18,2)) AS x,
               CAST({b} AS DECIMAL(18,2)) AS y
        FROM lineitem'''
        for i, a in enumerate(CORR_COLS)
        for b in CORR_COLS[i + 1:])}
    ),
    s AS (
      SELECT pair, CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx,
             CAST(SUM(y * y) AS DOUBLE) AS syy
      FROM pairs GROUP BY pair
    )
    SELECT pair, CAST(n AS BIGINT) AS n_rows,
           (FLOOR(CAST((n * sxy - sx * sy)
                 / NULLIF(SQRT(GREATEST(
                     (n * sxx - sx * sx) * (n * syy - sy * sy), 0.0)), 0.0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS pearson_r
    FROM s ORDER BY pair
    """,
)
def q349_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over the fact table's
    numeric columns in ONE corpus pass — the feature-screening /
    multicollinearity readout before any modeling op (q282's OLS,
    q322's stumps): each row fans out to its {len(CORR_COLS)}C2
    column pairs (map-side, bounded ×6), sufficient statistics
    reduce per pair in DECIMAL (price² sums pass 2^53 — a float sum
    would be partition-order-dependent), and r comes from the
    closed form with the r3 zero-variance guards (GREATEST before
    SQRT, NULLIF for constant columns).

    At 100 TB: one shuffle of 6 groups × 7 numbers — the aggregate
    state is O(columns²), never O(rows); adding columns changes the
    fan-out constant, not the plan.
    """
    li = t(spark, sf_dir, "lineitem")
    pair_structs = [
        F.struct(
            F.lit(f"{a}~{b}").alias("pair"),
            F.col(a).cast("decimal(18,2)").alias("x"),
            F.col(b).cast("decimal(18,2)").alias("y"),
        )
        for i, a in enumerate(CORR_COLS)
        for b in CORR_COLS[i + 1:]
    ]
    pairs = li.select(
        F.explode(F.array(*pair_structs)).alias("p")
    ).select("p.pair", "p.x", "p.y")
    s = pairs.groupBy("pair").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    r = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.nullif(
        F.sqrt(
            F.greatest(
                (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")),
                F.lit(0.0),
            )
        ),
        F.lit(0.0),
    )
    return s.select(
        "pair",
        F.col("n").cast("bigint").alias("n_rows"),
        dround(r, 6).alias("pearson_r"),
    ).orderBy("pair")


# ------------------------------------ q350 Fleiss' kappa

FLEISS_RATERS = 3
FLEISS_K = 3  # label categories
# agreement dial: hash % 5 < 3 -> rater reports the base label
_FLEISS_SPARK_H = (
    "conv(substring(md5(concat(cast(doc_id as string), ':', "
    "cast(r as string))), 1, 7), 16, 10)"
)


@register(
    "q350_fleiss_kappa",
    oracle=f"""
    WITH rated AS (
      SELECT d.doc_id,
             CAST(CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 7)
                  AS BIGINT) % {FLEISS_K} AS BIGINT) AS base,
             CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':'
                                     || CAST(r.r AS VARCHAR)), 1, 7)
                  AS BIGINT) AS h,
             r.r
      FROM documents d, UNNEST(range({FLEISS_RATERS})) r(r)
    ),
    labels AS (
      SELECT doc_id,
             CASE WHEN h % 5 < 3 THEN base
                  ELSE (base + 1 + h % 2) % {FLEISS_K} END AS label
      FROM rated
    ),
    nij AS (
      SELECT doc_id, label, COUNT(*) AS c FROM labels
      GROUP BY doc_id, label
    ),
    per_subject AS (
      SELECT doc_id,
             (SUM(c * c) - {FLEISS_RATERS})
               / CAST({FLEISS_RATERS} * ({FLEISS_RATERS} - 1) AS DOUBLE)
               AS p_i
      FROM nij GROUP BY doc_id
    ),
    pbar AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_subjects,
             SUM(p_i) / COUNT(*) AS p_bar
      FROM per_subject
    ),
    pj AS (
      SELECT SUM(POW(CAST(c2 AS DOUBLE), 2)) AS pe FROM (
        SELECT CAST(SUM(c) AS DOUBLE)
               / (SELECT CAST(COUNT(*) AS DOUBLE) * {FLEISS_RATERS}
                  FROM per_subject) AS c2
        FROM nij GROUP BY label
      )
    )
    SELECT b.n_subjects,
           {FLEISS_RATERS} AS n_raters,
           (FLOOR(CAST(b.p_bar AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS p_bar,
           (FLOOR(CAST(j.pe AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS p_e,
           (FLOOR(CAST((b.p_bar - j.pe) / NULLIF(1.0 - j.pe, 0.0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS fleiss_kappa
    FROM pbar b CROSS JOIN pj j
    """,
)
def q350_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa — chance-corrected agreement for MORE THAN TWO
    raters, completing the labeling-QA family (q304 Cohen's kappa is
    the 2-rater case): {FLEISS_RATERS} deterministic hash-derived
    raters label every document into {FLEISS_K} classes (each rater
    reports the doc's base class with probability 3/5, else a
    deterministic alternative — so agreement is well above chance
    but imperfect), and κ = (P̄ − Pe)/(1 − Pe) from the per-subject
    agreement and squared marginal shares.

    All counts are exact integers until the final ratios; the hash
    idiom (md5 hex → BIGINT, 7 nibbles) is the engine-portable
    randomness used across the sampling ops. Scale: the rater
    fan-out is ×{FLEISS_RATERS} map-side; state is |docs| n_ij
    rows reduced twice into O(1) aggregates.
    """
    docs = t(spark, sf_dir, "documents").select("doc_id")
    raters = spark.range(FLEISS_RATERS).select(F.col("id").alias("r"))
    rated = docs.crossJoin(F.broadcast(raters)).select(
        "doc_id",
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 7),
                16,
                10,
            ).cast("bigint")
            % FLEISS_K
        ).alias("base"),
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(":", F.col("doc_id").cast("string"),
                                F.col("r").cast("string"))
                ),
                1,
                7,
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("h"),
    )
    labels = rated.select(
        "doc_id",
        F.when(F.col("h") % 5 < 3, F.col("base"))
        .otherwise((F.col("base") + 1 + F.col("h") % 2) % FLEISS_K)
        .alias("label"),
    )
    nij = labels.groupBy("doc_id", "label").agg(F.count(F.lit(1)).alias("c"))
    per_subject = nij.groupBy("doc_id").agg(
        (
            (F.sum(F.col("c") * F.col("c")) - F.lit(FLEISS_RATERS))
            / F.lit(float(FLEISS_RATERS * (FLEISS_RATERS - 1)))
        ).alias("p_i")
    )
    pbar = per_subject.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_subjects"),
        (F.sum("p_i") / F.count(F.lit(1))).alias("p_bar"),
    )
    total = per_subject.agg(
        (F.count(F.lit(1)).cast("double") * FLEISS_RATERS).alias("tot")
    )
    pj = (
        nij.groupBy("label")
        .agg(F.sum("c").cast("double").alias("cj"))
        .crossJoin(F.broadcast(total))
        .select((F.col("cj") / F.col("tot")).alias("c2"))
        .agg(F.sum(F.col("c2") * F.col("c2")).alias("pe"))
    )
    return pbar.crossJoin(F.broadcast(pj)).select(
        "n_subjects",
        F.lit(FLEISS_RATERS).alias("n_raters"),
        dround("p_bar", 6).alias("p_bar"),
        dround("pe", 6).alias("p_e"),
        dround(
            (F.col("p_bar") - F.col("pe"))
            / F.nullif(F.lit(1.0) - F.col("pe"), F.lit(0.0)),
            6,
        ).alias("fleiss_kappa"),
    )


# ----------------------------- q352 two-sample Kolmogorov-Smirnov

KS_SRC_A = "src0"
KS_SRC_B = "src1"


@register(
    "q352_ks_two_sample",
    oracle=f"""
    WITH s AS (
      SELECT n_chars AS v,
             CASE WHEN source = '{KS_SRC_A}' THEN 1 ELSE 0 END AS a,
             CASE WHEN source = '{KS_SRC_B}' THEN 1 ELSE 0 END AS b
      FROM documents WHERE source IN ('{KS_SRC_A}', '{KS_SRC_B}')
    ),
    tot AS (
      SELECT CAST(SUM(a) AS DOUBLE) AS na, CAST(SUM(b) AS DOUBLE) AS nb
      FROM s
    ),
    steps AS (
      SELECT v, SUM(a) AS ca, SUM(b) AS cb FROM s GROUP BY v
    ),
    cdf AS (
      SELECT v,
             SUM(ca) OVER (ORDER BY v) AS cum_a,
             SUM(cb) OVER (ORDER BY v) AS cum_b
      FROM steps
    )
    SELECT CAST(t.na AS BIGINT) AS n_a,
           CAST(t.nb AS BIGINT) AS n_b,
           -- NULLIF: a one-source corpus empties a side; D is then
           -- undefined (NULL) on both engines, not inf/error
           (FLOOR(CAST(MAX(ABS(c.cum_a / NULLIF(t.na, 0.0)
                         - c.cum_b / NULLIF(t.nb, 0.0))) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS ks_d,
           (FLOOR(CAST(MAX(ABS(c.cum_a / NULLIF(t.na, 0.0)
                         - c.cum_b / NULLIF(t.nb, 0.0)))
                 / (1.36 * SQRT((t.na + t.nb)
                                / NULLIF(t.na * t.nb, 0.0))) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS d_over_crit_95
    FROM cdf c CROSS JOIN tot t
    GROUP BY t.na, t.nb
    """,
)
def q352_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between two
    sources' document-length distributions — the distribution-drift
    test that needs NO binning choice (unlike q141's fixed-bin drift
    and q292's fixed-quantile QQ): D = max |F̂_A(x) − F̂_B(x)| over
    the merged support, compared to the 95% critical value
    1.36·√((n_A+n_B)/(n_A·n_B)).

    Plan: one conditional-count pass to per-value step counts (the
    DISTINCT-VALUE grain, not the row grain), one ordered running
    sum over that reduced support, one max — counts are exact
    integers so the D statistic is bit-identical cross-engine. At
    100 TB the support-grain window is the only sort, sized by
    distinct lengths, not documents.
    """
    from pyspark.sql import Window as W

    s = (
        t(spark, sf_dir, "documents")
        .filter(F.col("source").isin(KS_SRC_A, KS_SRC_B))
        .select(
            F.col("n_chars").alias("v"),
            F.when(F.col("source") == KS_SRC_A, 1).otherwise(0).alias("a"),
            F.when(F.col("source") == KS_SRC_B, 1).otherwise(0).alias("b"),
        )
    )
    tot = s.agg(
        F.sum("a").cast("double").alias("na"),
        F.sum("b").cast("double").alias("nb"),
    )
    steps = s.groupBy("v").agg(
        F.sum("a").alias("ca"), F.sum("b").alias("cb")
    )
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    cdf = steps.select(
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    # NULLIF: a one-source corpus empties a side; D is then
    # undefined (NULL) on both engines, not an ANSI error / inf
    gap = F.abs(
        F.col("cum_a") / F.nullif(F.col("na"), F.lit(0.0))
        - F.col("cum_b") / F.nullif(F.col("nb"), F.lit(0.0))
    )
    return (
        cdf.crossJoin(F.broadcast(tot))
        .groupBy("na", "nb")
        .agg(F.max(gap).alias("d"))
        .select(
            F.col("na").cast("bigint").alias("n_a"),
            F.col("nb").cast("bigint").alias("n_b"),
            dround("d", 6).alias("ks_d"),
            dround(
                F.col("d")
                / (
                    F.lit(1.36)
                    * F.sqrt(
                        (F.col("na") + F.col("nb"))
                        / F.nullif(F.col("na") * F.col("nb"), F.lit(0.0))
                    )
                ),
                6,
            ).alias("d_over_crit_95"),
        )
    )


# --------------------------- q353 Benjamini-Hochberg FDR control

BH_ALPHA = 0.1


@register(
    "q353_bh_fdr_control",
    oracle=f"""
    WITH span AS (
      SELECT MIN(ts) AS t0, MAX(ts) AS t1 FROM events
    ),
    halves AS (
      -- midpoint in INTEGER epoch microseconds on both engines:
      -- interval/2 arithmetic rounds differently across engines
      SELECT e.event_type,
             CASE WHEN epoch_us(e.ts) < epoch_us(s.t0)
                       + (epoch_us(s.t1) - epoch_us(s.t0)) // 2
                  THEN 1 ELSE 0 END AS h1,
             CAST(e.value AS DECIMAL(18,2)) AS v
      FROM events e CROSS JOIN span s
    ),
    stats AS (
      SELECT event_type,
             CAST(SUM(h1) AS DOUBLE) AS n1,
             CAST(SUM(1 - h1) AS DOUBLE) AS n2,
             CAST(SUM(CASE WHEN h1 = 1 THEN v END) AS DOUBLE) AS s1,
             CAST(SUM(CASE WHEN h1 = 0 THEN v END) AS DOUBLE) AS s2,
             CAST(SUM(CASE WHEN h1 = 1 THEN v * v END) AS DOUBLE) AS q1,
             CAST(SUM(CASE WHEN h1 = 0 THEN v * v END) AS DOUBLE) AS q2
      FROM halves GROUP BY event_type
    ),
    ztab AS (
      SELECT event_type, n1, n2,
             (s1 / NULLIF(n1, 0.0) - s2 / NULLIF(n2, 0.0))
               / NULLIF(SQRT(GREATEST(
                   (q1 - s1 * s1 / NULLIF(n1, 0.0))
                     / NULLIF(n1 * GREATEST(n1 - 1, 1.0), 0.0)
                   + (q2 - s2 * s2 / NULLIF(n2, 0.0))
                     / NULLIF(n2 * GREATEST(n2 - 1, 1.0), 0.0), 0.0)), 0.0)
               AS z
      FROM stats
    ),
    ptab AS (
      -- logistic approximation of the two-sided normal p-value:
      -- identical op order on both engines, so hash-stable
      SELECT event_type,
             (FLOOR(CAST(2.0 / (1.0 + exp(1.702 * ABS(z))) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS p
      FROM ztab
    ),
    ranked AS (
      SELECT event_type, p,
             ROW_NUMBER() OVER (ORDER BY p, event_type) AS r,
             COUNT(*) OVER () AS m
      FROM ptab WHERE p IS NOT NULL
    ),
    cutoff AS (
      SELECT COALESCE(MAX(CASE WHEN p <= {BH_ALPHA} * r / m
                               THEN p END), -1.0) AS p_star
      FROM ranked
    )
    SELECT rk.event_type, rk.p AS p_value,
           CAST(rk.r AS BIGINT) AS rank_asc,
           (FLOOR(CAST({BH_ALPHA} * rk.r / rk.m AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS bh_line,
           CASE WHEN rk.p <= c.p_star THEN 1 ELSE 0 END AS rejected
    FROM ranked rk CROSS JOIN cutoff c
    """,
)
def q353_bh_fdr_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini-Hochberg FDR control — the multiple-testing
    correction every metrics platform needs once it tests MANY
    hypotheses at once (here: one Welch z-test per event type,
    first-half vs second-half mean value): rank p ascending, find
    the largest r with p_r ≤ α·r/m, reject everything at or below
    that p. Running q151-style tests per type WITHOUT this inflates
    false positives linearly in m.

    p-values use a logistic approximation of the two-sided normal
    tail (identical arithmetic both engines, rounded before every
    compare); sufficient statistics are DECIMAL-exact; all the r3
    zero-variance guards apply (single-row halves, constant values).
    Plan: one fact pass, |types| sufficient-stat rows, the BH walk
    runs on the m-row frame.
    """
    from pyspark.sql import Window as W

    ev = t(spark, sf_dir, "events")
    span = ev.agg(F.min("ts").alias("t0"), F.max("ts").alias("t1"))
    dec = F.col("value").cast("decimal(18,2)")
    halves = ev.crossJoin(F.broadcast(span)).select(
        "event_type",
        F.when(
            F.unix_micros("ts")
            < F.unix_micros("t0")
            + F.expr("(unix_micros(t1) - unix_micros(t0)) div 2"),
            1,
        )
        .otherwise(0)
        .alias("h1"),
        dec.alias("v"),
    )
    stats = halves.groupBy("event_type").agg(
        F.sum("h1").cast("double").alias("n1"),
        F.sum(1 - F.col("h1")).cast("double").alias("n2"),
        F.sum(F.when(F.col("h1") == 1, F.col("v"))).cast("double").alias("s1"),
        F.sum(F.when(F.col("h1") == 0, F.col("v"))).cast("double").alias("s2"),
        F.sum(F.when(F.col("h1") == 1, F.col("v") * F.col("v")))
        .cast("double")
        .alias("q1"),
        F.sum(F.when(F.col("h1") == 0, F.col("v") * F.col("v")))
        .cast("double")
        .alias("q2"),
    )
    var1 = (
        F.col("q1") - F.col("s1") * F.col("s1") / F.nullif(F.col("n1"), F.lit(0.0))
    ) / F.nullif(
        F.col("n1") * F.greatest(F.col("n1") - 1, F.lit(1.0)), F.lit(0.0)
    )
    var2 = (
        F.col("q2") - F.col("s2") * F.col("s2") / F.nullif(F.col("n2"), F.lit(0.0))
    ) / F.nullif(
        F.col("n2") * F.greatest(F.col("n2") - 1, F.lit(1.0)), F.lit(0.0)
    )
    z = (
        F.col("s1") / F.nullif(F.col("n1"), F.lit(0.0))
        - F.col("s2") / F.nullif(F.col("n2"), F.lit(0.0))
    ) / F.nullif(F.sqrt(F.greatest(var1 + var2, F.lit(0.0))), F.lit(0.0))
    ptab = stats.select(
        "event_type",
        dround(2.0 / (1.0 + F.exp(1.702 * F.abs(z))), 6).alias("p"),
    ).filter(F.col("p").isNotNull())
    wr = W.orderBy("p", "event_type")
    ranked = ptab.select(
        "event_type",
        "p",
        F.row_number().over(wr).alias("r"),
        F.count(F.lit(1)).over(W.partitionBy()).alias("m"),
    )
    cutoff = ranked.agg(
        F.coalesce(
            F.max(
                F.when(
                    F.col("p") <= F.lit(BH_ALPHA) * F.col("r") / F.col("m"),
                    F.col("p"),
                )
            ),
            F.lit(-1.0),
        ).alias("p_star")
    )
    return ranked.crossJoin(F.broadcast(cutoff)).select(
        "event_type",
        F.col("p").alias("p_value"),
        F.col("r").cast("bigint").alias("rank_asc"),
        dround(F.lit(BH_ALPHA) * F.col("r") / F.col("m"), 6).alias("bh_line"),
        F.when(F.col("p") <= F.col("p_star"), 1).otherwise(0).alias("rejected"),
    )


# --------------------- q365 Holt linear-trend smoothing (recursive CTE)

_HOLT_SQL = """    WITH RECURSIVE m AS (
      SELECT (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1
               AS mi,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS y
      FROM __ORDERS__
      WHERE o_orderdate >= TIMESTAMP '1995-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY 1
    ),
    h AS (
      SELECT mi, y, y AS l, CAST(0.0 AS DOUBLE) AS b,
             CAST(NULL AS DOUBLE) AS fitted
      FROM m WHERE mi = 0
      UNION ALL
      SELECT m.mi, m.y,
             0.2 * m.y + 0.8 * (h.l + h.b),
             0.1 * ((0.2 * m.y + 0.8 * (h.l + h.b)) - h.l) + 0.9 * h.b,
             h.l + h.b
      FROM m JOIN h ON m.mi = h.mi + 1
    )
    SELECT CAST(mi AS BIGINT) AS month_idx,
           (FLOOR(CAST(y AS DOUBLE) * 100.0 + 0.5) / 100.0) AS revenue,
           (FLOOR(CAST(l AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS level,
           (FLOOR(CAST(b AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS trend,
           (FLOOR(CAST(fitted AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS fitted,
           (FLOOR(CAST(y - fitted AS DOUBLE) * 10000.0 + 0.5) / 10000.0) AS residual
    FROM h"""


@register(
    "q365_holt_linear_trend",
    oracle=_HOLT_SQL.replace("__ORDERS__", "orders"),
)
def q365_holt_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear-trend exponential smoothing (double smoothing,
    alpha=0.2, beta=0.1) over the 1995-1996 monthly revenue series,
    executed as a RECURSIVE CTE — the same optimizer-managed
    iterate-and-join plan on BOTH engines (the one dialect difference
    is none at all here: the SQL text is shared verbatim). Extends
    the forecasting shelf: q06 regression trend, q302 seasonal-naive
    backtest, q276 truncated EWMA (which approximates only the level
    term); Holt adds the trend state the EWMA cannot carry, and the
    one-step-ahead fitted values + residuals are the backtest
    readout.

    r4 plan change (r3 verdict task 5): the oracle KEEPS the
    recursive CTE, but the Spark side no longer pays 24 recursion
    stages for a 24-row series (8.2 s warm at sf0.1 — pure
    per-iteration stage overhead). The monthly pre-aggregate (the
    only corpus-sized stage) feeds ONE applyInPandas group whose
    Python loop evaluates the recurrence with the IDENTICAL IEEE
    double expressions and op order as the CTE — so the result is
    bit-exact against the oracle, not merely close: sequential
    ``0.2*y + 0.8*(l+b)`` in CPython and in DuckDB's executor round
    identically at every step. Missing-month semantics mirror the
    CTE's ``m.mi = h.mi + 1`` join: the walk stops at the first gap.

    Determinism: monthly revenue reduces through DECIMAL(18,2) (the
    order-independent exact sum) before the double cast; display
    rounds at 1e-4 via F.round/ROUND (both half-away-from-zero on
    doubles). At 100 TB the monthly pre-aggregate is the only
    corpus-sized stage; the smoothing state walk is 24 rows in one
    tiny task.
    """
    import pandas as pd

    orders = t(spark, sf_dir, "orders")
    monthly = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy(
            (
                (F.year("o_orderdate") - 1995) * 12
                + F.month("o_orderdate")
                - 1
            ).alias("mi")
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("y")
        )
    )

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        by_mi = dict(zip(pdf["mi"], pdf["y"]))
        rows: list[tuple] = []
        if 0 in by_mi:
            y = by_mi[0]
            lvl, trd = y, 0.0
            rows.append((0, y, lvl, trd, None))
            mi = 1
            while mi in by_mi:
                y = by_mi[mi]
                fitted = lvl + trd
                # EXACT op order of the oracle's recursive step
                new_l = 0.2 * y + 0.8 * (lvl + trd)
                new_b = 0.1 * ((0.2 * y + 0.8 * (lvl + trd)) - lvl) + 0.9 * trd
                lvl, trd = new_l, new_b
                rows.append((mi, y, lvl, trd, fitted))
                mi += 1
        out = pd.DataFrame(
            rows, columns=["mi", "y", "l", "b", "fitted"]
        )
        out["fitted"] = pd.array(out["fitted"], dtype="Float64")
        return out

    h = monthly.groupBy(F.lit(1).alias("g")).applyInPandas(
        holt, schema="mi long, y double, l double, b double, fitted double"
    )
    return h.select(
        F.col("mi").alias("month_idx"),
        dround("y", 2).alias("revenue"),
        dround("l", 4).alias("level"),
        dround("b", 4).alias("trend"),
        dround("fitted", 4).alias("fitted"),
        dround(F.col("y") - F.col("fitted"), 4).alias("residual"),
    )


# ---------------- q376 Mann-Whitney U rank-sum test (two groups)

MWU_GRP_A = "1-URGENT"
MWU_GRP_B = "5-LOW"


@register(
    "q376_mann_whitney_u",
    oracle=f"""
    WITH s AS (
      SELECT o_totalprice AS v,
             CASE WHEN o_orderpriority = '{MWU_GRP_A}' THEN 1 ELSE 0 END AS a,
             CASE WHEN o_orderpriority = '{MWU_GRP_B}' THEN 1 ELSE 0 END AS b
      FROM orders
      WHERE o_orderpriority IN ('{MWU_GRP_A}', '{MWU_GRP_B}')
    ),
    tot AS (
      SELECT CAST(SUM(a) AS BIGINT) AS na, CAST(SUM(b) AS BIGINT) AS nb
      FROM s
    ),
    steps AS (
      SELECT v, CAST(SUM(a) AS BIGINT) AS ca,
             CAST(SUM(a) + SUM(b) AS BIGINT) AS tc
      FROM s GROUP BY v
    ),
    ranked AS (
      -- midrank of a tied value block, doubled to stay integer:
      -- 2*avgrank = 2*cum_count - block_size + 1
      SELECT ca, tc, SUM(tc) OVER (ORDER BY v) AS cum FROM steps
    ),
    agg AS (
      SELECT CAST(SUM(CAST(ca * (2 * cum - tc + 1) AS DECIMAL(38,0)))
                  AS DOUBLE) AS two_ra,
             CAST(SUM(CAST(tc * tc * tc - tc AS DECIMAL(38,0)))
                  AS DOUBLE) AS ties
      FROM ranked
    )
    SELECT t.na AS n_a, t.nb AS n_b,
           (g.two_ra - CAST(t.na AS DOUBLE) * (t.na + 1)) / 2 AS u_a,
           (FLOOR(CAST((g.two_ra - CAST(t.na AS DOUBLE) * (t.na + 1)
              - CAST(t.na AS DOUBLE) * t.nb)
             / NULLIF(2 * SQRT(GREATEST(
                 CAST(t.na AS DOUBLE) * t.nb / 12
                 * ((t.na + t.nb + 1)
                    - g.ties / NULLIF(CAST(t.na + t.nb AS DOUBLE)
                                      * (t.na + t.nb - 1), 0.0)),
                 0.0)), 0.0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS z,
           CAST(CASE WHEN ABS(
             (g.two_ra - CAST(t.na AS DOUBLE) * (t.na + 1)
              - CAST(t.na AS DOUBLE) * t.nb)
             / NULLIF(2 * SQRT(GREATEST(
                 CAST(t.na AS DOUBLE) * t.nb / 12
                 * ((t.na + t.nb + 1)
                    - g.ties / NULLIF(CAST(t.na + t.nb AS DOUBLE)
                                      * (t.na + t.nb - 1), 0.0)),
                 0.0)), 0.0)) > CAST(1.959964 AS DOUBLE)
             THEN 1 ELSE 0 END AS BIGINT) AS significant_95
    FROM tot t CROSS JOIN agg g
    """,
)
def q376_mann_whitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (Mann & Whitney 1947) between two
    order-priority groups' price distributions — the NON-parametric
    two-sample location test beside q151's parametric A/B z-test and
    q352's KS distribution test: no normality assumption, robust to
    the heavy right tail order totals actually have.

    Rank arithmetic is EXACT: tied values get the midrank, carried
    DOUBLED (2*avgrank = 2*cum - block + 1) so every rank sum is
    integer; the tie-corrected normal approximation
    sigma^2 = na*nb/12 * ((n+1) - T/(n(n-1))), T = sum(t^3 - t)
    divides/roots identically ordered operands on both engines. No
    continuity correction (documented choice, same both sides).
    Degenerate guards: one-sided corpora (na or nb = 0) and the
    all-tied corpus (sigma = 0) NULL the z on both engines.

    Scale: ranks come from the DISTINCT-VALUE grain (q352's trick) —
    one conditional-count groupBy, then (r6 window audit: prices are
    near-unique, so even the value grain is corpus-bound) the running
    rank sum is RECONSTRUCTED from <=64 exact bit-length price-cent
    buckets (the q483/q444 pattern): in-bucket partitioned cumsums +
    bounded bucket-grain offsets, equal prices share a bucket, so the
    value-ordered prefix sums are identical BIGINTs. DECIMAL(38,0)
    rank sums so 10^12-row corpora cannot overflow the n^2-scale
    rank total. No row-grain sort anywhere.
    """
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin(MWU_GRP_A, MWU_GRP_B)
    )
    s = o.select(
        F.col("o_totalprice").alias("v"),
        F.when(F.col("o_orderpriority") == MWU_GRP_A, 1).otherwise(0).alias("a"),
        F.when(F.col("o_orderpriority") == MWU_GRP_B, 1).otherwise(0).alias("b"),
    )
    tot = s.agg(
        F.sum("a").cast("bigint").alias("na"),
        F.sum("b").cast("bigint").alias("nb"),
    )
    steps = s.groupBy("v").agg(
        F.sum("a").cast("bigint").alias("ca"),
        (F.sum("a") + F.sum("b")).cast("bigint").alias("tc"),
    ).withColumn(
        "bkt",
        F.length(
            F.conv(
                (F.col("v").cast("decimal(18,2)") * 100)
                .cast("bigint")
                .cast("string"),
                10,
                2,
            )
        ),
    )
    woff = Window.orderBy(F.col("bkt").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = (
        steps.groupBy("bkt")
        .agg(F.sum("tc").alias("bsum"))
        .select(
            "bkt",
            F.coalesce(F.sum("bsum").over(woff), F.lit(0)).alias("off"),
        )
    )
    win_b = Window.partitionBy("bkt").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = steps.join(F.broadcast(offs), "bkt").select(
        "ca", "tc", (F.col("off") + F.sum("tc").over(win_b)).alias("cum")
    )
    agg = ranked.agg(
        F.sum(
            (F.col("ca") * (2 * F.col("cum") - F.col("tc") + 1)).cast(
                "decimal(38,0)"
            )
        )
        .cast("double")
        .alias("two_ra"),
        F.sum(
            (F.col("tc") * F.col("tc") * F.col("tc") - F.col("tc")).cast(
                "decimal(38,0)"
            )
        )
        .cast("double")
        .alias("ties"),
    )
    na = F.col("na").cast("double")
    nb = F.col("nb").cast("double")
    n = F.col("na") + F.col("nb")
    sigma2 = (
        na * F.col("nb") / 12
        * ((n + 1) - F.col("ties") / F.nullif(n.cast("double") * (n - 1), F.lit(0.0)))
    )
    num = F.col("two_ra") - na * (F.col("na") + 1) - na * F.col("nb")
    z = num / F.nullif(2 * F.sqrt(F.greatest(sigma2, F.lit(0.0))), F.lit(0.0))
    return (
        tot.crossJoin(F.broadcast(agg))
        .select(
            F.col("na").alias("n_a"),
            F.col("nb").alias("n_b"),
            ((F.col("two_ra") - na * (F.col("na") + 1)) / 2).alias("u_a"),
            dround(z, 6).alias("z"),
            F.when(F.abs(z) > F.lit(1.959964).cast("double"), 1)
            .otherwise(0)
            .cast("bigint")
            .alias("significant_95"),
        )
    )


# ------- q378 Markov removal-effect channel attribution

MRE_CONV = "purchase"
MRE_ITERS = 6  # absorption-probability truncation depth (documented spec)


def _mre_transitions_sql(events: str) -> str:
    """Journey transition counts: START -> c1 -> ... -> cn -> CONV|DROP,
    where the journey is each user's pre-first-purchase channel
    sequence (total order (ts, event_id))."""
    return f"""
    first_conv AS (
      SELECT user_id, event_id AS conv_eid, ts AS conv_ts FROM (
        SELECT user_id, event_id, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rk
        FROM {events} WHERE event_type = '{MRE_CONV}'
      ) WHERE rk = 1
    ),
    journey AS (
      SELECT e.user_id, e.ts, e.event_id, e.event_type,
             f.user_id IS NOT NULL AS conv
      FROM {events} e LEFT JOIN first_conv f ON f.user_id = e.user_id
      WHERE e.event_type <> '{MRE_CONV}'
        AND (f.user_id IS NULL OR e.ts < f.conv_ts
             OR (e.ts = f.conv_ts AND e.event_id < f.conv_eid))
    ),
    hops AS (
      SELECT user_id, event_type AS src, conv,
             LEAD(event_type) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS nxt,
             ROW_NUMBER() OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM journey
    ),
    trans_raw AS (
      SELECT 'START' AS src, src AS dst FROM hops WHERE rn = 1
      UNION ALL
      SELECT src, COALESCE(nxt, CASE WHEN conv THEN 'CONV' ELSE 'DROP' END)
      FROM hops
      UNION ALL
      SELECT 'START', CASE WHEN conv THEN 'CONV' ELSE 'DROP' END
      FROM (SELECT f.user_id, TRUE AS conv FROM first_conv f
            WHERE NOT EXISTS (SELECT 1 FROM journey j
                              WHERE j.user_id = f.user_id))
    ),
    trans AS (
      SELECT src, dst, COUNT(*) AS c FROM trans_raw GROUP BY 1, 2
    ),
    prob AS (
      SELECT src, dst,
             CAST(c AS DOUBLE)
             / CAST(SUM(c) OVER (PARTITION BY src) AS DOUBLE) AS p
      FROM trans
    ),
    removed AS (
      SELECT DISTINCT src AS r FROM trans
      WHERE src NOT IN ('START') UNION ALL SELECT '(none)'
    ),
    rprob AS (
      -- removal: every hop into/out of the removed channel is lost
      -- (NOT renormalized - the standard removal-effect definition)
      SELECT rm.r, p.src, p.dst, p.p
      FROM removed rm JOIN prob p
        ON p.src <> rm.r AND p.dst <> rm.r
    ),
    states AS (SELECT DISTINCT r, src AS s FROM rprob)
    """


def _mre_iter_sql() -> str:
    """Unrolled K-step absorption iteration p_k(s) = P(s->CONV) +
    sum_t P(s->t) p_{k-1}(t) (DuckDB forbids aggregates over
    recursive refs, so both engines run the same unrolled plan)."""
    steps = [
        """p0 AS (
      SELECT st.r, st.s,
             CAST(COALESCE(SUM(CASE WHEN rp.dst = 'CONV' THEN rp.p END), 0.0)
                  AS DOUBLE) AS p
      FROM states st
      LEFT JOIN rprob rp ON rp.r = st.r AND rp.src = st.s
      GROUP BY st.r, st.s
    )"""
    ]
    for k in range(1, MRE_ITERS + 1):
        steps.append(
            f"""p{k} AS (
      SELECT st.r, st.s,
             CAST(COALESCE(SUM(CASE WHEN rp.dst = 'CONV' THEN rp.p END), 0.0)
                  AS DOUBLE)
             + COALESCE(SUM(rp.p * pr.p), 0.0) AS p
      FROM states st
      LEFT JOIN rprob rp ON rp.r = st.r AND rp.src = st.s
      LEFT JOIN p{k - 1} pr ON pr.r = st.r AND pr.s = rp.dst
      GROUP BY st.r, st.s
    )"""
        )
    return ",\n    ".join(steps)


_MRE_SQL = (
    "WITH "
    + "__TRANS__"
    + ",\n    "
    + "__ITER__"
    + f""",
    conv_probs AS (
      SELECT r, p FROM p{MRE_ITERS} WHERE s = 'START'
    ),
    base AS (SELECT p AS pb FROM conv_probs WHERE r = '(none)'),
    eff AS (
      SELECT c.r, c.p, b.pb,
             (b.pb - c.p) / NULLIF(b.pb, 0.0) AS re
      FROM conv_probs c CROSS JOIN base b
      WHERE c.r <> '(none)'
    ),
    tot AS (SELECT SUM(re) AS te FROM eff)
    SELECT e.r AS channel,
           (FLOOR(CAST(e.pb AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS p_conv_base,
           (FLOOR(CAST(e.p AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS p_conv_removed,
           (FLOOR(CAST(e.re AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS removal_effect,
           (FLOOR(CAST(e.re / NULLIF(t.te, 0.0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS attribution_share
    FROM eff e CROSS JOIN tot t
    """
)


def _mre_sql(events: str) -> str:
    sql = _MRE_SQL.replace("__TRANS__", _mre_transitions_sql(events))
    return sql.replace("__ITER__", _mre_iter_sql())


@register(
    "q378_markov_attribution",
    oracle=_mre_sql("events"),
)
def q378_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov removal-effect multi-touch attribution — the
    graph-model capstone over q171 (last-touch) and q284
    (time-decay): build the first-order channel transition graph from
    each user's pre-first-purchase journey, then for every channel
    compute the K-step absorption probability P(START -> CONV) with
    that channel's node removed (hops touching it are simply lost,
    not renormalized — the standard removal-effect definition), and
    attribute conversions proportionally to each channel's relative
    drop.  K is truncated at MRE_ITERS=6 and both engines run the
    same unrolled iteration (DuckDB forbids aggregates over recursive
    CTE refs, so recursion is not portable here).

    Scale: the events table is touched exactly twice — one grouped
    reduce for first purchases and one user_id-partitioned window for
    journey hops (single shuffle each).  Everything downstream lives
    on the channel-transition edge list (at most (channels+2)^2 rows
    ~ 50), so the removal grid, the 7 absorption iterations, and the
    final shares are all broadcast-sized regardless of input volume;
    a 100 TB events table costs the same two shuffles.
    """
    ev = t(spark, sf_dir, "events")
    first_conv = (
        ev.filter(F.col("event_type") == MRE_CONV)
        .groupBy("user_id")
        .agg(
            F.min_by("event_id", F.struct("ts", "event_id")).alias("conv_eid"),
            F.min("ts").alias("conv_ts"),
        )
    )
    journey = (
        ev.filter(F.col("event_type") != MRE_CONV)
        .join(first_conv, "user_id", "left")
        .filter(
            F.col("conv_ts").isNull()
            | (F.col("ts") < F.col("conv_ts"))
            | (
                (F.col("ts") == F.col("conv_ts"))
                & (F.col("event_id") < F.col("conv_eid"))
            )
        )
        .select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            F.col("conv_ts").isNotNull().alias("conv"),
        )
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hops = journey.select(
        "user_id",
        F.col("event_type").alias("src"),
        "conv",
        F.lead("event_type").over(w).alias("nxt"),
        F.row_number().over(w).alias("rn"),
    )
    starts = hops.filter(F.col("rn") == 1).select(
        F.lit("START").alias("src"), F.col("src").alias("dst")
    )
    mids = hops.select(
        "src",
        F.coalesce(
            "nxt",
            F.when(F.col("conv"), F.lit("CONV")).otherwise(F.lit("DROP")),
        ).alias("dst"),
    )
    # converted users with an EMPTY journey (first event was the
    # purchase itself) still contribute a START -> CONV edge
    empty_conv = first_conv.join(
        journey.select("user_id"), "user_id", "left_anti"
    ).select(F.lit("START").alias("src"), F.lit("CONV").alias("dst"))
    trans = (
        starts.unionByName(mids)
        .unionByName(empty_conv)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("c"))
        # r7: the unrolled absorption loop below references this edge
        # aggregate from every iteration (rp -> base each round), so
        # without a checkpoint the final plan re-embeds the two
        # events shuffles per round (~10 s at sf0.1; 6.1 s after).
        # Non-eager: materializes on the first action, keeping
        # registry/plan enumeration job-free (q398/q235 convention).
        .localCheckpoint(eager=False)
    )
    wsrc = Window.partitionBy("src")
    prob = trans.select(
        "src",
        "dst",
        (
            F.col("c").cast("double")
            / F.sum("c").over(wsrc).cast("double")
        ).alias("p"),
    )
    removed = (
        trans.filter(F.col("src") != "START")
        .select(F.col("src").alias("r"))
        .distinct()
        .unionByName(spark.range(1).select(F.lit("(none)").alias("r")))
    )
    # removal grid: channels x edges, both broadcast-sized (<= ~50
    # edges x ~6 removals) — BroadcastNestedLoopJoin, never cartesian
    rp = removed.join(
        F.broadcast(prob),
        (F.col("src") != F.col("r")) & (F.col("dst") != F.col("r")),
    ).select(
        F.col("r").alias("rp_r"),
        F.col("src").alias("rp_src"),
        F.col("dst").alias("rp_dst"),
        F.col("p").alias("rp_p"),
    )
    states = rp.select(
        F.col("rp_r").alias("r"), F.col("rp_src").alias("s")
    ).distinct()
    # unrolled absorption iteration p_k(s) = P(s->CONV) +
    # sum_t P(s->t) p_{k-1}(t), identical to the oracle's p0..pK CTEs
    cur: DataFrame | None = None
    for _ in range(MRE_ITERS + 1):
        base = states.join(
            F.broadcast(rp),
            (F.col("rp_r") == F.col("r")) & (F.col("rp_src") == F.col("s")),
            "left",
        )
        direct = F.coalesce(
            F.sum(F.when(F.col("rp_dst") == "CONV", F.col("rp_p"))),
            F.lit(0.0),
        ).cast("double")
        if cur is None:
            cur = base.groupBy("r", "s").agg(direct.alias("p"))
        else:
            prev = cur.select(
                F.col("r").alias("pr_r"),
                F.col("s").alias("pr_s"),
                F.col("p").alias("pr_p"),
            )
            cur = (
                base.join(
                    F.broadcast(prev),
                    (F.col("pr_r") == F.col("r"))
                    & (F.col("pr_s") == F.col("rp_dst")),
                    "left",
                )
                .groupBy("r", "s")
                .agg(
                    (
                        direct
                        + F.coalesce(
                            F.sum(F.col("rp_p") * F.col("pr_p")), F.lit(0.0)
                        )
                    ).alias("p")
                )
            )
    conv_probs = cur.filter(F.col("s") == "START").select("r", "p")
    base_p = conv_probs.filter(F.col("r") == "(none)").select(
        F.col("p").alias("pb")
    )
    eff = (
        conv_probs.filter(F.col("r") != "(none)")
        .crossJoin(F.broadcast(base_p))
        .select(
            "r",
            "p",
            "pb",
            (
                (F.col("pb") - F.col("p"))
                / F.nullif(F.col("pb"), F.lit(0.0))
            ).alias("re"),
        )
    )
    tot = eff.agg(F.sum("re").alias("te"))
    return eff.crossJoin(F.broadcast(tot)).select(
        F.col("r").alias("channel"),
        dround("pb", 6).alias("p_conv_base"),
        dround("p", 6).alias("p_conv_removed"),
        dround("re", 6).alias("removal_effect"),
        dround(F.col("re") / F.nullif(F.col("te"), F.lit(0.0)), 6).alias(
            "attribution_share"
        ),
    )


# ------- q380 isotonic calibration (PAVA via minimax characterization)

ISO_B = 50  # score buckets (bounded calibration grain)


def _iso_hash(col: str, salt: str) -> str:
    return (
        f"CAST('0x' || substr(md5(CAST({col} AS VARCHAR) || '_{salt}'), 1, 7)"
        " AS BIGINT)"
    )


@register(
    "q380_isotonic_calibration",
    oracle=f"""
    WITH scored AS (
      SELECT ({_iso_hash('o_orderkey', 'score')}) % 1000 AS ms,
             CASE WHEN ({_iso_hash('o_orderkey', 'label')}) % 1000
                  < 200 + (({_iso_hash('o_orderkey', 'score')}) % 1000)
                        * 600 // 1000
                  THEN 1 ELSE 0 END AS y
      FROM orders
    ),
    buckets AS (
      SELECT ms * {ISO_B} // 1000 AS b,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(ms) AS BIGINT) AS sms
      FROM scored GROUP BY 1
    ),
    cum AS (
      SELECT b, n, sy, sms,
             SUM(n) OVER (ORDER BY b) AS cn,
             SUM(sy) OVER (ORDER BY b) AS cy,
             ROW_NUMBER() OVER (ORDER BY b) AS pos
      FROM buckets
    ),
    pairs AS (
      -- weighted mean of the bucket interval [i..j] (present buckets)
      SELECT i.pos AS ip, j.pos AS jp,
             CAST(j.cy - (i.cy - i.sy) AS DOUBLE)
             / CAST(j.cn - (i.cn - i.n) AS DOUBLE) AS a
      FROM cum i JOIN cum j ON j.pos >= i.pos
    ),
    suffmin AS (
      -- m(i,k) = min over j>=k of A(i,j): suffix-min within i
      SELECT ip, jp,
             MIN(a) OVER (PARTITION BY ip ORDER BY jp
                          ROWS BETWEEN CURRENT ROW
                          AND UNBOUNDED FOLLOWING) AS m
      FROM pairs
    ),
    fit AS (
      -- fit(k) = max over i<=k of m(i,k); rows with jp=k exist
      -- exactly for ip<=k
      SELECT jp AS pos, MAX(m) AS iso FROM suffmin GROUP BY jp
    )
    SELECT CAST(c.b AS BIGINT) AS bucket,
           c.n,
           CAST(c.sms AS DOUBLE) / (1000.0 * c.n) AS pred_rate,
           CAST(c.sy AS DOUBLE) / c.n AS emp_rate,
           (FLOOR(CAST(f.iso AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS iso_rate
    FROM cum c JOIN fit f ON f.pos = c.pos
    """,
)
def q380_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic-regression probability calibration (the PAV fit every
    production classifier ships behind) computed WITHOUT the
    sequential pool-adjacent-violators loop: the weighted isotonic
    fit at bucket k equals max_{{i<=k}} min_{{j>=k}} wmean(y, i..j)
    (the classic minimax characterization), which at the bounded
    calibration grain (<= ISO_B present buckets) is one pairs
    self-join + a suffix-min window + a grouped max — fully
    declarative, no iteration, identical on both engines. Completes
    the model-eval shelf beside q307 (Brier reliability bins), q275
    (exact AUC) and q266 (Wilson intervals): q307 MEASURES
    miscalibration, q380 produces the monotone correction map.

    Scores/labels are hash-derived with a planted monotone lift (the
    label threshold rises with the score), so the fit has real shape;
    interval means are exact integer ratios (BIGINT cumulative sums),
    and min/max over identical doubles cannot diverge cross-engine.

    Scale: one corpus shuffle (bucket groupBy with partial
    aggregation); the minimax stage touches only the B^2/2 interval
    frame (~1.3k rows at B=50) regardless of input size.
    """
    o = t(spark, sf_dir, "orders")

    def h(salt: str):
        return F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("o_orderkey").cast("string"),
                        F.lit("_" + salt),
                    ).cast("binary")
                ),
                1,
                7,
            ),
            16,
            10,
        ).cast("long")

    ms = h("score") % 1000
    scored = o.select(
        ms.alias("ms"),
        F.when(
            (h("label") % 1000)
            < 200 + F.floor((ms * 600) / F.lit(1000.0)).cast("long"),
            1,
        )
        .otherwise(0)
        .alias("y"),
    )
    buckets = (
        scored.groupBy(
            F.floor((F.col("ms") * ISO_B) / F.lit(1000.0))
            .cast("long")
            .alias("b")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum("ms").cast("bigint").alias("sms"),
        )
    )
    wcum = Window.orderBy("b")
    cum = buckets.select(
        "b",
        "n",
        "sy",
        "sms",
        F.sum("n").over(wcum).alias("cn"),
        F.sum("sy").over(wcum).alias("cy"),
        F.row_number().over(wcum).alias("pos"),
    )
    ci = cum.select(
        F.col("pos").alias("ip"),
        (F.col("cy") - F.col("sy")).alias("cy0"),
        (F.col("cn") - F.col("n")).alias("cn0"),
    )
    cj = cum.select(
        F.col("pos").alias("jp"), F.col("cy").alias("cyj"),
        F.col("cn").alias("cnj"),
    )
    pairs = ci.join(
        F.broadcast(cj), F.col("jp") >= F.col("ip")
    ).select(
        "ip",
        "jp",
        (
            (F.col("cyj") - F.col("cy0")).cast("double")
            / (F.col("cnj") - F.col("cn0")).cast("double")
        ).alias("a"),
    )
    wsuff = (
        Window.partitionBy("ip")
        .orderBy("jp")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    suffmin = pairs.select(
        "ip", "jp", F.min("a").over(wsuff).alias("m")
    )
    fit = suffmin.groupBy(F.col("jp").alias("pos")).agg(
        F.max("m").alias("iso")
    )
    return cum.join(F.broadcast(fit), "pos").select(
        F.col("b").cast("bigint").alias("bucket"),
        "n",
        (F.col("sms").cast("double") / (1000.0 * F.col("n"))).alias(
            "pred_rate"
        ),
        (F.col("sy").cast("double") / F.col("n")).alias("emp_rate"),
        dround("iso", 6).alias("iso_rate"),
    )


# ------- q390 exact Shapley-value channel attribution

SHAP_CONV = "purchase"


@register(
    "q390_shapley_attribution",
    oracle=f"""
    WITH exposure AS (
      SELECT user_id,
             COALESCE(string_agg(DISTINCT event_type, ','
                                 ORDER BY event_type)
                      FILTER (WHERE event_type <> '{SHAP_CONV}'),
                      '') AS s,
             MAX(CASE WHEN event_type = '{SHAP_CONV}' THEN 1 ELSE 0 END)
               AS conv
      FROM events GROUP BY user_id
    ),
    v AS (
      SELECT s, CAST(SUM(conv) AS DOUBLE) / COUNT(*) AS rate
      FROM exposure GROUP BY s
    ),
    chans AS (
      SELECT event_type AS ch,
             ROW_NUMBER() OVER (ORDER BY event_type) AS r
      FROM (SELECT DISTINCT event_type FROM events
            WHERE event_type <> '{SHAP_CONV}')
    ),
    k AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM chans),
    masks AS (
      SELECT m.m,
             COALESCE(string_agg(c.ch, ',' ORDER BY c.ch), '') AS s,
             CAST(COUNT(c.ch) AS BIGINT) AS sz
      FROM (SELECT UNNEST(range(CAST(2 ** (SELECT k FROM k) AS BIGINT)))
              AS m) m
      LEFT JOIN chans c
        ON (m.m // CAST(2 ** (c.r - 1) AS BIGINT)) % 2 = 1
      GROUP BY m.m
    ),
    mv AS (
      SELECT ms.m, ms.sz, COALESCE(v.rate, 0.0) AS rate
      FROM masks ms LEFT JOIN v ON v.s = ms.s
    ),
    fact AS (  -- factorials 0..6 as a closed form over sz
      SELECT m, sz, rate FROM mv
    ),
    contrib AS (
      -- for each channel i and each coalition S without i:
      -- w(|S|) * (v(S u i) - v(S)),
      -- w(s) = s! * (k - s - 1)! / k!
      SELECT c.ch,
             (CASE s.sz WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 2 THEN 2
                        WHEN 3 THEN 6 WHEN 4 THEN 24 ELSE 120 END)
             * (CASE (SELECT k FROM k) - s.sz - 1
                  WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 2 THEN 2
                  WHEN 3 THEN 6 WHEN 4 THEN 24 ELSE 120 END)
             / CAST((CASE (SELECT k FROM k)
                       WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 2 THEN 2
                       WHEN 3 THEN 6 WHEN 4 THEN 24 WHEN 5 THEN 120
                       ELSE 720 END) AS DOUBLE)
             * (su.rate - s.rate) AS w_delta
      FROM chans c
      JOIN fact s
        ON (s.m // CAST(2 ** (c.r - 1) AS BIGINT)) % 2 = 0
      JOIN fact su
        ON su.m = s.m + CAST(2 ** (c.r - 1) AS BIGINT)
    )
    SELECT ch AS channel,
           (FLOOR(CAST(SUM(w_delta) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS shapley_value
    FROM contrib GROUP BY ch
    """,
)
def q390_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Shapley-value channel attribution (Zhao et al. 2018's
    data-driven formulation) — the game-theoretic capstone of the
    attribution trio: q171 last-touch (heuristic), q284 time-decay
    (positional), q378 Markov removal-effect (path model), and now
    the axiomatic one. Coalition value v(S) = conversion rate of
    users exposed to EXACTLY channel set S; each channel's Shapley
    value sums w(|S|)·(v(S∪i)−v(S)) over all coalitions without it,
    with the exact factorial weights — tractable because the channel
    universe is small (2^k coalitions, k = distinct non-conversion
    event types), which is the realistic marketing shape.

    Determinism: v rates are exact integer ratios; factorial weights
    are integer CASE ladders divided once; the per-channel sum spans
    at most 2^(k-1) identical doubles rounded at 1e-6.

    Scale: ONE user-grain reduce builds exposure sets (shuffle on
    user_id), one tiny group builds v; the coalition lattice and the
    Shapley sum live on 2^k <= 32 broadcast rows regardless of
    corpus size.
    """
    ev = t(spark, sf_dir, "events")
    exposure = ev.groupBy("user_id").agg(
        F.concat_ws(
            ",",
            F.array_sort(
                F.collect_set(
                    F.when(
                        F.col("event_type") != SHAP_CONV,
                        F.col("event_type"),
                    )
                )
            ),
        ).alias("s"),
        F.max(
            F.when(F.col("event_type") == SHAP_CONV, 1).otherwise(0)
        ).alias("conv"),
    )
    v = exposure.groupBy("s").agg(
        (F.sum("conv").cast("double") / F.count(F.lit(1))).alias("rate")
    )
    chans = (
        ev.filter(F.col("event_type") != SHAP_CONV)
        .select(F.col("event_type").alias("ch"))
        .distinct()
        .select(
            "ch", F.row_number().over(Window.orderBy("ch")).alias("r")
        )
    )
    k = chans.agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    masks = (
        spark.range(0, 1 << 6)
        .select(F.col("id").alias("m"))
        .crossJoin(F.broadcast(k))
        .filter(F.col("m") < F.pow(F.lit(2.0), F.col("k")).cast("bigint"))
        .join(
            F.broadcast(chans),
            (F.col("m") / F.pow(F.lit(2.0), F.col("r") - 1))
            .cast("bigint")
            % 2
            == 1,
            "left",
        )
        .groupBy("m")
        .agg(
            F.concat_ws(
                ",", F.array_sort(F.collect_list("ch"))
            ).alias("s"),
            F.count("ch").cast("bigint").alias("sz"),
        )
    )
    mv = masks.join(F.broadcast(v), "s", "left").select(
        "m", "sz", F.coalesce("rate", F.lit(0.0)).alias("rate")
    )

    def factorial(col):
        return (
            F.when(col <= 1, 1)
            .when(col == 2, 2)
            .when(col == 3, 6)
            .when(col == 4, 24)
            .when(col == 5, 120)
            .otherwise(720)
        )

    s_side = mv.select(
        F.col("m").alias("sm"),
        F.col("sz").alias("ssz"),
        F.col("rate").alias("srate"),
    )
    su_side = mv.select(
        F.col("m").alias("sum_m"), F.col("rate").alias("surate")
    )
    bit = (
        (F.col("sm") / F.pow(F.lit(2.0), F.col("r") - 1)).cast("bigint") % 2
    )
    contrib = (
        chans.crossJoin(F.broadcast(k))
        .join(F.broadcast(s_side), bit == 0)
        .join(
            F.broadcast(su_side),
            F.col("sum_m")
            == F.col("sm")
            + F.pow(F.lit(2.0), F.col("r") - 1).cast("bigint"),
        )
        .select(
            "ch",
            (
                factorial(F.col("ssz"))
                * factorial(F.col("k") - F.col("ssz") - 1)
                / factorial(F.col("k")).cast("double")
                * (F.col("surate") - F.col("srate"))
            ).alias("w_delta"),
        )
    )
    return contrib.groupBy(F.col("ch").alias("channel")).agg(
        dround(F.sum("w_delta"), 6).alias("shapley_value")
    )
