"""Scalar-function surface (string / date / math / JSON) and the
batch equivalents of the streaming operators (tumbling window,
sliding window, gap-based sessionization) over the ``events`` table.

The true streaming variants (readStream + watermark) live in
``hadoop_brotli_spark.streaming``; the driver's DuckDB oracle can
only check batch, so these queries define the shared semantics.

Determinism notes:
- Timestamp arithmetic is done in integer microseconds
  (``unix_micros`` ↔ DuckDB ``epoch_us``) — no float time math.
- Math functions restricted to IEEE-correctly-rounded ops (sqrt,
  abs, floor, ceil) plus ln rounded to 6 decimals; ``pow``/``exp``
  are not correctly-rounded by libm and can differ across JVM/C.

Scale notes (100 TB): window aggregation = one shuffle on
(window, keys); sessionization = one shuffle on user_id + sort —
both linear. The sliding window expands each event into
window/slide rows *before* the shuffle (factor 2 here) — the
standard cost of overlapping windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ._util import dround, dsum, sql_dsum, t

# ------------------------------------------------------- scalar funcs


@register(
    "q50_string_funcs",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           LOWER(c_mktsegment) AS seg_lower,
           CAST(LENGTH(c_name) AS BIGINT) AS name_len,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           CONCAT(c_name, ':', c_mktsegment) AS name_seg,
           REPLACE(c_name, 'Customer', 'Cust') AS name_short,
           CONTAINS(c_name, '1') AS has_one
    FROM customer
    """,
)
def q50_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar functions: case, length, substring, concat,
    replace, contains."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("c_name"), F.lit(":"), F.col("c_mktsegment")).alias("name_seg"),
        F.regexp_replace("c_name", "Customer", "Cust").alias("name_short"),
        F.col("c_name").contains("1").alias("has_one"),
    )


@register(
    "q51_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS BIGINT) AS order_year,
           CAST(MONTH(o_orderdate) AS BIGINT) AS order_month,
           CAST(DAY(o_orderdate) AS BIGINT) AS order_day,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month_start,
           CAST(DATE_DIFF('day', o_orderdate, TIMESTAMP '2000-01-01') AS BIGINT)
             AS days_to_y2k
    FROM orders
    """,
)
def q51_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar functions: extract parts, truncate, diff."""
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("order_day"),
        F.date_trunc("month", F.col("o_orderdate")).alias("order_month_start"),
        F.datediff(F.lit("2000-01-01").cast("timestamp"), F.col("o_orderdate"))
        .cast("bigint")
        .alias("days_to_y2k"),
    )


@register(
    "q52_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_extendedprice - 50000.0) AS abs_dev,
           FLOOR(l_quantity / 7.0) AS qty_bucket,
           CEIL(l_extendedprice / 1000.0) AS price_k,
           SQRT(l_extendedprice) AS price_sqrt,
           (FLOOR(CAST(LN(l_extendedprice) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS price_ln
    FROM lineitem
    WHERE l_extendedprice > 0
    """,
)
def q52_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar functions (IEEE-stable subset; see module doc)."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_extendedprice") > 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_extendedprice") - 50000.0).alias("abs_dev"),
        F.floor(F.col("l_quantity") / 7.0).cast("double").alias("qty_bucket"),
        F.ceil(F.col("l_extendedprice") / 1000.0).cast("double").alias("price_k"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        dround(F.log("l_extendedprice"), 6).alias("price_ln"),
    )


@register(
    "q53_json_extract",
    oracle="""
    SELECT event_id, event_type,
           CAST(regexp_extract(props, '"k": *([0-9]+)', 1) AS BIGINT) AS k_value
    FROM events
    """,
)
def q53_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the ``events.props`` string column.

    Spark side uses the real JSON path operator (get_json_object);
    the oracle extracts the same scalar with a regex so it does not
    depend on DuckDB's JSON extension.
    """
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_value"),
    )


# ------------------------------------------------- time-window (batch)


@register(
    "q54_tumbling_window",
    oracle=f"""
    SELECT DATE_TRUNC('hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM events
    GROUP BY DATE_TRUNC('hour', ts), event_type
    """,
)
def q54_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation (batch form of the
    streaming groupBy(window(ts, '1 hour')))."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "q55_sliding_window",
    oracle=f"""
    WITH ev AS (
      SELECT event_type, value, (epoch_us(ts) // 300000000) AS slot
      FROM events
    )
    SELECT make_timestamp((slot - off) * 300000000) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM ev CROSS JOIN (SELECT UNNEST([0, 1]) AS off) offs
    GROUP BY 1, 2
    """,
)
def q55_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 10-minute windows every 5 minutes — each event
    lands in exactly 2 windows. Oracle reproduces Spark's window
    assignment with integer-microsecond slot arithmetic."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "q56_sessionization",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ), sessions AS (
      SELECT user_id, ts, value,
             CAST(SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def q56_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-minute inactivity gap), the batch
    twin of streaming ``session_window``: lag → new-session flag →
    running sum as session id → per-session aggregates.

    Scale: one shuffle on user_id; both window passes reuse the same
    partitioning (Catalyst plans a single exchange).
    """
    gap_us = 30 * 60 * 1_000_000
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    wsum = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ev = t(spark, sf_dir, "events")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(
            F.lag("ts").over(w).isNull()
            | ((F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))) > gap_us),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    sessions = flagged.select(
        "user_id",
        "ts",
        "value",
        F.sum("is_new").over(wsum).cast("bigint").alias("session_id"),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        dsum(F.col("value")).alias("sum_value"),
    )


@register(
    "q69_time_rollup",
    oracle=f"""
    SELECT CAST(DATE_TRUNC('month', ts) AS TIMESTAMP) AS month_start,
           CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day_start,
           DATE_TRUNC('hour', ts) AS hour_start,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM events
    GROUP BY ROLLUP (CAST(DATE_TRUNC('month', ts) AS TIMESTAMP),
                     CAST(DATE_TRUNC('day', ts) AS TIMESTAMP),
                     DATE_TRUNC('hour', ts))
    """,
)
def q69_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hierarchical time rollup: one pass produces
    hourly, daily, monthly, and grand-total aggregates via
    ROLLUP over nested date_trunc levels.

    The timeseries-store "continuous aggregate" pattern expressed as
    a single Catalyst plan: Expand + one hash aggregation — coarser
    granularities come from the same shuffle, not separate scans. At
    100 TB the Expand factor (4 rows per input row) is absorbed by
    map-side partial aggregation into at most hours×types groups.
    """
    ev = t(spark, sf_dir, "events")
    return ev.rollup(
        F.date_trunc("month", "ts").alias("month_start"),
        F.date_trunc("day", "ts").alias("day_start"),
        F.date_trunc("hour", "ts").alias("hour_start"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum(F.col("value")).alias("sum_value"),
    )


@register(
    "q78_map_json_funcs",
    oracle="""
    SELECT event_id,
           CAST(len(json_keys(props)) AS BIGINT) AS n_keys,
           array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_value
    FROM events
    """,
)
def q78_map_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: parse the JSON ``props`` into
    ``map<string,bigint>`` and apply map functions (size, sorted
    keys, value lookup) — all Catalyst expressions.

    ``from_json`` to a typed map is the scalable JSON path: one parse
    per row in codegen, columns pruned at the scan, no Python.
    """
    ev = t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return ev.select(
        "event_id",
        F.size(m).cast("bigint").alias("n_keys"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_csv"),
        m.getItem("k").alias("k_value"),
    )


@register(
    "q127_error_safe_ops",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_rows,
           COUNT(o_totalprice / NULLIF(o_custkey % 10, 0)) AS n_safe_div,
           MIN(o_totalprice / NULLIF(o_custkey % 10, 0)) AS min_div,
           MAX(o_totalprice / NULLIF(o_custkey % 10, 0)) AS max_div,
           COUNT(TRY_CAST(SUBSTRING(o_orderpriority, 1, 1) AS INTEGER))
             AS n_prio_numeric,
           COUNT(TRY_CAST(o_orderstatus AS INTEGER)) AS n_status_numeric
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q127_error_safe_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression family: ``try_divide`` / ``try_cast``
    turn divide-by-zero and bad casts into NULLs instead of failed
    jobs — the semantics a 100 TB pipeline needs, where one poison
    row must not kill a 6-hour job.

    The division aggregates use MIN/MAX (order-free selection), not
    SUM, because summing float quotients would be
    accumulation-order-dependent.
    """
    o = t(spark, sf_dir, "orders")
    safe_div = F.try_divide(F.col("o_totalprice"), F.col("o_custkey") % 10)
    return o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(safe_div).alias("n_safe_div"),
        F.min(safe_div).alias("min_div"),
        F.max(safe_div).alias("max_div"),
        F.count(
            F.try_to_number(F.substring("o_orderpriority", 1, 1), F.lit("9")).cast(
                "int"
            )
        ).alias("n_prio_numeric"),
        F.count(F.expr("TRY_CAST(o_orderstatus AS INT)")).alias("n_status_numeric"),
    )


@register(
    "q128_bitwise_agg",
    oracle="""
    SELECT o_orderstatus,
           BIT_AND(o_orderkey) AS and_key,
           BIT_OR(o_orderkey) AS or_key,
           BIT_XOR(o_orderkey) AS xor_key,
           CAST(SUM(o_orderkey & 255) AS BIGINT) AS sum_low_byte,
           MAX(xor(o_orderkey, o_custkey)) AS max_xor,
           MIN(o_orderkey >> 3) AS min_shifted
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q128_bitwise_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar + aggregate family: AND/OR/XOR reductions and
    shift/mask scalars — the toolkit for packed flag columns and
    hash mixing. (DuckDB note: ``^`` is POWER there, so the oracle
    spells XOR as ``xor()``.)

    All-integer arithmetic: order-insensitive and exact under any
    partitioning; one partial+final aggregation pass.
    """
    o = t(spark, sf_dir, "orders")
    key, cust = F.col("o_orderkey"), F.col("o_custkey")
    return o.groupBy("o_orderstatus").agg(
        F.bit_and(key).alias("and_key"),
        F.bit_or(key).alias("or_key"),
        F.bit_xor(key).alias("xor_key"),
        F.sum(key.bitwiseAND(F.lit(255))).alias("sum_low_byte"),
        F.max(key.bitwiseXOR(cust)).alias("max_xor"),
        F.min(F.shiftright(key, 3)).alias("min_shifted"),
    )


@register(
    "q129_mode_per_group",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS n
      FROM events GROUP BY user_id, event_type
    ),
    r AS (
      SELECT user_id, event_type, n,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY n DESC, event_type) AS rk
      FROM c
    )
    SELECT user_id, event_type AS mode_event, n AS n_occurrences
    FROM r WHERE rk = 1
    """,
)
def q129_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode (most frequent value): count,
    then rank with a total-order tie-break (count DESC, value ASC).

    Built-in ``mode()``/``max_by()`` break ties arbitrarily — fine
    interactively, but nondeterministic across partitionings, which
    the oracle hash (and any reproducible pipeline) cannot accept.

    Scale: the count reduces events to (user × event-type) before
    the window, and the rank window partitions by user_id.
    """
    ev = t(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("user_id").orderBy(F.col("n").desc(), F.col("event_type"))
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("mode_event"),
            F.col("n").alias("n_occurrences"),
        )
    )


@register(
    "q130_union_by_name",
    oracle="""
    SELECT o_orderkey AS key, o_totalprice AS amount, 'order' AS src
    FROM orders WHERE o_totalprice > 400000.0
    UNION ALL BY NAME
    SELECT l_orderkey AS key, 'lineitem' AS src,
           CAST(l_quantity AS DOUBLE) AS qty
    FROM lineitem WHERE l_quantity > 49.0
    """,
)
def q130_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two relations with partially
    overlapping columns combined BY NAME, absent columns padded with
    NULL (``unionByName(allowMissingColumns=True)`` /
    ``UNION ALL BY NAME``) — how heterogeneous ingestion batches
    append into one table without positional-union corruption.

    Scale: a union is a zero-shuffle plan concatenation; each side
    keeps its own pushed-down filter.
    """
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 400000.0)
        .select(
            F.col("o_orderkey").alias("key"),
            F.col("o_totalprice").alias("amount"),
            F.lit("order").alias("src"),
        )
    )
    li = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 49.0)
        .select(
            F.col("l_orderkey").alias("key"),
            F.lit("lineitem").alias("src"),
            F.col("l_quantity").cast("double").alias("qty"),
        )
    )
    return o.unionByName(li, allowMissingColumns=True)


@register(
    "q161_debounce",
    oracle="""
    WITH keyed AS (
      SELECT user_id, event_type, ts, event_id, value,
             epoch_us(ts) // 5000000 AS w5s
      FROM events
    ),
    first_in_window AS (
      SELECT user_id, event_type, w5s,
             MIN(ROW(epoch_us(ts), event_id)) AS sel,
             COUNT(*) AS n_raw
      FROM keyed
      GROUP BY user_id, event_type, w5s
    )
    SELECT k.user_id, k.event_type, k.event_id, k.ts, k.value, f.n_raw
    FROM first_in_window f
    JOIN keyed k
      ON k.user_id = f.user_id AND k.event_type = f.event_type
     AND k.w5s = f.w5s
     AND ROW(epoch_us(k.ts), k.event_id) = f.sel
    """,
)
def q161_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry debouncing: within each (user, event type, 5-second
    window), keep only the FIRST event and record how many raw
    events it absorbed — the duplicate-click / retry-storm filter
    ingest pipelines apply before counting anything.

    Spark side selects the survivor with a single-aggregation struct
    argmin (MIN over struct(epoch, event_id) — total order, q155's
    technique), then re-joins the surviving key to recover the full
    row; the oracle mirrors with MIN(ROW(...)).

    Scale: the groupBy key is (user, type, window) — high
    cardinality, uniform; no window function needed at all.
    """
    ev = t(spark, sf_dir, "events")
    keyed = ev.select(
        "user_id",
        "event_type",
        "event_id",
        "ts",
        "value",
        (F.unix_micros(F.col("ts")) / F.lit(5_000_000))
        .cast("bigint")
        .alias("w5s"),
        F.unix_micros(F.col("ts")).alias("e_us"),
    )
    first = keyed.groupBy("user_id", "event_type", "w5s").agg(
        F.min(F.struct(F.col("e_us"), F.col("event_id"))).alias("sel"),
        F.count(F.lit(1)).alias("n_raw"),
    )
    return (
        keyed.join(first, ["user_id", "event_type", "w5s"])
        .filter(
            (F.col("e_us") == F.col("sel.e_us"))
            & (F.col("event_id") == F.col("sel.event_id"))
        )
        .select("user_id", "event_type", "event_id", "ts", "value", "n_raw")
    )


@register(
    "q162_seasonality",
    oracle="""
    WITH cells AS (
      SELECT CAST(EXTRACT(dow FROM ts) AS BIGINT) AS dow,
             CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hod,
             COUNT(*) AS n_events,
             COUNT(DISTINCT CAST(ts AS DATE)) AS n_days
      FROM events
      GROUP BY CAST(EXTRACT(dow FROM ts) AS BIGINT),
               CAST(EXTRACT(hour FROM ts) AS BIGINT)
    )
    SELECT dow, hod, n_events, n_days,
           CAST(n_events AS DOUBLE) / n_days AS events_per_active_day
    FROM cells
    """,
)
def q162_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic seasonality profile: the day-of-week × hour-of-day
    event matrix, normalized by how many distinct calendar days fed
    each cell — the heatmap behind capacity planning and anomaly
    baselines (q147's trailing window catches deviations FROM this
    shape).

    DOW convention: Sunday=0 (DuckDB ``EXTRACT(dow)``); Spark's
    ``dayofweek`` is 1-based Sunday=1, so it maps via −1. One
    aggregation pass; 7×24 output regardless of volume.
    """
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            (F.dayofweek("ts") - 1).cast("bigint").alias("dow"),
            F.hour("ts").cast("bigint").alias("hod"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct(F.col("ts").cast("date")).alias("n_days"),
        )
        .select(
            "dow",
            "hod",
            "n_events",
            "n_days",
            (F.col("n_events").cast("double") / F.col("n_days")).alias(
                "events_per_active_day"
            ),
        )
    )


@register(
    "q178_out_of_order_audit",
    oracle="""
    WITH seq AS (
      SELECT event_type, ts,
             MAX(ts) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS hwm
      FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(*) FILTER (WHERE ts < hwm) AS out_of_order,
           COUNT(*) FILTER (WHERE ts < hwm - INTERVAL 10 MINUTE)
             AS late_10m,
           COUNT(*) FILTER (WHERE ts < hwm - INTERVAL 1 HOUR) AS late_1h
    FROM seq GROUP BY event_type
    """,
)
def q178_out_of_order_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-data audit: how out-of-order is the stream? Per event
    type, count events whose timestamp is behind the per-user
    high-water mark at arrival (arrival order = event_id, the
    generation sequence), at three lateness thresholds.

    This is the batch probe that sizes a streaming watermark
    (streaming/jobs.py): `late_1h` is exactly the data a 1-hour
    watermark would drop. The high-water mark is a running MAX over
    the preceding frame — O(1) state per row, one shuffle on
    user_id, no self-join against earlier events.
    """
    ev = t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    seq = ev.select("event_type", "ts", F.max("ts").over(w).alias("hwm"))
    return seq.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_if(F.col("ts") < F.col("hwm")).alias("out_of_order"),
        F.count_if(
            F.col("ts") < F.col("hwm") - F.expr("INTERVAL 10 MINUTES")
        ).alias("late_10m"),
        F.count_if(F.col("ts") < F.col("hwm") - F.expr("INTERVAL 1 HOUR")).alias(
            "late_1h"
        ),
    )


@register(
    "q187_forward_asof_followup",
    oracle="""
    WITH seq AS (
      SELECT event_type, ts,
             MIN(CASE WHEN event_type = 'error' THEN sec END) OVER (
               PARTITION BY user_id ORDER BY sec
               RANGE BETWEEN 1 FOLLOWING AND 3600 FOLLOWING
             ) AS next_err_sec
      FROM (SELECT user_id, event_type, ts,
                   CAST(FLOOR(epoch(ts)) AS BIGINT) AS sec
            FROM events)
    )
    SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
           COUNT(*) AS n_purchases,
           COUNT(next_err_sec) AS with_error_1h,
           CAST(COUNT(next_err_sec) AS DOUBLE) / COUNT(*)
             AS error_followup_rate
    FROM seq
    WHERE event_type = 'purchase'
    GROUP BY DATE_TRUNC('day', ts)
    """,
)
def q187_forward_asof_followup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of with tolerance: for each purchase, is there an
    error event by the same user within the NEXT hour? (The mirror of
    the q16 backward as-of — incident attribution, cancellation
    follow-up, next-touch joins.)

    One conditional MIN over a FORWARD-bounded RANGE frame
    (1..3600 s following on the per-user second-ordered window) — no
    self-join of events to events, no per-purchase scan-ahead. The
    frame orders by truncated epoch seconds so peer sets are
    identical across engines (q47's rule). Counting happens after
    the window, at the day grain.

    100 TB: one shuffle on user_id; the window state is a bounded
    time range, the same bound a stream-stream interval join
    (streaming/jobs.py click_purchase_join) would keep.
    """
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", F.unix_timestamp("ts").alias("sec")
    )
    w = W.partitionBy("user_id").orderBy("sec").rangeBetween(1, 3600)
    seq = ev.select(
        "event_type",
        "ts",
        F.min(F.when(F.col("event_type") == "error", F.col("sec")))
        .over(w)
        .alias("next_err_sec"),
    )
    return (
        seq.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.count("next_err_sec").alias("with_error_1h"),
            (F.count("next_err_sec").cast("double") / F.count(F.lit(1))).alias(
                "error_followup_rate"
            ),
        )
    )


@register(
    "q194_daily_percentile_bands",
    oracle="""
    SELECT CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
           COUNT(*) AS n_events,
           quantile_cont(value, 0.5) AS p50_value,
           quantile_cont(value, 0.9) AS p90_value,
           quantile_cont(value, 0.99) AS p99_value
    FROM events
    GROUP BY DATE_TRUNC('day', ts)
    """,
)
def q194_daily_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily latency/value percentile bands: the monitoring time
    series (p50/p90/p99 per day) every operations dashboard draws.

    One grouped aggregate at the day grain; exact interpolated
    percentiles within each group (both engines share the
    linear-interpolation definition — q28 precedent). At scale the
    exact percentile per bounded group is fine because groups are
    calendar-sized; over data-sized groups the mergeable switch is
    approx_percentile (q38).
    """
    ev = t(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.percentile("value", 0.5).alias("p50_value"),
        F.percentile("value", 0.9).alias("p90_value"),
        F.percentile("value", 0.99).alias("p99_value"),
    )


@register(
    "q195_resettable_running_sum",
    oracle="""
    WITH seq AS (
      SELECT user_id, value,
             COALESCE(SUM(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS seg
      FROM events
    ),
    run AS (
      SELECT user_id, seg,
             SUM(CAST(value AS DECIMAL(18,2))) AS seg_value,
             COUNT(*) AS n_events
      FROM seq GROUP BY user_id, seg
    )
    SELECT user_id,
           COUNT(*) AS n_segments,
           CAST(MAX(seg_value) AS DOUBLE) AS max_basket_value,
           CAST(SUM(n_events) AS DOUBLE) / COUNT(*)
             AS avg_events_per_segment
    FROM run GROUP BY user_id
    """,
)
def q195_resettable_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate that RESETS on a condition: per user,
    accumulate event value until each purchase closes the "basket",
    then summarize baskets — the conditional-reset cumulative shape
    (session spend, counters between failures, burn since refill).

    The reset is not a join or an iterative loop: a cumulative
    conditional count over the preceding frame assigns each row its
    segment number (the purchase row closes its own segment), and
    the basket totals are then an ordinary exact-decimal aggregate on
    (user, segment). One window + two hash aggregates, one shuffle
    on user_id. Ties break on (ts, event_id) for determinism.
    """
    ev = t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    seg = F.coalesce(
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).over(w),
        F.lit(0),
    )
    seq = ev.select("user_id", "value", seg.alias("seg"))
    run = seq.groupBy("user_id", "seg").agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("seg_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    return run.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.max("seg_value").cast("double").alias("max_basket_value"),
        (F.sum("n_events").cast("double") / F.count(F.lit(1))).alias(
            "avg_events_per_segment"
        ),
    )


# --------------------------------------- q351 VARIANT JSON surface


@register(
    "q351_variant_json_ops",
    oracle="""
    WITH parsed AS (
      SELECT event_type,
             CAST(json_extract(props, '$.k') AS BIGINT) AS k,
             CASE WHEN json_extract(props, '$.k') IS NOT NULL
                  THEN 1 ELSE 0 END AS has_k,
             CASE WHEN json_extract(props, '$.missing') IS NULL
                  THEN 1 ELSE 0 END AS missing_is_null
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(MIN(k) AS BIGINT) AS min_k,
           CAST(MAX(k) AS BIGINT) AS max_k,
           CAST(SUM(has_k) AS BIGINT) AS n_with_k,
           CAST(SUM(missing_is_null) AS BIGINT) AS n_missing_null
    FROM parsed GROUP BY event_type
    """,
)
def q351_variant_json_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT surface: semi-structured ``props`` parsed ONCE
    into the binary VARIANT encoding (``parse_json``) and then read
    with typed ``variant_get`` paths — the shredded-JSON access
    pattern that replaces per-access string re-parsing (every
    ``get_json_object`` call re-tokenizes the string; variant_get
    reads the pre-parsed tree). Missing paths are NULL, not errors —
    asserted via the `n_missing_null` probe.

    The oracle reads the SAME fields with DuckDB's JSON extraction,
    proving the VARIANT path is a representation change, not a
    semantics change. Scale: parse cost is paid once per row
    map-side; aggregate state is |event_type| rows. At 100 TB the
    production upgrade is VARIANT-typed parquet columns with
    shredding — the query shape is already this one.
    """
    ev = t(spark, sf_dir, "events").select("event_type", "props")
    parsed = ev.select(
        "event_type",
        F.parse_json(F.col("props")).alias("v"),
    ).select(
        "event_type",
        F.expr("variant_get(v, '$.k', 'bigint')").alias("k"),
        F.expr("variant_get(v, '$.missing', 'bigint')").alias("missing"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.min("k").cast("bigint").alias("min_k"),
        F.max("k").cast("bigint").alias("max_k"),
        F.sum(F.when(F.col("k").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_with_k"),
        F.sum(F.when(F.col("missing").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_missing_null"),
    )


# ---------------- q395 discounted episode returns (offline RL prep)

RET_HORIZON = 20  # discount horizon: steps beyond this contribute 0
RET_DENOM = 100 * (1 << RET_HORIZON)  # cents grid * 2^horizon


@register(
    "q395_discounted_returns",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ), sessions AS (
      SELECT user_id, ts, event_id, value,
             SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS sid
      FROM flagged
    ), steps AS (
      SELECT user_id, sid, value,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, sid ORDER BY ts ASC, event_id ASC
             ) - 1 AS t
      FROM sessions
    ), episodes AS (
      SELECT user_id, sid,
             SUM(CASE WHEN t < {RET_HORIZON}
                      THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                           * CAST(POW(2, {RET_HORIZON} - t) AS BIGINT)
                      ELSE 0 END) AS gg,
             COUNT(*) AS n_steps
      FROM steps GROUP BY user_id, sid
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_episodes,
           CAST(SUM(n_steps) AS BIGINT) AS n_steps,
           (FLOOR(CAST(CAST(SUM(gg) AS DOUBLE)
                 / (COUNT(*) * {RET_DENOM}.0) AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0) AS mean_return,
           (FLOOR(CAST(CAST(MAX(gg) AS DOUBLE) / {RET_DENOM}.0 AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0)
             AS best_return
    FROM episodes GROUP BY user_id
    """,
)
def q395_discounted_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted episode returns over logged interaction sessions —
    the offline-RL / decision-transformer data-prep op: episodes are
    q56's 30-minute-gap sessions, the reward stream is `value` in
    step order, and each episode's return is G = sum_t r_t *
    gamma^t with gamma = 1/2 truncated at t < {RET_HORIZON}. Emits
    the per-user dataset card (episode count, total steps, mean and
    best return) that return-conditioned training filters on.
    Complements q391 (off-policy value of a TARGET policy) with the
    BEHAVIOR policy's realized returns.

    Determinism: gamma = 1/2 is dyadic, so r_t * gamma^t scaled by
    2^{RET_HORIZON} and a 1-cent reward grid is an exact BIGINT per
    step; episode and user sums are integer-exact and order-free,
    then one IEEE division at the end (identical both engines).

    Scale: one shuffle on user_id shared by both window passes
    (q56's plan), then per-(user, session) and per-user reduces —
    no joins at all.
    """
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    wsum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    ev = t(spark, sf_dir, "events")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w)))
                > 1800 * 1_000_000
            ),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    steps = flagged.select(
        "user_id",
        "value",
        F.sum("is_new").over(wsum).alias("sid"),
        "ts",
        "event_id",
    ).select(
        "user_id",
        "sid",
        "value",
        (
            F.row_number().over(
                W.partitionBy("user_id", "sid").orderBy(
                    F.col("ts").asc(), F.col("event_id").asc()
                )
            )
            - 1
        ).alias("t"),
    )
    gg_term = F.when(
        F.col("t") < RET_HORIZON,
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
        * F.pow(F.lit(2.0), F.lit(RET_HORIZON) - F.col("t")).cast("bigint"),
    ).otherwise(F.lit(0))
    episodes = steps.groupBy("user_id", "sid").agg(
        F.sum(gg_term).alias("gg"), F.count(F.lit(1)).alias("n_steps")
    )
    return episodes.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_episodes"),
        F.sum("n_steps").cast("bigint").alias("n_steps"),
        dround(
            F.sum("gg").cast("double")
            / (F.count(F.lit(1)) * F.lit(float(RET_DENOM))),
            6,
        ).alias("mean_return"),
        dround(F.max("gg").cast("double") / F.lit(float(RET_DENOM)), 6).alias(
            "best_return"
        ),
    )
