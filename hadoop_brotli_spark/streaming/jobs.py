"""Structured Streaming jobs over the ``events`` table.

Batch twins with identical semantics live in
``hadoop_brotli_spark.queries.events`` (q54/q55/q56) — the driver's
DuckDB oracle checks those; these streaming forms are validated by
``tests/test_streaming.py`` against the batch results.

Scale notes (100 TB/day): watermarks bound state (late data beyond
the delay is dropped); window aggregations keep one state row per
(window, key); ``session_window`` merges gap-joined state per key;
the custom stateful operator uses per-group pandas state via
``applyInPandasWithState`` with a GroupStateTimeout so abandoned
keys expire instead of leaking state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # TIMESTAMP(NANOS) read as long
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession,
    events_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """readStream over the events parquet, normalizing ``ts`` to
    TIMESTAMP the same way the batch catalog does.

    The driver has generated ``events.ts`` as TIMESTAMP(NANOS),
    TIMESTAMP_NTZ, and TIMESTAMP across rounds; a stream source needs
    an explicit schema, so we probe the parquet footer with a batch
    read (metadata-only, no data scan) and adapt. With the session
    timezone pinned UTC every variant yields identical instants.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    footer = (
        spark.read.option("pathGlobFilter", "events*.parquet")
        .parquet(events_dir)
        .schema
    )
    reader = (
        spark.readStream.schema(footer)
        .format("parquet")
        .option("pathGlobFilter", "events*.parquet")
    )
    if max_files_per_trigger is not None:
        # bound each micro-batch so multi-file fixtures advance the
        # watermark BETWEEN batches (outer joins emit their
        # null-padded rows only on watermark advance)
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    raw = reader.load(events_dir)
    ts_type = {f.name: f.dataType.typeName() for f in footer.fields}["ts"]
    if ts_type == "long":  # TIMESTAMP(NANOS) read as raw nanos
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if ts_type == "timestamp_ntz":
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of q54: 1-hour tumbling window counts/sums."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def sliding_counts(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of q55: 10-minute windows sliding every 5."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def session_aggregate(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Streaming sessionization via the native ``session_window``
    (gap-merged state), twin of batch q56."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def stateful_user_counts(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user cumulative event count and
    value total, maintained in explicit group state
    (applyInPandasWithState) — the escape hatch for operators the
    built-in windowed aggs can't express."""
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    output_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType()),
            StructField("total_cents", LongType()),  # integer cents: exact
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int(round(float(pdf["value"].sum()) * 100))
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [cents / 100.0]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def dedup_events(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming exactly-once deduplication by ``event_id``.

    ``dropDuplicates`` keyed on the id with a watermark bounds the
    dedup state: an id is remembered only until its event time falls
    behind the watermark, so at 100 TB/day the state store holds one
    compact key per id per delay window instead of growing forever.
    This is the streaming twin of batch exact dedup (q60 family).
    """
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def click_purchase_join(
    clicks: DataFrame, purchases: DataFrame, max_gap: str = "1 hour"
) -> DataFrame:
    """Stream-stream inner join: attribute each purchase to the same
    user's clicks in the preceding ``max_gap``.

    Both sides carry watermarks and the join predicate carries the
    time bound — that pair is what lets Spark expire buffered rows
    (otherwise a stream-stream join would hold both streams in state
    forever). Equi-key: user_id; state is per-user rows within the
    gap window.
    """
    c = clicks.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = purchases.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    return (
        c.withWatermark("click_ts", max_gap)
        .join(
            p.withWatermark("purchase_ts", max_gap),
            F.expr(
                "c_user = p_user AND "
                f"click_ts BETWEEN purchase_ts - INTERVAL {max_gap} AND purchase_ts"
            ),
        )
        .select(
            F.col("c_user").alias("user_id"),
            "click_id",
            "purchase_id",
            "click_ts",
            "purchase_ts",
            "purchase_value",
        )
    )


def purchase_click_left_join(
    purchases: DataFrame, clicks: DataFrame, max_gap: str = "1 hour"
) -> DataFrame:
    """Stream-stream LEFT OUTER join: every purchase emits exactly
    once — joined to each same-user click in the preceding
    ``max_gap``, or with NULL click columns once the click-side
    watermark proves no matching click can still arrive.

    The outer side is the semantic difference from
    ``click_purchase_join``: an unmatched purchase row is NOT
    droppable state — it must be HELD until the watermark passes
    ``purchase_ts`` (only then is "no click existed" a fact, not an
    absence-so-far), at which point Spark emits the null-padded row
    and frees the state. That watermark-gated null emission is why
    both sides need watermarks AND the join predicate needs the time
    bound; without them the engine cannot ever conclude a match is
    impossible. State per key stays bounded by the gap window, same
    as the inner form.
    """
    p = purchases.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
        F.col("value").alias("purchase_value"),
    )
    c = clicks.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    return (
        p.withWatermark("purchase_ts", max_gap)
        .join(
            c.withWatermark("click_ts", max_gap),
            F.expr(
                "p_user = c_user AND "
                f"click_ts BETWEEN purchase_ts - INTERVAL {max_gap}"
                " AND purchase_ts"
            ),
            "leftOuter",
        )
        .select(
            F.col("p_user").alias("user_id"),
            "purchase_id",
            "purchase_ts",
            "purchase_value",
            "click_id",
            "click_ts",
        )
    )


def stateful_user_counts_tws(events: DataFrame) -> DataFrame:
    """Per-user running (count, total) on the Spark 4
    ``transformWithStateInPandas`` API — the arbitrary-state
    successor to ``applyInPandasWithState`` with typed state
    primitives (ValueState here; List/MapState for bigger shapes)
    and explicit timer support for key expiry.

    Same integer-cents exactness contract as the
    ``applyInPandasWithState`` twin above.

    Requires protobuf at runtime (the TWS state server speaks proto);
    environments without it should use the ``applyInPandasWithState``
    twin — the validation test skips accordingly.
    """
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    output_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("total_cents", LongType())]
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n, cents = self._state.get() if self._state.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                cents += int(round(float(pdf["value"].sum()) * 100))
            self._state.update((n, cents))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [cents / 100.0],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        RunningTotals(),
        outputStructType=output_schema,
        outputMode="Update",
        timeMode="None",
    )


def foreach_batch_upsert(
    aggregated: DataFrame, target_dir: str, checkpoint_dir: str, keys: list[str]
):
    """Streaming UPSERT sink via ``foreachBatch``: each micro-batch
    MERGEs its (update-mode) aggregate rows into a keyed parquet
    target — the production pattern for maintaining a queryable
    materialized aggregate from a stream when the sink has no native
    merge (plain parquet, JDBC, …).

    Exactly-once: foreachBatch can replay a batch after failure, so
    the merge must be idempotent — it is, because each batch REPLACES
    target rows by key (anti-join keep + union new) rather than
    appending; replaying batch N re-derives the same target state.
    The swap is an atomic directory rename (same local/shared-FS
    scope as the `.bro` sink — `bro_datasource.BroStreamWriter`
    docstring); table formats with native MERGE (Delta/Iceberg) slot
    into the same hook.

    Scale: per batch, work is |batch keys| vs the keyed target —
    a broadcast anti-join when the batch is small (the common case:
    only hot keys update per micro-batch).
    """
    import os
    import shutil

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        new = batch_df.dropDuplicates(keys)  # update-mode re-emits a key once
        if os.path.isdir(target_dir):
            cur = spark.read.parquet(target_dir)
            kept = cur.join(F.broadcast(new.select(*keys)), keys, "left_anti")
            merged = kept.unionByName(new)
        else:
            merged = new
        tmp = f"{target_dir}.batch-{batch_id}.tmp"
        merged.write.mode("overwrite").parquet(tmp)
        old = f"{target_dir}.old-{batch_id}"
        if os.path.isdir(target_dir):
            os.replace(target_dir, old)
        os.replace(tmp, target_dir)
        shutil.rmtree(old, ignore_errors=True)

    return (
        aggregated.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(upsert)
    )


def streaming_cms_partials(
    events: DataFrame, target_dir: str, checkpoint_dir: str,
    depth: int = 4, width: int = 64,
):
    """Streaming count-min-sketch maintenance via ``foreachBatch``:
    each micro-batch reduces to its own depth×width PARTIAL sketch,
    written to ``{target_dir}/batch=<id>/`` with overwrite — and the
    queryable sketch is the SUM of all partials (``read_cms``).

    This is the point of mergeable sketch state: merge = counter
    addition, so incremental maintenance needs no read-modify-write
    of global state (contrast ``foreach_batch_upsert``, which must
    anti-join the target). Exactly-once falls out of idempotent
    per-batch overwrite: a replayed batch rewrites ITS OWN partial
    directory, never double-counts.

    Scale: each partial is ≤ depth×width rows regardless of batch
    size; merging N partials is a trivial bounded aggregate.
    Compaction (summing partials into one) is an optional
    maintenance job with the same addition semantics.
    """
    from ..functions.columns import cms_bucket

    keyed = events.select(F.col("user_id").cast("string").alias("k"))

    def write_partial(batch_df: DataFrame, batch_id: int) -> None:
        parts = None
        for r in range(depth):
            p = (
                batch_df.groupBy(cms_bucket("k", r, width).alias("bucket"))
                .agg(F.count(F.lit(1)).alias("c"))
                .select(F.lit(r).alias("row"), "bucket", "c")
            )
            parts = p if parts is None else parts.unionAll(p)
        parts.write.mode("overwrite").parquet(f"{target_dir}/batch={batch_id}")

    return (
        keyed.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_partial)
    )


def read_cms(spark: SparkSession, target_dir: str) -> DataFrame:
    """Merge all streaming CMS partials into the queryable sketch:
    (row, bucket) -> total count. Counter addition IS sketch merge."""
    return (
        spark.read.parquet(target_dir)
        .groupBy("row", "bucket")
        .agg(F.sum("c").alias("c"))
    )


def enrich_events(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment join: each micro-batch of the event
    stream broadcast-joins the STATIC dimension (stateless — unlike
    stream-stream joins no watermark/state store is involved, and
    the dimension is re-resolved per micro-batch, so a dim updated
    in place between batches is picked up automatically).

    Left join preserves events with no dimension row (cold-start
    users) with NULL attributes — dropping them in an enrichment
    stage silently shrinks the stream. At scale the dim side is the
    broadcast (or a bucketed static table for huge dims); the stream
    side never shuffles.
    """
    return events.join(F.broadcast(dim), "user_id", "left")


def streaming_kmv_partials(
    events: DataFrame, target_dir: str, checkpoint_dir: str, k: int = 64
):
    """Streaming bottom-k (KMV) distinct sketch maintenance via
    ``foreachBatch`` — the second mergeable-sketch streaming state
    beside ``streaming_cms_partials``: each micro-batch reduces to
    its own k smallest distinct key hashes (≤ k rows regardless of
    batch size), written to ``{target_dir}/batch=<id>/`` with
    overwrite, and the queryable sketch is the k smallest of the
    UNION of partials (``read_kmv``) — k-min union IS KMV merge.

    Idempotent per-batch overwrite gives exactly-once (a replayed
    batch rewrites its own partial); the estimate read off the
    merged sketch matches q271's batch construction, which the
    streaming test asserts. CMS answers 'how often did key x
    appear'; KMV answers 'how many distinct keys' — together they
    are the streaming analytics sketch kit.
    """
    hashed = events.select(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("bk:"), F.col("user_id").cast("string")
                    ).cast("binary")
                ),
                1,
                14,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("v")
    )

    def write_partial(batch_df: DataFrame, batch_id: int) -> None:
        partial = (
            batch_df.select("v")
            .distinct()
            .orderBy("v")
            .limit(k)
        )
        partial.write.mode("overwrite").parquet(f"{target_dir}/batch={batch_id}")

    return (
        hashed.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(write_partial)
    )


def read_kmv(spark: SparkSession, target_dir: str, k: int = 64) -> DataFrame:
    """Merge streaming KMV partials: the k smallest DISTINCT hashes
    of the union (k-min union is the sketch merge), plus the point
    estimate (k−1)·2^56/h_k (q271's estimator)."""
    merged = (
        spark.read.parquet(target_dir)
        .select("v")
        .distinct()
        .orderBy("v")
        .limit(k)
    )
    agg = merged.agg(
        F.count(F.lit(1)).alias("n_mins"), F.max("v").alias("hk")
    )
    return agg.select(
        "n_mins",
        "hk",
        F.when(
            F.col("n_mins") < k, F.col("n_mins").cast("double")
        )
        .otherwise(F.lit(float(k - 1)) * F.lit(float(1 << 56)) / F.col("hk"))
        .alias("estimate"),
    )


def dedup_events_within_watermark(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Streaming dedup via ``dropDuplicatesWithinWatermark`` — the
    Spark 3.5+/4 sibling of :func:`dedup_events` with a materially
    different state contract: instead of "remember every id until
    its OWN event time ages out", a duplicate is dropped only if it
    arrives within the watermark delay of the first-seen row, and the
    state row's timer is set from the FIRST event's time. Two
    consequences at 100 TB: (1) late duplicates beyond the delay are
    admitted (at-least-once across long replays — pair with an
    idempotent sink), and (2) state is evicted on the first-seen
    clock, so a hot id never pins a state row forever the way a
    stream of always-fresh duplicates can with plain
    ``dropDuplicates``. Downstream aggregation still works because
    the watermark column survives.

    Reference parity note: the reference repo (a Hadoop compression
    codec) has no streaming surface; this extends SURVEY.md §2b
    streaming.
    """
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
