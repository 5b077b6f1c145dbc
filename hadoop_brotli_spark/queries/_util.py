"""Shared helpers for oracle-deterministic query authoring.

Float determinism (FIXTURES.md): every double column in the test data
carries exactly 2 decimal digits. Casting values to DECIMAL before
SUM makes aggregation exact integer arithmetic — order-independent
across Spark partitions and bit-identical to DuckDB — and casting the
exact result back to DOUBLE yields the same float64 in both engines.
Products of 2-decimal values are exact 4-/6-decimal values, so wider
scales stay exact too. Plain IEEE double division of identical
operands is bit-identical across engines, so averages derived from
exact sums need no rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def fan_out(df: DataFrame) -> DataFrame:
    """Repartition a small-scan input up to the session's default
    parallelism BEFORE a row-multiplying transform (explode /
    shingle / trigram).

    A few-MB parquet file arrives as one scan task (row groups are
    not splittable below file granularity), which would single-thread
    a 100×-fan-out explode while every other core idles — measured
    ~2.5 s for one task exploding 1.5M trigrams at sf0.1. The
    repartition shuffles only the SMALL pre-explosion rows. No-op
    when the scan already has enough splits (the 100 TB case, where
    inputs arrive in thousands of partitions).
    """
    spark = df.sparkSession
    try:
        # classic (JVM-local) session: exact partition-count probe
        target = spark.sparkContext.defaultParallelism
        current = df.rdd.getNumPartitions()
    except Exception:
        # Spark Connect exposes neither sparkContext nor .rdd; fall
        # back to shuffle-partition target and a file-count heuristic
        # (parquet scan splits ≥ file count, so this under-counts —
        # which only risks one redundant small-row shuffle, never a
        # missed fan-out)
        target = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
        try:
            current = max(1, len(df.inputFiles()))
        except Exception:
            current = 1
    if current < target:
        return df.repartition(target)
    return df


def dsum(col: Column, scale: int = 2) -> Column:
    """Exact sum of fixed-decimal doubles, returned as DOUBLE.

    Mirrors the SQL pattern
    ``CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)``.
    """
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


def davg(col: Column, scale: int = 2) -> Column:
    """Exact-sum-based average as DOUBLE: dsum(x) / count(*)."""
    return dsum(col, scale) / F.count(F.lit(1))


def sql_dsum(expr: str, scale: int = 2) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 2) -> str:
    return f"{sql_dsum(expr, scale)} / COUNT(*)"


def ts(date_str: str) -> Column:
    """UTC-naive timestamp literal matching DuckDB ``TIMESTAMP '...'``."""
    return F.lit(date_str).cast("timestamp")


def grain_rank(
    df: DataFrame,
    score: str,
    ties: list[str],
    *,
    descending: bool = True,
    out: str = "rk",
) -> DataFrame:
    """Exact global ``ROW_NUMBER() OVER (ORDER BY score [DESC],
    *ties ASC)`` WITHOUT a single-partition global window — the q242
    rank-reconstruction pattern, generalized from round5's
    ``_score_desc_rank`` (r6: six more sites measured unbounded by
    the window audit).

    The integer-valued ``score`` column is treated as an
    order-contiguous bucket: rank = (count of rows in strictly
    better score buckets) + (row_number within the bucket by the tie
    keys). The in-bucket window partitions by score (parallel across
    buckets); the offset cumsum runs over the SCORE-GRAIN aggregate —
    bounded by the number of distinct scores, never the row count.
    Requirement for scale: distinct scores ≪ rows (counts, grades,
    integer bins). For near-unique scores use a coarsened bucket
    column instead (q444/q484 pattern).

    PRECONDITION (r6 advice): ``score`` must be NON-NULL on every
    row. The offset table joins back on the score column with a
    plain (null-rejecting) equi-join, so a NULL score silently DROPS
    the row — unlike the global window this replaces, which ranked
    NULLs FIRST/LAST. Callers with a nullable score must
    ``F.coalesce`` it to a sentinel bucket (and decide the NULL
    ordering explicitly) before calling; all current call sites pass
    non-null aggregates.
    """
    from pyspark.sql import Window as W

    sc = F.col(score)
    wloc = W.partitionBy(score).orderBy(*[F.col(c).asc() for c in ties])
    local = df.withColumn("__r_in", F.row_number().over(wloc))
    worder = sc.desc() if descending else sc.asc()
    woff = W.orderBy(worder).rowsBetween(W.unboundedPreceding, -1)
    offs = (
        df.groupBy(score)
        .agg(F.count(F.lit(1)).alias("__sz"))
        .select(
            score,
            F.coalesce(F.sum("__sz").over(woff), F.lit(0)).alias("__off"),
        )
    )
    return (
        local.join(F.broadcast(offs), score)
        .withColumn(out, F.col("__off") + F.col("__r_in"))
        .drop("__r_in", "__off")
    )
