"""Bucketed tables: pre-shuffled, co-located storage for repeated
large-large joins and aggregations.

Writing a table bucketed by its join key materializes the shuffle
once; every later equi-join or groupBy on that key runs with NO
Exchange (Spark trusts the bucket layout via the catalog). This is
the 100 TB answer to "the same fact-fact join runs every hour":
orders ⋈ lineitem bucketed on the orderkey never shuffles again.

Bucket count guidance: buckets × target-file-size ≈ table size;
too few buckets → giant files and low parallelism, too many → small
files. Sorting within buckets (`sort_cols`) additionally removes the
sort from sort-merge joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Save ``df`` as a bucketed (optionally bucket-sorted) parquet
    table registered in the session catalog. ``path`` makes it an
    external table (data outlives the catalog entry)."""
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — bucket metadata attaches to the scan, letting
    the planner elide Exchanges on the bucket key."""
    return spark.table(table)
