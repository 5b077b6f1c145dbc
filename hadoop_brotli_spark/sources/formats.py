"""General source/sink surface beyond parquet and ``.bro``: CSV,
JSON-lines, and plain text, plus the partitioned-parquet sink.

The reference inherits all of this from its host framework (a Hadoop
codec participates in any file format via the codec SPI —
SURVEY.md §2b "Scans / sources"); here it is a typed, schema-explicit
API over Spark's native readers.

Scale notes (100 TB):
- Schemas are always explicit — schema inference reads the data
  twice and is banned here.
- CSV/JSON scans are splittable (uncompressed or with a splittable
  codec); Spark parallelizes by ``maxPartitionBytes`` chunks.
- The parquet sink partitions by low-cardinality columns only
  (`partition_by`) and controls file sizing through
  ``maxRecordsPerFile`` — many small files are the #1 large-scale
  read-amplification bug.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

TIMESTAMP_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
    **options: Any,
) -> DataFrame:
    """CSV scan with a mandatory explicit schema (no inference pass)."""
    return (
        spark.read.format("csv")
        .schema(schema)
        .option("header", str(header).lower())
        .option("timestampFormat", options.pop("timestampFormat", TIMESTAMP_FMT))
        .option(
            "timestampNTZFormat", options.pop("timestampNTZFormat", TIMESTAMP_FMT)
        )
        .options(**options)
        .load(path)
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    **options: Any,
) -> DataFrame:
    """JSON-lines scan with explicit schema; malformed rows are kept
    null-columned under PERMISSIVE mode (Spark default) rather than
    failing the 100-TB job at row 99 billion."""
    return (
        spark.read.format("json")
        .schema(schema)
        .option("timestampFormat", options.pop("timestampFormat", TIMESTAMP_FMT))
        .option(
            "timestampNTZFormat", options.pop("timestampNTZFormat", TIMESTAMP_FMT)
        )
        .options(**options)
        .load(path)
    )


def read_text(
    spark: SparkSession, path: str, whole_file: bool = False
) -> DataFrame:
    """Plain-text scan → DataFrame[value: string]; ``whole_file``
    gives one row per file (for document-corpus ingestion)."""
    return spark.read.option("wholetext", str(whole_file).lower()).text(path)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    compression: str = "zstd",
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Partitioned parquet sink — the engine's primary output format.

    ``compression`` applies per column chunk (splittable regardless of
    codec, unlike the whole-file ``.bro`` path). ``zstd`` is the
    modern default; pass ``brotli`` where the Hadoop native lib is
    available for bitstream parity with the reference.
    """
    w = df.write.mode(mode).option("compression", compression)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(
    df: DataFrame, path: str, header: bool = True, mode: str = "overwrite"
) -> None:
    (
        df.write.mode(mode)
        .option("header", str(header).lower())
        .option("timestampFormat", TIMESTAMP_FMT)
        .option("timestampNTZFormat", TIMESTAMP_FMT)
        .csv(path)
    )


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    (
        df.write.mode(mode)
        .option("timestampFormat", TIMESTAMP_FMT)
        .option("timestampNTZFormat", TIMESTAMP_FMT)
        .json(path)
    )


def read_orc(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
) -> DataFrame:
    """ORC scan (built-in, splittable, footer-schema'd like parquet)."""
    r = spark.read.format("orc")
    if schema is not None:
        r = r.schema(schema)
    return r.load(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    compression: str = "zstd",
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode).option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def avro_available(spark: SparkSession) -> bool:
    """True if the spark-avro module is on the classpath (it is an
    external module, not bundled in pyspark wheels — absent offline)."""
    try:
        spark.read.format("avro").load("/nonexistent-avro-probe")
        return True  # pragma: no cover - needs spark-avro
    except Exception as exc:
        return "data source: avro" not in str(exc)


def read_avro(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
) -> DataFrame:
    """Avro scan via the external spark-avro module.

    Gated: pyspark wheels don't bundle spark-avro (SURVEY §2c notes
    it as unavailable offline), so this raises a clear actionable
    error instead of Spark's generic ClassNotFound when the package
    is missing. With the module present (``--packages
    org.apache.spark:spark-avro_2.13:<spark version>``) this is a
    normal splittable columnar-ish scan with schema evolution.
    """
    r = spark.read.format("avro")
    if schema is not None:
        r = r.schema(schema)
    try:
        return r.load(path)
    except Exception as exc:
        if "data source: avro" in str(exc):
            raise NotImplementedError(
                "spark-avro is an external module not bundled with pyspark; "
                "launch with --packages org.apache.spark:spark-avro_2.13:"
                "<spark-version> to enable format('avro')"
            ) from exc
        raise


def write_avro(
    df: DataFrame, path: str, mode: str = "overwrite"
) -> None:
    """Avro sink — same spark-avro gating as :func:`read_avro`."""
    try:
        df.write.mode(mode).format("avro").save(path)
    except Exception as exc:
        if "data source: avro" in str(exc):
            raise NotImplementedError(
                "spark-avro is an external module not bundled with pyspark; "
                "launch with --packages org.apache.spark:spark-avro_2.13:"
                "<spark-version> to enable format('avro')"
            ) from exc
        raise


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str = "row",
    schema: StructType | str | None = None,
) -> DataFrame:
    """XML scan (built-in since Spark 4). Explicit schemas avoid a
    full inference pass over the input at scale."""
    r = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        r = r.schema(schema)
    return r.load(path)


def write_xml(
    df: DataFrame,
    path: str,
    row_tag: str = "row",
    root_tag: str = "rows",
    mode: str = "overwrite",
) -> None:
    (
        df.write.mode(mode)
        .format("xml")
        .option("rowTag", row_tag)
        .option("rootTag", root_tag)
        .option("timestampFormat", TIMESTAMP_FMT)
        .save(path)
    )


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_mb: int = 512,
    sort_within_by: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet dataset into files of
    roughly ``target_file_mb`` each. Returns the partition count.

    The 100 TB operational chore: streaming/incremental sinks emit
    thousands of small files whose per-file open/footer cost dominates
    scans. Sizing uses the dataset's on-disk bytes (driver-side file
    listing only — no data collect); an optional sortWithinPartitions
    restores clustering so min/max row-group stats stay selective.
    """
    import math

    try:
        # classic session: Hadoop FS works for any scheme (s3a/hdfs/..)
        path = spark._jvm.org.apache.hadoop.fs.Path(src)  # type: ignore[union-attr]
        fs = path.getFileSystem(spark._jsc.hadoopConfiguration())  # type: ignore[union-attr]
        size_bytes = fs.getContentSummary(path).getLength()
    except AttributeError:
        # Spark Connect: no JVM access — size via the scan's file
        # list (works for local/NFS paths; object-store sizing under
        # Connect would need a cloud SDK listing instead)
        import os

        files = spark.read.parquet(src).inputFiles()
        size_bytes = sum(
            os.path.getsize(f.removeprefix("file:")) for f in files
        )
    n = max(1, math.ceil(size_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src).repartition(n)
    if sort_within_by:
        df = df.sortWithinPartitions(*sort_within_by)
    df.write.mode("overwrite").parquet(dst)
    return n


# ------------------------------------------------- fixed-width text

def read_fixed_width(
    spark: SparkSession,
    path: str,
    colspecs: list[tuple[str, int, int, str]],
    *,
    trim: bool = True,
) -> DataFrame:
    """Read fixed-width text records (mainframe/COBOL extracts, the
    format enterprise feeds still arrive in) into typed columns.

    ``colspecs`` is ``[(name, start, length, type)]`` with 1-based
    ``start`` character offsets and Spark type names (``string``,
    ``int``, ``bigint``, ``double``, ``date``, ...). Values are
    sliced with ``substring`` and cast JVM-side — one codegen
    projection over the text scan, no Python. ``trim`` strips the
    space padding fixed-width encoders emit.

    Scale: plain-text scans are splittable by line, so a 100 TB feed
    parallelizes by ``maxPartitionBytes`` like CSV; the slice+cast
    projection pushes column pruning down to nothing (text sources
    always read whole lines — convert to parquet once, early,
    which `write_parquet` does).
    """
    from pyspark.sql import functions as F

    raw = spark.read.text(path)
    cols = []
    for name, start, length, typ in colspecs:
        c = F.substring("value", start, length)
        if trim:
            c = F.trim(c)
        cols.append(c.cast(typ).alias(name))
    return raw.select(*cols)


def write_fixed_width(
    df: DataFrame,
    path: str,
    widths: list[tuple[str, int]],
    *,
    mode: str = "overwrite",
) -> None:
    """Write a DataFrame as fixed-width text: each column is
    stringified, right-padded (left-padded would turn numerics into
    COBOL zoned style — keep it simple and symmetric with
    ``read_fixed_width``'s trim) and truncated to its width, then
    concatenated. Round-trips through ``read_fixed_width`` with the
    matching colspecs."""
    from pyspark.sql import functions as F

    parts = [
        F.rpad(F.coalesce(F.col(name).cast("string"), F.lit("")), width, " ").substr(
            1, width
        )
        for name, width in widths
    ]
    df.select(F.concat(*parts).alias("value")).write.mode(mode).text(path)
