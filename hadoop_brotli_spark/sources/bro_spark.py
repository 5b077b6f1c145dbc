"""Spark integration for the ``.bro`` codec: DataFrame text
source/sink, mirroring how the reference plugs into Spark through
Hadoop's codec SPI (SURVEY.md §3 EP1/EP2).

Semantics preserved from the reference:
- extension dispatch: only ``*.bro`` files are read (BroCodec.java:56-59)
- non-splittable: one file ⇒ one partition (the codec implements
  CompressionCodec, not SplittableCompressionCodec — BroCodec.java:18)
- streaming, bounded-memory decode inside each task
- config knobs ``bro.quality`` / ``bro.buffer-size``

Scale notes (100 TB): a non-splittable codec caps parallelism at the
file count — the writer therefore emits one file per partition
(``repartition`` upstream to size files ~128 MiB–1 GiB). For
analytics data, prefer parquet (splittable row-group compression);
this path exists for codec-capability parity and raw-text pipelines.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .bro_codec import (
    BRO_EXTENSION,
    BroConfig,
    compress_stream,
    decompress_stream,
)


def write_bro_text(
    df: DataFrame,
    out_dir: str,
    column: str = "value",
    options: dict[str, Any] | None = None,
) -> int:
    """Write one string column as newline-delimited ``.bro`` files,
    one file per partition (executor-side streaming compression).

    Returns the number of files written. The per-partition writer is
    the legitimate imperative island (SURVEY.md data-model decision):
    everything upstream stays a DataFrame.
    """
    config = BroConfig.from_options(options)
    os.makedirs(out_dir, exist_ok=True)

    def write_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import socket
        import uuid

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else 0
        path = os.path.join(out_dir, f"part-{pid:05d}{BRO_EXTENSION}")

        def line_chunks() -> Iterator[bytes]:
            for pdf in batches:
                if len(pdf):
                    yield ("\n".join(pdf[column].astype(str)) + "\n").encode("utf-8")

        tmp = f"{path}.{uuid.uuid4().hex}.tmp"
        n = 0
        with open(tmp, "wb") as f:
            for block in compress_stream(line_chunks(), config):
                f.write(block)
                n += len(block)
        os.replace(tmp, path)  # atomic publish, task-retry safe
        yield pd.DataFrame(
            {"path": [path], "bytes": [n], "host": [socket.gethostname()]}
        )

    report = df.select(F.col(column)).mapInPandas(
        write_partition, schema="path string, bytes long, host string"
    )
    return report.count()


BINARY_FILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def read_bro_text(
    spark: SparkSession,
    path: str,
    options: dict[str, Any] | None = None,
) -> DataFrame:
    """Read ``.bro`` files into DataFrame[value: string, path: string].

    binaryFile scan (one file ⇒ one row ⇒ one work unit, matching the
    non-splittable reference) → streaming decompress + line split in
    an Arrow-batched pandas transform.
    """
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", f"*{BRO_EXTENSION}")
        .load(path)
        .select("path", "content")
    )
    # one file per task: repartition by file so big files don't queue
    # behind each other on one core
    files = files.repartition("path")
    return _decode_files(files, options)


def stream_bro_text(
    spark: SparkSession,
    path: str,
    options: dict[str, Any] | None = None,
) -> DataFrame:
    """Structured-Streaming ``.bro`` source: new ``*.bro`` files
    landing under ``path`` are decompressed incrementally (file
    discovery and exactly-once tracking come from Spark's file
    streaming source; the decode is the same mapInPandas transform
    as the batch reader). Pair with ``.writeStream`` + checkpoint
    for a continuously-ingesting codec pipeline."""
    files = (
        spark.readStream.format("binaryFile")
        .schema(BINARY_FILE_SCHEMA)
        .option("pathGlobFilter", f"*{BRO_EXTENSION}")
        .load(path)
        .select("path", "content")
    )
    return _decode_files(files, options)


def _decode_files(
    files: DataFrame, options: dict[str, Any] | None = None
) -> DataFrame:
    config = BroConfig.from_options(options)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for fpath, content in zip(pdf["path"], pdf["content"]):
                text = b"".join(
                    decompress_stream(
                        (
                            bytes(content[i : i + config.buffer_size])
                            for i in range(0, len(content), config.buffer_size)
                        ),
                        config,
                    )
                ).decode("utf-8")
                lines = text.split("\n")
                if lines and lines[-1] == "":
                    lines.pop()
                yield pd.DataFrame({"value": lines, "path": fpath})

    return files.mapInPandas(decode, schema="value string, path string")


def read_bro_csv(
    spark: SparkSession,
    path: str,
    schema: str,
    sep: str = ",",
    header: bool = False,
    options: dict[str, Any] | None = None,
) -> DataFrame:
    """Typed CSV over ``.bro``: decompress lines, parse with the
    codegen ``from_csv`` expression into the given DDL ``schema``.

    This is the reference's deployment pattern — a Hadoop job reading
    codec-compressed delimited text — as one declarative plan: the
    decode UDF feeds Catalyst expressions, no second pass. With
    ``header=True`` the per-file header line (matching the schema's
    column names) is dropped.
    """
    lines = read_bro_text(spark, path, options)
    if header:
        names = [f.split()[0] for f in schema.split(",")]
        lines = lines.filter(F.col("value") != sep.join(n.strip() for n in names))
    return lines.select(
        F.from_csv("value", schema, {"sep": sep}).alias("r")
    ).select("r.*")


def read_bro_jsonl(
    spark: SparkSession,
    path: str,
    schema: str,
    options: dict[str, Any] | None = None,
) -> DataFrame:
    """Typed JSONL over ``.bro``: decompress lines, ``from_json``
    each into the given DDL ``schema``."""
    lines = read_bro_text(spark, path, options)
    return lines.select(F.from_json("value", schema).alias("r")).select("r.*")
