"""Table catalog: load the driver-generated parquet tables.

Tables (see TESTDATA.md / FIXTURES.md): region nation customer
supplier part orders lineitem events documents embeddings — one
parquet file per table under an ``sf_dir``.

Scale notes (100 TB): we read parquet with the footer schema (no
inference cost), never cache eagerly, and leave partitioning to the
scan — Catalyst prunes columns and pushes filters into the parquet
reader. The small dimension tables (region/nation/supplier/part at
TPC-H ratios) are broadcast-joined by the query layer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from . import TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough to broadcast at any TPC-H-like scale
# factor (region=5 rows, nation=25 always; supplier/part/customer grow
# linearly but stay << lineitem).
BROADCAST_SAFE = frozenset({"region", "nation", "supplier"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _normalize_timestamps(df: DataFrame) -> DataFrame:
    """Cast any ``timestamp_ntz`` column to ``timestamp``.

    The driver regenerates testdata between rounds and the parquet
    logical type of timestamp columns has varied (TIMESTAMP(NANOS),
    TIMESTAMP_NTZ, TIMESTAMP). With the session timezone pinned UTC
    the NTZ→TIMESTAMP cast is value-preserving, and it keeps the whole
    query surface on one timestamp type — functions like
    ``unix_micros`` reject NTZ, and DuckDB's naive TIMESTAMP matches
    UTC-pinned instants exactly.
    """
    from pyspark.sql import functions as F

    ntz_cols = [f.name for f in df.schema.fields
                if f.dataType.typeName() == "timestamp_ntz"]
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. Lazy: just a scan node until an action runs.

    ``events.ts`` has been written as parquet TIMESTAMP(NANOS) in some
    driver generations, which Spark does not read natively: we read
    nanos as long (legacy conf, safe to set at runtime) and
    floor-divide to microseconds — the same truncation DuckDB applies,
    so oracle timestamps agree. NTZ columns are cast to TIMESTAMP
    (see ``_normalize_timestamps``).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(table_path(sf_dir, name))
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return _normalize_timestamps(df)
    return _normalize_timestamps(spark.read.parquet(table_path(sf_dir, name)))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL entry point."""
    for name, df in load_all(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
