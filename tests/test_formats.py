"""Roundtrip tests for the CSV / JSON-lines / text sources and the
partitioned parquet sink (hadoop_brotli_spark.sources.formats)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hadoop_brotli_spark.catalog import load_table
from hadoop_brotli_spark.sources import formats

DOCS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)
EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _sorted_rows(df, key):
    return [tuple(r) for r in df.orderBy(key).collect()]


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_csv")
    formats.write_csv(docs, out)
    back = formats.read_csv(spark, out, DOCS_SCHEMA)
    assert _sorted_rows(back, "doc_id") == _sorted_rows(docs, "doc_id")


def test_csv_roundtrip_timestamps(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").drop("props")  # JSON commas vs CSV
    out = str(tmp_path / "events_csv")
    formats.write_csv(ev, out)
    back = formats.read_csv(
        spark, out, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double"
    )
    assert _sorted_rows(back, "event_id") == _sorted_rows(ev, "event_id")


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_jsonl")
    formats.write_jsonl(ev, out)
    back = formats.read_jsonl(spark, out, EVENTS_SCHEMA).select(*ev.columns)
    assert _sorted_rows(back, "event_id") == _sorted_rows(ev, "event_id")


def test_text_roundtrip(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select(F.col("text").alias("value"))
    out = str(tmp_path / "docs_text")
    docs.write.mode("overwrite").text(out)
    back = formats.read_text(spark, out)
    assert sorted(r.value for r in back.collect()) == sorted(
        r.value for r in docs.collect()
    )


def test_partitioned_parquet_sink(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_part")
    formats.write_parquet(docs, out, partition_by=["lang"], compression="zstd")
    # hive-style partition dirs exist
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    dirs = {d.split("=")[1] for d in os.listdir(out) if d.startswith("lang=")}
    assert dirs == langs
    back = spark.read.parquet(out).select(*docs.columns)
    assert _sorted_rows(back, "doc_id") == _sorted_rows(docs, "doc_id")
    # partition pruning: the lang predicate must land in
    # PartitionFilters (directory pruning), not post-scan Filter
    one = sorted(langs)[0]
    filtered = spark.read.parquet(out).filter(F.col("lang") == one)
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1].split("]")[0]
    assert filtered.count() == docs.filter(F.col("lang") == one).count()


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "events_orc")
    formats.write_orc(ev, out)
    back = formats.read_orc(spark, out).select(*ev.columns)
    assert _sorted_rows(back, "event_id") == _sorted_rows(ev, "event_id")


def test_xml_roundtrip(spark, sf_dir, tmp_path):
    # timestamps go through the shared TIMESTAMP_FMT; re-read with an
    # explicit schema (inference would widen longs)
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "docs_xml")
    formats.write_xml(docs, out, row_tag="doc")
    back = formats.read_xml(spark, out, row_tag="doc", schema=docs.schema).select(
        *docs.columns
    )
    assert _sorted_rows(back, "doc_id") == _sorted_rows(docs, "doc_id")


def test_compact_parquet(spark, sf_dir, tmp_path):
    # explode a table into many tiny files, compact back to few
    li = load_table(spark, sf_dir, "lineitem")
    many = str(tmp_path / "many")
    li.repartition(64).write.parquet(many)
    compacted = str(tmp_path / "compacted")
    n = formats.compact_parquet(spark, many, compacted, target_file_mb=512,
                                sort_within_by=["l_orderkey"])
    assert n == 1  # tiny dataset → single right-sized file
    import glob
    files = glob.glob(f"{compacted}/*.parquet")
    assert len(files) == n
    back = spark.read.parquet(compacted)
    assert back.count() == li.count()


def test_avro_gated(spark, sf_dir, tmp_path):
    """Avro is an external module (not bundled offline): with it
    present the round-trip must work; without it the reader/writer
    must raise the actionable NotImplementedError, not a raw
    ClassNotFound."""
    import pytest as _pytest

    from hadoop_brotli_spark.catalog import load_table
    from hadoop_brotli_spark.sources.formats import (
        avro_available,
        read_avro,
        write_avro,
    )

    nation = load_table(spark, sf_dir, "nation")
    out = str(tmp_path / "nation_avro")
    if avro_available(spark):  # pragma: no cover - needs spark-avro
        write_avro(nation, out)
        back = read_avro(spark, out)
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, nation.collect())
        )
    else:
        with _pytest.raises(NotImplementedError, match="spark-avro"):
            write_avro(nation, out)
        with _pytest.raises(NotImplementedError, match="spark-avro"):
            read_avro(spark, out).collect()


def test_fixed_width_roundtrip(spark, sf_dir, tmp_path):
    """write_fixed_width → read_fixed_width round-trips typed rows."""
    from hadoop_brotli_spark.catalog import load_table
    from hadoop_brotli_spark.sources.formats import (
        read_fixed_width,
        write_fixed_width,
    )

    src = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    )
    dst = str(tmp_path / "fw")
    write_fixed_width(
        src,
        dst,
        [("c_custkey", 10), ("c_name", 20), ("c_mktsegment", 12), ("c_acctbal", 12)],
    )
    back = read_fixed_width(
        spark,
        dst,
        [
            ("c_custkey", 1, 10, "bigint"),
            ("c_name", 11, 20, "string"),
            ("c_mktsegment", 31, 12, "string"),
            ("c_acctbal", 43, 12, "double"),
        ],
    )
    a = sorted(tuple(r) for r in src.collect())
    b = sorted(tuple(r) for r in back.collect())
    assert a == b
