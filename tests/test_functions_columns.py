"""Public function-library tests (`hadoop_brotli_spark.functions`):
each expression must work on arbitrary DataFrames — no dependence on
the engine's test tables — since this is the surface a library user
builds with."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hadoop_brotli_spark.functions import (
    cms_bucket,
    cosine_similarity,
    dot_product,
    hamming_distance,
    l2_norm,
    sign_bucket,
    word_shingles,
    zorder_key,
)


def test_dot_and_norm_and_cosine(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 2.0], [2.0, 4.0, 4.0])], "a array<double>, b array<double>"
    )
    row = df.select(
        dot_product("a", "b").alias("d"),
        l2_norm("a").alias("na"),
        F.round(cosine_similarity("a", "b"), 9).alias("cos"),
    ).first()
    assert row.d == 18.0
    assert row.na == 3.0
    assert row.cos == 1.0  # parallel vectors


def test_sign_bucket_prefix(spark):
    df = spark.createDataFrame(
        [([1.0, -2.0, 0.0, -0.5],)], "v array<double>"
    )
    assert df.select(sign_bucket("v", 4).alias("b")).first().b == "1010"


def test_zorder_key_interleaves(spark):
    # x=0b11 on even bit positions -> 0b0101; y=0b11 on odd -> 0b1010
    df = spark.createDataFrame([(3, 0), (0, 3), (3, 3)], "x long, y long")
    got = [r.z for r in df.select(zorder_key("x", "y", 2).alias("z")).collect()]
    assert got == [0b0101, 0b1010, 0b1111]


def test_cms_bucket_deterministic_and_bounded(spark):
    df = spark.createDataFrame([("u1",), ("u2",)], "k string")
    rows = df.select(
        cms_bucket("k", 0).alias("b0"), cms_bucket("k", 1).alias("b1")
    ).collect()
    for r in rows:
        assert 0 <= r.b0 < 64 and 0 <= r.b1 < 64
    again = df.select(cms_bucket("k", 0).alias("b0")).collect()
    assert [r.b0 for r in again] == [r.b0 for r in rows]


def test_word_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "t string")
    got = [
        r.sh
        for r in df.select(
            word_shingles(F.split("t", " "), 3).alias("sh")
        ).collect()
    ]
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == []  # shorter than k -> empty, not null


def test_hamming_distance(spark):
    df = spark.createDataFrame([(0b1011, 0b0010)], "a long, b long")
    assert df.select(hamming_distance("a", "b").alias("h")).first().h == 2


@pytest.mark.parametrize("bad", [None])
def test_null_arrays_yield_null_not_crash(spark, bad):
    df = spark.createDataFrame([(bad,)], "v array<double>")
    row = df.select(
        dot_product("v", "v").alias("d"), l2_norm("v").alias("n")
    ).first()
    assert row.d is None and row.n is None
