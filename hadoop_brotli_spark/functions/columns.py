"""Public reusable column expressions — the engine's function library.

Everything here is a plain JVM-side Catalyst expression builder
(``Column -> Column``): usable in any ``select``/``filter``/``agg``
on any DataFrame, with no dependence on the engine's test tables.
The registered queries import THESE (not the other way around), so a
user switching to this engine gets the same primitives the query
surface is built from:

    from hadoop_brotli_spark.functions import (
        cosine_similarity, zorder_key, sign_bucket, cms_bucket,
    )
    df.select(cosine_similarity("vec_a", "vec_b"))

Scale note: these stay inside whole-stage codegen or Catalyst's
higher-order-function evaluator — no Python in the row path. The
higher-order fold in ``dot_product`` measured FASTER warm than an
unrolled 64-term codegen expression (1.3 s vs 5.4 s on a 500k-pair
scan at sf0.1): giant unrolled expressions blow up Janino
compilation, so the fold is the right default for array math.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ in double precision (sequential JVM-side fold over
    ``zip_with`` — deterministic element order, no shuffle).

    r6 note: a DIM-unrolled ``element_at`` chain was A/B-tested as a
    "codegen-friendly" fast path and measured ~3x SLOWER than this
    fold on both the 5-query (q70) and 200-query (q232) broadcast-kNN
    shapes at sf0.1 (an earlier apparent 30x win was an AQE artifact:
    re-collecting the SAME DataFrame object reuses its materialized
    shuffle stages). The HOF fold's specialized array loop beats a
    64-term per-element expression tree; keep it."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | str) -> Column:
    """√Σ aᵢ² in double precision."""
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine of two array<numeric> columns, in double precision.
    Callers comparing across engines should ``F.round(…, 6)`` (float
    sums are order-sensitive only across different plans; within one
    plan the fold order is fixed)."""
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def sign_bucket(col: Column | str, bits: int = 8) -> Column:
    """Axis-aligned random-hyperplane LSH bucket id: concatenated
    sign bits of the first ``bits`` dimensions. Equal vectors share
    buckets; candidate generation becomes an equi-join on this key."""
    c = F.col(col) if isinstance(col, str) else col
    return F.concat(
        *[
            F.when(c.getItem(i) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(bits)
        ]
    )


def zorder_key(x: Column | str, y: Column | str, bits: int = 10) -> Column:
    """Morton (Z-order) interleave of the low ``bits`` bits of two
    integer columns — x on even positions, y on odd. Write a table
    ``repartitionByRange`` + ``sortWithinPartitions`` on this key and
    every file's (min,max) footer stats bound BOTH dimensions at
    once, so conjunctive predicates prune files that a 1-D sort could
    only prune on its leading column."""
    import functools
    import operator

    x = F.col(x) if isinstance(x, str) else x
    y = F.col(y) if isinstance(y, str) else y
    terms = []
    for j in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, j).bitwiseAND(F.lit(1)), 2 * j))
        terms.append(
            F.shiftleft(F.shiftright(y, j).bitwiseAND(F.lit(1)), 2 * j + 1)
        )
    return functools.reduce(operator.add, terms)


def cms_bucket(key: Column | str, row: int, width: int = 64) -> Column:
    """Count-min-sketch bucket for hash row ``row``: 8 md5 hex chars
    of (row, key) mod ``width``. md5-derived so any engine computes
    identical sketch state (engine-native seeded hashes differ)."""
    k = F.col(key) if isinstance(key, str) else key
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"cms{row}:"), k).cast("binary")), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % width
    )


def word_shingles(words: Column | str, k: int) -> Column:
    """All k-word shingles of a pre-split array<string> column (empty
    array when the document has fewer than k words)."""
    w = F.col(words) if isinstance(words, str) else words
    return F.when(
        F.size(w) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - k),
            lambda i: F.concat_ws(" ", F.slice(w, i + 1, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def hamming_distance(a: Column | str, b: Column | str) -> Column:
    """Hamming distance of two integer fingerprints (e.g. packed
    SimHash): ``bit_count(a XOR b)`` — one codegen instruction pair."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.bit_count(a.bitwiseXOR(b))
