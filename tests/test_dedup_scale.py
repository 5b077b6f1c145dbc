"""Scale-hazard guards for the dedup surface (round-1 VERDICT task 4):
a degenerate corpus — thousands of identical documents — must not
concentrate an unbounded LSH bucket in one task.

With 10k identical docs, every band hashes to the same bucket; the
MAX_LSH_BUCKET cap must drop those buckets BEFORE collect_set, so the
query completes with bounded task memory and emits zero candidate
pairs (exact dedup q60 is the right tool for identical docs).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

N_IDENTICAL = 10_000
TEXT = "the quick brown fox jumps over the lazy dog again and again"


@pytest.fixture(scope="module")
def degenerate_sf_dir(tmp_path_factory):
    """A testdata-shaped dir whose documents table is 10k identical
    docs plus a couple of genuine near-dups."""
    d = tmp_path_factory.mktemp("degenerate")
    rows = [
        {
            "doc_id": i,
            "text": TEXT,
            "lang": "en",
            "source": "src0",
            "n_chars": len(TEXT),
        }
        for i in range(N_IDENTICAL)
    ]
    # two near-dup (but not identical) docs in their own small bucket
    for i, suffix in ((N_IDENTICAL, "one"), (N_IDENTICAL + 1, "two")):
        text = "completely different words entirely unique tokens " + suffix
        rows.append(
            {
                "doc_id": i,
                "text": text,
                "lang": "en",
                "source": "src1",
                "n_chars": len(text),
            }
        )
    pd.DataFrame(rows).to_parquet(d / "documents.parquet")
    return str(d)


def test_minhash_lsh_degenerate_corpus_bounded(spark, degenerate_sf_dir):
    from hadoop_brotli_spark.queries.dedup import MAX_LSH_BUCKET, _minhash_pairs

    pairs = _minhash_pairs(spark, degenerate_sf_dir).collect()
    # The 10k-identical bucket (size >> MAX_LSH_BUCKET) must be
    # dropped, not exploded into ~50M pairs.
    assert N_IDENTICAL > MAX_LSH_BUCKET
    ids = {r.doc_a for r in pairs} | {r.doc_b for r in pairs}
    assert not any(i < N_IDENTICAL for i in ids), (
        "oversized LSH bucket leaked candidate pairs"
    )
    # The small near-dup bucket survives the cap.
    assert (N_IDENTICAL, N_IDENTICAL + 1) in {(r.doc_a, r.doc_b) for r in pairs}


def test_minhash_lsh_cap_matches_oracle(spark, degenerate_sf_dir):
    """The DuckDB oracle applies the identical bucket cap, so even a
    degenerate corpus hash-matches."""
    import duckdb

    from hadoop_brotli_spark.queries.dedup import _minhash_oracle, _minhash_pairs

    spark_rows = sorted(
        (r.doc_a, r.doc_b) for r in _minhash_pairs(spark, degenerate_sf_dir).collect()
    )
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{degenerate_sf_dir}/documents.parquet')"
        )
        oracle_rows = sorted(
            (a, b) for a, b in con.execute(_minhash_oracle()).fetchall()
        )
    finally:
        con.close()
    assert spark_rows == oracle_rows


def test_simhash_bands_degenerate_corpus_bounded(spark, degenerate_sf_dir):
    """q212's band buckets use the same MAX_LSH_BUCKET pre-collect
    cap: 10k identical docs collapse to ONE fingerprint, whose band
    buckets must be dropped, not exploded into ~50M pairs."""
    from hadoop_brotli_spark.queries.corpus_ops import q212_simhash_band_pairs

    pairs = q212_simhash_band_pairs(spark, degenerate_sf_dir).collect()
    ids = {r.doc_a for r in pairs} | {r.doc_b for r in pairs}
    assert not any(i < N_IDENTICAL for i in ids), (
        "oversized SimHash band bucket leaked candidate pairs"
    )


def test_simhash_bands_cap_matches_oracle(spark, degenerate_sf_dir):
    """The q212 oracle applies the identical bucket cap, so the
    degenerate corpus still hash-matches row-for-row."""
    import duckdb

    from hadoop_brotli_spark.queries.corpus_ops import (
        _simhash_oracle_pairs,
        q212_simhash_band_pairs,
    )

    spark_rows = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in q212_simhash_band_pairs(spark, degenerate_sf_dir).collect()
    )
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{degenerate_sf_dir}/documents.parquet')"
        )
        oracle_rows = sorted(tuple(r) for r in con.execute(_simhash_oracle_pairs()).fetchall())
    finally:
        con.close()
    assert spark_rows == oracle_rows


class TestAlternatingStar:
    def test_chain_graph_converges_logarithmically(self, spark):
        """A path of length 127 (diameter 127) must collapse in
        O(log d) rounds — the exact case where q64's min-label
        propagation needs 127 rounds (r2 verdict task 4)."""
        from hadoop_brotli_spark.queries.dedup import (
            _alternating_star_components,
        )

        n = 128
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
        )
        docs = spark.range(n).select(F.col("id").alias("doc_id"))
        labeled, rounds = _alternating_star_components(pairs, docs)
        out = {r.doc_id: r.cluster_id for r in labeled.collect()}
        assert out == {i: 0 for i in range(n)}
        assert rounds <= 10, f"chain-128 took {rounds} rounds (want O(log d))"

    def test_matches_min_label_propagation(self, spark):
        """Same components as q64's propagation on a multi-component
        graph with singletons, self-dups and a star."""
        import random

        from hadoop_brotli_spark.queries.dedup import (
            _alternating_star_components,
            _propagate_labels,
        )

        rng = random.Random(5)
        edges = set()
        # three random components over disjoint id ranges + one chain
        for base in (0, 100, 200):
            ids = list(range(base, base + 12))
            for _ in range(15):
                a, b = rng.sample(ids, 2)
                edges.add((min(a, b), max(a, b)))
        edges |= {(300 + i, 301 + i) for i in range(9)}
        pairs = spark.createDataFrame(
            sorted(edges), "doc_a long, doc_b long"
        )
        docs = spark.range(400).select(F.col("id").alias("doc_id"))
        star, _ = _alternating_star_components(pairs, docs)
        prop = _propagate_labels(pairs, docs, max_iter=40)
        assert sorted(map(tuple, star.collect())) == sorted(
            map(tuple, prop.collect())
        )
