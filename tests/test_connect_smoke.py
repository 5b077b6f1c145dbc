"""Spark Connect compatibility (r8 verdict task 7).

A real 100 TB cluster increasingly mandates Spark Connect, where the
client has no ``sparkContext``, no ``.rdd``, and no JVM handle. Two
layers of coverage:

1. A STATIC audit (runs in every environment): the query surface must
   not call classic-only APIs outside the one sanctioned fallback
   site (``_util.fan_out``, which probes ``sparkContext`` /
   ``df.rdd`` inside a try/except with a Connect-safe fallback).
   ``DataFrame.localCheckpoint`` is allowed — PySpark 4.1's Connect
   client implements it (pyspark/sql/connect/dataframe.py:2246,
   ``plan.Checkpoint(local=True)``).

2. An END-TO-END smoke over ``SparkSession.builder.remote(...)``,
   env-gated: this container ships the spark-connect JVM plugin but
   not the Python client deps (``grpcio``/``protobuf``), so the test
   skips with an actionable reason unless the deps are installed
   (``pip install "pyspark[connect]"``) — then it runs a 10-query
   slice including one localCheckpoint user (q64) and one fan-out
   user (q422) against the DuckDB oracle, client-side.
"""

from __future__ import annotations

import ast
import glob
import os

import pytest

QUERY_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "hadoop_brotli_spark",
    "queries",
)

# The 10-query Connect slice: localCheckpoint user (q64), fan-out
# user (q422), plus one per major family.
CONNECT_SLICE = [
    "q01_pricing_summary",
    "q16_join_asof",
    "q27_agg_grouping_sets",
    "q46_window_percent_rank",
    "q60_dedup_exact",
    "q64_dedup_clusters",  # localCheckpoint convergence loop
    "q70_knn_bruteforce",
    "q80_token_stats",
    "q422_jpeg_progressive_decode",  # fan_out + mapInPandas
    "q502_kendall_tau",
]


def test_query_surface_has_no_classic_only_calls():
    """AST census: no query module may touch ``sparkContext`` or
    ``.rdd`` — the two classic-session-only attributes — except
    ``_util.fan_out``'s guarded probe. A new query that sneaks one in
    breaks every Connect deployment at runtime; this pins it at
    commit time."""
    offenders: list[str] = []
    for path in sorted(glob.glob(os.path.join(QUERY_DIR, "*.py"))):
        rel = os.path.basename(path)
        tree = ast.parse(open(path).read())
        # the exemption is fan_out's guarded fallback site ONLY — a
        # classic-only call anywhere else in _util.py must still trip
        # the gate (r9 — ADVICE: the old file-wide exemption hid them)
        exempt_spans: list[tuple[int, int]] = []
        if rel == "_util.py":
            for fn in ast.walk(tree):
                if (
                    isinstance(fn, ast.FunctionDef)
                    and fn.name == "fan_out"
                ):
                    exempt_spans.append((fn.lineno, fn.end_lineno))
        for node in ast.walk(tree):
            if not isinstance(node, ast.Attribute):
                continue
            if node.attr in ("sparkContext", "rdd"):
                if any(a <= node.lineno <= b for a, b in exempt_spans):
                    continue
                offenders.append(f"{rel}:{node.lineno} .{node.attr}")
    assert not offenders, (
        "classic-only API outside _util.fan_out — these break Spark "
        f"Connect sessions: {offenders}"
    )


def _connect_available() -> str | None:
    try:
        import grpc  # noqa: F401
        import google.protobuf  # noqa: F401
    except ImportError:
        return (
            "Spark Connect python client deps absent "
            '(pip install "pyspark[connect]")'
        )
    return None


@pytest.mark.skipif(
    _connect_available() is not None,
    reason=_connect_available() or "",
)
def test_connect_session_runs_query_slice(tmp_path):
    """End-to-end under a Connect session: builder.remote spawns a
    local Connect server; the slice must produce oracle-identical
    results with no classic-API fallout (fan_out takes its Connect
    branch, localCheckpoint goes through plan.Checkpoint)."""
    from pyspark.sql import SparkSession

    from hadoop_brotli_spark.oracle import compare
    from hadoop_brotli_spark.registry import load_all_queries

    spark = (
        SparkSession.builder.remote("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    try:
        specs = load_all_queries()
        for name in CONNECT_SLICE:
            compare(specs[name], spark, "/root/testdata/sf0.01")
    finally:
        spark.stop()
