"""Thin re-export: the oracle comparator lives in the package
(`hadoop_brotli_spark.oracle`) so the CLI `verify` subcommand and the
test suite share one driver-identical implementation."""

from hadoop_brotli_spark.oracle import (  # noqa: F401
    _cell,
    _norm_rows,
    canonize,
    compare,
    duckdb_conn,
    oracle_pdf,
    spark_pdf,
)
