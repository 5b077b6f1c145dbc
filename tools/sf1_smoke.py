#!/usr/bin/env python
"""sf1 scale smoke for a list of registered queries (r4 verdict task
5 infrastructure, generalized): run each query once at sf0.1 and once
at `.tmp/sf1` (the 10x tiled dataset from tools/make_sf1.py) in one
warm session and report the ratio. A query in the linear band should
sit well under 10x; anything above flags a superlinear surprise worth
reading the plan for.

Usage:
    python tools/make_sf1.py          # once, builds .tmp/sf1
    python tools/sf1_smoke.py q435_gap_fill_interpolate q436_... ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        raise SystemExit("usage: sf1_smoke.py <query> [<query> ...]")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from hadoop_brotli_spark.registry import load_all_queries

    specs = load_all_queries()
    print(f"{'query':42s} {'sf0.1 s':>9s} {'sf1 s':>9s} {'ratio':>7s}")
    for name in names:
        fn = specs[name].fn
        # r6 advice: one UNMEASURED warm-up execution at sf0.1 first —
        # the sf0.1 run doubles as the ratio denominator, so taking
        # the first (codegen/JIT-loaded) execution would inflate it
        # and systematically understate the sf1/sf0.1 ratio
        fn(spark, "/root/testdata/sf0.1").count()
        times = []
        for sf_dir in ("/root/testdata/sf0.1", ".tmp/sf1"):
            t0 = time.monotonic()
            n = fn(spark, sf_dir).count()
            times.append(time.monotonic() - t0)
        r = times[1] / times[0] if times[0] > 0 else float("inf")
        print(
            f"{name:42s} {times[0]:9.2f} {times[1]:9.2f} {r:7.1f}"
            + ("   <-- >10x" if r > 10 else "")
        )


if __name__ == "__main__":
    main()
