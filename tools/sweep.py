"""Full-registry timing sweep at a given scale factor.

The oracle sweep (`verify all`) runs at sf0.01; the bench covers 19
headline queries at sf0.1. This tool times EVERY registered query at
sf0.1 (or any --sf-dir) — the 10× data step that catches plan cliffs
the small sweep can't (q21's 20 s sketch-buffer regression was found
exactly this way). Output: one JSON file with per-query wall seconds
and row counts, plus a sorted worst-offenders list on stderr.

Usage:
    python tools/sweep.py [--sf-dir /root/testdata/sf0.1] \
        [--out SWEEP_r3.json] [--threshold 5.0]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="SWEEP_r3.json")
    ap.add_argument(
        "--threshold", type=float, default=5.0,
        help="flag queries slower than this many seconds",
    )
    ap.add_argument(
        "--min-of", type=int, default=1,
        help="runs per query; min recorded (noise hygiene)",
    )
    ap.add_argument(
        "--rerun-over", type=float, default=2.0,
        help="re-run queries whose first run exceeds this many "
        "seconds and record the min — bounds the min-of-2 cost to "
        "the queries where one-shot noise actually distorts "
        "round-over-round diffs (r6 verdict: q54/q55/q56/q379 "
        "flagged phantom 2-10x moves under ambient load)",
    )
    args = ap.parse_args()

    from hadoop_brotli_spark.registry import load_all_queries
    from hadoop_brotli_spark.session import get_spark

    spark = get_spark("hbs-sweep")
    specs = load_all_queries()
    results: dict[str, dict] = {}
    t_all = time.perf_counter()
    for name in sorted(specs):
        load1 = round(os.getloadavg()[0], 2)
        t0 = time.perf_counter()
        try:
            df = specs[name].fn(spark, args.sf_dir)
            n = df.count()
            dt = round(time.perf_counter() - t0, 3)
            runs = [dt]
            # second opinion for slow-looking queries: one-shot
            # timings under ambient load flag phantom regressions;
            # a fresh DataFrame per run avoids AQE stage-reuse
            # flattering the repeat
            while len(runs) < args.min_of or (
                len(runs) == 1 and dt > args.rerun_over
            ):
                t1 = time.perf_counter()
                specs[name].fn(spark, args.sf_dir).count()
                runs.append(round(time.perf_counter() - t1, 3))
            results[name] = {
                "sec": min(runs), "rows": n, "load1": load1,
            }
            if len(runs) > 1:
                results[name]["runs"] = runs
        except Exception as ex:  # keep sweeping; report at the end
            dt = round(time.perf_counter() - t0, 3)
            results[name] = {"sec": dt, "error": str(ex)[:200]}
        sys.stderr.write(f"{name}: {results[name]}\n")

    total = round(time.perf_counter() - t_all, 3)
    slow = sorted(
        ((n, r["sec"]) for n, r in results.items() if r["sec"] > args.threshold),
        key=lambda x: -x[1],
    )
    errors = [n for n, r in results.items() if "error" in r]
    payload = {
        "sf_dir": args.sf_dir,
        "total_sec": total,
        "n_queries": len(results),
        "slow_over_threshold": slow,
        "errors": errors,
        "queries": results,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    sys.stderr.write(
        f"\nwrote {args.out}: {len(results)} queries in {total}s; "
        f"{len(slow)} over {args.threshold}s: {slow[:10]}; "
        f"{len(errors)} errors: {errors[:5]}\n"
    )
    return 1 if errors else 0


if __name__ == "__main__":
    sys.exit(main())
