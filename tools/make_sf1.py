#!/usr/bin/env python
"""Generate an sf1 dataset (10x sf0.1) for the scale smoke (r4
verdict task 5) by TILING the driver's sf0.1 parquet ten times with
consistent key offsets.

Why tiling instead of a fresh generator: the driver's distributions
(date ranges, per-user event densities, text/vocabulary shapes, join
fan-outs, filter selectivities) carry over EXACTLY, so a query that
scales linearly in rows should take ~10x its sf0.1 time — any
superlinear surprise (LSH bucket-cap interplay, iterative lineage
growth, window fan-out) is attributable to the engine, not to a
distribution shift. Every foreign key is offset by the same
per-copy stride as its primary key, so join cardinalities per key
are unchanged (no artificial hot keys).

Documents/embeddings are duplicated verbatim per copy (ids offset):
dedup families grow 10x in size — which is precisely the adversarial
regime a 100 TB dedup run lives in.

Writes to .tmp/sf1 (gitignored). Usage:
    python tools/make_sf1.py [--copies 10] [--out .tmp/sf1]
"""

from __future__ import annotations

import argparse
import os

import duckdb

SRC = "/root/testdata/sf0.1"

# table -> {column: stride_key} ; strides are per-copy offsets chosen
# >= the key's range so copies never collide
OFFSETS = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {
        "l_orderkey": "order",
        "l_partkey": "part",
        "l_suppkey": "supp",
    },
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}
COPY_AS_IS = ["region", "nation"]

STRIDES = {
    "cust": 1_000_000,
    "supp": 100_000,
    "part": 1_000_000,
    "order": 10_000_000,
    "event": 10_000_000,
    "user": 1_000_000,
    "doc": 1_000_000,
    "vec": 1_000_000,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--out", default=".tmp/sf1")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()

    for t in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{args.out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(t, "copied")

    for t, keymap in OFFSETS.items():
        cols = (
            con.execute(
                f"SELECT * FROM read_parquet('{SRC}/{t}.parquet') LIMIT 0"
            )
            .df()
            .columns.tolist()
        )
        select = ", ".join(
            f"{c} + k.i * {STRIDES[keymap[c]]} AS {c}" if c in keymap else c
            for c in cols
        )
        con.execute(
            f"COPY (SELECT {select} "
            f"FROM read_parquet('{SRC}/{t}.parquet'), "
            f"(SELECT UNNEST(generate_series(0, {args.copies - 1})) AS i)"
            f" k ORDER BY k.i) "
            f"TO '{args.out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{args.out}/{t}.parquet')"
        ).fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main()
