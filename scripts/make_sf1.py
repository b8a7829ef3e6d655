#!/usr/bin/env python3
"""Synthesize a larger scale factor from /root/testdata by deterministic
key-offset replication (the round-2 10x audit corpus, now committed as a
script so the measurement is reproducible).

Each of the ``factor`` replicas shifts every key column by
``replica_index * step`` where ``step`` = (max key in source) + 1 —
computed per KEYSPACE, so foreign keys stay consistent across tables
(orders.o_custkey shifts by the customer step, lineitem.l_orderkey by the
orders step, ...). Join cardinality ratios and group counts therefore
scale linearly while per-key fan-ins stay identical to the source —
the property that makes sf1 numbers comparable to sf0.1 numbers.

Payload columns (text, embeddings, timestamps, measures) are copied
verbatim: documents/embeddings become a (factor-1)/factor-duplicate
corpus — deliberately pathological for the dedup/ANN operators, which is
exactly what the round-2 audit exercised.

Runs on DuckDB (no JVM): ~5 s for factor 10 over sf0.1. Deterministic:
same input + factor => byte-identical row sets (ORDER BY replica, key).

Usage:
    python scripts/make_sf1.py [--src /root/testdata/sf0.1]
                               [--out /tmp/sf1] [--factor 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb

# key column -> keyspace name; every column in one keyspace shifts by the
# same step (max+1 of the keyspace's OWNING column in the source data).
KEYSPACES: dict[str, str] = {
    "c_custkey": "cust",
    "o_custkey": "cust",
    "o_orderkey": "order",
    "l_orderkey": "order",
    "p_partkey": "part",
    "l_partkey": "part",
    "s_suppkey": "supp",
    "l_suppkey": "supp",
    "event_id": "event",
    "user_id": "user",
    "doc_id": "doc",
    "vec_id": "vec",
}

# keyspace -> (table, owning column) used to compute the step.
OWNERS: dict[str, tuple[str, str]] = {
    "cust": ("customer", "c_custkey"),
    "order": ("orders", "o_orderkey"),
    "part": ("part", "p_partkey"),
    "supp": ("supplier", "s_suppkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}

# Dimension tables copied once, unreplicated (fixed geography).
COPY_ONLY = ("region", "nation")

REPLICATED = (
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def ready_marker(out: str) -> str:
    return os.path.join(out, "_READY")


def is_ready(out: str, factor: int) -> bool:
    """True iff a COMPLETE build of this factor exists at ``out``.
    Checking a data file (e.g. lineitem.parquet, written 5th of 8)
    would silently reuse an interrupted or different-factor build."""
    try:
        with open(ready_marker(out)) as fh:
            return fh.read().strip() == f"factor={factor}"
    except OSError:
        return False


def make(src: str, out: str, factor: int) -> None:
    os.makedirs(out, exist_ok=True)
    try:
        os.remove(ready_marker(out))  # invalidate any previous build
    except OSError:
        pass
    con = duckdb.connect()
    steps: dict[str, int] = {}
    for ks, (table, col) in OWNERS.items():
        steps[ks] = (
            con.sql(
                f"SELECT MAX({col}) FROM "
                f"read_parquet('{src}/{table}.parquet')"
            ).fetchone()[0]
            + 1
        )
    for t in COPY_ONLY:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t in REPLICATED:
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()
        ]
        select = ", ".join(
            f"{c} + __i * {steps[KEYSPACES[c]]} AS {c}"
            if c in KEYSPACES
            else c
            for c in cols
        )
        key = next(c for c in cols if c in KEYSPACES)
        con.execute(
            f"COPY (SELECT {select} "
            f"FROM read_parquet('{src}/{t}.parquet') "
            f"CROSS JOIN range({factor}) r(__i) "
            f"ORDER BY __i, {key}) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    with open(ready_marker(out), "w") as fh:
        fh.write(f"factor={factor}\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    make(args.src, args.out, args.factor)
    print(f"wrote factor-{args.factor} replica of {args.src} to {args.out}")


if __name__ == "__main__":
    main()
