#!/usr/bin/env python3
"""Round-8 continuation probe: A/B graph_triangle_count's n_edges side.

  V0 old   wrapper-side ``edges.agg(count)`` crossJoined with
           triangle_count(edges): the n_edges aggregate re-runs the
           whole (un-materialized) edge pipeline — distinct ->
           per-basket self-join -> support agg — a SECOND time, because
           only the operator's internal oriented-edge localCheckpoint
           memoizes it.
  V1 new   triangle_count(edges, with_edge_count=True): n_edges is a
           COUNT(*) over the CHECKPOINTED oriented relation (orientation
           is a bijection on edges), so the edge pipeline runs ONCE.

Both variants must produce the IDENTICAL single (n_edges, n_triangles)
row — checked before timing. Timing is interleaved fresh-frame
end-to-end walls (build + collect + round-state release), so scheduler
noise hits both variants alike.

Usage: python scripts/probe_triangle_nedges_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

from pyspark.sql import functions as F  # noqa: E402

from plc_data_etl_pipeline_spark.catalog import load  # noqa: E402
from plc_data_etl_pipeline_spark.operators.graph import (  # noqa: E402
    finalize_round_result,
    triangle_count,
)
from plc_data_etl_pipeline_spark.session import get_spark  # noqa: E402

spark = get_spark("triangle-nedges-ab", master="local[32]",
                  shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")


def _edges():
    li = load(spark, SF, "lineitem").select("l_orderkey", "l_partkey")
    op = li.distinct()
    a = op.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = op.select("l_orderkey", F.col("l_partkey").alias("pb"))
    return (
        a.join(b, "l_orderkey")
        .where(F.col("pa") < F.col("pb"))
        .groupBy(F.col("pa").alias("a"), F.col("pb").alias("b"))
        .agg(F.count("*").alias("support"))
        .where(F.col("support") >= 2)
        .select("a", "b")
    )


def v0_old():
    edges = _edges()
    n_edges = edges.agg(F.count("*").cast("bigint").alias("n_edges"))
    tri = triangle_count(edges)
    return finalize_round_result(n_edges.crossJoin(tri), tri)


def v1_new():
    tri = triangle_count(_edges(), with_edge_count=True)
    return finalize_round_result(tri, tri)


def main() -> None:
    r0 = [tuple(r) for r in v0_old().collect()]
    r1 = [tuple(r) for r in v1_new().collect()]
    print(f"v0 result: {r0}")
    print(f"v1 result: {r1}")
    assert r0 == r1, "VARIANTS DIVERGE — do not time"
    print("outputs identical; timing (interleaved, fresh frames)")
    walls: dict[str, list[float]] = {"v0_old": [], "v1_new": []}
    for rep in range(REPS):
        for name, fn in (("v0_old", v0_old), ("v1_new", v1_new)):
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.monotonic()
            fn().collect()
            walls[name].append(time.monotonic() - t0)
    for name, ws in walls.items():
        body = ", ".join(f"{w:.2f}" for w in ws)
        print(f"{name}: min {min(ws):.2f} s  walls [{body}]")


if __name__ == "__main__":
    main()
