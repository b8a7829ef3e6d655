#!/usr/bin/env python3
"""Round-8 continuation probe: A/B pagerank's pre-checkpoint subtree.

  V0 old   pagerank(_trade_pairs(...)): the operator derives degrees
           per call — undirected union -> degree groupBy shuffle ->
           edge⋈degree join -> repartition (3 exchanges before the
           edge checkpoint), every pagerank run.
  V1 new   pagerank(_trade_pairs(..., with_degrees=True),
           degree_cols=("deg_a", "deg_b")): the session materialization
           already carries per-endpoint degrees (two window passes paid
           ONCE at build time), so the subtree is explode ->
           repartition (1 exchange) and the rank init reuses the
           checkpointed src-partitioned edges exchange-free.

Both variants read the SAME cached pair parquet (the cache key ignores
the projection), so the A/B isolates exactly the per-call machinery.
Top-20 outputs must be identical before timing. Interleaved fresh-frame
end-to-end walls (build plan + collect + round-state release).

Usage: python scripts/probe_pagerank_degrees_ab.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

from pyspark.sql import functions as F  # noqa: E402

from plc_data_etl_pipeline_spark.operators.graph import (  # noqa: E402
    finalize_round_result,
    pagerank,
)
from plc_data_etl_pipeline_spark.queries.graph import (  # noqa: E402
    _node_label,
    _trade_pairs,
)
from plc_data_etl_pipeline_spark.session import get_spark  # noqa: E402

spark = get_spark("pagerank-degrees-ab", master="local[32]",
                  shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")


def _finish(pr):
    top = (
        pr.select("node", F.col("pr").alias("pr_micro"))
        .orderBy(F.desc("pr_micro"), "node")
        .limit(20)
    )
    return finalize_round_result(
        top.select(_node_label("node").alias("node"), "pr_micro"), pr
    )


def v0_old():
    return _finish(pagerank(_trade_pairs(spark, SF), iterations=3))


def v1_new():
    return _finish(
        pagerank(
            _trade_pairs(spark, SF, with_degrees=True),
            iterations=3,
            degree_cols=("deg_a", "deg_b"),
        )
    )


def main() -> None:
    r0 = [tuple(r) for r in v0_old().collect()]
    r1 = [tuple(r) for r in v1_new().collect()]
    print(f"v0 top20 head: {r0[:3]}")
    assert r0 == r1, "VARIANTS DIVERGE — do not time"
    print("outputs identical; timing (interleaved, fresh frames, warm cache)")
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
