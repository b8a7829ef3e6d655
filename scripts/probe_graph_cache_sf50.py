#!/usr/bin/env python3
"""sf50 probe for the round-8 trade-pairs cache (VERDICT item 3): run
three iterative graph queries in ONE session and show the 2nd+ pay
relaxation-only cost (the shared edge build — ~70 s of every sf50
fixpoint wall in r7 — materializes once). Row counts printed so the
probe doubles as a results-unchanged check against the r7 numbers."""

import sys
import time

sys.path.insert(0, "/root/repo")

from plc_data_etl_pipeline_spark.registry import all_queries
from plc_data_etl_pipeline_spark.session import get_spark

SF = "/tmp/sf50"

spark = get_spark("graph-cache-probe", master="local[32]",
                  shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
qs = all_queries()
for name in ("graph_components_fixpoint", "graph_bfs_hops",
             "graph_sssp_weighted"):
    t0 = time.perf_counter()
    rows = qs[name].fn(spark, SF).collect()
    print(f"{name}: {time.perf_counter() - t0:.1f} s, {len(rows)} rows",
          flush=True)
    for r in sorted(map(tuple, rows))[:3]:
        print("   ", r, flush=True)
