#!/usr/bin/env python3
"""sf100 graph-family ratchet (round-8, VERDICT item 8's named next
notch): the three bfs-machinery fixpoints at factor 1000 (600M
lineitem / 500M directed trade edges), one session, shared edge cache.
Run AFTER the round-8 _trade_pairs cache landed — the 2nd+ queries
should stay relaxation-only even at this scale."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from plc_data_etl_pipeline_spark.registry import all_queries
from plc_data_etl_pipeline_spark.session import get_spark

SF = "/tmp/sf100"

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
spark = get_spark("graph-sf100-probe", master="local[32]",
                  shuffle_partitions=64)
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
