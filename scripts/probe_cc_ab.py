#!/usr/bin/env python3
"""Round-8 A/B: min-label-propagation CC vs alternating-star CC on the
repeat-trade graph at scale, ALGORITHM-ONLY walls (graph_bfs_hops runs
first so both CC queries hit the session _trade_pairs cache).

Usage: python scripts/probe_cc_ab.py /tmp/sf50 [driver_mem]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF = sys.argv[1]
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM",
                      sys.argv[2] if len(sys.argv) > 2 else "48g")

from plc_data_etl_pipeline_spark.registry import all_queries
from plc_data_etl_pipeline_spark.session import get_spark

spark = get_spark("cc-ab-probe", master="local[32]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
qs = all_queries()
for name in ("graph_bfs_hops", "graph_components_fixpoint",
             "graph_components_altstar"):
    t0 = time.perf_counter()
    rows = qs[name].fn(spark, SF).collect()
    print(f"{name}: {time.perf_counter() - t0:.1f} s, {len(rows)} rows",
          flush=True)
top = sorted(map(tuple, rows), key=lambda r: -r[1])[:3]
print("top components:", top, flush=True)
