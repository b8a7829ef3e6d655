#!/usr/bin/env python3
"""Full-registry timing sweep (round-8 VERDICT item 4: bench-floor
honesty at the registry tail).

BENCH (bench.py) covers 20 headline queries; regressions in the other
250+ registered queries were invisible round-over-round. This sweep runs
EVERY registry entry ONCE at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], measuring each to the
noop sink (same honest-execution rationale as bench.py: a fresh
WriteToDataSourceV2 per save, so Catalyst re-optimizes and every shuffle
re-executes), and writes BENCH_FULL.json:

  {"sf": 0.1, "cpus": N, "total_wall": S,
   "queries": {name: sec, ...}, "slowest": [[name, sec], ...]}

One pass, no warm tricks: a single throwaway two-shuffle warmup absorbs
JVM/codegen startup (otherwise the first query measured pays ~2 s of
one-time cost and the table lies), then each query runs exactly once.
Single-pass walls at sub-second scale carry the documented ±15% jitter —
this artifact is for spotting ORDER-OF-MAGNITUDE outliers and
round-over-round drifts in the tail, not sub-100ms deltas.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from plc_data_etl_pipeline_spark.registry import all_queries  # noqa: E402
from plc_data_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-full", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # one-time JVM/codegen warmup (not a per-query warm run)
    spark.sql(
        "SELECT COUNT(DISTINCT id % 97) FROM RANGE(1000000) "
        "GROUP BY id % 13"
    ).write.format("noop").mode("overwrite").save()

    results: dict[str, float] = {}
    errors: dict[str, str] = {}
    t_all = time.perf_counter()
    for name, qd in all_queries().items():
        t0 = time.perf_counter()
        try:
            qd.fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            results[name] = round(time.perf_counter() - t0, 3)
        except Exception as e:  # keep sweeping; report at the end
            errors[name] = f"{type(e).__name__}: {e}"[:200]
        print(f"{name}: {results.get(name, 'ERROR')}", file=sys.stderr,
              flush=True)
    total = round(time.perf_counter() - t_all, 1)
    out = {
        "sf": 0.1 if "sf0.1" in sf_dir else sf_dir,
        "cpus": cpus,
        "total_wall": total,
        "n_queries": len(results),
        "queries": results,
        "slowest": sorted(
            results.items(), key=lambda kv: -kv[1]
        )[:10],
        "errors": errors,
    }
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH_FULL.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("sf", "cpus", "total_wall", "n_queries",
                       "slowest", "errors")}))


if __name__ == "__main__":
    main()
