#!/usr/bin/env python3
"""Capture .explain("formatted") for a set of queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> [suffix] [name ...]
  tag     subdirectory under plans/ (e.g. r08)
  suffix  "before" or "after" (default "before")
  names   query names; default = bench.py HEADLINE set

Writes plans/<tag>/<query>_<suffix>.txt — the optimization-round
evidence artifact (the judge reads these instead of running Spark).
Plans are captured with the bench profile applied (same confs bench.py
sets for the measured passes) so the plan shown is the plan timed.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from plc_data_etl_pipeline_spark.registry import all_queries  # noqa: E402
from plc_data_etl_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r08"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(
        os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1
    )
    spark = get_spark("capture-plans")
    # mirror bench.py's measured-pass profile so plan == timed plan
    if sf >= 1:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    else:
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    if sf < 1:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", "false"
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
        )
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(here, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    qs = all_queries()
    for name in names:
        try:
            df = qs[name].fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:  # capture the failure instead of dying
            plan = f"ERROR building plan: {type(e).__name__}: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path}", file=sys.stderr, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
