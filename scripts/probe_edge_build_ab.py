#!/usr/bin/env python3
"""Round-8 optimization probe: A/B the shared repeat-trade EDGE BUILD
(the residual wall of every iterative graph query — 376 s of the 457 s
sf100 connected-components run is this one build, BASELINE.md r8).

Variants (all must produce IDENTICAL (a, b, n) rows — checked first at
the probe SF by full sorted comparison):

  V0 current    join(li, o) -> groupBy(a,b).agg(countDistinct(okey))
  V1 shj        V0 with a SHUFFLE_HASH hint on the orders side (kills
                both SMJ sorts; guide §3.1)
  V2 prededup   repartition(okey) -> dropDuplicates(okey, skey) ->
                SHJ join -> groupBy(a,b).COUNT() — okey determines
                custkey, so distinct (okey,skey) triples make the
                countDistinct a plain map-side-combinable count
                (guide §2.3 "aggregate before you shuffle" + §2.4
                exchange reuse: the dedup aggregate AND the join both
                reuse the single hash(okey) exchange)
  V3 setagg     groupBy(okey).agg(collect_set(skey)) -> SHJ join ->
                explode -> groupBy(a,b).count() — dedup packs the
                shuffle payload into per-order sets

The round-7 A/B rejected naive dedup-first (dropDuplicates keyed on
BOTH columns = an extra full exchange of lineitem). V2 avoids exactly
that: HashPartitioning(okey) satisfies ClusteredDistribution
([okey, skey]) for the dedup AND the join's requirement, so lineitem
is exchanged ONCE.

Usage: python scripts/probe_edge_build_ab.py /tmp/sf5 [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF = sys.argv[1]
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

from pyspark.sql import functions as F  # noqa: E402

from plc_data_etl_pipeline_spark.catalog import load  # noqa: E402
from plc_data_etl_pipeline_spark.session import get_spark  # noqa: E402

spark = get_spark("edge-build-ab", master="local[32]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")

A = (F.col("o_custkey") * 2).alias("a")
B = (F.col("l_suppkey") * 2 + 1).alias("b")
MIN_SUPPORT = 3


def v0_current():
    o = load(spark, SF, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, SF, "lineitem").select("l_orderkey", "l_suppkey")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    return (
        j.groupBy(A, B)
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .filter(F.col("n") >= MIN_SUPPORT)
    )


def v1_shj():
    o = load(spark, SF, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, SF, "lineitem").select("l_orderkey", "l_suppkey")
    j = li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
    return (
        j.groupBy(A, B)
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .filter(F.col("n") >= MIN_SUPPORT)
    )


def v2_prededup():
    o = load(spark, SF, "orders").select("o_orderkey", "o_custkey")
    li = (
        load(spark, SF, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .repartition(F.col("l_orderkey"))
        .dropDuplicates(["l_orderkey", "l_suppkey"])
    )
    j = li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
    return (
        j.groupBy(A, B)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= MIN_SUPPORT)
    )


def v3_setagg():
    o = load(spark, SF, "orders").select("o_orderkey", "o_custkey")
    li = (
        load(spark, SF, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.collect_set("l_suppkey").alias("sks"))
    )
    j = li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
    return (
        j.select(F.col("o_custkey"), F.explode("sks").alias("l_suppkey"))
        .groupBy(A, B)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= MIN_SUPPORT)
    )


VARIANTS = {
    "v0_current": v0_current,
    "v1_shj": v1_shj,
    "v2_prededup": v2_prededup,
    "v3_setagg": v3_setagg,
}


def main() -> None:
    # Equivalence gate: all variants bit-identical on the probe SF.
    base = None
    for name, fn in VARIANTS.items():
        rows = sorted(map(tuple, fn().collect()))
        if base is None:
            base = rows
            print(f"{name}: {len(rows)} rows (reference)", flush=True)
        else:
            ok = rows == base
            print(f"{name}: {len(rows)} rows, identical={ok}", flush=True)
            if not ok:
                raise SystemExit(f"{name} DIVERGES — variant rejected")

    # Interleaved timed reps to the noop sink (fresh frame per rep).
    for rep in range(REPS):
        for name, fn in VARIANTS.items():
            spark.sparkContext.setJobDescription(f"edge-build {name} rep{rep}")
            df = fn()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            print(
                f"rep{rep} {name}: {time.perf_counter() - t0:.1f} s",
                flush=True,
            )
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
