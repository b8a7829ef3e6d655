#!/usr/bin/env python3
"""Round-8 continuation probe: A/B the shared-group barrier in
fingerprint_near_pairs / simhash_near_pairs (consumed by dedup_simhash
and — through phash_near_dup_pairs — multimodal_phash_clusters).

  V0 old   no barrier: the exact-first grouped frame feeds FOUR
           consumers in fingerprint_near_pairs (stars, block subtree,
           both verify sides) and TWO in simhash_near_pairs (text
           stars, fingerprint pipeline). Catalyst has no common-
           subexpression reuse across branches and the consumers prune
           different columns (ReuseExchange never fires), so every
           action re-derives the upstream fingerprint pipeline (63-SUM
           SimHash aggregation / mapInPandas pHash) once per branch.
  V1 new   lazy localCheckpoint on each grouped frame (the
           minhash_dedup_pairs pattern): one materialization shared by
           all branches of the same action, registered as round state.

Outputs must be identical (full sorted comparison) before timing.
Interleaved fresh-frame walls; round state released per rep.

Usage: python scripts/probe_fp_group_ckpt_ab.py [sf_dir] [reps]
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
from plc_data_etl_pipeline_spark.operators import multimodal as MM  # noqa: E402
from plc_data_etl_pipeline_spark.operators.dedup import (  # noqa: E402
    _exact_first_groups,
    fingerprint_near_pairs,
    hamming64,
    simhash,
    simhash_near_pairs,
    star_pairs_expr,
    suffix_pairs_expr,
)
from plc_data_etl_pipeline_spark.operators.graph import (  # noqa: E402
    release_round_state,
)
from plc_data_etl_pipeline_spark.session import get_spark  # noqa: E402

spark = get_spark("fp-group-ckpt-ab", master="local[32]",
                  shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")


def _fp_near_pairs_v0(fps, id_col, fp_col, max_bits, max_bucket_size=512):
    """Verbatim copy of pre-change fingerprint_near_pairs (no barrier)."""
    fps = fps.select(F.col(id_col), F.col(fp_col).alias("simhash"))
    g = _exact_first_groups(fps, id_col, "simhash")
    exact_stars = (
        g.filter(F.size("ids") >= 2)
        .select(F.explode(star_pairs_expr()).alias("p"))
        .select("p.id_a", "p.id_b", F.lit(0).alias("hamming"))
    )
    reps = g.select(F.element_at("ids", 1).alias(id_col), F.col("simhash"))
    block_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("block"),
                F.shiftrightunsigned(F.col("simhash"), i * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("key"),
            )
            for i in range(4)
        ]
    )
    blocks = reps.select(
        F.col(id_col), F.explode(block_structs).alias("bk")
    ).select(
        F.col(id_col),
        F.col("bk.block").alias("block"),
        F.col("bk.key").alias("key"),
    )
    grouped = (
        blocks.groupBy("block", "key")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    pair_arr = F.when(
        F.size("ids") <= max_bucket_size, suffix_pairs_expr()
    ).otherwise(star_pairs_expr())
    cands = (
        grouped.select(F.explode(pair_arr).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    fa = reps.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("fp_a"))
    fb = reps.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("fp_b"))
    near = (
        cands.join(fa, "id_a")
        .join(fb, "id_b")
        .withColumn("hamming", hamming64(F.col("fp_a"), F.col("fp_b")))
        .filter(F.col("hamming") <= max_bits)
        .select("id_a", "id_b", "hamming")
    )
    return near.unionByName(exact_stars)


def simhash_v0():
    d = load(spark, SF, "documents")
    g = _exact_first_groups(d, "doc_id", "text")
    text_stars = (
        g.filter(F.size("ids") >= 2)
        .select(F.explode(star_pairs_expr()).alias("p"))
        .select("p.id_a", "p.id_b", F.lit(0).alias("hamming"))
    )
    reps = g.select(F.element_at("ids", 1).alias("doc_id"), F.col("text"))
    fps = simhash(reps, "doc_id", "text")
    near = _fp_near_pairs_v0(fps, "doc_id", "simhash", max_bits=3)
    return near.unionByName(text_stars)


def simhash_v1():
    d = load(spark, SF, "documents")
    return simhash_near_pairs(d, "doc_id", "text", max_bits=3)


def _phash_hashes():
    docs = load(spark, SF, "documents")
    return MM.phash_media(MM.synthesize_media(docs))


def phash_v0():
    return _fp_near_pairs_v0(
        _phash_hashes(), "media_id", "phash", max_bits=3
    )


def phash_v1():
    return fingerprint_near_pairs(
        _phash_hashes(), "media_id", "phash", max_bits=3
    )


CASES = {
    "dedup_simhash": ("simhash", simhash_v0, simhash_v1),
    "phash_pairs": ("phash", phash_v0, phash_v1),
}


def main() -> None:
    for case, (_, v0, v1) in CASES.items():
        r0 = sorted(tuple(r) for r in v0().collect())
        f1 = v1()
        r1 = sorted(tuple(r) for r in f1.collect())
        release_round_state(f1)
        assert r0 == r1, f"{case}: VARIANTS DIVERGE — do not time"
        print(f"{case}: outputs identical ({len(r0)} pairs)", flush=True)
    for case, (_, v0, v1) in CASES.items():
        walls = {"v0_nobarrier": [], "v1_ckpt": []}
        for rep in range(REPS):
            for name, fn in (("v0_nobarrier", v0), ("v1_ckpt", v1)):
                spark.sparkContext.setJobDescription(f"{case} {name} rep{rep}")
                t0 = time.monotonic()
                f = fn()
                f.write.format("noop").mode("overwrite").save()
                walls[name].append(time.monotonic() - t0)
                release_round_state(f)
        for name, ws in walls.items():
            body = ", ".join(f"{w:.2f}" for w in ws)
            print(f"{case} {name}: min {min(ws):.2f} s  walls [{body}]",
                  flush=True)


if __name__ == "__main__":
    main()
