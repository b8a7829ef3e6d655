#!/usr/bin/env python3
"""Round-8 continuation probe: A/B the ROUND MACHINERY of
operators/dedup.py::connected_components (the CC consumed by
dedup_cluster_survivors, curation_survivor_quality and
multimodal_phash_clusters — BENCH_FULL tails 4.4/6.6/4.6 s).

  V0 current   per round: edge⋈label join + MIN agg, then a LEFT join
               back to the old labels (least/coalesce), EAGER
               localCheckpoint, then a labels⋈labels 'changed' count —
               2.5 joins + 2 actions per round.
  V1 selfloop  the operators/graph.py fixpoint shape: self-loop edges
               carry each node's own label through the ONE edge⋈label
               join per round; convergence by the monotone decimal
               label-sum certificate (one scalar agg on the lazily
               checkpointed round output = the materializing action) —
               1 join + 1 action per round. Labels only ever DECREASE
               (MIN over self + neighbors), so sum equality across a
               round proves the round was a no-op: identical stopping
               behavior to V0's changed==0 by construction.

Both variants must produce IDENTICAL (node, cluster_id) sets — checked
by full sorted comparison before timing. Inputs: the REAL pair streams
of the three consumers at the probe SF (phash near-dup pairs and the
5-gram Jaccard pairs), materialized to parquet first so the probe
times CC rounds, not pair generation.

Usage: python scripts/probe_cc_rounds_ab.py /tmp/sf5 [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf5"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")

from pyspark.sql import DataFrame, functions as F  # noqa: E402
from pyspark.storagelevel import StorageLevel  # noqa: E402

from plc_data_etl_pipeline_spark.catalog import (  # noqa: E402
    load,
    release_local_checkpoint,
    shuffle_partitions,
)
from plc_data_etl_pipeline_spark.session import get_spark  # noqa: E402

spark = get_spark("cc-rounds-ab", master="local[32]", shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext


def v0_current(pairs: DataFrame, max_iters: int = 25) -> DataFrame:
    """Verbatim copy of the pre-change operator (dedup.py @ b5e7873)."""
    edges_fwd = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    n_shuffle = shuffle_partitions(pairs.sparkSession)
    edges = (
        edges_fwd.unionByName(
            pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
        )
        .repartition(n_shuffle, "src")
        .dropDuplicates()
        .localCheckpoint(storageLevel=StorageLevel.DISK_ONLY)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels.hint("shuffle_hash"), edges.src == labels.node)
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.dst, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        release_local_checkpoint(labels)
        labels = new_labels
        if changed == 0:
            break
    out = labels.select(F.col("node"), F.col("label").alias("cluster_id"))
    out._state = (edges, labels)
    return out


def v1_selfloop(pairs: DataFrame, max_iters: int = 25) -> DataFrame:
    """Candidate: self-loop single-join rounds + decimal-sum certificate.

    Both directions AND self-loops come from ONE reference to ``pairs``
    (array+explode): Spark has no common-subexpression reuse across
    union branches, so the union(fwd, rev) form computes the (usually
    expensive, un-materialized) upstream pair pipeline twice, and a
    selfloops-from-base.distinct() draft computed it FOUR times —
    measured 2x slower end-to-end at sf0.1 despite the cheaper rounds."""
    a, b = F.col("id_a"), F.col("id_b")
    edge_structs = F.array(
        F.struct(a.alias("src"), b.alias("dst")),
        F.struct(b.alias("src"), a.alias("dst")),
        F.struct(a.alias("src"), a.alias("dst")),
        F.struct(b.alias("src"), b.alias("dst")),
    )
    n_shuffle = shuffle_partitions(pairs.sparkSession)
    edges = (
        pairs.select(F.explode(edge_structs).alias("e"))
        .select("e.src", "e.dst")
        .repartition(n_shuffle, "src")
        .dropDuplicates()
        .localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )

    def lbl_sum(df):
        return df.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]

    prev_sum = lbl_sum(labels)  # materializes the edge checkpoint
    ckpt = None
    for _ in range(max_iters):
        labels = (
            edges.join(labels.hint("shuffle_hash"), edges.src == labels.node)
            .select(F.col("dst").alias("node"), "label")
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        new_ckpt = labels.localCheckpoint(eager=False)
        s = lbl_sum(new_ckpt)
        if ckpt is not None:
            release_local_checkpoint(ckpt)
        ckpt = new_ckpt
        labels = new_ckpt
        if s == prev_sum:
            break
        prev_sum = s
    out = labels.select(F.col("node"), F.col("label").alias("cluster_id"))
    out._state = (edges, labels)
    return out


def release(df):
    for c in getattr(df, "_state", ()):
        release_local_checkpoint(c)


# ---- pair inputs: the real consumers' candidate streams -------------------
pair_dir = "/tmp/cc_ab_pairs"
if not os.path.isdir(pair_dir + "/phash"):
    from plc_data_etl_pipeline_spark.operators import multimodal as MM

    docs = load(spark, SF, "documents")
    media = MM.synthesize_media(docs)
    hashes = MM.phash_media(media)
    MM.phash_near_dup_pairs(hashes, max_hamming=3).select(
        F.col("media_a").alias("id_a"), F.col("media_b").alias("id_b")
    ).write.mode("overwrite").parquet(pair_dir + "/phash")
    # the curation 5-gram pairs are bounded (doc_id < 150) — too small to
    # probe; scale CC input instead with the minhash near-dup pairs
    from plc_data_etl_pipeline_spark.operators import dedup as D

    p = D.minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.5)
    p.select("id_a", "id_b").write.mode("overwrite").parquet(
        pair_dir + "/minhash"
    )

for name in ("phash", "minhash"):
    pairs = spark.read.parquet(f"{pair_dir}/{name}")
    n = pairs.count()
    # equivalence first
    a = v0_current(pairs)
    rows_a = sorted(map(tuple, a.collect()))
    release(a)
    b = v1_selfloop(pairs)
    rows_b = sorted(map(tuple, b.collect()))
    release(b)
    assert rows_a == rows_b, f"{name}: DIVERGENT output"
    print(f"{name}: {n} pairs, {len(rows_a)} labeled nodes, outputs identical",
          flush=True)
    for rep in range(REPS):
        for label, fn in (("v0_current", v0_current), ("v1_selfloop", v1_selfloop)):
            sc.setJobDescription(f"cc-ab {name} {label} rep{rep}")
            t0 = time.perf_counter()
            out = fn(pairs)
            nn = out.count()
            dt = time.perf_counter() - t0
            release(out)
            print(f"  {name} {label} rep{rep}: {dt:6.2f} s  ({nn} nodes)",
                  flush=True)
sc.setJobDescription(None)
