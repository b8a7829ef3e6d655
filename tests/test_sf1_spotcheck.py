"""Oracle spot-checks at sf1 (10x key-offset replica of sf0.1, built by
scripts/make_sf1.py): correctness is not just an sf0.01 property — the
exact-integer determinism conventions and the two-level aggregation
rewrites must hold at 6M lineitem / 1M events too (overflow envelopes,
regrouped-sum associativity, NULL-group handling at volume).
"""

from __future__ import annotations

import os

import duckdb
import pytest

from plc_data_etl_pipeline_spark.registry import all_queries

from .oracle_compare import compare

SF1_DIR = "/tmp/sf1"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# One per family that has a distinct failure mode at volume: the
# two-level flagship (regrouped integer sums), the Q1 pricing summary
# (scaled-integer envelope), a fact-fact join (key-offset FK integrity),
# a window frame (per-partition ordering), and exact dedup (the 90%-dup
# replica corpus collapses 10:1).
SPOT = [
    "sensor_rollup_daily",
    "agg_basic",
    "join_inner",
    "win_moving_avg",
    "dedup_exact",
    # round-3 additions: the exact-integer algebraic rewrites whose
    # overflow envelopes are row-count-dependent, and a gaps-and-islands
    # window over the 10x event stream.
    "agg_regression_trend",
    "dq_anomaly_seasonal",
    "win_islands_consecutive",
    # closing round-3 additions: corpus-frequency boilerplate removal
    # (the dup-heavy replica makes EVERY chunk common — the threshold
    # semantics must survive that regime exactly) and the shard
    # manifest's order-insensitive digest (parallelism-independence is
    # the whole point; 10x the docs = 10x the shards).
    "dedup_common_chunks",
    "pack_shard_manifest",
    # the composed ingest pipeline (its survivor election only fires on
    # the dup-heavy replica corpus — sf0.01 is dup-free) and the ES
    # weighted sampler (top-k boundary stability across 10x the rows).
    "pipeline_web_ingest",
    "sample_weighted_topk",
    # round-5 closing additions: the integer-moment ACF (its BIGINT
    # y*y sums are the row-count-dependent envelope), bounded LPA over
    # the 10x repeat-trade graph (support thresholds shift with
    # replication), the skyline (tie structure multiplies 10:1 under
    # key-offset replicas), and the IVM scenario's delta commits
    # against a 10x base.
    "ts_autocorr",
    "graph_label_propagation",
    "curation_pareto_frontier",
    "sink_incremental_join",
    # round-6 additions: fixpoint components over the 10x graph (the
    # convergence/stopping rule must agree with the recursive closure
    # at replica scale, not just sf0.01), partition-pruned maintenance
    # against a 10x month-clustered view, RESTORE over 10x rewrite
    # garbage, and the SCD2 point-in-time join (range-residual
    # correctness across 10x the fact rows).
    "graph_components_fixpoint",
    "sink_partitioned_maintenance",
    "sink_txn_restore",
    "scd2_pointintime_join",
    # round-6 closing batch: the exact-integer STL windows at 10x the
    # hourly buckets, the FD census over 10x groups, the outer interval
    # join's null-row set at 10x density, and BFS against the recursive
    # closure on the 10x replica graph.
    "ts_stl_decompose",
    "dq_functional_dependency",
    "stream_join_interval_outer",
    "graph_bfs_hops",
    # hub-cap projection at 10x degrees (the cap semantics must bound
    # the pair blowup identically in both engines at replica scale)
    "graph_bipartite_projection",
    # round-7 additions: UniMax waterfilling (the cap/level boundary
    # moves with 10x the corpus tokens), weighted SSSP against the
    # recursive weighted closure on the replica graph, and the bottom-k
    # quantile sample (hash-priority boundary stability across 10x the
    # events — a different 256-sample, same deterministic selection).
    "sample_unimax_budget",
    "graph_sssp_weighted",
    "stream_quantile_bottomk",
]


@pytest.fixture(scope="module")
def sf1_dir():
    from scripts.make_sf1 import is_ready, make

    if not is_ready(SF1_DIR, 10):
        make("/root/testdata/sf0.1", SF1_DIR, 10)
    return SF1_DIR


@pytest.mark.parametrize("name", SPOT)
def test_sf1_oracle(name, spark, sf1_dir):
    qd = all_queries()[name]
    sdf = qd.fn(spark, sf1_dir)
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf1_dir}/{t}.parquet')"
            )
        rel = con.sql(qd.oracle)
        problems = compare(
            list(sdf.columns),
            srows,
            [d[0] for d in rel.description],
            rel.fetchall(),
        )
    finally:
        con.close()
    assert not problems, (
        f"query {name!r} diverges at sf1:\n" + "\n".join(problems)
    )
