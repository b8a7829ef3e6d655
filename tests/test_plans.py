"""Physical-plan audits: lock in the 100 TB scale posture
(SURVEY §7.3 "100 TB posture"; BASELINE.md "Interpretation" §2).

These tests assert the *shape* of the plans Catalyst produces — filter/
projection pushdown into the parquet scan, broadcast joins for dims,
partial aggregation, top-k without global sort — so a future edit that
silently regresses one of them (e.g. a UDF blocking pushdown, a join
losing its broadcast) fails CI, not the cluster."""

from __future__ import annotations

import contextlib
import io

import pytest

from plc_data_etl_pipeline_spark.registry import all_queries

from .conftest import SF_DIR

_Q = all_queries()


def plan_of(df, mode: str = "formatted") -> str:
    """Capture df.explain(mode) output — the one place the capture
    mechanism lives (review finding: it was copy-pasted four times)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def plan(spark, name: str, mode: str = "formatted") -> str:
    return plan_of(_Q[name].fn(spark, SF_DIR), mode)


def test_filter_and_projection_pushdown(spark):
    p = plan(spark, "project_filter")
    assert "PushedFilters:" in p
    assert "l_returnflag" in p.split("PushedFilters:")[1].split("\n")[0], (
        "filter not pushed into parquet scan"
    )
    # column pruning: ReadSchema must not include unprojected columns
    read_schema = p.split("ReadSchema:")[1].split("\n")[0]
    assert "l_tax" not in read_schema and "l_shipdate" not in read_schema


def test_dim_joins_broadcast(spark):
    p = plan(spark, "join_multiway")
    assert p.count("BroadcastHashJoin") >= 3, "dimension joins must broadcast"
    assert "CartesianProduct" not in p


def test_semi_anti_join_physical(spark):
    assert "LeftSemi" in plan(spark, "join_semi")
    assert "LeftAnti" in plan(spark, "join_anti")


def test_partial_aggregation(spark):
    p = plan(spark, "agg_basic")
    # two HashAggregate nodes = map-side partial + final (reduce) agg
    assert p.count("HashAggregate") >= 2, "no map-side partial aggregation"


def test_global_topk_avoids_full_sort(spark):
    p = plan(spark, "sort_limit")
    assert "TakeOrderedAndProject" in p, "global top-k should not global-sort"


def test_per_group_topk_uses_group_limit(spark):
    p = plan(spark, "topk_per_group")
    assert "WindowGroupLimit" in p, "rank filter should push a group limit"


def test_whole_stage_codegen_active(spark):
    p = plan(spark, "scalar_math")
    # formatted mode marks codegen stages with a leading '*'
    assert "* Project" in p, "expression pipeline fell out of codegen"


def test_no_python_udf_in_relational_paths(spark):
    """Every relational/stream query stays JVM-side (UDFs only in the
    explicitly-Python queries: pandas UDF demo, avro codec, multimodal)."""
    python_ok = {
        "udf_pandas_scalar",
        "udtf_bigrams_lateral",
        "plc_avro_roundtrip",
        "multimodal_decode",
        "sim_topk_pq",  # Arrow-vectorized PQ encode (deliberate: one
        #   numpy matmul/batch beats m*n_codes interpreted HOF folds)
        "sim_topk_ivf",  # same: Arrow-vectorized IVF cell assignment
        "sim_topk_ivf_indexed",  # (ivf_assign_arrow — one matmul/batch
        "dedup_semantic",  # vs n_cells interpreted HOF folds per row)
        "cluster_kmeans",  # same Arrow assignment kernel per Lloyd round
        #   (deterministic when the earlier kmeans persist is cold)
        "sql_registered_udf",  # the POINT of the query: a pandas UDF
        #   registered into the SQL catalog and dispatched from SQL text
        "text_bpe_encode",  # greedy merge application is inherently
        #   sequential per word — deliberate Arrow-batched Python
    }
    for name in _Q:
        if name in python_ok:
            continue
        p = plan(spark, name, mode="simple")
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p, (
            f"{name} unexpectedly executes Python"
        )


def test_similarity_arrow_scan_posture(spark):
    """cosine_topk (Arrow path) scans the corpus once through a single
    MapInPandas with no join and no shuffle below the top-k window; the
    fold twin keeps the all-JVM broadcast-join shape."""
    p = plan(spark, "sim_topk")
    assert "MapInPandas" in p
    assert "Join" not in p  # queries ride in the closure, not a join
    from plc_data_etl_pipeline_spark.catalog import load
    from plc_data_etl_pipeline_spark.operators import similarity as S

    emb = load(spark, SF_DIR, "embeddings")
    pf = plan_of(S.cosine_topk_fold(emb, query_max_id=20, k=5))
    assert "BroadcastNestedLoopJoin" in pf or "BroadcastHashJoin" in pf


def test_pq_rerank_broadcasts_candidates_not_corpus(spark):
    """sim_topk_pq's exact re-rank must BUILD on the bounded candidate
    set (Q * rerank_factor * k rows), never on the raw-vector corpus:
    unhinted, the planner's size estimate broadcast the WHOLE raw
    corpus at test SF and would shuffle it by neighbor_id past the
    broadcast threshold — re-moving exactly the heavy payload the
    8-byte PQ codes exist to avoid (round-8; guide §8). The candidates
    subtree is the one holding the ADC Window, so the rerank join must
    be BuildLeft."""
    p = plan(spark, "sim_topk_pq")
    assert "BroadcastHashJoin Inner BuildLeft" in p, p.split("\n\n")[0]
    assert "BroadcastHashJoin Inner BuildRight" not in p, (
        "rerank join builds on the raw-vector corpus side"
    )


def _n_exchanges(spark, name: str) -> int:
    """Shuffle exchanges only — BroadcastExchange is the cheap kind we
    WANT and must not count against the budget."""
    p = plan(spark, name, mode="simple")
    return p.count("Exchange") - p.count("BroadcastExchange")


def test_shuffle_budgets(spark):
    """Explicit shuffle budgets for representative queries — a regression
    that adds an Exchange (lost broadcast, extra repartition) fails here
    before it ships. Budgets are ceilings, not exact counts (AQE may
    remove some at runtime)."""
    budgets = {
        "project_filter": 0,     # pure scan+filter: no shuffle at all
        "agg_basic": 1,          # one shuffle to the final agg
        "dedup_exact": 1,        # one shuffle on content hash
        "topk_per_group": 1,     # one shuffle to the window key
        "win_moving_avg": 1,
        "stream_tumbling": 1,
        "join_multiway": 1,      # all joins broadcast (orders: semi on
                                 # pruned PK) -> only the final agg shuffles
        "sim_topk": 1,           # Arrow corpus scan + window topk
        "ts_autocorr": 1,        # lag windows + moment agg share one
                                 # series-key exchange
        "dq_l_diversity": 3,     # class key + distinct expand + re-agg
        "ts_periodogram": 2,     # (series, hod) cells + per-series fold
        "curation_pareto_frontier": 2,  # lang window + (lang, len) peer max
    }
    over = {}
    for name, budget in budgets.items():
        n = _n_exchanges(spark, name)
        if n > budget:
            over[name] = (n, budget)
    assert not over, f"shuffle budget exceeded: {over}"


def test_tfidf_plan_prunes_and_broadcasts(spark):
    """TF-IDF reads only (doc_id, text) from the scan, broadcasts the
    single-row corpus count, and keeps partial aggregation for tf."""
    p = plan(spark, "text_tfidf")
    read_schema = p.split("ReadSchema:")[1].split("\n")[0]
    assert "lang" not in read_schema and "source" not in read_schema
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p
    assert p.count("HashAggregate") >= 2


def test_pack_sequences_has_no_global_window(spark):
    """The packing cumsum must be partitioned: the only unpartitioned
    window may run over the per-partition totals (num_partitions rows),
    never the data rows — i.e. at most one SinglePartition exchange,
    fed by an aggregate, not a scan."""
    p = plan(spark, "pack_sequences")
    assert p.count("SinglePartition") <= 1
    # the data-row window is partitioned by __pid
    assert "partitionBy=[__pid" in p.replace(" ", "") or "__pid" in p


def test_chunk_windows_single_scan_no_shuffle(spark):
    """Chunking is scan -> generate -> project: no exchange at all."""
    p = plan(spark, "text_chunk_windows")
    assert "Exchange" not in p, "chunking must not shuffle"
    read_schema = p.split("ReadSchema:")[1].split("\n")[0]
    assert "lang" not in read_schema


def test_cluster_survivors_no_cartesian_on_cc(spark):
    """Label propagation joins stay equi-joins (no cartesian blowup);
    the pair generation's theta join is the only nested-loop site and is
    bounded by the id filter. Audits the LAZY builder — the registered
    wrapper materializes-and-releases, returning a local relation."""
    from plc_data_etl_pipeline_spark.queries.extensions import (
        _cluster_survivors_lazy,
    )

    p = plan_of(_cluster_survivors_lazy(spark, SF_DIR))
    assert "CartesianProduct" not in p


def test_sample_hash_filter_fuses_into_scan_stage(spark):
    """Hash sampling is a pure filter — one stage, no exchange."""
    p = plan(spark, "sample_hash_stratified")
    assert "Exchange" not in p


def test_decontaminate_broadcasts_eval_grams(spark):
    """The eval-gram set (tiny next to the corpus) must reach the
    training side as a broadcast hash join — a shuffled join here would
    move the whole exploded corpus at 100 TB."""
    p = plan(spark, "text_decontaminate")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_repetition_two_level_agg_budget(spark):
    """Repetition stats aggregate word counts in two keyed levels
    ((doc, word) then (doc)) — two shuffles, both partial-aggregated
    map-side; anything more means a lost combine."""
    p = plan(spark, "text_repetition", mode="simple")
    n = p.count("Exchange") - p.count("BroadcastExchange")
    assert n <= 2, f"expected <=2 shuffles, got {n}"
    assert "partial_count" in p or "partial_sum" in p or "HashAggregate" in p


def test_mixture_resample_is_single_pass(spark):
    """Mixture resampling is scan -> case/bucket -> filter -> explode:
    a narrow per-row pipeline with NO exchange (the fan-out happens
    in place, co-partitioned with the scan)."""
    p = plan(spark, "sample_mixture_weights")
    assert "Exchange" not in p


def test_asof_aggregates_instead_of_window_sort(spark):
    """The as-of top-1 is a max(struct) aggregate, not a row_number()
    window: partial aggregation collapses candidate sets map-side
    BEFORE the shuffle, and no per-partition sort is needed."""
    p = plan(spark, "join_asof")
    assert "Window" not in p
    assert "partial_max" in p or "HashAggregate" in p or "SortAggregate" in p


def test_ntile_single_shuffle(spark):
    p = plan(spark, "win_ntile_cume", mode="simple")
    n = p.count("Exchange") - p.count("BroadcastExchange")
    assert n <= 1


def test_ohlc_single_agg_pass_no_window(spark):
    """min_by/max_by pick open/close inside the hash aggregate — the plan
    must be partial+final HashAggregate with NO window and NO sort."""
    p = plan(spark, "ts_downsample_ohlc")
    assert p.count("HashAggregate") >= 2, "OHLC must partial-aggregate"
    assert "Window" not in p, "open/close must not fall back to a window"


def test_incremental_dedup_digest_join_budget(spark):
    """Anti-join keys on the 32-byte digest. At small SF the corpus side
    broadcasts (zero join shuffle: only the survivor window exchanges);
    at large SF it shuffle-anti-joins and the window reuses that
    partitioning. Either way: <=2 hash exchanges, top-1 survivor runs
    through WindowGroupLimit (partial group-limit before the shuffle)."""
    p = plan(spark, "dedup_incremental")
    assert "LeftAnti" in p
    assert p.count("Arguments: hashpartitioning") <= 2, p
    assert "WindowGroupLimit" in p, "row_number()=1 must partial-limit"


def test_shipping_priority_topk_and_joins(spark):
    """Q3 shape: final top-10 must be TakeOrderedAndProject (no global
    sort materialization), and no cartesian anywhere."""
    p = plan(spark, "join_shipping_priority")
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p
    assert p.count("HashAggregate") >= 2  # partial + final revenue agg


def test_exists_subqueries_rewrite_to_semi_anti(spark):
    """Correlated EXISTS / NOT EXISTS must decorrelate to one semi and
    one anti join — never a per-row subquery or a cartesian."""
    p = plan(spark, "subquery_exists")
    assert "LeftSemi" in p
    assert "LeftAnti" in p
    assert "CartesianProduct" not in p


def test_outlier_mad_broadcasts_stats_back(spark):
    """The per-type median/MAD stats (|event_type| rows) must broadcast
    onto the fact table — the fact never re-shuffles on a new key."""
    p = plan(spark, "dq_outlier_mad")
    assert p.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in p


def test_salted_join_no_extra_shuffle_of_salt(spark):
    """Salted join: the replicated small side must not produce a
    cartesian; the join itself is a plain equi-join on (key, salt)."""
    p = plan(spark, "join_salted_skew")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_emb_norm_stats_stays_jvm(spark):
    """L2-norm audit must be pure JVM HOFs: no Python evaluation in the
    plan (the fold runs inside codegen, not a UDF)."""
    p = plan(spark, "emb_norm_stats")
    assert "BatchEvalPython" not in p
    assert "ArrowEvalPython" not in p
    assert p.count("HashAggregate") >= 2


def test_shuffle_hash_hint_respected(spark):
    p = plan(spark, "join_shuffle_hash")
    assert "ShuffledHashJoin" in p
    assert "SortMergeJoin" not in p


def test_semantic_dedup_cell_join_not_cartesian(spark):
    """SemDeDup candidate pairs must come from the cell equi-join."""
    p = plan(spark, "dedup_semantic")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_band_join_no_cartesian(spark):
    """The keyless time-band join must run as an equi-join on the cell
    id — never a nested-loop/cartesian over the two sides."""
    p = plan(spark, "join_band_time")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_q19_disjunction_pushes_common_ranges(spark):
    """Q19 shape: Catalyst must extract the common quantity range from
    the OR'd triples and push it into the lineitem scan, and the part
    side must broadcast — one fact pass, no shuffle."""
    p = plan(spark, "q19_disjunctive_revenue")
    assert "PushedFilters:" in p
    # any scan's pushed-filter list may print first; look across all
    pushed = [seg.split("\n")[0] for seg in p.split("PushedFilters:")[1:]]
    assert any("l_quantity" in s for s in pushed), (
        "common OR range not pushed to scan"
    )
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_q17_decorrelated_single_fact_agg(spark):
    """Q17 shape: the correlated avg-quantity subquery must decorrelate
    into a broadcast join-back, never a per-row subquery; both fact
    passes keep partial aggregation."""
    p = plan(spark, "q17_small_quantity_revenue")
    assert p.count("BroadcastHashJoin") >= 2  # part filter + avg join-back
    assert "CartesianProduct" not in p
    assert p.count("HashAggregate") >= 2


def test_q13_outer_join_count_two_level_agg(spark):
    """Q13 shape: outer join preserves zero-order customers and the two
    stacked aggs are both partial+final (4 HashAggregate nodes)."""
    p = plan(spark, "q13_order_count_distribution")
    assert p.count("HashAggregate") >= 4
    assert "CartesianProduct" not in p


def test_q18_having_agg_runs_before_joins(spark):
    """Q18 shape: the qty>300 HAVING must filter the grouped fact BEFORE
    the orders/customer joins (survivors then broadcast under AQE)."""
    p = plan(spark, "q18_large_orders")
    assert "sum_qty" in p
    assert "CartesianProduct" not in p
    assert p.count("HashAggregate") >= 2


def test_q15_scalar_max_broadcasts(spark):
    """Q15 shape: the 1-row max revenue and the supplier dim both
    broadcast — the rev view never re-shuffles for the threshold."""
    p = plan(spark, "q15_top_supplier")
    assert p.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in p


def test_q10_top20_no_global_sort(spark):
    """Q10 shape: the LIMIT 20 over exact-cents revenue must compile to
    TakeOrderedAndProject, not a full sort of the grouped result."""
    p = plan(spark, "q10_returned_revenue")
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p


def test_char_entropy_single_scan_no_shuffle(spark):
    """Entropy is per-row expression work: no aggregation, no exchange,
    no Python evaluation — one codegen'd projection over the scan."""
    p = plan(spark, "text_char_entropy")
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_length_trim_never_sorts_corpus(spark):
    """The exact percentile must come from the per-value count table —
    the document corpus itself is never globally sorted."""
    p = plan(spark, "text_length_trim")
    assert "TakeOrderedAndProject" not in p
    # the only Sort allowed is the tiny cumulative window over distinct
    # length values, which sits above a HashAggregate of n_chars; the
    # 1-row bounds frame may broadcast-nested-loop, but never cartesian
    assert "HashAggregate" in p
    assert "CartesianProduct" not in p


def test_emb_quantize_stays_jvm_no_explode(spark):
    """Quantization audit is pure JVM HOFs: no Python eval, no
    Generate/explode, no shuffle."""
    p = plan(spark, "emb_quantize_int8")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Generate" not in p
    assert "Exchange" not in p


def test_q6_all_predicates_pushed_no_join(spark):
    """Q6 shape: pure scan-and-sum — every predicate reaches the scan,
    no join operator anywhere in the plan."""
    p = plan(spark, "q6_forecast_revenue")
    assert "PushedFilters:" in p
    pushed = " ".join(seg.split("\n")[0] for seg in p.split("PushedFilters:")[1:])
    assert "l_shipdate" in pushed and "l_discount" in pushed
    assert "Join" not in p


def test_q4_exists_becomes_semi_join(spark):
    """Q4 shape: the correlated EXISTS with a non-equi correlate must be
    a single LeftSemi join (date comparison as residual), never a
    per-row subquery or cartesian."""
    p = plan(spark, "q4_order_priority")
    assert "LeftSemi" in p
    assert "CartesianProduct" not in p


def test_q9_dims_broadcast_single_fact_shuffle(spark):
    """Q9 shape: part/supplier/nation broadcast; the only big-big join
    is orders."""
    p = plan(spark, "q9_product_profit")
    assert p.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in p
    assert p.count("HashAggregate") >= 2


def test_q12_single_pass_conditional_counts(spark):
    """Q12 shape: both CASE counts come from ONE aggregation over the
    joined year slice — no second scan, partial+final agg."""
    # simple mode prints each node once (formatted repeats scans in the
    # details section)
    p = plan(spark, "q12_priority_class_by_segment", mode="simple")
    assert p.count("Scan parquet") <= 2
    assert p.count("HashAggregate") >= 2


def test_q7_supplier_nation_prunes_before_orders_join(spark):
    """Q7 shape: nation filters broadcast into the fact before the one
    big-big (orders) join; no cartesian from the two-nation disjunction."""
    p = plan(spark, "q7_nation_volume")
    assert p.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in p


def test_q8_share_single_aggregation(spark):
    """Q8 shape: numerator and denominator come from ONE aggregation
    pass (two conditional sums) over ONE fact scan — nation legitimately
    scans twice (supplier role + customer-region role)."""
    p = plan(spark, "q8_market_share", mode="simple")
    assert p.count("Scan parquet [l_orderkey") == 1, (
        "lineitem must scan exactly once"
    )
    assert p.count("HashAggregate") >= 2


def test_q16_not_in_is_broadcast_anti_join(spark):
    """Q16 shape: the NOT IN denylist must be a broadcast anti-join."""
    p = plan(spark, "q16_supplier_count_by_part")
    assert "LeftAnti" in p
    assert "CartesianProduct" not in p


def test_q22_scalar_threshold_broadcasts(spark):
    """Q22 shape: the 1-row average-balance threshold broadcasts (the
    only nested-loop site); the anti-join side is date-pruned."""
    p = plan(spark, "q22_idle_customers")
    assert "LeftAnti" in p
    assert "CartesianProduct" not in p


def test_sample_quality_bins_no_global_sort(spark):
    """The decile rank must come from the per-length cumulative table +
    a PARTITIONED window — never a single-partition sort of the corpus
    data rows (the only SinglePartition window runs over distinct
    lengths)."""
    p = plan(spark, "sample_quality_bins")
    assert "partitionBy=[n_chars" in p.replace(" ", "").replace('"', "") or (
        "n_chars" in p and "SinglePartition" in p
    )
    assert "TakeOrderedAndProject" not in p


def test_trade_pairs_edge_build_shuffled_hash_join(spark):
    """The shared repeat-trade edge build (the residual wall of every
    iterative graph query — 376 s of the 457 s sf100 CC run) must
    attach orders via a SHUFFLED-HASH join: unhinted it either
    BROADCASTS a fact-derived relation that grows with the data (a
    driver-built 7.5M-row hash relation at factor-50) or degrades to
    sort-merge past the threshold, whose two sorts dominated the sf100
    build. Round-8 probe scripts/probe_edge_build_ab.py, bit-identical
    output: 23.8/134.1 s -> 6.4/20.2 s at factor-50."""
    from plc_data_etl_pipeline_spark.queries.graph import _trade_pairs_build

    for ms in (None, 3):
        p = plan_of(_trade_pairs_build(spark, SF_DIR, ms))
        assert "SortMergeJoin" not in p, p
        assert "ShuffledHashJoin" in p, p


def test_pagerank_iterations_join_not_cartesian(spark):
    """Each PageRank round is an equi-join on the source key plus a
    partial-aggregated SUM per destination — never a cartesian, never a
    broadcast of the (arbitrarily large) rank relation at real scale is
    required for correctness (small inputs may still broadcast here).
    Audits the LAZY builder: the registered wrapper materializes and
    releases round state, so its returned frame is a local relation."""
    from plc_data_etl_pipeline_spark.queries.graph import _pagerank_lazy

    p = plan_of(_pagerank_lazy(spark, SF_DIR)[0])
    assert "CartesianProduct" not in p
    assert p.count("HashAggregate") >= 2  # map-side partials per round


def test_share_of_total_single_window_no_self_join(spark):
    """Percent-of-total must be ONE window over l_orderkey — not a
    groupBy total joined back (which would scan/shuffle twice)."""
    p = plan(spark, "win_share_of_total", mode="simple")
    assert "Window" in p
    assert "Join" not in p, "self-join detected; use a window"
    assert p.count("Exchange") <= 1


def test_rolling_outliers_single_window_pass(spark):
    """n/s/sq must come from ONE bounded-frame window pass (one shuffle
    on user_id), with the sigma test as a pure projection on top."""
    p = plan(spark, "dq_rolling_outliers", mode="simple")
    assert p.count("Window") == 1
    assert p.count("Exchange") <= 1
    assert "Join" not in p


def test_partitioned_sink_prunes_directories(spark):
    """The event_type predicate must be satisfied from the Hive layout
    (PartitionFilters on the scan) — not as a post-scan row filter over
    every directory."""
    p = plan(spark, "sink_partitioned_prune")
    pf = p.split("PartitionFilters:", 1)
    assert len(pf) == 2, "no PartitionFilters section in scan"
    assert "event_type" in pf[1].split("\n")[0]


def test_bucketed_join_no_shuffle(spark):
    """Both sides bucketed on the join key: the SortMergeJoin must
    consume the buckets directly — zero Exchange in the join subtree
    (the only Exchange belongs to the final rollup). The per-bucket
    Sort nodes remain: Spark >= 3.0 ignores bucket sort metadata at
    scan time by default (spark.sql.legacy.bucketedTableScan.
    outputOrdering) — the shuffle elimination is the property that
    matters at 100 TB; sorting already-sorted runs is a cheap local
    pass."""
    p = plan(spark, "join_bucketed_colocated", mode="simple")
    assert "SortMergeJoin" in p
    assert p.count("Exchange") <= 1
    join_part = p.split("SortMergeJoin", 1)[1]
    assert "Exchange" not in join_part, "bucket join shuffled a side"
    assert p.count("Bucketed: true") == 2 or "SelectedBucketsCount" in p


def test_filtered_agg_single_scan(spark):
    """All six FILTER/bool aggregates must evaluate in one
    hash-aggregate over one scan of orders — no per-condition self
    joins or unions."""
    p = plan(spark, "agg_filtered", mode="simple")
    n_scans = (
        p.count("Scan parquet")
        + p.count("Scan ExistingRDD")
        + p.count("InMemoryTableScan")
    )
    assert n_scans <= 1, f"orders scanned {n_scans}x; expected one pass"
    assert "Join" not in p
    assert p.count("HashAggregate") >= 2


def test_dynamic_partition_pruning_subquery(spark):
    """join_dynamic_partition_prune: the day-partitioned fact scan must
    carry a dynamicpruning PartitionFilter fed by the filtered dim —
    non-Sunday partition directories are skipped at runtime, not
    scanned and filtered."""
    p = plan(spark, "join_dynamic_partition_prune")
    assert "dynamicpruning" in p.lower(), (
        "expected a dynamic partition pruning subquery on the fact scan"
    )
    assert "PartitionFilters" in p


def test_event_funnel_single_exchange(spark):
    """The stacked-window funnel must shuffle the event log ONCE: all
    three step thresholds evaluate over the same user_id partitioning,
    and the per-user collapse is co-partitioned."""
    import re

    p = plan(spark, "event_funnel")
    # exactly two Exchange nodes: the user_id window partitioning and
    # the final single-row rollup (SinglePartition, tiny); one scan.
    assert len(re.findall(r"\bExchange \(\d+\)", p)) == 2, (
        "funnel must not re-shuffle per step"
    )
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 1


def test_sliding_distinct_no_raw_event_refold(spark):
    """win_sliding_distinct's window fan-out must operate on bitmap
    state, not replicate raw events: the plan carries bitmap aggregates
    and exactly one scan of events."""
    import re

    p = plan(spark, "win_sliding_distinct")
    assert "bitmap_or_agg" in p or "bitmap_count" in p
    # two scans only: the bitmap branch and the day-spine branch — the
    # 7x fan-out replicates sketch rows, never raw events
    assert len(re.findall(r"\(\d+\) Scan parquet", p)) == 2


def test_bitmap_intersect_reuses_sketch_exchange(spark):
    """agg_bitmap_intersect computes overlaps on cached sketch state —
    events must be scanned at most once (InMemoryTableScan afterwards)."""
    p = plan(spark, "agg_bitmap_intersect")
    assert "bitmap_construct_agg" in p or "InMemoryTableScan" in p


def test_flagship_two_level_agg_shape(spark):
    """sensor_rollup_daily's rewrite contract: NO Expand node (the
    countDistinct form doubles the input stream before the exchange)
    and exactly two hash-aggregate levels with partial aggregation —
    shuffle 1 carries pre-combined per-user-day rows, shuffle 2 folds
    them into day rows. A regression back to countDistinct (or to a
    SortAggregate via a non-packable ordering key) fails here."""
    p = plan(spark, "sensor_rollup_daily", mode="simple")
    assert "Expand" not in p, "countDistinct Expand reappeared"
    assert p.count("Exchange") == 2, p
    assert "SortAggregate" not in p, "two-level agg degraded to sort-agg"
    assert p.count("HashAggregate") == 4  # partial+final at both levels


def test_common_chunk_filter_two_level_df_no_expand(spark):
    """dedup_common_chunks' document-frequency contract: the (chunk, doc)
    distinct partial + per-chunk count must be TWO hash-aggregate levels
    — never a countDistinct, whose Expand node doubles the exploded
    chunk stream (the corpus's largest intermediate). Budget: at most 3
    hash exchanges (chunk-doc distinct, chunk frequency, final per-doc
    rebuild; the frequency->chunks join is broadcast at fixture scale,
    shuffle-reusing at real scale) and no cartesian anywhere."""
    p = plan(spark, "dedup_common_chunks", mode="simple")
    assert "Expand" not in p, "countDistinct Expand over the exploded stream"
    assert p.count("Exchange hashpartitioning") <= 3, p
    assert "CartesianProduct" not in p


def test_shard_manifest_single_shuffle(spark):
    """pack_shard_manifest is one scan + one keyed shuffle: every stat
    partial-aggregates map-side (ObjectHashAggregate partial+final for
    the digest's bounded collect_list). A second exchange means the
    manifest stopped being a single-pass operator."""
    p = plan(spark, "pack_shard_manifest", mode="simple")
    assert p.count("Exchange") == 1, p
    assert p.count("ObjectHashAggregate") == 2, "partial+final agg expected"


def test_web_ingest_single_shuffle_no_joins(spark):
    """pipeline_web_ingest's shape contract: extraction + entropy are
    ONE narrow projection, the survivor window is the ONLY keyed
    shuffle, and verdict assembly rides the row — no joins at all
    (strictly cheaper than curation's three-pass join shape)."""
    p = plan(spark, "pipeline_web_ingest", mode="simple")
    assert p.count("Exchange hashpartitioning") == 1, p
    assert "Join" not in p
    assert "Expand" not in p


def test_referential_integrity_is_one_lazy_union_plan(spark):
    """The DQ audit must be ONE unioned aggregate plan (round-4 verdict
    item 6) — four eager per-check actions would serialize four scans of
    the warehouse. Locks: lazy frame (not a pre-collected local
    relation), a Union of the four checks, three anti-joins inside."""
    p = plan(spark, "dq_referential_integrity", mode="simple")
    assert "Union" in p
    assert p.count("LeftAnti") == 3
    assert "LocalTableScan" not in p, "audit was collected driver-side"


def test_domain_cap_group_limit_before_shuffle(spark):
    """The per-domain cap must push a PARTIAL WindowGroupLimit below the
    exchange (each map task holds a K-row heap per source before any
    data moves) with exactly one shuffle and a pushed-down null filter —
    the bounded-state shape that survives millions of domains at 100 TB."""
    p = plan(spark, "sample_domain_cap", mode="simple")
    assert "WindowGroupLimit" in p
    head, _, tail = p.partition("Exchange")
    assert "WindowGroupLimit" in tail, "no map-side (Partial) group limit"
    assert p.count("Exchange") == 1
    assert "IsNotNull(text)" in p


def test_interval_overlap_join_is_grid_blocked(spark):
    """join_interval_overlap must equi-join on the hour-grid bin (after
    exploding both interval sets onto it), never fall back to a
    cartesian/nested-loop overlap theta-join — the difference between
    O(pairs-sharing-an-hour) and O(|A| x |B|) at 100 TB."""
    p = plan(spark, "join_interval_overlap")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Generate" in p, "hour-grid explode missing from the plan"


def test_rrf_fusion_broadcasts_bounded_queries(spark):
    """Both retrieval legs of sim_rrf_fusion broadcast the bounded query
    side (corpus scanned once per leg, no corpus-sized shuffle below the
    candidate windows) and nothing degenerates to a cartesian."""
    p = plan(spark, "sim_rrf_fusion")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "WindowGroupLimit" in p, "candidate top-n must group-limit"


def test_k_anonymity_partial_aggregation(spark):
    """The quasi-identifier class census must combine map-side (partial
    + final HashAggregate) — the audit's only shuffle carries class
    counts, not raw events."""
    p = plan(spark, "dq_k_anonymity")
    assert p.count("HashAggregate") >= 2


def test_url_canonicalize_stays_jvm_and_shuffle_free(spark):
    """URL canonicalization is pure per-row JVM work: no Python
    evaluation and no Exchange anywhere in the plan."""
    p = plan(spark, "text_url_canonicalize", mode="simple")
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_zorder_readback_pushes_band_predicates(spark):
    """The z-ordered read-back must push BOTH clustered-dimension band
    predicates into the parquet scan (row-group min-max pruning works
    only below the scan)."""
    p = plan(spark, "sink_zorder_skipping")
    pushed = p.split("PushedFilters:")[1].split("\n")[0]
    assert "l_partkey" in pushed and "l_suppkey" in pushed


def test_bloom_runtime_filter_injected(spark):
    """Under the scale-representative confs (creation side too big to
    broadcast, no application-side size floor) Catalyst must inject the
    runtime bloom filter into the lineitem side ahead of the shuffle —
    and the query wrapper must leave the session confs untouched."""
    from plc_data_etl_pipeline_spark.catalog import load
    from pyspark.sql import functions as F

    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    li = load(spark, "/root/testdata/sf0.001", "lineitem")
    o = load(spark, "/root/testdata/sf0.001", "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    ).select("o_orderkey")
    j = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .count()
    )
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold": "0",
    }
    old = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        opt = j._jdf.queryExecution().optimizedPlan().toString()
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
    assert "might_contain" in opt, "runtime bloom filter not injected"

    # The registered query must restore session confs after its eager
    # run, and finalize (materialize + release) so nothing stays
    # resident: the persistent-RDD census must be unchanged.
    base_rdds = set(
        spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    )
    df = all_queries()["join_bloom_runtime"].fn(
        spark, "/root/testdata/sf0.001"
    )
    assert df.count() > 0
    after_rdds = set(
        spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    )
    assert after_rdds <= base_rdds, "bloom query left resident RDD state"
    assert (
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before
    )


def test_collocations_pre_finalize_shuffle_budget(spark):
    """The registered query finalizes to a LocalRelation (materialize +
    release), so the shape lock runs against the lazy plan helper:
    fan_out + pair count + two marginal windows = at most 4 shuffles,
    and the corpus total rides a broadcast, not a join."""
    from plc_data_etl_pipeline_spark.queries.extensions import (
        _collocations_plan,
    )

    top, _bc = _collocations_plan(spark, SF_DIR)
    p = plan_of(top, mode="simple")
    n = p.count("Exchange") - p.count("BroadcastExchange")
    assert n <= 4, f"collocations shuffle budget exceeded: {n}"
    assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p


def test_lpa_round_shape_is_linear(spark):
    """min_label_propagation must compile to exactly `rounds` label
    joins (the self-loop formulation references the label frame once
    per round) — a join+union form would double the plan every round
    (2^rounds subtrees, verified 7 joins at rounds=3 before the fix)
    and only fragile AQE stage-reuse would save it."""
    from plc_data_etl_pipeline_spark.queries.graph import _lpa_lazy

    top, labels = _lpa_lazy(spark, SF_DIR)
    p = plan_of(labels, mode="simple")
    assert p.count("ShuffledHashJoin") == 3, p.count("ShuffledHashJoin")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
    from plc_data_etl_pipeline_spark.operators.graph import (
        release_round_state,
    )

    release_round_state(labels)


def test_scd2_pointintime_join_is_hash_join(spark):
    """The fact->SCD2 as-of join must plan as an equi-join on the
    customer key with the validity range as a RESIDUAL condition —
    never a nested-loop/cartesian (the naive way to plan a range
    predicate), because each fact row matches exactly one version."""
    p = plan(spark, "scd2_pointintime_join")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "HashJoin" in p or "SortMergeJoin" in p


def test_partitioned_maintenance_prunes_merge_reads(spark, tmp_path):
    """The partition-pruned CDC merge must hand Spark ONLY the touched
    partition's files: the scan side of the anti-join plan reads one
    file, not the table (file pruning happens before Spark ever lists,
    so this is asserted on the txlog split itself plus the committed
    outcome)."""
    from plc_data_etl_pipeline_spark.pipeline.txlog import (
        TransactionalParquetTable,
    )

    t = TransactionalParquetTable(
        spark, str(tmp_path / "t"), partition_by="p"
    )
    t.append(
        spark.createDataFrame(
            [(p, k, "x") for p in range(8) for k in range(4)],
            "p int, k int, v string",
        )
    )
    m = t.history()[-1]
    touched = spark.createDataFrame([(3, 1)], "p int, k int")
    live, carried = t._split_touched_files(m, ["p", "k"], touched)
    assert len(live) == 1 and len(carried) == len(m["files"]) - 1
    assert m["stats"][live[0]]["p"] == [3, 3]


def test_stl_decompose_scans_once(spark):
    """ts_stl_decompose must touch the raw events table exactly ONCE:
    the seasonal mean is a window over (event_type, hour-of-day), not a
    groupBy+join-back (which re-derived the whole hourly branch — a
    second full scan of the 100 TB stream; round-6 plan audit)."""
    import re

    from plc_data_etl_pipeline_spark.registry import all_queries

    df = all_queries()["ts_stl_decompose"].fn(spark, SF_DIR)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Scan parquet|FileScan", p)) == 1
    assert len(re.findall(r"Exchange", p)) <= 3
    assert "Join" not in p


def test_scalar_crossjoins_stay_broadcast_one_row(spark):
    """Round-6 verdict residual nit: the three crossJoin-of-scalar sites
    (collocations corpus total, hot_keys sample total, key_distribution
    total) must compile to a BroadcastNestedLoopJoin whose build side is
    the ONE-ROW aggregate — a broadcast of a scalar, never a shuffled
    CartesianProduct. Locks the pattern so a refactor dropping the
    broadcast() hint (turning a 1-row cross join into an all-pairs
    exchange at scale) fails here."""
    from plc_data_etl_pipeline_spark.catalog import load
    from plc_data_etl_pipeline_spark.operators.scale import (
        hot_keys,
        key_distribution,
    )
    from plc_data_etl_pipeline_spark.queries.extensions import (
        _collocations_plan,
    )

    li = load(spark, SF_DIR, "lineitem")
    frames = {
        "hot_keys": hot_keys(li, "l_orderkey"),
        "key_distribution": key_distribution(li, "l_suppkey"),
        "collocations": _collocations_plan(spark, SF_DIR)[0],
    }
    for name, df in frames.items():
        p = plan_of(df, mode="simple")
        assert "CartesianProduct" not in p, f"{name}: cartesian leaked"
        assert "BroadcastNestedLoopJoin" in p, (
            f"{name}: scalar cross join lost its broadcast:\n{p}"
        )


def test_quantile_bottomk_sample_is_window_group_limit(spark):
    """stream_quantile_bottomk's rank<=k sample must compile to a
    map-side WindowGroupLimit BEFORE the group exchange (each task
    keeps its local k smallest priorities, then one merge per group) —
    the property that makes one-pass bounded-memory quantiles true at
    scale. A regression to a full per-group sort would still pass the
    oracle, so the plan is locked here."""
    from plc_data_etl_pipeline_spark.registry import all_queries

    df = all_queries()["stream_quantile_bottomk"].fn(spark, SF_DIR)
    p = plan_of(df, mode="formatted")
    limits = p.count("WindowGroupLimit")
    assert limits >= 2, f"expected partial+final WindowGroupLimit:\n{p}"
    # the PARTIAL limit is upstream of the group exchange: in the
    # printed tree (downstream on top) a WindowGroupLimit line must
    # appear BELOW the Exchange line
    tree = p.split("\n\n")[0]
    exch = tree.index("Exchange")
    assert "WindowGroupLimit" in tree[exch:], (
        f"no map-side partial limit below the exchange:\n{tree}"
    )
