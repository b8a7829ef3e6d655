"""Iterative graph analytics over the relational tables.

The reference has no graph surface at all; a training-data pipeline
needs one (connected components already powers dedup clustering in
operators/dedup.py — `dedup_cluster_survivors`). This module adds
PageRank, the canonical *iterative join* workload, expressed as plain
DataFrame joins so every iteration is one shuffle-partitioned
edge⋈rank join + one aggregation — the exact shape Pregel-style
systems distribute.

Determinism: ranks are kept in integer micro-units and every division
is an integer division, so iteration results are bit-identical across
engines and across any summation order (the oracle unrolls the same
iterations as nested CTEs). Damping 0.85 becomes ``(85 * x) div 100``.

Scale posture: the edge list lives partitioned on the source key; each
iteration is a shuffle join on that key plus a map-side-combinable SUM
— no driver-side state, no collect. At real depth (tens of
iterations) the loop should checkpoint every ~5 iterations to truncate
lineage; three unrolled iterations keep the demo plan bounded.
"""

from __future__ import annotations

import atexit
import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query

# Session-scoped materialized-edge cache: every iterative graph query
# (PageRank, CC, LPA, BFS, SSSP, triangles, bipartite projection) starts
# from the same repeat-trade pair build, and that build — a
# lineitem⋈orders join + countDistinct — dominated every fixpoint wall
# (~70 s of the 103 s sf50 connected-components run, BASELINE r7). The
# OUTPUT is tiny (support-filtered pairs), so the first call per
# (session, sf_dir, params) writes it to a session-keyed parquet and
# later calls read that back — 2nd+ graph queries pay relaxation-only
# cost. Same pattern as the persisted IVF index
# (queries/extensions.py::sim_topk_ivf_indexed); results are unchanged
# because the build is deterministic. Paths are appId-keyed (two
# concurrent sessions must not clobber each other's _temporary dirs —
# the IVF lesson) and removed at interpreter exit so repeated
# driver/bench sessions don't accrete orphaned multi-GB dirs in /tmp
# (round-8 review).
_PAIR_CACHE: dict[tuple, str] = {}


def _cleanup_pair_cache() -> None:  # pragma: no cover - exit hook
    import shutil

    for path in _PAIR_CACHE.values():
        shutil.rmtree(path, ignore_errors=True)
    _PAIR_CACHE.clear()


atexit.register(_cleanup_pair_cache)


def _trade_pairs_build(spark, sf_dir, min_support: int | None = None):
    """The raw edge-build frame (no cache) — split out so the plan-lock
    test can assert the join strategy of what actually executes on the
    first call per session."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    # Round-8 optimization (guide §3.1: pick the strategy deliberately).
    # Unhinted, the strategy was a SIZE-ESTIMATE decision with two bad
    # regimes: (a) while the column-pruned orders estimate slips under
    # the 64 MB broadcast threshold the planner BROADCASTS a relation
    # that grows with the fact table — at factor-50 that is a
    # driver-built 7.5M-row hash relation per build (probe: 23.8 s,
    # inflating to 134.1 s as accumulated broadcasts GC-thrash the
    # driver); (b) past the threshold it degrades to sort-merge, whose
    # two full sorts of the shuffled fact streams dominated the sf100
    # build (376 s of the 457 s CC run). The SHUFFLE_HASH hint removes
    # both: no driver-side relation, no sorts — factor-50 probe
    # (scripts/probe_edge_build_ab.py, bit-identical output,
    # interleaved reps): 23.8/134.1 s -> 6.4/20.2 s (3.7-6.6x).
    # Pre-dedup variants (dropDuplicates / collect_set before the join)
    # measured SLOWER again — countDistinct's map-side partial already
    # dedups, confirming the r7 A/B. Scale posture: the build side is
    # the per-partition slice of orders (the SMALLER keyed relation,
    # ~1:4 vs lineitem), bounded by the shuffle-partition count that
    # scales with the cluster conf + AQE. At tiny SF the hint trades a
    # legitimate broadcast for one shuffle of ~600k narrow rows —
    # ~0.1 s, paid once per session thanks to the pair cache.
    j = li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
    a = (F.col("o_custkey") * 2).alias("a")
    b = (F.col("l_suppkey") * 2 + 1).alias("b")
    if min_support is None:
        base = j.select(a, b).distinct()
    else:
        base = (
            j.groupBy(a, b)
            .agg(F.countDistinct("l_orderkey").alias("n"))
            .filter(F.col("n") >= min_support)
        )
    return _with_node_degrees(base)


def _with_node_degrees(base: DataFrame) -> DataFrame:
    """Append per-endpoint node degrees (deg_a, deg_b) to a pair
    relation — one more column pair in the session materialization so
    degree-consuming operators (pagerank) skip their per-call degree
    shuffle + edge⋈degree join entirely (round-8 continuation;
    guide §2.4 — compute once in the shared build, not per query).

    Column-local window counts ARE the node degrees here because the
    even/odd id encoding makes the graph bipartite by construction:
    customers (even) only ever appear in ``a``, suppliers (odd) only in
    ``b``, and the pair relation is unique on (a, b) in both build
    branches — so COUNT(*) OVER (PARTITION BY a) is exactly node a's
    incident-edge count. Two window passes over the (small,
    support-filtered or distinct) pair relation, paid ONCE per session
    at materialization time; no joins, no new hint surface."""
    from pyspark.sql import Window

    return base.select(
        "*",
        F.count("*").over(Window.partitionBy("a")).alias("deg_a"),
        F.count("*").over(Window.partitionBy("b")).alias("deg_b"),
    )


def _trade_pairs(spark, sf_dir, min_support: int | None = None,
                 with_weight: bool = False, with_degrees: bool = False):
    """Shared (a, b) customer—supplier pair builder with the even/odd
    node encoding (even = customer*2, odd = supplier*2+1): BIGINT keys
    hash/sort several times per round, so they beat string labels by
    ~2x end-to-end. min_support keeps only pairs with that many
    distinct orders (the sparse repeat-trade graph). ``with_weight``
    (requires min_support) also emits an integer DISTANCE weight
    w = GREATEST(1, 8 - n): more repeat orders = a stronger tie = a
    shorter edge, clamped to [1, 8-min_support]. ``with_degrees`` also
    projects the materialized per-endpoint node degrees (deg_a, deg_b —
    see _with_node_degrees) for degree-consuming operators. First call
    per (session, sf_dir, params) materializes; see _PAIR_CACHE above."""
    if with_weight and min_support is None:
        raise ValueError("with_weight requires min_support")
    # Cache key deliberately EXCLUDES with_weight/with_degrees: the
    # materialized relation keeps the support count n and the node
    # degrees, so all projections share one edge build (SSSP reuses the
    # CC/LPA/BFS materialization; pagerank's degrees ride along and
    # parquet column pruning keeps non-consumers' reads unchanged).
    key = (spark.sparkContext.applicationId, sf_dir, min_support)
    cached = _PAIR_CACHE.get(key)
    if cached is None or not os.path.isdir(cached):
        out = _trade_pairs_build(spark, sf_dir, min_support)
        cached = os.path.join(
            tempfile.gettempdir(),
            "plc_etl_trade_pairs_"
            + hashlib.md5(repr(key).encode()).hexdigest()[:16],
        )
        out.write.mode("overwrite").parquet(cached)
        _PAIR_CACHE[key] = cached
    g = spark.read.parquet(cached)
    deg = ["deg_a", "deg_b"] if with_degrees else []
    if min_support is None or not with_weight:
        return g.select("a", "b", *deg)
    return g.select(
        "a", "b",
        F.greatest(F.lit(1), F.lit(8) - F.col("n")).cast("bigint").alias("w"),
        *deg,
    )


def _node_label(col: str):
    """Decode the even/odd node id back to a 'c<k>' / 's<k>' label."""
    return F.concat(
        F.when(F.col(col) % 2 == 0, F.lit("c")).otherwise(F.lit("s")),
        (F.col(col) / 2).cast("bigint"),
    )


_PR_ITER = """
    SELECT e.dst AS node,
           CAST(150000 + (85 * SUM(r.pr // g.d)) // 100 AS BIGINT) AS pr
    FROM edges e
    JOIN {prev} r ON e.src = r.node
    JOIN deg g ON e.src = g.node
    GROUP BY e.dst
"""


@query(
    "graph_pagerank",
    oracle=f"""
    WITH pairs AS (
      SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ), edges AS (
      SELECT a AS src, b AS dst FROM pairs
      UNION ALL
      SELECT b AS src, a AS dst FROM pairs
    ), deg AS (
      SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY src
    ), r0 AS (
      SELECT node, CAST(1000000 AS BIGINT) AS pr FROM deg
    ), r1 AS ({_PR_ITER.format(prev="r0")}
    ), r2 AS ({_PR_ITER.format(prev="r1")}
    ), r3 AS ({_PR_ITER.format(prev="r2")}
    ), top AS (
      SELECT node, pr FROM r3 ORDER BY pr DESC, node LIMIT 20
    )
    SELECT CASE WHEN node % 2 = 0 THEN 'c' || (node // 2)
                ELSE 's' || (node // 2) END AS node,
           pr AS pr_micro
    FROM top
    """,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 iterations, damping 0.85) over the undirected
    customer—supplier trade graph (an edge per distinct trading pair
    from lineitem⋈orders): the canonical iterative-join workload.
    Ranks are integer micro-units and the damping step is
    ``150000 + (85 * sum_contrib) div 100`` with integer contribution
    division, so the fixpoint trajectory is bit-identical in both
    engines regardless of aggregation order. Every node has degree
    >= 1 (undirected edges), so no dangling-mass correction is needed.
    Returns the top-20 nodes (node-id tiebreak), materialized eagerly so
    the edge-checkpoint blocks are released before the wrapper returns
    (operators/graph.py::finalize_round_result)."""
    from ..operators.graph import finalize_round_result

    result, state = _pagerank_lazy(spark, sf_dir)
    return finalize_round_result(result, state)


def _pagerank_lazy(spark: SparkSession, sf_dir: str):
    """(lazy top-20 frame, state-carrying pagerank frame) — split out so
    the plan-lock test can audit the iteration join shape without the
    wrapper's eager materialize-and-release."""
    from ..operators.graph import pagerank

    # with_degrees: the session materialization carries the node
    # degrees, so pagerank's pre-checkpoint subtree is explode +
    # repartition (1 exchange) instead of degree-shuffle + edge⋈degree
    # join + repartition (3) — see _with_node_degrees / pagerank.
    pairs = _trade_pairs(spark, sf_dir, with_degrees=True)
    pr = pagerank(pairs, iterations=3, degree_cols=("deg_a", "deg_b"))
    top = (
        pr.select("node", F.col("pr").alias("pr_micro"))
        .orderBy(F.desc("pr_micro"), "node")
        .limit(20)
    )
    return top.select(_node_label("node").alias("node"), "pr_micro"), pr


@query(
    "graph_triangle_count",
    oracle="""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    e AS (
      SELECT a.l_partkey AS s1, b.l_partkey AS s2
      FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY s1, s2 HAVING COUNT(*) >= 2
    )
    SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*)
                 FROM e e1
                 JOIN e e2 ON e2.s1 = e1.s1 AND e2.s2 > e1.s2
                 JOIN e e3 ON e3.s1 = e1.s2 AND e3.s2 = e2.s2
                ) AS BIGINT) AS n_triangles
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the market-basket co-purchase graph: parts
    are nodes, an edge links two parts bought together in >= 2 distinct
    orders (the support filter keeps the graph sparse and meaningful —
    the unfiltered co-occurrence graph converges to a clique).

    The oracle closes wedges with the textbook id-ordered 3-way
    self-join; the engine uses degree-ordered orientation
    (operators/graph.py::triangle_count), which bounds per-node wedge
    fan-out by O(sqrt(m)) — the difference between a survivable and a
    quadratic plan on power-law degree distributions at scale. Both
    orientations count each triangle exactly once, so the counts agree
    bit-for-bit. Edge building is a per-order self-join co-partitioned
    on l_orderkey (order baskets are small), then a partial-agg support
    count on the pair key. The two-column result is materialized eagerly
    so the oriented-edge checkpoint is released before the wrapper
    returns (operators/graph.py::finalize_round_result)."""
    from ..operators.graph import finalize_round_result

    tri = _triangle_lazy(spark, sf_dir)
    return finalize_round_result(tri, tri)


def _triangle_lazy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lazy (n_edges, n_triangles) frame — split out so plan tests and
    the plan-capture script can audit the shape pre-finalize.

    Round-8 optimization (guide §2.4): n_edges comes from the
    operator's CHECKPOINTED oriented relation (with_edge_count=True;
    orientation is a bijection on edges), not from a separate
    ``edges.agg(count)`` — the old wrapper-side aggregate re-ran the
    whole distinct → basket self-join → support-agg pipeline a SECOND
    time because only the operator's internal localCheckpoint memoizes
    it. Probe scripts/probe_triangle_nedges_ab.py: identical output,
    interleaved A/B timing committed in OPTIMIZATION_r08.md."""
    from ..operators.graph import triangle_count

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    op = li.distinct()
    a = op.select("l_orderkey", F.col("l_partkey").alias("pa"))
    b = op.select("l_orderkey", F.col("l_partkey").alias("pb"))
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("pa") < F.col("pb"))
        .groupBy(F.col("pa").alias("a"), F.col("pb").alias("b"))
        .agg(F.count("*").alias("support"))
        .where(F.col("support") >= 2)
        .select("a", "b")
    )
    return triangle_count(edges, with_edge_count=True)


_LPA_ITER = """
    SELECT node, CAST(MIN(lbl) AS BIGINT) AS lbl FROM (
      SELECT e.dst AS node, r.lbl
      FROM edges e JOIN {prev} r ON e.src = r.node
      UNION ALL
      SELECT node, lbl FROM {prev}
    ) GROUP BY node
"""


@query(
    "graph_label_propagation",
    oracle=f"""
    WITH pairs AS (
      SELECT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY a, b HAVING COUNT(DISTINCT l_orderkey) >= 3
    ), edges AS (
      SELECT a AS src, b AS dst FROM pairs
      UNION ALL
      SELECT b AS src, a AS dst FROM pairs
    ), l0 AS (
      SELECT DISTINCT src AS node, src AS lbl FROM edges
    ), l1 AS ({_LPA_ITER.format(prev="l0")}
    ), l2 AS ({_LPA_ITER.format(prev="l1")}
    ), l3 AS ({_LPA_ITER.format(prev="l2")}
    ), comm AS (
      SELECT lbl,
             COUNT(*) AS n_nodes,
             CAST(SUM(CASE WHEN node % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_customers,
             CAST(SUM(CASE WHEN node % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_suppliers
      FROM l3 GROUP BY lbl
      ORDER BY n_nodes DESC, lbl LIMIT 20
    )
    SELECT CASE WHEN lbl % 2 = 0 THEN 'c' || (lbl // 2)
                ELSE 's' || (lbl // 2) END AS community,
           n_nodes, n_customers, n_suppliers
    FROM comm
    """,
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-round community detection: 3 rounds of synchronous
    MIN-label propagation over the repeat-trade customer—supplier
    graph (edges with >= 3 distinct orders — sparse enough for bounded
    propagation to yield real structure) —
    each node's label becomes the smallest node id within 3 hops, i.e.
    the deterministic, oracle-checkable prefix of connected components
    (classic LPA's random tie-break is replaced by MIN; see
    operators/graph.py::min_label_propagation). Completes the iterative
    family: pagerank (weighted sums), triangle_count (wedge joins),
    connected components (full convergence, dedup side), and this
    (bounded label spreading). Returns the top-20 communities by size
    with their customer/supplier composition; materialized eagerly so
    the edge-checkpoint blocks are released before the wrapper returns."""
    from ..operators.graph import finalize_round_result

    result, state = _lpa_lazy(spark, sf_dir)
    return finalize_round_result(result, state)


def _lpa_lazy(spark: SparkSession, sf_dir: str):
    """(lazy top-20 communities, state-carrying labels frame) — split
    out so plan tests can audit the round shape pre-finalize."""
    from ..operators.graph import min_label_propagation

    # REPEAT-trade edges (>= 3 distinct orders): the raw trade graph is
    # so dense that 3 hops reach everything (one giant community); the
    # support filter keeps the relationship graph sparse enough that
    # bounded propagation yields real structure.
    pairs = _trade_pairs(spark, sf_dir, min_support=3)
    labels = min_label_propagation(pairs, rounds=3)
    comm = (
        labels.groupBy("lbl")
        .agg(
            F.count("*").alias("n_nodes"),
            F.sum(F.when(F.col("node") % 2 == 0, 1).otherwise(0)).alias(
                "n_customers"
            ),
            F.sum(F.when(F.col("node") % 2 == 1, 1).otherwise(0)).alias(
                "n_suppliers"
            ),
        )
        .orderBy(F.desc("n_nodes"), "lbl")
        .limit(20)
    )
    return (
        comm.select(
            _node_label("lbl").alias("community"),
            "n_nodes",
            "n_customers",
            "n_suppliers",
        ),
        labels,
    )


# Shared by graph_components_fixpoint and graph_components_altstar:
# the DECLARATIVE fixpoint (DuckDB's recursive reachability closure +
# MIN root per node), so both iterative algorithms are value-checked
# against an engine computing the closure a completely different way.
_CC_TOP20_ORACLE = f"""
    WITH RECURSIVE pairs AS (
      SELECT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY a, b HAVING COUNT(DISTINCT l_orderkey) >= 3
    ), edges AS (
      SELECT a AS src, b AS dst FROM pairs
      UNION
      SELECT b AS src, a AS dst FROM pairs
    ), reach(node, root) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node
    ), cc AS (
      SELECT node, MIN(root) AS lbl FROM reach GROUP BY node
    ), comp AS (
      SELECT lbl,
             COUNT(*) AS n_nodes,
             CAST(SUM(CASE WHEN node % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_customers,
             CAST(SUM(CASE WHEN node % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_suppliers
      FROM cc GROUP BY lbl
      ORDER BY n_nodes DESC, lbl LIMIT 20
    )
    SELECT CASE WHEN lbl % 2 = 0 THEN 'c' || (lbl // 2)
                ELSE 's' || (lbl // 2) END AS component,
           n_nodes, n_customers, n_suppliers
    FROM comp
    """


@query("graph_components_fixpoint", oracle=_CC_TOP20_ORACLE)
def graph_components_fixpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RUN-TO-CONVERGENCE connected components over the repeat-trade
    customer—supplier graph — the fixpoint counterpart of
    graph_label_propagation's bounded 3 rounds (same graph, same MIN
    semantics, but iterated until no label changes, with the delta-sum
    stopping rule and periodic label re-checkpointing of
    operators/graph.py::min_label_propagation_fixpoint). The oracle is
    the DECLARATIVE fixpoint: DuckDB's recursive reachability closure +
    MIN root per node — so the iterative convergence loop (stopping
    rule included) is value-checked against an engine that computes the
    closure a completely different way. Returns the top-20 components
    by size with customer/supplier composition; materialized eagerly so
    the edge/label checkpoint blocks are released before the wrapper
    returns."""
    from ..operators.graph import finalize_round_result

    result, state = _components_fixpoint_lazy(spark, sf_dir)
    return finalize_round_result(result, state)


def _components_fixpoint_lazy(spark: SparkSession, sf_dir: str):
    """(lazy top-20 components, state-carrying labels frame) — split
    out so plan/round tests can audit convergence behavior."""
    from ..operators.graph import min_label_propagation_fixpoint

    pairs = _trade_pairs(spark, sf_dir, min_support=3)
    # require_convergence: the oracle is the TRUE closure, so a
    # max_rounds-truncated prefix must raise, never silently diverge
    # (round-6 review); 200 rounds >> any plausible diameter of the
    # support-3 trade graph (converges in ~2 blocks at tested SFs).
    labels = min_label_propagation_fixpoint(
        pairs, max_rounds=200, require_convergence=True
    )
    comp = (
        labels.groupBy("lbl")
        .agg(
            F.count("*").alias("n_nodes"),
            F.sum(F.when(F.col("node") % 2 == 0, 1).otherwise(0)).alias(
                "n_customers"
            ),
            F.sum(F.when(F.col("node") % 2 == 1, 1).otherwise(0)).alias(
                "n_suppliers"
            ),
        )
        .orderBy(F.desc("n_nodes"), "lbl")
        .limit(20)
    )
    return (
        comp.select(
            _node_label("lbl").alias("component"),
            "n_nodes",
            "n_customers",
            "n_suppliers",
        ),
        labels,
    )


@query("graph_components_altstar", oracle=_CC_TOP20_ORACLE)
def graph_components_altstar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components by ALTERNATING large-star/small-star edge
    rewriting (Kiveris et al., SoCC 2014;
    operators/graph.py::connected_components_altstar) over the same
    repeat-trade graph and against the same recursive-closure oracle as
    graph_components_fixpoint — the two canonical distributed-CC
    algorithms side by side. Min-label propagation pays one edge⋈label
    shuffle per round but needs DIAMETER rounds; star rewriting pays
    three shuffles per round but collapses any component in O(log n)
    rounds (pytest: a 300-chain converges in 10 alternating rounds vs
    301 label rounds). On the small-diameter trade graph LPA wins the
    wall clock; on the high-diameter graphs entity-resolution dedup
    produces, this is the one that survives — both are registered so
    the A/B stays measured (BASELINE.md round-8), and both share the
    session-scoped _trade_pairs edge cache."""
    from ..operators.graph import (
        connected_components_altstar as _cc_altstar,
        finalize_round_result,
    )

    pairs = _trade_pairs(spark, sf_dir, min_support=3)
    labels = _cc_altstar(pairs, max_rounds=40, require_convergence=True)
    comp = (
        labels.groupBy("lbl")
        .agg(
            F.count("*").alias("n_nodes"),
            F.sum(F.when(F.col("node") % 2 == 0, 1).otherwise(0)).alias(
                "n_customers"
            ),
            F.sum(F.when(F.col("node") % 2 == 1, 1).otherwise(0)).alias(
                "n_suppliers"
            ),
        )
        .orderBy(F.desc("n_nodes"), "lbl")
        .limit(20)
    )
    out = comp.select(
        _node_label("lbl").alias("component"),
        "n_nodes",
        "n_customers",
        "n_suppliers",
    )
    return finalize_round_result(out, labels)


@query(
    "graph_bfs_hops",
    oracle="""
    WITH RECURSIVE pairs AS (
      SELECT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY a, b HAVING COUNT(DISTINCT l_orderkey) >= 3
    ), edges AS (
      SELECT a AS src, b AS dst FROM pairs
      UNION
      SELECT b AS src, a AS dst FROM pairs
    ), walk(node, d) AS (
      SELECT (SELECT MIN(src) FROM edges), 0
      UNION
      SELECT e.dst, w.d + 1
      FROM walk w JOIN edges e ON e.src = w.node
      WHERE w.d < 200
    ), dist AS (
      SELECT node, CAST(MIN(d) AS BIGINT) AS hops FROM walk GROUP BY node
    ), allnodes AS (
      SELECT DISTINCT src AS node FROM edges
    )
    SELECT COALESCE(dist.hops, -1) AS hops,
           CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM allnodes LEFT JOIN dist ON allnodes.node = dist.node
    GROUP BY COALESCE(dist.hops, -1)
    """,
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-source BFS hop-distance distribution from the smallest
    node of the repeat-trade graph (operators/graph.py::bfs_hops — the
    relaxation-fixpoint generalization of min-label propagation:
    self-loops carry weight 0, edges weight 1, per-round one
    shuffle-hash join + map-side MIN, delta-sum stopping, periodic
    distance re-checkpoints). Nodes in other components report
    hops = -1. The oracle is the declarative walk: DuckDB's recursive
    closure over (node, depth) pairs with MIN depth per node — a
    completely different evaluation strategy for the same fixpoint,
    with the SAME depth bound (200) as the engine's max_rounds so
    neither side can see depths the other cannot.
    Output is the hop histogram (bounded by the source component's
    eccentricity), so the wrapper materializes eagerly and releases the
    edge/distance checkpoints before returning."""
    from ..operators.graph import (
        UNREACHED,
        bfs_hops,
        finalize_round_result,
    )

    pairs = _trade_pairs(spark, sf_dir, min_support=3)
    # source=None -> the graph's MIN node id, computed inside bfs_hops
    # from the checkpointed edge relation: matches the oracle's
    # MIN(src) over ALL nodes (customers AND suppliers — a min over
    # just the customer column diverged, round-6 review) and avoids
    # deriving the pair aggregation twice. max_rounds == the oracle's
    # depth cap (200): both engines bound the walk identically, and
    # require_convergence raises rather than silently truncating.
    dist = bfs_hops(
        pairs, source=None, max_rounds=200, require_convergence=True
    )
    hist = (
        dist.select(
            F.when(F.col("hops") >= UNREACHED, F.lit(-1))
            .otherwise(F.col("hops"))
            .cast("bigint")
            .alias("hops")
        )
        .groupBy("hops")
        .agg(F.count("*").alias("n_nodes"))
    )
    return finalize_round_result(hist, dist)


# Shared distance cap for graph_sssp_weighted: the oracle's recursive
# walk prunes paths at cumulative distance >= cap, so a node whose
# shortest distance reaches the cap is indistinguishable from
# unreachable on the oracle side — the engine clamps its converged
# distances to the SAME cap (dist >= cap -> -1) so both sides agree by
# construction, not by the test graph's small diameter (round-8 ADVICE:
# the engine previously bounded ROUNDS while the oracle bounded
# DISTANCE, silently diverging on any >=200-distance-but-<200-hop node).
_SSSP_DIST_CAP = 200

@query(
    "graph_sssp_weighted",
    oracle=f"""
    WITH RECURSIVE pairs AS (
      SELECT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b,
             GREATEST(1, 8 - COUNT(DISTINCT l_orderkey)) AS w
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY a, b HAVING COUNT(DISTINCT l_orderkey) >= 3
    ), edges AS (
      SELECT a AS src, b AS dst, w FROM pairs
      UNION
      SELECT b AS src, a AS dst, w FROM pairs
    ), walk(node, d) AS (
      SELECT (SELECT MIN(src) FROM edges), 0
      UNION
      SELECT e.dst, w.d + e.w
      FROM walk w JOIN edges e ON e.src = w.node
      WHERE w.d + e.w < {_SSSP_DIST_CAP}
    ), dist AS (
      SELECT node, CAST(MIN(d) AS BIGINT) AS dist FROM walk GROUP BY node
    ), allnodes AS (
      SELECT DISTINCT src AS node FROM edges
    )
    SELECT COALESCE(dist.dist, -1) AS dist,
           CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM allnodes LEFT JOIN dist ON allnodes.node = dist.node
    GROUP BY COALESCE(dist.dist, -1)
    """,
)
def graph_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted single-source shortest paths (distributed Bellman-Ford)
    over the repeat-trade graph — graph_bfs_hops' relaxation fixpoint
    with a real DISTANCE weight per edge (operators/graph.py::bfs_hops
    weight_col): w = GREATEST(1, 8 - support), so heavily-repeated
    trade ties are short edges and the shortest path prefers strong
    relationships over hop count. Same machinery end to end: self-loops
    at weight 0 carry own distances, one shuffle-hash edge⋈distance
    join + map-side MIN per round, per-round monotone-sum convergence
    certificate, in-loop checkpoint release. The oracle walks the
    identical weighted closure declaratively (DuckDB recursive CTE)
    pruning paths at cumulative distance >= ``_SSSP_DIST_CAP``; the
    engine prunes its relaxation at the SAME cap (bfs_hops dist_cap)
    and reports >= cap as -1, so the two bounds are identical by
    construction (with weights >= 1, every path of distance < cap has
    < cap edges, so both bounded explorations find the true minimum
    for every surviving node, and the engine converges within cap
    rounds regardless of hop diameter). -1 therefore means "other
    component OR farther than the cap" on both sides — the
    distance-TTL contract. Output: the distance histogram;
    materialized eagerly, round state released before return."""
    from ..operators.graph import bfs_hops, finalize_round_result

    pairs = _trade_pairs(spark, sf_dir, min_support=3, with_weight=True)
    # dist_cap prunes relaxation at the shared cap, so convergence is
    # bounded by cap rounds (weights >= 1) — a >200-hop graph no longer
    # trips require_convergence while the oracle's pruned walk succeeds
    # (round-8 review); max_rounds has one round of certificate headroom.
    dist = bfs_hops(
        pairs, source=None, max_rounds=_SSSP_DIST_CAP + 1,
        require_convergence=True, weight_col="w",
        dist_cap=_SSSP_DIST_CAP,
    )
    hist = (
        dist.select(
            F.when(F.col("hops") >= _SSSP_DIST_CAP, F.lit(-1))
            .otherwise(F.col("hops"))
            .cast("bigint")
            .alias("dist")
        )
        .groupBy("dist")
        .agg(F.count("*").alias("n_nodes"))
    )
    return finalize_round_result(hist, dist)


@query(
    "graph_bipartite_projection",
    oracle="""
    WITH cs AS (
      SELECT l_suppkey AS s, o_custkey AS c
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY s, c HAVING COUNT(DISTINCT l_orderkey) >= 3
    ), deg AS (
      SELECT s, COUNT(*) AS d FROM cs GROUP BY s
    ), kept AS (
      SELECT cs.s, cs.c FROM cs JOIN deg ON cs.s = deg.s
      WHERE deg.d <= 50
    ), pairs AS (
      SELECT a.c AS c1, b.c AS c2, COUNT(*) AS shared_suppliers
      FROM kept a JOIN kept b ON a.s = b.s AND a.c < b.c
      GROUP BY c1, c2
    )
    SELECT c1, c2, CAST(shared_suppliers AS BIGINT) AS shared_suppliers
    FROM pairs
    ORDER BY shared_suppliers DESC, c1, c2 LIMIT 20
    """,
)
def graph_bipartite_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite projection with a HUB-DEGREE CAP: project the
    customer—supplier repeat-trade graph onto customers (edge weight =
    shared repeat suppliers), keeping only suppliers with <= 50 repeat
    customers. The cap is the load-bearing scale decision, not a
    convenience: an uncapped projection generates d^2 pairs per
    supplier, so ONE power-law hub (a supplier half the market buys
    from) turns a 100 TB projection into a cartesian — the same blowup
    triangle_count's degree orientation and dedup_minhash's bucket caps
    guard against, and the standard market-basket/co-occurrence
    mitigation (skip ubiquitous items: a shared EVERYONE-supplier
    carries no similarity signal anyway, exactly like a stopword).
    With the cap, per-supplier fan-out is <= 50^2 and total work is
    sum(d_i^2) over capped degrees — linear in kept edges times a
    constant. Plan: support-filtered edge build (partial-agg), degree
    census + cap semi-filter, one co-partitioned self-join on the
    supplier key, pair count, TakeOrderedAndProject top-20 (no global
    sort)."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    cs = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("l_suppkey").alias("s"), F.col("o_custkey").alias("c")
        )
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .filter(F.col("n") >= 3)
        .select("s", "c")
    )
    deg = cs.groupBy("s").agg(F.count("*").alias("d"))
    kept = cs.join(deg.filter(F.col("d") <= 50), "s").select("s", "c")
    a = kept.select("s", F.col("c").alias("c1"))
    b = kept.select("s", F.col("c").alias("c2"))
    pairs = (
        a.join(b, "s")
        .where(F.col("c1") < F.col("c2"))
        .groupBy("c1", "c2")
        .agg(F.count("*").alias("shared_suppliers"))
    )
    return pairs.orderBy(
        F.desc("shared_suppliers"), "c1", "c2"
    ).limit(20)
