"""Graph-operator invariants (operators/graph.py) on graphs with known
closed-form behavior — complements the DuckDB-oracle value check of the
graph_pagerank query (unrolled-CTE twin)."""

from __future__ import annotations

from plc_data_etl_pipeline_spark.operators.graph import pagerank


def test_pagerank_star_hub_dominates(spark):
    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 9)], "a long, b long"
    )
    pr = {r["node"]: r["pr"] for r in pagerank(pairs, iterations=5).collect()}
    assert set(pr) == set(range(9))
    assert all(pr[0] > pr[i] for i in range(1, 9)), "hub must outrank leaves"
    assert len({pr[i] for i in range(1, 9)}) == 1, "leaves are symmetric"


def test_pagerank_ring_is_exact_fixpoint(spark):
    """On a ring every node has degree 2 and receives two half-shares:
    150000 + (85 * (2 * (1e6 div 2))) div 100 == 1e6 exactly — the
    uniform distribution is a bit-exact fixpoint of the integer
    recurrence, at any iteration count (also exercises the periodic
    rank re-checkpoint branch via iterations=6 > checkpoint_every=5)."""
    pairs = spark.createDataFrame(
        [(i, (i + 1) % 10) for i in range(10)], "a long, b long"
    )
    rows = pagerank(pairs, iterations=6).collect()
    assert len(rows) == 10
    assert {r["pr"] for r in rows} == {1000000}


def test_pagerank_degree_cols_matches_fallback(spark):
    """Round-8 continuation: pagerank(degree_cols=...) consumes
    precomputed per-endpoint degrees (explode path, 1 pre-checkpoint
    exchange) and must be bit-identical to the fallback that derives
    degrees per call — on a bipartite pair list with repeated
    endpoints, the shape _trade_pairs materializes (customers even /
    suppliers odd, unique (a, b) rows, column-local counts == node
    degrees)."""
    pairs = [(0, 1), (0, 3), (2, 1), (2, 3), (4, 1), (4, 5), (6, 7)]
    plain = spark.createDataFrame(pairs, "a long, b long")
    from collections import Counter

    ca = Counter(a for a, _ in pairs)
    cb = Counter(b for _, b in pairs)
    withdeg = spark.createDataFrame(
        [(a, b, ca[a], cb[b]) for a, b in pairs],
        "a long, b long, deg_a long, deg_b long",
    )
    want = sorted(map(tuple, pagerank(plain, iterations=4).collect()))
    got = sorted(
        map(
            tuple,
            pagerank(
                withdeg, iterations=4, degree_cols=("deg_a", "deg_b")
            ).collect(),
        )
    )
    assert got == want


def _tri(spark, edge_list):
    from plc_data_etl_pipeline_spark.operators.graph import triangle_count

    edges = spark.createDataFrame(edge_list, "a long, b long")
    return triangle_count(edges).collect()[0]["n_triangles"]


def test_triangle_count_known_graphs(spark):
    # K4: C(4,3) = 4 triangles.
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    assert _tri(spark, k4) == 4
    # Path graph: zero triangles.
    assert _tri(spark, [(i, i + 1) for i in range(6)]) == 0
    # Two triangles sharing an edge (bowtie on an edge).
    assert _tri(spark, [(0, 1), (0, 2), (1, 2), (0, 3), (1, 3)]) == 2


def test_triangle_count_with_edge_count(spark):
    """with_edge_count=True (round-8: n_edges from the CHECKPOINTED
    oriented relation, not a second run of the caller's edge pipeline)
    must report n_edges == the input edge count exactly — orientation
    is a bijection on edges — alongside the unchanged triangle count,
    in (n_edges, n_triangles) column order (the graph_triangle_count
    oracle's column contract)."""
    from plc_data_etl_pipeline_spark.operators.graph import triangle_count

    bowtie = [(0, 1), (0, 2), (1, 2), (0, 3), (1, 3)]
    edges = spark.createDataFrame(bowtie, "a long, b long")
    row = triangle_count(edges, with_edge_count=True).collect()[0]
    assert tuple(row.asDict()) == ("n_edges", "n_triangles")
    assert (row["n_edges"], row["n_triangles"]) == (5, 2)


def test_triangle_count_star_hub(spark):
    """Star graph: the hub has max degree but no leaf-leaf edges ->
    zero triangles; exercises the degree-orientation path where every
    edge points from leaf (low degree) to hub (high degree), so the
    hub generates NO wedges — the whole point of the orientation."""
    assert _tri(spark, [(0, i) for i in range(1, 30)]) == 0
    # Add one leaf-leaf edge -> exactly one triangle.
    assert _tri(spark, [(0, i) for i in range(1, 30)] + [(1, 2)]) == 1


def _persistent_ids(spark):
    """Ids of currently block-persisted RDDs. Asserting on id SETS (not
    the global count) keeps the test isolation-safe: earlier tests'
    leaked checkpoint RDDs may be GC'd by the ContextCleaner at any
    moment mid-test, so a count captured as 'base' can drift DOWN while
    this test runs (the deterministic round-4 full-suite failure)."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def test_release_round_state_frees_checkpoint_blocks(spark):
    """The iterative operators pin DISK_ONLY localCheckpoint RDDs that
    spark.catalog.clearCache() can NOT release (RDD-level persistence is
    invisible to the SQL CacheManager — the sf50 session-residency
    finding). release_round_state() must actually drop the operator's
    OWN checkpoint ids from getPersistentRDDs()."""
    from plc_data_etl_pipeline_spark.operators.dedup import (
        connected_components,
    )
    from plc_data_etl_pipeline_spark.operators.graph import (
        release_round_state,
        triangle_count,
    )

    base = _persistent_ids(spark)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (10, 11)], "a int, b int"
    )
    tri = triangle_count(edges)
    assert tri.collect()[0].n_triangles == 1
    mine = _persistent_ids(spark) - base
    assert mine  # the oriented-edge checkpoint is live
    assert release_round_state(tri) >= 1
    assert not (_persistent_ids(spark) & mine)

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a int, id_b int"
    )
    cc = connected_components(pairs)
    got = {(r.node, r.cluster_id) for r in cc.collect()}
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}
    # in-loop release already dropped superseded label rounds; only the
    # edge relation + final labels remain, and release drops those too
    mine = _persistent_ids(spark) - base
    assert release_round_state(cc) >= 1
    assert not (_persistent_ids(spark) & mine)

    # release on a frame without registered state is a harmless no-op
    assert release_round_state(edges) == 0


def test_registered_graph_queries_leave_no_resident_state(spark):
    """Round-4 verdict item 3: the REGISTERED graph queries must release
    their checkpoint blocks before returning, so ordinary sequential
    runs (driver sim, bench, sf50 probes) don't accumulate DISK_ONLY
    blocks query after query. Runs both wrappers back-to-back at
    sf0.001 and asserts no persisted RDD they created survives."""
    from plc_data_etl_pipeline_spark.registry import all_queries

    from .conftest import SF_DIR

    base = _persistent_ids(spark)
    q = all_queries()
    for name in (
        "graph_pagerank",
        "graph_triangle_count",
        "graph_label_propagation",
        "graph_components_fixpoint",
        "graph_components_altstar",
        "graph_bfs_hops",
        "graph_sssp_weighted",
        "multimodal_phash_clusters",
        "dedup_cluster_survivors",
    ):
        df = q[name].fn(spark, SF_DIR)
        assert df.count() > 0
        leaked = _persistent_ids(spark) - base
        assert not leaked, f"{name} left resident RDDs: {leaked}"


def test_min_label_propagation_path_graph(spark):
    """Planted semantics: on the path 10-11-12-13-14-15, k rounds of
    synchronous min-propagation give each node the MIN node id within
    k hops — checked exactly for k=1 and k=3 (k=3 also shows node 15
    NOT yet reaching 10: bounded, not full CC)."""
    from plc_data_etl_pipeline_spark.operators.graph import (
        min_label_propagation,
        release_round_state,
    )

    pairs = spark.createDataFrame(
        [(10, 11), (11, 12), (12, 13), (13, 14), (14, 15)], "a long, b long"
    )
    for rounds, expected in [
        (1, {10: 10, 11: 10, 12: 11, 13: 12, 14: 13, 15: 14}),
        (3, {10: 10, 11: 10, 12: 10, 13: 10, 14: 11, 15: 12}),
    ]:
        out = min_label_propagation(pairs, rounds=rounds)
        got = {r["node"]: r["lbl"] for r in out.collect()}
        release_round_state(out)
        assert got == expected, rounds


def test_fixpoint_lpa_planted_components(spark):
    """Run-to-convergence LPA on planted components: a 23-node chain
    (diameter >> checkpoint_every, forcing several checkpoint blocks +
    the delta-sum stopping rule), a triangle, and two isolated-pair
    components. Every node must end with the MIN id of its component —
    exact fixpoint, not a k-hop prefix — and the loop must stop well
    before max_rounds."""
    from plc_data_etl_pipeline_spark.operators.graph import (
        min_label_propagation_fixpoint,
        release_round_state,
    )

    chain = [(100 + i, 100 + i + 1) for i in range(22)]      # min 100
    tri = [(10, 11), (11, 12), (10, 12)]                     # min 10
    pair_a, pair_b = [(1, 2)], [(5, 6)]                      # min 1, 5
    pairs = spark.createDataFrame(
        chain + tri + pair_a + pair_b, "a long, b long"
    )
    base = _persistent_ids(spark)
    labels = min_label_propagation_fixpoint(pairs, max_rounds=50)
    got = {r["node"]: r["lbl"] for r in labels.collect()}
    want = {100 + i: 100 for i in range(23)}
    want.update({10: 10, 11: 10, 12: 10, 1: 1, 2: 1, 5: 5, 6: 5})
    assert got == want
    # chain diameter is 22: convergence needs >= 22 rounds; per-round
    # certification (round-7) detects it exactly one round later
    assert 22 <= labels._fixpoint_rounds <= 24
    # plan-lock: the returned frame is a materialized checkpoint — the
    # compiled plan carries NO join (lineage truncated), regardless of
    # how many rounds ran
    plan = labels._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    # in-loop release kept O(1) label checkpoints: only the edge
    # relation + the final labels block remain, and release drops them
    assert release_round_state(labels) >= 1
    assert not (_persistent_ids(spark) - base)


def test_fixpoint_lpa_stops_immediately_on_converged_input(spark):
    """A graph of isolated self-contained stars converges in one round;
    the stopping rule must fire at the FIRST checkpoint, not run to
    max_rounds."""
    from plc_data_etl_pipeline_spark.operators.graph import (
        min_label_propagation_fixpoint,
        release_round_state,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (10, 11), (10, 12)], "a long, b long"
    )
    labels = min_label_propagation_fixpoint(
        pairs, max_rounds=40, checkpoint_every=5
    )
    got = {r["node"]: r["lbl"] for r in labels.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}
    # block mode (k=5): converged after round 1; detected at the
    # second checkpoint (10)
    assert labels._fixpoint_rounds <= 10
    release_round_state(labels)

    # default per-round certification (round-7): converged after round
    # 1, detected at round 2 — no wasted checkpoint blocks
    labels = min_label_propagation_fixpoint(pairs, max_rounds=40)
    got = {r["node"]: r["lbl"] for r in labels.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10}
    assert labels._fixpoint_rounds == 2
    release_round_state(labels)


def test_graph_components_fixpoint_query_no_resident_state(spark):
    """The registered fixpoint query follows the same release discipline
    as the other graph wrappers (zero resident RDDs after return), and
    its result equals the bounded-LPA query's graph run to convergence:
    sanity-checked against brute-force components on sf0.001."""
    from plc_data_etl_pipeline_spark.registry import all_queries

    from .conftest import SF_DIR

    base = _persistent_ids(spark)
    df = all_queries()["graph_components_fixpoint"].fn(spark, SF_DIR)
    rows = df.collect()
    assert len(rows) > 0
    leaked = _persistent_ids(spark) - base
    assert not leaked, f"graph_components_fixpoint left {leaked}"
    # component sizes are consistent: n_customers + n_suppliers = n_nodes
    for r in rows:
        assert r["n_customers"] + r["n_suppliers"] == r["n_nodes"]


def test_fixpoint_lpa_require_convergence_raises_on_truncation(spark):
    """Round-6 review finding 4: an exhausted max_rounds with labels
    still changing must RAISE under require_convergence (the registered
    query's mode — its oracle is the true closure), never return a
    silently-truncated prefix; and the convergence flag reports the
    truncation in the permissive mode."""
    import pytest as _pytest

    from plc_data_etl_pipeline_spark.operators.graph import (
        min_label_propagation_fixpoint,
        release_round_state,
    )

    chain = spark.createDataFrame(
        [(100 + i, 100 + i + 1) for i in range(30)], "a long, b long"
    )
    with _pytest.raises(RuntimeError, match="not converged"):
        min_label_propagation_fixpoint(
            chain, max_rounds=5, require_convergence=True
        )
    trunc = min_label_propagation_fixpoint(chain, max_rounds=5)
    assert trunc._fixpoint_converged is False
    release_round_state(trunc)
    done = min_label_propagation_fixpoint(
        chain, max_rounds=60, require_convergence=True
    )
    assert done._fixpoint_converged is True
    assert {r["lbl"] for r in done.collect()} == {100}
    release_round_state(done)


def test_bfs_hops_planted_graph(spark):
    """BFS relaxation fixpoint on planted shapes: exact hop counts on a
    chain (forces many checkpoint blocks), sentinel distances for a
    disconnected component, convergence metadata, and zero resident
    RDDs after release."""
    from plc_data_etl_pipeline_spark.operators.graph import (
        UNREACHED,
        bfs_hops,
        release_round_state,
    )

    chain = [(i, i + 1) for i in range(12)]          # 0-1-...-12
    tri = [(50, 51), (51, 52), (50, 52)]             # unreachable
    pairs = spark.createDataFrame(chain + tri, "a long, b long")
    base = _persistent_ids(spark)
    dist = bfs_hops(pairs, source=0, max_rounds=40, require_convergence=True)
    got = {r["node"]: r["hops"] for r in dist.collect()}
    want = {i: i for i in range(13)}
    want.update({50: UNREACHED, 51: UNREACHED, 52: UNREACHED})
    assert got == want
    assert dist._fixpoint_converged is True
    assert 12 <= dist._fixpoint_rounds <= 20
    release_round_state(dist)
    assert not (_persistent_ids(spark) - base)
    # truncation raises under require_convergence
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="not converged"):
        bfs_hops(pairs, source=0, max_rounds=4, require_convergence=True)


def test_weighted_sssp_prefers_light_path_over_fewer_hops(spark):
    """bfs_hops(weight_col=...): on a planted graph where the direct
    edge 0-2 costs 10 but the detour 0-1-2 costs 2+3=5, the weighted
    relaxation must return 5 for node 2 (hop-count BFS would pick the
    direct edge), sentinel for a detached component, and exact sums
    along a weighted chain."""
    from plc_data_etl_pipeline_spark.operators.graph import (
        UNREACHED,
        bfs_hops,
        release_round_state,
    )

    pairs = spark.createDataFrame(
        [(0, 2, 10), (0, 1, 2), (1, 2, 3),   # triangle with heavy direct
         (2, 3, 7),                          # weighted tail
         (50, 51, 1)],                       # unreachable component
        "a long, b long, w long",
    )
    dist = bfs_hops(pairs, source=0, max_rounds=40,
                    require_convergence=True, weight_col="w")
    got = {r["node"]: r["hops"] for r in dist.collect()}
    release_round_state(dist)
    assert got == {0: 0, 1: 2, 2: 5, 3: 12,
                   50: UNREACHED, 51: UNREACHED}
    assert dist._fixpoint_converged is True


def test_bfs_hops_rejects_negative_and_null_weights(spark):
    """Round-8 ADVICE: a negative weight breaks the Bellman-Ford
    monotone-convergence certificate, a NULL weight silently never
    relaxes its edge — both must fail fast, before the fixpoint loop."""
    import pytest

    from plc_data_etl_pipeline_spark.operators.graph import bfs_hops

    neg = spark.createDataFrame(
        [(0, 1, 2), (1, 2, -1)], "a long, b long, w long"
    )
    with pytest.raises(ValueError, match="negative edge weight"):
        bfs_hops(neg, weight_col="w")

    nul = spark.createDataFrame(
        [(0, 1, 2), (1, 2, None)], "a long, b long, w long"
    )
    with pytest.raises(ValueError, match="NULL edge weight"):
        bfs_hops(nul, weight_col="w")


def test_bfs_hops_dist_cap_prunes_and_converges_early(spark):
    """Round-8 review: with dist_cap, nodes at distance >= cap read as
    UNREACHED and the fixpoint converges within <= cap rounds even when
    the hop diameter exceeds max_rounds — an uncapped run on the same
    chain would trip require_convergence. 10-edge weight-1 chain,
    cap=5, max_rounds=6."""
    import pytest

    from plc_data_etl_pipeline_spark.operators.graph import (
        UNREACHED,
        bfs_hops,
    )

    chain = spark.createDataFrame(
        [(i, i + 1, 1) for i in range(10)], "a long, b long, w long"
    )
    with pytest.raises(RuntimeError, match="not converged"):
        bfs_hops(chain, source=0, max_rounds=6,
                 require_convergence=True, weight_col="w")
    dist = {
        r["node"]: r["hops"]
        for r in bfs_hops(
            chain, source=0, max_rounds=6, require_convergence=True,
            weight_col="w", dist_cap=5,
        ).collect()
    }
    for node in range(11):
        if node < 5:
            assert dist[node] == node
        else:
            assert dist[node] >= UNREACHED, node


def test_altstar_cc_matches_lpa_on_random_and_planted_graphs(spark):
    """Alternating large-star/small-star CC (Kiveris'14) must produce
    EXACTLY the min-label fixpoint labels on planted shapes (chain,
    triangle, isolated pairs, self-loop singleton, duplicate edges) and
    on seeded random multigraphs — two different algorithms, one
    answer."""
    import random

    from plc_data_etl_pipeline_spark.operators.graph import (
        connected_components_altstar,
        min_label_propagation_fixpoint,
        release_round_state,
    )

    cases = [
        ("planted", [(100 + i, 100 + i + 1) for i in range(22)]
         + [(10, 11), (11, 12), (10, 12), (1, 2), (5, 6), (7, 7),
            (3, 9), (3, 9), (9, 3)]),
    ]
    for seed in (1, 2, 3, 4):
        rng = random.Random(seed)
        n = rng.randint(5, 150)
        m = rng.randint(3, 250)
        cases.append(
            (f"rand{seed}",
             [(rng.randrange(n), rng.randrange(n)) for _ in range(m)])
        )
    for tag, pairs_py in cases:
        pairs = spark.createDataFrame(pairs_py, "a long, b long")
        a = connected_components_altstar(pairs, require_convergence=True)
        b = min_label_propagation_fixpoint(
            pairs, max_rounds=400, require_convergence=True
        )
        ra = sorted(map(tuple, a.collect()))
        rb = sorted(map(tuple, b.collect()))
        release_round_state(a)
        release_round_state(b)
        assert ra == rb, f"{tag}: altstar != LPA fixpoint"


def test_altstar_cc_logarithmic_rounds_on_chain(spark):
    """THE reason the operator exists: a 300-edge chain (diameter 300)
    must collapse in O(log n) alternating rounds where min-label
    propagation needs one round per hop. Locks the round count so a
    semantics regression (e.g. a broken small-star) that still
    converges slowly gets caught."""
    from plc_data_etl_pipeline_spark.operators.graph import (
        connected_components_altstar,
        release_round_state,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(300)], "a long, b long"
    )
    labels = connected_components_altstar(pairs, require_convergence=True)
    got = {r["node"]: r["lbl"] for r in labels.collect()}
    release_round_state(labels)
    assert got == {i: 0 for i in range(301)}
    assert labels._fixpoint_converged
    assert labels._fixpoint_rounds <= 12, (
        f"chain300 took {labels._fixpoint_rounds} rounds — star "
        "rewriting should be logarithmic"
    )


def test_altstar_cc_require_convergence_raises_on_truncation(spark):
    """max_rounds too small for the graph: a silent non-star edge set
    must RAISE under require_convergence (the registered query's mode),
    never return partial labels against the true-closure oracle."""
    import pytest

    from plc_data_etl_pipeline_spark.operators.graph import (
        connected_components_altstar,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(300)], "a long, b long"
    )
    with pytest.raises(RuntimeError, match="not converged"):
        connected_components_altstar(
            pairs, max_rounds=2, require_convergence=True
        )
