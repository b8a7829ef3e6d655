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


def test_triangle_count_star_hub(spark):
    """Star graph: the hub has max degree but no leaf-leaf edges ->
    zero triangles; exercises the degree-orientation path where every
    edge points from leaf (low degree) to hub (high degree), so the
    hub generates NO wedges — the whole point of the orientation."""
    assert _tri(spark, [(0, i) for i in range(1, 30)]) == 0
    # Add one leaf-leaf edge -> exactly one triangle.
    assert _tri(spark, [(0, i) for i in range(1, 30)] + [(1, 2)]) == 1
