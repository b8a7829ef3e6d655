"""Graph operators over DataFrame edge lists.

Connected components (min-label propagation) lives in operators/dedup.py
where dedup clustering consumes it; this module holds the general
iterative-join algorithms. Everything takes/returns DataFrames — an edge
list is just a two-column relation, so graph analytics inherit Spark's
partitioning, AQE, and shuffle machinery with no special runtime.

Determinism contract (for oracle checking and cross-run stability): ranks
are integer micro-units, damping is integer arithmetic
(``150000 + (85 * s) div 100``), contributions use integer division —
the trajectory is bit-identical under any aggregation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..catalog import release_local_checkpoint, shuffle_partitions


def _register_round_state(result: DataFrame, *ckpts: DataFrame) -> DataFrame:
    """Attach the localCheckpoint-ed intermediates an iterative operator
    pins to its returned frame, so callers can release them with
    :func:`release_round_state` once the result is consumed."""
    result._round_state = tuple(ckpts)
    return result


def release_round_state(df: DataFrame) -> int:
    """Unpersist the round-invariant checkpoint blocks behind an
    iterative graph/dedup result (pagerank, triangle_count,
    connected_components). Returns the number of RDDs released.

    WHY this exists (sf50 session-residency finding, BASELINE.md): the
    DISK_ONLY edge checkpoints stay resident until session end because
    the returned frame's lineage references them, and
    ``spark.catalog.clearCache()`` does NOT touch them — localCheckpoint
    persistence is RDD-level, invisible to the SQL CacheManager
    (verified: getPersistentRDDs() unchanged across clearCache()).
    Call this AFTER the result has been consumed (collected / written):
    local checkpoints truncate lineage, so a released frame cannot be
    recomputed. No-op on frames without registered state."""
    released = 0
    for ckpt in getattr(df, "_round_state", ()):
        released += _unpersist_ckpt(ckpt)
    return released


def finalize_round_result(result: DataFrame, state: DataFrame) -> DataFrame:
    """Materialize a SMALL (top-k / scalar-aggregate) iterative-operator
    result, release the operator's pinned checkpoint blocks, and return
    the rows as a local-relation frame with the identical schema.

    This is the adoption point for :func:`release_round_state` in the
    registered query wrappers (round-4 verdict item 3): without it,
    ordinary sequential runs (driver, bench, sf50 probes) accumulate one
    DISK_ONLY edge-checkpoint per graph query until session end, because
    the returned frame's lineage pins them and ``clearCache()`` cannot
    see RDD-level persistence. The collect is bounded by construction —
    callers return LIMIT-k or single-row aggregates — so this is NOT a
    scale hazard; a released frame can no longer be recomputed, hence
    materialize-first. ``state`` is the frame carrying ``_round_state``
    (the raw operator output), which may differ from ``result`` because
    derived frames don't inherit Python-side attributes."""
    rows = result.collect()
    release_round_state(state)
    return result.sparkSession.createDataFrame(rows, result.schema)


# Shared with pipeline/txlog.py via the neutral catalog layer; the
# private alias keeps this module's call sites and tests stable.
_unpersist_ckpt = release_local_checkpoint


def undirected_edges(pairs: DataFrame, carry: tuple = ()) -> DataFrame:
    """(a, b) pair list -> (src, dst) with both directions — the shared
    first step of every undirected iterative operator here. ``carry``
    names extra pair columns (e.g. an edge weight) copied onto BOTH
    directions."""
    extra = [F.col(c) for c in carry]
    return pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), *extra
    ).unionAll(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"), *extra)
    )


def pagerank(
    pairs: DataFrame,
    iterations: int = 3,
    damping_pct: int = 85,
    checkpoint_every: int = 5,
    degree_cols: tuple[str, str] | None = None,
) -> DataFrame:
    """Integer-deterministic PageRank over an UNDIRECTED pair list.

    ``pairs`` must have columns (a, b); each row is one undirected edge
    (deduplicate first if multiplicity should not weight the walk).
    Returns (node, pr) with pr in micro-units (1_000_000 = initial mass
    per node). Every node appearing in ``pairs`` has degree >= 1, so no
    dangling-mass correction is needed.

    Scale posture: each round is one equi-join edge⋈rank on the source
    key plus a map-side-combinable SUM per destination. The edge
    relation is hash-repartitioned on ``src`` (to exactly
    ``spark.sql.shuffle.partitions``, so ENSURE_REQUIREMENTS recognizes
    the layout) and then localCheckpoint-ed once: the LogicalRDD
    preserves that output partitioning, so every iteration's join
    shuffles ONLY the (node-sized) rank side — the edge relation, the
    big side at 100 TB, never moves again. Without the checkpoint,
    round k's plan would also re-derive the edge aggregation k+1 times.
    The rank join is hinted SHUFFLE_HASH: after checkpointing, Catalyst
    has no stats — unhinted it may try to broadcast the (arbitrarily
    large) edge side and OOM; hinted merge it would re-sort the edges
    every round. Ranks are re-checkpointed every ``checkpoint_every``
    rounds to bound lineage depth (the GraphX/ALS pattern).

    ``degree_cols=(deg_a, deg_b)`` names pair columns holding each
    endpoint's PRECOMPUTED node degree (its total incident-pair count
    across the whole pair list — the caller must guarantee exactly what
    the fallback computes). Round-8 continuation: when the pair source
    is a shared session materialization that already carries degrees
    (queries/graph.py::_trade_pairs with_degrees), the pre-checkpoint
    subtree collapses from union → degree groupBy shuffle → edge⋈degree
    join → repartition (3 exchanges) to explode → repartition (1
    exchange), and the rank init reuses the checkpointed, src-partitioned
    edges exchange-free."""
    n_shuffle = shuffle_partitions(pairs.sparkSession)
    if degree_cols is not None:
        da, db = degree_cols
        a, b = F.col("a"), F.col("b")
        # One reference to `pairs`, both directions via array+explode
        # (no union: union branches would evaluate the source twice).
        e = F.array(
            F.struct(a.alias("src"), b.alias("dst"), F.col(da).alias("d")),
            F.struct(b.alias("src"), a.alias("dst"), F.col(db).alias("d")),
        )
        edges_deg = pairs.select(F.explode(e).alias("e")).select("e.*")
        deg = None
    else:
        edges = undirected_edges(pairs)
        deg = edges.groupBy("src").agg(F.count("*").alias("d"))
        edges_deg = edges.join(deg, "src")
    edges_deg = (
        edges_deg.repartition(n_shuffle, "src")
        # DISK_ONLY: the edge relation is the big side (2|E| rows). At
        # heap-bound scale the default MEMORY_AND_DISK blocks compete
        # with every round's join/agg execution memory — the sf20 audit
        # OOM'd the 16g JVM when two graph queries' resident edge blocks
        # coexisted. Rounds re-read it sequentially from local disk
        # (page-cached), while heap stays free for shuffle state.
        .localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    )
    if deg is None:
        # Node set from the checkpointed edges: HashPartitioning(src)
        # is preserved, so the distinct is exchange-free.
        deg = edges_deg.select("src").distinct()
    ranks = deg.select("src", F.lit(1000000).cast("bigint").alias("pr"))
    pinned = [edges_deg]
    for i in range(iterations):
        ranks = (
            edges_deg.join(ranks.hint("shuffle_hash"), "src")
            .groupBy("dst")
            .agg(F.sum(F.expr("pr div d")).alias("c"))
            .select(
                F.col("dst").alias("src"),
                (
                    F.lit(1000000 - damping_pct * 10000)
                    + F.expr(f"({damping_pct} * c) div 100")
                )
                .cast("bigint")
                .alias("pr"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=False)
            pinned.append(ranks)
    return _register_round_state(
        ranks.select(F.col("src").alias("node"), "pr"), *pinned
    )


def triangle_count(
    edges: DataFrame, with_edge_count: bool = False
) -> DataFrame:
    """Exact triangle count over an undirected simple edge list.

    ``edges`` must have columns (a, b) with one row per undirected edge
    and no duplicates/self-loops (a != b; (a,b) unique under a < b —
    normalize upstream if needed).

    ``with_edge_count=True`` returns (n_edges, n_triangles) instead of
    just (n_triangles,), with n_edges counted from the CHECKPOINTED
    oriented relation. Orientation is a bijection on edges (each
    undirected pair passes the ord filter in exactly one direction, the
    ord packing is a total order, and a != b), so the count is
    identical to COUNT(*) over ``edges`` — but a caller-side
    ``edges.agg(count)`` would re-run the whole (expensive,
    un-materialized) upstream edge pipeline a SECOND time, because only
    the operator's internal checkpoint memoizes it (round-8: the
    graph_triangle_count wrapper did exactly that — the support-agg
    self-join ran twice per query; guide §2.4, one computation per
    keyed pipeline).

    Algorithm: degree-ordered orientation. Each edge is directed from
    its lower-(degree, id) endpoint to the higher one, so every wedge
    join fans out from the LOW-degree endpoint: the per-node out-degree
    is bounded by O(sqrt(m)) on any graph (arboricity bound), which is
    what keeps the wedge blowup survivable on power-law graphs at 100 TB
    — a plain id-ordered orientation would enumerate celebrity-hub
    wedges quadratically. Each triangle {x,y,z} with ord(x)<ord(y)<ord(z)
    is counted exactly once, as wedge (x->y, x->z) closed by edge y->z.

    Plan: degree agg (one shuffle on node) -> orientation map -> wedge
    self-join on src -> closing semi-join on (dst1, dst2). All equi-key
    shuffle joins; no driver-side state.
    """
    both = edges.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        edges.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    # Total order: degree-major, id-minor, packed into one BIGINT
    # (ids must fit in 32 bits; degrees do by construction).
    deg = both.groupBy("u").agg(F.count("*").alias("d"))
    ordv = deg.select(
        "u", (F.col("d") * F.lit(4294967296) + F.col("u")).alias("ord")
    )
    ou = ordv.select(F.col("u"), F.col("ord").alias("ord_u"))
    ov = ordv.select(F.col("u").alias("v"), F.col("ord").alias("ord_v"))
    oriented = (
        both.join(ou, "u")
        .join(ov, "v")
        .where(F.col("ord_u") < F.col("ord_v"))
        .select(
            F.col("u").alias("src"),
            F.col("v").alias("dst"),
            F.col("ord_v").alias("ord_dst"),
        )
    )
    # Materialize the oriented edges ONCE — they feed three consumers
    # (both wedge sides + the closing set); un-checkpointed, the plan
    # re-runs the degree agg and both orientation joins three times.
    # Pre-partitioning on src makes the wedge self-join exchange-free:
    # both sides inherit the preserved HashPartitioning(src).
    n_shuffle = shuffle_partitions(edges.sparkSession)
    oriented = oriented.repartition(n_shuffle, "src").localCheckpoint(
        # eager=False: plan-only consumers (explain audits, dry runs)
        # must not trigger the degree-agg + orientation joins; the
        # checkpoint still materializes exactly once at first action.
        eager=False,
        storageLevel=StorageLevel.DISK_ONLY,  # big side; see pagerank note
    )
    e1 = oriented.select(
        F.col("src"), F.col("dst").alias("b"), F.col("ord_dst").alias("ord_b")
    )
    e2 = oriented.select(
        F.col("src"), F.col("dst").alias("c"), F.col("ord_dst").alias("ord_c")
    )
    wedges = e1.join(e2, "src").where(F.col("ord_b") < F.col("ord_c"))
    closing = oriented.select(
        F.col("src").alias("b"), F.col("dst").alias("c")
    )
    tri = wedges.join(closing, ["b", "c"], "left_semi")
    n_tri = tri.agg(F.count("*").cast("bigint").alias("n_triangles"))
    if with_edge_count:
        n_edges = oriented.agg(
            F.count("*").cast("bigint").alias("n_edges")
        )
        n_tri = n_edges.crossJoin(n_tri)
    return _register_round_state(n_tri, oriented)


def min_label_propagation(pairs: DataFrame, rounds: int = 3) -> DataFrame:
    """Synchronous min-label propagation over an UNDIRECTED pair list:
    ``label_{t+1}(v) = min(label_t(v), min_{u in N(v)} label_t(u))``
    from ``label_0(v) = v``. After k rounds a node's label is exactly
    the minimum node id within k hops — a DETERMINISTIC, bounded-round
    community assignment (the k-round prefix of connected components;
    classic LPA's random tie-breaking is replaced by MIN so two engines
    can agree bitwise).

    Scale posture (same as :func:`pagerank`): the undirected edge
    relation is hash-partitioned on ``src`` and localCheckpoint-ed ONCE
    (DISK_ONLY — the big side never re-shuffles and stays off-heap);
    with SELF-LOOPS appended so the carried self-label rides the same
    join (one reference to the label frame per round — a join+union
    form would double the compiled plan every round); each round is
    one shuffle-hash edge⋈label join + a map-side-combinable MIN. No
    driver
    state; lineage is bounded by the round count (bounded here; at
    real depth re-checkpoint labels every ~5 rounds like pagerank).
    Returns (node, lbl); round state registered for release."""
    edges = undirected_edges(pairs)
    # Self-loop edges carry each node's OWN label through the join, so
    # every round references `labels` exactly ONCE — a join + union
    # formulation would reference it twice and the compiled plan would
    # double every round (2^rounds subtrees; verified 7 joins instead
    # of 3 at rounds=3 before this form, with only fragile AQE
    # stage-reuse collapsing the duplicates).
    selfloops = edges.select("src").distinct().select(
        "src", F.col("src").alias("dst")
    )
    n_shuffle = shuffle_partitions(pairs.sparkSession)
    edges_p = (
        edges.unionByName(selfloops)
        .repartition(n_shuffle, "src")
        .localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    )
    # Initial labels read the CHECKPOINTED relation, not the raw pair
    # build — otherwise round 1's label side re-derives the (possibly
    # expensive) edge aggregation a second time (measured 2.2x at sf1).
    labels = (
        edges_p.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
    )
    for _ in range(rounds):
        labels = (
            edges_p.join(
                labels.hint("shuffle_hash"),
                edges_p["src"] == labels["node"],
            )
            .select(F.col("dst").alias("node"), "lbl")
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
        )
    return _register_round_state(labels, edges_p)


def min_label_propagation_fixpoint(
    pairs: DataFrame,
    max_rounds: int = 50,
    checkpoint_every: int = 1,
    require_convergence: bool = False,
) -> DataFrame:
    """MIN-label propagation run TO CONVERGENCE — connected components
    as a fixpoint computation (the run-to-convergence mode
    :func:`min_label_propagation`'s bounded-round docstring prescribes).
    Returns (node, lbl) where lbl is the minimum node id in the node's
    connected component; ``result._fixpoint_rounds`` records how many
    rounds actually ran.

    Iteration shape per round is identical to the bounded operator (the
    self-loop-augmented checkpointed edge relation, one shuffle-hash
    edge⋈label join + map-side MIN). The fixpoint machinery adds:

    * **Label re-checkpoint every ``checkpoint_every`` rounds** — the
      periodic lineage truncation the bounded operator's docstring
      prescribes for real depth. The default is EVERY round
      (Pregel-style): each round's materialization is node-sized while
      an undetected extra round costs an edge-sized join+shuffle, so
      per-round certification strictly wins at scale (round-7: the
      factor-50 bfs wall was 10 rounds to certify convergence on a
      diameter-2 component; per-round detection runs 3). A larger
      ``checkpoint_every`` pipelines k rounds into one job — only
      worth it when job-scheduling overhead rivals a round's shuffle,
      i.e. on tiny graphs where none of this matters.
    * **A monotone convergence certificate, checked at checkpoints**:
      labels only ever DECREASE (each round takes a MIN over
      self + neighbors), so the global SUM of labels strictly
      decreases in any round that changes a node and is constant
      exactly at the fixpoint. Equal sums across one checkpoint block
      therefore prove every round in the block was a no-op — one cheap
      scalar aggregate on the just-materialized labels, no
      frame-vs-frame diff join. (Exact decimal(38,0) sum: no overflow,
      no float ties.) The sum-equality IS the empty-frontier test:
      with per-round checkpoints the loop stops exactly one round
      after the frontier empties; with blocks of k the detection lag
      is at most 2k - 1 wasted-but-correct rounds (convergence just
      after a checkpoint keeps the NEXT block's sum unequal to its
      predecessor's, so the equality fires one block later).
    * **In-loop release of superseded label checkpoints**: only the
      newest label materialization stays resident, so a deep run holds
      O(1) checkpoint blocks, not O(rounds) — the sequential
      session-residency discipline (release_round_state) applied
      INSIDE the loop. The edge relation stays pinned for the whole
      run (every round reads it) and is registered for release with
      the result.

    Scale posture: identical per-round cost to bounded LPA — the edge
    relation never re-shuffles; convergence adds one node-sized
    aggregate per checkpoint. Worst-case round count is the graph
    diameter; ``max_rounds`` bounds pathological chains. If the loop
    exhausts max_rounds while the final block still changed labels,
    the result is only the max_rounds-hop prefix:
    ``result._fixpoint_converged`` reports which, and
    ``require_convergence=True`` makes that case RAISE instead of
    returning silently-truncated labels (round-6 review — the
    registered query uses it, since its oracle is the true closure).
    """
    edges = undirected_edges(pairs)
    selfloops = edges.select("src").distinct().select(
        "src", F.col("src").alias("dst")
    )
    n_shuffle = shuffle_partitions(pairs.sparkSession)
    edges_p = (
        edges.unionByName(selfloops)
        .repartition(n_shuffle, "src")
        .localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    )
    labels = (
        edges_p.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("lbl"))
    )

    def lbl_sum(df: DataFrame):
        row = df.agg(
            F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
        ).collect()[0]
        return row["s"]

    prev_sum = lbl_sum(labels)  # materializes the edge checkpoint too
    rounds_run = 0
    converged = False
    label_ckpt: DataFrame | None = None
    for r in range(1, max_rounds + 1):
        labels = (
            edges_p.join(
                labels.hint("shuffle_hash"),
                edges_p["src"] == labels["node"],
            )
            .select(F.col("dst").alias("node"), "lbl")
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
        )
        rounds_run = r
        if r % checkpoint_every == 0 or r == max_rounds:
            new_ckpt = labels.localCheckpoint(eager=False)
            s = lbl_sum(new_ckpt)  # the materializing action
            if label_ckpt is not None:
                _unpersist_ckpt(label_ckpt)  # release superseded round
            label_ckpt = new_ckpt
            labels = new_ckpt
            if s == prev_sum:
                converged = True
                break  # whole block was a no-op: fixpoint reached
            prev_sum = s
    if require_convergence and not converged:
        if label_ckpt is not None:
            _unpersist_ckpt(label_ckpt)
        _unpersist_ckpt(edges_p)
        raise RuntimeError(
            f"min_label_propagation_fixpoint: not converged after "
            f"{max_rounds} rounds (labels still changing in the final "
            "checkpoint block); raise max_rounds — returning the "
            "prefix would silently mislabel components"
        )
    out = _register_round_state(
        labels, *([edges_p, label_ckpt] if label_ckpt is not None else [edges_p])
    )
    out._fixpoint_rounds = rounds_run
    out._fixpoint_converged = converged
    return out


def connected_components_altstar(
    pairs: DataFrame,
    max_rounds: int = 40,
    require_convergence: bool = False,
) -> DataFrame:
    """Connected components via ALTERNATING large-star / small-star
    edge rewriting (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii,
    "Connected Components in MapReduce and Beyond", SoCC 2014) — the
    O(log n)-round counterpart of :func:`min_label_propagation_fixpoint`,
    whose round count is the component DIAMETER. On the small-diameter
    trade graph LPA wins (2-3 certified rounds, one edge⋈label shuffle
    each); on a high-diameter graph (chains, lattices, road networks —
    routine in entity-resolution dedup graphs) LPA needs diameter
    rounds while star rewriting collapses any component in logarithmic
    rounds. Both are registered so the A/B is measured, not assumed
    (BASELINE.md round-8).

    Per round (one L then one S step):

    * **large-star(u)**: with m(u) = min(N(u) ∪ {u}), emit (v, m(u))
      for every neighbor v > u — strictly-larger neighbors re-hang
      under the local minimum.
    * **small-star(u)**: emit (v, m(u)) for every v ∈ {u} ∪
      {n ∈ N(u) : n < u}, v ≠ m(u) — path-halving over the
      parent-pointer edges large-star leaves behind.

    Both steps preserve connectivity (paper lemmas 3.1/3.2) and their
    common fixpoint is a star forest rooted at each component's
    minimum node id. Each step is one groupBy(center) for the local
    minima + one co-keyed join + DISTINCT — three shuffles per round,
    every one keyed on the node id, nothing driver-sized. Edge
    multiplicity is bounded by the DISTINCT; the transient edge count
    never exceeds O(n + m) (paper Thm 4).

    Convergence: a (count, Σnode, Σparent) scalar fingerprint per
    round (exact decimal sums — no float ties) pre-filters, and a
    fingerprint match is then CERTIFIED by an exact set-equality
    anti-join plus a star-forest check (no parent may itself be a
    child) — so a fingerprint collision or a hypothetical L/S
    oscillation raises instead of silently mislabeling. Returns
    (node, lbl) with ``_fixpoint_rounds`` / ``_fixpoint_converged``
    like the LPA twin.
    """
    all_edges = undirected_edges(pairs)
    # node set BEFORE dropping self-loops: a self-loop-only node is a
    # singleton component (label = itself), exactly as the LPA twin's
    # self-loop augmentation treats it (equivalence pytest-locked).
    nodes_p = (
        all_edges.select(F.col("src").alias("node"))
        .distinct()
        .localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    )
    edges = all_edges.filter(F.col("src") != F.col("dst"))
    # canonical working set: one row per undirected edge {x, y} as
    # (node, parent) with parent < node — both L and S emit edges in
    # exactly this orientation, so round 0 just canonicalizes.
    work = (
        edges.filter(F.col("src") > F.col("dst"))
        .select(F.col("src").alias("node"), F.col("dst").alias("parent"))
        .distinct()
    )

    def fingerprint(df: DataFrame):
        row = df.agg(
            F.count("*").alias("n"),
            F.sum(F.col("node").cast("decimal(38,0)")).alias("sn"),
            F.sum(F.col("parent").cast("decimal(38,0)")).alias("sp"),
        ).collect()[0]
        return (row["n"], row["sn"], row["sp"])

    def star_step(df: DataFrame, large: bool) -> DataFrame:
        adj = df.select(
            F.col("node").alias("u"), F.col("parent").alias("n")
        ).unionAll(
            df.select(F.col("parent").alias("u"), F.col("node").alias("n"))
        )
        mmin = adj.groupBy("u").agg(
            F.least(F.min("n"), F.first("u")).alias("m")
        )
        if large:
            out = (
                adj.filter(F.col("n") > F.col("u"))
                .join(mmin, "u")
                .select(F.col("n").alias("node"), F.col("m").alias("parent"))
            )
        else:
            out = (
                adj.filter(F.col("n") < F.col("u"))
                .select("u", F.col("n").alias("v"))
                .unionAll(adj.select("u", F.col("u").alias("v")).distinct())
                .join(mmin, "u")
                .filter(F.col("v") != F.col("m"))
                .select(F.col("v").alias("node"), F.col("m").alias("parent"))
            )
        return out.distinct()

    work_ckpt = work.localCheckpoint(eager=False)
    prev_fp = fingerprint(work_ckpt)
    work = work_ckpt
    rounds_run = 0
    converged = False
    for r in range(1, max_rounds + 1):
        new = star_step(star_step(work, large=True), large=False)
        new_ckpt = new.localCheckpoint(eager=False)
        fp = fingerprint(new_ckpt)  # the materializing action
        rounds_run = r
        if fp == prev_fp:
            # certify: equal counts + empty one-sided difference of two
            # DISTINCT sets => set equality; then star-forest shape.
            diff = new_ckpt.join(
                work, ["node", "parent"], "left_anti"
            ).count()
            two_level = new_ckpt.alias("c").join(
                new_ckpt.alias("p"),
                F.col("c.parent") == F.col("p.node"),
                "left_semi",
            ).count()
            if diff == 0 and two_level == 0:
                _unpersist_ckpt(work)
                work = new_ckpt
                converged = True
                break
        _unpersist_ckpt(work)
        work = new_ckpt
        prev_fp = fp
    if require_convergence and not converged:
        _unpersist_ckpt(work)
        _unpersist_ckpt(nodes_p)
        raise RuntimeError(
            f"connected_components_altstar: not converged after "
            f"{max_rounds} alternating rounds — raise max_rounds; "
            "returning a non-star edge set would mislabel components"
        )
    labels = (
        nodes_p.join(work, "node", "left")
        .select("node", F.coalesce("parent", "node").alias("lbl"))
        .groupBy("node")
        .agg(F.min("lbl").alias("lbl"))
    )
    out = _register_round_state(labels, nodes_p, work)
    out._fixpoint_rounds = rounds_run
    out._fixpoint_converged = converged
    return out


UNREACHED = 1 << 40  # sentinel distance: > any real hop count


def bfs_hops(
    pairs: DataFrame,
    source: int | None = None,
    max_rounds: int = 50,
    checkpoint_every: int = 1,
    require_convergence: bool = False,
    weight_col: str | None = None,
    dist_cap: int | None = None,
) -> DataFrame:
    """Single-source BFS hop distances over an UNDIRECTED pair list —
    the relaxation fixpoint ``dist_{t+1}(v) = min(dist_t(v),
    min_{u in N(v)} dist_t(u) + 1)`` from ``dist_0(source) = 0``,
    everything else the UNREACHED sentinel. ``source=None`` means the
    graph's minimum node id, computed from the already-checkpointed
    edge relation (one node-sized aggregate — no second derivation of
    the possibly-expensive pair build, round-6 review). Returns (node, hops) with
    ``hops = UNREACHED`` for nodes in other components (callers decide
    how to present unreachability).

    ``weight_col`` generalizes to weighted SSSP (distributed
    Bellman-Ford): the self-loop edges carry weight 0 (so a node's own
    distance rides the same join — the linear-plan trick of
    min_label_propagation), real edges carry ``pairs[weight_col]``
    (non-negative integers; both directions get the same weight), and
    the identical relaxation fixpoint yields minimum path WEIGHTS
    instead of hop counts. Convergence needs at most
    (longest shortest-path HOP count + 1) rounds regardless of
    weights, and the monotone-sum certificate is unchanged —
    distances only ever decrease.

    Same fixpoint machinery as :func:`min_label_propagation_fixpoint`
    and the same guarantees: distances are monotone non-increasing, so
    the exact decimal sum is a convergence certificate checked at each
    label re-checkpoint (per-ROUND by default, so the loop stops one
    round after the frontier empties; with blocks of k the lag is <=
    2k - 1 rounds); superseded distance checkpoints are
    released in-loop; ``require_convergence=True`` raises on
    max_rounds truncation; ``result._fixpoint_rounds`` /
    ``result._fixpoint_converged`` report what happened. Per round: one
    shuffle-hash join against the never-re-shuffled edge relation +
    one map-side-combinable MIN.

    ``dist_cap`` prunes the relaxation at a distance ceiling: any
    relaxed value >= cap collapses to the UNREACHED sentinel, so nodes
    farther than the cap read as unreachable AND the fixpoint converges
    within <= cap rounds regardless of hop diameter (round-8 review: a
    >max_rounds-hop chain otherwise keeps relaxing past the cap and
    trips require_convergence even though every capped node's answer is
    already decided). Sound because every node with true distance < cap
    has a shortest path whose prefixes are all < cap (non-negative
    weights), so pruning never cuts a surviving node's path."""
    if weight_col is None:
        edges = undirected_edges(pairs).withColumn("w", F.lit(1))
    else:
        edges = undirected_edges(
            pairs.withColumn("w", F.col(weight_col).cast("bigint")),
            carry=("w",),
        )
    selfloops = (
        edges.select("src")
        .distinct()
        .select("src", F.col("src").alias("dst"), F.lit(0).alias("w"))
    )
    n_shuffle = shuffle_partitions(pairs.sparkSession)
    edges_p = (
        edges.unionByName(selfloops)
        .repartition(n_shuffle, "src")
        .localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
    )
    if weight_col is not None:
        # One cheap guard pass over the CHECKPOINTED relation (it doubles
        # as the checkpoint's materializing action, so the expensive edge
        # build still runs once; validation style of merge_apply_changes'
        # key-type guard): a negative weight breaks the monotone-sum
        # convergence certificate and the Bellman-Ford round bound
        # (distances declared converged while still wrong), and a NULL
        # weight makes its edge silently never relax — both must fail
        # loudly, not converge quietly. Self-loop rows carry literal 0,
        # so they can mask neither check.
        chk = edges_p.agg(
            F.min("w").alias("mn"),
            (F.count("*") - F.count("w")).alias("n_null"),
        ).collect()[0]
        if chk["n_null"]:
            raise ValueError(
                f"bfs_hops: {chk['n_null']} NULL edge weight(s) in "
                f"{weight_col!r} — a NULL weight never relaxes its edge; "
                "filter or impute upstream"
            )
        if chk["mn"] is not None and chk["mn"] < 0:
            raise ValueError(
                f"bfs_hops: negative edge weight {chk['mn']} in "
                f"{weight_col!r} — Bellman-Ford's monotone convergence "
                "certificate requires non-negative weights"
            )
    nodes = edges_p.select(F.col("src").alias("node")).distinct()
    if source is None:
        source = nodes.agg(F.min("node")).collect()[0][0]
    dist = nodes.select(
        "node",
        F.when(F.col("node") == source, F.lit(0))
        .otherwise(F.lit(UNREACHED))
        .cast("bigint")
        .alias("d"),
    )

    def dist_sum(df: DataFrame):
        return df.agg(
            F.sum(F.col("d").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]

    prev_sum = dist_sum(dist)
    rounds_run = 0
    converged = False
    ckpt: DataFrame | None = None
    for r in range(1, max_rounds + 1):
        dist = (
            edges_p.join(
                dist.hint("shuffle_hash"), edges_p["src"] == dist["node"]
            )
            .select(
                F.col("dst").alias("node"),
                # relax through the edge; sentinel stays sentinel so
                # unreached mass never inflates reachable distances,
                # and values at/past dist_cap collapse to the sentinel
                F.when(
                    F.col("d") + F.col("w")
                    >= F.lit(dist_cap if dist_cap is not None
                             else UNREACHED),
                    F.lit(UNREACHED),
                )
                .otherwise(F.col("d") + F.col("w"))
                .cast("bigint")
                .alias("d"),
            )
            .groupBy("node")
            .agg(F.min("d").alias("d"))
        )
        rounds_run = r
        if r % checkpoint_every == 0 or r == max_rounds:
            new_ckpt = dist.localCheckpoint(eager=False)
            s = dist_sum(new_ckpt)
            if ckpt is not None:
                _unpersist_ckpt(ckpt)
            ckpt = new_ckpt
            dist = new_ckpt
            if s == prev_sum:
                converged = True
                break
            prev_sum = s
    if require_convergence and not converged:
        if ckpt is not None:
            _unpersist_ckpt(ckpt)
        _unpersist_ckpt(edges_p)
        raise RuntimeError(
            f"bfs_hops: not converged after {max_rounds} rounds; raise "
            "max_rounds (graph eccentricity from the source exceeds it)"
        )
    out = _register_round_state(
        dist.select("node", F.col("d").alias("hops")),
        *([edges_p, ckpt] if ckpt is not None else [edges_p]),
    )
    out._fixpoint_rounds = rounds_run
    out._fixpoint_converged = converged
    return out
