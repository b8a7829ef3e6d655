"""Embedding similarity search (BASELINE.json north star).

* ``cosine_topk``      — brute-force top-k for a bounded query set against
                         the full corpus (the exactness baseline and the
                         oracle-checkable variant). Arrow ``mapInPandas``
                         corpus scan; ``cosine_topk_fold`` is the
                         bit-identical all-JVM twin.
* ``lsh_ann_topk``     — random-hyperplane LSH bucketing: each vector maps
                         to a sign-bit bucket; search touches only the
                         query's bucket (multi-probe over Hamming-1
                         neighbors for recall). The 100 TB path: bucket
                         count scales with corpus size, the per-bucket
                         scan is a bucket-equi-join, never a cross join.

Float determinism (oracle parity): dot products are a SEQUENTIAL left
fold over per-element double products — both engines execute the exact
same IEEE op sequence (Spark ``aggregate`` with a 0.0 seed; DuckDB
``list_reduce`` seeded with the first element — identical because
0.0 + p0 == p0), so the raw doubles are bit-identical WITHOUT the
decimal-accumulation cost (~5x faster; verified bitwise at sf0.01).
Per-element float*float widened to double is exact (24+24 < 53 mantissa
bits). Norms/cosines then divide bit-identical doubles.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..queries import _conv


def dot_fold(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two float arrays, as DOUBLE.

    Bit-identical to DuckDB's
    ``list_reduce([CAST(a[i] AS DOUBLE) * CAST(b[i] AS DOUBLE) FOR i IN
    range(1, len(a)+1)], (x, y) -> x + y)`` — same op sequence.
    """
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm_fold(a: Column) -> Column:
    return F.sqrt(dot_fold(a, a))


def valid_vectors(emb: DataFrame, vec_col: str) -> DataFrame:
    """Rows whose vector has a defined cosine: non-NULL and not all-zero.
    Shared by the exact-first dedup paths — degenerate vectors can never
    pass a cosine threshold, so excluding them up front preserves the
    pairwise semantics while keeping them out of identity grouping."""
    return emb.filter(
        F.col(vec_col).isNotNull() & F.exists(F.col(vec_col), lambda x: x != 0)
    )


def cosine(a: Column, b: Column) -> Column:
    """NULL (not a crash) for zero-norm vectors: try_divide keeps ANSI
    mode intact while degenerate embeddings drop out of >= filters and
    top-k ranking on both engines (DuckDB's 0/0 double is NaN, equally
    excluded by comparisons)."""
    return F.try_divide(dot_fold(a, b), norm_fold(a) * norm_fold(b))


def cosine_topk(
    emb: DataFrame,
    query_max_id: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector (``id <
    query_max_id``) against the whole corpus — Arrow scan path.

    Degenerate rows (NULL or all-zero vectors) are excluded up front on
    BOTH sides — cosine is undefined for them (NaN/NULL in every
    engine), and a NULL vector would crash the Arrow np.stack.

    The bounded query set (Q rows; the classic ANN-benchmark shape) is
    collected once and closed over by a ``mapInPandas`` scorer, so the
    corpus is scanned ONCE with no join and no shuffle of vectors: Arrow
    ships each corpus partition to Python a single time and only (query,
    neighbor, score) scalars come back — Q x N_partition_rows numpy
    flops per batch instead of a Q x N joined-pair relation carrying
    both 64-float arrays through the plan. The per-query top-k is a
    windowed rank; Spark >= 3.5 pushes a WindowGroupLimit below the
    shuffle, so each map task forwards only k rows per query.

    Bit-exactness (oracle parity): scores accumulate dimension-by-
    dimension in float64 (``acc = acc + q_i * c_i`` vectorized across
    rows), the SAME sequential IEEE op order as ``dot_fold`` / DuckDB's
    ``list_reduce`` — verified identical to the JVM fold path by
    tests/test_extensions.py.
    """
    import pandas as pd

    # Bounded by construction (Q = query_max_id rows), like the IVF
    # centroid sample: the corpus side stays fully distributed.
    emb = valid_vectors(emb, vec_col)  # BEFORE the query collect too:
    # a NULL query vector would TypeError in qmat construction, and a
    # zero-norm query would rank NaN-first garbage rows.
    qrows = (
        emb.filter(F.col(id_col) < query_max_id)
        .select(id_col, vec_col)
        .collect()
    )
    qids = [r[id_col] for r in qrows]
    if not qrows:
        # empty query set (round-8 empty-input sweep): nothing to rank
        return emb.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cosine_sim double, "
                "rank int"
        )
    qmat = np.array([[float(x) for x in r[vec_col]] for r in qrows])

    def _seq_norm(mat: np.ndarray) -> np.ndarray:
        acc = np.zeros(mat.shape[0])
        for i in range(mat.shape[1]):
            acc = acc + mat[:, i] * mat[:, i]
        return np.sqrt(acc)

    qnorm = _seq_norm(qmat)

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            cmat = np.stack(pdf[vec_col].values).astype(np.float64)
            cnorm = _seq_norm(cmat)
            nbr = pdf[id_col].values.astype(np.int64)
            for j, qid in enumerate(qids):
                acc = np.zeros(len(pdf))
                for i in range(cmat.shape[1]):
                    acc = acc + qmat[j, i] * cmat[:, i]
                out = pd.DataFrame(
                    {
                        "query_id": np.full(len(pdf), qid, dtype=np.int64),
                        "neighbor_id": nbr,
                        "cosine_sim": acc / (qnorm[j] * cnorm),
                    }
                )
                yield out[out["neighbor_id"] != qid]

    scored = emb.select(id_col, vec_col).mapInPandas(
        score, "query_id long, neighbor_id long, cosine_sim double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            # quant, not ROUND: must match the JVM fold twin, which
            # shares _fold_topk_core's floor-quant convention
            _conv.quant(F.col("cosine_sim"), 6).alias("cosine_sim"),
            "rank",
        )
    )


def cosine_topk_fold(
    emb: DataFrame,
    query_max_id: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pure-JVM twin of :func:`cosine_topk` (broadcast pair join +
    sequential HOF folds) — kept as the all-declarative reference
    implementation; tests assert both paths are bit-identical.

    The bounded query side is broadcast, so the corpus is scanned once
    with NO shuffle; the per-query top-k is a windowed rank over
    (query, corpus-partition) — Spark pushes a group-limit below the
    shuffle since 3.5.
    """
    emb = valid_vectors(emb, vec_col)  # same degenerate-row contract
    # as the Arrow twin — tests assert the two paths stay bit-identical.
    # Norms are precomputed per side (NOT per pair): the pair join then
    # evaluates one dot product instead of three — at Q queries x N corpus
    # vectors this is the difference between QN and 3QN decimal folds.
    q = emb.filter(F.col(id_col) < query_max_id).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        norm_fold(F.col(vec_col)).alias("qnorm"),
    )
    c = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        norm_fold(F.col(vec_col)).alias("cnorm"),
    )
    return _fold_topk_core(
        q,
        c,
        F.col("query_id") != F.col("neighbor_id"),
        k,
        ["query_id", "neighbor_id"],
    )


def _fold_topk_core(
    q: DataFrame, c: DataFrame, cond, k: int, head_cols: list[str]
) -> DataFrame:
    """Shared tail of the broadcast-query fold joins (cosine_topk_fold,
    hard_negatives): pair join on ``cond``, one dot fold per pair
    (norms precomputed per side), raw-double window top-k with
    neighbor_id tie-break, quantized similarity out. ONE definition so
    the twins' bit-exactness conventions cannot drift apart. Output
    similarity is floor-quantized (not engine-native ROUND): quant maps
    the (-5e-7, 0) band to +0.0 on both engines, so the IEEE -0.0 vs
    0.0 ROUND divergence documented in _conv.py can't break the
    oracle's str()-keyed row sort."""
    scored = (
        F.broadcast(q)
        .join(c, cond)
        .withColumn(
            "cosine_sim",
            F.try_divide(
                dot_fold(F.col("qvec"), F.col("cvec")),
                F.col("qnorm") * F.col("cnorm"),
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            *head_cols,
            _conv.quant(F.col("cosine_sim"), 6).alias("cosine_sim"),
            "rank",
        )
    )


def hard_negatives(
    emb: DataFrame,
    query_max_id: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training (the dense-retrieval
    staple — e.g. ANCE, Xiong et al. 2021, arXiv:2007.00808): for each
    query vector, the k most-similar corpus vectors with a DIFFERENT
    label — maximally confusable non-matches, the negatives that teach
    an encoder the decision boundary (random negatives are trivially
    easy and contribute no gradient signal).

    Same shape and bit-exactness contract as :func:`cosine_topk_fold`:
    bounded query side broadcast (corpus scanned once, no vector
    shuffle), per-side norms precomputed, sequential HOF dot folds,
    try_divide for degenerate-vector safety, WindowGroupLimit top-k.
    NULL-label rows are excluded from both sides — "different label" is
    undefined against NULL and would silently drop pairs either way."""
    emb = valid_vectors(emb, vec_col).filter(F.col(label_col).isNotNull())
    q = emb.filter(F.col(id_col) < query_max_id).select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("query_label"),
        F.col(vec_col).alias("qvec"),
        norm_fold(F.col(vec_col)).alias("qnorm"),
    )
    c = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
        F.col(vec_col).alias("cvec"),
        norm_fold(F.col(vec_col)).alias("cnorm"),
    )
    # cosine across mismatched dimensions is undefined (Spark's
    # zip_with NULL-pads, DuckDB's indexed fold truncates — a silent
    # cross-engine divergence on variable-length vectors): pair only
    # equal-dimension vectors, explicitly, on both engines.
    cond = (F.col("query_label") != F.col("neighbor_label")) & (
        F.size("qvec") == F.size("cvec")
    )
    return _fold_topk_core(
        q,
        c,
        cond,
        k,
        ["query_id", "query_label", "neighbor_id", "neighbor_label"],
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (literal constants, not data)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id: bit p = 1 iff dot(vec, plane_p) > 0."""
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        d = F.aggregate(
            F.zip_with(vec, lit_plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(d > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_ann_topk(
    emb: DataFrame,
    query_max_id: int,
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: search only the query's LSH bucket plus all
    Hamming-1 neighbor buckets (multi-probe, recovers most near-boundary
    misses). At scale this is a bucket-equi-join: corpus shuffled once on
    bucket, queries exploded to n_planes+1 probe buckets.
    """
    planes = _hyperplanes(dim, n_planes)
    # Both sides derive from ONE bucket projection: the sides shuffle on
    # the same bucket key, so Spark's ReusedExchange evaluates the bucket
    # HOFs once (measured faster than per-side bucket computation; at
    # scale this is also the right shape — corpus bucketed and shuffled
    # once, then reused).
    with_bucket = emb.select(
        F.col(id_col), F.col(vec_col), lsh_bucket(F.col(vec_col), planes).alias("bucket")
    )
    q = with_bucket.filter(F.col(id_col) < query_max_id).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        norm_fold(F.col(vec_col)).alias("qnorm"),
        F.col("bucket").alias("qbucket"),
    )
    # multi-probe: own bucket + flip each single bit
    probes = F.array(
        F.col("qbucket"),
        *[F.col("qbucket").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)],
    )
    q_probed = q.withColumn("bucket", F.explode(probes))
    c = with_bucket.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        norm_fold(F.col(vec_col)).alias("cnorm"),
        F.col("bucket"),
    )
    scored = (
        q_probed.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine_sim",
            F.try_divide(
                dot_fold(F.col("qvec"), F.col("cvec")),
                F.col("qnorm") * F.col("cnorm"),
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine_sim", 6).alias("cosine_sim"),
            "rank",
        )
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-duplicate vector pairs (cosine >= threshold) via LSH buckets:
    candidate pairs share a bucket (or a Hamming-1 probe), then exact
    cosine verification. Embedding-space analog of MinHash dedup.

    Exact-first: byte-identical vectors are grouped BEFORE the LSH pass
    (the production dedup ordering) — each identical-vector group emits
    star pairs to its smallest id at cosine 1.0, and only the distinct
    representatives enter the LSH candidate join. On dup-heavy corpora
    this removes the quadratic identical-pair blowup (10 replicas of a
    corpus would otherwise put 45x the pairs through the verify join);
    the returned pair set is a spanning structure of the near-dup graph:
    connected components (what dedup clustering consumes) are identical
    to the full clique listing. Degenerate vectors (NULL, or all-zero —
    cosine undefined) are excluded up front, matching the original
    behavior where they could never pass the cosine filter."""
    from .dedup import star_pairs_expr

    valid = valid_vectors(emb, vec_col)
    groups = valid.groupBy(vec_col).agg(
        F.sort_array(F.collect_list(id_col)).alias("ids")
    )
    exact_stars = (
        groups.filter(F.size("ids") >= 2)
        .select(F.explode(star_pairs_expr()).alias("p"))
        .select("p.id_a", "p.id_b", F.lit(1.0).alias("cosine_sim"))
    )
    reps = groups.select(
        F.element_at("ids", 1).alias(id_col), F.col(vec_col)
    )
    planes = _hyperplanes(dim, n_planes)
    with_bucket = reps.select(
        F.col(id_col), F.col(vec_col), lsh_bucket(F.col(vec_col), planes).alias("bucket")
    )
    probes = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(n_planes)],
    )
    a = with_bucket.withColumn("probe", F.explode(probes)).select(
        F.col(id_col).alias("id_a"), "probe"
    )
    b = with_bucket.select(
        F.col(id_col).alias("id_b"), F.col("bucket").alias("probe")
    )
    pairs = (
        a.join(b, "probe")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()  # distinct on ids only; vectors joined back after
    )
    va = reps.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    vb = reps.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    near = (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine_sim", cosine(F.col("vec_a"), F.col("vec_b")))
        .filter(F.col("cosine_sim") >= threshold)
        .select("id_a", "id_b", F.round("cosine_sim", 6).alias("cosine_sim"))
    )
    return near.unionByName(exact_stars)


def _seeded_centroids(emb: DataFrame, n_cells: int, id_col: str, vec_col: str,
                      dim: int) -> list[list[float]]:
    """Deterministic IVF centroids: one Lloyd refinement over a seeded
    sample, entirely driver-side on a bounded sample (the classic
    train-on-sample / assign-at-scale split used by IVF indexes)."""
    import numpy as np

    sample = (
        emb.select(vec_col)
        .sample(fraction=1.0, seed=42)
        .limit(max(n_cells * 32, 256))
        .collect()
    )
    if not sample:
        # empty corpus (round-8 empty-input sweep): deterministic
        # placeholder centroids keep every downstream expression valid;
        # with no corpus there are no probes either, so results are
        # empty regardless of the centroid values
        return [[0.0] * dim for _ in range(n_cells)]
    X = np.array([list(r[0]) for r in sample], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    if len(X) < n_cells:
        # fewer sample rows than cells: pad with zero centroids so the
        # no-replacement choice below stays valid
        X = np.vstack([X, np.zeros((n_cells - len(X), X.shape[1]))])
    rng = np.random.default_rng(42)
    cents = X[rng.choice(len(X), size=n_cells, replace=False)]
    for _ in range(5):  # a few Lloyd iterations; cosine == dot on unit sphere
        assign = np.argmax(X @ cents.T, axis=1)
        for c in range(n_cells):
            members = X[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cents[c] = m / max(np.linalg.norm(m), 1e-12)
    return cents.round(6).tolist()


def ivf_assign(vec: Column, centroids: list[list[float]]) -> Column:
    """Nearest-centroid cell id (argmax dot; centroids are unit-norm so
    the vector's own norm is a common factor and can be dropped).

    Built as one flat array of dots + array_position(array_max) — an
    iterative when-chain argmax embeds every previous step twice and the
    expression tree grows ~2^n_cells (OOMs the analyzer at 16 cells).

    STATUS: kept as the Python-worker-free fallback (same role as
    minhash_signatures beside its Arrow twin); all production call
    sites use :func:`ivf_assign_arrow`. If you revive this path, note
    the two are NOT guaranteed bit-consistent on near-ties: the HOF
    fold sums sequentially while numpy's matmul uses SIMD/pairwise
    accumulation, so a vector equidistant to two cells (to within one
    ulp) can land differently. Do not mix the two within one index
    (build with one, serve with the other).
    """
    dots = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(float(x)) for x in cent]),
                    lambda x, y: x.cast("double") * y,
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            for cent in centroids
        ]
    )
    return (F.array_position(dots, F.array_max(dots)) - 1).cast("int")


def ivf_ann_topk(
    emb: DataFrame,
    query_max_id: int,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: corpus is partitioned into
    ``n_cells`` centroid cells; each query scans only its ``n_probe``
    nearest cells. The scale path: assignment is one corpus pass, the
    probe is a bucket-equi-join on cell id — the corpus fraction scanned
    is ~n_probe/n_cells regardless of corpus size.
    """
    import numpy as np

    # train centroids on valid vectors only (a NULL vector in the
    # driver-side sample is a TypeError)
    cents = _seeded_centroids(
        valid_vectors(emb, vec_col), n_cells, id_col, vec_col, dim
    )
    corpus = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        norm_fold(F.col(vec_col)).alias("cnorm"),
        ivf_assign_arrow(cents)(F.col(vec_col)).alias("cell"),
    )
    C = np.array(cents)
    # NULL query vectors would TypeError in the probe construction below
    # (the guard pq_ann_topk/cosine_topk already carry; corpus-side NULLs
    # are handled via NULL cells dropping at the probe join).
    q_rows = (
        emb.filter(
            (F.col(id_col) < query_max_id) & F.col(vec_col).isNotNull()
        ).collect()
    )
    probe_rows = []
    for r in q_rows:
        v = np.array(list(r[vec_col]), dtype=np.float64)
        v /= max(np.linalg.norm(v), 1e-12)
        cells = np.argsort(-(C @ v))[:n_probe]
        for c in cells:
            probe_rows.append((r[id_col], list(r[vec_col]), int(c)))
    spark = emb.sparkSession
    probes = spark.createDataFrame(
        probe_rows, f"query_id long, qvec array<float>, cell int"
    ).withColumn("qnorm", norm_fold(F.col("qvec")))
    scored = (
        F.broadcast(probes)
        .join(corpus, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine_sim",
            F.try_divide(
                dot_fold(F.col("qvec"), F.col("cvec")),
                F.col("qnorm") * F.col("cnorm"),
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine_sim", 6).alias("cosine_sim"),
            "rank",
        )
    )


def _pq_codebooks(
    emb: DataFrame,
    m: int,
    n_codes: int,
    dim: int,
    vec_col: str,
) -> list[list[list[float]]]:
    """Deterministic PQ codebooks: per-subspace k-means on a seeded,
    bounded sample (train-on-sample / encode-at-scale — same split as
    IVF). Returns m codebooks of n_codes centroids of dim/m floats."""
    sample = (
        emb.select(vec_col)
        .filter(F.col(vec_col).isNotNull())
        .sample(fraction=1.0, seed=42)
        .limit(max(n_codes * 32, 256))
        .collect()
    )
    d_sub = dim // m
    if not sample:
        # empty corpus (round-8 empty-input sweep) — see _seeded_centroids
        return [[[0.0] * d_sub for _ in range(n_codes)] for _ in range(m)]
    X = np.array([list(r[0]) for r in sample], dtype=np.float64)
    if len(X) < n_codes:
        X = np.vstack([X, np.zeros((n_codes - len(X), X.shape[1]))])
    rng = np.random.default_rng(42)
    books: list[list[list[float]]] = []
    for j in range(m):
        S = X[:, j * d_sub : (j + 1) * d_sub]
        cents = S[rng.choice(len(S), size=n_codes, replace=False)]
        for _ in range(5):  # Lloyd refinement in the subspace (L2)
            d2 = ((S[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(n_codes):
                members = S[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books.append(cents.round(6).tolist())
    return books


def pq_encode(vec: Column, books: list[list[list[float]]], m: int,
              d_sub: int) -> Column:
    """JVM-side PQ encoding: per subspace, argmin L2 distance to the
    codebook == argmax (x·c - |c|²/2) — built as a flat dot array +
    array_position(array_max), the same analyzer-safe argmax shape as
    ivf_assign. Output: array<int> of m code ids (whole-stage codegen,
    no Python in the corpus pass)."""
    codes = []
    for j, book in enumerate(books):
        sub = F.slice(vec, j * d_sub + 1, d_sub)
        scores = F.array(
            *[
                F.aggregate(
                    F.zip_with(
                        sub,
                        F.array(*[F.lit(float(x)) for x in cent]),
                        lambda x, y: x.cast("double") * y,
                    ),
                    F.lit(-float(sum(c * c for c in cent)) / 2.0),
                    lambda a, x: a + x,
                )
                for cent in book
            ]
        )
        codes.append((F.array_position(scores, F.array_max(scores)) - 1).cast("int"))
    return F.array(*codes)


def ivf_assign_arrow(centroids: list[list[float]]):
    """Arrow-vectorized twin of :func:`ivf_assign`: one numpy matmul +
    argmax per batch instead of n_cells interpreted HOF folds per row
    (the folds are NOT whole-stage-codegen — measured 10.9 s to assign
    20k 64-dim vectors to 16 cells at the sf5 audit vs milliseconds
    here; the same pandas_udf-beats-interpreted-expressions case as
    pq_encode_arrow). Same FIRST-maximum tie-break as
    array_position(array_max); NULL vectors map to NULL cells (rows
    drop at the probe join, as before). Used by every IVF call site so
    the in-memory and persisted-index paths stay assignment-identical.
    """
    from pyspark.sql.functions import pandas_udf

    C = np.array(centroids, dtype=np.float64)  # n_cells x dim

    @pandas_udf("int")
    def assign(vecs):
        import pandas as pd

        vals = vecs.tolist()
        valid = np.array([v is not None for v in vals], dtype=bool)
        out = np.zeros(len(vals), dtype=np.int32)
        if valid.any():
            X = np.array(
                [v for v in vals if v is not None], dtype=np.float64
            )
            out[valid] = (X @ C.T).argmax(axis=1).astype(np.int32)
        return pd.Series(out, dtype="Int32").mask(~valid)

    return assign


def pq_encode_arrow(books: list[list[list[float]]], m: int, d_sub: int):
    """Arrow-vectorized PQ encoder: one numpy matmul per batch instead of
    m*n_codes interpreted HOF folds per row (~10x on wide codebooks —
    the pandas_udf-beats-interpreted-expressions case, not the
    pandas-udf-beats-codegen one). Bit-identical to ``pq_encode``:
    double-precision scores, same argmax tie-break (numpy argmax and
    array_position(array_max) both take the FIRST maximum)."""
    from pyspark.sql.functions import pandas_udf

    B = [np.array(b, dtype=np.float64) for b in books]  # n_codes x d_sub
    half_norms = [0.5 * (b * b).sum(axis=1) for b in B]

    @pandas_udf("array<int>")
    def encode(vecs):
        import pandas as pd

        X = np.array(vecs.tolist(), dtype=np.float64)  # n x dim
        codes = np.empty((len(X), m), dtype=np.int32)
        for j in range(m):
            scores = X[:, j * d_sub : (j + 1) * d_sub] @ B[j].T - half_norms[j]
            codes[:, j] = scores.argmax(axis=1)
        return pd.Series(list(codes))

    return encode


def pq_ann_topk(
    emb: DataFrame,
    query_max_id: int,
    k: int = 5,
    m: int = 8,
    n_codes: int = 32,
    dim: int = 64,
    rerank_factor: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization approximate top-k with exact re-rank.

    The third ANN scale path next to LSH buckets and IVF cells: the
    corpus is encoded ONCE into m small code ids (here 8 codes -> 8
    bytes/vector vs 256 bytes raw — the 32x memory compression that lets
    a 100 TB embedding corpus fit an in-memory scan), queries score
    candidates via an ADC lookup table (sum of m array lookups, pure JVM,
    no per-pair float math), and only the top rerank_factor*k ADC
    candidates get the exact cosine. Asymmetric-distance PQ per
    Jegou et al., "Product Quantization for Nearest Neighbor Search"
    (TPAMI 2011).
    """
    d_sub = dim // m
    # NULL embeddings can't be coded, scored, or re-ranked (the same
    # contract as cosine_topk); drop them before every pass.
    emb = emb.filter(F.col(vec_col).isNotNull())
    books = _pq_codebooks(emb, m, n_codes, dim, vec_col)
    encode = pq_encode_arrow(books, m, d_sub)
    # The PQ *index*: ids + m byte-sized codes only (the 32x-compressed
    # representation). Raw vectors are NOT carried through the ADC
    # scan; the exact re-rank fetches them for the tiny candidate set
    # only (fetch-on-rerank, Jegou et al. §V). No in-operator cache —
    # each call would pin a fresh copy of executor storage for the
    # session; callers that reuse the index reuse the DataFrame.
    corpus = emb.select(
        F.col(id_col).alias("neighbor_id"),
        encode(F.col(vec_col)).alias("codes"),
    )
    B = np.array(books)  # m x n_codes x d_sub
    q_rows = emb.filter(F.col(id_col) < query_max_id).collect()
    lut_rows = []
    for r in q_rows:
        v = np.array(list(r[vec_col]), dtype=np.float64)
        luts = [
            (B[j] @ v[j * d_sub : (j + 1) * d_sub]).round(6).tolist()
            for j in range(m)
        ]
        lut_rows.append((r[id_col], list(r[vec_col]), luts))
    spark = emb.sparkSession
    queries = spark.createDataFrame(
        lut_rows,
        "query_id long, qvec array<float>, luts array<array<double>>",
    ).withColumn("qnorm", norm_fold(F.col("qvec")))
    # ADC score: sum_j luts[j][codes[j]] ~= q . reconstructed(x).
    # Unrolled as a fixed m-term expression (m is a compile-time constant)
    # — stays in whole-stage codegen instead of an interpreted HOF fold.
    terms = [
        F.element_at(
            F.element_at(F.col("luts"), j + 1),
            F.element_at(F.col("codes"), j + 1) + 1,
        )
        for j in range(m)
    ]
    adc = terms[0]
    for t in terms[1:]:
        adc = adc + t
    cand_w = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").desc(), F.col("neighbor_id")
    )
    # Round-9 (guide §2.3: project before the exchange): the candidate
    # window used to carry qvec (64 floats) + qnorm per Q x N scored
    # row through its sort -> exchange -> sort — ~550 B/row where the
    # ranking needs only (query_id, neighbor_id, adc_score) = 24 B.
    # Slimming BEFORE the window cuts the heaviest intermediate of the
    # whole query ~20x (and the blocking rerank BroadcastExchange
    # payload with it); qvec/qnorm re-attach after the rerank join via
    # a second broadcast of the tiny driver-local ``queries`` relation
    # (Q rows — rebuilding that broadcast is far cheaper than carrying
    # the vectors through the Q x N pipeline).
    candidates = (
        F.broadcast(queries.select("query_id", "luts"))
        .join(corpus, F.col("query_id") != F.col("neighbor_id"))
        .withColumn("adc_score", adc)
        .select("query_id", "neighbor_id", "adc_score")
        .withColumn("cand_rank", F.row_number().over(cand_w))
        .filter(F.col("cand_rank") <= rerank_factor * k)
        .select("query_id", "neighbor_id")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    raw = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    # Round-8 (guide §8 "move big rows once"): the exact re-rank joins
    # the TINY candidate set (Q * rerank_factor * k rows — bounded by
    # the same query-set contract that already collects the queries)
    # back to the raw vectors. Unhinted, the build side was a SIZE
    # ESTIMATE decision: at test SF the raw corpus slips under the
    # broadcast threshold (BuildRight of the FULL vector payload —
    # backwards even when it fits), and past the threshold the join
    # degrades to shuffling the whole raw-vector corpus by neighbor_id —
    # re-moving exactly the heavy payload the 8-byte PQ codes exist to
    # avoid. Pinning the broadcast to the candidates side keeps the
    # raw-vector scan in place at EVERY scale: only bounded candidate
    # rows move (plans/r08/sim_topk_pq_{before,after}.txt — BuildRight
    # raw-corpus broadcast -> BuildLeft bounded-candidates broadcast).
    return (
        candidates.hint("broadcast").join(raw, "neighbor_id")
        .join(
            F.broadcast(queries.select("query_id", "qvec", "qnorm")),
            "query_id",
        )
        .withColumn(
            "cosine_sim",
            F.try_divide(
                dot_fold(F.col("qvec"), F.col("cvec")),
                F.col("qnorm") * norm_fold(F.col("cvec")),
            ),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine_sim", 6).alias("cosine_sim"),
            "rank",
        )
    )


def semantic_dedup(
    emb: DataFrame,
    threshold: float = 0.95,
    n_cells: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding space (sample-trained
    k-means cells, the IVF building blocks), compare pairs ONLY within a
    cell, drop every vector whose cosine to a lower-id cell-mate exceeds
    ``threshold``. Returns the surviving rows.

    Scale posture: candidate generation is the cell equi-self-join — the
    pair space is sum over cells of |cell|² instead of N² (with balanced
    cells, N²/n_cells; n_cells grows with corpus size). The known
    SemDeDup caveat applies: near-dups straddling a cell boundary are
    missed — the recall/cost knob is n_cells, same trade as the paper.
    """
    # Exact-first: byte-identical vectors collapse to their smallest id
    # before the cell self-join. Every non-representative is a dup BY
    # DEFINITION (cosine 1.0 with its lower-id rep, which shares its
    # cell), and the survivor set over representatives is provably the
    # original survivor set (a lower-id identical mate implies an even
    # lower-id rep with the same cosine). Output rows are EXACTLY the
    # original semantics; the pair space shrinks from sum |cell|^2 over
    # raw vectors to distinct vectors only (13x at sf1's 90% dup rate).
    # NULL/all-zero vectors are excluded from the grouping (cosine is
    # undefined, so the original pairwise path never dropped them) —
    # they pass through the final anti-join untouched. The centroid
    # sample must also come from the VALID rows: a NULL vector in the
    # driver-side training sample is a TypeError.
    valid = valid_vectors(emb, vec_col)
    g = valid.groupBy(vec_col).agg(
        F.sort_array(F.collect_list(id_col)).alias("ids")
    )
    reps = g.select(F.element_at("ids", 1).alias(id_col), F.col(vec_col))
    nonrep_ids = g.select(
        F.explode(F.expr("slice(ids, 2, size(ids) - 1)")).alias(id_col)
    )
    cents = _seeded_centroids(valid, n_cells, id_col, vec_col, dim)
    with_cell = reps.select(
        F.col(id_col),
        F.col(vec_col),
        ivf_assign_arrow(cents)(F.col(vec_col)).alias("cell"),
    )
    a = with_cell.select(
        F.col("cell"),
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
    )
    b = with_cell.select(
        F.col("cell"),
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
    )
    dup_reps = (
        a.join(b, "cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", cosine(F.col("vec_a"), F.col("vec_b")))
        .filter(F.col("sim") >= threshold)
        .select(F.col("id_b").alias(id_col))
    )
    dup_ids = nonrep_ids.unionByName(dup_reps).distinct()
    return emb.join(dup_ids, id_col, "left_anti")


def build_ivf_index(
    emb: DataFrame,
    path: str,
    n_cells: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize an IVF index on disk: ``{path}/centroids`` (one row
    per cell: id + vector) and ``{path}/assignments`` — the corpus with
    precomputed norms, PARTITIONED BY cell id, so serving reads only
    probed cells as a partition-pruned scan. This is what separates an
    ANN *index* from an ANN *query*: the corpus pass (assignment +
    norms) happens once at build time; every query afterwards touches
    ~n_probe/n_cells of the data directly off storage. Rebuild cadence
    is the ingestion pipeline's choice (append-only corpora can assign
    new rows incrementally with the SAME centroids — assignment is a
    pure function of the stored centroid table)."""
    cents = _seeded_centroids(
        valid_vectors(emb, vec_col), n_cells, id_col, vec_col, dim
    )
    spark = emb.sparkSession
    spark.createDataFrame(
        [(i, list(map(float, c))) for i, c in enumerate(cents)],
        "cell int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    valid_vectors(emb, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cvec"),
        norm_fold(F.col(vec_col)).alias("cnorm"),
        ivf_assign_arrow(cents)(F.col(vec_col)).alias("cell"),
    ).write.partitionBy("cell").mode("overwrite").parquet(
        f"{path}/assignments"
    )


def ivf_ann_topk_indexed(
    spark,
    path: str,
    queries: list[tuple[int, list[float]]],
    k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """Serve ANN top-k from a persisted IVF index (build_ivf_index):
    probe cells are chosen against the stored centroid table, and the
    assignment scan carries ``cell IN (probed)`` so only those
    partition directories are listed and read — the plan's
    PartitionFilters IS the index lookup. Scoring and ranking are
    identical to the in-memory ivf_ann_topk (bit-equal results when
    built with the same parameters — pytest-locked)."""
    import numpy as np

    cent_rows = spark.read.parquet(f"{path}/centroids").collect()
    C = np.zeros((len(cent_rows), len(cent_rows[0]["centroid"])))
    for r in cent_rows:
        C[r["cell"]] = r["centroid"]
    probe_rows = []
    probed_cells = set()
    for qid, vec in queries:
        v = np.array(vec, dtype=np.float64)
        v /= max(np.linalg.norm(v), 1e-12)
        cells = np.argsort(-(C @ v))[:n_probe]
        for c in cells:
            probe_rows.append((qid, list(vec), int(c)))
            probed_cells.add(int(c))
    if not probed_cells:
        # no queries (round-8 empty-input sweep): nothing to serve
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine_sim double, "
                "rank int"
        )
    probes = spark.createDataFrame(
        probe_rows, "query_id long, qvec array<float>, cell int"
    ).withColumn("qnorm", norm_fold(F.col("qvec")))
    # explicit schema: an EMPTY corpus's partitionBy write leaves no
    # data files, so inference fails (round-8 empty-input sweep)
    corpus = spark.read.schema(
        "neighbor_id long, cvec array<float>, cnorm double, cell int"
    ).parquet(f"{path}/assignments").filter(
        F.col("cell").isin(*sorted(probed_cells))
    )
    scored = (
        F.broadcast(probes)
        .join(corpus, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine_sim",
            F.try_divide(
                dot_fold(F.col("qvec"), F.col("cvec")),
                F.col("qnorm") * F.col("cnorm"),
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine_sim", 6).alias("cosine_sim"),
            "rank",
        )
    )


def lexical_jaccard_topk(
    docs: DataFrame,
    query_max_id: int,
    n: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Token-set Jaccard lexical ranking: top-``n`` corpus documents per
    bounded query document (``id < query_max_id``) by whitespace-token
    Jaccard similarity — the sparse/lexical leg of hybrid retrieval
    (the BM25 stand-in that is exactly oracle-checkable).

    Scale posture: the query side is bounded by construction and
    broadcast, so the corpus is scanned ONCE with no shuffle of texts;
    token arrays are projected per side BEFORE the pair join (one
    tokenize per document, not per pair). The per-query top-n is a
    windowed rank — Spark >= 3.5 pushes a WindowGroupLimit below the
    shuffle, so each map task forwards at most n rows per query.

    Determinism (oracle parity): Jaccard = |A∩B| / (|A|+|B|-|A∩B|) over
    DISTINCT token sets — one IEEE division of exact small integers,
    bit-identical to DuckDB's len(list_intersect(...)) arithmetic; ties
    break on neighbor_id.
    """
    toks = F.array_distinct(F.split(F.col(text_col), " "))
    base = docs.filter(
        F.col(text_col).isNotNull() & (F.length(text_col) > 0)
    )
    q = base.filter(F.col(id_col) < query_max_id).select(
        F.col(id_col).alias("query_id"), toks.alias("q_toks")
    )
    c = base.select(
        F.col(id_col).alias("neighbor_id"), toks.alias("c_toks")
    )
    inter = F.size(F.array_intersect(F.col("q_toks"), F.col("c_toks")))
    union = F.size(F.col("q_toks")) + F.size(F.col("c_toks")) - inter
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "lex_sim",
            F.try_divide(inter.cast("double"), union.cast("double")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("lex_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("lex_rank", F.row_number().over(w))
        .filter(F.col("lex_rank") <= n)
        .select("query_id", "neighbor_id", "lex_rank")
    )


def rrf_hybrid_topk(
    docs: DataFrame,
    emb: DataFrame,
    query_max_id: int,
    n_candidates: int = 20,
    k: int = 5,
    rrf_k: int = 60,
) -> DataFrame:
    """Hybrid dense+lexical retrieval fused by Reciprocal Rank Fusion
    (Cormack, Clarke & Buettcher 2009, SIGIR): per query id, take the
    top-``n_candidates`` by exact embedding cosine (dense leg,
    :func:`cosine_topk_fold`) and by token Jaccard (lexical leg,
    :func:`lexical_jaccard_topk`), score every candidate in the UNION
    of the two lists as sum over legs of 1/(rrf_k + rank) (a missing
    leg contributes 0 — the standard convention), and keep the top-k
    per query by fused score.

    Scale posture: both legs broadcast the bounded query set and scan
    the corpus once each; the fusion join is a full-outer join of two
    Q x n candidate lists (tiny by construction), then one windowed
    top-k. Nothing in the plan grows faster than the corpus.

    Determinism (oracle parity): 1/(rrf_k + rank) is one IEEE division
    of exact integers; the two-leg sum is a fixed-order addition of two
    identical doubles — bit-identical across engines, floor-quantized
    on output per _conv convention. Ties break on neighbor_id.
    """
    dense = cosine_topk_fold(emb, query_max_id, k=n_candidates).select(
        "query_id", "neighbor_id", F.col("rank").alias("dense_rank")
    )
    lex = lexical_jaccard_topk(
        docs, query_max_id, n_candidates
    )
    fused = dense.join(
        lex, ["query_id", "neighbor_id"], "full_outer"
    ).withColumn(
        "rrf_score_raw",
        F.coalesce(
            F.lit(1.0) / (F.lit(rrf_k) + F.col("dense_rank")), F.lit(0.0)
        )
        + F.coalesce(
            F.lit(1.0) / (F.lit(rrf_k) + F.col("lex_rank")), F.lit(0.0)
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score_raw").desc(), F.col("neighbor_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            _conv.quant(F.col("rrf_score_raw"), 6).alias("rrf_score"),
            "dense_rank",
            "lex_rank",
            "rank",
        )
    )


def mmr_diversify_topk(
    emb: DataFrame,
    query_max_id: int,
    n_candidates: int = 20,
    k: int = 5,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance diversified top-k (Carbonell &
    Goldstein 1998, SIGIR): per query, fetch ``n_candidates`` by exact
    cosine (:func:`cosine_topk_fold`), then greedily re-rank —
    each step picks argmax of ``lam * relevance - (1-lam) *
    max_cosine_to_already_selected`` — so near-duplicate candidates
    cannot crowd the result list. The retrieval-time counterpart of
    SemDeDup's corpus-time pruning.

    Scale posture: the greedy step is inherently sequential but runs
    per query over <= n_candidates rows — an ``applyInPandas`` group of
    bounded size (the corpus-sized work is the candidate fetch, which
    broadcasts the bounded query set and scans the corpus once). The
    candidate->vector join broadcasts the Q x n candidate list, so the
    corpus is probed, never shuffled.

    Greedy selection is iterative/order-dependent -> rows-only check;
    planted-geometry invariants in tests/test_extensions.py (first
    pick == top-cosine, duplicate candidates deferred below diverse
    ones).
    """
    import pandas as pd

    cands = cosine_topk_fold(
        emb, query_max_id, k=n_candidates, id_col=id_col, vec_col=vec_col
    )
    corpus = valid_vectors(emb, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec")
    )
    with_vecs = F.broadcast(cands).join(corpus, "neighbor_id")

    def greedy(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("rank").reset_index(drop=True)
        mat = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf["cvec"]]
        )
        norms = np.sqrt((mat * mat).sum(axis=1))
        unit = mat / norms[:, None]  # valid_vectors => norms > 0
        sims = unit @ unit.T
        rel = pdf["cosine_sim"].to_numpy()
        ids = pdf["neighbor_id"].to_numpy()
        n = len(pdf)
        selected: list[int] = []
        remaining = list(range(n))
        while remaining and len(selected) < k:
            best = None
            best_key = None
            for i in remaining:
                penalty = sims[i, selected].max() if selected else 0.0
                score = lam * rel[i] - (1.0 - lam) * penalty
                key = (score, -int(ids[i]))  # ties -> smallest id
                if best_key is None or key > best_key:
                    best, best_key = i, key
            selected.append(best)
            remaining.remove(best)
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].iloc[:1].repeat(
                    len(selected)
                ).to_numpy(),
                "neighbor_id": ids[selected],
                "relevance": rel[selected],
                "mmr_rank": np.arange(1, len(selected) + 1, dtype=np.int32),
            }
        )

    return with_vecs.groupBy("query_id").applyInPandas(
        greedy,
        "query_id long, neighbor_id long, relevance double, mmr_rank int",
    )
