"""Distributed PCA (top principal components) via power iteration.

The embedding-curation stages upstream (dedup_semantic's k-means cells,
sim_topk_pq's codebooks, emb_quantize_int8) all benefit from knowing the
spectrum of the embedding cloud: PC1/PC2 drive whitening decisions,
anisotropy diagnostics (embedding collapse shows up as one dominated
direction), and Matryoshka-style truncation QA (emb_matryoshka measures
prefix energy; PCA measures the rotation-free optimum it competes with).

Execution model (the classic bounded-driver-state split, same as IVF
centroid training in operators/similarity.py): the corpus side stays
fully distributed — each iteration is ONE scan computing s = <x, v> per
row with a JVM higher-order fold, then per-dimension sums of s·x via
posexplode + partial-aggregated groupBy(pos) (the shuffle carries at
most ``dim`` rows PER PARTITION, collapsed to ``dim`` rows total). Only
the dim-sized accumulated vector crosses to the driver per iteration
(64 doubles here), is normalized, and re-enters the plan as a literal.
Matrix size never touches the driver; iteration count × scans is the
whole cost. Components beyond the first come from Hotelling deflation
(project out previously found directions before each matvec), which
keeps the same one-scan-per-iteration shape.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import dot_fold


def _lit_vec(v: list[float]):
    return F.array(*[F.lit(float(x)) for x in v])


def _matvec(emb: DataFrame, vec_col: str, v: list[float]) -> list[float]:
    """One distributed power step: returns sum_x <x,v>·x (length dim).

    posexplode + groupBy(pos) looks like it shuffles n·dim rows, but
    partial aggregation combines to ``dim`` rows per task before the
    exchange — the network moves O(dim · partitions) doubles.
    """
    dim = len(v)
    s = dot_fold(F.col(vec_col), _lit_vec(v))
    acc = (
        emb.select(F.posexplode(vec_col).alias("pos", "xi"), s.alias("s"))
        .groupBy("pos")
        .agg(F.sum(F.col("xi") * F.col("s")).alias("acc"))
        .collect()
    )
    out = [0.0] * dim
    for r in acc:
        out[r["pos"]] = r["acc"]
    return out


def _normalize(v: list[float]) -> tuple[list[float], float]:
    n = math.sqrt(sum(x * x for x in v))
    if n == 0.0:
        return v, 0.0
    return [x / n for x in v], n


def _deflate(v: list[float], basis: list[list[float]]) -> list[float]:
    for b in basis:
        d = sum(x * y for x, y in zip(v, b))
        v = [x - d * y for x, y in zip(v, b)]
    return v


def power_iteration_pcs(
    emb: DataFrame,
    vec_col: str = "embedding",
    n_components: int = 2,
    iterations: int = 8,
    center: bool = True,
) -> tuple[list[list[float]], list[float], float]:
    """Top-``n_components`` principal directions of the vector column.

    Returns (components, eigenvalues, total_variance): unit-norm
    directions of the (optionally centered) second-moment matrix, their
    Rayleigh-quotient eigenvalues (sum-of-squares units, i.e. n·λ of
    the covariance), and the matching total variance (trace) for
    explained-fraction ratios. Deterministic: the start vector is e_0
    deflated against found components (no RNG), and each component's
    sign is normalized so its largest-magnitude entry is positive.
    """
    first = emb.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("empty embedding frame")
    dim = int(first["d"])

    work = emb.select(vec_col)
    if center:
        mean_rows = (
            work.select(F.posexplode(vec_col).alias("pos", "xi"))
            .groupBy("pos")
            .agg(F.avg("xi").alias("m"))
            .collect()
        )
        mean = [0.0] * dim
        for r in mean_rows:
            mean[r["pos"]] = r["m"]
        work = work.select(
            F.zip_with(vec_col, _lit_vec(mean), lambda x, m: x - m).alias(
                vec_col
            )
        )
    # One pass for the trace (total variance in sum-of-squares units).
    trace = work.select(
        F.sum(
            F.aggregate(
                vec_col, F.lit(0.0), lambda a, x: a + x * x
            )
        ).alias("t")
    ).first()["t"]
    work = work.localCheckpoint(eager=False)

    comps: list[list[float]] = []
    eigs: list[float] = []
    for k in range(n_components):
        # Dense deterministic start (never axis-aligned): a single-axis
        # start can be exactly orthogonal to the whole spectrum support
        # (e.g. a zero-variance dimension) and the iteration would stall
        # at the zero vector. cos is irrational in the index, so this
        # vector is generically non-orthogonal to every eigenvector.
        v = [math.cos((k + 1) * (i + 1.5)) for i in range(dim)]
        v = _deflate(v, comps)
        v, _ = _normalize(v)
        lam = 0.0
        for _ in range(iterations):
            av = _matvec(work, vec_col, v)
            av = _deflate(av, comps)
            v, lam = _normalize(av)
            if lam == 0.0:
                break  # rank < k+1: no remaining variance
        # Sign convention: largest-|entry| positive.
        imax = max(range(dim), key=lambda i: abs(v[i]))
        if v[imax] < 0:
            v = [-x for x in v]
        comps.append(v)
        eigs.append(lam)
    return comps, eigs, float(trace)
