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
    emb = emb.filter(F.col(vec_col).isNotNull())
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


def gram_pcs(
    emb: DataFrame,
    vec_col: str = "embedding",
    n_components: int = 2,
    center: bool = True,
    return_moments: bool = False,
) -> tuple:
    """Exact top-``n_components`` PCs via a ONE-PASS Gram matrix.

    The right scale split for dim up to a few thousand (the common
    embedding regime): each Arrow batch computes its local X^T X with
    BLAS inside ``mapInPandas`` and emits dim(dim+1)/2 partial sums;
    the shuffle carries O(dim^2) doubles per partition regardless of
    row count, and the driver eigendecomposes the dim×dim matrix with
    numpy. One scan, no per-iteration driver sync — compare
    ``power_iteration_pcs`` (one scan PER iteration), which is the
    fallback when dim^2 state itself is too large to form.

    Same return contract and sign convention as ``power_iteration_pcs``;
    eigenvalues are exact (sum-of-squares units of the centered data).
    With ``return_moments=True`` the tuple extends to (comps, eigs,
    trace, mean, n_rows) — the per-dimension mean and row count fall
    out of the same pass (the 'j = -1' rows), so callers that need
    them for projection (whiten) never rescan the table.
    """
    import numpy as np
    import pandas as pd

    # NULL embeddings would crash np.stack inside the Arrow batch (the
    # same failure cosine_topk guards with valid_vectors); drop them at
    # the frame level so the pushed filter also prunes the scan.
    emb = emb.filter(F.col(vec_col).isNotNull())
    first = emb.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("empty embedding frame")
    dim = int(first["d"])

    def partials(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vals = pdf.iloc[:, 0]
            vals = vals[vals.notna()]
            if len(vals) == 0:
                continue
            mat = np.stack(vals.to_numpy()).astype(np.float64)
            g = mat.T @ mat  # dim x dim local Gram
            s = mat.sum(axis=0)  # per-dim sums for centering
            iu = np.triu_indices(dim)
            yield pd.DataFrame(
                {
                    "i": np.concatenate([iu[0], np.arange(dim)]),
                    "j": np.concatenate([iu[1], np.full(dim, -1)]),
                    "v": np.concatenate([g[iu], s]),
                    "n": np.concatenate(
                        [np.zeros(len(iu[0])), np.full(dim, float(len(mat)))]
                    ),
                }
            )

    rows = (
        emb.select(vec_col)
        .mapInPandas(partials, "i int, j int, v double, n double")
        .groupBy("i", "j")
        .agg(F.sum("v").alias("v"), F.sum("n").alias("n"))
        .collect()
    )
    g = np.zeros((dim, dim))
    s = np.zeros(dim)
    n = 0.0
    for r in rows:
        if r["j"] < 0:
            s[r["i"]] = r["v"]
            n = max(n, r["n"])
        else:
            g[r["i"], r["j"]] = r["v"]
            g[r["j"], r["i"]] = r["v"]
    mean = (s / n) if n > 0 else s
    if center and n > 0:
        g = g - n * np.outer(mean, mean)  # Gram of centered data
    trace = float(np.trace(g))
    w, vecs = np.linalg.eigh(g)
    order = np.argsort(w)[::-1][:n_components]
    comps, eigs = [], []
    for idx in order:
        v = vecs[:, idx]
        imax = int(np.argmax(np.abs(v)))
        if v[imax] < 0:
            v = -v
        comps.append([float(x) for x in v])
        eigs.append(float(w[idx]))
    if return_moments:
        return comps, eigs, trace, [float(x) for x in mean], int(n)
    return comps, eigs, trace


def whiten(
    emb: DataFrame,
    comps: list[list[float]],
    eigs: list[float],
    n_rows: int,
    vec_col: str = "embedding",
    mean: list[float] | None = None,
    eps: float = 1e-9,
) -> DataFrame:
    """Project vectors onto the given principal directions and scale
    each coordinate to unit variance (PCA whitening): out[k] =
    <x - mean, comps[k]> / sqrt(eigs[k] / n_rows). Decorrelates and
    equalizes the retained subspace — the standard preprocessing before
    cosine-based dedup/ANN when the embedding cloud is anisotropic
    (emb_pca_power measures exactly that).

    Executors never see more than the dim x k literal matrix; each row
    is k JVM higher-order folds (no Python). Output keeps all input
    columns plus ``whitened`` (array<double>, length k).
    """
    from .similarity import dot_fold

    k = len(comps)
    if mean is None:
        mean = [0.0] * len(comps[0])
    # Clamp eigenvalues at 0 before the sqrt: eigh on rank-deficient data
    # can return -1e-15, whose fractional power is complex in Python.
    scales = [
        1.0 / max(eps, (max(eigs[i], 0.0) / max(n_rows, 1)) ** 0.5)
        for i in range(k)
    ]
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        _lit_vec(mean),
        lambda x, m: x - m,
    )
    coords = F.array(
        *[
            (dot_fold(centered, _lit_vec(comps[i])) * F.lit(scales[i]))
            for i in range(k)
        ]
    )
    return emb.withColumn("whitened", coords)
