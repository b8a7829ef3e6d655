"""Distributed k-means corpus clustering (Lloyd's algorithm).

First-class clustering for LLM data curation: topic balancing, cluster-
proportional mixture sampling, and the cell structure SemDeDup (Abbas et
al. 2023, arXiv:2303.09540) and IVF indexes consume. The reference
pipeline (a 270-line Kafka->Postgres ETL, see SURVEY.md §0) has no
clustering; this is north-star surface mandated by BASELINE.json.

Execution shape (the classic scalable Lloyd split):

* **Assignment is map-side**: centroids are a driver-held k x dim array
  broadcast inside an Arrow ``pandas_udf`` — one vectorized pass per
  batch, NO join and NO shuffle of vectors (same kernel family as
  ``similarity.ivf_assign_arrow``).
* **Updates collect only k x dim doubles per round** (like
  ``operators/pca.py``'s k x k Gram partials): the per-(cell, dim) sums
  partial-aggregate map-side; the corpus never reaches the driver.

Cross-engine float determinism (the repo's standard oracle contract,
see ``operators/similarity.py`` module docstring): distances accumulate
SEQUENTIALLY across dimensions (``acc = acc + diff*diff``, vectorized
across rows) — the exact IEEE op sequence of DuckDB's ``list_reduce``
fold — and, in ``exact_folds`` mode, centroid sums fold per (cell, dim)
in vec_id order so every intermediate centroid is bit-identical on both
engines and assignments can never diverge on a boundary tie.
``exact_folds=False`` is the 100 TB production mode: a plain partial-
aggregated ``SUM`` (order-free up to ~1e-13 relative error, which real
clustering tolerates) with no per-group list state; the pytest suite
asserts both modes produce identical assignments on the fixtures.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Centroids = list[tuple[int, list[float]]]  # [(cell_id, vector)], ascending


def kmeans_assign_arrow(cents: Centroids):
    """Arrow nearest-centroid assignment: struct<cell, dist> per vector.

    Squared-L2 distances accumulate dimension-by-dimension in float64
    (sequential IEEE order — bit-identical to the oracle's list_reduce
    fold). Ties take the FIRST minimum, i.e. the smallest cell id
    (``cents`` is ascending), matching the oracle's ``min(struct)``
    lexicographic tie-break. NULL vectors yield NULL cell/dist (the
    callers filter them, but the kernel stays total for reuse).
    """
    from pyspark.sql.functions import pandas_udf

    ids = np.array([c for c, _ in cents], dtype=np.int32)
    C = np.array([v for _, v in cents], dtype=np.float64)  # k x dim

    @pandas_udf("cell int, dist double")
    def assign(vecs):
        import pandas as pd

        vals = vecs.tolist()
        n = len(vals)
        cell = np.zeros(n, dtype=np.int32)
        dist = np.zeros(n, dtype=np.float64)
        valid = np.array([v is not None for v in vals], dtype=bool)
        if valid.any():
            X = np.array([v for v in vals if v is not None], dtype=np.float64)
            D = np.zeros((X.shape[0], C.shape[0]))
            for i in range(C.shape[1]):  # sequential across dims: the
                diff = X[:, i : i + 1] - C[None, :, i]  # oracle's fold order
                D = D + diff * diff
            pos = D.argmin(axis=1)  # first minimum == smallest cell id
            cell[valid] = ids[pos]
            dist[valid] = D[np.arange(len(pos)), pos]
        return pd.DataFrame(
            {
                "cell": pd.Series(cell, dtype="Int32").mask(~valid),
                # nullable Float64, not NaN: NaN would arrive in Spark as
                # a VALUE and sort above every double (memory: NaN!=NULL
                # through Arrow).
                "dist": pd.Series(dist, dtype="Float64").mask(~valid),
            }
        )

    return assign


def _update_centroids(
    assigned: DataFrame, id_col: str, vec_col: str, exact_folds: bool
) -> Centroids:
    """One Lloyd update: mean vector per cell, collected (k x dim rows).

    ``exact_folds``: per-(cell, dim) members sort by row id and fold
    sequentially — bit-identical to the oracle's
    ``list_reduce(list(x ORDER BY vec_id))``; list state is bounded by
    cell size (the oracle-determinism tax, same trade as
    ``agg_string_agg``). Production mode is the plain partial-aggregated
    SUM. Empty cells simply vanish (no row -> no centroid), identically
    on both engines.
    """
    flat = assigned.select(
        F.col("best.cell").alias("cell"),
        F.col(id_col).alias("i"),
        F.posexplode(vec_col).alias("pos", "x"),
    )
    if exact_folds:
        s = F.aggregate(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            F.col("i"), F.col("x").cast("double").alias("x")
                        )
                    )
                ),
                lambda st: st["x"],
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        )
    else:
        s = F.sum(F.col("x").cast("double"))
    rows = (
        flat.groupBy("cell", "pos")
        .agg(s.alias("s"), F.count("*").alias("n"))
        .collect()
    )
    by_cell: dict[int, dict[int, float]] = {}
    for r in rows:
        # Python float division == the oracle's DOUBLE s / n division.
        by_cell.setdefault(r["cell"], {})[r["pos"]] = r["s"] / r["n"]
    return sorted(
        (c, [dims[p] for p in sorted(dims)]) for c, dims in by_cell.items()
    )


def kmeans_lloyd(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact_folds: bool = True,
) -> DataFrame:
    """Lloyd's k-means over an embedding column; returns the final
    assignment ``(id, cell, dist)`` with ``dist`` = squared L2 to the
    winning centroid, rounded to 6.

    Deterministic init: the ``k`` smallest-id non-NULL vectors (the
    oracle's ``ORDER BY id LIMIT k``) — the cross-engine-reproducible
    choice. Like any fixed init, Lloyd refines but never escapes it
    (a blob no seed landed in can stay merged); production would seed
    with k-means++ on a driver-side sample (``_seeded_centroids`` in
    operators/similarity.py is that shape), which is RNG-bearing and
    therefore not oracle-expressible. Each of the ``n_iter`` rounds is
    one map-side Arrow assignment pass plus one partial-aggregated
    update shuffle; the only driver data is k x dim centroid doubles
    per round. NULL vectors are excluded up front (no distance is
    defined); zero vectors are legitimate L2 points and participate.
    """
    # Persist across the n_iter+1 separate driver actions: without it
    # every collect re-runs the scan (and any upstream fan_out shuffle)
    # from scratch — ReusedExchange can't help across actions. Released
    # before returning, so the caller's one final action re-scans once
    # and nothing leaks into the session's block manager.
    valid = emb.filter(F.col(vec_col).isNotNull()).persist()
    init = valid.orderBy(id_col).limit(k).select(vec_col).collect()
    cents: Centroids = [
        (i, [float(x) for x in r[0]]) for i, r in enumerate(init)
    ]
    for _ in range(n_iter):
        assigned = valid.withColumn(
            "best", kmeans_assign_arrow(cents)(F.col(vec_col))
        )
        cents = _update_centroids(assigned, id_col, vec_col, exact_folds)
    valid.unpersist(blocking=False)
    final = valid.withColumn(
        "best", kmeans_assign_arrow(cents)(F.col(vec_col))
    )
    return final.select(
        F.col(id_col),
        F.col("best.cell").alias("cell"),
        F.round(F.col("best.dist"), 6).alias("dist"),
    )


def kmeans_oracle_sql(
    k: int = 8,
    n_iter: int = 3,
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """The DuckDB twin of :func:`kmeans_lloyd`, unrolled to ``n_iter``
    assignment/update CTE pairs. Every float op mirrors the engine's
    sequence exactly (see module docstring), so the hash compare is
    deterministic, not luck. The distance fold ranges over ``len(v)``
    (like the update CTEs already do) rather than a hardcoded dim, so
    the twin stays correct for any vector width."""

    def dist(v: str, c: str) -> str:
        return (
            f"list_reduce([({v}[i] - {c}[i]) * ({v}[i] - {c}[i]) "
            f"FOR i IN range(1, len({v}) + 1)], (a, b) -> a + b)"
        )

    parts = [
        f"""
WITH valid AS (
  SELECT {id_col} AS i, [CAST(x AS DOUBLE) FOR x IN {vec_col}] AS v
  FROM {table} WHERE {vec_col} IS NOT NULL
),
cent0 AS (
  SELECT CAST(row_number() OVER (ORDER BY i) - 1 AS INT) AS cell, v AS c
  FROM valid ORDER BY i LIMIT {k}
)"""
    ]
    for t in range(n_iter):
        parts.append(
            f""",
a{t} AS (
  SELECT p.i, p.v,
         min({{'d': {dist('p.v', 'c.c')}, 'cell': c.cell}}) AS best
  FROM valid p, cent{t} c
  GROUP BY p.i, p.v
),
u{t + 1} AS (
  SELECT cell, dim,
         list_reduce(list(x ORDER BY i), (a, b) -> a + b) / COUNT(*) AS cx
  FROM (SELECT best.cell AS cell, i,
               unnest(range(1, len(v) + 1)) AS dim, unnest(v) AS x
        FROM a{t})
  GROUP BY cell, dim
),
cent{t + 1} AS (
  SELECT cell, list(cx ORDER BY dim) AS c FROM u{t + 1} GROUP BY cell
)"""
        )
    parts.append(
        f""",
afinal AS (
  SELECT p.i,
         min({{'d': {dist('p.v', 'c.c')}, 'cell': c.cell}}) AS best
  FROM valid p, cent{n_iter} c
  GROUP BY p.i, p.v
)
SELECT i AS {id_col}, best.cell AS cell, ROUND(best.d, 6) AS dist
FROM afinal"""
    )
    return "".join(parts)
