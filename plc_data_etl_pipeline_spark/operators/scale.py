"""Scale-out layout operators: partitioned sinks, bucketed tables,
salted joins.

These are the three levers that decide whether a 100 TB job runs or
dies, demonstrated concretely (and plan-audited in tests/test_scale.py):

* **Partitioned writes** (`write_partitioned`) — hive-style directory
  partitioning on a low-cardinality derived key (e.g. order month) so
  date-ranged queries prune at the directory level: the scan's
  ``PartitionFilters`` excludes data before it is read.
* **Bucketed tables** (`write_bucketed`) — pre-shuffling both sides of a
  recurring join into the same bucket layout makes the join
  shuffle-free: SortMergeJoin with NO Exchange on either side.
* **Salted joins** (`salted_join`) — when one join key dominates (a
  "hot" key beyond what AQE's skew splitting handles), explode the hot
  side's key space by a salt factor and replicate the small side per
  salt, so the hot key's rows spread over N tasks instead of one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet write. Partition columns should be
    low-cardinality (date buckets, region codes): one directory per value,
    pruned by Catalyst when queries filter on them."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 8,
    sort_col: str | None = None,
    path: str | None = None,
    align_tasks: bool = False,
) -> None:
    """Bucketed table (saveAsTable — bucketing metadata lives in the
    catalog; ``path`` makes it external). Joining two tables bucketed on
    the same key with the same bucket count skips both shuffles.

    ``align_tasks`` pre-repartitions on the bucket column with one task
    per bucket (repartition and bucketBy share the Murmur3 hash), so
    each bucket is exactly one sorted file — without it, every write
    task emits a file per bucket it touches, and while bucket-locality
    survives, per-bucket multi-file layouts cost more open/merge work
    at read time. Off by default: it collapses write parallelism to
    ``num_buckets`` tasks, so only enable it when the bucket count is
    sized to the cluster (or the table is small enough not to care)."""
    if align_tasks:
        df = df.repartition(num_buckets, F.col(bucket_col))
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


# Joins whose semantics survive small-side replication: an unmatched
# small-side row would surface once per salt bucket under right/full
# outer (and leak the __salt column's multiplicity).
_SALTED_HOW = {"inner", "left", "left_outer", "left_semi", "leftsemi"}


def _check_salted_args(fn_name: str, how: str, salt_buckets: int) -> None:
    if how not in _SALTED_HOW:
        raise ValueError(
            f"{fn_name} supports how in {sorted(_SALTED_HOW)}, got {how!r}: "
            "replicating the small side per salt would duplicate its "
            "unmatched rows in right/full outer results"
        )
    if salt_buckets < 1:
        # 0 is silent data loss, not just disabled salting: plain
        # salted_join's explode of an EMPTY salt array drops every
        # small-side row (inner join returns nothing), and the hot
        # variant's sequence(0, -1) DESCENDS into phantom salt=-1
        # replicas that never match — the documented sequence gotcha.
        raise ValueError(
            f"{fn_name} needs salt_buckets >= 1, got {salt_buckets}"
        )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big (skewed) side's key with a
    random bucket, replicate the small side once per bucket, join on
    (key, salt). Row multiplicity is preserved exactly: each big row
    joins the single matching replica of its salt.

    Use when a handful of keys dominate the distribution (power-law
    entities); AQE's skew-join split handles moderate skew, salting
    handles the pathological tail. The salt is ``rand``-based — fine for
    execution (any bucket works); not content-derived, so results are
    unchanged.

    ``how`` is restricted to joins whose semantics survive small-side
    replication: an unmatched small-side row would surface once per salt
    bucket under right/full outer (and leak the __salt column's
    multiplicity); those need a different strategy (swap sides, or
    dedupe unmatched replicas).
    """
    _check_salted_args("salted_join", how, salt_buckets)
    salted_big = big.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    salts = F.explode(
        F.array(*[F.lit(i) for i in range(salt_buckets)])
    ).alias("__salt")
    replicated_small = small.select("*", salts)
    joined = salted_big.join(replicated_small, [key, "__salt"], how)
    return joined.drop("__salt")


def hot_keys(
    df: DataFrame,
    key: str,
    sample_fraction: float = 0.01,
    hot_share: float = 0.001,
    max_hot_keys: int = 10_000,
    seed: int = 42,
) -> DataFrame:
    """Sampled hot-key detection: keys whose share of a Bernoulli sample
    is >= ``hot_share`` (deterministic top-``max_hot_keys`` by sampled
    count, then key). One sampled scan + a key-grain aggregate whose
    output is at most the sampled distinct-key count; the result is a
    tiny (key, __hot) relation meant to be broadcast. Sampling makes
    this an execution HEURISTIC — a missed hot key degrades performance
    only, never results (salted_join_hot keeps multiplicity exact for
    every key, detected or not)."""
    samp = df.sample(fraction=sample_fraction, seed=seed).groupBy(key).agg(
        F.count("*").alias("__n")
    )
    total = samp.agg(F.sum("__n").alias("__t"))
    return (
        samp.crossJoin(F.broadcast(total))
        .filter(F.col("__n") >= F.col("__t") * hot_share)
        .orderBy(F.col("__n").desc(), key)
        .limit(max_hot_keys)
        .select(key, F.lit(True).alias("__hot"))
    )


def salted_join_hot(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 8,
    how: str = "inner",
    sample_fraction: float = 0.01,
    hot_share: float = 0.001,
    max_hot_keys: int = 10_000,
    seed: int = 42,
) -> DataFrame:
    """Hot-key-only salted join — the 100 TB form of ``salted_join``.

    Blanket salting replicates the ENTIRE small side once per bucket:
    at 75M small-side rows x 8 salts that is 600M shuffled rows and a
    guaranteed spill (measured: the sf50 probe), paid even when only a
    handful of keys are actually skewed. This variant salts ONLY the
    keys a sampled pass flags as hot (``hot_keys``): both sides are
    tagged by a broadcast join against the hot-key relation, hot big
    rows get a random salt in [0, salt_buckets), cold rows salt 0; hot
    small rows replicate across all buckets via an exploded
    ``sequence``, cold small rows keep the single salt 0. ONE equi-join
    on (key, salt) — single scan per side, replication proportional to
    the hot-key row count, not the table.

    Row multiplicity is exact for every key whatever the sample says:
    a big row's (key, salt) always matches exactly one small replica.
    ``how`` is restricted exactly like ``salted_join`` and for the same
    reason (unmatched small-side rows would surface once per replica
    under right/full outer)."""
    _check_salted_args("salted_join_hot", how, salt_buckets)
    hot = hot_keys(
        big,
        key,
        sample_fraction=sample_fraction,
        hot_share=hot_share,
        max_hot_keys=max_hot_keys,
        seed=seed,
    )
    salted_big = (
        big.join(F.broadcast(hot), key, "left")
        .withColumn(
            "__salt",
            F.when(
                F.col("__hot").isNotNull(),
                (F.rand(seed=seed) * salt_buckets).cast("int"),
            ).otherwise(F.lit(0)),
        )
        .drop("__hot")
    )
    replicated_small = (
        small.join(F.broadcast(hot), key, "left")
        .withColumn(
            "__salt",
            F.explode(
                F.when(
                    F.col("__hot").isNotNull(),
                    F.sequence(F.lit(0), F.lit(salt_buckets - 1)),
                ).otherwise(F.array(F.lit(0)))
            ),
        )
        .drop("__hot")
    )
    return salted_big.join(replicated_small, [key, "__salt"], how).drop(
        "__salt"
    )


def key_distribution(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Skew diagnosis: per-key row counts + share of total for the top-N
    keys (run this before choosing between plain, AQE-skew, and salted
    joins)."""
    counts = df.groupBy(key).agg(F.count("*").alias("n_rows"))
    total = counts.agg(F.sum("n_rows").alias("t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn("share", F.round(F.col("n_rows") / F.col("t"), 6))
        .drop("t")
        .orderBy(F.col("n_rows").desc(), F.col(key))
        .limit(top_n)
    )


def zorder_key(
    cols: list[Column | str],
    mins: list[float],
    maxs: list[float],
    bits: int = 16,
) -> Column:
    """Morton (Z-order) key: quantize each column to ``bits`` bits over
    its [min, max] range and interleave the bits. Sorting/range-
    partitioning by this key clusters rows that are close in EVERY
    dimension into the same files/row groups, so parquet min-max stats
    prune multi-dimensional predicates — the layout trick behind
    Delta/Iceberg OPTIMIZE ZORDER, here as a plain column expression.

    JVM-only bit arithmetic (shifts + masks, flat expression — stays in
    whole-stage codegen); 2 cols x 16 bits = 32-bit keys, far inside the
    63-bit ANSI-safe envelope. Ranges are explicit parameters: at 100 TB
    you know them from table stats — computing them inline would add a
    full pass."""
    ncols = len(cols)
    top = float((1 << bits) - 1)
    qs = []
    for c, lo, hi in zip(cols, mins, maxs):
        cc = F.col(c) if isinstance(c, str) else c
        scaled = (cc.cast("double") - lo) / ((hi - lo) or 1.0) * top
        qs.append(
            F.least(F.greatest(scaled, F.lit(0.0)), F.lit(top)).cast("long")
        )
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, q in enumerate(qs):
            z = z + F.shiftright(q, i).bitwiseAND(F.lit(1)) * F.lit(
                1 << (i * ncols + j)
            )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    mins: list[float],
    maxs: list[float],
    num_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of ``cols``:
    range-partition on the Morton key (contiguous key ranges per file),
    sort within partitions, drop the helper key. Every output file then
    covers a small hyper-rectangle of the key space — min-max pruning
    works for predicates on ANY of the clustered columns, not just the
    leading sort key."""
    z = zorder_key(cols, mins, maxs, bits).alias("__zkey")
    (
        df.withColumn("__zkey", z)
        .repartitionByRange(num_files, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def band_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    band_us: int,
) -> DataFrame:
    """Keyless time-proximity join (|right.ts - left.ts| <= band_us)
    WITHOUT a cartesian: both sides bucket their event time into
    band-width cells, the right side probes its own cell and both
    neighbors (explode x3), and candidates join on the cell id before
    the exact band predicate runs. Any match is within one band of the
    left row, so its right bucket is one of {b-1, b, b+1} — each true
    pair is produced exactly once (the probe set is distinct).

    Scale: pair space is sum over cells of |L_cell| x 3|R_cell| —
    density-bounded instead of |L| x |R|. The band width is the skew
    knob: it bounds per-cell population exactly like LSH bucket size.
    Emits left/right columns prefixed ``l_`` / ``r_`` plus ``dt_us``.
    """
    l_us = F.unix_micros(F.col(left_ts).cast("timestamp"))
    r_us = F.unix_micros(F.col(right_ts).cast("timestamp"))
    lb = left.select(
        *[F.col(c).alias(f"l_{c}") for c in left.columns],
        l_us.alias("__l_us"),
        F.floor(l_us / band_us).alias("__cell"),
    )
    rcell = F.floor(r_us / band_us)
    rb = right.select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns],
        r_us.alias("__r_us"),
        F.explode(
            F.array(rcell - 1, rcell, rcell + 1)
        ).alias("__cell"),
    )
    return (
        lb.join(rb, "__cell")
        .withColumn("dt_us", F.col("__r_us") - F.col("__l_us"))
        .filter(F.abs(F.col("dt_us")) <= band_us)
        .drop("__cell", "__l_us", "__r_us")
    )
