"""Deduplication operators for LLM training-data pipelines.

Four families (BASELINE.json north star — deduplication):

  * exact          — hash group-by on content, keep min-key survivor
  * MinHash + LSH  — shingle → minhash signature → banded bucket join →
                     candidate pairs → exact Jaccard verify
  * SimHash        — 64-bit sign-of-sum fingerprint, near-dups share
                     (almost) the same hash
  * n-gram Jaccard — exact verified similarity on candidate pairs

Scale design: nothing here ever compares all pairs. LSH banding turns the
O(n²) problem into a bucket-equi-join (shuffle on band hash); candidate
verification joins back to bounded token arrays. All hashing is
``xxhash64`` with fixed seeds — deterministic across runs and cluster
sizes. MinHash here is DataFrame-native (explode + k min-aggregates)
rather than pyspark.ml's MinHashLSH: same math, no Vector conversion, and
the signature agg is a single map-side-combinable shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel as _StorageLevel
from pyspark.sql.window import Window

from ..catalog import shuffle_partitions


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, content_cols: list[str], order_col: str) -> DataFrame:
    """Keep exactly one row per distinct content (the min ``order_col``).

    Window row_number over the content hash — one shuffle on content,
    deterministic survivor (unlike ``dropDuplicates``, which keeps an
    arbitrary row and is therefore not oracle-checkable).
    """
    w = Window.partitionBy(*content_cols).orderBy(order_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def incremental_dedup(
    batch: DataFrame,
    corpus: DataFrame,
    content_cols: list[str],
    order_col: str,
) -> DataFrame:
    """Dedup a NEW batch against an already-ingested corpus plus itself —
    the daily-crawl pattern: yesterday's 100 TB corpus is never rescanned
    per-row, today's delta is.

    Both steps key on a 256-bit content digest, not the content itself:

    * the corpus side is projected to the single digest column before the
      shuffle — at 100 TB the exchange carries 32-byte digests instead of
      document bodies (and with a digest column materialized at ingest,
      the scan reads one column);
    * the within-batch survivor window partitions on the same ``__h``
      key the anti-join already shuffled on, so it inherits the join's
      output partitioning — two exchanges total (one per join side),
      none for the window.

    Survivor choice is deterministic (min ``order_col``), matching
    :func:`exact_dedup`. SHA-256 collisions are negligible (birthday
    bound ~2^128 rows).
    """

    def digest(df: DataFrame) -> Column:
        return F.sha2(
            F.concat_ws("\x1f", *[F.col(c).cast("string") for c in content_cols]),
            256,
        )

    seen = corpus.select(digest(corpus).alias("__h"))
    w = Window.partitionBy("__h").orderBy(order_col)
    return (
        batch.withColumn("__h", digest(batch))
        .join(seen, "__h", "left_anti")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__h")
    )


def _bloom_content(content_cols: list[str]) -> list[Column]:
    """NULL-tagged string forms of the content columns: xxhash64 SKIPS
    NULL children, so hashing raw columns would make ('x', NULL) and
    (NULL, 'x') collide on every hash — a systematic 100%-collision
    class, not a probabilistic FP. Coalescing each column to a sentinel
    keeps NULL positional."""
    return [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00<NULL>"))
        for c in content_cols
    ]


def _bloom_positions(
    content_cols: list[str], n_bits: int, n_hashes: int
) -> Column:
    """Array of the ``n_hashes`` bloom bit positions for a row's content
    (xxhash64 varied by a prepended per-hash literal; pmod keeps the
    position non-negative)."""
    content = _bloom_content(content_cols)
    return F.array(
        *[
            F.pmod(F.xxhash64(F.lit(i), *content), F.lit(n_bits))
            for i in range(n_hashes)
        ]
    )


def _bloom_word_cols() -> tuple[Column, Column]:
    """Shared bit layout of build and probe: 64-bit words indexed by
    pos>>6, bit pos&63 — ONE definition so the two sides can never
    disagree. (Function, not module constants: F.expr needs an active
    SparkContext in classic mode.)"""
    return (
        F.expr("shiftright(__pos, 6)"),
        F.expr("shiftleft(1L, cast(__pos & 63 as int))"),
    )


def bloom_build(
    df: DataFrame,
    content_cols: list[str],
    n_bits: int = 1 << 23,
    n_hashes: int = 5,
) -> DataFrame:
    """Distributed Bloom filter over row content, materialized as a
    bitmap-words DataFrame ``(word_idx: long, bits: long)`` — at most
    ``n_bits/64`` rows regardless of corpus size.

    This is the bounded-memory form of the corpus side of
    :func:`incremental_dedup`: exact digests cost 32 bytes/doc (3.2 TB
    of shuffle for a 100B-doc corpus), a Bloom at ~10 bits/doc costs
    ~125 GB — and the bitmap itself is built with ONE keyed aggregation
    (explode k positions → bit_or per 64-bit word), never a driver-side
    sketch merge. Deterministic: xxhash64 is seed-fixed, so the same
    corpus always yields the same bitmap (bit-stable across partitioning
    and engines' task orders — bit_or is commutative).

    Classic analysis (Bloom 1970, CACM 13(7)): false-positive rate
    ~= (1 - e^(-k*n/m))^k for n elements, m bits, k hashes; false
    negatives are impossible.
    """
    pos = F.explode(_bloom_positions(content_cols, n_bits, n_hashes)).alias(
        "__pos"
    )
    return (
        df.select(pos)
        .select(
            _bloom_word_cols()[0].alias("word_idx"),
            _bloom_word_cols()[1].alias("__mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__mask").alias("bits"))
    )


def bloom_incremental_new(
    batch: DataFrame,
    bloom: DataFrame,
    content_cols: list[str],
    id_col: str,
    n_bits: int = 1 << 23,
    n_hashes: int = 5,
    broadcast_bloom: bool = True,
) -> DataFrame:
    """Rows of ``batch`` whose content is definitely NOT in the corpus
    the ``bloom`` bitmap was built over (same n_bits/n_hashes!) — the
    crawl-ingest admission gate: no false negatives ever (a true dup is
    always caught), a tunable sliver of false positives (new docs
    wrongly dropped as dups — acceptable for crawl dedup, where recall
    of NEW content trades against never re-admitting dups).

    Plan: probe keys ((id, content-hash), k positions) explode once,
    ONE equi-join against the bitmap words (broadcast by default; pass
    ``broadcast_bloom=False`` for bitmaps past executor memory or the
    8 GB BroadcastExchange cap — a SHUFFLE_HASH hint then keeps the
    bitmap the pinned build side, partition-wise), per-(id, hash)
    AND-fold, then a semi-join back onto the batch. Gating keys on the
    content hash alongside the id keeps the guarantee even when id
    values repeat with DIFFERENT content (each distinct content gates
    on its own probes, never on a neighbor's). Batch document bodies
    never replicate through the probe — only key/position pairs do.
    """
    content_h = F.xxhash64(F.lit(-1), *_bloom_content(content_cols)).alias(
        "__ch"
    )
    probes = batch.select(
        F.col(id_col),
        content_h,
        F.explode(_bloom_positions(content_cols, n_bits, n_hashes)).alias(
            "__pos"
        ),
    ).select(
        id_col,
        "__ch",
        _bloom_word_cols()[0].alias("word_idx"),
        _bloom_word_cols()[1].alias("__mask"),
    )
    hit = (
        F.col("bits").isNotNull()
        & (F.col("bits").bitwiseAND(F.col("__mask")) == F.col("__mask"))
    ).cast("int")
    bloom_side = F.broadcast(bloom) if broadcast_bloom else bloom.hint(
        "shuffle_hash"
    )
    new_keys = (
        probes.join(bloom_side, "word_idx", "left")
        .groupBy(id_col, "__ch")
        .agg(F.min(hit).alias("__all_hit"))
        .filter(F.col("__all_hit") == 0)
        .select(id_col, "__ch")
    )
    # Null-SAFE id equality on the semi-join back: plain `=` is
    # null-rejecting, so a batch row with a NULL id would be silently
    # dropped even when its content is definitely new — a systematic
    # drop, not the documented probabilistic false positive. (__ch is
    # never NULL: xxhash64 over a non-empty argument list always
    # produces a value.)
    nk = new_keys.select(
        F.col(id_col).alias("__nk_id"), F.col("__ch").alias("__nk_ch")
    )
    return (
        batch.withColumn("__ch", content_h)
        .join(
            nk,
            F.col(id_col).eqNullSafe(F.col("__nk_id"))
            & (F.col("__ch") == F.col("__nk_ch")),
            "left_semi",
        )
        .drop("__ch")
    )


# ---------------------------------------------------------------------------
# Shingling / n-grams
# ---------------------------------------------------------------------------


def word_shingles(tokens_col: Column, n: int = 3) -> Column:
    """n-token shingles as strings: ['a b c', 'b c d', ...].

    Built as n-1 pairwise ``zip_with`` concats of shifted array slices —
    measured 3.4x faster than the naive transform(sequence)+slice form,
    which allocates a fresh subarray per shingle position.
    """
    length = F.greatest(F.size(tokens_col) - (n - 1), F.lit(0))
    out = F.slice(tokens_col, 1, length)
    for i in range(1, n):
        shifted = F.slice(tokens_col, i + 1, length)
        out = F.zip_with(out, shifted, lambda acc, tok: F.concat_ws(" ", acc, tok))
    return out


# NOTE on shingle representation: hashing shingles to longs inside the
# transform (xxhash64 of the 3 tokens, or token-hash + shift/XOR combine)
# was benchmarked 2-4x SLOWER than the plain string build — Catalyst
# inlines HOF lambda references, so every reuse of a "precomputed" token
# hash array re-evaluates it. String shingles + one xxhash64 at the
# signature stage is the fastest shape on Spark 4.1.


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    shingle_col: str = "shingle",
    num_hashes: int = 16,
) -> DataFrame:
    """(id, h0..h{k-1}) minhash signature per document.

    Input: one row per (id, shingle). The k hash functions are ONE
    xxhash64 base hash + k linear permutations h_i = (a_i*h + b_i) mod
    p (p = 2^31-1) — the standard universal-hash family; one expensive
    hash per shingle instead of k, and the multiply stays inside 62 bits
    so ANSI overflow checking (Spark 4 default) is happy. The signature
    is k MIN aggregates — map-side combinable, single shuffle on id.
    """
    p = 2147483647  # 2^31 - 1 (Mersenne prime)
    # Well-spread deterministic (a_i, b_i) for the universal hash family —
    # sequential multipliers correlate the permutations and wreck banding.
    import random

    rng = random.Random(42)
    coeffs = [(rng.randrange(1, p - 1), rng.randrange(0, p - 1)) for _ in range(num_hashes)]
    base = F.pmod(F.xxhash64(F.lit(42), F.col(shingle_col)), F.lit(p)).alias("_h")
    hashed = df.select(F.col(id_col), base)
    return hashed.groupBy(id_col).agg(
        *[
            F.min(F.pmod(F.col("_h") * F.lit(a) + F.lit(b), F.lit(p))).alias(f"h{i}")
            for i, (a, b) in enumerate(coeffs)
        ]
    )


def minhash_signatures_arrow(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """(id, h0..h{k-1}) signatures straight from (id, text) via
    Arrow-batched mapInPandas — no explode, no shuffle.

    Signature computation is per-document and embarrassingly parallel;
    the expression-API formulation (explode 80x + groupBy-min) exists
    only to fit the aggregate model and pays a multi-million-row partial
    aggregation for it. Measured 4-5x faster at sf0.1. Hashing: crc32
    (deterministic, C-speed) reduced mod 2^31-1, then the same
    universal-hash permutation family as the JVM path, vectorized in
    numpy. Used by default; the pure-JVM path (minhash_signatures)
    remains for environments where Python workers are undesirable.
    """
    import numpy as np

    p = 2147483647
    rng = np.random.RandomState(42)
    a_vec = rng.randint(1, p - 1, size=num_hashes).astype(np.int64)
    b_vec = rng.randint(0, p - 1, size=num_hashes).astype(np.int64)

    def batches(it):
        import zlib

        import pandas as pd

        for pdf in it:
            # Python does only the irreducible string work (tokenize +
            # crc32 per shingle); the permutation/min runs ONCE per batch
            # as a single k x N matrix + segmented min (minimum.reduceat)
            # instead of one tiny matmul per document. At sf0.1 batch
            # sizes (~150 docs) the crc32 loop dominates either way; the
            # batched form matters at real Arrow batch sizes (10k docs).
            ids, hs_parts, counts = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                toks = text.split(" ") if isinstance(text, str) else []
                if len(toks) < shingle_n:
                    continue
                grams = {
                    zlib.crc32(" ".join(toks[i : i + shingle_n]).encode())
                    for i in range(len(toks) - shingle_n + 1)
                }
                ids.append(doc_id)
                hs_parts.append(
                    np.fromiter(grams, dtype=np.int64, count=len(grams))
                )
                counts.append(len(grams))
            out = {id_col: ids}
            if ids:
                hs = np.concatenate(hs_parts) % p
                mat = (a_vec[:, None] * hs[None, :] + b_vec[:, None]) % p
                bounds = np.zeros(len(counts), dtype=np.int64)
                np.cumsum(counts[:-1], out=bounds[1:])
                sig = np.minimum.reduceat(mat, bounds, axis=1)
            else:
                sig = np.empty((num_hashes, 0), dtype=np.int64)
            for i in range(num_hashes):
                out[f"h{i}"] = sig[i]
            yield pd.DataFrame(out)

    schema = f"{id_col} long, " + ", ".join(f"h{i} long" for i in range(num_hashes))
    return df.select(id_col, text_col).mapInPandas(batches, schema)


def suffix_pairs_expr(ids: str = "ids") -> Column:
    """All ordered pairs from a SORTED id array: element i paired with
    every later element — exactly the id_a < id_b pairs. (``[]`` is
    0-based in Spark SQL; ``slice()`` is 1-based.)"""
    return F.expr(
        f"flatten(transform({ids}, (x, i) -> "
        f"transform(slice({ids}, i + 2, size({ids})), "
        "y -> struct(x AS id_a, y AS id_b))))"
    )


def _exact_first_groups(
    df: DataFrame,
    id_col: str,
    key_col: str,
    eligible: Column | None = None,
) -> DataFrame:
    """Shared exact-first core: group ids by an identity key (text,
    fingerprint, ...) into sorted arrays — the input for star-pair
    emission and representative election. NULL keys are ALWAYS
    excluded (undefined content is not a duplicate of other undefined
    content); ``eligible`` adds a caller-specific predicate on top
    (e.g. the ml variant's shingle-length floor). Centralized because
    four call sites hand-rolling this drifted into divergent NULL
    policies (a real bug caught in round-3 review)."""
    cond = F.col(key_col).isNotNull()
    if eligible is not None:
        cond = cond & eligible
    return (
        df.filter(cond)
        .groupBy(key_col)
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
    )


def star_pairs_expr(ids: str = "ids") -> Column:
    """Representative star over a SORTED id array: the smallest id
    paired with every other member — linear in group size, and for
    dedup clustering it preserves the same connected components as the
    full clique. (``ids[0]`` — ``[]`` is 0-based in Spark SQL.)"""
    return F.expr(
        f"transform(slice({ids}, 2, size({ids}) - 1), "
        f"y -> struct({ids}[0] AS id_a, y AS id_b))"
    )


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Banded LSH: docs agreeing on ALL rows of any band become a candidate
    pair. Returns distinct (id_a, id_b) with id_a < id_b.

    Pair generation is ONE keyed aggregation: bucket members are
    collected per (band, bucket) and expanded to ordered pairs in-place
    with JVM array HOFs. Compared to the textbook bucket self-join this
    computes the signature subtree ONCE (a self-join would execute the
    Python mapInPandas stage on both sides — no common-subexpression
    reuse across join children), shuffles once instead of twice, and the
    quadratic expansion stays inside each bucket. ``max_bucket_size``
    guards the 100 TB degenerate case (a boilerplate-signature bucket
    with millions of members): such buckets are near-identical spam
    better handled by exact dedup first; capped buckets are dropped
    whole, keeping the expansion O(cap²) per bucket.
    """
    rows_per_band = num_hashes // bands
    # All band buckets in ONE projection + explode — a union of per-band
    # projections would re-execute the signature subtree (mapInPandas has
    # no common-subexpression reuse) once per band.
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[
                        F.col(f"h{b * rows_per_band + r}")
                        for r in range(rows_per_band)
                    ]
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    buckets = sig_df.select(
        F.col(id_col), F.explode(band_structs).alias("bb")
    ).select(F.col(id_col), F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    grouped = buckets.groupBy("band", "bucket").agg(
        F.sort_array(F.collect_list(id_col)).alias("ids")
    )
    if max_bucket_size is not None:
        grouped = grouped.filter(F.size("ids") <= max_bucket_size)
    return (
        grouped.filter(F.size("ids") >= 2)
        .select(F.explode(suffix_pairs_expr()).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame,
    shingle_sets: DataFrame,
    id_col: str,
    set_col: str = "shingles",
    threshold: float = 0.7,
) -> DataFrame:
    """Exact Jaccard on candidate pairs via two joins to the (bounded)
    per-doc shingle arrays; keeps pairs with similarity >= threshold.

    Both joins are hinted sort-merge: the planner must NEVER broadcast a
    side here — the set side is far larger materialized than its scan
    stats suggest (a broadcast-OOM trap measured at sf1), and the pair
    side is output-dependent (dup-heavy corpus -> millions of pairs)."""
    sa = shingle_sets.select(
        F.col(id_col).alias("id_a"), F.col(set_col).alias("set_a")
    )
    sb = shingle_sets.select(
        F.col(id_col).alias("id_b"), F.col(set_col).alias("set_b")
    )
    inter = F.size(F.array_intersect("set_a", "set_b"))
    union = F.size(F.array_union("set_a", "set_b"))
    return (
        pairs.hint("merge")
        .join(sa, "id_a")
        .hint("merge")
        .join(sb, "id_b")
        .withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
    threshold: float = 0.7,
    use_arrow: bool = True,
    exact_first: bool = True,
) -> DataFrame:
    """End-to-end fuzzy-dup pair detection: shingle → minhash → LSH bands →
    exact Jaccard verify. Returns (id_a, id_b, jaccard).

    ``use_arrow`` selects the mapInPandas signature path (default, no
    shuffle — see minhash_signatures_arrow); the JVM expression path is
    the fallback. The Jaccard verify stage is JVM either way.

    ``exact_first`` (default) collapses byte-identical texts to STAR
    pairs at jaccard 1.0 before MinHash, and runs LSH only on the
    distinct-text representatives — the same spanning-structure
    contract as simhash_near_pairs and minhash_ml_pairs: a c-copy
    identical group emits c-1 star pairs instead of the C(c,2) clique,
    and near-dup pairs link representatives. Connected components
    (what dedup clustering consumes) are preserved exactly; pair-level
    clique completeness is traded for linear output on dup-heavy
    corpora (measured at the sf5 98%-duplicate replica corpus:
    6.77M clique pairs / 144 s  ->  0.25M spanning pairs / ~9 s —
    identical texts never need MinHash, and full cliques are O(c²)
    per group BY CONSTRUCTION, a real 100 TB scale-killer on web
    corpora where c reaches millions).
    """
    if exact_first:
        # NULL texts are undefined content, not duplicates of each
        # other — excluded from identity grouping exactly like
        # simhash_near_pairs (and like this function's own prior
        # behavior: a NULL text produced no signature and no pairs).
        # Identical NON-NULL texts pair at jaccard 1.0 regardless of
        # length: exact duplication is a text-level fact, so the
        # shingle floor does not apply to it (the ml variant documents
        # the opposite choice for its own pair contract).
        g = _exact_first_groups(df, id_col, text_col)
        # The grouped frame feeds THREE consumers (star pairs, the
        # signature stage via reps, the shingle-verify side via reps) and
        # each prunes different columns, so neither ReuseExchange nor AQE
        # stage reuse fires — measured 3x full-text groupBy executions
        # and 14 exchanges at sf0.1 (the round-3 bench regression). A
        # LAZY localCheckpoint materializes the aggregation once on
        # first use and shares it across all branches of the same
        # action; unlike an in-operator .cache() it is released by the
        # ContextCleaner when the returned frame is garbage-collected,
        # so repeated invocations do not pile up executor storage.
        g = g.localCheckpoint(eager=False)
        # (Measured alternative: re-spreading the representatives with a
        # repartition before the Python signature stage does NOT pay —
        # the extra exchange costs more than the 0.2 s of single-core
        # Python it parallelizes at sf0.1, and at real scale the groupBy
        # output is already wide.)
        exact_stars = (
            g.filter(F.size("ids") >= 2)
            .select(F.explode(star_pairs_expr()).alias("p"))
            .select("p.id_a", "p.id_b", F.lit(1.0).alias("jaccard"))
        )
        reps = g.select(
            F.element_at("ids", 1).alias(id_col), F.col(text_col)
        )
        near = minhash_dedup_pairs(
            reps, id_col, text_col, shingle_n, num_hashes, bands,
            threshold, use_arrow, exact_first=False,
        )
        # Register the shared checkpoint as round state: GC release is
        # asynchronous (the sf5 sequential probe shows the block still
        # resident right after the consuming action), so long-lived
        # callers that hold the pair frame can drop it deterministically
        # with operators/graph.py::release_round_state once consumed.
        from .graph import _register_round_state

        return _register_round_state(near.unionByName(exact_stars), g)
    toks = F.split(F.col(text_col), " ")
    if use_arrow:
        sigs = minhash_signatures_arrow(df, id_col, text_col, shingle_n, num_hashes)
    else:
        shingled = df.select(
            F.col(id_col),
            F.array_distinct(word_shingles(toks, shingle_n)).alias("shingles"),
        ).filter(F.size("shingles") > 0)
        exploded = shingled.select(
            F.col(id_col), F.explode("shingles").alias("shingle")
        )
        sigs = minhash_signatures(exploded, id_col, "shingle", num_hashes)
    cands = lsh_candidate_pairs(sigs, id_col, num_hashes, bands)
    # Verify on the candidate pairs ONLY — and against shingle arrays
    # computed ONCE per doc. Without a barrier, Catalyst inlines the
    # whole split+zip_with shingle chain into the join residual AND the
    # projection, re-deriving the arrays from raw text per candidate
    # evaluation: harmless at low dup rates, catastrophic on dup-heavy
    # corpora where candidates ~ output (measured 27s vs 3s at sf1 with
    # 90% planted dups). The barrier is F.shuffle() — shingle SETS are
    # order-insensitive for intersect/union, and a nondeterministic
    # expression is exactly what stops CollapseProject/PushDownPredicate
    # from duplicating the chain, with no cached state to leak (an
    # in-operator .cache() would pile up a copy per invocation).
    sh = df.select(
        F.col(id_col),
        F.shuffle(
            F.array_distinct(
                word_shingles(F.split(F.col(text_col), " "), shingle_n)
            )
        ).alias("shingles"),
    )
    return jaccard_verify(cands, sh, id_col, "shingles", threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """63-bit SimHash per document, entirely in JVM higher-order functions.

    Each token hashes to 64 bits; bit b contributes +1/-1 to dimension b;
    the fingerprint sets bit b iff the sum is positive. Near-duplicate
    texts differ in few bits (compare via popcount of XOR).

    Implementation: one 0/1 bit column per dimension from the token
    hash, reduced per document with 63 plain SUM aggregates plus a
    COUNT (the ±1 sum for bit b is 2*sum(bit_b) - n_tokens) — no
    Python, fixed-width aggregation buffers, map-side partials, no
    explode blow-up beyond the token count.
    """
    toks = F.array_distinct(F.split(F.col(text_col), " "))
    tok_df = df.select(F.col(id_col), F.explode(toks).alias("tok"))
    h = F.xxhash64(F.lit(7), F.col("tok"))
    # One 0/1 bit column per dimension (shiftright needs a Python int,
    # so the bit loop is unrolled at plan-build time). The per-doc +-1
    # contribution sum for bit b is then 2*sum(bit_b) - n_tokens, so the
    # whole reduction is 64 plain SUMs + a COUNT: fixed-width agg
    # buffers with map-side partials. (The previous collect_list of
    # per-token 64-wide arrays built ~n_tokens*64 ints PER DOC in the
    # aggregation buffer — GC death on a 50k-doc corpus at sf1.)
    bits = [
        F.shiftright(h, b).bitwiseAND(F.lit(1)).alias(f"b{b}") for b in range(63)
    ]
    per_tok = tok_df.select(F.col(id_col), *bits)
    summed = per_tok.groupBy(id_col).agg(
        F.count("*").alias("n"),
        *[F.sum(f"b{b}").alias(f"s{b}") for b in range(63)],
    )
    # Bit b of the fingerprint is set iff the +-1 sum is positive
    # (2*s_b > n); element b maps to bit (62-b), matching the previous
    # Horner fold over sums[0..62]. A flat 63-term long sum stays well
    # inside the analyzer budget and keeps the long positive under ANSI
    # overflow checking (Spark 4 default).
    fp = None
    for b in range(63):
        term = F.when(2 * F.col(f"s{b}") > F.col("n"), F.lit(1 << (62 - b))).otherwise(
            F.lit(0)
        ).cast("long")
        fp = term if fp is None else fp + term
    return summed.select(F.col(id_col), fp.alias("simhash"))


def hamming64(a: Column, b: Column) -> Column:
    """Popcount of XOR — bit distance between two 64-bit fingerprints."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_bits: int = 8,
    max_bucket_size: int = 512,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit fingerprint into 4
    16-bit blocks (pigeonhole: <= 3-bit difference guarantees one equal
    block; wider differences are caught probabilistically), bucket the
    ids per (block, key), verify Hamming distance <= max_bits.

    PAIR CONTRACT: the result is a SPANNING STRUCTURE of the near-dup
    graph, not the full clique listing — members of an identical-
    fingerprint group link through their smallest id (star), and only
    group representatives pair across fingerprints. Connected
    components (what dedup clustering consumes) are identical to the
    clique listing; pair-level completeness is traded for linear cost
    on dup-heavy corpora.

    Exact-first on the fingerprint: documents sharing an IDENTICAL
    fingerprint are Hamming-0 pairs by definition — each identical
    group emits star pairs to its smallest id immediately (always
    passing the verify), and only DISTINCT fingerprints enter the
    block banding. This keeps identical near-dups from being lost to
    the skew guard below, and shrinks the bucket join to distinct
    fingerprints.

    Skew guard: template-heavy corpora concentrate fingerprints — the
    test corpus puts 23% of documents in ONE 16-bit bucket, and a
    bucket self-join is quadratic in bucket size (130M rows from a
    single sf1 bucket — executor OOM). Buckets of <= max_bucket_size
    DISTINCT fingerprints emit all pairs; larger buckets emit star
    pairs to the bucket's smallest representative. The star preserves
    connected components for dedup clustering at linear cost; the
    documented recall tradeoff (a mega-bucket pair is only verified via
    the representative) now applies only past max_bucket_size DISTINCT
    fingerprints in one 16-bit bucket.

    Exact-first on the TEXT as well (round 3): byte-identical documents
    are Hamming-0 by definition, so they emit star pairs directly and
    only distinct-text representatives get a fingerprint — the 63-SUM
    fingerprint aggregation runs over the distinct corpus, not the raw
    one (sf5 98%-dup audit: 50x fewer fingerprint rows, 55.9 s -> ~8 s,
    identical spanning structure). NULL texts are excluded from the
    star grouping — they are undefined content, not duplicates of each
    other — matching their prior behavior (no fingerprint, no pairs)."""
    # Lazy checkpoint: the text-level grouped frame feeds TWO consumers
    # (text stars + the fingerprint pipeline via reps) — without the
    # barrier the full-text groupBy runs twice per action (same
    # round-8-continuation finding as fingerprint_near_pairs' inner
    # group; one materialization shared across branches).
    g = _exact_first_groups(df, id_col, text_col).localCheckpoint(
        eager=False
    )
    text_stars = (
        g.filter(F.size("ids") >= 2)
        .select(F.explode(star_pairs_expr()).alias("p"))
        .select("p.id_a", "p.id_b", F.lit(0).alias("hamming"))
    )
    reps = g.select(F.element_at("ids", 1).alias(id_col), F.col(text_col))
    fps = simhash(reps, id_col, text_col)
    near = fingerprint_near_pairs(
        fps, id_col, "simhash", max_bits=max_bits,
        max_bucket_size=max_bucket_size,
    )
    from .graph import _register_round_state

    return _register_round_state(
        near.unionByName(text_stars),
        g,
        *getattr(near, "_round_state", ()),
    )


def fingerprint_near_pairs(
    fps: DataFrame,
    id_col: str,
    fp_col: str,
    max_bits: int = 8,
    max_bucket_size: int = 512,
) -> DataFrame:
    """Near-dup pairs over ANY 64-bit fingerprint column (SimHash,
    media pHash, ...): the fingerprint-generic core of
    ``simhash_near_pairs`` — exact-first identical-fingerprint stars,
    4×16-bit pigeonhole block bucketing over DISTINCT fingerprints,
    mega-bucket star fallback past ``max_bucket_size``, exact
    bit_count(xor) verify on candidates only. Same spanning-structure
    pair contract and skew guards as documented there."""
    fps = fps.select(F.col(id_col), F.col(fp_col).alias("simhash"))
    # The grouped frame feeds FOUR consumers (exact stars, the block
    # subtree via reps, and BOTH verify sides fa/fb) — with no barrier,
    # each subtree re-derives the whole upstream fingerprint pipeline
    # (the 63-SUM SimHash aggregation, or the mapInPandas pHash stage)
    # because Catalyst has no common-subexpression reuse across plan
    # branches and the consumers prune different columns, so
    # ReuseExchange never fires (round-8 continuation: the un-barriered
    # plan carries FOUR MapInPandas + four parquet-scan copies —
    # plans/r08/fingerprint_near_pairs_before.txt; min-of-6 interleaved
    # at sf0.1: dedup_simhash 3.49 s → 2.80 s, pHash pair stream
    # 1.11 s → 1.05 s, and the avoided re-executions grow with the
    # corpus — the sf5 dup-heavy audit put ONE simhash aggregation pass
    # at ~8 s, so ×4 of it is the real scale stake).
    # Same lazy-localCheckpoint pattern as minhash_dedup_pairs: one
    # materialization shared by all branches of the same action,
    # registered as round state for deterministic release.
    g = _exact_first_groups(fps, id_col, "simhash").localCheckpoint(
        eager=False
    )
    exact_stars = (
        g.filter(F.size("ids") >= 2)
        .select(F.explode(star_pairs_expr()).alias("p"))
        .select("p.id_a", "p.id_b", F.lit(0).alias("hamming"))
    )
    reps = g.select(F.element_at("ids", 1).alias(id_col), F.col("simhash"))
    # all 4 block keys in ONE projection + explode — a unionByName of 4
    # per-block projections would re-execute the fingerprint aggregate
    # subtree once per branch (same reasoning as lsh_candidate_pairs)
    block_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("block"),
                F.shiftrightunsigned(F.col("simhash"), i * 16)
                .bitwiseAND(F.lit(0xFFFF))
                .alias("key"),
            )
            for i in range(4)
        ]
    )
    blocks = reps.select(
        F.col(id_col), F.explode(block_structs).alias("bk")
    ).select(
        F.col(id_col),
        F.col("bk.block").alias("block"),
        F.col("bk.key").alias("key"),
    )
    grouped = (
        blocks.groupBy("block", "key")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
    )
    pair_arr = F.when(
        F.size("ids") <= max_bucket_size, suffix_pairs_expr()
    ).otherwise(star_pairs_expr())
    cands = (
        grouped.select(F.explode(pair_arr).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    fa = reps.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("fp_a"))
    fb = reps.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("fp_b"))
    near = (
        cands.join(fa, "id_a")
        .join(fb, "id_b")
        .withColumn("hamming", hamming64(F.col("fp_a"), F.col("fp_b")))
        .filter(F.col("hamming") <= max_bits)
        .select("id_a", "id_b", "hamming")
    )
    from .graph import _register_round_state

    return _register_round_state(near.unionByName(exact_stars), g)


def minhash_ml_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    num_tables: int = 8,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash LSH via pyspark.ml (HashingTF -> MinHashLSH ->
    approxSimilarityJoin) — the built-in alternative to the DataFrame-
    native pipeline (minhash_dedup_pairs). Kept for API parity with
    SURVEY §2.2; the native pipeline is preferred (no Vector conversion,
    map-side-combinable signatures, exact string-set verify instead of
    hashed-feature Jaccard).

    Exact-first: byte-identical texts collapse to their smallest id
    before the ML join — identical documents never need MinHash, and
    approxSimilarityJoin has NO bucket cap, so a dup-heavy corpus
    otherwise explodes its internal self-join (driver OOM at sf1 with
    90% duplicates). Identical groups emit star pairs at jaccard 1.0;
    components are preserved. Degenerate rows (NULL text, or fewer
    tokens than shingle_n) are excluded up front — exactly the rows
    the shingle filter always dropped — so they are never reported as
    jaccard-1.0 duplicates of each other."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    # Lazy checkpoint (round-8 continuation, the shared-group barrier
    # of minhash_dedup_pairs / fingerprint_near_pairs): the grouped
    # frame feeds exact_stars AND the ML feature pipeline, and the
    # feature frame itself is referenced THREE times downstream
    # (model.fit + both sides of approxSimilarityJoin) — un-barriered,
    # the full-text groupBy and the HashingTF/shingle chain re-run once
    # per reference.
    g = _exact_first_groups(
        df,
        id_col,
        text_col,
        eligible=F.size(F.split(F.col(text_col), " ")) >= F.lit(shingle_n),
    ).localCheckpoint(eager=False)
    exact_stars = (
        g.filter(F.size("ids") >= 2)
        .select(F.explode(star_pairs_expr()).alias("p"))
        .select("p.id_a", "p.id_b", F.lit(1.0).alias("jaccard"))
    )
    reps = g.select(F.element_at("ids", 1).alias(id_col), F.col(text_col))

    toks = F.split(F.col(text_col), " ")
    # Expression-level degenerate guard, NOT just the row filters above:
    # approxSimilarityJoin's posexplode infers an isnotnull(hashes)
    # constraint that filter-pushdown rewrites as isnotnull(UDF(UDF(
    # shingles_expr))) and sinks BELOW the eligibility filter (shingles
    # depend only on the grouping key, so the substitution is legal) —
    # the ML UDFs then speculatively evaluate on NULL/short texts and
    # crash (HashingTF NPE on NULL, MinHash "at least 1 non zero entry"
    # on an empty shingle set). Guarded rows still never pass the real
    # filters, so results are unchanged; the placeholder only makes the
    # speculative evaluation total.
    guarded = F.when(
        F.col(text_col).isNotNull()
        & (F.size(toks) >= F.lit(shingle_n)),
        F.array_distinct(word_shingles(toks, shingle_n)),
    ).otherwise(F.array(F.lit("")))
    sh = reps.select(
        F.col(id_col),
        guarded.alias("shingles"),
    ).filter(F.size("shingles") > 0)
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=1 << 18)
    # feats is consumed by model.fit (its own action) and BOTH sides of
    # the self-join: the lazy checkpoint materializes the shingle +
    # HashingTF chain once at fit time and the join sides reuse it.
    feats = tf.transform(sh).localCheckpoint(eager=False)
    mh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=num_tables, seed=42
    )
    model = mh.fit(feats)
    pairs = model.approxSimilarityJoin(
        feats, feats, 1.0 - threshold, distCol="jaccard_dist"
    )
    near = (
        pairs.filter(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.round(1.0 - F.col("jaccard_dist"), 6).alias("jaccard"),
        )
    )
    from .graph import _register_round_state

    return _register_round_state(near.unionByName(exact_stars), g, feats)


# ---------------------------------------------------------------------------
# Duplicate clustering (connected components over candidate pairs)
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 25,
) -> DataFrame:
    """(node, cluster_id) for the undirected graph of dup pairs —
    cluster_id = the smallest node id in the component (deterministic).

    The last stage of a production dedup pipeline: LSH/Jaccard emit
    PAIRS, but survivor election needs CLUSTERS (a~b, b~c => keep one of
    {a,b,c}). Min-label propagation: every node repeatedly adopts the
    minimum label among itself and its neighbors; converges in
    O(graph diameter) rounds — the standard Spark shape for iterative
    graph algorithms at scale (GraphX/GraphFrames CC is the same
    dataflow).

    Round machinery (round-8 optimization — the operators/graph.py
    fixpoint shape, adopted here after an interleaved A/B on the real
    phash/minhash pair streams at factor-50 measured 1.4-2.2x:
    scripts/probe_cc_rounds_ab.py, outputs verified identical first):

    * **Self-loop edges carry each node's own label through the join**,
      so one round is ONE edge⋈label join + a map-side-combinable MIN —
      the previous form paid a second (labels LEFT JOIN neighbor_min)
      pass per round to re-attach unreached nodes (guide §2.4: two
      operations keyed the same way should share one pass).
    * **Convergence by the monotone decimal label-sum certificate**:
      labels only ever DECREASE (MIN over self + neighbors), so the
      exact decimal(38,0) sum of labels is constant across a round iff
      the round changed nothing. One scalar aggregate on the lazily
      checkpointed round output — which doubles as the checkpoint's
      materializing action — replaces the old labels⋈labels
      changed-count join (a second full action per round).
    * Superseded label checkpoints are released in-loop (the sf50
      session-residency finding); the edge relation stays pinned for
      the whole run and is registered for release with the result.

    The edge relation is materialized ONCE (lazy DISK_ONLY
    localCheckpoint, first action materializes) — without it every
    round re-runs the distinct-union over the raw pairs — and is
    hash-repartitioned on ``src`` first so the preserved LogicalRDD
    partitioning satisfies each round's join requirement: only the
    (node-sized) label side shuffles per iteration. The label side is
    hinted SHUFFLE_HASH so the stats-less edge side is neither
    broadcast (OOM risk) nor sorted (merge join would re-sort the big
    side every round).
    """
    # Both directions AND the self-loop rows come out of ONE reference
    # to ``pairs`` via a single array+explode projection. This matters
    # because ``pairs`` is usually an EXPENSIVE un-materialized pipeline
    # (LSH candidate generation, phash near-pairs): Spark has no
    # common-subexpression reuse across union branches, so the previous
    # union(fwd, rev) form computed that pipeline TWICE, and deriving
    # self-loops as union(base, base.distinct()) would compute it FOUR
    # times (measured: 2x slower end-to-end at sf0.1 despite cheaper
    # rounds — the first probe draft did exactly that). One explode =
    # upstream runs exactly once; the duplicate self-loop copies (one
    # per incident edge) collapse in the dropDuplicates below.
    # Self-loop edges carry each node's own label through the per-round
    # join, so no second join is needed to keep unreached/isolated
    # labels (the linear-plan trick of graph.py::min_label_propagation).
    a, b = F.col(id_a), F.col(id_b)
    edge_structs = F.array(
        F.struct(a.alias("src"), b.alias("dst")),
        F.struct(b.alias("src"), a.alias("dst")),
        F.struct(a.alias("src"), a.alias("dst")),
        F.struct(b.alias("src"), b.alias("dst")),
    )
    n_shuffle = shuffle_partitions(pairs.sparkSession)
    edges = (
        pairs.select(F.explode(edge_structs).alias("e"))
        .select("e.src", "e.dst")
        # repartition FIRST, then dedup: HashPartitioning(src) satisfies
        # the (src, dst) aggregate's clustered-distribution requirement,
        # so the big edge relation is exchanged once, not twice, and the
        # aggregate's output keeps the src partitioning the checkpoint pins.
        .repartition(n_shuffle, "src")
        .dropDuplicates()
        # DISK_ONLY: same rationale as operators/graph.py — the edge
        # relation is the big, round-invariant side; keep heap free for
        # the per-round join/agg state.
        .localCheckpoint(eager=False, storageLevel=_StorageLevel.DISK_ONLY)
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )

    def _lbl_sum(df: DataFrame):
        return df.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s")
        ).collect()[0]["s"]

    from .graph import _unpersist_ckpt

    prev_sum = _lbl_sum(labels)  # materializes the edge checkpoint too
    label_ckpt: DataFrame | None = None
    for _ in range(max_iters):
        labels = (
            edges.join(
                labels.hint("shuffle_hash"), edges.src == labels.node
            )
            .select(F.col("dst").alias("node"), "label")
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        new_ckpt = labels.localCheckpoint(eager=False)
        s = _lbl_sum(new_ckpt)  # the materializing action
        if label_ckpt is not None:
            _unpersist_ckpt(label_ckpt)  # release superseded round
        label_ckpt = new_ckpt
        labels = new_ckpt
        if s == prev_sum:
            break  # sum unchanged == no label moved == fixpoint
        prev_sum = s
    from .graph import _register_round_state

    # Chain the INPUT's round state too (e.g. fingerprint_near_pairs'
    # shared group checkpoint): the edge checkpoint subsumes the pair
    # pipeline's DATA, but not its persisted blocks — without chaining,
    # a finalize/release on the CC result would leave them resident
    # until the ContextCleaner notices (double release is a no-op, so
    # callers that also chain pairs' state stay correct).
    return _register_round_state(
        labels.select(F.col("node"), F.col("label").alias("cluster_id")),
        edges,
        labels,
        *getattr(pairs, "_round_state", ()),
    )


def cluster_survivors(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Per-row cluster assignment + survivor flag: rows absent from any
    pair form singleton clusters; the survivor of each cluster is its
    minimum id (== the cluster_id by construction).

    The returned frame re-registers connected_components' round state
    (derived DataFrames don't inherit Python-side attributes), so a
    caller with a BOUNDED result can release the DISK_ONLY checkpoint
    blocks via operators/graph.py::release_round_state /
    finalize_round_result after consuming it."""
    from .graph import _register_round_state

    cc = connected_components(pairs, id_a, id_b)
    out = (
        df.join(cc, df[id_col] == cc.node, "left")
        .select(
            df[id_col],
            F.coalesce("cluster_id", df[id_col]).alias("cluster_id"),
        )
        .withColumn("is_survivor", F.col(id_col) == F.col("cluster_id"))
    )
    # chain the INPUT frame's round state too: minhash_dedup_pairs
    # registers its shared groupBy checkpoint on the pair frame it
    # returns, and re-registration below would otherwise drop it
    # (review finding)
    return _register_round_state(
        out,
        *getattr(cc, "_round_state", ()),
        *getattr(pairs, "_round_state", ()),
    )


# ---------------------------------------------------------------------------
# Sub-document dedup: exact substring spans + C4-style unit dedup
# ---------------------------------------------------------------------------


def substring_dup_spans(
    df: DataFrame, id_col: str, text_col: str, k: int = 8
) -> DataFrame:
    """Exact duplicated-substring coverage per document (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499) at token ``k``-gram granularity.

    The paper builds a corpus-wide suffix array to find every substring of
    >= 50 tokens that occurs twice; a suffix array is inherently a
    single-machine index. The distributed equivalent: every token
    ``k``-gram that occurs >= 2 times anywhere in the corpus marks a
    duplicated span, and the union of its ``k`` covered token positions
    per document measures how much of the document is duplicated text
    (the paper's "fraction of tokens in a duplicate substring").

    Plan shape (all JVM, no Python), built for the duplicate-heavy
    corpora this operator exists for:

    * **Exact-first star collapse** (same trick as minhash_dedup_pairs):
      grams are generated once per DISTINCT text carrying its replica
      count, never per document — at the sf5 audit regime (250k docs,
      2% distinct) that is 50x less gram work. A gram's global
      occurrence count is the replica-weighted sum, so within-text
      repeats and cross-replica duplication count identically to the
      naive per-doc expansion.
    * groupBy(gram) weighted count (map-side partial absorbs hot grams,
      unlike a window count which would single-task them) -> equi-join
      grams back to the >= 2 set (AQE skew-split applies). The
      ``sequence`` gram builder is guarded: Spark's sequence(0, n)
      DESCENDS for n < 0.
    * **Interval union via sorted gaps**, not a covered-position
      explode: per text, covered = sum(min(k, pos - prev_pos)) over
      pos-sorted duplicated grams (first gram contributes k). Exact,
      and it replaces a x``k`` row blowup + two-countDistinct Expand
      with one narrow window over text-grain partitions.
    * Per-text stats fan back to documents with one equi-join on the
      text (inner: dup coverage is a content property, identical for
      every replica). Production note: the gram and text join keys can
      be narrowed to ``xxhash64`` digests for shuffle width; kept raw
      here so the DuckDB oracle computes the identical set.

    Deliberate tradeoff: the gram subtree is evaluated twice (dup-set
    build + probe). Exchange reuse cannot dedupe it — column pruning
    specializes each branch's shuffle (verified: the probe carries
    (text, n_tok, pos), the build only (gram, rep), so the exchanges
    never canonicalize equal) — and persisting the gram set would
    materialize ~``k``x the corpus bytes to executor storage, a loss at
    scale against re-running a streaming split+explode over the much
    smaller distinct-text relation. Measured with the recompute: 250k
    docs 3.5 s, 1M docs 5.4 s (BASELINE.md).

    Returns one row per document that contains at least one duplicated
    gram: (id, n_tok, dup_grams, covered_tokens).
    """
    docs = df.filter(F.col(text_col).isNotNull()).select(id_col, text_col)
    dist = (
        docs.groupBy(text_col)
        .agg(F.count("*").alias("__rep"))
        .withColumn("__toks", F.split(F.col(text_col), " "))
        .withColumn("__n_tok", F.size("__toks"))
        .filter(F.col("__n_tok") >= k)
    )
    grams = dist.select(
        text_col,
        "__rep",
        F.col("__n_tok").cast("long").alias("n_tok"),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, __n_tok - {k}),"
                f" i -> array_join(slice(__toks, i + 1, {k}), ' '))"
            )
        ).alias("__pos", "__gram"),
    ).withColumn("pos", F.col("__pos").cast("long"))
    dup_set = (
        grams.groupBy("__gram")
        .agg(F.sum("__rep").alias("__c"))
        .filter(F.col("__c") >= 2)
        .select("__gram")
    )
    w = Window.partitionBy(text_col).orderBy("pos")
    gap = F.coalesce(
        F.least(F.lit(k).cast("long"), F.col("pos") - F.lag("pos").over(w)),
        F.lit(k).cast("long"),
    )
    per_text = (
        grams.join(dup_set, "__gram")
        .select(text_col, "n_tok", "pos")
        .withColumn("__gap", gap)
        .groupBy(text_col)
        .agg(
            F.max("n_tok").alias("n_tok"),
            F.count("pos").alias("dup_grams"),
            F.sum("__gap").alias("covered_tokens"),
        )
    )
    return docs.join(per_text, text_col).select(
        id_col, "n_tok", "dup_grams", "covered_tokens"
    )


def _token_chunks(
    df: DataFrame, id_col: str, text_col: str, chunk_tokens: int
) -> DataFrame:
    """Explode each document into fixed-width non-overlapping token
    chunks: ``(id_col, __idx, __chunk)``. The shared unitization step of
    chunk_dedup (C4 keep-first) and common_chunk_filter (CCNet-style
    boilerplate drop) — the driver corpus has no line/sentence structure,
    so fixed token windows stand in for those natural units."""
    if chunk_tokens < 1:
        # interpolated into SQL below: 0 would DIV-BY-ZERO at execution
        # (far from the caller), negative would build a DESCENDING
        # sequence and end-relative slices — garbage chunks, no error.
        raise ValueError(f"chunk_tokens must be >= 1, got {chunk_tokens}")
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), F.split(F.col(text_col), " ").alias("__toks"))
        .withColumn("__n_tok", F.size("__toks"))
        .select(
            id_col,
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, (__n_tok - 1) div {chunk_tokens}),"
                    f" j -> array_join("
                    f"slice(__toks, j * {chunk_tokens} + 1, {chunk_tokens}), ' '))"
                )
            ).alias("__idx", "__chunk"),
        )
    )


def chunk_dedup(
    df: DataFrame, id_col: str, text_col: str, chunk_tokens: int = 16
) -> DataFrame:
    """C4-style corpus-global unit dedup (Raffel et al. 2020, C4 corpus,
    arXiv:1910.10683): C4 keeps each three-sentence span's FIRST
    occurrence across the whole corpus and deletes every later one. The
    driver's documents have no sentence/line structure, so the unit here
    is a fixed ``chunk_tokens``-token chunk; first occurrence = smallest
    (doc_id, chunk_idx), matching C4's deterministic keep-one rule.

    Keep-first is computed as groupBy(chunk) -> MIN(doc_id<<20 | idx)
    (map-side-combinable; a window row_number would stream every replica
    of a hot chunk through one task — the sf5 98%-dup audit regime) and a
    join back marks survivors. The (id<<20|idx) BIGINT pack follows the
    join_asof/OHLC convention (struct min_by degrades to SortAggregate);
    it bounds documents at 2^20 chunks (= 16M tokens at the default
    width), far above any real training document.

    Returns per document: n_chunks, kept_chunks, and cleaned_text (the
    surviving chunks rejoined in order; NULL when nothing survives —
    i.e. the whole document was seen earlier in the corpus).

    The chunk subtree is evaluated twice (firsts build + marked probe)
    for the same reason documented in substring_dup_spans: pruned
    shuffles never canonicalize equal for exchange reuse, and
    materializing the full chunk set would cost corpus-scale storage
    to save a streaming re-explode. Callers should fan_out()
    single-split inputs (the registered query does).
    """
    pack = F.col(id_col).cast("long") * F.lit(1 << 20).cast("long") + F.col("__idx")
    chunks = _token_chunks(df, id_col, text_col, chunk_tokens)
    firsts = chunks.groupBy("__chunk").agg(F.min(pack).alias("__first"))
    marked = chunks.join(firsts, "__chunk").withColumn(
        "__kept", pack == F.col("__first")
    )
    kept_struct = F.when(
        F.col("__kept"), F.struct(F.col("__idx"), F.col("__chunk"))
    )
    return marked.groupBy(id_col).agg(
        F.count("*").alias("n_chunks"),
        F.sum(F.col("__kept").cast("long")).alias("kept_chunks"),
        F.when(
            F.sum(F.col("__kept").cast("long")) > 0,
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda x: x["__chunk"],
                ),
                " ",
            ),
        ).alias("cleaned_text"),
    )


def common_chunk_filter(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 8,
    min_docs: int = 3,
) -> DataFrame:
    """CCNet-style corpus-frequency boilerplate removal (Wenzek et al.
    2020, arXiv:1911.00359 §3.1 paragraph dedup; RefinedWeb, Penedo et
    al. 2023, arXiv:2306.01116, line-wise corrections): a unit that
    occurs in ``min_docs`` or more DISTINCT documents is boilerplate
    (headers, footers, cookie banners) and is deleted from EVERY
    document — unlike C4 keep-first (chunk_dedup), which preserves one
    copy. Unit = fixed ``chunk_tokens``-token chunk (shared
    _token_chunks; the corpus has no line structure).

    Plan shape: document frequency is a two-level aggregation —
    (chunk, doc) distinct partial first, then a count per chunk — so a
    chunk repeated inside one document counts once and no countDistinct
    Expand doubles the exploded stream. The frequency relation (distinct
    chunks above threshold only, one short string each) left-joins back
    onto a streaming re-explode of the corpus; survivors rebuild the
    document ordered by chunk index. No window over the corpus, no
    all-pairs anything; every shuffle key is the chunk hash or the doc
    id. Returns per document: n_chunks, dropped_chunks, cleaned_text
    (NULL when every chunk was boilerplate).
    """
    chunks = _token_chunks(df, id_col, text_col, chunk_tokens)
    common = (
        chunks.select("__chunk", id_col)
        .dropDuplicates()
        .groupBy("__chunk")
        .agg(F.count("*").alias("__df"))
        .filter(F.col("__df") >= min_docs)
        .select("__chunk", F.lit(True).alias("__common"))
    )
    marked = chunks.join(common, "__chunk", "left")
    kept_struct = F.when(
        F.col("__common").isNull(), F.struct(F.col("__idx"), F.col("__chunk"))
    )
    dropped = F.sum(F.coalesce(F.col("__common"), F.lit(False)).cast("long"))
    return marked.groupBy(id_col).agg(
        F.count("*").alias("n_chunks"),
        dropped.alias("dropped_chunks"),
        F.when(
            F.count("*") > dropped,
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda x: x["__chunk"],
                ),
                " ",
            ),
        ).alias("cleaned_text"),
    )
