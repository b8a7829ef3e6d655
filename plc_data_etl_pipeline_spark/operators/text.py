"""Text-analysis operators for LLM training-data pipelines.

Everything here is a composable JVM-side Column expression (whole-stage
codegen; zero Python in the hot path) over a string column of documents —
designed to scan 100 TB of text with no shuffle at all except where a
group-by is the point (per-language stats).

Operators (BASELINE.json north star — text analysis):
  * tokenization (whitespace + BPE-ish regex)
  * token / char counting
  * quality scoring (length, punctuation ratio, stopword ratio,
    mean token length)
  * language-ID (marker-token n-gram heuristic)
  * document fingerprinting (polynomial rolling hash)
  * TF-IDF top terms per document (corpus-wide IDF, bounded top-k)
  * PII scrubbing (email/phone/IP redaction + counts)
  * text normalization (case/whitespace/control-char canonicalization)
  * deterministic hash sampling (md5-bucketed, optionally stratified)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: letter runs, digit runs, or single punctuation —
# the shape GPT-2-style byte-pair pre-tokenization produces for ASCII text.
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

# Tiny multilingual marker lexicons for the n-gram/stopword language-ID
# heuristic. Public common function words.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "it"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "una"),
    "fr": ("le", "la", "et", "les", "des", "est", "une", "dans"),
    "zh": ("de5", "shi4", "bu4", "le5", "zai4", "ren2", "you3", "wo3"),
}

STOPWORDS = LANG_MARKERS["en"]

_MOD = 1_000_000_007

# Alphanumeric-plus-space character table for translate()-based deletes:
# a plain char-lookup that replaces the regex [A-Za-z0-9 ] in hot paths
# (~1.5x faster — no regex engine, stays in codegen; same char set).
_ALNUM_SPACE = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789 "
)


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization (single-space corpus; use bpe_tokens for
    arbitrary text)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def bpe_tokens(col: Column | str) -> Column:
    """BPE-ish regex pre-tokenization: letter runs / digit runs / single
    punctuation marks."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def bpe_token_count(col: Column | str) -> Column:
    return F.size(bpe_tokens(col))


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.translate(c, _ALNUM_SPACE, "")
    return F.length(stripped) / F.length(c)


def _isin_filter(words: tuple[str, ...]):
    """Unary lambda factory — PySpark inspects lambda arity, so closures
    must not smuggle extra (defaulted) parameters."""
    return lambda t: t.isin(*words)


def stopword_ratio(col: Column | str, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    """Fraction of tokens that are (English) stopwords."""
    toks = tokens(col)
    hits = F.size(F.filter(toks, _isin_filter(stopwords)))
    return hits / F.size(toks)


def mean_token_len(col: Column | str) -> Column:
    """Mean token length = (chars - spaces) / tokens, all in one pass."""
    c = F.col(col) if isinstance(col, str) else col
    n_spaces = F.length(c) - F.length(F.translate(c, " ", ""))
    return (F.length(c) - n_spaces) / (n_spaces + 1)


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: long-enough, low punctuation,
    some stopwords, sane mean token length. Weights are arbitrary but
    fixed; the point is the *shape* (pure column expression, fuses into
    the scan)."""
    c = F.col(col) if isinstance(col, str) else col
    len_score = F.least(F.length(c) / F.lit(400.0), F.lit(1.0))
    punct_score = 1.0 - F.least(punct_ratio(c) * 5.0, F.lit(1.0))
    stop_score = F.least(stopword_ratio(c) * 4.0, F.lit(1.0))
    tok_len = mean_token_len(c)
    tok_score = F.when((tok_len >= 3.0) & (tok_len <= 10.0), 1.0).otherwise(0.5)
    return (
        0.3 * len_score + 0.3 * punct_score + 0.2 * stop_score + 0.2 * tok_score
    )


def lang_scores(col: Column | str) -> Column:
    """Map language -> marker-hit count (the language-ID feature vector)."""
    toks = tokens(col)
    return F.map_from_arrays(
        F.array(*[F.lit(lang) for lang in sorted(LANG_MARKERS)]),
        F.array(
            *[
                F.size(F.filter(toks, _isin_filter(LANG_MARKERS[lang])))
                for lang in sorted(LANG_MARKERS)
            ]
        ),
    )


def lang_id(col: Column | str, default: str = "und") -> Column:
    """Argmax language by marker hits; 'und' (undetermined) when no marker
    fires. Deterministic tie-break: alphabetical language order."""
    toks = tokens(col)
    best_lang = F.lit(default)
    best_score = F.lit(0)
    for lang in sorted(LANG_MARKERS):
        score = F.size(F.filter(toks, _isin_filter(LANG_MARKERS[lang])))
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best_lang


def fingerprint(col: Column | str, prefix_chars: int = 64) -> Column:
    """Polynomial rolling hash (Horner, base 31, mod 1e9+7) over the code
    points of the first ``prefix_chars`` characters. Pure integer column
    arithmetic — reproducible in any engine, unlike engine-specific hash
    functions (xxhash64 vs DuckDB's hash)."""
    c = F.col(col) if isinstance(col, str) else col
    codes = F.transform(F.split(F.substring(c, 1, prefix_chars), ""), F.ascii)
    head = F.element_at(codes, 1).cast("long")
    tail = F.slice(codes, 2, F.greatest(F.size(codes) - 1, F.lit(0)))
    return F.aggregate(
        tail,
        head,
        lambda acc, x: (acc * 31 + x.cast("long")) % F.lit(_MOD),
    )


# ---------------------------------------------------------------------------
# TF-IDF
# ---------------------------------------------------------------------------


def tfidf_top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    broadcast_vocab: bool = True,
) -> DataFrame:
    """Top-k terms per document by TF-IDF over the whole corpus.

    tf = in-document term count; idf = ln((N+1)/(df+1)) (smoothed);
    score = tf * idf, floor-quantized to 6 decimals so cross-engine
    1-ulp LN differences cannot reorder the top-k (ties break on term).

    Shuffle budget: one explode→(doc,term) count, one term-level count,
    one broadcast of the single-row corpus size, one top-k window —
    every aggregation partial/map-side combinable; nothing is ever
    collected to the driver.

    The tf⋈dfreq join pins dfreq as the broadcast build side
    explicitly: left unhinted, AQE's runtime re-plan RACES on which
    input stage materializes first and (measured at a 2.5M-doc corpus,
    Spark 4.1) sometimes elected the tf side — tens of millions of rows
    hash-built on ONE driver thread with half a GB of spill, a 6x
    end-to-end regression appearing only on repeat executions in the
    same session. dfreq is vocabulary-sized (Heaps' law: ~millions of
    terms even web-scale, tens of MB serialized), the textbook
    broadcast side. Corpora whose vocabulary outgrows executor memory
    (or the 8 GB BroadcastExchange hard cap) pass
    ``broadcast_vocab=False``: dfreq then carries a SHUFFLE_HASH hint —
    still a deterministic, explicitly-pinned build side (no sort of the
    tf stream, no AQE side race), just partition-wise instead of
    broadcast.
    """
    terms = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("term"))
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    if broadcast_vocab:
        dfreq = F.broadcast(dfreq)
    else:
        dfreq = dfreq.hint("shuffle_hash")
    ndocs = df.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(ndocs))
        .withColumn(
            "tfidf",
            F.floor(
                F.col("tf")
                * F.log((F.col("n_docs") + 1) / (F.col("df") + 1))
                * 1000000.0
                + 0.5
            ).cast("double")
            / 1000000.0,
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tfidf", "rank")
    )


# ---------------------------------------------------------------------------
# PII scrubbing
# ---------------------------------------------------------------------------

# Deliberately simple RE2-compatible patterns (no lookaround) so the same
# regex runs identically on Spark (Java regex) and DuckDB (RE2).
PII_PATTERNS: dict[str, str] = {
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone": "\\+?[0-9][0-9()\\- ]{7,}[0-9]",
    "ip": "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b",
}


def pii_count(col: Column | str, kind: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(PII_PATTERNS[kind]))


def scrub_pii(col: Column | str) -> Column:
    """Redact emails, then phones, then IPs (fixed order on both
    engines) with ``<KIND>`` placeholders — the standard pre-training
    PII pass."""
    c = F.col(col) if isinstance(col, str) else col
    out = c
    for kind in ("email", "phone", "ip"):
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out


# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------


def normalize_text(col: Column | str) -> Column:
    """Canonical form for dedup/matching: lowercase, control chars and
    runs of whitespace collapsed to single spaces, trimmed."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(c, "[\\x00-\\x1f]", " ")
    collapsed = F.regexp_replace(cleaned, " +", " ")
    return F.trim(F.lower(collapsed))


# ---------------------------------------------------------------------------
# Deterministic hash sampling
# ---------------------------------------------------------------------------

_HEX = "0123456789abcdef"


def hash_bucket16(col: Column | str) -> Column:
    """Stable 16-way bucket from the first hex digit of md5(text) —
    engine-portable (md5 hex is identical everywhere), content-keyed
    (the same document always lands in the same bucket, across runs AND
    across engines — unlike rand(seed), which is engine-specific)."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.instr(F.lit(_HEX), F.substring(F.md5(c), 1, 1)) - 1).cast("int")


def hash_sample(df: DataFrame, text_col: str, keep_buckets: int) -> DataFrame:
    """Deterministic ~keep_buckets/16 sample of the corpus."""
    return df.filter(hash_bucket16(F.col(text_col)) < keep_buckets)


# ---------------------------------------------------------------------------
# Training windows: chunking + sequence packing
# ---------------------------------------------------------------------------


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split each document into fixed-size token windows with overlap —
    (id, chunk_index, chunk_text, n_tokens), the standard unit for
    training/embedding pipelines.

    Chunk starts advance by ``chunk_tokens - overlap``; the final chunk
    may be short. Pure column expressions (sequence + posexplode +
    slice): chunking 100 TB of text is a single scan, no shuffle.
    """
    stride = chunk_tokens - overlap
    toks = tokens(text_col)
    n = F.size(toks)
    last_start = (F.floor((n - 1) / stride) * stride + 1).cast("int")
    starts = F.sequence(F.lit(1), last_start, F.lit(stride))
    chunked = df.select(
        F.col(id_col), toks.alias("__toks"), F.posexplode(starts)
    ).select(
        F.col(id_col),
        F.col("pos").cast("long").alias("chunk_index"),
        F.slice(F.col("__toks"), F.col("col"), F.lit(chunk_tokens)).alias(
            "__chunk"
        ),
    )
    return chunked.select(
        F.col(id_col),
        "chunk_index",
        F.array_join("__chunk", " ").alias("chunk_text"),
        F.size("__chunk").cast("long").alias("n_tokens"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget_tokens: int = 2048,
) -> DataFrame:
    """GPT-style sequence packing: conceptually concatenate the corpus in
    ``id_col`` order and cut every ``budget_tokens`` — each document gets
    the bin its first token falls into plus a boundary-straddle flag.

    A global cumulative sum WITHOUT a global window (which would funnel
    100 TB through one partition): range-partition on the order key,
    cumsum within each partition, then add each partition's prefix —
    computed with a window over the per-partition totals, which is
    num_partitions rows, not data rows. ``localCheckpoint`` pins the
    partition ids so both uses of the partitioned frame see the same
    layout. Exact integer arithmetic throughout.
    """
    from pyspark.sql.window import Window

    spark = df.sparkSession
    n_tok = token_count(text_col).cast("long")
    base = df.select(F.col(id_col), n_tok.alias("n_tokens"))
    parts = max(2, spark.sparkContext.defaultParallelism // 2)
    ranged = (
        base.repartitionByRange(parts, F.col(id_col))
        .sortWithinPartitions(id_col)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    totals = ranged.groupBy("__pid").agg(F.sum("n_tokens").alias("__t"))
    # window over num_partitions rows — tiny by construction
    w_prefix = (
        Window.orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefixes = totals.select(
        "__pid", (F.sum("__t").over(w_prefix) - F.col("__t")).alias("__prefix")
    )
    w_part = (
        Window.partitionBy("__pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_cum = (
        ranged.join(F.broadcast(prefixes), "__pid")
        .withColumn(
            "start_offset",
            F.sum("n_tokens").over(w_part) - F.col("n_tokens") + F.col("__prefix"),
        )
    )
    return with_cum.select(
        id_col,
        "n_tokens",
        "start_offset",
        F.floor(F.col("start_offset") / budget_tokens).alias("bin"),
        (
            (F.col("start_offset") % budget_tokens) + F.col("n_tokens")
            > budget_tokens
        ).alias("straddles_boundary"),
    )


# ---------------------------------------------------------------------------
# Repetition filters (Gopher-style quality signals)
# ---------------------------------------------------------------------------


def repetition_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_top_word_frac: float = 0.2,
    max_dup_2gram_frac: float = 0.3,
) -> DataFrame:
    """Per-document repetition signals à la Gopher/MassiveText filtering
    (Rae et al. 2021 §A1.1): fraction of the doc that is its single most
    frequent word, fraction of duplicated words, fraction of duplicated
    2-grams — plus the keep/drop verdict at the given thresholds.

    Scale shape: the 2-gram dup fraction is a per-row higher-order
    expression (no shuffle); word frequencies go through explode +
    two-level hash aggregation (both partial-aggregated map-side), never
    a per-doc quadratic scan — a doc with 10^6 distinct words costs
    O(n log n) in the shuffle, not O(n^2) in a HOF loop. Single corpus
    scan end to end.
    """
    from .dedup import word_shingles

    words = F.split(F.col(text_col), " ")
    g2 = word_shingles(words, 2)
    dup2 = F.round(1 - F.size(F.array_distinct(g2)) / F.size(g2), 6)
    # Materialize dup2 (and the split) in a projection BELOW the
    # explode: selecting them alongside explode() puts them in the
    # Project ABOVE Generate, re-evaluating the whole
    # split+shingle+array_distinct chain once per exploded WORD —
    # quadratic per document (round-8 full-registry sweep: 12 s at
    # sf0.1, the slowest registered query; 1.3 s after hoisting).
    pre = df.filter(F.size(words) >= 2).select(
        F.col(id_col),
        dup2.alias("dup_2gram_frac"),
        words.alias("__ws"),
    )
    exploded = pre.select(
        id_col, "dup_2gram_frac", F.explode("__ws").alias("__w")
    )
    per_word = exploded.groupBy(id_col, "__w").agg(
        F.count("*").alias("__c"), F.first("dup_2gram_frac").alias("dup_2gram_frac")
    )
    stats = per_word.groupBy(id_col).agg(
        F.sum("__c").alias("n_words"),
        F.max("__c").alias("__top_c"),
        F.count("*").alias("__n_distinct"),
        F.first("dup_2gram_frac").alias("dup_2gram_frac"),
    )
    top_frac = F.round(F.col("__top_c") / F.col("n_words"), 6)
    dup_word = F.round(1 - F.col("__n_distinct") / F.col("n_words"), 6)
    return stats.select(
        F.col(id_col),
        F.col("n_words"),
        top_frac.alias("top_word_frac"),
        dup_word.alias("dup_word_frac"),
        F.col("dup_2gram_frac"),
        (
            (top_frac <= max_top_word_frac)
            & (F.col("dup_2gram_frac") <= max_dup_2gram_frac)
        ).alias("keep"),
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------


def decontaminate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    eval_flag: Column,
    shingle_n: int = 5,
) -> DataFrame:
    """Flag training documents sharing >= 1 distinct ``shingle_n``-gram
    with an eval/benchmark split — the standard n-gram decontamination
    pass (GPT-3 appendix C / PaLM-style) run before training.

    Returns (id, n_shared_grams) for contaminated TRAINING docs only.

    Scale shape: eval suites are tiny next to a 100 TB corpus, so the
    distinct eval-gram set is broadcast and the whole pass is one corpus
    scan + broadcast hash join — no all-pairs, no big shuffle. The
    per-doc distinct-gram count is the only aggregation (partial,
    keyed by doc).
    """
    from .dedup import word_shingles

    words = F.split(F.col(text_col), " ")
    grams = F.array_distinct(word_shingles(words, shingle_n))
    g = df.filter(F.size(words) >= shingle_n).select(
        F.col(id_col),
        eval_flag.alias("__is_eval"),
        F.explode(grams).alias("gram"),
    )
    eval_grams = g.filter(F.col("__is_eval")).select("gram").distinct()
    return (
        g.filter(~F.col("__is_eval"))
        .join(F.broadcast(eval_grams), "gram")
        .groupBy(id_col)
        .agg(F.count_distinct("gram").alias("n_shared_grams"))
    )


# ---------------------------------------------------------------------------
# Data-mixture resampling
# ---------------------------------------------------------------------------


def mixture_resample(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: dict[str, float],
    domain_col: str = "lang",
    default_weight: float = 1.0,
) -> DataFrame:
    """Domain-mixture resampling: emit ``floor(w)`` copies of every doc in
    a domain with weight ``w``, plus one more for the deterministic
    ``frac(w)`` hash-fraction of docs — the standard way training
    mixtures up/down-weight domains (epochs per source) while staying
    reproducible (content-keyed md5 buckets, not rand()).

    Weights are quantized to 16ths (the bucket granularity). Output has
    one row per (doc, copy_no).

    Scale shape: a single narrow pass — per-row CASE + bucket + an
    explode whose fan-out is the (small, bounded) copy count. No
    shuffle, no join; Catalyst pushes the n_copies>0 filter into the
    scan stage.
    """
    w_int: Column | None = None
    w_frac: Column | None = None
    dom = F.col(domain_col)
    int_expr = F.lit(int(default_weight))
    frac_expr = F.lit(int(round((default_weight % 1) * 16)))
    for domain, w in weights.items():
        int_expr = F.when(dom == domain, int(w)).otherwise(int_expr)
        frac_expr = F.when(dom == domain, int(round((w % 1) * 16))).otherwise(
            frac_expr
        )
    # NULL content: the fractional coin flip needs a content hash, so a
    # NULL text gets no fractional copy — but keeps its integer-epoch
    # copies (a bare NULL comparison would null out n_copies and drop
    # the row entirely; adversarial NULL fixture).
    frac_hit = F.coalesce(
        (hash_bucket16(F.col(text_col)) < frac_expr).cast("int"), F.lit(0)
    )
    n_copies = (int_expr + frac_hit).alias("n_copies")
    return (
        df.select(F.col(id_col), dom.alias(domain_col), n_copies)
        .filter(F.col("n_copies") > 0)
        .select(
            id_col,
            domain_col,
            F.explode(F.sequence(F.lit(1), F.col("n_copies"))).alias("__copy"),
        )
        .select(id_col, domain_col, F.col("__copy").cast("long").alias("copy_no"))
    )


def _sennrich_driver_fold(
    word_freqs: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Exact in-memory Sennrich BPE over a (word, freq) table, with the
    same semantics as the distributed loop: pair counts weight every
    adjacent position (overlaps included), argmax breaks ties on the
    lexicographically smallest (a, b) (Python str ordering == Spark's
    UTF8 binary ordering — UTF-8 preserves codepoint order), merges
    apply left-to-right non-overlapping, '</w>' terminates each word.

    Incremental bookkeeping (pair->count plus pair->containing-words
    index, only affected words rescanned per round) keeps n_merges=32k
    tractable — the classic implementation from Sennrich et al. 2016's
    reference code (public, learn_bpe.py), reimplemented here. The
    per-round argmax is a lazy-deletion heap keyed (-count, pair) —
    O(log V) amortized instead of a full O(V) dict scan per round,
    which at a web-scale pair vocabulary times 32k rounds would eat
    the single-job win this path exists for. Stale heap entries (the
    pair's count changed since push) are popped and re-pushed with the
    current count; the tuple order reproduces the scan's tie-break
    exactly (max count, then lexicographically smallest pair).
    """
    import heapq
    from collections import defaultdict

    words: list[tuple[list[str], int]] = [
        ([*w, "</w>"], f) for w, f in word_freqs
    ]
    counts: dict[tuple[str, str], int] = defaultdict(int)
    index: dict[tuple[str, str], set[int]] = defaultdict(set)
    for wi, (syms, f) in enumerate(words):
        for j in range(len(syms) - 1):
            p = (syms[j], syms[j + 1])
            counts[p] += f
            index[p].add(wi)
    heap: list[tuple[int, tuple[str, str]]] = [
        (-n, p) for p, n in counts.items() if n > 0
    ]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        negn, best = heap[0]
        cur = counts.get(best, 0)
        if cur <= 0:
            heapq.heappop(heap)  # dead pair: discard
            continue
        if cur != -negn:
            heapq.heappop(heap)  # stale count: correct and re-queue
            heapq.heappush(heap, (-cur, best))
            continue
        heapq.heappop(heap)
        merges.append(best)
        a, b = best
        ab = a + b
        touched: set[tuple[str, str]] = set()
        # Index entries can be stale (word no longer contains the pair);
        # the subtract-then-re-add per affected word is net-zero then.
        for wi in index.pop(best, set()):
            syms, f = words[wi]
            for j in range(len(syms) - 1):
                q = (syms[j], syms[j + 1])
                counts[q] -= f
                touched.add(q)
            res: list[str] = []
            j, n = 0, len(syms)
            while j < n:
                if j + 1 < n and syms[j] == a and syms[j + 1] == b:
                    res.append(ab)
                    j += 2
                else:
                    res.append(syms[j])
                    j += 1
            words[wi] = (res, f)
            for j in range(len(res) - 1):
                q = (res[j], res[j + 1])
                counts[q] += f
                index[q].add(wi)
                touched.add(q)
        counts.pop(best, None)
        for q in touched:
            n_q = counts.get(q, 0)
            if n_q > 0 and q != best:
                heapq.heappush(heap, (-n_q, q))
    return merges


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    checkpoint_every: int = 4,
    max_driver_words: int = 2_000_000,
) -> list[tuple[str, str]]:
    """Byte-pair-encoding merge-rule induction over a document corpus —
    the tokenizer-training primitive, distributed the way BPE actually
    trains: on the WORD-FREQUENCY table, never the raw corpus.

    One scan builds (word, freq) — that is the only pass that touches
    the corpus, so it is the only part that must scale to 100 TB. The
    merge loop itself runs on the word-frequency table, which is
    vocabulary-sized (Heaps' law: tens of millions of distinct words
    even for web-scale corpora), so when it fits under
    ``max_driver_words`` the loop folds on the DRIVER with incremental
    pair bookkeeping — total Spark jobs: ONE, instead of one
    count-job + one chained-UDF plan node per merge round. At 32k
    merges that is the difference between 1 and 32k scheduled jobs.

    Corpora whose vocabulary exceeds the cap fall back to the fully
    distributed loop: each round (a) counts adjacent symbol pairs
    weighted by freq — a JVM transform+explode with map-side partial
    aggregation, shuffling at most the distinct pair vocabulary — and
    (b) rewrites the symbol arrays through an Arrow-batched pandas UDF
    (the merge is an inherently sequential scan per word; per-word
    arrays are tiny). Only the argmax pair (two strings) crosses to
    the driver per round; lineage is truncated every
    ``checkpoint_every`` rounds (the iterative-algorithm pattern
    shared with operators/graph.py::pagerank).

    Both paths are exact and identical: ties on pair count break
    lexicographically (pytest-locked on the Sennrich textbook corpus).
    Returns the ordered merge list [(left, right), ...] — applying
    them in order to a new word reproduces the learned tokenization.
    End-of-word is marked with the conventional '</w>' sentinel so
    merges can't cross word boundaries.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    words = (
        docs.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), r"\s+")
            ).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("freq"))
    )
    # Driver-fold fast path: one bounded collect decides eligibility —
    # limit(cap+1) means an oversized vocabulary ships at most cap+1
    # rows before falling back, never the full table.
    head = words.limit(max_driver_words + 1).collect()
    if len(head) <= max_driver_words:
        return _sennrich_driver_fold(
            [(r["w"], r["freq"]) for r in head], n_merges
        )

    syms = words.select(
        F.concat(
            F.split(F.col("w"), ""),  # per-character symbols
            F.array(F.lit("</w>")),
        ).alias("syms"),
        "freq",
    ).localCheckpoint(eager=False)

    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        pairs = (
            syms.select(
                F.explode(
                    F.expr(
                        "CASE WHEN size(syms) >= 2 THEN transform("
                        "sequence(1, size(syms) - 1), "
                        "i -> struct(syms[i-1] AS a, syms[i] AS b)) "
                        "ELSE array() END"
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.desc("n"), "a", "b")
            .limit(1)
            .collect()
        )
        if not pairs:
            break
        a, b = pairs[0]["a"], pairs[0]["b"]
        merges.append((a, b))

        def make_merge_udf(a: str, b: str):
            # Factory binds (a, b) per round: the UDF body serializes
            # when the PLAN executes (next round's collect), so closing
            # over the loop variables directly would late-bind to a
            # later round's pair.
            @pandas_udf("array<string>")
            def merge_pair(col):
                out = []
                for seq in col:
                    res, j = [], 0
                    n = len(seq)
                    while j < n:
                        if j + 1 < n and seq[j] == a and seq[j + 1] == b:
                            res.append(a + b)
                            j += 2
                        else:
                            res.append(seq[j])
                            j += 1
                    out.append(res)
                return pd.Series(out)

            return merge_pair

        syms = syms.select(
            make_merge_udf(a, b)("syms").alias("syms"), "freq"
        )
        if (i + 1) % checkpoint_every == 0:
            syms = syms.localCheckpoint(eager=False)
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Apply a learned BPE merge list (``bpe_train`` output) to encode
    each document — the SERVE side of the tokenizer loop. The merge
    table is driver-held and bounded (it IS the vocabulary artifact);
    encoding runs as one Arrow-batched pandas UDF applying the classic
    greedy merge loop per word. Adds ``n_bpe_tokens`` (token count
    after merging, '</w>' markers folded into their words) beside the
    input columns. NULL text encodes to NULL.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_word(word: str) -> int:
        syms = list(word) + ["</w>"]
        while len(syms) >= 2:
            best, best_rank = None, None
            for j in range(len(syms) - 1):
                r = ranks.get((syms[j], syms[j + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = j, r
            if best is None:
                break
            syms[best : best + 2] = [syms[best] + syms[best + 1]]
        return len(syms)

    @pandas_udf("long")
    def count_tokens(text):
        out = []
        for t in text:
            if t is None:
                out.append(None)
                continue
            total = 0
            for w in t.lower().split():
                total += encode_word(w)
            out.append(total)
        return pd.Series(out, dtype="Int64")

    return docs.withColumn("n_bpe_tokens", count_tokens(F.col(text_col)))


# --- HTML -> text extraction (web-corpus ingestion stage) ------------------

# Single-pass entity decode order: named/numeric entities first, &amp;
# LAST — decoding &amp; first would turn '&amp;lt;' into '<' (the classic
# double-decode bug). Shared by the engine chain and the oracle twin.
HTML_ENTITIES = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
)


def synthesize_html(documents: DataFrame) -> DataFrame:
    """Wrap each fixture document in a deterministic HTML page — the
    stand-in for crawled web pages (same honesty contract as
    ``multimodal.synthesize_media``): a title derived from doc_id, a
    <style> and a <script> block whose contents must NOT leak into the
    extraction, boilerplate <nav>, the document text in a <p>, and an
    entity-bearing trailer exercising the decode table."""
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit(
            "</title><style>p{color:red}</style>"
            '<script>var t = "evil&tracker";</script></head>'
            "<body><nav>Home &amp; About</nav><p>"
        ),
        F.col("text"),
        F.lit(
            "</p><p>Tom &amp; Jerry &lt;3 &quot;quoted&quot;&nbsp;text</p>"
            "</body></html>"
        ),
    )
    return documents.select("doc_id", F.col("text").alias("source_text"),
                            html.alias("html"))


def html_extract(html: Column) -> Column:
    """Boilerplate-stripping HTML->text extraction (the trafilatura-
    shaped ingestion stage, reduced to its deterministic core): drop
    <script>/<style> subtrees wholesale, strip remaining tags, decode
    entities, collapse whitespace. Pure JVM regexp/replace chain — one
    codegen'd projection, no UDF, and every regex is in the common
    Java-regex/RE2 subset (lazy ``.*?`` yes, ``(?is)`` flags yes,
    backreferences no, and an explicit ``[ \\t\\n\\r]`` class because
    Java's \\s and RE2's \\s disagree on vertical tab). The subtree
    drops are ``(?is)`` — case-insensitive and DOTALL — because real
    pages write ``<SCRIPT>`` and multi-line bodies, and without DOTALL
    the lazy match stops at a newline, the generic tag strip then eats
    only the tags, and the raw JS/CSS body leaks into training text."""
    s = F.regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    s = F.regexp_replace(s, "(?is)<style[^>]*>.*?</style>", " ")
    s = F.regexp_replace(s, "<[^>]*>", " ")
    for ent, ch in HTML_ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(s, "[ \\t\\n\\r]+", " "))


def sql_html_extract(expr: str) -> str:
    """DuckDB twin of :func:`html_extract` — identical op sequence."""
    s = f"regexp_replace({expr}, '(?is)<script[^>]*>.*?</script>', ' ', 'g')"
    s = f"regexp_replace({s}, '(?is)<style[^>]*>.*?</style>', ' ', 'g')"
    s = f"regexp_replace({s}, '<[^>]*>', ' ', 'g')"
    for ent, ch in HTML_ENTITIES:
        lit = ch.replace("'", "''")
        s = f"replace({s}, '{ent}', '{lit}')"
    return f"trim(regexp_replace({s}, '[ \\t\\n\\r]+', ' ', 'g'))"


def sql_synthesize_html(doc_id: str = "doc_id", text: str = "text") -> str:
    """DuckDB twin of :func:`synthesize_html`'s page literal — ONE
    definition shared by every oracle that wraps fixture documents in
    the synthetic page (text_html_extract, pipeline_web_ingest), so the
    two queries can never silently test different pages."""
    return (
        f"'<html><head><title>Doc ' || CAST({doc_id} AS VARCHAR)"
        " || '</title><style>p{color:red}</style>'"
        " || '<script>var t = \"evil&tracker\";</script></head>'"
        " || '<body><nav>Home &amp; About</nav><p>'"
        f" || {text}"
        " || '</p><p>Tom &amp; Jerry &lt;3 &quot;quoted&quot;"
        "&nbsp;text</p></body></html>'"
    )


def html_main_content(html: Column) -> Column:
    """MAIN-CONTENT extraction — the readability/trafilatura core step
    (Barbaresi 2021, ACL demo; Mozilla readability), reduced to its
    deterministic kernel: after dropping <script>/<style> subtrees,
    take the FIRST content ``<p>`` block — page chrome (head/title,
    nav, footer, trailing link paragraphs) lives outside it on template
    pages — then strip tags, decode entities, collapse whitespace.
    NULL when the page has no non-empty <p> block.

    Downstream quality/dedup gates must run on THIS region, not the
    full page text: chrome dilutes entropy/length signals (short
    gibberish hides behind healthy boilerplate) and unique-per-page
    chrome (the title carries the page id) makes every full-page body
    distinct, which silently turns dedup survivor election vacuous."""
    s = F.regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    s = F.regexp_replace(s, "(?is)<style[^>]*>.*?</style>", " ")
    p = F.regexp_extract(s, "(?is)<p[^>]*>(.*?)</p>", 1)
    p = F.regexp_replace(p, "<[^>]*>", " ")
    for ent, ch in HTML_ENTITIES:
        p = F.replace(p, F.lit(ent), F.lit(ch))
    p = F.trim(F.regexp_replace(p, "[ \\t\\n\\r]+", " "))
    return F.nullif(p, F.lit(""))


def sql_html_main_content(expr: str) -> str:
    """DuckDB twin of :func:`html_main_content` — identical op chain."""
    s = f"regexp_replace({expr}, '(?is)<script[^>]*>.*?</script>', ' ', 'g')"
    s = f"regexp_replace({s}, '(?is)<style[^>]*>.*?</style>', ' ', 'g')"
    s = f"regexp_extract({s}, '(?is)<p[^>]*>(.*?)</p>', 1)"
    s = f"regexp_replace({s}, '<[^>]*>', ' ', 'g')"
    for ent, ch in HTML_ENTITIES:
        lit = ch.replace("'", "''")
        s = f"replace({s}, '{ent}', '{lit}')"
    return f"nullif(trim(regexp_replace({s}, '[ \\t\\n\\r]+', ' ', 'g')), '')"
