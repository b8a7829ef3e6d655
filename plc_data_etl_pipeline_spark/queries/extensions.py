"""LLM-data-pipeline extension queries (BASELINE.json north star):
dedup, similarity search, text analysis, multimodal — over the driver's
documents/embeddings fixtures. Implementations live in ``operators/``;
these wrappers bind them to tables and declare DuckDB oracles where the
semantics are SQL-expressible (exact dedup, brute-force cosine, all the
deterministic text metrics). LSH/SimHash/minhash internals hash with
engine-specific functions -> rows-only checks plus pytest invariants
(tests/test_extensions.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import fan_out, load
from ..operators import clustering as _C
from ..operators import dedup as D
from ..operators import multimodal as M
from ..operators import similarity as S
from ..operators import text as T
from ..registry import query
from ._conv import hash_u32, quant, sql_quant


def _char_shingles(width: int = 5):
    """Distinct character ``width``-gram array of ``text`` — identical
    on both engines for EVERY length. Guard matters: Spark's
    sequence(1, 0) yields DESCENDING [1, 0] (not empty), so a
    sub-width document would grow phantom shingles that the DuckDB
    range()-based oracles never produce (caught by the adversarial
    single-word fixture). Sub-width docs get an empty set — they
    participate in dedup via the exact-first text paths instead.
    """
    return F.array_distinct(
        F.expr(
            f"CASE WHEN length(text) >= {width} THEN "
            f"transform(sequence(1, length(text) - {width - 1}),"
            f" i -> substring(text, i, {width})) ELSE array() END"
        )
    )

# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@query(
    "dedup_exact",
    oracle="""
    SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
    FROM documents d
    JOIN (SELECT text, MIN(doc_id) AS keep_id FROM documents GROUP BY text) k
      ON d.doc_id = k.keep_id
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on text: deterministic min-doc_id survivor per distinct
    content (window row_number — one shuffle; see operators/dedup.py)."""
    return D.exact_dedup(load(spark, sf_dir, "documents"), ["text"], "doc_id")


@query(
    "dedup_exact_count",
    oracle="""
    SELECT COUNT(*) AS n_docs,
           COUNT(DISTINCT text) AS n_distinct_texts,
           COUNT(*) - COUNT(DISTINCT text) AS n_exact_dups
    FROM documents
    """,
)
def dedup_exact_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication census: total vs distinct text count."""
    d = load(spark, sf_dir, "documents")
    return d.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("text").alias("n_distinct_texts"),
        (F.count("*") - F.countDistinct("text")).alias("n_exact_dups"),
    )


@query(
    "dedup_incremental",
    oracle="""
    WITH corpus AS (SELECT text FROM documents
                    WHERE doc_id < 300 AND text IS NOT NULL),
         batch  AS (SELECT * FROM documents
                    WHERE doc_id >= 200 AND text IS NOT NULL),
         sur    AS (SELECT text, MIN(doc_id) AS keep_id FROM batch GROUP BY text)
    SELECT b.doc_id, b.text, b.lang, b.source, b.n_chars
    FROM batch b
    JOIN sur k ON b.doc_id = k.keep_id
    WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.text = b.text)
    """,
)
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (delta-vs-corpus) exact dedup: today's batch
    (doc_id>=200) is deduped against the already-ingested corpus
    (doc_id<300 — the overlap simulates re-crawled content) and itself,
    without rescanning corpus bodies: the corpus side ships only 32-byte
    content digests (see operators/dedup.py:incremental_dedup).
    NULL-content rows are excluded on both sides — content dedup is
    undefined for absent content (and SQL NULL equality would silently
    keep every NULL row as 'new' forever)."""
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    return D.incremental_dedup(
        d.filter(F.col("doc_id") >= 200),
        d.filter(F.col("doc_id") < 300),
        ["text"],
        "doc_id",
    )


@query("dedup_bloom_incremental", oracle=None)  # bloom FPs — not SQL-expressible
def dedup_bloom_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-memory incremental dedup: the dedup_incremental split
    (batch doc_id>=200 vs corpus doc_id<300) gated by a distributed
    Bloom bitmap over corpus content instead of exact digests —
    ~10 bits/doc where digests cost 256, the sketch a 100B-doc corpus
    actually fits (operators/dedup.py::bloom_build /
    bloom_incremental_new). Rows-only for the driver (false positives
    are hash-determined, not SQL-expressible); the pytest asserts the
    no-false-negative guarantee and exact agreement with the digest
    anti-join at fixture scale (zero FPs at this fill factor), and the
    adversarial suite runs it over NULL/dup-heavy corpora. Like the
    digest sibling, the gate is followed by within-batch survivor
    election (min doc_id per content) — the Bloom knows yesterday's
    corpus, not today's batch."""
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    bloom = D.bloom_build(d.filter(F.col("doc_id") < 300), ["text"])
    gated = D.bloom_incremental_new(
        d.filter(F.col("doc_id") >= 200), bloom, ["text"], "doc_id"
    )
    return D.exact_dedup(gated, ["text"], "doc_id").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )


@query("dedup_minhash", oracle=None)  # xxhash64 signatures — engine-specific
def dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH fuzzy-dup pairs (shingle→sign→band→bucket-join→Jaccard
    verify). Rows-only here; pytest plants known near-dups and checks
    recall + that every reported pair's exact Jaccard >= threshold.
    No query-level fan_out: the exact-first pass shuffles through a
    groupBy anyway, and the operator itself spreads the distinct-text
    representatives before the Python signature stage on few-split
    inputs (round-4 fix: the shared group frame is also lazily
    localCheckpoint-ed so its three consumers compute it once —
    exchanges 14 -> 6 at sf0.1)."""
    d = load(spark, sf_dir, "documents")
    return D.minhash_dedup_pairs(d, "doc_id", "text", threshold=0.5)


@query("dedup_simhash", oracle=None)  # xxhash64-based fingerprint
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (63-bit fingerprint, 16-bit block LSH,
    Hamming verify). Returns a SPANNING STRUCTURE of the near-dup graph:
    identical-fingerprint groups link through their smallest id, and
    distinct fingerprints pair via block-LSH (pigeonhole over 4 blocks
    finds every Hamming<=3 REPRESENTATIVE pair; wider radii are found
    probabilistically). Connected components match the full clique
    listing — see operators/dedup.py simhash_near_pairs."""
    d = load(spark, sf_dir, "documents")
    return D.simhash_near_pairs(d, "doc_id", "text", max_bits=3)


@query(
    "dedup_ngram_jaccard",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([text[i:i+4] FOR i IN range(1, GREATEST(LENGTH(text) - 4, 0) + 1)]) AS grams
      FROM documents WHERE doc_id < 150
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.grams, b.grams))), 6) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
          / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.35
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-5-gram Jaccard similarity pairs over a bounded id range —
    the exact (oracle-checkable) counterpart of the LSH pipelines. The
    O(n²) pair space is bounded by the id filter; at scale you'd gate this
    behind LSH candidates (dedup_minhash) instead."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    sh = d.select("doc_id", _char_shingles().alias("grams"))
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("grams").alias("ga"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("grams").alias("gb"))
    inter = F.size(F.array_intersect("ga", "gb")).cast("double")
    union = F.size(F.array_union("ga", "gb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("jaccard_raw", F.try_divide(inter, union))
        .filter(F.col("jaccard_raw") >= 0.35)
        .select("id_a", "id_b", F.round("jaccard_raw", 6).alias("jaccard"))
    )


@query("dedup_embedding", oracle=None)  # LSH-bucketed candidate generation
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via hyperplane-LSH buckets +
    exact verify (cosine >= 0.9)."""
    e = load(spark, sf_dir, "embeddings")
    return S.embedding_near_dup_pairs(e, threshold=0.9)


@query(
    "dedup_embedding_exact",
    oracle="""
    WITH v AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 150),
    dots AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             list_reduce([CAST(a.embedding[i] AS DOUBLE)
                          * CAST(b.embedding[i] AS DOUBLE)
                          FOR i IN range(1, len(a.embedding) + 1)],
                         (x, y) -> x + y)
             / (SQRT(list_reduce([CAST(a.embedding[i] AS DOUBLE)
                                  * CAST(a.embedding[i] AS DOUBLE)
                                  FOR i IN range(1, len(a.embedding) + 1)],
                                 (x, y) -> x + y))
                * SQRT(list_reduce([CAST(b.embedding[i] AS DOUBLE)
                                    * CAST(b.embedding[i] AS DOUBLE)
                                    FOR i IN range(1, len(b.embedding) + 1)],
                                   (x, y) -> x + y))) AS sim
      FROM v a JOIN v b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, ROUND(sim, 6) AS cosine_sim
    FROM dots WHERE sim >= 0.30
    """,
)
def dedup_embedding_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact embedding near-dup pairs over a bounded id range — the
    oracle-checked counterpart of the LSH path (same role
    dedup_ngram_jaccard plays for dedup_minhash). Sequential-fold doubles
    (operators/similarity.dot_fold) are bit-identical to DuckDB's
    list_reduce, so the >= threshold cut and the rounded similarity agree
    exactly. The O(n²) pair space is bounded by the id filter; at scale
    the LSH bucketing (dedup_embedding) generates the candidates
    instead."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 150)
    a = e.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    sim = S.cosine(F.col("ea"), F.col("eb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("sim_raw", sim)
        .filter(F.col("sim_raw") >= 0.30)
        .select("id_a", "id_b", F.round("sim_raw", 6).alias("cosine_sim"))
    )


@query(
    "dedup_substring",
    oracle="""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n_tok
      FROM documents WHERE text IS NOT NULL
    ),
    grams AS (
      SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok, CAST(i AS BIGINT) AS pos,
             array_to_string(list_slice(toks, i + 1, i + 8), ' ') AS gram
      FROM base, UNNEST(range(0, n_tok - 7)) AS t(i)
    ),
    dup_set AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2),
    covered AS (
      SELECT g.doc_id, g.n_tok, g.pos, CAST(cp AS BIGINT) AS cp
      FROM grams g JOIN dup_set USING (gram),
           UNNEST(range(g.pos, g.pos + 8)) AS u(cp)
    )
    SELECT doc_id, MAX(n_tok) AS n_tok,
           COUNT(DISTINCT pos) AS dup_grams,
           COUNT(DISTINCT cp) AS covered_tokens
    FROM covered GROUP BY doc_id
    """,
)
def dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-substring coverage (Lee et al. 2022,
    arXiv:2107.06499) at 8-token-gram granularity: per document, how many
    gram start positions are corpus-duplicated and how many token
    positions those duplicated grams cover. The distributed stand-in for
    the paper's suffix-array pass — see operators/dedup.py
    substring_dup_spans for the plan-shape rationale."""
    return D.substring_dup_spans(
        load(spark, sf_dir, "documents"), "doc_id", "text", k=8
    )


@query(
    "dedup_chunk_c4",
    oracle="""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n_tok
      FROM documents WHERE text IS NOT NULL
    ),
    chunks AS (
      SELECT doc_id, CAST(j AS BIGINT) AS idx,
             array_to_string(list_slice(toks, j * 16 + 1, j * 16 + 16), ' ')
               AS chunk
      FROM base, UNNEST(range(0, (n_tok - 1) // 16 + 1)) AS t(j)
    ),
    firsts AS (
      SELECT chunk,
             MIN(CAST(doc_id AS BIGINT) * 1048576 + idx) AS first_pack
      FROM chunks GROUP BY chunk
    ),
    marked AS (
      SELECT c.doc_id, c.idx, c.chunk,
             (CAST(c.doc_id AS BIGINT) * 1048576 + c.idx = f.first_pack)
               AS kept
      FROM chunks c JOIN firsts f USING (chunk)
    )
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
             AS kept_chunks,
           string_agg(CASE WHEN kept THEN chunk END, ' ' ORDER BY idx)
             AS cleaned_text
    FROM marked GROUP BY doc_id
    """,
)
def dedup_chunk_c4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus-global keep-first unit dedup (Raffel et al. 2020,
    arXiv:1910.10683), adapted to 16-token chunks (the driver corpus has
    no line/sentence structure): each distinct chunk survives only at its
    first (doc_id, idx) occurrence; later replicas are deleted and the
    document is rebuilt from its surviving chunks. See
    operators/dedup.py chunk_dedup. fan_out spreads the single-split
    local fixture before the chunk explode (conditional — a no-op at
    real-scale split counts)."""
    return D.chunk_dedup(
        fan_out(load(spark, sf_dir, "documents")),
        "doc_id",
        "text",
        chunk_tokens=16,
    )


@query(
    "dedup_common_chunks",
    oracle="""
    WITH base AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n_tok
      FROM documents WHERE text IS NOT NULL
    ),
    chunks AS (
      SELECT doc_id, CAST(j AS BIGINT) AS idx,
             array_to_string(list_slice(toks, j * 8 + 1, j * 8 + 8), ' ')
               AS chunk
      FROM base, UNNEST(range(0, (n_tok - 1) // 8 + 1)) AS t(j)
    ),
    freq AS (
      SELECT chunk FROM (SELECT DISTINCT chunk, doc_id FROM chunks)
      GROUP BY chunk HAVING COUNT(*) >= 3
    )
    SELECT c.doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN f.chunk IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS dropped_chunks,
           string_agg(CASE WHEN f.chunk IS NULL THEN c.chunk END,
                      ' ' ORDER BY c.idx) AS cleaned_text
    FROM chunks c LEFT JOIN freq f USING (chunk)
    GROUP BY c.doc_id
    """,
)
def dedup_common_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style boilerplate removal (Wenzek et al. 2020,
    arXiv:1911.00359): drop EVERY occurrence of any 8-token chunk that
    appears in >= 3 distinct documents — the corpus-frequency
    complement of dedup_chunk_c4's keep-first rule (C4 keeps one copy;
    CCNet's paragraph dedup and RefinedWeb's line-wise corrections
    delete all copies of over-common units, which are boilerplate, not
    content). See operators/dedup.py common_chunk_filter for the
    two-level document-frequency plan."""
    return D.common_chunk_filter(
        fan_out(load(spark, sf_dir, "documents")),
        "doc_id",
        "text",
        chunk_tokens=8,
        min_docs=3,
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


@query(
    "sim_topk",
    oracle="""
    WITH dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_reduce([CAST(q.embedding[i] AS DOUBLE)
                          * CAST(c.embedding[i] AS DOUBLE)
                          FOR i IN range(1, len(q.embedding) + 1)],
                         (a, b) -> a + b) AS dot,
             list_reduce([CAST(q.embedding[i] AS DOUBLE)
                          * CAST(q.embedding[i] AS DOUBLE)
                          FOR i IN range(1, len(q.embedding) + 1)],
                         (a, b) -> a + b) AS qq,
             list_reduce([CAST(c.embedding[i] AS DOUBLE)
                          * CAST(c.embedding[i] AS DOUBLE)
                          FOR i IN range(1, len(c.embedding) + 1)],
                         (a, b) -> a + b) AS cc
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 20
        AND q.embedding IS NOT NULL AND c.embedding IS NOT NULL
        AND len(list_filter(q.embedding, x -> x <> 0)) > 0
        AND len(list_filter(c.embedding, x -> x <> 0)) > 0
    ), scored AS (
      SELECT query_id, neighbor_id,
             dot / (SQRT(qq) * SQRT(cc)) AS sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY dot / (SQRT(qq) * SQRT(cc)) DESC,
                                         neighbor_id) AS rank
      FROM dots
    )
    SELECT query_id, neighbor_id,
           -- floor-quant, not ROUND: the engine twins share
           -- _fold_topk_core's quant convention (round-4 advice)
           {qsim} AS cosine_sim,
           rank
    FROM scored WHERE rank <= 5
    """.format(qsim=sql_quant("sim")),
)
def sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 for 20 query vectors against the corpus.
    Sequential-fold double dot products make Spark and DuckDB
    bit-identical (operators/similarity.py). The broadcast-queries
    pattern scans the corpus exactly once."""
    e = load(spark, sf_dir, "embeddings")
    return S.cosine_topk(e, query_max_id=20, k=5)


@query(
    "sim_hard_negatives",
    oracle="""
    WITH v AS (
      SELECT vec_id, label, embedding FROM embeddings
      WHERE embedding IS NOT NULL AND label IS NOT NULL
        AND len(list_filter(embedding, x -> x <> 0)) > 0
    ),
    dots AS (
      SELECT q.vec_id AS query_id, q.label AS query_label,
             c.vec_id AS neighbor_id, c.label AS neighbor_label,
             list_reduce([CAST(q.embedding[i] AS DOUBLE)
                          * CAST(c.embedding[i] AS DOUBLE)
                          FOR i IN range(1, len(q.embedding) + 1)],
                         (a, b) -> a + b) AS dot,
             list_reduce([CAST(q.embedding[i] AS DOUBLE)
                          * CAST(q.embedding[i] AS DOUBLE)
                          FOR i IN range(1, len(q.embedding) + 1)],
                         (a, b) -> a + b) AS qq,
             list_reduce([CAST(c.embedding[i] AS DOUBLE)
                          * CAST(c.embedding[i] AS DOUBLE)
                          FOR i IN range(1, len(c.embedding) + 1)],
                         (a, b) -> a + b) AS cc
      FROM v q JOIN v c ON q.label <> c.label
        AND len(q.embedding) = len(c.embedding)
      WHERE q.vec_id < 20
    ), scored AS (
      SELECT query_id, query_label, neighbor_id, neighbor_label,
             dot / (SQRT(qq) * SQRT(cc)) AS sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY dot / (SQRT(qq) * SQRT(cc)) DESC,
                                         neighbor_id) AS rank
      FROM dots
    )
    SELECT query_id, query_label, neighbor_id, neighbor_label,
           {qsim} AS cosine_sim, rank
    FROM scored WHERE rank <= 5
    """.format(qsim=sql_quant("sim")),
)
def sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive hard-negative mining: per query vector, the 5
    most-similar corpus vectors with a DIFFERENT label (ANCE-style —
    the confusable non-matches that carry the gradient signal). Exact
    sequential-fold cosine, bit-identical both engines
    (operators/similarity.py::hard_negatives)."""
    e = load(spark, sf_dir, "embeddings")
    return S.hard_negatives(e, query_max_id=20, k=5)


@query(
    "sim_rrf_fusion",
    oracle="""
    WITH v AS (
      SELECT vec_id, embedding FROM embeddings
      WHERE embedding IS NOT NULL
        AND len(list_filter(embedding, x -> x <> 0)) > 0
    ),
    dots AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_reduce([CAST(q.embedding[i] AS DOUBLE)
                          * CAST(c.embedding[i] AS DOUBLE)
                          FOR i IN range(1, len(q.embedding) + 1)],
                         (a, b) -> a + b) AS dot,
             list_reduce([CAST(q.embedding[i] AS DOUBLE)
                          * CAST(q.embedding[i] AS DOUBLE)
                          FOR i IN range(1, len(q.embedding) + 1)],
                         (a, b) -> a + b) AS qq,
             list_reduce([CAST(c.embedding[i] AS DOUBLE)
                          * CAST(c.embedding[i] AS DOUBLE)
                          FOR i IN range(1, len(c.embedding) + 1)],
                         (a, b) -> a + b) AS cc
      FROM v q JOIN v c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 10
    ),
    dense AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY dot / (SQRT(qq) * SQRT(cc)) DESC,
                                         neighbor_id) AS dense_rank
      FROM dots
      QUALIFY dense_rank <= 20
    ),
    toks AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS t
      FROM documents WHERE text IS NOT NULL AND length(text) > 0
    ),
    lexp AS (
      SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
             CAST(len(list_intersect(q.t, c.t)) AS DOUBLE)
               / CAST(len(q.t) + len(c.t)
                      - len(list_intersect(q.t, c.t)) AS DOUBLE) AS lex_sim
      FROM toks q JOIN toks c ON q.doc_id <> c.doc_id
      WHERE q.doc_id < 10
    ),
    lex AS (
      SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY lex_sim DESC,
                                         neighbor_id) AS lex_rank
      FROM lexp
      QUALIFY lex_rank <= 20
    ),
    fused AS (
      SELECT COALESCE(d.query_id, l.query_id) AS query_id,
             COALESCE(d.neighbor_id, l.neighbor_id) AS neighbor_id,
             d.dense_rank, l.lex_rank,
             COALESCE(1.0 / (60 + d.dense_rank), 0.0)
               + COALESCE(1.0 / (60 + l.lex_rank), 0.0) AS rrf
      FROM dense d FULL OUTER JOIN lex l
        ON d.query_id = l.query_id AND d.neighbor_id = l.neighbor_id
    )
    SELECT query_id, neighbor_id, {qrrf} AS rrf_score,
           dense_rank, lex_rank, rank
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY rrf DESC, neighbor_id) AS rank
      FROM fused
    ) WHERE rank <= 5
    """.format(qrrf=sql_quant("rrf")),
)
def sim_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with Reciprocal Rank Fusion (Cormack et al.
    2009): per query id, the dense leg ranks the corpus by exact
    embedding cosine and the lexical leg by whitespace-token Jaccard;
    candidates in the union of the two top-20 lists score
    sum(1/(60+rank)) and the fused top-5 is returned
    (operators/similarity.py::rrf_hybrid_topk). Both legs broadcast
    the bounded query set and scan the corpus once — the 100 TB hybrid
    search shape. Both corpus sides fan_out: a few-split local scan
    would otherwise run each leg's whole pair join on ONE task (the
    factor-50 probe measured 33 s single-core vs 31 idle; at real scale
    the corpus has thousands of splits and fan_out is a no-op)."""
    return S.rrf_hybrid_topk(
        fan_out(load(spark, sf_dir, "documents")),
        fan_out(load(spark, sf_dir, "embeddings")),
        query_max_id=10,
        n_candidates=20,
        k=5,
    )


@query("sim_mmr_diversify", oracle=None)  # greedy/iterative re-rank
def sim_mmr_diversify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified retrieval (Carbonell & Goldstein 1998): exact
    cosine top-20 candidates per query, greedily re-ranked so each pick
    maximizes lam*relevance - (1-lam)*max-sim-to-selected — duplicate-
    heavy corpora stop flooding the result list
    (operators/similarity.py::mmr_diversify_topk). Greedy selection is
    sequential by definition -> rows-only; planted-geometry pytests in
    tests/test_extensions.py. fan_out for the same few-split reason as
    sim_rrf_fusion (the candidate fetch is the corpus-linear stage)."""
    return S.mmr_diversify_topk(
        fan_out(load(spark, sf_dir, "embeddings")), query_max_id=10,
        n_candidates=20, k=5,
    )


@query("sim_topk_lsh", oracle=None)  # approximate by construction
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH approximate top-5 (multi-probe Hamming-1). Pytest
    checks recall >= 60% vs the exact sim_topk results."""
    e = load(spark, sf_dir, "embeddings")
    return S.lsh_ann_topk(e, query_max_id=20, k=5)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@query(
    "text_wordcount",
    oracle="""
    SELECT token, COUNT(*) AS n_occurrences, COUNT(DISTINCT doc_id) AS n_docs
    FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token
    """,
)
def text_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus word count: explode + two-level count (the canonical
    map-side-combinable text aggregation)."""
    d = load(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(T.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


@query(
    "text_lang_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(n_chars AS BIGINT)) AS DOUBLE) / COUNT(n_chars) AS avg_chars,
           CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT)) AS DOUBLE)
             / COUNT(text) AS avg_tokens,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY lang
    """,
)
def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus stats (doc count, avg size in chars/tokens)."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        (
            F.sum(F.col("n_chars").cast("long")).cast("double")
            / F.count("n_chars")
        ).alias("avg_chars"),
        (
            F.sum(T.token_count("text").cast("long")).cast("double")
            / F.count("text")
        ).alias("avg_tokens"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@query(
    "text_tokens",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS bpe_tokens,
           LENGTH(text) AS n_chars_measured
    FROM documents
    """,
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace and BPE-ish regex pre-tokens
    (operators/text.py BPE_ISH_PATTERN)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        T.token_count("text").alias("ws_tokens"),
        T.bpe_token_count("text").alias("bpe_tokens"),
        F.length("text").alias("n_chars_measured"),
    )


@query(
    "text_quality",
    oracle="""
    SELECT doc_id,
           LENGTH(text) AS n_chars_measured,
           ROUND(CAST(LENGTH(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
                 / LENGTH(text), 6) AS punct_ratio,
           ROUND(CAST(len(list_filter(string_split(text, ' '),
                     t -> list_contains(['the','and','of','to','a','in','is','it'], t)))
                 AS DOUBLE) / len(string_split(text, ' ')), 6) AS stopword_ratio,
           ROUND((LENGTH(text) - (LENGTH(text) - LENGTH(replace(text, ' ', ''))))
                 / CAST((LENGTH(text) - LENGTH(replace(text, ' ', ''))) + 1 AS DOUBLE),
                 6) AS mean_token_len
    FROM documents
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring signals per document: punctuation ratio, stopword
    ratio, mean token length (operators/text.py). All single-pass column
    arithmetic that fuses into the scan."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_measured"),
        F.round(T.punct_ratio("text"), 6).alias("punct_ratio"),
        F.round(T.stopword_ratio("text"), 6).alias("stopword_ratio"),
        F.round(T.mean_token_len("text"), 6).alias("mean_token_len"),
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           list_reduce(
             [CAST(ascii(SUBSTRING(text, i, 1)) AS BIGINT)
              FOR i IN range(1, LEAST(LENGTH(text), 64) + 1)],
             (acc, x) -> (acc * 31 + x) % 1000000007) AS fp
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 64-char-prefix rolling hash (Horner base 31 mod
    1e9+7) — engine-independent content fingerprint, unlike xxhash64."""
    d = load(spark, sf_dir, "documents")
    return d.select("doc_id", T.fingerprint("text").alias("fp"))


def _langid_oracle() -> str:
    """Build the DuckDB twin of lang_id/lang_scores from the same
    LANG_MARKERS table the Spark expressions use — one source of truth.
    Everything is integer arithmetic (marker-hit counts), so the argmax
    cascade and the JSON score string are bit-exact across engines."""
    from ..operators.text import LANG_MARKERS

    langs = sorted(LANG_MARKERS)
    hits = ",\n      ".join(
        "len(list_filter(string_split(text, ' '), t -> t IN ({}))) AS {}".format(
            ", ".join(f"'{w}'" for w in LANG_MARKERS[lang]), lang
        )
        for lang in langs
    )
    best = f"greatest({', '.join(langs)})"
    # Same tie-break as lang_id: first language in alphabetical order
    # reaching the max; 'und' when no marker fires at all.
    cascade = " ".join(f"WHEN {lang} = {best} THEN '{lang}'" for lang in langs)
    scores = " || ',' || ".join(f"'\"{lang}\":' || {lang}" for lang in langs)
    return f"""
    WITH s AS (
      SELECT doc_id, lang,
      {hits}
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN {best} = 0 THEN 'und' {cascade} END AS pred_lang,
           '{{' || {scores} || '}}' AS scores
    FROM s
    """


@query("text_langid", oracle=_langid_oracle())
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language-ID (marker-token hits, operators/text.py) plus
    the per-language score map."""
    d = load(spark, sf_dir, "documents")
    # scores is serialized to JSON: declared queries must not return
    # top-level array/map/binary columns (driver canonicalizer constraint;
    # tests/test_registry.py enforces it for every registered query).
    nn = F.col("text").isNotNull()
    # NULL text -> NULL prediction (not 'und': absent input is not an
    # 'undetermined language' verdict), matching the generated SQL
    # twin's NULL propagation.
    return d.select(
        "doc_id",
        "lang",
        F.when(nn, T.lang_id("text")).alias("pred_lang"),
        F.when(nn, F.to_json(T.lang_scores("text"))).alias("scores"),
    )


# ---------------------------------------------------------------------------
# Multimodal
# ---------------------------------------------------------------------------


@query(
    "multimodal_meta",
    oracle="""
    SELECT doc_id AS media_id,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                ELSE 'wav' END AS format,
           octet_length(encode(text)) AS n_bytes,
           CASE WHEN doc_id % 3 <> 2 THEN doc_id % 640 + 1 END AS width,
           CASE WHEN doc_id % 3 <> 2 THEN doc_id % 480 + 1 END AS height,
           CASE WHEN doc_id % 3 = 2 THEN 16000 END AS sample_rate
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Opaque-binary media table synthesis: payload + typed metadata
    (operators/multimodal.py). The payload column itself is checked by
    n_bytes (octet_length of the UTF-8 encoding) — binary values don't
    cross the oracle boundary cleanly."""
    d = load(spark, sf_dir, "documents")
    return M.synthesize_media(d).select(
        "media_id", "format", "n_bytes", "width", "height", "sample_rate"
    )


def _decode_oracle(dim: int = 8) -> str:
    """DuckDB twin of the stub decoder: feature d = mean byte value of the
    payload's d-stride slice / 255, rounded to 6. The corpus is ASCII, so
    byte values equal code points and the stride slice over the UTF-8
    payload is exactly the slice over characters. Each feature is two IEEE
    divisions on exact integers — deterministic in both engines; the
    decimal tie the round could hit ((2m+1)/2e6) is not binary-
    representable, so rounding agrees too."""
    feats = ",\n           ".join(
        "CASE WHEN len(range({s}, length(text) + 1, {dim})) > 0 THEN "
        "ROUND((CAST(list_sum(list_transform(range({s}, length(text) + 1, {dim}),"
        " i -> unicode(text[i:i]))) AS DOUBLE)"
        " / len(range({s}, length(text) + 1, {dim}))) / 255.0, 6) "
        "ELSE 0.0 END AS f{d}".format(
            s=d + 1, dim=dim, d=d
        )
        for d in range(dim)
    )
    return f"""
    SELECT doc_id AS media_id,
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                ELSE 'wav' END AS format,
           octet_length(encode(text)) AS n_bytes,
           {feats}
    FROM documents
    """


@query("multimodal_decode", oracle=_decode_oracle())
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stubbed decode/feature-extraction through the real Arrow-batched
    mapInPandas plumbing (schema, batch iteration, vector output).
    Deterministic fake features (stride-mean byte moments) — exact enough
    to oracle-check dimension by dimension."""
    d = load(spark, sf_dir, "documents")
    media = M.synthesize_media(d)
    # feature stays array<double> in the operator API; the declared query
    # projects the vector to scalar columns (no top-level array columns in
    # registry output) so every dimension is value-checked by the driver.
    dec = M.decode_media(media, real=False)
    return dec.select(
        "media_id",
        "format",
        "n_bytes",
        *[F.col("feature")[i].alias(f"f{i}") for i in range(8)],
    )


@query("sim_topk_ivf", oracle=None)  # approximate by construction
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) approximate top-5: seeded sample-trained
    centroids, nearest-cell assignment, n_probe-cell search. The driver-
    side collects are bounded by design (centroid sample + the 20-vector
    query set), never the corpus. Pytest checks recall on clustered data
    vs brute force."""
    e = load(spark, sf_dir, "embeddings")
    return S.ivf_ann_topk(e, query_max_id=20, k=5, n_cells=16, n_probe=4)


@query("dedup_minhash_ml", oracle=None)  # ml hashed-feature Jaccard
def dedup_minhash_ml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pyspark.ml MinHashLSH variant of fuzzy dedup (HashingTF features,
    approxSimilarityJoin) — API-parity path beside the DataFrame-native
    dedup_minhash."""
    d = load(spark, sf_dir, "documents")
    return D.minhash_ml_pairs(d, "doc_id", "text", threshold=0.5)


@query(
    "dq_summary",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS value_null_count,
           CAST(SUM(CASE WHEN value IS NOT NULL AND value NOT BETWEEN 0.0 AND 500.0
                    THEN 1 ELSE 0 END) AS BIGINT) AS value_out_of_range_count,
           CAST(SUM(CASE WHEN event_type IS NOT NULL AND event_type NOT IN
                    ('signup','click','error','view','purchase')
                    THEN 1 ELSE 0 END) AS BIGINT) AS event_type_not_in_set_count,
           CAST(SUM(CASE WHEN props IS NOT NULL AND NOT regexp_matches(props, '^\\{.*\\}$')
                    THEN 1 ELSE 0 END) AS BIGINT) AS props_no_match_count
    FROM events
    """,
)
def dq_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate (operators/quality.py): one-pass rule summary
    over the event stream — null checks, range, domain membership, JSON
    shape. The whole rule set costs a single aggregable scan."""
    from ..operators import quality as Q

    ev = load(spark, sf_dir, "events")
    rules = [
        Q.not_null("value"),
        Q.in_range("value", 0.0, 500.0),
        Q.in_set("event_type", ("signup", "click", "error", "view", "purchase")),
        Q.matches("props", r"^\{.*\}$"),
    ]
    return Q.validate_summary(ev, rules)


@query(
    "text_tfidf",
    oracle="""
    WITH terms AS (
      SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY doc_id, term
    ), dfreq AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             CAST(FLOOR(tf.tf * LN((n.n_docs + 1) / (dfreq.df + 1))
                        * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY tfidf DESC, term) AS rank
      FROM scored
    )
    SELECT doc_id, term, tfidf, rank FROM ranked WHERE rank <= 5
    """,
)
def text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF terms per document (corpus-wide smoothed IDF,
    operators/text.py::tfidf_top_terms). Scores are floor-quantized to 6
    decimals on both engines so 1-ulp LN differences cannot reorder the
    ranking; ties break on term."""
    d = fan_out(load(spark, sf_dir, "documents"))
    return T.tfidf_top_terms(d, "doc_id", "text", k=5)


def _pii_augmented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with deterministic planted PII (the synthetic corpus is
    clean, so the scrub queries plant emails/phones/IPs per doc_id mod 3
    — the SAME expression in the oracle keeps both engines identical)."""
    d = load(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    return d.withColumn(
        "aug",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.lit(" contact user"), did, F.lit("@example.com now")),
            )
            .when(
                F.col("doc_id") % 3 == 1,
                F.concat(F.lit(" call +1 (555) 010-99"), did, F.lit(" today")),
            )
            .otherwise(
                F.concat(
                    F.lit(" from 10.0.0."), (F.col("doc_id") % 255).cast("string")
                )
            ),
        ),
    )


_PII_AUG_SQL = """
      SELECT doc_id,
             text || CASE
               WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
               WHEN doc_id % 3 = 1 THEN ' call +1 (555) 010-99' || CAST(doc_id AS VARCHAR) || ' today'
               ELSE ' from 10.0.0.' || CAST(doc_id % 255 AS VARCHAR)
             END AS aug
      FROM documents
"""


@query(
    "text_pii_scrub",
    oracle=f"""
    WITH aug AS ({_PII_AUG_SQL})
    SELECT doc_id,
           len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS n_email,
           len(regexp_extract_all(aug, '\\+?[0-9][0-9()\\- ]{{7,}}[0-9]')) AS n_phone,
           len(regexp_extract_all(aug, '\\b([0-9]{{1,3}}\\.){{3}}[0-9]{{1,3}}\\b')) AS n_ip,
           regexp_replace(regexp_replace(regexp_replace(aug,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}', '<EMAIL>', 'g'),
             '\\+?[0-9][0-9()\\- ]{{7,}}[0-9]', '<PHONE>', 'g'),
             '\\b([0-9]{{1,3}}\\.){{3}}[0-9]{{1,3}}\\b', '<IP>', 'g') AS scrubbed
    FROM aug
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass (operators/text.py::scrub_pii): plant
    deterministic emails/phones/IPs, count and redact them. The oracle
    repeats the identical plant+scrub in SQL, so match counts AND the
    full redacted text are value-checked. (DuckDB regexp_replace needs
    the 'g' flag to match Spark's replace-all default.)"""
    aug = _pii_augmented(spark, sf_dir)
    return aug.select(
        "doc_id",
        T.pii_count("aug", "email").alias("n_email"),
        T.pii_count("aug", "phone").alias("n_phone"),
        T.pii_count("aug", "ip").alias("n_ip"),
        T.scrub_pii("aug").alias("scrubbed"),
    )


@query(
    "text_normalize",
    # replace(İ -> i + U+0307): Unicode's ONLY one-to-many LOWERCASE
    # special casing. The JVM applies it in full (lower('İ') is two
    # codepoints), DuckDB's utf8proc does the simple one-to-one map —
    # pre-substituting the full expansion makes both engines produce
    # the Unicode-correct form (round-8 unicode sweep).
    oracle="""
    WITH s AS (
      SELECT doc_id,
             TRIM(LOWER(regexp_replace(regexp_replace(
               replace(text, chr(304), 'i' || chr(775)),
               '[\\x00-\\x1f]', ' ', 'g'), ' +', ' ', 'g'))) AS norm
      FROM documents
    )
    SELECT doc_id, norm, LENGTH(norm) AS n_chars_norm FROM s
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text form for dedup/matching (lowercase, control chars
    and whitespace runs collapsed, trimmed) + normalized length. The
    lowercase step follows full Unicode special casing (İ becomes
    i + combining dot above — see the oracle comment); pinned by the
    round-8 unicode sweep."""
    d = load(spark, sf_dir, "documents")
    norm = T.normalize_text("text")
    return d.select(
        "doc_id",
        norm.alias("norm"),
        F.length(norm).alias("n_chars_norm"),
    )


@query(
    "sample_hash_stratified",
    oracle="""
    SELECT doc_id, lang,
           strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1 AS bucket16
    FROM documents
    WHERE strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1
          < CASE WHEN lang = 'en' THEN 4 ELSE 8 END
    """,
)
def sample_hash_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: md5-bucketed (content-keyed —
    identical across runs AND engines, unlike rand(seed)), keeping 4/16
    of English docs and 8/16 of everything else (downsample the dominant
    language — the standard corpus-balancing move)."""
    d = load(spark, sf_dir, "documents")
    bucket = T.hash_bucket16("text")
    rate = F.when(F.col("lang") == "en", F.lit(4)).otherwise(F.lit(8))
    return (
        d.withColumn("bucket16", bucket)
        .filter(F.col("bucket16") < rate)
        .select("doc_id", "lang", "bucket16")
    )


@query(
    "dedup_cluster_survivors",
    oracle="""
    WITH RECURSIVE sh AS (
      SELECT doc_id,
             list_distinct([text[i:i+4] FOR i IN range(1, GREATEST(LENGTH(text) - 4, 0) + 1)]) AS grams
      FROM documents WHERE doc_id < 150
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
            / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.35
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM pairs
    ), reach(node, root) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node
    ), cc AS (
      SELECT node, MIN(root) AS cluster_id FROM reach GROUP BY node
    )
    SELECT d.doc_id,
           COALESCE(cc.cluster_id, d.doc_id) AS cluster_id,
           d.doc_id = COALESCE(cc.cluster_id, d.doc_id) AS is_survivor
    FROM (SELECT doc_id FROM documents WHERE doc_id < 150) d
    LEFT JOIN cc ON cc.node = d.doc_id
    """,
)
def dedup_cluster_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full dedup endgame: candidate pairs (5-gram Jaccard >= 0.35
    over a bounded id range) -> connected components (iterative min-label
    propagation, operators/dedup.py::connected_components) -> one
    survivor per duplicate cluster (the min id). The oracle re-derives
    the same clusters with a recursive CTE (reachability closure +
    min-root per node), so the ITERATIVE Spark algorithm is value-checked
    against a declarative fixpoint. The result is bounded by the id
    filter (< 150 rows), so the wrapper materializes it eagerly and
    releases the label-propagation checkpoint blocks before returning
    (round-5 review: this and phash_clusters were the two remaining
    CC consumers leaving DISK_ONLY blocks resident)."""
    from ..operators.graph import finalize_round_result

    out = _cluster_survivors_lazy(spark, sf_dir)
    return finalize_round_result(out, out)


def _cluster_survivors_lazy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lazy survivor frame (state still registered) — split out so
    the plan-lock test can audit the join shape without the wrapper's
    eager materialize-and-release."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    sh = d.select("doc_id", _char_shingles().alias("grams"))
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("grams").alias("ga"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("grams").alias("gb"))
    inter = F.size(F.array_intersect("ga", "gb")).cast("double")
    union = F.size(F.array_union("ga", "gb"))
    pairs = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(F.try_divide(inter, union) >= 0.35)
        .select("id_a", "id_b")
    )
    return D.cluster_survivors(d.select("doc_id"), pairs, "doc_id")


@query(
    "text_chunk_windows",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ), s AS (
      SELECT doc_id, toks,
             UNNEST(range(1,
                          CAST(FLOOR((len(toks) - 1) / 48) * 48 + 1 AS BIGINT) + 1,
                          48)) AS start
      FROM t
    )
    SELECT doc_id,
           (start - 1) // 48 AS chunk_index,
           array_to_string(toks[start : start + 63], ' ') AS chunk_text,
           len(toks[start : start + 63]) AS n_tokens
    FROM s
    """,
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token windows (64 tokens, 16 overlap -> stride 48) per
    document — the training/embedding chunking pass
    (operators/text.py::chunk_documents). Single scan, no shuffle; the
    oracle re-slices the same windows with DuckDB list slicing."""
    d = load(spark, sf_dir, "documents")
    return T.chunk_documents(d, "doc_id", "text", chunk_tokens=64, overlap=16)


@query(
    "pack_sequences",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
             OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - CAST(len(string_split(text, ' ')) AS BIGINT) AS BIGINT) AS start_offset,
           CAST(FLOOR((SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
             OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - CAST(len(string_split(text, ' ')) AS BIGINT)) / 2048) AS BIGINT) AS bin,
           ((SUM(CAST(len(string_split(text, ' ')) AS BIGINT))
             OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - CAST(len(string_split(text, ' ')) AS BIGINT)) % 2048)
             + CAST(len(string_split(text, ' ')) AS BIGINT) > 2048 AS straddles_boundary
    FROM documents
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: concatenate the corpus in doc_id order
    and cut every 2048 tokens — per-doc bin assignment + straddle flag
    via one exact-integer window cumsum
    (operators/text.py::pack_sequences)."""
    d = load(spark, sf_dir, "documents")
    return T.pack_sequences(d, "doc_id", "text", budget_tokens=2048)


@query(
    "text_repetition",
    oracle="""
    WITH ws AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    ), words AS (
      SELECT doc_id, unnest(w) AS word FROM ws
    ), wc AS (
      SELECT doc_id, word, COUNT(*) AS c FROM words GROUP BY doc_id, word
    ), stats AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words, MAX(c) AS top_c,
             COUNT(*) AS n_distinct
      FROM wc GROUP BY doc_id
    ), grams AS (
      SELECT doc_id,
             [w[i] || ' ' || w[i + 1] FOR i IN range(1, len(w))] AS g2
      FROM ws
    )
    SELECT s.doc_id, s.n_words,
           ROUND(s.top_c / s.n_words, 6) AS top_word_frac,
           ROUND(1 - s.n_distinct / s.n_words, 6) AS dup_word_frac,
           ROUND(1 - len(list_distinct(g.g2)) / len(g.g2), 6) AS dup_2gram_frac,
           (ROUND(s.top_c / s.n_words, 6) <= 0.2
            AND ROUND(1 - len(list_distinct(g.g2)) / len(g.g2), 6) <= 0.3)
             AS keep
    FROM stats s JOIN grams g USING (doc_id)
    """,
)
def text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: top-word fraction, duplicate-word
    fraction, duplicate-2-gram fraction + keep verdict per document
    (operators/text.py::repetition_stats)."""
    d = load(spark, sf_dir, "documents")
    return T.repetition_stats(d, "doc_id", "text")


@query(
    "text_decontaminate",
    oracle="""
    WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g AS (
      SELECT doc_id, unnest(list_distinct(
        [w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
         FOR i IN range(1, len(w) - 3)]
      )) AS gram
      FROM ws WHERE len(w) >= 5
    ),
    eval_g AS (SELECT DISTINCT gram FROM g WHERE doc_id % 7 = 3)
    SELECT g.doc_id, COUNT(DISTINCT g.gram) AS n_shared_grams
    FROM g JOIN eval_g USING (gram)
    WHERE g.doc_id % 7 <> 3
    GROUP BY g.doc_id
    """,
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs (doc_id % 7 != 3) that
    share any distinct 5-gram with the held-out eval split (doc_id % 7 ==
    3); eval grams broadcast (operators/text.py::decontaminate)."""
    d = fan_out(load(spark, sf_dir, "documents"))
    return T.decontaminate(
        d, "doc_id", "text", eval_flag=(F.col("doc_id") % 7 == 3)
    )


@query(
    "sample_mixture_weights",
    oracle="""
    WITH w AS (
      SELECT doc_id, lang,
             CASE WHEN lang = 'en' THEN 0 WHEN lang = 'de' THEN 2 ELSE 1 END
             + CASE WHEN (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1)
                    < (CASE WHEN lang = 'en' THEN 8
                            WHEN lang = 'de' THEN 0 ELSE 4 END)
                    THEN 1 ELSE 0 END AS n_copies
      FROM documents
    )
    SELECT doc_id, lang, unnest(range(1, n_copies + 1)) AS copy_no
    FROM w WHERE n_copies > 0
    """,
)
def sample_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture resampling: English down-weighted to 0.5 epochs,
    German up-weighted to 2.0, everything else 1.25 — fractional epochs
    realized as a deterministic md5-bucket coin flip, duplicated rows
    carry copy_no (operators/text.py::mixture_resample)."""
    d = load(spark, sf_dir, "documents")
    return T.mixture_resample(
        d, "doc_id", "text", weights={"en": 0.5, "de": 2.0}, default_weight=1.25
    )


@query(
    "emb_centroid_per_group",
    oracle="""
    WITH flat AS (
      SELECT vec_id % 4 AS grp,
             unnest(range(1, len(embedding) + 1)) AS dim,
             unnest(embedding) AS x
      FROM embeddings
    )
    SELECT grp, CAST(dim AS BIGINT) AS dim,
           ROUND(AVG(CAST(x AS DOUBLE)), 4) AS centroid,
           COUNT(*) AS n_vecs
    FROM flat GROUP BY grp, dim
    """,
)
def emb_centroid_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group embedding centroids (the building block of IVF training,
    cluster summaries, and domain drift monitoring): posexplode each
    vector to (group, dim, x) and average per cell. Scale shape: the
    N x 64 exploded rows partial-aggregate map-side down to
    |groups| x 64 cells before the only shuffle; no vector ever
    crosses the wire whole. Rounded to 4 (summation order differs
    between engines; error ~1e-12 relative vs a 5e-5 boundary)."""
    e = load(spark, sf_dir, "embeddings")
    flat = e.select(
        (F.col("vec_id") % 4).alias("grp"),
        F.posexplode("embedding").alias("pos", "x"),
    )
    return flat.groupBy("grp", (F.col("pos") + 1).cast("long").alias("dim")).agg(
        F.round(F.avg(F.col("x").cast("double")), 4).alias("centroid"),
        F.count("*").alias("n_vecs"),
    )


@query(
    "text_dup_ngrams",
    oracle="""
    WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    g AS (
      SELECT doc_id, unnest(list_distinct(
        [w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' || w[i+4]
         FOR i IN range(1, len(w) - 3)]
      )) AS gram
      FROM ws WHERE len(w) >= 5
    )
    SELECT gram, COUNT(*) AS n_docs
    FROM g GROUP BY gram HAVING COUNT(*) >= 2
    ORDER BY n_docs DESC, gram LIMIT 20
    """,
)
def text_dup_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide duplicated-passage mining: the 5-grams appearing in
    >= 2 distinct documents, heaviest first — the cheap cross-document
    signal behind suffix-array-style dedup triage. Per-doc grams are
    array_distinct'd BEFORE the explode so a phrase repeated inside one
    doc counts once; the global count is a partial-aggregated groupBy
    and the top-20 a WindowGroupLimit-free sort-limit (tiny result)."""
    from ..operators.dedup import word_shingles

    d = fan_out(load(spark, sf_dir, "documents"))
    words = F.split(F.col("text"), " ")
    grams = F.array_distinct(word_shingles(words, 5))
    g = d.filter(F.size(words) >= 5).select(
        "doc_id", F.explode(grams).alias("gram")
    )
    return (
        g.groupBy("gram")
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .orderBy(F.col("n_docs").desc(), "gram")
        .limit(20)
    )


@query(
    "text_unigram_logprob",
    oracle="""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ),
    v AS (SELECT word, COUNT(*) AS c FROM w GROUP BY word),
    t AS (SELECT CAST(SUM(c) AS DOUBLE) AS tot FROM v)
    SELECT w.doc_id, COUNT(*) AS n_words,
           ROUND(AVG(LN(CAST(v.c AS DOUBLE) / t.tot)), 4) AS avg_logprob
    FROM w JOIN v USING (word), t
    GROUP BY w.doc_id
    """,
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality score: mean log corpus-probability
    of a doc's words — the cheap proxy for LM-perplexity filtering
    (high = generic words, very low = gibberish/rare-token soup).
    Scale shape: vocab is a keyed aggregate over one exploded scan;
    the grand total is a one-row broadcast; the word->prob lookup is a
    shuffle join on word (vocab at web scale outgrows a broadcast);
    per-doc mean is the final keyed agg. Round 4 absorbs the
    summation-order difference between engines."""
    d = fan_out(load(spark, sf_dir, "documents"))
    w = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    v = w.groupBy("word").agg(F.count("*").alias("c"))
    tot = v.agg(F.sum("c").cast("double").alias("tot"))
    return (
        w.join(v, "word")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.round(
                F.avg(F.log(F.col("c").cast("double") / F.col("tot"))), 4
            ).alias("avg_logprob"),
        )
    )


@query(
    "text_bigram_kn_logprob",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split(text, ' ') AS ws FROM documents
    ),
    bz AS (
      SELECT doc_id, unnest(list_zip(list_slice(ws, 1, len(ws) - 1),
                                     list_slice(ws, 2, len(ws)))) AS pr
      FROM w WHERE len(ws) >= 2
    ),
    b AS (SELECT doc_id, pr[1] AS w1, pr[2] AS w2 FROM bz),
    c2 AS (
      SELECT w1, w2, CAST(COUNT(*) AS DOUBLE) AS c2 FROM b GROUP BY w1, w2
    ),
    fw AS (
      SELECT w1, CAST(SUM(c2) AS DOUBLE) AS c1,
             CAST(COUNT(*) AS DOUBLE) AS n1fw
      FROM c2 GROUP BY w1
    ),
    bw AS (
      SELECT w2, CAST(COUNT(*) AS DOUBLE) AS n1bw FROM c2 GROUP BY w2
    ),
    d AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nbig FROM c2)
    SELECT b.doc_id, COUNT(*) AS n_bigrams,
           ROUND(AVG(LN(
             (GREATEST(c2.c2 - 0.75, 0.0)
              + 0.75 * fw.n1fw * (bw.n1bw / d.nbig)) / fw.c1
           )), 4) AS avg_logprob
    FROM b JOIN c2 USING (w1, w2) JOIN fw USING (w1)
           JOIN bw USING (w2), d
    GROUP BY b.doc_id
    """,
)
def text_bigram_kn_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM quality score (Kneser & Ney
    1995; Chen & Goodman 1999 absolute discounting, d=0.75) — the
    CCNet-style perplexity filter one rung above text_unigram_logprob:

        P(w2|w1) = (max(c(w1 w2) - d, 0)
                    + d * N1+(w1 .) * Pcont(w2)) / c(w1 .)
        Pcont(w2) = N1+(. w2) / |distinct bigrams|

    Per doc: mean ln P over its adjacent word pairs (trained on the
    scoring corpus itself, so every scored bigram is in-model; a
    held-out bigram would still get the continuation mass — the
    formula needs no special OOV branch). The per-context
    normalization Σ_w2 P(w2|w1) = 1 is pytest-locked exactly.

    Scale shape: bigram explode is one corpus scan (transform over the
    split array — no per-word self-join); the model is three keyed
    aggregates over the bigram table (by pair, by w1, by w2) plus a
    one-row distinct-bigram total (broadcast); scoring re-joins the
    exploded pairs against the model on (w1, w2) then w1 then w2 —
    shuffle joins, because a web-scale bigram vocabulary outgrows any
    broadcast. Both engines evaluate the identical double-precision
    formula; ROUND(4) on the per-doc mean absorbs summation order
    (the unigram precedent)."""
    d = fan_out(load(spark, sf_dir, "documents"))
    w = d.select("doc_id", F.split("text", " ").alias("ws"))
    b = w.filter(F.size("ws") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(ws) - 2), "
                "i -> struct(ws[i] AS w1, ws[i + 1] AS w2))"
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    c2 = b.groupBy("w1", "w2").agg(
        F.count("*").cast("double").alias("c2")
    )
    fw = c2.groupBy("w1").agg(
        F.sum("c2").cast("double").alias("c1"),
        F.count("*").cast("double").alias("n1fw"),
    )
    bw = c2.groupBy("w2").agg(F.count("*").cast("double").alias("n1bw"))
    nbig = c2.agg(F.count("*").cast("double").alias("nbig"))
    prob = (
        F.greatest(F.col("c2") - F.lit(0.75), F.lit(0.0))
        + F.lit(0.75) * F.col("n1fw") * (F.col("n1bw") / F.col("nbig"))
    ) / F.col("c1")
    return (
        b.join(c2, ["w1", "w2"])
        .join(fw, "w1")
        .join(bw, "w2")
        .join(F.broadcast(nbig))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(F.log(prob)), 4).alias("avg_logprob"),
        )
    )


@query(
    "pipeline_corpus_curation",
    oracle="""
    WITH norm AS (
      SELECT doc_id, text,
             TRIM(LOWER(regexp_replace(regexp_replace(text,
               '[\\x00-\\x1f]', ' ', 'g'), ' +', ' ', 'g'))) AS nt
      FROM documents
    ),
    surv AS (
      SELECT doc_id,
             doc_id = MIN(doc_id) OVER (PARTITION BY nt) AS is_survivor
      FROM norm
    ),
    rep AS (
      SELECT doc_id,
             CAST(MAX(c) AS DOUBLE) / SUM(c) <= 0.2 AS keep_repetition
      FROM (SELECT doc_id, word, COUNT(*) AS c
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                  FROM documents) u
            GROUP BY doc_id, word) wc
      GROUP BY doc_id
    ),
    samp AS (
      SELECT doc_id,
             (strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1) < 12
               AS keep_sample
      FROM documents
    )
    SELECT s.doc_id, s.is_survivor, r.keep_repetition, p.keep_sample,
           (s.is_survivor AND r.keep_repetition AND p.keep_sample) AS keep
    FROM surv s JOIN rep r USING (doc_id) JOIN samp p USING (doc_id)
    """,
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation in ONE declarative plan — the composed
    flagship of the LLM-data operators: normalize -> exact-dedup survivor
    election -> repetition gate -> deterministic hash sampling, emitting
    every per-stage verdict plus the final keep bit (a user audits WHY a
    doc was dropped, not just that it was).

    Scale shape: three independent keyed passes over one scan family —
    survivor window shuffles on normalized content, the repetition gate
    is the two-level word agg, sampling is a zero-shuffle filter — then
    doc_id equi-joins reassemble the verdict row. No cross joins, no
    collects; every stage partial-aggregates or stays narrow."""
    from pyspark.sql.window import Window

    d = load(spark, sf_dir, "documents")
    nt = T.normalize_text("text")
    surv = d.select(
        "doc_id",
        (F.col("doc_id") == F.min("doc_id").over(Window.partitionBy(nt))).alias(
            "is_survivor"
        ),
    )
    wc = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("c"))
    )
    rep = wc.groupBy("doc_id").agg(
        (F.max("c").cast("double") / F.sum("c") <= 0.2).alias("keep_repetition")
    )
    samp = d.select(
        "doc_id", (T.hash_bucket16("text") < 12).alias("keep_sample")
    )
    return (
        surv.join(rep, "doc_id")
        .join(samp, "doc_id")
        .select(
            "doc_id",
            "is_survivor",
            "keep_repetition",
            "keep_sample",
            (
                F.col("is_survivor")
                & F.col("keep_repetition")
                & F.col("keep_sample")
            ).alias("keep"),
        )
    )


@query(
    "dq_freshness",
    oracle="""
    WITH mx AS (SELECT MAX(ts) AS corpus_max FROM events)
    SELECT event_type, COUNT(*) AS n,
           STRFTIME(MAX(ts), '%Y-%m-%d %H:%M:%S') AS latest,
           CAST(FLOOR((FLOOR(epoch(corpus_max)) - FLOOR(epoch(MAX(ts))))
                      / 60) AS BIGINT) AS staleness_min
    FROM events, mx
    GROUP BY event_type, corpus_max
    """,
)
def dq_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness/staleness audit per stream: minutes since each event
    type last produced data, measured against the corpus watermark (the
    global max timestamp — NOT wall clock, so the answer is
    deterministic and replayable). The operational check behind 'is
    source X still flowing'; one aggregation plus a one-row broadcast
    of the watermark."""
    ev = load(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("corpus_max"))
    per = ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.max("ts").alias("latest_ts")
    )
    return per.join(F.broadcast(mx)).select(
        "event_type",
        "n",
        F.date_format("latest_ts", "yyyy-MM-dd HH:mm:ss").alias("latest"),
        F.floor(
            (F.unix_timestamp("corpus_max") - F.unix_timestamp("latest_ts"))
            / 60
        ).alias("staleness_min"),
    )


@query(
    "agg_dedup_rate_by_source",
    oracle="""
    SELECT source, COUNT(*) AS n_docs,
           COUNT(DISTINCT text) AS n_distinct,
           CAST(FLOOR((1.0 - CAST(COUNT(DISTINCT text) AS DOUBLE)
                             / COUNT(*)) * 1000000.0 + 0.5) AS DOUBLE)
             / 1000000.0 AS dup_rate
    FROM documents
    GROUP BY source
    """,
)
def agg_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication census per ingestion source: exact distinct-text
    counts and the duplicate fraction — the triage view that decides
    WHICH crawl/source needs aggressive dedup before training. The
    distinct count is the standard two-phase partial-distinct
    aggregate; at extreme cardinality swap in agg_hll_union's sketch
    or agg_bitmap_distinct's bitmaps (same grouping shape)."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("text").alias("n_distinct"),
        (
            F.floor(
                (
                    F.lit(1.0)
                    - F.countDistinct("text").cast("double") / F.count("*")
                )
                * 1000000.0
                + 0.5
            ).cast("double")
            / 1000000.0
        ).alias("dup_rate"),
    )


@query(
    "dq_outlier_mad",
    oracle="""
    WITH ev AS (
      SELECT event_type, value FROM events WHERE value IS NOT NULL AND NOT isnan(value) AND abs(value) <= 1e+15
    ),
    m AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM ev GROUP BY event_type
    ),
    d AS (
      SELECT e.event_type, m.med, ABS(e.value - m.med) AS dev
      FROM ev e JOIN m USING (event_type)
    ),
    s AS (
      SELECT event_type, quantile_cont(dev, 0.5) AS mad
      FROM d GROUP BY event_type
    )
    SELECT d.event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN d.dev > 3 * s.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           ROUND(MIN(d.med), 4) AS med,
           ROUND(MIN(s.mad), 4) AS mad
    FROM d JOIN s USING (event_type)
    GROUP BY d.event_type
    """,
)
def dq_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection per sensor: median-absolute-deviation
    (|v - median| > 3*MAD) — the standard robust alternative to z-scores
    for quality gating skewed sensor streams.

    Two grouped median passes + two broadcast joins of the tiny per-type
    stats (|event_type| rows) back onto the fact — the fact table itself
    never shuffles on a new key, so the pattern holds at 100 TB. Medians
    interpolate identically in Spark ``percentile`` and DuckDB
    ``quantile_cont``; the 3*MAD comparison runs on bit-identical doubles
    in both engines, so the outlier COUNT is exact (rounding is
    presentation-only)."""
    v = F.col("value")
    # in-domain readings only (NULL/NaN/Inf/out-of-envelope excluded on
    # BOTH engines — round-8 extreme-float sweep): a non-finite reading
    # has no meaningful |v - median| and is a dq_profile problem, not a
    # MAD outlier.
    ev = (
        load(spark, sf_dir, "events")
        .select("event_type", "value")
        .filter(v.isNotNull() & ~F.isnan(v) & (F.abs(v) <= F.lit(1.0e15)))
    )
    med = ev.groupBy("event_type").agg(
        F.percentile(F.col("value"), F.lit(0.5)).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile(F.col("dev"), F.lit(0.5)).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.when(F.col("dev") > 3 * F.col("mad"), 1).otherwise(0)
            ).alias("n_outliers"),
            F.round(F.min("med"), 4).alias("med"),
            F.round(F.min("mad"), 4).alias("mad"),
        )
    )


@query(
    "emb_norm_stats",
    oracle="""
    WITH n AS (
      SELECT label,
             SQRT(list_reduce([CAST(embedding[i] AS DOUBLE)
                               * CAST(embedding[i] AS DOUBLE)
                               FOR i IN range(1, len(embedding) + 1)],
                              (x, y) -> x + y)) AS nrm
      FROM embeddings
    )
    SELECT label,
           COUNT(*) AS n_vecs,
           {qmin} AS min_norm,
           {qmax} AS max_norm,
           CAST(SUM(CAST(FLOOR(nrm * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
             / 1000000.0 / COUNT(*) AS avg_norm
    FROM n
    GROUP BY label
    """.format(qmin=sql_quant("MIN(nrm)"), qmax=sql_quant("MAX(nrm)")),
)
def emb_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label L2-norm distribution of the embedding corpus — the sanity
    gate before any cosine pipeline (un-normalized vectors silently break
    dot-product ANN).

    JVM-side HOF fold (no Python): ``aggregate`` left-folds the squares in
    element order, bit-identical to DuckDB's ``list_reduce`` (0+x==x in
    IEEE for the init step), so even MIN/MAX of the per-row norms match
    exactly; the mean goes through the scaled-integer convention
    (_conv.py) to stay order-independent."""
    e = load(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    n = e.select("label", F.sqrt(sq).alias("nrm"))
    cents6 = F.floor(F.col("nrm") * 1000000.0 + 0.5)
    return n.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        (F.floor(F.min("nrm") * 1000000.0 + 0.5).cast("double") / 1000000.0).alias(
            "min_norm"
        ),
        (F.floor(F.max("nrm") * 1000000.0 + 0.5).cast("double") / 1000000.0).alias(
            "max_norm"
        ),
        (F.sum(cents6).cast("double") / 1000000.0 / F.count("*")).alias(
            "avg_norm"
        ),
    )


@query(
    "text_containment_ngram",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             list_distinct([text[i:i+4]
                            FOR i IN range(1, GREATEST(LENGTH(text) - 4, 0) + 1)])
               AS grams
      FROM documents WHERE doc_id < 120
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           ROUND(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                 / len(a.grams), 6) AS containment
    FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
    WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
          / len(a.grams) >= 0.5
    """,
)
def text_containment_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional n-gram containment |A∩B| / |A| — catches near-SUBSET
    duplicates (a doc embedded inside a longer one) that symmetric Jaccard
    under-scores, the classic quote/boilerplate case in corpus curation.
    Pair space bounded by the id filter; at scale the same verify runs on
    LSH candidates (dedup_minhash) instead of all pairs."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    sh = d.select("doc_id", _char_shingles().alias("grams"))
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("grams").alias("ga"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("grams").alias("gb"))
    # try_divide: an empty gram set (sub-width doc) otherwise throws
    # DIVIDE_BY_ZERO under ANSI; NULL is filtered below, matching the
    # oracle's NaN-compare filter.
    cont = F.try_divide(
        F.size(F.array_intersect("ga", "gb")).cast("double"), F.size("ga")
    )
    return (
        a.join(b, F.col("id_a") != F.col("id_b"))
        .withColumn("cont_raw", cont)
        .filter(F.col("cont_raw") >= 0.5)
        .select("id_a", "id_b", F.round("cont_raw", 6).alias("containment"))
    )


@query("sim_topk_pq", oracle=None)  # approximate by construction
def sim_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization approximate top-5 with exact re-rank: the
    corpus is PQ-encoded once (8 code ids/vector — 32x smaller than raw
    floats), queries score via ADC lookup tables, and only the top-4k ADC
    candidates pay the exact cosine. Pytest checks recall vs sim_topk."""
    e = load(spark, sf_dir, "embeddings")
    return S.pq_ann_topk(e, query_max_id=20, k=5)


@query("agg_hll_union", oracle=None)  # sketch estimate, +-epsilon by design
def agg_hll_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL, built
    into Spark 3.5+): per-event-type user sketches UNION to the global
    sketch WITHOUT rescanning the fact — the re-aggregatable form a
    100 TB incremental pipeline stores in its rollup tables (exact
    COUNT(DISTINCT) cannot merge; sketches can). Pytest bounds the
    estimates within 5% of exact. Output stringifies nothing binary:
    estimates only."""
    ev = load(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    est = per_type.select(
        "event_type",
        "exact_users",
        F.hll_sketch_estimate("sk").alias("approx_users"),
    )
    union = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
        F.max(F.lit(0)).alias("_z"),
    ).select(
        F.lit("__ALL__").alias("event_type"),
        F.lit(None).cast("long").alias("exact_users"),
        "approx_users",
    )
    return est.unionByName(union)


@query(
    "sample_train_split",
    oracle="""
    SELECT CASE WHEN b < 12 THEN 'train'
                WHEN b < 14 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (SELECT strpos('0123456789abcdef', substr(md5(text), 1, 1)) - 1 AS b,
                 n_chars
          FROM documents)
    GROUP BY 1
    """,
)
def sample_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 75/12.5/12.5 train/val/test split keyed on content
    md5 (not rand()): stable across runs, engines, and re-ingestion of
    the same document — the property that keeps eval sets leak-free when
    the corpus is rebuilt. One scan, no shuffle beyond the 3-row agg."""
    d = load(spark, sf_dir, "documents")
    b = T.hash_bucket16("text")
    split = (
        F.when(b < 12, "train").when(b < 14, "val").otherwise("test")
    ).alias("split")
    return d.select(split, "n_chars").groupBy("split").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


@query("dedup_semantic", oracle=None)  # cell-bounded, approximate recall
def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: k-means-cell-bounded cosine pairs,
    drop the higher-id member of every >=0.95 pair. Pytest plants exact
    duplicates and checks survivors. Output: surviving ids + label
    (vectors stay internal — no array columns in declared output)."""
    e = load(spark, sf_dir, "embeddings")
    return S.semantic_dedup(e, threshold=0.95).select("vec_id", "label")


@query(
    "text_html_extract",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, text AS source_text, {T.sql_synthesize_html()} AS html
      FROM documents
    ),
    x AS (
      SELECT doc_id, source_text, html,
             {T.sql_html_extract('html')} AS body
      FROM h
    )
    SELECT doc_id,
           regexp_extract(html, '<title>([^<]*)</title>', 1) AS title,
           body,
           strpos(body, source_text) > 0 AS contains_source,
           LENGTH(body) AS n_chars
    FROM x
    """,
)
def text_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-corpus ingestion stage: HTML -> clean text extraction (the
    trafilatura-shaped step every crawled-data pipeline runs first),
    over deterministically synthesized pages wrapping the fixture
    documents (same stand-in honesty contract as the multimodal decode
    stub — no crawl ships in this env; the extraction chain is real).
    Steps: drop <script>/<style> subtrees wholesale (tracker/style
    content must NOT leak into training text), strip remaining tags,
    single-pass entity decode (&amp; decoded LAST — the classic
    double-decode bug), collapse whitespace. One codegen'd JVM
    regexp/replace projection, zero shuffles, no UDF; patterns stay in
    the Java-regex/RE2 common subset so the oracle is bit-identical.
    contains_source audits that the original text survives extraction
    intact. fan_out spreads the few-split fixture scan across the
    session's parallelism — the regex chain is the per-row-heavy stage
    (sf20: 3 input splits left 29 cores idle; conditional, so
    real-scale inputs skip the extra shuffle)."""
    d = fan_out(load(spark, sf_dir, "documents"))
    h = T.synthesize_html(d)
    body = T.html_extract(F.col("html"))
    return h.select(
        "doc_id",
        F.regexp_extract("html", "<title>([^<]*)</title>", 1).alias("title"),
        body.alias("body"),
        (F.position(F.col("source_text"), body) > 0).alias(
            "contains_source"
        ),
        F.length(body).cast("bigint").alias("n_chars"),
    )


@query(
    "text_quality_classifier",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    f AS (
      SELECT doc_id,
             list_concat(w, [w[i] || ' ' || w[i + 1]
                             FOR i IN range(1, len(w))]) AS feats
      FROM t
    ),
    s AS (
      SELECT doc_id, len(feats) AS n_feats,
             list_reduce(
               [CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT) % 2001 - 1000
                FOR x IN feats],
               (a, b) -> a + b) AS wsum
      FROM f
    )
    SELECT doc_id, n_feats,
           -- + 0.0 normalizes IEEE negative zero; floor-quant, not
           -- ROUND (same IEEE ops as Spark's quant(), no tie flake)
           CAST(FLOOR((CAST(wsum AS DOUBLE) / 1000.0
                       / CAST(n_feats AS DOUBLE)) * 1000000.0 + 0.5)
                AS DOUBLE) / 1000000.0 + 0.0 AS score,
           CAST(wsum AS DOUBLE) / 1000.0 / CAST(n_feats AS DOUBLE)
             > 0.02 AS keep
    FROM s
    """,
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear text-classifier inference with hashed features — the
    fastText-style model-based quality gate (Joulin et al. 2016,
    arXiv:1607.01759) used by CCNet/LLaMA-style curation to score every
    document: unigram + word-bigram features hash to weight-table slots,
    the document score is the mean feature weight, keep = score above a
    margin. The WEIGHTS here are a deterministic md5-derived stand-in
    (no trained model ships in this env — same honesty contract as the
    multimodal decode stub); the plumbing IS the real inference shape:
    feature hashing, table lookup, mean pooling, thresholding, all
    JVM-side in one pass with zero shuffles (no UDF — hashing is md5 +
    conv, pooling an integer fold). Oracle-checkable because weights
    stay INTEGER until two exact final divisions: the feature-weight sum
    is an order-free exact BIGINT, immune to float reassociation. At
    100 TB a real model's weight table broadcasts instead; the scan
    shape is unchanged."""
    d = fan_out(load(spark, sf_dir, "documents"))
    words = F.split(F.col("text"), " ")
    feats = F.concat(words, D.word_shingles(words, 2))
    weights = F.transform(feats, lambda x: hash_u32(x) % 2001 - 1000)
    wsum = F.aggregate(weights, F.lit(0).cast("long"), lambda a, b: a + b)
    n = F.size(feats)
    score = F.try_divide(
        F.try_divide(wsum.cast("double"), F.lit(1000.0)), n.cast("double")
    )
    return d.select(
        "doc_id",
        n.alias("n_feats"),
        # quant(), not ROUND: immune to Spark's shortest-repr HALF_UP
        # vs DuckDB's binary-value rounding on .xxxxx5 ties (r4 advice)
        (quant(score, 6) + F.lit(0.0)).alias("score"),
        (score > 0.02).alias("keep"),
    )


@query("cluster_kmeans", oracle=_C.kmeans_oracle_sql(k=8, n_iter=3))
def cluster_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-class distributed k-means corpus clustering (Lloyd's): the
    curation primitive behind topic balancing, cluster-proportional data
    mixing, and SemDeDup/IVF cell structure — here surfaced as its own
    oracle-checked operator rather than an internal of those paths.
    k=8 cells, 3 Lloyd rounds, deterministic smallest-id init. Output:
    every vector's final cell and squared-L2 distance to its centroid.
    ORACLE-CHECKED (rare for iterative ML): every float op on both
    engines runs the identical IEEE sequence — see
    operators/clustering.py. Scale shape: assignment is a map-side
    Arrow kernel (no join, no vector shuffle), each update collects
    only k x dim doubles; fan_out spreads the one-split fixture so the
    Arrow passes parallelize (conditional — real inputs skip it)."""
    e = fan_out(load(spark, sf_dir, "embeddings"))
    return _C.kmeans_lloyd(e, k=8, n_iter=3)


@query(
    "multimodal_framesample",
    oracle="""
    WITH m AS (
      SELECT doc_id AS media_id,
             ['png', 'jpeg', 'wav'][(doc_id % 3) + 1] AS format,
             text,
             CAST(FLOOR(LENGTH(text) / 64.0) AS BIGINT) AS n_frames
      FROM documents
    )
    SELECT media_id, format, n_frames,
           md5(array_to_string(
             [text[i * 64 + 1 : i * 64 + 16]
              FOR i IN range(0, CAST(GREATEST(n_frames - 1, 0) AS INT) + 1)],
             '')) AS frame_digest
    FROM m
    """,
)
def multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over opaque media payloads (the video keyframe
    stand-in): JVM-side binary slicing every 64 bytes, 16-byte frames —
    no Python in the sampling pass. ORACLE-CHECKED because the synthetic
    payloads are UTF-8 text bytes, so the byte slices are expressible as
    SQL substrings; the declared output digests the frame list to one
    md5 scalar (frames stay internal — no array/binary output columns)."""
    m = M.synthesize_media(load(spark, sf_dir, "documents"))
    fs = M.frame_sample(m, every_n_bytes=64)
    # NULL payload -> NULL digest: concat_ws SKIPS nulls, so without the
    # guard a NULL payload would silently digest to md5('') while the
    # oracle's NULL slices propagate NULL (adversarial NULL fixture).
    return fs.select(
        "media_id",
        "format",
        "n_frames",
        F.when(
            F.col("n_frames").isNotNull(),
            F.md5(
                F.concat_ws(
                    "", F.transform("frames", lambda f: F.decode(f, "UTF-8"))
                )
            ),
        ).alias("frame_digest"),
    )


@query(
    "emb_matryoshka",
    oracle="""
    WITH e AS (
      SELECT vec_id, label,
             list_reduce([CAST(embedding[i] AS DOUBLE)
                          * CAST(embedding[i] AS DOUBLE)
                          FOR i IN range(1, len(embedding) + 1)],
                         (x, y) -> x + y) AS sq_full,
             list_reduce([CAST(embedding[i] AS DOUBLE)
                          * CAST(embedding[i] AS DOUBLE)
                          FOR i IN range(1, 17)],
                         (x, y) -> x + y) AS sq_16
      FROM embeddings
    )
    SELECT vec_id, label,
           {qfull} AS norm_full,
           {q16} AS norm_16,
           CASE WHEN sq_full > 0 THEN
             {qfrac}
           END AS energy_frac
    FROM e
    """.format(
        qfull=sql_quant("SQRT(sq_full)"),
        q16=sql_quant("SQRT(sq_16)"),
        qfrac=sql_quant("sq_16 / sq_full"),
    ),
)
def emb_matryoshka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncation audit: how much of each vector's energy
    (squared L2 mass) the first 16 of 64 dimensions carry — the
    measurement behind MRL-style dimension truncation (serve 16-dim
    prefixes if energy_frac is high; re-embed if not). Same JVM HOF
    fold discipline as emb_norm_stats (sequential element-order adds,
    bit-identical to DuckDB's list_reduce), one scan, no shuffle,
    per-row output — embarrassingly parallel at any corpus size."""
    e = load(spark, sf_dir, "embeddings")

    def sq_fold(col):
        return F.aggregate(
            col, F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")
        )

    sq_full = sq_fold(F.col("embedding"))
    sq_16 = sq_fold(F.slice("embedding", 1, 16))

    def q6(c):
        return F.floor(c * 1000000.0 + 0.5).cast("double") / 1000000.0

    return e.select(
        "vec_id",
        "label",
        q6(F.sqrt(sq_full)).alias("norm_full"),
        q6(F.sqrt(sq_16)).alias("norm_16"),
        q6(F.try_divide(sq_16, sq_full)).alias("energy_frac"),
    )


@query(
    "text_bigram_coherence",
    oracle="""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ), pairs AS (
      SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
      FROM d, LATERAL (SELECT unnest(range(1, len(w))) AS i) t
    ), bc AS (
      SELECT w1, w2, COUNT(*) AS cb FROM pairs GROUP BY w1, w2
    ), pc AS (
      SELECT w1, COUNT(*) AS cp FROM pairs GROUP BY w1
    )
    SELECT p.doc_id, COUNT(*) AS n_bigrams,
           ROUND(AVG(LN(CAST(bc.cb AS DOUBLE) / pc.cp)), 4)
             AS avg_bigram_logprob
    FROM pairs p JOIN bc USING (w1, w2) JOIN pc USING (w1)
    GROUP BY p.doc_id
    """,
)
def text_bigram_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM coherence score: mean log conditional probability
    ln(P(w2|w1)) of a document's adjacent word pairs under corpus MLE
    counts — the step up from text_unigram_logprob that catches
    shuffled/garbled word order (unigram-plausible, bigram-impossible).
    Pairs come from a JVM transform over the token array (no self-join
    on position); the bigram/prefix tables are keyed aggregates that
    shuffle-join back on the pair — at web scale the vocab outgrows a
    broadcast, so these stay shuffle joins. ROUND 4 absorbs the
    engines' summation-order difference (pattern of unigram_logprob).
    Documents with fewer than two tokens drop out in both engines."""
    d = fan_out(load(spark, sf_dir, "documents")).select(
        "doc_id", F.split("text", " ").alias("w")
    )
    pairs = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(w) >= 2 THEN transform("
                "sequence(1, size(w) - 1), i -> "
                "struct(w[i-1] AS w1, w[i] AS w2)) "
                "ELSE array() END"
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    bc = pairs.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    pc = pairs.groupBy("w1").agg(F.count("*").alias("cp"))
    return (
        pairs.join(bc, ["w1", "w2"])
        .join(pc, "w1")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(
                F.avg(F.log(F.col("cb").cast("double") / F.col("cp"))), 4
            ).alias("avg_bigram_logprob"),
        )
    )


@query("emb_pca_power", oracle=None)  # iterative float linalg — pytest-invariant-checked
def emb_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-2 principal components of the embedding cloud: anisotropy /
    collapse diagnostics for the curation pipeline — a healthy
    embedding model spreads variance; a collapsed one concentrates it
    in PC1, which this report surfaces as explained-variance basis
    points. Uses the ONE-PASS Gram path (operators/pca.py::gram_pcs):
    per-Arrow-batch BLAS X^T X partials, an O(dim^2)-per-partition
    shuffle, and a driver-side 64×64 eigendecomposition — one scan
    total, exact eigenvalues. power_iteration_pcs stays as the
    huge-dim fallback (one scan per iteration, dim-sized driver state)
    with both paths cross-checked on planted spectra in pytest.
    Loadings are emitted as a JSON string (driver canonicalizer takes
    no top-level arrays)."""
    from ..operators.pca import gram_pcs

    emb = load(spark, sf_dir, "embeddings")
    comps, eigs, trace = gram_pcs(emb, "embedding", n_components=2)
    rows = [
        (
            k + 1,
            round(eigs[k], 4),
            int(eigs[k] * 10000 / trace) if trace else 0,
            "[" + ",".join(f"{x:.4f}" for x in comps[k]) + "]",
        )
        for k in range(len(comps))
    ]
    return spark.createDataFrame(
        rows, "component int, eigenvalue double, explained_bp int, loadings string"
    )


@query("multimodal_phash_dedup", oracle=None)  # engine-defined fingerprint — pytest-invariant-checked
def multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup detection over the synthesized media
    table: 64-bit stride-mean fingerprints per payload (the pHash
    plumbing — with a real codec only the per-batch numpy body
    changes), then pigeonhole-bucketed candidate pairs verified by
    exact bit_count(xor) Hamming distance — an equi-join on 16-bit
    blocks, never all-pairs. Output: per-Hamming-distance pair counts
    (deterministic; payloads are deterministic UTF-8 bytes).
    Pigeonhole completeness vs brute force and planted-corruption
    recall are pytest-locked (tests/test_extensions.py)."""
    from ..operators import multimodal as MM

    docs = load(spark, sf_dir, "documents")
    media = MM.synthesize_media(docs)
    hashes = MM.phash_media(media)
    # max_hamming=3 is the pigeonhole-COMPLETE bound for 4x16-bit
    # blocks; wider radii are probabilistic-recall (documented in
    # fingerprint_near_pairs) and would make the histogram an
    # undercount at distances 4+.
    pairs = MM.phash_near_dup_pairs(hashes, max_hamming=3)
    return (
        pairs.groupBy("hamming")
        .agg(F.count("*").cast("bigint").alias("n_pairs"))
        .orderBy("hamming")
    )


@query("emb_whiten_audit", oracle=None)  # eigenvector-derived — pytest-invariant-checked
def emb_whiten_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA whitening applied and audited in one job: project embeddings
    onto the top-2 principal directions scaled to unit variance
    (operators/pca.py::whiten — k JVM folds per row against the
    driver's dim×k literal matrix), then report each whitened
    coordinate's mean and variance. A correct whitening reads mean≈0,
    var≈1 — the audit IS the contract, and the identity-covariance
    invariant (including cross-covariance ≈ 0) is pytest-locked on
    planted anisotropic data (tests/test_extensions.py)."""
    from ..operators.pca import gram_pcs, whiten

    emb = load(spark, sf_dir, "embeddings")
    # One pass: the Gram aggregation already carries the per-dimension
    # sums and row count, so mean/n come back for free (no rescans).
    comps, eigs, _, mean, n = gram_pcs(
        emb, "embedding", n_components=2, return_moments=True
    )
    white = whiten(emb, comps, eigs, n, "embedding", mean=mean)
    return (
        white.select(F.posexplode("whitened").alias("coord", "w"))
        .groupBy("coord")
        .agg(
            F.round(F.avg("w"), 3).alias("mean_r"),
            F.round(F.var_pop("w"), 3).alias("var_r"),
        )
    )


@query("text_bpe_train", oracle=None)  # iterative argmax — closed-form pytest on the Sennrich corpus
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer induction over the documents corpus
    (operators/text.py::bpe_train): 10 merge rounds on the distributed
    word-frequency table — pair counting is a JVM transform+explode
    with partial aggregation (shuffle bounded by the pair vocabulary,
    not corpus size); only each round's argmax pair reaches the
    driver. Returns the ordered merge table (rank, left, right,
    merged) — the artifact a tokenizer ships. Deterministic via
    lexicographic tiebreaks; the exact merge sequence on the classic
    BPE corpus is pytest-locked (tests/test_extensions.py)."""
    from ..operators.text import bpe_train

    docs = load(spark, sf_dir, "documents")
    merges = bpe_train(docs, "text", n_merges=10)
    rows = [
        (i + 1, a, b, a + b) for i, (a, b) in enumerate(merges)
    ]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, merged string"
    )


@query("sim_topk_ivf_indexed", oracle=None)  # approximate; indexed==in-memory pytest-locked
def sim_topk_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN served from a PERSISTED IVF index
    (operators/similarity.py::build_ivf_index / ivf_ann_topk_indexed):
    the corpus pass (centroid training, assignment, norms) happens once
    at build time into a cell-partitioned table; each query then reads
    ONLY its probed cells — the scan's PartitionFilters is the index
    lookup, so serving cost is ~n_probe/n_cells of the corpus off
    storage, independent of query count amortization. Results are
    bit-identical to the in-memory sim_topk_ivf (same parameters) —
    pytest-locked along with the partition-pruned plan shape."""
    import os
    import shutil
    import tempfile

    e = load(spark, sf_dir, "embeddings")
    # Session-scoped path: a fixed /tmp name let two concurrent Spark
    # sessions (e.g. pytest + a driver sim on one box) clobber each
    # other's _temporary dirs mid-write. applicationId is unique per
    # session and stable within it.
    path = os.path.join(
        tempfile.gettempdir(),
        f"plc_etl_ivf_index_{spark.sparkContext.applicationId}",
    )
    shutil.rmtree(path, ignore_errors=True)
    S.build_ivf_index(e, path, n_cells=16)
    queries_ = [
        (r["vec_id"], list(r["embedding"]))
        for r in e.filter(
            (F.col("vec_id") < 20) & F.col("embedding").isNotNull()
        ).collect()
    ]
    return S.ivf_ann_topk_indexed(spark, path, queries_, k=5, n_probe=4)


@query("multimodal_phash_clusters", oracle=None)  # engine fingerprint; survivor-election pytest via shared CC operator
def multimodal_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Media near-dup DEDUP end-to-end: perceptual-hash pair generation
    (skew-guarded fingerprint_near_pairs core) → connected components
    (operators/dedup.py — min-label propagation, same operator the text
    dedup clustering uses) → survivor election (smallest media_id per
    cluster). Output: cluster-size histogram plus media kept/dropped
    totals — the report a curation run logs. Deterministic (payloads
    and hashing are deterministic); the shared CC operator's
    correctness is pytest-locked against a recursive-CTE oracle in
    dedup_cluster_survivors."""
    from ..operators import multimodal as MM
    from ..operators.dedup import connected_components

    from ..operators.graph import _register_round_state

    docs = load(spark, sf_dir, "documents")
    media = MM.synthesize_media(docs)
    hashes = MM.phash_media(media)
    raw_pairs = MM.phash_near_dup_pairs(hashes, max_hamming=3)
    # keep the operator's round state across the rename (derived frames
    # drop Python-side attributes); CC chains it for the finalize release
    pairs = _register_round_state(
        raw_pairs.select(
            F.col("media_a").alias("id_a"), F.col("media_b").alias("id_b")
        ),
        *getattr(raw_pairs, "_round_state", ()),
    )
    cc = connected_components(pairs)
    sizes = cc.groupBy("cluster_id").agg(F.count("*").alias("sz"))
    hist = sizes.groupBy("sz").agg(
        F.count("*").cast("bigint").alias("n_clusters")
    )
    n_total = media.count()
    # One action materializes the CC and the histogram; the clustered /
    # survivor totals are EXACT sums over the (tiny) histogram rows —
    # Σ sz·n and Σ n — so the old cc.count() + sizes.count() pair of
    # extra Spark jobs (the second re-running the cluster-size shuffle)
    # is pure arithmetic on the driver (round-8 continuation,
    # guide §5.1: no extra actions for values an existing result
    # already determines). Round state released before return, as the
    # finalize wrapper did (round-5 review).
    from ..operators.graph import release_round_state

    hist_rows = hist.collect()
    n_in_clusters = sum(r["sz"] * r["n_clusters"] for r in hist_rows)
    n_survivors_in_clusters = sum(r["n_clusters"] for r in hist_rows)
    kept = n_total - n_in_clusters + n_survivors_in_clusters
    release_round_state(cc)
    # sz=-1 row carries the kept-media total (same output contract)
    return spark.createDataFrame(
        [(r["sz"], r["n_clusters"]) for r in hist_rows] + [(-1, kept)],
        hist.schema,
    )


@query("text_bpe_encode", oracle=None)  # learned-merge application — closed-form pytest
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SERVE side of the tokenizer loop: train 10 BPE merges on the
    corpus (text_bpe_train), then encode every document with them and
    report per-source token statistics — the tokens-per-doc accounting
    a training-data pipeline bills by. The merge table is the bounded
    driver-held artifact; encoding is one Arrow-batched pass. Exact
    greedy-merge behavior (including OOV fallback and NULL text) is
    pytest-locked on the classic corpus."""
    from ..operators.text import bpe_encode, bpe_train

    docs = load(spark, sf_dir, "documents")
    merges = bpe_train(docs, "text", n_merges=10)
    enc = bpe_encode(docs, merges)
    return enc.groupBy("source").agg(
        F.count("n_bpe_tokens").alias("n_docs"),
        F.sum("n_bpe_tokens").alias("total_tokens"),
        F.min("n_bpe_tokens").alias("min_tokens"),
        F.max("n_bpe_tokens").alias("max_tokens"),
    )


def _collocations_plan(spark: SparkSession, sf_dir: str):
    """Lazy plan for text_collocations_lift: returns (top100, bc) so the
    plan-shape tests can lock the pre-finalize shuffle shape (the
    registered query finalizes to a LocalRelation, which has no plan
    left to audit)."""
    d = fan_out(load(spark, sf_dir, "documents")).select(
        F.split("text", " ").alias("w")
    )
    pairs = d.select(
        F.explode(
            F.expr(
                "CASE WHEN size(w) >= 2 THEN transform("
                "sequence(1, size(w) - 1), i -> "
                "struct(w[i-1] AS w1, w[i] AS w2)) "
                "ELSE array() END"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    from pyspark.sql.window import Window as _W

    bc = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").alias("cb"))
        .localCheckpoint(eager=False)
    )
    tot = bc.agg(F.sum("cb").alias("nb"))
    scored = (
        bc.withColumn("cl", F.sum("cb").over(_W.partitionBy("w1")))
        .withColumn("cr", F.sum("cb").over(_W.partitionBy("w2")))
        .filter(F.col("cb") >= 5)
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("cb").alias("pair_n"),
            (
                F.floor(
                    (F.col("cb").cast("double") * F.col("nb"))
                    / (F.col("cl").cast("double") * F.col("cr"))
                    * 1000000.0
                    + 0.5
                ).cast("double")
                / 1000000.0
            ).alias("lift"),
        )
    )
    return scored.orderBy(F.col("lift").desc(), "w1", "w2").limit(100), bc


@query(
    "text_collocations_lift",
    oracle="""
    WITH toks AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents
    ), pairs AS (
      SELECT w[i] AS w1, w[i + 1] AS w2
      FROM toks, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
      WHERE len(w) >= 2
    ), bc AS (
      SELECT w1, w2, COUNT(*) AS cb FROM pairs GROUP BY w1, w2
    ), lc AS (
      SELECT w1, COUNT(*) AS cl FROM pairs GROUP BY w1
    ), rc AS (
      SELECT w2, COUNT(*) AS cr FROM pairs GROUP BY w2
    ), tot AS (
      SELECT COUNT(*) AS nb FROM pairs
    ), scored AS (
      SELECT b.w1, b.w2, b.cb AS pair_n,
             CAST(FLOOR((CAST(b.cb AS DOUBLE) * nb)
                        / (CAST(cl AS DOUBLE) * cr)
                        * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS lift
      FROM bc b
      JOIN lc USING (w1) JOIN rc USING (w2) CROSS JOIN tot
      WHERE b.cb >= 5
    )
    SELECT w1, w2, CAST(pair_n AS BIGINT) AS pair_n, lift
    FROM scored
    ORDER BY lift DESC, w1, w2 LIMIT 100
    """,
)
def text_collocations_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 bigram collocations by lift — exp(PMI) under the bigram-
    position universe: lift(x,y) = P(x,y) / (P(x as left) * P(y as
    right)) = cb * N / (cl * cr). The corpus-statistics pass behind
    multi-word-expression mining and tokenizer-merge candidates (the
    counting half of BPE generalized to whole words); high-lift pairs
    are phrases, lift ~1 pairs are chance co-occurrences.

    Kept in ratio space (lift = exp(PMI)) rather than log space so the
    score is ONE fixed-shape double expression over exact BIGINT
    counts — no ln(), whose last-ulp differs between libm builds.
    Quantized to 6 digits; the top-100 cut orders by (quantized lift,
    w1, w2) so the boundary is a total order both engines resolve
    identically. Overflow: cb * N < 2^53 holds to ~1e8-pair corpora per
    (cb<=1e5) — beyond that, move to log-space with a documented
    quant.

    Scale shape: the corpus is exploded and pair-counted ONCE (fan_out
    before the explode — same posture as text_bigram_coherence); the
    left/right/total counts are MARGINALS of that pair-count table
    (cl = SUM(cb) over w1, etc.), computed as two stacked windows over
    the vocab-sized counts rather than re-scanning the corpus or
    joining count tables — shuffle-partitioned because a web-scale
    vocabulary outgrows a broadcast. A lazy localCheckpoint keeps the
    window chain and the total from re-running the explode (released
    via release_round_state). The cb >= 5 filter lands after the
    marginals (they must see all pairs) but before the scalar
    cross-join. Top-k is a TakeOrdered, not a global sort. The
    top-100 result is FINALIZED (materialize + release) so the
    vocab-sized checkpoint blocks never outlive the call."""
    from ..operators.graph import _register_round_state, finalize_round_result

    top, bc = _collocations_plan(spark, sf_dir)
    st = _register_round_state(top, bc)
    return finalize_round_result(st, st)
