"""Corpus-curation audit operators: character-class entropy, exact
percentile length trimming, and int8 embedding-quantization QA.

These extend the training-data family (SURVEY.md §8 "Sampling/packing" /
"Text" / "Similarity") with three ops a 100 TB curation pipeline runs
routinely: a cheap gibberish/binary-noise detector, distribution-tail
document trimming, and a compression-loss audit before shipping
quantized embeddings to an ANN index.

Determinism notes (per ``_conv`` conventions): the entropy is a FIXED
four-term expression evaluated in the same written order on both
engines, floor-quantized to 6 digits to absorb last-ulp libm log2
differences; the trim thresholds are pure integer arithmetic; the
quantization audit is exact — every output is either integer math or a
MAX over bit-identical IEEE intermediates (no float summation anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import fan_out, load
from ..operators import text as T
from ..registry import query
from ._conv import hash_u32, quant, sql_hash_u32, sql_quant

# Per-class entropy term: p*log2(p) with the zero-count guard. The four
# terms are summed in one fixed textual order on both engines.
_TERM_SQL = (
    "CASE WHEN {c} > 0 THEN (CAST({c} AS DOUBLE) / CAST(n AS DOUBLE))"
    " * LOG2(CAST({c} AS DOUBLE) / CAST(n AS DOUBLE)) ELSE 0.0 END"
)


def _term(c: F.Column) -> F.Column:
    p = c.cast("double") / F.col("n").cast("double")
    return F.when(c > 0, p * F.log2(p)).otherwise(F.lit(0.0))

# The 4-class entropy sum, shared by text_char_entropy and
# pipeline_web_ingest (engine + oracle sides each defined ONCE).
_ENT4_SQL = "-(" + " + ".join(
    _TERM_SQL.format(c=c)
    for c in ("c_alpha", "c_digit", "c_space", "c_other")
) + ")"


def _char_class_counts(src_col: str) -> list[F.Column]:
    """The three translate()-based char-class counts over ``src_col``
    (c_other = n - sum, derived by the caller).

    c_alpha measures against length(lower(text)), NOT length(text):
    full Unicode lowercasing can CHANGE the length (JVM lower('İ') is
    i + U+0307, two codepoints), and mixing the raw length with a
    translate over the lowered string undercounted letters by the
    expansion delta (round-8 unicode sweep). Both the engine and the
    oracles use the lowered length so the a-z count is measured on one
    consistent string."""
    return [
        (
            F.length(F.lower(F.col(src_col)))
            - F.length(
                F.translate(
                    F.lower(F.col(src_col)), "abcdefghijklmnopqrstuvwxyz", ""
                )
            )
        ).alias("c_alpha"),
        (
            F.length(src_col)
            - F.length(F.translate(src_col, "0123456789", ""))
        ).alias("c_digit"),
        (
            F.length(src_col) - F.length(F.translate(src_col, " ", ""))
        ).alias("c_space"),
    ]


def _ent4() -> F.Column:
    return -(
        _term(F.col("c_alpha"))
        + _term(F.col("c_digit"))
        + _term(F.col("c_space"))
        + _term(F.col("c_other"))
    )




@query(
    "text_char_entropy",
    oracle="""
    WITH c AS (
      SELECT doc_id, LENGTH(text) AS n,
             LENGTH(lower(text)) - LENGTH(regexp_replace(lower(text), '[a-z]', '', 'g')) AS c_alpha,
             LENGTH(text) - LENGTH(regexp_replace(text, '[0-9]', '', 'g')) AS c_digit,
             LENGTH(text) - LENGTH(replace(text, ' ', '')) AS c_space
      FROM documents WHERE LENGTH(text) > 0
    )
    SELECT doc_id, n, c_alpha, c_digit, c_space,
           {ent} AS char_entropy
    FROM (SELECT *, n - c_alpha - c_digit - c_space AS c_other FROM c) t
    """.format(ent=sql_quant(_ENT4_SQL, 6)),
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class entropy (alpha/digit/space/other, base-2): the
    cheap gibberish detector — natural prose sits near ~1.2-1.6 bits,
    base64/binary noise saturates toward 2, single-class runs hit 0.

    Scale posture: four regexp_replace+length expressions per row inside
    whole-stage codegen, one scan, zero shuffles (no aggregation). The
    entropy sum is a fixed 4-term expression — NOT a float aggregation —
    so cross-engine determinism needs only the 6-digit floor quant
    (absorbing last-ulp libm log2 differences).
    """
    d = load(spark, sf_dir, "documents").filter(F.length("text") > 0)
    base = d.select(
        "doc_id",
        F.length("text").alias("n"),
        *_char_class_counts("text"),
    ).withColumn(
        "c_other",
        F.col("n") - F.col("c_alpha") - F.col("c_digit") - F.col("c_space"),
    )
    return base.select(
        "doc_id", "n", "c_alpha", "c_digit", "c_space",
        quant(_ent4(), 6).alias("char_entropy"),
    )


@query(
    "text_length_trim",
    oracle="""
    WITH g AS (SELECT n_chars, COUNT(*) AS c FROM documents GROUP BY n_chars),
         w AS (SELECT n_chars,
                      SUM(c) OVER (ORDER BY n_chars
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS cum
               FROM g),
         t AS (SELECT COUNT(*) AS n FROM documents),
         b AS (SELECT MIN(CASE WHEN cum >= (5 * n + 99) // 100
                               THEN n_chars END) AS lo_cut,
                      MIN(CASE WHEN cum >= (95 * n + 99) // 100
                               THEN n_chars END) AS hi_cut
               FROM w, t)
    SELECT d.doc_id, d.n_chars, d.source, b.lo_cut, b.hi_cut
    FROM documents d, b
    WHERE d.n_chars BETWEEN b.lo_cut AND b.hi_cut
    """,
)
def text_length_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-tail trimming: keep documents inside the exact
    [p5, p95] band of the corpus length distribution (ceil-rank
    definition), the standard too-short/too-long curation cut.

    Scale posture: the percentile does NOT sort the corpus — lengths
    first collapse to a per-value count (partial agg over a small value
    domain), the cumulative rank runs over that tiny table (single
    in-memory window), and the two cut points broadcast back as a 1-row
    scalar. All threshold math is integer (ceil via (k*n+99) div 100) —
    no float percentile ambiguity between engines.
    """
    d = load(spark, sf_dir, "documents")
    g = d.groupBy("n_chars").agg(F.count("*").alias("c"))
    w = g.withColumn(
        "cum",
        F.sum("c").over(
            Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    tot = d.agg(F.count("*").alias("n"))
    b = (
        w.crossJoin(F.broadcast(tot))
        .agg(
            F.min(
                F.when(
                    F.col("cum") >= F.expr("(5 * n + 99) div 100"), F.col("n_chars")
                )
            ).alias("lo_cut"),
            F.min(
                F.when(
                    F.col("cum") >= F.expr("(95 * n + 99) div 100"), F.col("n_chars")
                )
            ).alias("hi_cut"),
        )
    )
    return (
        d.crossJoin(F.broadcast(b))
        .filter(F.col("n_chars").between(F.col("lo_cut"), F.col("hi_cut")))
        .select("doc_id", "n_chars", "source", "lo_cut", "hi_cut")
    )


@query(
    "emb_quantize_int8",
    oracle="""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS xd
      FROM embeddings
    ),
    s AS (
      SELECT vec_id, xd,
             list_max(list_transform(xd, y -> abs(y))) / 127.0 AS scale
      FROM e
      WHERE list_max(list_transform(xd, y -> abs(y))) > 0
    ),
    r AS (SELECT vec_id, scale, unnest(xd) AS x FROM s),
    q AS (SELECT vec_id, scale, x,
                 CAST(FLOOR(x / scale + 0.5) AS BIGINT) AS qv
          FROM r)
    SELECT vec_id, scale,
           MAX(abs(CAST(qv AS DOUBLE) * scale - x)) AS max_abs_err,
           CAST(SUM(qv) AS BIGINT) AS q_sum,
           CAST(SUM(CASE WHEN abs(qv) = 127 THEN 1 ELSE 0 END) AS INT)
             AS n_saturated
    FROM q GROUP BY vec_id, scale
    """,
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 symmetric quantization audit: per-vector scale = max|x|/127,
    round-half-up codes, and the reconstruction-error report a pipeline
    checks before swapping an ANN index to quantized storage.

    Exactness: scale is one IEEE division; codes are floor(x/scale+0.5)
    (identical in both engines — no ROUND tie ambiguity); max_abs_err is
    a MAX over bit-identical products (never a float sum); q_sum is
    integer. So the whole audit hash-matches DuckDB with NO rounding.

    Scale posture: pure JVM higher-order functions over the embedding
    array — one scan, no explode, no shuffle, no Python. The oracle
    unnests instead (exact aggregates make the two shapes equivalent).
    """
    e = load(spark, sf_dir, "embeddings")
    xd = F.transform("embedding", lambda x: x.cast("double"))
    base = e.select("vec_id", xd.alias("xd")).withColumn(
        "maxabs", F.array_max(F.transform("xd", F.abs))
    ).filter(F.col("maxabs") > 0)
    scaled = base.withColumn("scale", F.col("maxabs") / 127.0).withColumn(
        "qv",
        F.transform(
            "xd", lambda x: F.floor(x / F.col("scale") + 0.5).cast("bigint")
        ),
    )
    return scaled.select(
        "vec_id",
        "scale",
        F.array_max(
            F.zip_with(
                "xd", "qv", lambda x, q: F.abs(q.cast("double") * F.col("scale") - x)
            )
        ).alias("max_abs_err"),
        F.aggregate(
            "qv", F.lit(0).cast("bigint"), lambda acc, v: acc + v
        ).alias("q_sum"),
        F.size(F.filter("qv", lambda v: F.abs(v) == 127)).alias("n_saturated"),
    )


@query(
    "sample_quality_bins",
    oracle="""
    WITH t AS (SELECT COUNT(*) AS n FROM documents),
         r AS (SELECT doc_id, n_chars, text,
                      ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) AS rnk
               FROM documents)
    SELECT r.doc_id, r.n_chars,
           CAST((r.rnk - 1) * 10 // t.n + 1 AS INT) AS decile,
           strpos('0123456789abcdef', substr(md5(r.text), 1, 1)) - 1
             AS bucket16
    FROM r, t
    WHERE strpos('0123456789abcdef', substr(md5(r.text), 1, 1)) - 1
          < (r.rnk - 1) * 10 // t.n + 1
    """,
)
def sample_quality_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-stratified sampling (curriculum-style): rank documents by
    a quality proxy (length, with doc_id tiebreak), split into exact
    deciles, and keep decile d at rate d/16 via the content-keyed md5
    bucket — low-quality tails are downsampled hard, top deciles kept
    at the highest rate. Deterministic end to end (no rand()).

    Scale posture: the global rank does NOT globally sort the corpus —
    per-length counts collapse first (partial agg over a small value
    domain), a tiny cumulative table broadcasts back, and the
    within-length row_number window is PARTITIONED by length. The
    decile formula floor((rank-1)*10/n)+1 is pure integer math, so both
    engines agree exactly; the oracle can afford its plain global
    window at test SF.
    """
    from ..operators.text import hash_bucket16

    d = load(spark, sf_dir, "documents").select("doc_id", "n_chars", "text")
    g = d.groupBy("n_chars").agg(F.count("*").alias("c"))
    cum = g.withColumn(
        "cum_before",
        F.coalesce(
            F.sum("c").over(
                Window.orderBy("n_chars").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("n_chars", "cum_before")
    tot = d.agg(F.count("*").alias("n"))
    wn = Window.partitionBy("n_chars").orderBy("doc_id")
    ranked = (
        d.join(F.broadcast(cum), "n_chars")
        .crossJoin(F.broadcast(tot))
        .withColumn("rnk", F.col("cum_before") + F.row_number().over(wn))
        .withColumn(
            "decile", F.expr("((rnk - 1) * 10) div n + 1").cast("int")
        )
        .withColumn("bucket16", hash_bucket16("text"))
    )
    return ranked.filter(F.col("bucket16") < F.col("decile")).select(
        "doc_id", "n_chars", "decile", "bucket16"
    )


@query(
    "sample_dsir_weights",
    oracle="""
    WITH w AS (
      SELECT doc_id,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_t,
             unnest(string_split(text, ' ')) AS word
      FROM documents WHERE text IS NOT NULL
    ),
    v AS (SELECT word, COUNT(*) AS c_raw, SUM(is_t) AS c_t
          FROM w GROUP BY word),
    tot AS (SELECT CAST(SUM(c_raw) AS DOUBLE) AS r_tot,
                   CAST(SUM(c_t) AS DOUBLE) AS t_tot,
                   CAST(COUNT(*) AS DOUBLE) AS v_size
            FROM v),
    score AS (
      SELECT w.doc_id, COUNT(*) AS n_words,
             -- + 0.0 normalizes IEEE negative zero (the engines round a
             -- tiny negative mean to -0.0 vs 0.0 inconsistently);
             -- floor-quant instead of ROUND: same IEEE ops as Spark's
             -- quant(), immune to shortest-repr half-up ties
             {qratio} + 0.0 AS avg_log_ratio
      FROM w JOIN v USING (word), tot
      GROUP BY w.doc_id
    )
    SELECT doc_id, n_words, avg_log_ratio,
           avg_log_ratio > 0 AS selected
    FROM score
    """.format(
        qratio=sql_quant(
            "AVG(LN(CAST(v.c_t + 1 AS DOUBLE) / (t_tot + v_size))"
            " - LN(CAST(v.c_raw + 1 AS DOUBLE) / (r_tot + v_size)))",
            4,
        )
    ),
)
def sample_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling", arXiv:2302.03169): score
    every raw document by how much more likely its words are under the
    TARGET distribution (here the lang='en' slice) than under the raw
    pool — avg over words of ln p_target(w) - ln p_raw(w), both
    add-1-smoothed unigram MLEs. The paper then Gumbel-resamples by
    these weights; the deterministic analogue exported here is the
    weight itself plus a selected = weight > 0 flag ("looks more
    target-like than pool-like"), so the selection set is reproducible
    and oracle-checkable.

    Scale shape: ONE exploded scan produces both distributions (the
    target count is a conditional sum in the same groupBy — no second
    pass over the corpus); the grand totals are a one-row broadcast; the
    word->counts lookup is a shuffle join on word (a web-scale vocab
    outgrows a broadcast); the per-doc mean is the final keyed agg.
    Round-4 absorbs cross-engine summation order, as in
    text_unigram_logprob."""
    d = fan_out(load(spark, sf_dir, "documents")).filter(
        F.col("text").isNotNull()
    )
    w = d.select(
        "doc_id",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("is_t"),
        F.explode(F.split("text", " ")).alias("word"),
    )
    v = w.groupBy("word").agg(
        F.count("*").alias("c_raw"), F.sum("is_t").alias("c_t")
    )
    tot = v.agg(
        F.sum("c_raw").cast("double").alias("r_tot"),
        F.sum("c_t").cast("double").alias("t_tot"),
        F.count("*").cast("double").alias("v_size"),
    )
    ratio = F.log(
        (F.col("c_t") + 1).cast("double") / (F.col("t_tot") + F.col("v_size"))
    ) - F.log(
        (F.col("c_raw") + 1).cast("double") / (F.col("r_tot") + F.col("v_size"))
    )
    return (
        w.join(v, "word")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            # + 0.0 normalizes IEEE negative zero (see oracle comment).
            # quant(), not ROUND: Spark rounds the shortest-repr decimal
            # HALF_UP while DuckDB rounds the binary value, so a
            # log-ratio landing on a .xxxx5 shortest-repr tie could
            # flake the oracle hash (round-4 advice).
            (quant(F.avg(ratio), 4) + F.lit(0.0)).alias("avg_log_ratio"),
        )
        .withColumn("selected", F.col("avg_log_ratio") > 0)
    )


@query(
    "pack_shard_manifest",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             doc_id // 64 AS shard_id,
             coalesce(text, '') AS t,
             CASE WHEN text IS NULL THEN 0
                  ELSE len(string_split(text, ' ')) END AS n_tok
      FROM documents
    )
    SELECT shard_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(length(t)) AS BIGINT) AS n_chars,
           MIN(doc_id) AS first_doc_id,
           MAX(doc_id) AS last_doc_id,
           md5(string_agg(md5(t), '' ORDER BY md5(t))) AS shard_digest
    FROM d GROUP BY shard_id
    """,
)
def pack_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard manifest: assign every document to a fixed-size
    shard (64 docs at fixture scale; thousands in production),
    contiguous on the monotone ingest key for sequential read locality
    (the WebDataset / tar-shard layout, Aizman et al. 2019,
    arXiv:2001.01858), and emit the per-shard
    manifest a trainer needs for resumable, verifiable epochs: doc and
    token and char counts, the id range, and a content digest. The
    digest is md5 over the SORTED per-doc md5s — order-insensitive, so
    any engine (or a re-run with different parallelism) producing the
    same document set produces the same digest; that is the integrity
    check a 100 TB shard store runs before shipping shards to trainers.

    Scale shape: one scan, one keyed shuffle on shard_id; every stat
    except the digest is map-side combinable, and the digest's
    collect_list is bounded by the shard size (shard_docs x 32 bytes). For
    non-dense ingest keys swap the range assignment for
    pmod(xxhash64(key), n_shards) — same plan, hash instead of range;
    the range form is used here because it is cross-engine exact.
    NULL-text documents count as zero-token members with the digest of
    the empty string, so the manifest still accounts for every row."""
    d = load(spark, sf_dir, "documents")
    t = F.coalesce(F.col("text"), F.lit(""))
    n_tok = (
        F.when(F.col("text").isNull(), F.lit(0))
        .otherwise(F.size(F.split("text", " ")))
    )
    return (
        d.select(
            "doc_id",
            F.expr("doc_id div 64").alias("shard_id"),
            t.alias("t"),
            n_tok.alias("n_tok"),
        )
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.sum(F.length("t")).cast("bigint").alias("n_chars"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
            F.md5(
                F.array_join(F.array_sort(F.collect_list(F.md5("t"))), "")
            ).alias("shard_digest"),
        )
    )



@query(
    "pipeline_web_ingest",
    oracle="""
    WITH h AS (
      SELECT doc_id, text AS source_text, {synth} AS html
      FROM documents
    ),
    x AS (
      SELECT doc_id,
             trim(regexp_replace(source_text, '[ \t\n\r]+', ' ', 'g'))
               AS norm_src,
             {extract} AS main FROM h
    ),
    c AS (
      SELECT doc_id, main,
             COALESCE(main = norm_src, FALSE) AS keep_extract,
             COALESCE(LENGTH(main), 0) AS n,
             LENGTH(lower(main)) - LENGTH(regexp_replace(lower(main), '[a-z]', '', 'g')) AS c_alpha,
             LENGTH(main) - LENGTH(regexp_replace(main, '[0-9]', '', 'g')) AS c_digit,
             LENGTH(main) - LENGTH(replace(main, ' ', '')) AS c_space
      FROM x
    ),
    e AS (
      SELECT doc_id, main, keep_extract, n,
             CASE WHEN n >= 16 THEN {ent} >= 0.3 ELSE FALSE END AS keep_entropy
      FROM (SELECT *, n - c_alpha - c_digit - c_space AS c_other FROM c) t
    ),
    s AS (
      SELECT doc_id, keep_extract, keep_entropy, CAST(n AS BIGINT) AS n_chars,
             main IS NOT NULL
               AND doc_id = MIN(doc_id) OVER (PARTITION BY main)
               AS is_survivor
      FROM e
    )
    SELECT doc_id, n_chars, keep_extract, keep_entropy, is_survivor,
           (keep_extract AND keep_entropy AND is_survivor) AS admit
    FROM s
    """.format(
        synth=T.sql_synthesize_html(),
        extract=T.sql_html_main_content("html"),
        ent=sql_quant(_ENT4_SQL, 6),
    ),
)
def pipeline_web_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed WEB-INGEST flagship — what a crawled-corpus pipeline
    runs per snapshot, as ONE declarative auditable plan over the
    synthesized pages: MAIN-CONTENT extraction (script/style subtree
    drop, first content <p>, entity decode — the readability-shaped
    step; page chrome is excluded, see html_main_content for why gating
    on the full body would be vacuous) -> extraction audit (main
    content equals the whitespace-normalized source) -> char-class
    entropy gibberish gate (>= 0.3 bits: single-class runs score ~0,
    pure alpha+space prose ~0.6) ON THE EXTRACTED CONTENT with a 16-char
    too-short-to-judge floor -> corpus exact-dedup survivor election on
    the content (NULL content is never a survivor) -> final admit bit,
    with every stage's verdict in the output row (a user audits WHY a
    page was rejected — the pipeline_corpus_curation contract, upstream
    of it in a real deployment).

    Scale shape: extraction + entropy are ONE narrow codegen'd
    projection (zero shuffles); the only exchange is the survivor
    window on the content; verdict assembly rides the same row, no
    joins at all — strictly cheaper than curation's three-pass join
    shape. NULL-text documents flow through (NULL content -> every
    gate false), so the manifest accounts for every crawled page."""
    d = fan_out(load(spark, sf_dir, "documents"))
    x = T.synthesize_html(d).select(
        "doc_id",
        F.trim(
            F.regexp_replace("source_text", "[ \t\n\r]+", " ")
        ).alias("norm_src"),
        T.html_main_content(F.col("html")).alias("main"),
    )
    c = x.select(
        "doc_id",
        "main",
        F.coalesce(F.col("main") == F.col("norm_src"), F.lit(False)).alias(
            "keep_extract"
        ),
        F.coalesce(F.length("main"), F.lit(0)).alias("n"),
        *_char_class_counts("main"),
    ).withColumn(
        "c_other",
        F.col("n") - F.col("c_alpha") - F.col("c_digit") - F.col("c_space"),
    )
    e = c.select(
        "doc_id",
        "main",
        "keep_extract",
        "n",
        F.when(F.col("n") >= 16, quant(_ent4(), 6) >= 0.3)
        .otherwise(F.lit(False))
        .alias("keep_entropy"),
    )
    s = e.select(
        "doc_id",
        "keep_extract",
        "keep_entropy",
        F.col("n").cast("bigint").alias("n_chars"),
        (
            F.col("main").isNotNull()
            & (
                F.col("doc_id")
                == F.min("doc_id").over(Window.partitionBy("main"))
            )
        ).alias("is_survivor"),
    )
    return s.select(
        "doc_id",
        "n_chars",
        "keep_extract",
        "keep_entropy",
        "is_survivor",
        (
            F.col("keep_extract")
            & F.col("keep_entropy")
            & F.col("is_survivor")
        ).alias("admit"),
    )


@query(
    "sample_weighted_topk",
    oracle="""
    WITH b AS (
      SELECT doc_id, n_chars,
             {u32} AS u32
      FROM documents
      WHERE text IS NOT NULL AND n_chars > 0
    ),
    k AS (
      SELECT doc_id, n_chars,
             {key} AS es_key
      FROM b
    )
    SELECT doc_id, n_chars, es_key
    FROM k ORDER BY es_key DESC, doc_id LIMIT 100
    """.format(
        u32=sql_hash_u32("text || chr(31) || CAST(doc_id AS VARCHAR)"),
        key=sql_quant(
            "LN((CAST(u32 AS DOUBLE) + 1.0) / 4294967296.0)"
            " / CAST(n_chars AS DOUBLE)",
            6,
        )
    ),
)
def sample_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed weighted sampling WITHOUT replacement via the
    Efraimidis-Spirakis exponential-key trick (Efraimidis & Spirakis
    2006, IPL 97(5)): each row draws key = ln(u)/w for u ~ U(0,1] and
    weight w, and the k LARGEST keys are exactly a weighted sample
    without replacement — the one-pass, merge-friendly form of weighted
    reservoir sampling (weights here: n_chars, longer docs
    proportionally likelier). u is hash-derived (md5 of content +
    doc_id — the id salt keeps duplicate texts independent), NOT
    rand(): deterministic across runs, engines, and partitionings —
    which is what makes a sampling operator oracle-checkable at all.

    Scale shape: one narrow projection computes the key, then a global
    top-k — TakeOrderedAndProject (per-partition heaps + driver merge
    of k rows), never a global sort; the same operator at 100 TB holds
    k rows per task. Keys are 6-digit floor-quantized with doc_id
    tie-break, the repo's standard cross-engine double convention."""
    d = load(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.col("n_chars") > 0)
    )
    # Uniform per ROW, not per text: hashing content alone would give
    # every copy of a duplicated document the same key (breaking the
    # ES independence assumption on dup-heavy corpora — up to k copies
    # of ONE text "sampled"); salting with doc_id restores per-row
    # independence while staying deterministic and oracle-checkable.
    u32 = hash_u32(
        F.concat_ws("\x1f", F.col("text"), F.col("doc_id").cast("string"))
    )
    u = (u32.cast("double") + 1.0) / 4294967296.0
    key = quant(F.log(u) / F.col("n_chars").cast("double"), 6)
    return (
        d.select("doc_id", "n_chars", key.alias("es_key"))
        .orderBy(F.col("es_key").desc(), "doc_id")
        .limit(100)
    )


@query(
    "sample_domain_cap",
    oracle="""
    WITH r AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY md5(text), doc_id) AS pick_rank
      FROM documents
      WHERE text IS NOT NULL
    )
    SELECT doc_id, source, CAST(pick_rank AS BIGINT) AS pick_rank
    FROM r WHERE pick_rank <= 10
    """,
)
def sample_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap: keep at most 10 documents per source,
    picked by a deterministic content-hash order — the C4/Gopher-style
    per-host cap that stops a single crawled domain from dominating the
    training mixture. Ordering by (md5(text), doc_id) instead of
    rand() makes the SAMPLE itself reproducible across runs, engines,
    and partitionings (the property every other sampler in this module
    shares), and uncorrelated with crawl order or document length.

    Scale shape: the rank<=K predicate compiles to WindowGroupLimit
    (plan-locked) — each map task keeps a K-row heap per source BEFORE
    the shuffle, so the exchange moves at most K rows per (task,
    domain), not the corpus; there is exactly one shuffle (on source)
    and no global sort. At 100 TB with millions of domains this is the
    difference between a bounded per-task state and sorting the crawl.

    NULL texts are excluded on both engines up front: Spark sorts NULLs
    FIRST ascending while DuckDB sorts them LAST, so any NULL reaching
    the ORDER BY would silently skew which rows get capped."""
    d = load(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    w = Window.partitionBy("source").orderBy(F.md5("text"), "doc_id")
    return (
        d.select(
            "doc_id",
            "source",
            F.row_number().over(w).cast("bigint").alias("pick_rank"),
        )
        .filter(F.col("pick_rank") <= 10)
    )


@query(
    "text_url_canonicalize",
    oracle="""
    WITH raw AS (
      SELECT doc_id,
             CASE CAST(doc_id % 4 AS INT)
               WHEN 0 THEN 'https://WWW.' || source || '.Example.COM:443'
                 || '/articles/' || doc_id
                 || '?utm_source=feed&id=' || doc_id
                 || '&utm_campaign=x#section2'
               WHEN 1 THEN 'http://' || source || '.example.com:80/post/'
                 || doc_id
               WHEN 2 THEN 'https://cdn.' || source
                 || '.example.com/asset/' || doc_id
                 || '?v=1&utm_medium=email'
               ELSE 'http://' || source || '.Example.com:8080/p/'
                 || doc_id || '?q=a+b&ref=2'
             END AS url
      FROM documents
    ), parts AS (
      SELECT doc_id, url,
             LOWER(regexp_extract(url, '^([a-zA-Z]+)://', 1)) AS scheme,
             regexp_extract(url, '^[a-zA-Z]+://([^/?#]+)', 1) AS hostport,
             regexp_extract(url, '^[a-zA-Z]+://[^/?#]+([^?#]*)', 1) AS path,
             NULLIF(regexp_extract(url, '\\?([^#]*)', 1), '') AS query
      FROM raw
    ), norm AS (
      SELECT doc_id, url, scheme, path, query,
             regexp_replace(LOWER(regexp_replace(hostport, ':[0-9]+$', '')),
                            '^www\\.', '') AS host,
             regexp_extract(hostport, ':([0-9]+)$', 1) AS port,
             CASE WHEN query IS NULL THEN NULL
                  ELSE array_to_string(
                    list_filter(string_split(query, '&'),
                                p -> NOT starts_with(p, 'utm_')), '&')
             END AS kept
      FROM parts
    )
    SELECT doc_id, url,
           scheme || '://' || host
             || CASE WHEN port = '' OR (scheme = 'https' AND port = '443')
                       OR (scheme = 'http' AND port = '80')
                     THEN '' ELSE ':' || port END
             || path
             || CASE WHEN kept IS NULL OR kept = '' THEN ''
                     ELSE '?' || kept END AS canonical_url,
           host,
           CASE WHEN query IS NULL THEN 0
                ELSE len(string_split(query, '&'))
                     - len(list_filter(string_split(query, '&'),
                                       p -> NOT starts_with(p, 'utm_')))
           END AS n_params_dropped
    FROM norm
    """,
)
def text_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization — the first dedup key of every web-crawl
    pipeline (the same page is crawled as http/https, with/without
    www., default ports, tracking params, and fragments): lowercase
    scheme+host, strip a leading www., strip default ports (443/https,
    80/http), drop utm_* tracking params (preserving the order of the
    rest), drop the fragment. URLs are synthesized deterministically
    from (doc_id, source) — four variants covering every rule — since
    the fixture corpus carries no URL column; the CANONICALIZATION
    chain is the operator under test, exercised through Spark's native
    parse_url (PATH/QUERY parts) + JVM regex/HOF filters, all
    whole-stage-codegen, zero shuffles, and value-checked against an
    independent pure-regex DuckDB implementation."""
    d = load(spark, sf_dir, "documents")
    url = F.expr(
        "CASE CAST(doc_id % 4 AS INT) "
        "WHEN 0 THEN concat('https://WWW.', source, '.Example.COM:443',"
        " '/articles/', doc_id, '?utm_source=feed&id=', doc_id,"
        " '&utm_campaign=x#section2') "
        "WHEN 1 THEN concat('http://', source, '.example.com:80/post/',"
        " doc_id) "
        "WHEN 2 THEN concat('https://cdn.', source, '.example.com/asset/',"
        " doc_id, '?v=1&utm_medium=email') "
        "ELSE concat('http://', source, '.Example.com:8080/p/', doc_id,"
        " '?q=a+b&ref=2') END"
    )
    base = d.select("doc_id", url.alias("url"))
    scheme = F.lower(F.regexp_extract("url", r"^([a-zA-Z]+)://", 1))
    hostport = F.regexp_extract("url", r"^[a-zA-Z]+://([^/?#]+)", 1)
    parts = base.select(
        "doc_id",
        "url",
        scheme.alias("scheme"),
        F.regexp_replace(
            F.lower(F.regexp_replace(hostport, r":[0-9]+$", "")),
            r"^www\.",
            "",
        ).alias("host"),
        F.regexp_extract(hostport, r":([0-9]+)$", 1).alias("port"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
    )
    kept = F.when(
        F.col("query").isNull(), F.lit(None).cast("string")
    ).otherwise(
        F.array_join(
            F.filter(
                F.split("query", "&"), lambda p: ~p.startswith("utm_")
            ),
            "&",
        )
    )
    portpart = F.when(
        (F.col("port") == "")
        | ((F.col("scheme") == "https") & (F.col("port") == "443"))
        | ((F.col("scheme") == "http") & (F.col("port") == "80")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), F.col("port")))
    n_dropped = F.when(F.col("query").isNull(), F.lit(0)).otherwise(
        F.size(F.split("query", "&"))
        - F.size(
            F.filter(F.split("query", "&"), lambda p: ~p.startswith("utm_"))
        )
    )
    return parts.withColumn("kept", kept).select(
        "doc_id",
        "url",
        F.concat(
            F.col("scheme"),
            F.lit("://"),
            F.col("host"),
            portpart,
            F.col("path"),
            F.when(
                F.col("kept").isNull() | (F.col("kept") == ""), F.lit("")
            ).otherwise(F.concat(F.lit("?"), F.col("kept"))),
        ).alias("canonical_url"),
        "host",
        n_dropped.alias("n_params_dropped"),
    )


@query(
    "curation_pareto_frontier",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang,
             n_chars AS len_score,
             CAST(len(list_distinct(string_split(text, ' '))) * 1000000
                  // GREATEST(len(string_split(text, ' ')), 1)
                  AS BIGINT) AS diversity_ppm
      FROM documents
    ), flagged AS (
      SELECT doc_id, lang, len_score, diversity_ppm,
             COALESCE(MAX(diversity_ppm) OVER (
               PARTITION BY lang ORDER BY len_score DESC
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), -1) AS best_above,
             MAX(diversity_ppm) OVER (PARTITION BY lang, len_score)
               AS best_same
      FROM scored
    )
    SELECT lang, doc_id, len_score, diversity_ppm
    FROM flagged
    WHERE best_above < diversity_ppm AND best_same <= diversity_ppm
    """,
)
def curation_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto frontier (2-D skyline) of the corpus per language:
    documents not dominated in (length, lexical diversity) — the
    multi-objective curation cut ("as long as possible AND as diverse
    as possible") where any scalar mix of the two scores loses the
    trade-off information. A doc is dominated iff another doc of the
    same language is >= on both objectives and > on one.

    Skyline via the sorted-running-max trick, not an O(n^2) self-join:
    within each language, order by length DESC; a doc survives iff no
    strictly-longer doc reaches its diversity (running MAX over the
    RANGE frame ending 1 PRECEDING — integer scores make 'strictly
    longer' exactly '>= len+1') and no same-length doc strictly beats
    it (MAX over the (lang, len) partition). Both passes are windows
    over ONE language-keyed exchange; all scores are exact integers
    (diversity in ppm via integer division), so both engines agree
    bitwise. The skyline operator is DISTRIBUTIVE — skyline(A u B) =
    skyline(skyline(A) u skyline(B)) — so at 100 TB the same two
    windows run per partition first and once more over the (tiny)
    per-partition frontiers; here language partitions already bound
    the window, no global sort anywhere."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.col("n_chars").alias("len_score"),
        (
            F.size(F.array_distinct(F.split("text", " ")))
            .cast("long")
            * 1000000
        ).alias("_dw"),
        F.greatest(
            F.size(F.split("text", " ")).cast("long"), F.lit(1).cast("long")
        ).alias("_nw"),
    )
    scored = d.select(
        "doc_id",
        "lang",
        "len_score",
        F.expr("_dw DIV _nw").alias("diversity_ppm"),
    )
    w_above = (
        Window.partitionBy("lang")
        .orderBy(F.col("len_score").desc())
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_same = Window.partitionBy("lang", "len_score")
    flagged = scored.select(
        "lang",
        "doc_id",
        "len_score",
        "diversity_ppm",
        F.coalesce(
            F.max("diversity_ppm").over(w_above), F.lit(-1).cast("long")
        ).alias("best_above"),
        F.max("diversity_ppm").over(w_same).alias("best_same"),
    )
    return flagged.filter(
        (F.col("best_above") < F.col("diversity_ppm"))
        & (F.col("best_same") <= F.col("diversity_ppm"))
    ).select("lang", "doc_id", "len_score", "diversity_ppm")


@query(
    "curation_survivor_quality",
    oracle="""
    WITH RECURSIVE d AS (
      SELECT doc_id, text, LENGTH(text) AS n_chars
      FROM documents WHERE doc_id < 150 AND text IS NOT NULL
    ), sh AS (
      SELECT doc_id,
             list_distinct([text[i:i+4] FOR i IN range(1, GREATEST(LENGTH(text) - 4, 0) + 1)]) AS grams
      FROM d
    ), dup_pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
            / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.35
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM dup_pairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM dup_pairs
    ), reach(node, root) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node
    ), cc AS (
      SELECT node, MIN(root) AS cluster_id FROM reach GROUP BY node
    ), clustered AS (
      SELECT d.doc_id, COALESCE(cc.cluster_id, d.doc_id) AS cluster_id,
             CAST(d.n_chars AS BIGINT) AS n_chars
      FROM d LEFT JOIN cc ON cc.node = d.doc_id
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY cluster_id
               ORDER BY n_chars DESC, doc_id) AS rn
      FROM clustered
    )
    SELECT doc_id, cluster_id, n_chars, rn = 1 AS is_survivor
    FROM ranked
    """,
)
def curation_survivor_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUALITY-AWARE dedup survivor election: near-dup clusters (5-gram
    Jaccard >= 0.35 over a bounded id range, connected components via
    min-label propagation) keep their HIGHEST-QUALITY member — longest
    text, doc_id tiebreak — instead of dedup_cluster_survivors' keep-
    first (min id). This is what production corpus dedup actually does
    (near-dup groups usually contain one full document and several
    truncated/boilerplate-wrapped copies; keep-first throws away the
    full one roughly half the time). The oracle re-derives clusters
    with the recursive reachability closure and elects survivors with
    the identical window. One window over the cluster key on top of
    the CC output; clusters are small by construction so the election
    adds no shuffle beyond the cluster-key exchange. Bounded result:
    materialized eagerly, CC checkpoint state released before return."""
    from ..operators.dedup import connected_components
    from ..operators.graph import finalize_round_result
    from .extensions import _char_shingles

    d = (
        load(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 150) & F.col("text").isNotNull())
        .select("doc_id", "text", F.length("text").cast("bigint").alias("n_chars"))
    )
    sh = d.select("doc_id", _char_shingles().alias("grams"))
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("grams").alias("ga"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("grams").alias("gb"))
    inter = F.size(F.array_intersect("ga", "gb")).cast("double")
    union = F.size(F.array_union("ga", "gb"))
    pairs = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .where(F.try_divide(inter, union.cast("double")) >= 0.35)
        .select("id_a", "id_b")
    )
    cc = connected_components(pairs)
    clustered = d.join(cc, d["doc_id"] == cc["node"], "left").select(
        d["doc_id"],
        F.coalesce(cc["cluster_id"], d["doc_id"]).alias("cluster_id"),
        "n_chars",
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    out = clustered.withColumn("rn", F.row_number().over(w)).select(
        "doc_id", "cluster_id", "n_chars", (F.col("rn") == 1).alias("is_survivor")
    )
    return finalize_round_result(out, cc)


# UniMax budget waterfilling (Chung et al. 2023, "UniMax: Fairer and
# More Effective Language Sampling for Large-Scale Multilingual
# Pretraining", arXiv:2304.09151): allocate a token budget B across
# languages, capping every language at MAX_EPOCHS passes over its data
# and redistributing the freed budget to the remaining languages — the
# unique allocation is min(cap_d, L) where the water level L solves
# sum_d min(cap_d, L) = B. Closed form via one ordered scan: sort by
# cap ascending; at position i the candidate level is
# (B - prefix_{i-1}) / (k - i + 1) (languages 1..i-1 fully capped,
# remainder split evenly); the first position whose own cap reaches its
# candidate level yields L.
_UNIMAX_EPOCHS = 4  # UniMax's recommended repetition ceiling
_UNIMAX_BUDGET_X = 3  # train budget = 3x the corpus (exercises the cap)


@query(
    "sample_unimax_budget",
    oracle=f"""
    WITH by_lang AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS tokens
      FROM documents
      WHERE text IS NOT NULL AND lang IS NOT NULL AND n_chars IS NOT NULL
      GROUP BY lang
      HAVING SUM(n_chars) > 0
    ), tot AS (
      SELECT CAST(SUM(tokens) AS BIGINT) AS t, COUNT(*) AS k FROM by_lang
    ), ranked AS (
      SELECT lang, n_docs, tokens,
             {_UNIMAX_EPOCHS} * tokens AS cap,
             {_UNIMAX_BUDGET_X} * t AS b, k,
             ROW_NUMBER() OVER (ORDER BY {_UNIMAX_EPOCHS} * tokens, lang)
               AS i,
             COALESCE(SUM({_UNIMAX_EPOCHS} * tokens) OVER (
                 ORDER BY {_UNIMAX_EPOCHS} * tokens, lang
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS prefix_prev
      FROM by_lang, tot
    ), lv AS (
      SELECT ARG_MIN(CAST(b - prefix_prev AS DOUBLE) / (k - i + 1), i)
               AS lvl
      FROM ranked
      WHERE CAST(cap AS DOUBLE)
              >= CAST(b - prefix_prev AS DOUBLE) / (k - i + 1)
    ), alloc AS (
      SELECT ranked.*,
             LEAST(CAST(cap AS DOUBLE),
                   COALESCE(lvl, CAST('Infinity' AS DOUBLE))) AS a,
             COALESCE(lvl, CAST('Infinity' AS DOUBLE)) AS level
      FROM ranked, lv
    )
    SELECT lang, n_docs, tokens,
           {sql_quant("a", 2)} AS alloc_tokens,
           {sql_quant("a / CAST(tokens AS DOUBLE)", 4)} AS epochs,
           {sql_quant("a / CAST(b AS DOUBLE)", 4)} AS budget_share,
           CAST(cap AS DOUBLE) <= level AS capped
    FROM alloc
    """,
)
def sample_unimax_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax language-budget waterfilling (see comment above): per-
    language token allocation for a 3x-corpus training budget with a
    hard 4-epoch repetition cap.
    On the fixture the cap binds for every tail language and the head
    language absorbs the freed budget at ~1.7 epochs — exactly the
    paper's behavior (uniform-ish epochs for the tail, budget overflow
    to the head).

    Scale shape: ONE corpus aggregation to (lang, tokens) — everything
    after runs on the language roster (dozens to hundreds of rows), so
    the global-ordered window, the 1-row totals crossJoin and the
    water-level min_by are all roster-sized; the corpus is scanned
    once with the aggregate pushed map-side. Determinism: caps and
    prefixes are exact BIGINT; the only doubles are the level/alloc
    divisions, evaluated in identical textual order on both engines
    and floor-quantized per _conv conventions."""
    d = load(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
        & F.col("lang").isNotNull()
        & F.col("n_chars").isNotNull()
    )
    # tokens > 0: a zero-token language would divide 0/0 into NaN epochs
    # on both engines (round-8 review; it can receive no budget anyway)
    by_lang = d.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("tokens"),
    ).filter(F.col("tokens") > 0)
    tot = by_lang.agg(
        F.sum("tokens").cast("bigint").alias("t"),
        F.count("*").alias("k"),
    )
    cap = (F.lit(_UNIMAX_EPOCHS) * F.col("tokens")).cast("bigint")
    w = Window.orderBy("cap", "lang")  # roster-sized: single task is fine
    ranked = (
        by_lang.crossJoin(F.broadcast(tot))
        .withColumn("cap", cap)
        .withColumn(
            "b", (F.lit(_UNIMAX_BUDGET_X) * F.col("t")).cast("bigint")
        )
        .withColumn("i", F.row_number().over(w))
        .withColumn(
            "prefix_prev",
            F.coalesce(
                F.sum("cap").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn(
            "level",
            (F.col("b") - F.col("prefix_prev")).cast("double")
            / (F.col("k") - F.col("i") + 1),
        )
    )
    lv = ranked.filter(
        F.col("cap").cast("double") >= F.col("level")
    ).agg(F.min_by("level", "i").alias("lvl"))
    alloc = F.least(
        F.col("cap").cast("double"),
        F.coalesce(F.col("lvl"), F.lit(float("inf"))),
    )
    return (
        ranked.crossJoin(F.broadcast(lv))
        .select(
            "lang",
            "n_docs",
            "tokens",
            quant(alloc, 2).alias("alloc_tokens"),
            quant(alloc / F.col("tokens").cast("double"), 4).alias("epochs"),
            quant(alloc / F.col("b").cast("double"), 4).alias("budget_share"),
            (
                F.col("cap").cast("double")
                <= F.coalesce(F.col("lvl"), F.lit(float("inf")))
            ).alias("capped"),
        )
    )


# Temperature-based mixture sampling (the other standard LLM-corpus
# allocator next to UniMax: Devlin et al. 2019 mBERT exponent-smoothed
# sampling, Conneau et al. 2020 XLM-R alpha=0.3, Raffel et al. 2020 T5
# mixing): sampling weight q_d ∝ n_d^alpha flattens the language/domain
# distribution (alpha < 1 upweights the tail), and a repetition cap
# bounds epochs over any single language. With the cap, the exact
# allocation is the WEIGHTED waterfill alloc_d = min(cap_d, λ·q_d) where
# λ solves Σ min(cap_d, λ·q_d) = B — UniMax is the q_d≡1 special case,
# so the same one-ordered-scan closed form applies with caps sorted by
# cap_d/q_d and the candidate level (B - prefix_cap)/(suffix q-mass).
#
# alpha is fixed at 0.5 so q_d = sqrt(tokens): IEEE-754 requires sqrt to
# be CORRECTLY ROUNDED (unlike pow), so Spark and DuckDB produce the
# bit-identical double, and flooring to integer micro-units makes every
# prefix/suffix sum exact BIGINT arithmetic — no float-summation-order
# divergence. cap_d/q_d = E·tokens/√tokens ∝ √tokens is strictly
# increasing in tokens, so ORDER BY (tokens, lang) IS the ratio order.
_TEMP_EPOCHS = 4      # same repetition ceiling as UniMax
_TEMP_BUDGET_X = 2    # train budget = 2x the corpus
_TEMP_Q_SCALE = 1_000_000  # micro-units for the floored sqrt weights


@query(
    "sample_temperature_mix",
    oracle=f"""
    WITH by_lang AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS tokens
      FROM documents
      WHERE text IS NOT NULL AND lang IS NOT NULL AND n_chars IS NOT NULL
      GROUP BY lang
      HAVING SUM(n_chars) > 0
    ), weighted AS (
      SELECT lang, n_docs, tokens,
             {_TEMP_EPOCHS} * tokens AS cap,
             CAST(FLOOR(SQRT(CAST(tokens AS DOUBLE)) * {_TEMP_Q_SCALE})
                  AS BIGINT) AS q
      FROM by_lang
    ), tot AS (
      SELECT CAST(SUM(tokens) AS BIGINT) AS t,
             CAST(SUM(q) AS BIGINT) AS qt
      FROM weighted
    ), ranked AS (
      SELECT w.*, {_TEMP_BUDGET_X} * t AS b, qt,
             ROW_NUMBER() OVER (ORDER BY tokens, lang) AS i,
             COALESCE(SUM(cap) OVER (
                 ORDER BY tokens, lang
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS prefix_cap,
             COALESCE(SUM(q) OVER (
                 ORDER BY tokens, lang
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS prefix_q
      FROM weighted w, tot
    ), lv AS (
      SELECT ARG_MIN(CAST(b - prefix_cap AS DOUBLE)
                       / CAST(qt - prefix_q AS DOUBLE), i) AS lvl
      FROM ranked
      WHERE CAST(cap AS DOUBLE)
              >= CAST(b - prefix_cap AS DOUBLE)
                   / CAST(qt - prefix_q AS DOUBLE) * CAST(q AS DOUBLE)
    ), alloc AS (
      SELECT ranked.*,
             COALESCE(lvl, CAST('Infinity' AS DOUBLE)) AS level,
             LEAST(CAST(cap AS DOUBLE),
                   COALESCE(lvl, CAST('Infinity' AS DOUBLE))
                     * CAST(q AS DOUBLE)) AS a
      FROM ranked, lv
    )
    SELECT lang, n_docs, tokens,
           {sql_quant("a", 2)} AS alloc_tokens,
           {sql_quant("a / CAST(tokens AS DOUBLE)", 4)} AS epochs,
           {sql_quant("a / CAST(b AS DOUBLE)", 4)} AS budget_share,
           CAST(cap AS DOUBLE) <= level * CAST(q AS DOUBLE) AS capped
    FROM alloc
    """,
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed (alpha=0.5) language-budget allocation with a
    4-epoch repetition cap — the weighted waterfill described in the
    module comment above. Against UniMax on the same fixture: the tail
    still caps at 4 epochs, but mid-size languages receive budget
    ∝ √tokens instead of an equal share, the standard
    flatten-but-don't-equalize mixture.

    Scale shape: ONE corpus aggregation to (lang, tokens) — everything
    downstream (global window, 1-row totals broadcast crossJoin,
    min_by level pick) is roster-sized, identical to
    sample_unimax_budget. Determinism: caps, q-weights (floored sqrt
    micro-units — IEEE sqrt is correctly rounded, so both engines floor
    the same double) and their prefix sums are exact BIGINT; the only
    doubles are the level/alloc divisions, written in identical textual
    order on both engines and floor-quantized per _conv conventions."""
    d = load(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
        & F.col("lang").isNotNull()
        & F.col("n_chars").isNotNull()
    )
    by_lang = d.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("tokens"),
    )
    return temperature_mix_alloc(by_lang)


def temperature_mix_alloc(by_lang: DataFrame, alpha: float = 0.5,
                          max_epochs: int = _TEMP_EPOCHS,
                          budget_x: int = _TEMP_BUDGET_X) -> DataFrame:
    """Weighted waterfill alloc_d = min(cap_d, λ·q_d), q_d = tokens^alpha
    (module comment above), over a (lang, n_docs, tokens) roster. The
    registered query uses alpha=0.5 (bit-exact sqrt); the alpha-sweep
    pytest exercises the generic pow path against a Python reference.
    alpha must be in (0, 1]: the ordered scan caps languages in
    cap/q ∝ tokens^(1-alpha) order, which is (tokens, lang) order only
    for alpha <= 1. Zero-token languages are excluded up front (round-8
    review): a q=0, cap=0 row passes its own stop test vacuously
    (0 >= level*0), corrupting the water level and yielding 0/0 NaN
    epochs — and it can receive no budget anyway."""
    if not 0 < alpha <= 1:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    by_lang = by_lang.filter(F.col("tokens") > 0)
    qcol = (
        F.sqrt(F.col("tokens").cast("double"))
        if alpha == 0.5
        else F.pow(F.col("tokens").cast("double"), F.lit(float(alpha)))
    )
    weighted = by_lang.withColumn(
        "cap", (F.lit(max_epochs) * F.col("tokens")).cast("bigint")
    ).withColumn(
        "q", F.floor(qcol * _TEMP_Q_SCALE).cast("bigint")
    )
    tot = weighted.agg(
        F.sum("tokens").cast("bigint").alias("t"),
        F.sum("q").cast("bigint").alias("qt"),
    )
    w = Window.orderBy("tokens", "lang")  # roster-sized: single task is fine
    prev = w.rowsBetween(Window.unboundedPreceding, -1)
    ranked = (
        weighted.crossJoin(F.broadcast(tot))
        .withColumn(
            "b", (F.lit(budget_x) * F.col("t")).cast("bigint")
        )
        .withColumn("i", F.row_number().over(w))
        .withColumn(
            "prefix_cap", F.coalesce(F.sum("cap").over(prev), F.lit(0))
        )
        .withColumn(
            "prefix_q", F.coalesce(F.sum("q").over(prev), F.lit(0))
        )
        .withColumn(
            "level",
            (F.col("b") - F.col("prefix_cap")).cast("double")
            / (F.col("qt") - F.col("prefix_q")).cast("double"),
        )
    )
    lv = ranked.filter(
        F.col("cap").cast("double")
        >= F.col("level") * F.col("q").cast("double")
    ).agg(F.min_by("level", "i").alias("lvl"))
    lvl = F.coalesce(F.col("lvl"), F.lit(float("inf")))
    alloc = F.least(
        F.col("cap").cast("double"), lvl * F.col("q").cast("double")
    )
    return (
        ranked.crossJoin(F.broadcast(lv))
        .select(
            "lang",
            "n_docs",
            "tokens",
            quant(alloc, 2).alias("alloc_tokens"),
            quant(alloc / F.col("tokens").cast("double"), 4).alias("epochs"),
            quant(alloc / F.col("b").cast("double"), 4).alias("budget_share"),
            (
                F.col("cap").cast("double")
                <= lvl * F.col("q").cast("double")
            ).alias("capped"),
        )
    )
