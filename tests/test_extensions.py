"""Invariant tests for the LLM-data extension operators — the checks the
DuckDB oracle can't express (SURVEY §5.2.5): LSH recall on planted
near-duplicates, language-ID accuracy on synthetic multilingual text,
approximate-aggregate error bounds, ANN recall vs brute force, multimodal
decode determinism, dedup idempotence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from plc_data_etl_pipeline_spark.catalog import load
from plc_data_etl_pipeline_spark.operators import dedup as D
from plc_data_etl_pipeline_spark.operators import multimodal as M
from plc_data_etl_pipeline_spark.operators import similarity as S
from plc_data_etl_pipeline_spark.operators import text as T

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def planted_docs(spark):
    """Corpus with known near-duplicate pairs: base docs + variants with
    one token changed (high Jaccard) + unrelated docs."""
    base = [
        ("the quick brown fox jumps over the lazy dog and runs far away home "
         "tonight while stars shine bright above the quiet sleepy village"),
        ("data pipelines shuffle partition broadcast join aggregate window "
         "stream batch sink source schema column row table query plan optimize"),
        ("alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu "
         "nu xi omicron pi rho sigma tau upsilon phi chi psi omega end"),
    ]
    rows = []
    for i, b in enumerate(base):
        rows.append((i * 10, b))
        toks = b.split()
        toks[len(toks) // 2] = "CHANGED"
        rows.append((i * 10 + 1, " ".join(toks)))  # near-dup of base
    for j in range(20):  # unrelated filler
        rows.append((1000 + j, " ".join(f"w{j}x{k}" for k in range(30))))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_minhash_recall_and_precision(spark, planted_docs):
    pairs = D.minhash_dedup_pairs(
        planted_docs, "doc_id", "text", threshold=0.5
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    # all three planted near-dup pairs recovered
    for i in range(3):
        assert (i * 10, i * 10 + 1) in found, f"missed planted pair {i}"
    # every reported pair really is similar (verify step guarantees it)
    assert all(r.jaccard >= 0.5 for r in pairs)
    # no unrelated-filler pair reported
    assert not any(a >= 1000 and b >= 1000 for a, b in found)


def test_simhash_hamming_separation(spark, planted_docs):
    fps = {r.doc_id: r.simhash for r in D.simhash(planted_docs, "doc_id", "text").collect()}

    def ham(a, b):
        return bin(a ^ b).count("1")

    near = [ham(fps[i * 10], fps[i * 10 + 1]) for i in range(3)]
    far = [ham(fps[0], fps[1000 + j]) for j in range(10)]
    assert max(near) < 12, f"near-dup hamming too high: {near}"
    assert min(far) > max(near), f"no separation: near={near} far={far}"


def test_simhash_near_pairs_finds_planted(spark, planted_docs):
    """Block-LSH guarantees recovery of Hamming<=3 pairs (pigeonhole over
    4 blocks). Token-reordered / token-duplicated texts have IDENTICAL
    simhash (bag-of-distinct-tokens) — plant those."""
    base = planted_docs.filter(F.col("doc_id") % 10 == 0)
    reordered = base.select(
        (F.col("doc_id") + 5).alias("doc_id"),
        F.concat_ws(" ", F.reverse(F.split("text", " "))).alias("text"),
    )
    corpus = planted_docs.unionByName(reordered)
    got = {(r.id_a, r.id_b) for r in
           D.simhash_near_pairs(corpus, "doc_id", "text", max_bits=3).collect()}
    for i in range(3):
        assert (i * 10, i * 10 + 5) in got, f"missed reordered dup of doc {i*10}"


def test_exact_dedup_idempotent_and_survivor(spark):
    docs = load(spark, SF_DIR, "documents")
    doubled = docs.union(docs)  # plant exact duplicates of every row
    once = D.exact_dedup(doubled, ["text"], "doc_id")
    twice = D.exact_dedup(once, ["text"], "doc_id")
    assert once.count() == docs.select("text").distinct().count()
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_incremental_dedup_semantics(spark):
    """Batch is deduped against corpus AND itself; survivor is min-order;
    multi-column content keys work; disjoint corpus is a no-op filter."""
    batch = spark.createDataFrame(
        [(1, "a", "x"), (2, "a", "x"), (3, "b", "y"), (4, "c", "z")],
        "id long, t1 string, t2 string",
    )
    corpus = spark.createDataFrame(
        [(90, "b", "y"), (91, "d", "w")], "id long, t1 string, t2 string"
    )
    out = sorted(
        tuple(r) for r in D.incremental_dedup(batch, corpus, ["t1", "t2"], "id").collect()
    )
    # "b/y" seen in corpus -> dropped; "a/x" internal dup -> min id survives
    assert out == [(1, "a", "x"), (4, "c", "z")]
    # disjoint corpus: reduces to plain within-batch exact dedup
    empty = corpus.filter("id < 0")
    alone = sorted(
        tuple(r) for r in D.incremental_dedup(batch, empty, ["t1", "t2"], "id").collect()
    )
    assert alone == [(1, "a", "x"), (3, "b", "y"), (4, "c", "z")]
    # content split across columns is NOT the same as concatenated equal
    tricky = spark.createDataFrame([(5, "ab", "")], "id long, t1 string, t2 string")
    kept = D.incremental_dedup(
        tricky, spark.createDataFrame([(6, "a", "b")], "id long, t1 string, t2 string"),
        ["t1", "t2"], "id",
    )
    assert kept.count() == 1


def test_ann_lift_on_random_corpus(spark):
    """The fixture embeddings are isotropic noise (no cluster structure),
    so absolute recall at a tiny probe fraction is information-
    theoretically capped; the correct invariant is LIFT: recall must beat
    the fraction of the corpus an equivalent random probe would scan."""
    emb = load(spark, SF_DIR, "embeddings")
    n = emb.count()
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk(emb, query_max_id=20, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in S.lsh_ann_topk(emb, query_max_id=20, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    scanned_fraction = 9 / 2**8  # 1 + 8 Hamming-1 probes over 2^8 buckets
    assert recall >= 2 * scanned_fraction, (
        f"no LSH lift: recall={recall:.3f} vs random baseline "
        f"{scanned_fraction:.3f}"
    )


def test_ann_recall_on_clustered_corpus(spark):
    """On data that HAS neighborhood structure (queries + noisy copies),
    hyperplane LSH must find the true neighbors with high recall."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal((10, 64))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v], 0))
        for c in range(3):  # 3 close copies of each query
            noisy = v + 0.05 * rng.standard_normal(64)
            rows.append((100 + i * 10 + c, [float(x) for x in noisy], 0))
    for j in range(300):  # noise corpus
        rows.append((1000 + j, [float(x) for x in rng.standard_normal(64)], 1))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk(emb, query_max_id=10, k=3).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in S.lsh_ann_topk(emb, query_max_id=10, k=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"clustered-corpus ANN recall too low: {recall:.2f}"


def test_cosine_topk_arrow_matches_jvm_fold(spark):
    """The Arrow mapInPandas scorer and the all-JVM HOF fold are
    bit-identical (same sequential IEEE add order) — every (query,
    neighbor, rounded score, rank) row agrees on real parquet data."""
    emb = load(spark, SF_DIR, "embeddings")
    arrow = {tuple(r) for r in S.cosine_topk(emb, query_max_id=20, k=5).collect()}
    fold = {
        tuple(r) for r in S.cosine_topk_fold(emb, query_max_id=20, k=5).collect()
    }
    assert arrow == fold


def test_embedding_near_dup_pairs_planted(spark):
    """Plant an exact duplicate vector and a noisy copy; both must pair
    with the original at cosine >= 0.9."""
    emb = load(spark, SF_DIR, "embeddings").limit(50)
    v0 = emb.filter(F.col("vec_id") == 0).collect()[0].embedding
    noisy = [x * 1.001 + 0.0005 for x in v0]
    extra = spark.createDataFrame(
        [(9000, v0, 0), (9001, noisy, 0)], ["vec_id", "embedding", "label"]
    ).withColumn("embedding", F.col("embedding").cast("array<float>"))
    corpus = emb.unionByName(extra)
    pairs = {(r.id_a, r.id_b) for r in
             S.embedding_near_dup_pairs(corpus, threshold=0.9).collect()}
    assert (0, 9000) in pairs
    assert (0, 9001) in pairs or (9000, 9001) in pairs


def test_langid_accuracy_on_synthetic(spark):
    """Marker-based language-ID nails texts actually written with each
    language's function words."""
    samples = [
        ("the cat sat on the mat and it is a good day in the park", "en"),
        ("der hund ist nicht in das haus und die katze ist da", "de"),
        ("el perro y la casa de que los gatos en una mesa", "es"),
        ("le chien et la maison les chats dans une est grande", "fr"),
    ]
    df = spark.createDataFrame(samples, ["text", "true_lang"])
    got = df.select("true_lang", T.lang_id("text").alias("pred")).collect()
    assert all(r.pred == r.true_lang for r in got), [tuple(r) for r in got]


def test_approx_count_distinct_within_5pct(spark):
    li = load(spark, SF_DIR, "lineitem")
    row = li.agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx"),
        F.countDistinct("l_orderkey").alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.05


def test_multimodal_decode_deterministic_and_shaped(spark):
    docs = load(spark, SF_DIR, "documents").limit(50)
    media = M.synthesize_media(docs)
    feats1 = {r.media_id: r.feature for r in M.decode_media(media).collect()}
    feats2 = {r.media_id: r.feature for r in M.decode_media(media).collect()}
    assert feats1 == feats2  # deterministic stub
    assert all(len(v) == 8 for v in feats1.values())
    assert all(0.0 <= x <= 1.0 for v in feats1.values() for x in v)
    # metadata typed correctly: images have width/height, audio sample_rate
    meta = media.collect()
    for r in meta:
        if r.format in ("png", "jpeg"):
            assert r.width is not None and r.sample_rate is None
        else:
            assert r.sample_rate == 16000 and r.width is None


def test_multimodal_real_decode_is_explicitly_stubbed(spark):
    docs = load(spark, SF_DIR, "documents").limit(1)
    with pytest.raises(NotImplementedError):
        M.decode_media(M.synthesize_media(docs), real=True)


def test_frame_sample_shapes(spark):
    docs = load(spark, SF_DIR, "documents").limit(20)
    media = M.synthesize_media(docs)
    frames = M.frame_sample(media, every_n_bytes=64).collect()
    for r in frames:
        assert r.n_frames == max(r.n_frames, 0)
        assert len(r.frames) in (r.n_frames, 1)  # greatest(n-1,0)+1 when n==0


def test_minhash_jvm_path_same_recall(spark, planted_docs):
    """The pure-JVM signature path finds the same planted pairs as the
    Arrow path (different hash families -> candidate sets may differ, but
    verified output must contain the planted near-dups either way)."""
    pairs = D.minhash_dedup_pairs(
        planted_docs, "doc_id", "text", threshold=0.5, use_arrow=False
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    for i in range(3):
        assert (i * 10, i * 10 + 1) in found
    assert all(r.jaccard >= 0.5 for r in pairs)


def test_ivf_recall_on_clustered_corpus(spark):
    """IVF with sample-trained centroids must recover true neighbors on
    clustered data (queries + noisy copies), like the LSH variant."""
    import numpy as np

    rng = np.random.default_rng(11)
    base = rng.standard_normal((10, 64))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v], 0))
        for c in range(3):
            noisy = v + 0.05 * rng.standard_normal(64)
            rows.append((100 + i * 10 + c, [float(x) for x in noisy], 0))
    for j in range(300):
        rows.append((1000 + j, [float(x) for x in rng.standard_normal(64)], 1))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding", "label"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk(emb, query_max_id=10, k=3).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in S.ivf_ann_topk(emb, query_max_id=10, k=3, n_cells=8, n_probe=2).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"IVF recall too low: {recall:.2f}"


def test_minhash_ml_variant_finds_planted(spark, planted_docs):
    pairs = D.minhash_ml_pairs(planted_docs, "doc_id", "text", threshold=0.5).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    for i in range(3):
        assert (i * 10, i * 10 + 1) in found, f"ml variant missed pair {i}"
    assert all(r.jaccard >= 0.5 for r in pairs)


def test_dq_violations_row_level(spark):
    """Row-level violation report names exactly the failed rules."""
    from plc_data_etl_pipeline_spark.operators import quality as Q

    df = spark.createDataFrame(
        [(1, 50.0, "click"), (2, None, "click"), (3, 900.0, "bogus")],
        "id int, value double, event_type string",
    )
    rules = [
        Q.not_null("value"),
        Q.in_range("value", 0.0, 500.0),
        Q.in_set("event_type", ("click",)),
    ]
    got = sorted(
        (r.id, r.rule)
        for r in Q.violations(df, rules, ["id"]).collect()
    )
    assert got == [
        (2, "value_null_count"),
        (3, "event_type_not_in_set_count"),
        (3, "value_out_of_range_count"),
    ]


def test_connected_components_chain_triangle_singleton(spark):
    """Min-label propagation: a 4-chain and a triangle collapse to their
    min ids; nodes absent from pairs become singleton survivors."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)],
        "id_a long, id_b long",
    )
    cc = {r.node: r.cluster_id for r in D.connected_components(pairs).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10}

    docs = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 12, 99]], "doc_id long")
    surv = D.cluster_survivors(docs, pairs, "doc_id")
    rows = {r.doc_id: (r.cluster_id, r.is_survivor) for r in surv.collect()}
    assert rows[99] == (99, True)  # singleton: own cluster, survives
    assert rows[1] == (1, True) and rows[4] == (1, False)
    assert sum(1 for c, s in rows.values() if s) == 3  # one per cluster


def test_connected_components_deep_chain_and_truncation(spark):
    """Round-8 internals change (self-loop single-join rounds + monotone
    label-sum certificate): the certificate must stop EXACTLY at the
    fixpoint — a 12-chain (diameter 11, so ~11 propagation rounds) still
    collapses to min-label 0 — and max_iters truncation keeps the old
    contract: labels after k rounds are the k-hop minima (prefix), not
    an error."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "id_a long, id_b long"
    )
    cc = {r.node: r.cluster_id for r in D.connected_components(chain).collect()}
    assert cc == {i: 0 for i in range(12)}

    # truncated run: after 3 rounds node i carries min(0, i-3) = max(0, i-3)
    trunc = {
        r.node: r.cluster_id
        for r in D.connected_components(chain, max_iters=3).collect()
    }
    assert trunc == {i: max(0, i - 3) for i in range(12)}


def test_repetition_stats_on_crafted_docs(spark):
    """Hand-computed repetition fractions: a doc that is one word repeated
    must fail both thresholds; a doc of all-distinct words passes."""
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam spam spam"),
            (2, "one two three four five six seven eight nine ten"),
            (3, "ab cd ab cd ab cd ab cd ab cd"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in T.repetition_stats(df, "doc_id", "text").collect()
    }
    assert out[1]["top_word_frac"] == 1.0 and not out[1]["keep"]
    assert out[2]["top_word_frac"] == 0.1 and out[2]["dup_word_frac"] == 0.0
    assert out[2]["keep"]
    # "ab cd" x5: every word appears 5x -> top 0.5; 2-grams: 9 total,
    # 2 distinct -> dup 7/9
    assert out[3]["top_word_frac"] == 0.5
    assert abs(out[3]["dup_2gram_frac"] - round(7 / 9, 6)) < 1e-9
    assert not out[3]["keep"]


def test_decontaminate_planted_overlap(spark):
    """A training doc sharing an exact 5-gram with the eval split is
    flagged; disjoint docs are not."""
    df = spark.createDataFrame(
        [
            (1, "secret eval phrase lives right here in this benchmark row"),
            (2, "totally unrelated training text with its own private words"),
            (3, "contains the secret eval phrase lives right here too yes"),
        ],
        "doc_id long, text string",
    )
    out = T.decontaminate(
        df, "doc_id", "text", eval_flag=(F.col("doc_id") == 1)
    ).collect()
    flagged = {r["doc_id"] for r in out}
    assert flagged == {3}
    assert all(r["n_shared_grams"] >= 1 for r in out)


def test_mixture_resample_copy_counts(spark):
    """Integer weights produce exactly w copies; fractional weights
    produce floor/ceil split deterministically (same doc -> same count
    on re-run); weight 0.x never yields more than one copy."""
    rows = [(i, f"doc {i} unique words here", "en" if i % 2 else "de")
            for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = T.mixture_resample(
        df, "doc_id", "text", weights={"de": 2.0, "en": 0.5}, domain_col="lang"
    )
    pdf = out.toPandas()
    per_doc = pdf.groupby("doc_id").copy_no.max()
    langs = dict(zip(pdf.doc_id, pdf.lang))
    for doc_id, n in per_doc.items():
        if langs[doc_id] == "de":
            assert n == 2
        else:
            assert n == 1  # survivors of the 0.5 coin get exactly one copy
    # deterministic: identical second run
    pdf2 = out.toPandas()
    assert sorted(map(tuple, pdf.values.tolist())) == sorted(
        map(tuple, pdf2.values.tolist())
    )
    # en docs present is a strict subset (roughly half kept)
    n_en = sum(1 for l in langs.values() if l == "en")
    assert 0 < n_en < 20


def test_approx_percentiles_rank_error_bounded(spark):
    """The sketch's contract is RANK error, not value error (a tail value
    can sit far from the exact quantile while being rank-adjacent):
    the fraction of values <= the sketch's answer must be within 2% of
    the requested quantile."""
    from plc_data_etl_pipeline_spark.registry import all_queries

    qs = all_queries()
    approx = {
        r["event_type"]: r
        for r in qs["agg_approx_percentiles"].fn(spark, SF_DIR).collect()
    }
    ev = load(spark, SF_DIR, "events")
    for et, a in approx.items():
        vals = ev.filter(F.col("event_type") == et)
        n = vals.count()
        for q, c in [(0.25, "p25"), (0.5, "p50"), (0.75, "p75"),
                     (0.95, "p95"), (0.99, "p99")]:
            rank = vals.filter(F.col("value") <= a[c]).count() / n
            assert abs(rank - q) <= 0.02, (et, c, rank, q)


def test_heavy_hitters_sketch_exact_below_capacity(spark):
    """With maxItemsTracked far above the vocabulary size the
    approx_top_k sketch degenerates to exact counts: the reported top-10
    must match the exact group-by's counts, and every reported count must
    be >= the exact 10th-ranked count (boundary ties may swap WHICH term
    is picked, never its count)."""
    from plc_data_etl_pipeline_spark.registry import all_queries

    got = {
        r["term"]: r["cnt"]
        for r in all_queries()["agg_heavy_hitters"].fn(spark, SF_DIR).collect()
    }
    exact = {
        r["term"]: r["cnt"]
        for r in (
            load(spark, SF_DIR, "documents")
            .select(F.explode(T.tokens("text")).alias("term"))
            .groupBy("term")
            .agg(F.count("*").alias("cnt"))
            .collect()
        )
    }
    assert len(got) == 10
    for term, cnt in got.items():
        assert exact[term] == cnt, (term, cnt, exact.get(term))
    kth = sorted(exact.values(), reverse=True)[9]
    assert min(got.values()) >= kth


def test_pq_recall_vs_exact(spark):
    """PQ+ADC with exact re-rank recovers most true top-k neighbors on
    the real embeddings fixture (same bar as the LSH variant)."""
    emb = load(spark, SF_DIR, "embeddings")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.cosine_topk(emb, query_max_id=10, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in S.pq_ann_topk(emb, query_max_id=10, k=5).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6, f"PQ recall too low: {recall:.2f}"


def test_pq_encoding_compresses_and_reranks(spark):
    """PQ codes are m small ints (the 32x memory story) and every
    reported neighbor carries an exact (re-ranked) cosine."""
    emb = load(spark, SF_DIR, "embeddings")
    books = S._pq_codebooks(emb, m=8, n_codes=16, dim=64, vec_col="embedding")
    codes = (
        emb.select(S.pq_encode(F.col("embedding"), books, 8, 8).alias("codes"))
        .limit(20)
        .collect()
    )
    for r in codes:
        assert len(r.codes) == 8
        assert all(0 <= c < 16 for c in r.codes)
    got = S.pq_ann_topk(emb, query_max_id=5, k=3).collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r.query_id, []).append(r)
    for q, rows in per_q.items():
        ranks = sorted(r.rank for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        sims = [r.cosine_sim for r in sorted(rows, key=lambda r: r.rank)]
        assert sims == sorted(sims, reverse=True)


def test_hll_union_estimates_within_bounds(spark):
    """HLL sketch estimates are within 5% of exact per group, and the
    merged (union) sketch estimates the global distinct within 5% —
    without rescanning the input."""
    from plc_data_etl_pipeline_spark.registry import all_queries

    rows = all_queries()["agg_hll_union"].fn(spark, SF_DIR).collect()
    exact_total = (
        load(spark, SF_DIR, "events")
        .agg(F.countDistinct("user_id"))
        .collect()[0][0]
    )
    for r in rows:
        if r.event_type == "__ALL__":
            assert abs(r.approx_users - exact_total) <= 0.05 * exact_total
        else:
            assert abs(r.approx_users - r.exact_users) <= 0.05 * r.exact_users


def test_semantic_dedup_drops_planted_duplicates(spark):
    """Exact duplicates planted into the corpus land in the same cell
    and are dropped; the lower id survives."""
    emb = load(spark, SF_DIR, "embeddings")
    dup = emb.filter(F.col("vec_id") < 5).withColumn(
        "vec_id", F.col("vec_id") + 100000
    )
    corpus = emb.unionByName(dup)
    survivors = {
        r.vec_id for r in S.semantic_dedup(corpus, threshold=0.99).collect()
    }
    for i in range(5):
        assert i in survivors, "original must survive"
        assert 100000 + i not in survivors, "planted exact dup must drop"
    # idempotent: re-running on the survivors drops nothing more
    kept = corpus.join(
        spark.createDataFrame([(v,) for v in survivors], "vec_id long"),
        "vec_id",
    )
    again = {r.vec_id for r in S.semantic_dedup(kept, threshold=0.99).collect()}
    assert again == survivors


def test_simhash_star_branch_links_to_min_id_without_self_pairs(spark):
    """Mega-bucket star pairing: identical texts above max_bucket_size
    must produce (min_id, other) pairs only — no self pairs, and the
    component stays connected through the representative."""
    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(1, 7)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r.id_a, r.id_b)
        for r in D.simhash_near_pairs(
            df, "doc_id", "text", max_bits=3, max_bucket_size=2
        ).collect()
    }
    assert pairs == {(1, i) for i in range(2, 7)}


def test_semantic_dedup_degenerate_vectors_survive(spark):
    """NULL and all-zero vectors have no defined cosine: they must pass
    through semantic_dedup untouched (the original pairwise path never
    dropped them) and must NOT crash the driver-side centroid training
    (regression: a NULL vector in the k-means sample was a TypeError)."""
    emb = load(spark, SF_DIR, "embeddings").limit(40)
    dim = len(emb.first().embedding)
    extra = spark.createDataFrame(
        [(9100, None, 0), (9101, [0.0] * dim, 0)],
        "vec_id long, embedding array<float>, label int",
    )
    corpus = emb.unionByName(extra)
    out = S.semantic_dedup(corpus, threshold=0.9)
    kept = {r.vec_id for r in out.collect()}
    assert 9100 in kept and 9101 in kept


def test_pca_power_recovers_planted_spectrum(spark):
    """Closed-form check: data drawn (deterministically) from a planted
    2D subspace in 8 dims must yield PC1/PC2 aligned with the planted
    axes, orthonormal, with eigenvalues matching the planted energies
    and explained fractions summing to ~1."""
    import math

    from plc_data_etl_pipeline_spark.operators.pca import power_iteration_pcs

    # Planted: u along dim 0 with amplitude +-3, w along dim 5 with
    # amplitude +-1, exactly mean-centered (pairs of +/- rows).
    rows = []
    for i in range(64):
        a = 3.0 if i % 2 == 0 else -3.0
        b = 1.0 if (i // 2) % 2 == 0 else -1.0
        v = [0.0] * 8
        v[0] = a
        v[5] = b
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    comps, eigs, trace = power_iteration_pcs(
        emb, "embedding", n_components=2, iterations=12
    )
    # PC1 = e0 (energy 64*9), PC2 = e5 (energy 64*1); trace = sum.
    assert abs(comps[0][0]) > 0.999 and abs(comps[1][5]) > 0.999
    assert comps[0][0] > 0 and comps[1][5] > 0  # sign convention
    assert abs(eigs[0] - 64 * 9.0) < 1e-6
    assert abs(eigs[1] - 64 * 1.0) < 1e-6
    assert abs(trace - 64 * 10.0) < 1e-6
    # Orthonormal basis.
    n1 = math.sqrt(sum(x * x for x in comps[0]))
    n2 = math.sqrt(sum(x * x for x in comps[1]))
    dot = sum(x * y for x, y in zip(comps[0], comps[1]))
    assert abs(n1 - 1) < 1e-9 and abs(n2 - 1) < 1e-9 and abs(dot) < 1e-9


def test_pca_power_centering_removes_mean_direction(spark):
    """A constant offset must NOT register as variance: shifted data
    has the same spectrum as unshifted when center=True."""
    from plc_data_etl_pipeline_spark.operators.pca import power_iteration_pcs

    rows = []
    for i in range(32):
        a = 2.0 if i % 2 == 0 else -2.0
        v = [100.0, 50.0, a, -100.0]  # big constant offsets, signal in dim 2
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    comps, eigs, trace = power_iteration_pcs(
        emb, "embedding", n_components=1, iterations=10
    )
    assert abs(comps[0][2]) > 0.999
    assert abs(eigs[0] - 32 * 4.0) < 1e-6
    assert abs(trace - 32 * 4.0) < 1e-6


def test_pca_gram_matches_power_iteration(spark):
    """The one-pass Gram path and the iterative path must agree on the
    planted spectrum (same eigenvalues, aligned components) — the query
    uses gram_pcs; power_iteration_pcs is the huge-dim fallback."""
    from plc_data_etl_pipeline_spark.operators.pca import (
        gram_pcs,
        power_iteration_pcs,
    )

    rows = []
    for i in range(64):
        a = 3.0 if i % 2 == 0 else -3.0
        b = 1.0 if (i // 2) % 2 == 0 else -1.0
        v = [0.0] * 8
        v[0] = a
        v[5] = b
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    gc, ge, gt = gram_pcs(emb, "embedding", n_components=2)
    pc, pe, pt = power_iteration_pcs(emb, "embedding", n_components=2,
                                     iterations=12)
    assert abs(gt - pt) < 1e-6
    for k in range(2):
        assert abs(ge[k] - pe[k]) < 1e-6
        dot = sum(x * y for x, y in zip(gc[k], pc[k]))
        assert abs(abs(dot) - 1) < 1e-9


def test_phash_planted_corruption_and_pigeonhole(spark):
    """pHash near-dup: payloads differing by a few flipped bytes must
    land within small Hamming distance and be FOUND by the bucketed
    join (pigeonhole completeness vs brute force); unrelated random
    payloads must not pair up at tight thresholds."""
    import itertools
    import random

    from plc_data_etl_pipeline_spark.operators.multimodal import (
        phash_media,
        phash_near_dup_pairs,
    )

    rng = random.Random(7)
    base = bytes(rng.randrange(256) for _ in range(4096))
    corrupt = bytearray(base)
    for pos in (10, 500, 2000):  # flip 3 bytes
        corrupt[pos] ^= 0xFF
    rows = [(0, base), (1, bytes(corrupt))]
    for i in range(2, 12):  # unrelated payloads
        rows.append((i, bytes(rng.randrange(256) for _ in range(4096))))
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    hashes = phash_media(media)
    hval = {r["media_id"]: r["phash"] for r in hashes.collect()}

    # Planted pair is close; unrelated pairs are far (expected ~32).
    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(hval[0], hval[1]) <= 3
    # Bucketed pairs == brute-force pairs at the pigeonhole-safe bound.
    got = {
        (r["media_a"], r["media_b"], r["hamming"])
        for r in phash_near_dup_pairs(hashes, max_hamming=3).collect()
    }
    want = {
        (a, b, ham(hval[a], hval[b]))
        for a, b in itertools.combinations(sorted(hval), 2)
        if ham(hval[a], hval[b]) <= 3
    }
    assert got == want and (0, 1, ham(hval[0], hval[1])) in got


def test_whiten_identity_covariance(spark):
    """Whitening planted anisotropic data must produce unit variance on
    each retained coordinate, zero mean, and zero cross-covariance."""
    from plc_data_etl_pipeline_spark.operators.pca import gram_pcs, whiten

    rows = []
    for i in range(64):
        a = 5.0 if i % 2 == 0 else -5.0
        b = 0.5 if (i // 2) % 2 == 0 else -0.5
        # rotated anisotropic cloud with a constant offset
        rows.append((i, [a + b + 1.0, a - b - 2.0, b, 0.25 * a]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    comps, eigs, _ = gram_pcs(emb, "embedding", n_components=2)
    mean_rows = (
        emb.selectExpr("posexplode(embedding) AS (pos, xi)")
        .groupBy("pos")
        .agg({"xi": "avg"})
        .collect()
    )
    mean = [0.0] * 4
    for r in mean_rows:
        mean[r["pos"]] = r["avg(xi)"]
    w = whiten(emb, comps, eigs, 64, "embedding", mean=mean)
    import numpy as np

    mat = np.array([r["whitened"] for r in w.collect()])
    cov = mat.T @ mat / len(mat)
    m = mat.mean(axis=0)
    assert abs(m[0]) < 1e-9 and abs(m[1]) < 1e-9
    assert abs(cov[0, 0] - 1) < 1e-6 and abs(cov[1, 1] - 1) < 1e-6
    assert abs(cov[0, 1]) < 1e-6


def test_bpe_train_classic_corpus(spark):
    """Sennrich's textbook corpus: the merge sequence is hand-derivable
    ((e,s) -> (es,t) -> (est,</w>) -> (l,o) -> (lo,w)), with the
    lexicographic tiebreak deciding the 9-9-9 first round."""
    from plc_data_etl_pipeline_spark.operators.text import bpe_train

    corpus = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    docs = spark.createDataFrame([(1, corpus)], "doc_id long, text string")
    expected = [
        ("e", "s"),
        ("es", "t"),
        ("est", "</w>"),
        ("l", "o"),
        ("lo", "w"),
    ]
    # Default path: vocabulary fits -> driver fold, and the whole train
    # is a bounded number of Spark jobs regardless of n_merges.
    sc = spark.sparkContext
    sc.setJobGroup("bpe-fold", "bpe driver-fold job count")
    merges = bpe_train(docs, "text", n_merges=5)
    sc.setJobGroup("", "")
    assert merges == expected
    fold_jobs = len(sc.statusTracker().getJobIdsForGroup("bpe-fold"))
    assert 1 <= fold_jobs <= 2, fold_jobs  # one collect (+schema probe)
    # Oversized-vocab fallback: the distributed loop must learn the
    # IDENTICAL sequence (max_driver_words=0 forces it).
    dist = bpe_train(docs, "text", n_merges=5, max_driver_words=0)
    assert dist == expected


def test_ivf_indexed_matches_in_memory(spark, tmp_path):
    """The persisted-index serve path must return exactly what the
    in-memory IVF path returns (same centroids/params), and its scan
    must carry a partition filter on cell."""
    import contextlib
    import io

    from plc_data_etl_pipeline_spark.catalog import load
    from plc_data_etl_pipeline_spark.operators import similarity as S
    from pyspark.sql import functions as F

    from .conftest import SF_DIR

    e = load(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "ivf")
    S.build_ivf_index(e, path, n_cells=16)
    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in e.filter(F.col("vec_id") < 20).collect()
    ]
    served = S.ivf_ann_topk_indexed(spark, path, queries, k=5, n_probe=4)
    mem = S.ivf_ann_topk(e, query_max_id=20, k=5, n_cells=16, n_probe=4)
    a = sorted(map(tuple, served.collect()))
    b = sorted(map(tuple, mem.collect()))
    assert a == b and len(a) > 0
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        served.explain("formatted")
    p = buf.getvalue()
    assert "PartitionFilters" in p and "cell" in p.split("PartitionFilters")[1].split("\n")[0]


def test_bpe_driver_fold_matches_distributed_on_random_corpus(spark):
    """Path equivalence on a messier corpus (repeats, rare words,
    punctuation-ish symbols, many ties): 30 merges, both paths must
    produce the identical ordered merge list."""
    import random

    from plc_data_etl_pipeline_spark.operators.text import bpe_train

    rng = random.Random(7)
    vocab = ["alpha", "beta", "bet", "able", "baker", "zz!", "a-b", "ab"]
    texts = [
        " ".join(rng.choices(vocab, weights=[8, 5, 5, 3, 2, 1, 1, 4], k=40))
        for _ in range(20)
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    fold = bpe_train(docs, "text", n_merges=30)
    dist = bpe_train(docs, "text", n_merges=30, max_driver_words=0)
    # This corpus exhausts at 25 merges — BOTH paths must stop there.
    assert fold == dist and len(fold) == 25


def test_bpe_encode_applies_learned_merges(spark):
    """Train on the classic corpus, then encode: 'lowest' must tokenize
    as [low, est</w>] (2 tokens) under the learned merges, while an
    out-of-vocabulary word falls back to characters + </w>."""
    from plc_data_etl_pipeline_spark.operators.text import bpe_encode, bpe_train

    corpus = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    docs = spark.createDataFrame([(1, corpus)], "doc_id long, text string")
    merges = bpe_train(docs, "text", n_merges=5)
    probe = spark.createDataFrame(
        [(1, "lowest"), (2, "xyz"), (3, None), (4, "low low")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_encode(probe, merges).collect()
    }
    # lowest -> l o w e s t </w> -> (e,s)->es -> (es,t)->est ->
    # (est,</w>)->est</w> -> (l,o)->lo -> (lo,w)->low => [low, est</w>]
    assert got[1] == 2
    # xyz: no merges apply -> x y z </w> = 4 symbols
    assert got[2] == 4
    assert got[3] is None
    # 'low' learned fully except the final (low,</w>) merge (rank 6+):
    # low -> [low, </w>] = 2 tokens, twice
    assert got[4] == 4


def test_minhash_null_texts_are_not_duplicates(spark):
    """Round-3 review regression: exact-first grouping must not pair
    NULL texts with each other (undefined content is not duplicate
    content — the simhash/ml-variant contract, and this function's own
    pre-exact-first behavior)."""
    rows = [
        (1, None),
        (2, None),
        (3, None),
        (10, "same exact text here"),
        (11, "same exact text here"),
        (20, "completely different words entirely"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r.id_a, r.id_b)
        for r in D.minhash_dedup_pairs(df, "doc_id", "text", threshold=0.5).collect()
    }
    assert (10, 11) in pairs
    assert all(a not in (1, 2, 3) and b not in (1, 2, 3) for a, b in pairs)


def test_ivf_null_query_vector_is_skipped(spark):
    """Round-3 review regression: a NULL embedding below query_max_id
    must be skipped (it used to TypeError in the probe construction),
    while valid queries still get results."""
    import random

    rng = random.Random(3)
    rows = [(0, None, 0)] + [
        (i, [rng.uniform(-1, 1) for _ in range(64)], i % 4)
        for i in range(1, 60)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = S.ivf_ann_topk(emb, query_max_id=5, k=3, n_cells=4, n_probe=2)
    got = {r.query_id for r in out.collect()}
    assert 0 not in got and got == {1, 2, 3, 4}


def test_substring_dup_spans_planted(spark):
    """Two docs share one 8-token run; a third is unique. Exact expected
    coverage: the shared run of 10 tokens yields 3 duplicated gram starts
    (10 - 8 + 1) covering all 10 positions in each doc."""
    shared = " ".join(f"s{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (1, shared + " " + " ".join(f"a{i}" for i in range(6))),
            (2, " ".join(f"b{i}" for i in range(6)) + " " + shared),
            (3, " ".join(f"u{i}" for i in range(20))),  # unique
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in D.substring_dup_spans(docs, "doc_id", "text", k=8).collect()
    }
    assert set(out) == {1, 2}  # the unique doc reports nothing
    for did, n_tok in [(1, 16), (2, 16)]:
        assert out[did]["n_tok"] == n_tok
        assert out[did]["dup_grams"] == 3
        assert out[did]["covered_tokens"] == 10


def test_substring_dup_spans_within_doc_repeat(spark):
    """Lee et al. count a substring repeated WITHIN one document too."""
    run = " ".join(f"r{i}" for i in range(8))
    docs = spark.createDataFrame(
        [(1, run + " x0 x1 x2 " + run)], ["doc_id", "text"]
    )
    row = D.substring_dup_spans(docs, "doc_id", "text", k=8).collect()[0]
    assert row["dup_grams"] == 2 and row["covered_tokens"] == 16


def test_chunk_dedup_keep_first_semantics(spark):
    """Doc 2 replays doc 1 exactly -> zero survivors, NULL cleaned_text;
    doc 3 shares only its first 16-token chunk -> that chunk is deleted
    and the tail survives in order."""
    c0 = " ".join(f"c{i}" for i in range(16))
    tail = " ".join(f"t{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, c0), (2, c0), (3, c0 + " " + tail)], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r
        for r in D.chunk_dedup(docs, "doc_id", "text", chunk_tokens=16).collect()
    }
    assert out[1]["kept_chunks"] == 1 and out[1]["cleaned_text"] == c0
    assert out[2]["kept_chunks"] == 0 and out[2]["cleaned_text"] is None
    assert out[3]["n_chunks"] == 3 and out[3]["kept_chunks"] == 2
    # surviving chunks rejoin in positional order
    assert out[3]["cleaned_text"] == tail


def test_chunk_dedup_idempotent(spark):
    """Running chunk dedup on its own cleaned output deletes nothing."""
    c0 = " ".join(f"c{i}" for i in range(16))
    tail = " ".join(f"t{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, c0), (2, c0 + " " + tail)], ["doc_id", "text"]
    )
    first = D.chunk_dedup(docs, "doc_id", "text", chunk_tokens=16)
    cleaned = first.filter(F.col("cleaned_text").isNotNull()).select(
        "doc_id", F.col("cleaned_text").alias("text")
    )
    second = D.chunk_dedup(cleaned, "doc_id", "text", chunk_tokens=16)
    for r in second.collect():
        assert r["kept_chunks"] == r["n_chunks"]


def test_bloom_incremental_no_false_negatives_and_exact_here(spark):
    """Every batch doc whose content exists in the corpus MUST be gated
    out (Bloom guarantees no false negatives); at fixture fill factor
    (k*n << m) there are no false positives either, so the result is
    exactly the digest anti-join's."""
    corpus = spark.createDataFrame(
        [(i, f"doc body {i}") for i in range(200)], ["doc_id", "text"]
    )
    batch = spark.createDataFrame(
        # 50 true dups of corpus content + 50 genuinely new docs
        [(1000 + i, f"doc body {i}") for i in range(50)]
        + [(2000 + i, f"fresh body {i}") for i in range(50)],
        ["doc_id", "text"],
    )
    bloom = D.bloom_build(corpus, ["text"])
    out = sorted(
        r.doc_id
        for r in D.bloom_incremental_new(
            batch, bloom, ["text"], "doc_id"
        ).collect()
    )
    exact = sorted(
        r.doc_id
        for r in batch.join(
            corpus.select("text"), "text", "left_anti"
        ).collect()
    )
    dup_ids = {1000 + i for i in range(50)}
    assert not dup_ids.intersection(out), "false negative: dup admitted"
    assert out == exact  # zero FPs at this fill factor


def test_bloom_gate_duplicate_ids_and_null_columns(spark):
    """(a) A repeated id with DIFFERENT content gates each content on
    its own probes — the corpus dup is rejected, the new text admitted,
    under the same id. (b) Multi-column content keeps NULL positional:
    ('x', NULL) and (NULL, 'x') must not collide (xxhash64 skips NULL
    children; the operator NULL-tags each column)."""
    schema = "doc_id int, title string, body string"
    corpus = spark.createDataFrame([(1, "x", None)], schema)
    bloom = D.bloom_build(corpus, ["title", "body"])
    batch = spark.createDataFrame(
        [(5, "x", None), (5, None, "x"), (5, "fresh", "fresh")], schema
    )
    out = {
        (r.doc_id, r.title, r.body)
        for r in D.bloom_incremental_new(
            batch, bloom, ["title", "body"], "doc_id"
        ).collect()
    }
    assert out == {(5, None, "x"), (5, "fresh", "fresh")}


def test_bloom_gate_null_id_rows_survive(spark):
    """A batch row with a NULL id and definitely-new content must be
    admitted (round-4 advice: the plain-equality semi-join back was
    null-rejecting, a SYSTEMATIC drop rather than the documented
    probabilistic false positive), and a NULL-id row whose content IS
    in the corpus must still be rejected."""
    schema = "doc_id int, text string"
    corpus = spark.createDataFrame([(1, "known old text")], schema)
    bloom = D.bloom_build(corpus, ["text"])
    batch = spark.createDataFrame(
        [(None, "definitely new text"), (None, "known old text"),
         (7, "another new text")], schema
    )
    out = {
        (r.doc_id, r.text)
        for r in D.bloom_incremental_new(batch, bloom, ["text"], "doc_id").collect()
    }
    assert out == {(None, "definitely new text"), (7, "another new text")}


def test_bloom_bitmap_is_bounded_and_fp_rate_in_envelope(spark):
    """The bitmap never exceeds n_bits/64 words however big the corpus,
    and the measured FP rate on disjoint content stays within 3x the
    analytic (1 - e^(-kn/m))^k envelope for a deliberately tiny filter."""
    import math

    n, n_bits, k = 2000, 1 << 14, 5
    corpus = spark.createDataFrame(
        [(i, f"member {i}") for i in range(n)], ["doc_id", "text"]
    )
    bloom = D.bloom_build(corpus, ["text"], n_bits=n_bits, n_hashes=k)
    assert bloom.count() <= n_bits // 64
    probe = spark.createDataFrame(
        [(i, f"outsider {i}") for i in range(4000)], ["doc_id", "text"]
    )
    admitted = D.bloom_incremental_new(
        probe, bloom, ["text"], "doc_id", n_bits=n_bits, n_hashes=k
    ).count()
    fp_rate = (4000 - admitted) / 4000
    analytic = (1 - math.exp(-k * n / n_bits)) ** k
    assert fp_rate <= 3 * analytic + 1e-9, (fp_rate, analytic)


def test_tfidf_shuffle_hash_mode_matches_broadcast(spark):
    """broadcast_vocab=False (the over-8GB-vocabulary escape hatch) must
    produce identical rows through a ShuffledHashJoin — the hint changes
    execution strategy only, and keeps the build side explicitly pinned
    (no AQE side race either way)."""
    docs = spark.createDataFrame(
        [(1, "a a b c"), (2, "a b b d"), (3, "c d d d e")],
        ["doc_id", "text"],
    )
    bc = T.tfidf_top_terms(docs, "doc_id", "text", k=3)
    sh = T.tfidf_top_terms(docs, "doc_id", "text", k=3, broadcast_vocab=False)
    assert sorted(map(tuple, bc.collect())) == sorted(map(tuple, sh.collect()))
    assert "ShuffledHashJoin" in sh._jdf.queryExecution().executedPlan().toString()


def test_common_chunk_filter_deletes_every_copy(spark):
    """The CCNet complement of keep-first: a chunk in >=3 distinct docs
    disappears from ALL of them (including the first), rare chunks
    survive, and per-doc repeats count once toward document frequency."""
    c0 = " ".join(f"c{i}" for i in range(8))
    tail = " ".join(f"t{i}" for i in range(8))
    docs = spark.createDataFrame(
        [(1, c0 + " " + tail), (2, c0), (3, c0 + " " + c0)],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in D.common_chunk_filter(
            docs, "doc_id", "text", chunk_tokens=8, min_docs=3
        ).collect()
    }
    # c0 appears in 3 distinct docs (doc 3's repeat counts once) -> gone
    assert out[1]["dropped_chunks"] == 1 and out[1]["cleaned_text"] == tail
    assert out[2]["dropped_chunks"] == 1 and out[2]["cleaned_text"] is None
    assert out[3]["dropped_chunks"] == 2 and out[3]["cleaned_text"] is None


def test_token_chunks_rejects_nonpositive_width(spark):
    """chunk_tokens is interpolated into SQL: 0 would DIV-BY-ZERO at
    execution and negatives build descending sequences — both callers
    share the eager ValueError instead."""
    docs = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    for bad in (0, -4):
        with pytest.raises(ValueError, match="chunk_tokens"):
            D.chunk_dedup(docs, "doc_id", "text", chunk_tokens=bad)
        with pytest.raises(ValueError, match="chunk_tokens"):
            D.common_chunk_filter(docs, "doc_id", "text", chunk_tokens=bad)


def test_dsir_weights_prefer_target_like_docs(spark, tmp_path):
    """Docs made of target-exclusive words must outscore docs made of
    pool-exclusive words, and the smoothed ratio must stay finite for
    words absent from the target slice."""
    import pandas as pd

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "alpha beta alpha beta",   # en (target) vocabulary
                "alpha beta beta alpha",   # en
                "gamma delta gamma delta", # pool-only vocabulary
                "alpha beta gamma delta",  # mixed, non-target doc
            ],
            "lang": ["en", "en", "fr", "fr"],
            "source": ["s"] * 4,
            "n_chars": [22] * 4,
        }
    )
    sf = str(tmp_path)
    docs.to_parquet(f"{sf}/documents.parquet")
    from plc_data_etl_pipeline_spark.queries.curation import sample_dsir_weights

    out = {
        r["doc_id"]: r for r in sample_dsir_weights(spark, sf).collect()
    }
    # target-vocab docs score strictly above the pool-only doc
    assert out[1]["avg_log_ratio"] > out[3]["avg_log_ratio"]
    assert out[2]["avg_log_ratio"] > out[3]["avg_log_ratio"]
    assert out[1]["selected"] and not out[3]["selected"]
    # mixed doc lands strictly between
    assert (
        out[3]["avg_log_ratio"]
        < out[4]["avg_log_ratio"]
        < out[1]["avg_log_ratio"]
    )
    # smoothing keeps every weight finite
    import math

    assert all(math.isfinite(r["avg_log_ratio"]) for r in out.values())


def test_kmeans_recovers_planted_clusters(spark):
    """Four well-separated blobs: Lloyd must put every blob in one cell,
    and distinct blobs in distinct cells (k=4, any labeling)."""
    import numpy as np

    from plc_data_etl_pipeline_spark.operators import clustering as C

    rng = np.random.default_rng(11)
    centers = np.array(
        [[10.0] * 64, [-10.0] * 64, [10.0] * 32 + [-10.0] * 32, [0.0] * 64]
    )
    # Interleave ids (id % 4 == blob) so the deterministic smallest-id
    # init seeds one centroid per blob — smallest-id init is the
    # oracle-parity contract, and like any fixed init it cannot split a
    # blob it never seeded (see kmeans_lloyd docstring).
    rows = []
    for b, mu in enumerate(centers):
        for j in range(25):
            v = mu + 0.1 * rng.standard_normal(64)
            rows.append((j * 4 + b, [float(x) for x in v], b))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = C.kmeans_lloyd(emb, k=4, n_iter=3).collect()
    by_blob: dict[int, set[int]] = {}
    for r in out:
        by_blob.setdefault(r["vec_id"] % 4, set()).add(r["cell"])
    assert all(len(cells) == 1 for cells in by_blob.values()), by_blob
    assert len({next(iter(c)) for c in by_blob.values()}) == 4
    # tight blobs: every member sits close to its centroid
    assert all(r["dist"] < 64 * 0.5 for r in out)


def test_kmeans_exact_and_plain_folds_agree(spark):
    """The production plain-SUM update mode must produce the same
    assignments as the oracle-exact sequential-fold mode (float error
    ~1e-13 relative never flips an argmin on real data)."""
    from plc_data_etl_pipeline_spark.catalog import load
    from plc_data_etl_pipeline_spark.operators import clustering as C

    emb = load(spark, SF_DIR, "embeddings")
    exact = {
        (r["vec_id"], r["cell"])
        for r in C.kmeans_lloyd(emb, k=8, n_iter=3, exact_folds=True).collect()
    }
    plain = {
        (r["vec_id"], r["cell"])
        for r in C.kmeans_lloyd(
            emb, k=8, n_iter=3, exact_folds=False
        ).collect()
    }
    assert exact == plain


def test_kmeans_null_vectors_excluded_zero_vectors_kept(spark):
    """NULL embeddings drop (no distance defined); all-zero vectors are
    legitimate L2 points and must cluster, unlike the cosine paths."""
    from plc_data_etl_pipeline_spark.operators import clustering as C

    rows = [
        (0, [1.0] * 64),
        (1, None),
        (2, [0.0] * 64),
        (3, [1.0] * 64),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in C.kmeans_lloyd(emb, k=2, n_iter=2).collect()}
    assert set(out) == {0, 2, 3}
    assert out[0]["cell"] == out[3]["cell"]
    assert out[2]["cell"] != out[0]["cell"]
    assert out[2]["dist"] == 0.0


def test_quality_classifier_matches_hand_computation(spark, tmp_path):
    """The hashed-linear-classifier score equals a pure-Python
    recomputation of the same feature hashing + mean pooling."""
    import hashlib

    from plc_data_etl_pipeline_spark.queries.extensions import (
        text_quality_classifier,
    )

    text = "alpha beta gamma"
    docs_pd = __import__("pandas").DataFrame(
        {
            "doc_id": [1],
            "text": [text],
            "lang": ["en"],
            "source": ["s"],
            "n_chars": [len(text)],
        }
    )
    sf = str(tmp_path)
    docs_pd.to_parquet(f"{sf}/documents.parquet")
    words = text.split(" ")
    feats = words + [f"{a} {b}" for a, b in zip(words, words[1:])]

    def weight(f):
        h = int(hashlib.md5(f.encode()).hexdigest()[:8], 16)
        return h % 2001 - 1000

    wsum = sum(weight(f) for f in feats)
    expected = round(wsum / 1000.0 / len(feats), 6)
    row = text_quality_classifier(spark, sf).collect()[0]
    assert row["n_feats"] == 5
    assert row["score"] == expected
    assert row["keep"] == (wsum / 1000.0 / len(feats) > 0.02)


def test_html_extract_strips_boilerplate_and_decodes_entities(spark):
    """Script/style/tag content must never leak into training text;
    entities decode once (no &amp;lt; double-decode); NULLs propagate."""
    from plc_data_etl_pipeline_spark.operators import text as T

    docs = spark.createDataFrame(
        [
            (1, "alpha beta"),
            (2, "literal &amp;lt; stays lt"),  # double-decode trap
            (3, None),
        ],
        "doc_id long, text string",
    )
    h = T.synthesize_html(docs)
    out = {
        r["doc_id"]: r
        for r in h.select(
            "doc_id", T.html_extract(F.col("html")).alias("body")
        ).collect()
    }
    body1 = out[1]["body"]
    assert "alpha beta" in body1
    for leaked in ("evil", "tracker", "color:red", "script", "nav"):
        assert leaked not in body1, f"boilerplate leaked: {leaked}"
    assert 'Tom & Jerry <3 "quoted" text' in body1
    assert "Home & About" in body1
    assert "  " not in body1  # whitespace collapsed
    # &amp;lt; decodes to &lt; exactly once, never to '<'
    assert "&lt; stays lt" in out[2]["body"]
    assert "< stays lt" not in out[2]["body"].replace("&lt;", "")
    assert out[3]["body"] is None


def test_html_extract_multiline_and_uppercase_script(spark):
    """Real pages write <SCRIPT> and multi-line bodies; the (?is)
    subtree drop must strip them on BOTH engines (without DOTALL the
    lazy match stops at a newline and the JS body leaks)."""
    import duckdb

    from plc_data_etl_pipeline_spark.operators import text as T

    html = (
        '<html><head><SCRIPT type="text/javascript">\n'
        "var tracker = 1;\nsend(tracker);\n</SCRIPT>"
        "<STYLE>\nbody { color: red }\n</STYLE></head>"
        "<body><p>keep this\ntext</p></body></html>"
    )
    df = spark.createDataFrame([(html,)], "html string")
    body = df.select(T.html_extract(F.col("html")).alias("b")).collect()[0][
        "b"
    ]
    assert body == "keep this text"
    dd = duckdb.connect().execute(
        f"SELECT {T.sql_html_extract('?')}", [html]
    ).fetchone()[0]
    assert dd == body


def test_web_ingest_gates_are_non_vacuous(spark, tmp_path):
    """Each pipeline_web_ingest verdict must actually fire on its
    designed target: short gibberish fails the entropy gate (page
    chrome must NOT dilute it), duplicate pages lose survivor election
    (the doc_id-bearing title must NOT make bodies unique), NULL text
    is never a survivor, whitespace-bearing sources still pass the
    extraction audit, and healthy unique prose is admitted."""
    from plc_data_etl_pipeline_spark.registry import all_queries

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again"),
        (2, "0000000000000000"),                       # gibberish, 16 chars
        (3, "duplicate page body words here and more of them"),
        (4, "duplicate page body words here and more of them"),
        (5, None),                                     # NULL crawl
        (6, "white  space\trun\nsurvives the extraction audit fine"),
    ]
    spark.createDataFrame(rows, "doc_id int, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        r.doc_id: r
        for r in all_queries()["pipeline_web_ingest"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert out[1].admit is True
    assert out[2].keep_entropy is False and out[2].admit is False
    assert out[3].is_survivor is True and out[3].admit is True
    assert out[4].is_survivor is False and out[4].admit is False
    assert out[5].is_survivor is False and out[5].admit is False
    assert out[5].keep_extract is False and out[5].n_chars == 0
    assert out[6].keep_extract is True and out[6].admit is True


def test_hard_negatives_label_semantics(spark):
    """Hard negatives are NEVER same-label, NULL-label rows are excluded
    from both sides, and the nearest different-label vector wins rank 1."""
    rows = [
        (0, [1.0, 0.0], 1),       # query, label 1
        (1, [0.99, 0.1], 1),      # same label, most similar — must NOT appear
        (2, [0.9, 0.3], 2),       # different label — expected rank 1
        (3, [0.0, 1.0], 3),       # different label, orthogonal
        (4, [1.0, 0.01], None),   # NULL label — excluded entirely
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = S.hard_negatives(emb, query_max_id=1, k=3).collect()
    assert all(r.neighbor_label != r.query_label for r in out)
    assert all(r.neighbor_id != 4 for r in out), "NULL label leaked in"
    best = min(out, key=lambda r: r.rank)
    assert best.neighbor_id == 2


def test_weighted_sample_dup_texts_draw_independent_keys(spark, tmp_path):
    """The ES uniform is salted with doc_id: copies of one duplicated
    text must NOT share a key (unsalted, a hot dup could fill the whole
    top-k with one text), and heavier (longer) docs must dominate the
    sample vs a same-size light group."""
    from plc_data_etl_pipeline_spark.registry import all_queries

    heavy = "word " * 400
    rows = [(i, heavy.strip()) for i in range(200)] + [
        (1000 + i, f"tiny {i}") for i in range(200)
    ]
    spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "n_chars", F.length("text")
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = all_queries()["sample_weighted_topk"].fn(spark, str(tmp_path)).collect()
    keys = [r.es_key for r in out if r.doc_id < 1000]
    assert len(set(keys)) > 1, "duplicate texts drew one shared ES key"
    n_heavy = sum(1 for r in out if r.doc_id < 1000)
    assert n_heavy >= 90, f"length weighting too weak: {n_heavy}/100 heavy"


def test_mmr_first_pick_is_top_cosine_and_duplicates_defer(spark):
    """Planted geometry for mmr_diversify_topk: the corpus holds the
    query, an exact duplicate pair of the most-relevant direction, and
    one diverse-but-relevant direction. MMR must (1) open with the top
    cosine candidate, (2) rank the DIVERSE candidate above the
    duplicate of the already-selected one, (3) emit exactly k rows per
    query with mmr_rank 1..k."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),    # query
        (10, [0.99, 0.14, 0.0, 0.0]),  # most relevant
        (11, [0.99, 0.141, 0.0, 0.0]),  # near-duplicate of 10
        (12, [0.7, 0.0, 0.7, 0.0]),   # diverse, still relevant
        (13, [0.1, 0.0, 0.0, 0.99]),  # orthogonal-ish filler
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    got = (
        S.mmr_diversify_topk(emb, query_max_id=1, n_candidates=4, k=3,
                             lam=0.5)
        .orderBy("mmr_rank")
        .collect()
    )
    assert [r.mmr_rank for r in got] == [1, 2, 3]
    assert got[0].neighbor_id == 10, "first MMR pick must be top cosine"
    assert got[1].neighbor_id == 12, (
        "diverse candidate must outrank the duplicate of the selection"
    )
    assert got[2].neighbor_id in (11, 13)


def test_mmr_lambda_one_reduces_to_pure_relevance(spark):
    """With lam=1.0 the diversity penalty vanishes: MMR order must equal
    the exact cosine rank order for every query."""
    emb = load(spark, SF_DIR, "embeddings")
    base = {
        (r.query_id, r.rank): r.neighbor_id
        for r in S.cosine_topk_fold(emb, query_max_id=5, k=5).collect()
    }
    got = {
        (r.query_id, r.mmr_rank): r.neighbor_id
        for r in S.mmr_diversify_topk(
            emb, query_max_id=5, n_candidates=5, k=5, lam=1.0
        ).collect()
    }
    assert got == base


def test_unimax_waterfill_invariants(spark, tmp_path):
    """sample_unimax_budget's waterfilling on a planted corpus: capped
    languages get exactly MAX_EPOCHS passes, uncapped languages share
    one common water level, and the budget is exactly conserved
    (sum(alloc) == B whenever at least one language is uncapped)."""
    import pandas as pd

    from plc_data_etl_pipeline_spark.registry import all_queries

    # head lang 'aa' is 10x every tail lang: the 3x budget with a
    # 4-epoch cap must cap every tail lang and overflow to 'aa'
    rows = []
    did = 0
    for lang, n, chars in [("aa", 50, 100), ("bb", 5, 100),
                           ("cc", 5, 100), ("dd", 5, 100)]:
        for _ in range(n):
            rows.append((did, "x" * chars, lang, "s0", chars))
            did += 1
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["lang"]: r
        for r in all_queries()["sample_unimax_budget"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    total = 65 * 100
    budget = 3 * total
    for lang in ("bb", "cc", "dd"):
        assert out[lang]["capped"] is True
        assert out[lang]["epochs"] == 4.0
        assert out[lang]["alloc_tokens"] == 4 * 500
    assert out["aa"]["capped"] is False
    # budget conservation: head absorbs everything the caps freed
    assert out["aa"]["alloc_tokens"] == budget - 3 * 4 * 500
    assert abs(sum(r["alloc_tokens"] for r in out.values()) - budget) < 1e-6
    # head epochs strictly between 1 and the cap (overflow, not runaway)
    assert 1.0 < out["aa"]["epochs"] < 4.0


def _py_temperature_waterfill(tokens: dict, alpha: float, epochs: int,
                              budget_x: int) -> dict:
    """Plain-Python reference for the weighted waterfill
    alloc_d = min(cap_d, lam*q_d), sum = B: bisection on lam, mirroring
    the engine's floored micro-unit q weights."""
    import math

    caps = {lg: epochs * t for lg, t in tokens.items()}
    q = {
        lg: math.floor(
            (math.sqrt(t) if alpha == 0.5 else t ** alpha) * 1_000_000
        )
        for lg, t in tokens.items()
    }
    budget = budget_x * sum(tokens.values())
    if budget >= sum(caps.values()):
        return dict(caps)
    lo, hi = 0.0, max(caps[lg] / q[lg] for lg in tokens) * 2
    for _ in range(200):
        mid = (lo + hi) / 2
        s = sum(min(caps[lg], mid * q[lg]) for lg in tokens)
        if s < budget:
            lo = mid
        else:
            hi = mid
    lam = (lo + hi) / 2
    return {lg: min(caps[lg], lam * q[lg]) for lg in tokens}


def test_temperature_mix_invariants(spark, tmp_path):
    """sample_temperature_mix on a planted skewed corpus: the 2x budget
    with a 4-epoch cap must cap the TINY tail language (temperature
    upweighting pushes it to the ceiling), conserve the budget exactly,
    and give mid languages a budget share ABOVE proportional-to-size
    (the flattening) while the head stays below the cap."""
    import pandas as pd

    from plc_data_etl_pipeline_spark.registry import all_queries

    rows, did = [], 0
    sizes = [("aa", 100, 100), ("bb", 10, 100), ("cc", 1, 100)]
    for lang, n, chars in sizes:
        for _ in range(n):
            rows.append((did, "x" * chars, lang, "s0", chars))
            did += 1
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["lang"]: r
        for r in all_queries()["sample_temperature_mix"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    total = 111 * 100
    budget = 2 * total
    # sqrt-upweighting pushes BOTH tail languages to the 4-epoch cap
    # (bb's uncapped share lam*q_bb ~ 4955 > cap 4000); the head absorbs
    # the freed budget and stays under the cap
    assert out["cc"]["capped"] is True and out["cc"]["epochs"] == 4.0
    assert out["bb"]["capped"] is True and out["bb"]["epochs"] == 4.0
    assert out["aa"]["capped"] is False
    # budget conservation with at least one language uncapped
    assert abs(sum(r["alloc_tokens"] for r in out.values()) - budget) < 0.05
    # flattening, not equalizing: the tail trains more epochs than the
    # head, but the head keeps the larger absolute budget share
    assert out["cc"]["epochs"] > out["aa"]["epochs"]
    assert out["bb"]["budget_share"] < out["aa"]["budget_share"]
    # against the Python waterfill reference
    ref = _py_temperature_waterfill(
        {"aa": 10000, "bb": 1000, "cc": 100}, 0.5, 4, 2
    )
    for lg in ("aa", "bb", "cc"):
        assert abs(out[lg]["alloc_tokens"] - ref[lg]) < 0.05, lg


def test_temperature_mix_alpha_sweep(spark):
    """temperature_mix_alloc across alpha in {0.3, 0.5, 0.7, 1.0} vs the
    bisection reference: allocations agree everywhere, tail epochs rise
    monotonically as alpha falls (more flattening), and alpha=1 is the
    proportional allocator (equal epochs when nothing caps)."""
    import pytest as _pytest

    from plc_data_etl_pipeline_spark.queries.curation import (
        temperature_mix_alloc,
    )

    tokens = {"aa": 640_000, "bb": 40_000, "cc": 2_500, "dd": 900}
    roster = spark.createDataFrame(
        [(lg, 1, t) for lg, t in tokens.items()],
        "lang string, n_docs long, tokens long",
    )
    tail_epochs = {}
    for alpha in (0.3, 0.5, 0.7, 1.0):
        out = {
            r["lang"]: r
            for r in temperature_mix_alloc(roster, alpha=alpha).collect()
        }
        ref = _py_temperature_waterfill(tokens, alpha, 4, 2)
        for lg in tokens:
            assert abs(out[lg]["alloc_tokens"] - ref[lg]) <= max(
                0.05, 1e-9 * ref[lg]
            ), (alpha, lg)
        tail_epochs[alpha] = out["dd"]["epochs"]
    assert tail_epochs[0.3] >= tail_epochs[0.5] >= tail_epochs[0.7] \
        >= tail_epochs[1.0]
    # alpha=1: proportional => every uncapped language trains the same
    # number of epochs (budget_x) when no cap binds
    out1 = {
        r["lang"]: r
        for r in temperature_mix_alloc(roster, alpha=1.0).collect()
    }
    if not any(r["capped"] for r in out1.values()):
        eps = {r["epochs"] for r in out1.values()}
        assert max(eps) - min(eps) < 1e-3
    with _pytest.raises(ValueError, match="alpha"):
        temperature_mix_alloc(roster, alpha=1.5)


def test_bigram_kn_logprob_matches_hand_model_and_normalizes(spark, tmp_path):
    """Round-8 KN bigram LM: (1) the engine's per-doc mean log-prob
    equals a pure-Python reimplementation of the interpolated
    absolute-discount formula on a planted corpus (to the query's
    ROUND 4); (2) the smoothed distribution normalizes EXACTLY:
    sum over the model vocabulary of P(w2|w1) == 1 for every context
    w1 — the property that distinguishes Kneser-Ney's continuation
    weighting from ad-hoc discounting."""
    import math
    from collections import Counter

    import pandas as pd

    texts = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "a cat and a dog",
        "solo",                      # 1 word -> no bigrams, must be absent
    ]
    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": texts,
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [len(t) for t in texts],
        }
    )
    sf = str(tmp_path)
    docs.to_parquet(f"{sf}/documents.parquet")

    # hand model: identical arithmetic to the query
    d = 0.75
    bigrams = []
    per_doc: dict[int, list[tuple[str, str]]] = {}
    for i, t in enumerate(texts, start=1):
        ws = t.split(" ")
        prs = list(zip(ws, ws[1:]))
        per_doc[i] = prs
        bigrams.extend(prs)
    c2 = Counter(bigrams)
    c1 = Counter()
    n1fw = Counter()
    n1bw = Counter()
    for (w1, w2), c in c2.items():
        c1[w1] += c
        n1fw[w1] += 1
        n1bw[w2] += 1
    nbig = float(len(c2))

    def p(w1, w2):
        return (
            max(c2.get((w1, w2), 0) - d, 0.0)
            + d * n1fw[w1] * (n1bw[w2] / nbig)
        ) / c1[w1]

    # normalization: over every (context, vocab-word) pair, incl. zeros
    vocab = {w for pr in c2 for w in pr}
    for w1 in c1:
        assert abs(sum(p(w1, w2) for w2 in vocab) - 1.0) < 1e-12, w1

    from plc_data_etl_pipeline_spark.queries.extensions import (
        text_bigram_kn_logprob,
    )

    got = {r["doc_id"]: r for r in text_bigram_kn_logprob(spark, sf).collect()}
    assert set(got) == {1, 2, 3}, "the 1-word doc must produce no row"
    for doc_id, prs in per_doc.items():
        if not prs:
            continue
        want = round(sum(math.log(p(*pr)) for pr in prs) / len(prs), 4)
        assert got[doc_id]["n_bigrams"] == len(prs)
        assert abs(got[doc_id]["avg_logprob"] - want) <= 1e-4, doc_id
