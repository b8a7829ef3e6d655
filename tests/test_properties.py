"""Property-based tests (hypothesis, SURVEY §5.2.4): randomized small
frames through Spark vs DuckDB for the core relational semantics, plus
algebraic invariants (dedup idempotence, union/count linearity).

Integer-valued frames keep the comparison exact (float determinism has
its own convention + tests); nulls and duplicates are generated
deliberately since they are where join/agg/dedup semantics diverge
between engines when someone gets them wrong.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from plc_data_etl_pipeline_spark.operators.dedup import exact_dedup

from .oracle_compare import compare

KEYS = st.integers(min_value=0, max_value=5)
VALS = st.one_of(st.none(), st.integers(min_value=-1000, max_value=1000))

ROWS = st.lists(st.tuples(KEYS, VALS), min_size=0, max_size=40)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _spark_df(spark, rows, cols="k int, v int"):
    return spark.createDataFrame([tuple(r) for r in rows], cols)


def _duck(rows, sql, cols=("k", "v")):
    con = duckdb.connect()
    pdf = pd.DataFrame(rows, columns=list(cols)).astype("object")
    con.register("t", pdf)
    con.execute(
        "CREATE TABLE tt AS SELECT "
        + ", ".join(f"CAST({c} AS INT) AS {c}" for c in cols)
        + " FROM t"
    )
    rel = con.sql(sql)
    return [d[0] for d in rel.description], rel.fetchall()


@given(rows=ROWS)
@_SETTINGS
def test_groupby_agg_matches_duckdb(spark, rows):
    df = _spark_df(spark, rows)
    from pyspark.sql import functions as F

    got = df.groupBy("k").agg(
        F.count("*").alias("n"),
        F.count("v").alias("n_nonnull"),
        F.sum("v").alias("s"),
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
    )
    oc, orows = _duck(
        rows,
        "SELECT k, COUNT(*) AS n, COUNT(v) AS n_nonnull, "
        "CAST(SUM(v) AS BIGINT) AS s, MIN(v) AS mn, MAX(v) AS mx FROM tt GROUP BY k",
    )
    problems = compare(got.columns, [tuple(r) for r in got.collect()], oc, orows)
    assert not problems, problems


@given(rows=ROWS, rows2=ROWS)
@_SETTINGS
def test_inner_join_multiplicity_matches_duckdb(spark, rows, rows2):
    a = _spark_df(spark, rows)
    b = _spark_df(spark, rows2, "k int, w int")
    got = a.join(b, "k").select("k", "v", "w")
    con_cols, con_rows = _duck_join(rows, rows2)
    problems = compare(got.columns, [tuple(r) for r in got.collect()], con_cols, con_rows)
    assert not problems, problems


def _duck_join(rows, rows2):
    con = duckdb.connect()
    con.register("ta", pd.DataFrame(rows, columns=["k", "v"]).astype("object"))
    con.register("tb", pd.DataFrame(rows2, columns=["k", "w"]).astype("object"))
    con.execute("CREATE TABLE a AS SELECT CAST(k AS INT) k, CAST(v AS INT) v FROM ta")
    con.execute("CREATE TABLE b AS SELECT CAST(k AS INT) k, CAST(w AS INT) w FROM tb")
    rel = con.sql("SELECT a.k AS k, v, w FROM a JOIN b ON a.k = b.k")
    return [d[0] for d in rel.description], rel.fetchall()


@given(rows=ROWS)
@_SETTINGS
def test_window_running_count_matches_duckdb(spark, rows):
    rows = [(i, k, v) for i, (k, v) in enumerate(rows)]  # unique order col
    df = spark.createDataFrame(rows, "i int, k int, v int")
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.partitionBy("k").orderBy("i").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    got = df.select("i", "k", F.count("v").over(w).alias("rc"))
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["i", "k", "v"]).astype("object"))
    con.execute(
        "CREATE TABLE tt AS SELECT CAST(i AS INT) i, CAST(k AS INT) k, "
        "CAST(v AS INT) v FROM t"
    )
    rel = con.sql(
        "SELECT i, k, CAST(COUNT(v) OVER (PARTITION BY k ORDER BY i "
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS rc FROM tt"
    )
    problems = compare(
        got.columns,
        [tuple(r) for r in got.collect()],
        [d[0] for d in rel.description],
        rel.fetchall(),
    )
    assert not problems, problems


@given(rows=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 3)), max_size=30))
@_SETTINGS
def test_dedup_idempotent(spark, rows):
    """dedup(dedup(x)) == dedup(x) and survivors are minimal ids."""
    rows = [(i, f"c{k}") for i, (k, _) in enumerate(rows)]
    df = spark.createDataFrame(rows, "id int, content string")
    once = exact_dedup(df, ["content"], "id")
    twice = exact_dedup(once, ["content"], "id")
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b
    # survivor is the min id per content group
    want = sorted(
        (min(i for i, c2 in rows if c2 == c), c) for c in {c for _, c in rows}
    )
    assert a == want


@given(rows=ROWS, rows2=ROWS)
@_SETTINGS
def test_union_count_linearity(spark, rows, rows2):
    a = _spark_df(spark, rows)
    b = _spark_df(spark, rows2)
    assert a.unionAll(b).count() == len(rows) + len(rows2)


@given(rows=ROWS)
@_SETTINGS
def test_filter_conjunction_decomposition(spark, rows):
    """filter(a AND b) == filter(a).filter(b) — the rewrite Catalyst's
    predicate pushdown relies on."""
    from pyspark.sql import functions as F

    df = _spark_df(spark, rows)
    a = F.col("k") > 2
    b = F.col("v").isNotNull() & (F.col("v") % 2 == 0)
    one = sorted(map(tuple, df.filter(a & b).collect()))
    two = sorted(map(tuple, df.filter(a).filter(b).collect()))
    assert one == two


@given(rows=ROWS)
@_SETTINGS
def test_sort_limit_prefix_law(spark, rows):
    """orderBy(...).limit(k) equals the k-prefix of the full sort (with a
    unique tiebreaker) — TakeOrderedAndProject's contract."""
    from pyspark.sql import functions as F

    rows = [(i, k, v) for i, (k, v) in enumerate(rows)]
    df = spark.createDataFrame(rows, "i int, k int, v int")
    full = [
        (r.i, r.k) for r in df.orderBy(F.col("k").desc(), F.col("i")).collect()
    ]
    got = [
        (r.i, r.k)
        for r in df.orderBy(F.col("k").desc(), F.col("i")).limit(5).collect()
    ]
    assert got == full[:5]


FUNNEL_EVENTS = st.lists(
    st.tuples(
        st.integers(0, 4),                    # user
        st.sampled_from(["a", "b", "c"]),     # step type
        st.integers(0, 20),                   # time (ties deliberate)
    ),
    min_size=0,
    max_size=60,
)


@given(rows=FUNNEL_EVENTS)
@_SETTINGS
def test_funnel_matches_sequential_reference(spark, rows):
    """funnel_times vs a plain-Python sequential fold: t1 = min time of
    'a'; t_i = min time of step i at-or-after t_{i-1} — per user, for
    any interleaving, duplicate timestamps included."""
    from plc_data_etl_pipeline_spark.operators.events import funnel_times

    df = spark.createDataFrame(
        [(u, s, t) for u, s, t in rows], "user_id int, event_type string, ts int"
    )
    got = {
        r["user_id"]: (r["t1"], r["t2"], r["t3"])
        for r in funnel_times(df, ["a", "b", "c"]).collect()
    }
    got_agg = {
        r["user_id"]: (r["t1"], r["t2"], r["t3"])
        for r in funnel_times(
            df, ["a", "b", "c"], strategy="aggregate"
        ).collect()
    }
    assert got_agg == got  # both physical strategies, same semantics

    want = {}
    for u in {r[0] for r in rows}:
        evs = [(s, t) for (uu, s, t) in rows if uu == u]
        prev, ts_out = 0, []
        ok = True
        for step in ["a", "b", "c"]:
            cand = [t for (s, t) in evs if s == step and ok and t >= prev]
            if cand:
                prev = min(cand)
                ts_out.append(prev)
            else:
                ok = False
                ts_out.append(None)
        want[u] = tuple(ts_out)
    assert got == want


@given(rows=FUNNEL_EVENTS)
@_SETTINGS
def test_session_and_transition_invariants(spark, rows):
    """Structural laws on random event frames:
    - transitions: total count == n_events - n_active_users (each user
      contributes len(seq)-1 adjacent pairs)
    - sessions: per-user session count == 1 + (#gaps > threshold); the
      sum of per-session n_events equals the user's event count."""
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if not rows:
        return
    df = spark.createDataFrame(
        [(u, s, t) for u, s, t in rows], "user_id int, event_type string, ts int"
    ).withColumn("event_id", F.monotonically_increasing_id())

    # transitions law
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = df.select(F.lag("event_type").over(w).alias("prev"))
    n_trans = seq.where(F.col("prev").isNotNull()).count()
    n_users = df.select("user_id").distinct().count()
    assert n_trans == len(rows) - n_users

    # sessions law (gap threshold 5 in the integer ts domain)
    gap = F.col("ts") - F.lag("ts").over(w)
    new_s = F.when(gap.isNull() | (gap > 5), 1).otherwise(0)
    sess = df.withColumn(
        "sid", F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    per = sess.groupBy("user_id", "sid").agg(F.count("*").alias("n")).collect()
    # per-user: session ids are 1..k dense, and counts sum to events
    pdf = pd.DataFrame([(r["user_id"], r["sid"], r["n"]) for r in per],
                       columns=["u", "sid", "n"])
    for u, grp in pdf.groupby("u"):
        n_events_u = sum(1 for r in rows if r[0] == u)
        assert grp["n"].sum() == n_events_u
        sids = sorted(grp["sid"])
        assert sids == list(range(1, len(sids) + 1))


@given(
    rows=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 14)),  # (user, day)
        min_size=0,
        max_size=80,
    )
)
@_SETTINGS
def test_sliding_distinct_bitmap_matches_brute_force(spark, rows):
    """The bitmap fan-out must equal a brute-force 7-day window count
    on random (user, day) activity — empty days, singleton users and
    dense overlaps included."""
    from plc_data_etl_pipeline_spark.streaming import sliding_distinct as S
    from pyspark.sql import functions as F

    if not rows:
        return
    import datetime

    base = datetime.date(2024, 3, 1)
    ev = spark.createDataFrame(
        [
            (u, datetime.datetime.combine(base, datetime.time()) +
             datetime.timedelta(days=d, hours=1))
            for u, d in rows
        ],
        "user_id long, ts timestamp",
    )
    got = {
        (r["day"], r["n_users_7d"])
        for r in S.present(S._bucketize(ev)).collect()
    }
    days = sorted({d for _, d in rows})
    want = set()
    for d in days:
        active = {u for u, dd in rows if d - 6 <= dd <= d}
        want.add((base + datetime.timedelta(days=d), len(active)))
    assert got == want


# ---------------------------------------------------------------------------
# Exact-integer analytics vs DuckDB on randomized event frames
# (VERDICT r2 item 7: these are hand-derived algebraic rewrites where a
# fixed fixture can hide an overflow or NULL edge; hypothesis shakes the
# frame shape — ties, NULL value/ts, constant cells, single-row groups.)
# ---------------------------------------------------------------------------

EVENT_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),            # user_id
        st.integers(min_value=0, max_value=2),            # day offset
        st.integers(min_value=0, max_value=4),            # hour
        st.sampled_from(["click", "error", "view"]),      # event_type
        st.one_of(                                        # value cents
            st.none(), st.integers(min_value=-5000, max_value=5000)
        ),
        st.booleans(),                                    # ts present?
    ),
    min_size=1,
    max_size=50,
)


def _write_events(tmpdir, rows, minute_mod=60):
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    ts, uid, etype, val = [], [], [], []
    for i, (u, d, h, e, cents, has_ts) in enumerate(rows):
        ts.append(
            datetime.datetime(2024, 1, 1 + d, h, i % minute_mod)
            if has_ts
            else None
        )
        uid.append(u)
        etype.append(e)
        val.append(None if cents is None else cents / 100.0)
    table = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(etype, pa.string()),
            "value": pa.array(val, pa.float64()),
            "props": pa.array([None] * len(rows), pa.string()),
        }
    )
    pq.write_table(table, f"{tmpdir}/events.parquet")
    return str(tmpdir)


def _check_events_query(spark, tmp_path_factory, rows, name):
    from plc_data_etl_pipeline_spark.registry import all_queries

    sf_dir = _write_events(tmp_path_factory.mktemp("prop_events"), rows)
    qd = all_queries()[name]
    sdf = qd.fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf_dir}/events.parquet')"
        )
        rel = con.sql(qd.oracle)
        problems = compare(
            list(sdf.columns), srows, [d[0] for d in rel.description],
            rel.fetchall(),
        )
    finally:
        con.close()
    assert not problems, f"{name} diverges:\n" + "\n".join(problems)


@given(rows=EVENT_ROWS)
@_SETTINGS
def test_regression_trend_property(spark, tmp_path_factory, rows):
    _check_events_query(spark, tmp_path_factory, rows, "agg_regression_trend")


@given(rows=EVENT_ROWS)
@_SETTINGS
def test_anomaly_seasonal_property(spark, tmp_path_factory, rows):
    _check_events_query(spark, tmp_path_factory, rows, "dq_anomaly_seasonal")


@given(rows=EVENT_ROWS)
@_SETTINGS
def test_interp_linear_property(spark, tmp_path_factory, rows):
    _check_events_query(spark, tmp_path_factory, rows, "ts_interp_linear")


# --- sub-document dedup: the star-collapse + interval-union rewrite is a
# hand-derived algebraic transformation; pin it to a brute-force reference
# over randomized token corpora (tiny alphabet -> dense collisions).

WORD = st.sampled_from(["a", "b", "c"])
DOC = st.lists(WORD, min_size=0, max_size=12).map(lambda ws: " ".join(ws))
CORPUS = st.lists(DOC, min_size=0, max_size=8)


def _brute_substring(texts: list[str], k: int):
    """Naive per-doc k-gram duplicate coverage (the oracle semantics)."""
    grams: dict[str, int] = {}
    per_doc = []
    for t in texts:
        toks = t.split(" ")
        spans = [
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        ] if len(toks) >= k else []
        per_doc.append((toks, spans))
        for g in spans:
            grams[g] = grams.get(g, 0) + 1
    out = {}
    for doc_id, (toks, spans) in enumerate(per_doc):
        dup_pos = [i for i, g in enumerate(spans) if grams[g] >= 2]
        if not dup_pos:
            continue
        covered = set()
        for i in dup_pos:
            covered.update(range(i, i + k))
        out[doc_id] = (len(toks), len(dup_pos), len(covered))
    return out


@given(texts=CORPUS, k=st.integers(min_value=2, max_value=4))
@_SETTINGS
def test_substring_dup_spans_matches_bruteforce(spark, texts, k):
    from plc_data_etl_pipeline_spark.operators.dedup import substring_dup_spans

    df = spark.createDataFrame(
        list(enumerate(texts)) or [(0, None)], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: (r["n_tok"], r["dup_grams"], r["covered_tokens"])
        for r in substring_dup_spans(df, "doc_id", "text", k=k).collect()
    }
    want = _brute_substring(texts, k)
    assert got == want


def _brute_chunks(texts: list[str], width: int):
    """Naive corpus-global keep-first chunk dedup."""
    chunks = []  # (doc_id, idx, chunk)
    for doc_id, t in enumerate(texts):
        toks = t.split(" ")
        n = (len(toks) - 1) // width + 1  # >=1 chunk even for 1 token
        for j in range(n):
            chunks.append((doc_id, j, " ".join(toks[j * width : (j + 1) * width])))
    firsts = {}
    for doc_id, j, c in chunks:
        pack = doc_id * (1 << 20) + j
        if c not in firsts or pack < firsts[c]:
            firsts[c] = pack
    out = {}
    for doc_id, t in enumerate(texts):
        mine = [(j, c) for d, j, c in chunks if d == doc_id]
        kept = [
            (j, c)
            for j, c in mine
            if firsts[c] == doc_id * (1 << 20) + j
        ]
        cleaned = " ".join(c for _, c in sorted(kept)) if kept else None
        out[doc_id] = (len(mine), len(kept), cleaned)
    return out


@given(texts=CORPUS, width=st.integers(min_value=2, max_value=4))
@_SETTINGS
def test_chunk_dedup_matches_bruteforce(spark, texts, width):
    from plc_data_etl_pipeline_spark.operators.dedup import chunk_dedup

    df = spark.createDataFrame(
        list(enumerate(texts)) or [(0, None)], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: (r["n_chunks"], r["kept_chunks"], r["cleaned_text"])
        for r in chunk_dedup(df, "doc_id", "text", chunk_tokens=width).collect()
    }
    want = _brute_chunks(texts, width)
    assert got == want


def _brute_common_chunks(texts: list[str], width: int, min_docs: int):
    """Naive CCNet-style delete-all-copies-of-common-chunks."""
    per_doc = {}
    df_count: dict[str, set[int]] = {}
    for doc_id, t in enumerate(texts):
        toks = t.split(" ")
        n = (len(toks) - 1) // width + 1
        cs = [" ".join(toks[j * width : (j + 1) * width]) for j in range(n)]
        per_doc[doc_id] = cs
        for c in set(cs):
            df_count.setdefault(c, set()).add(doc_id)
    common = {c for c, docs in df_count.items() if len(docs) >= min_docs}
    out = {}
    for doc_id, cs in per_doc.items():
        kept = [c for c in cs if c not in common]
        out[doc_id] = (
            len(cs),
            len(cs) - len(kept),
            " ".join(kept) if kept else None,
        )
    return out


@given(
    texts=CORPUS,
    width=st.integers(min_value=1, max_value=4),
    min_docs=st.integers(min_value=2, max_value=3),
)
@_SETTINGS
def test_common_chunk_filter_matches_bruteforce(spark, texts, width, min_docs):
    from plc_data_etl_pipeline_spark.operators.dedup import common_chunk_filter

    df = spark.createDataFrame(
        list(enumerate(texts)) or [(0, None)], "doc_id int, text string"
    )
    got = {
        r["doc_id"]: (r["n_chunks"], r["dropped_chunks"], r["cleaned_text"])
        for r in common_chunk_filter(
            df, "doc_id", "text", chunk_tokens=width, min_docs=min_docs
        ).collect()
    }
    want = _brute_common_chunks(texts, width, min_docs)
    assert got == want


@given(
    member=st.lists(st.text("ab", min_size=1, max_size=6), min_size=0,
                    max_size=25, unique=True),
    probe=st.lists(st.text("abc", min_size=1, max_size=6), min_size=0,
                   max_size=25, unique=True),
)
@_SETTINGS
def test_bloom_never_false_negative(spark, member, probe):
    """Whatever the corpus/probe mix, a probe row whose content IS in
    the corpus is never admitted as new — the Bloom guarantee the
    ingest gate leans on (false positives are allowed and bounded by
    the sibling envelope test)."""
    from plc_data_etl_pipeline_spark.operators.dedup import (
        bloom_build,
        bloom_incremental_new,
    )

    corpus = spark.createDataFrame(
        list(enumerate(member)) or [(0, None)], "doc_id int, text string"
    ).filter("text IS NOT NULL")
    batch = spark.createDataFrame(
        list(enumerate(probe)) or [(0, None)], "doc_id int, text string"
    ).filter("text IS NOT NULL")
    bloom = bloom_build(corpus, ["text"], n_bits=1 << 12, n_hashes=3)
    admitted = {
        r["text"]
        for r in bloom_incremental_new(
            batch, bloom, ["text"], "doc_id", n_bits=1 << 12, n_hashes=3
        ).collect()
    }
    assert not admitted.intersection(set(member))


@given(
    rows=ROWS,
    rows2=ROWS,
    buckets=st.integers(min_value=1, max_value=5),
    share=st.sampled_from([0.0, 0.2, 0.9]),
)
@_SETTINGS
def test_salted_hot_join_multiplicity_property(spark, rows, rows2, buckets, share):
    """salted_join_hot == plain inner join on ANY frame pair, for any
    bucket count and hot-share (including share=0: everything salted;
    share=0.9: sampling flags almost nothing) — the salt must change
    execution, never multiplicity. Small-side keys are deduped first
    (the operator's small-side contract, same as salted_join's)."""
    from plc_data_etl_pipeline_spark.operators.scale import salted_join_hot

    big = _spark_df(spark, rows)
    small = _spark_df(spark, [(k, v) for k, v in rows2], "k int, w int").dropDuplicates(
        ["k"]
    )
    key = lambda t: tuple(str(x) for x in t)  # None-safe total order
    plain = sorted(
        map(tuple, big.join(small, "k").select("k", "v", "w").collect()),
        key=key,
    )
    salted = sorted(
        map(
            tuple,
            salted_join_hot(
                big, small, "k", salt_buckets=buckets,
                sample_fraction=1.0, hot_share=share,
            ).select("k", "v", "w").collect(),
        ),
        key=key,
    )
    assert salted == plain


# --- round-5 closing profiling operators over random events: NULL ts
# (explicit NULLS FIRST in the order-dependent oracles), NULL values,
# negative readings, tiny/degenerate series all land here.


@given(rows=EVENT_ROWS)
@_SETTINGS
def test_autocorr_property(spark, tmp_path_factory, rows):
    _check_events_query(spark, tmp_path_factory, rows, "ts_autocorr")


@given(rows=EVENT_ROWS)
@_SETTINGS
def test_periodogram_property(spark, tmp_path_factory, rows):
    _check_events_query(spark, tmp_path_factory, rows, "ts_periodogram")


@given(rows=EVENT_ROWS)
@_SETTINGS
def test_l_diversity_property(spark, tmp_path_factory, rows):
    _check_events_query(spark, tmp_path_factory, rows, "dq_l_diversity")


@given(rows=EVENT_ROWS)
@_SETTINGS
def test_changepoint_cusum_property(spark, tmp_path_factory, rows):
    _check_events_query(spark, tmp_path_factory, rows, "ts_changepoint_cusum")


# --- Pareto frontier vs brute-force dominance: the oracle shares the
# running-max formulation, so this is the INDEPENDENT check (O(n^2)
# dominance in plain Python), tie-heavy by construction.

PARETO_DOCS = st.lists(
    st.tuples(
        st.text(alphabet="ab ", min_size=0, max_size=12),  # text
        st.integers(min_value=0, max_value=6),             # n_chars (ties!)
        st.sampled_from(["en", "de"]),                     # lang
    ),
    min_size=0,
    max_size=25,
)


@given(docs=PARETO_DOCS)
@_SETTINGS
def test_pareto_frontier_matches_bruteforce(spark, tmp_path_factory, docs):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from plc_data_etl_pipeline_spark.registry import all_queries

    tmpdir = tmp_path_factory.mktemp("prop_pareto")
    table = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array([t for (t, _n, _l) in docs], pa.string()),
            "lang": pa.array([l for (_t, _n, l) in docs], pa.string()),
            "source": pa.array(["s"] * len(docs), pa.string()),
            "n_chars": pa.array([n for (_t, n, _l) in docs], pa.int64()),
        }
    )
    pq.write_table(table, f"{tmpdir}/documents.parquet")

    got = {
        (r["lang"], r["doc_id"])
        for r in all_queries()["curation_pareto_frontier"]
        .fn(spark, str(tmpdir))
        .collect()
    }

    def scores(t, n):
        words = t.split(" ")
        return n, (len(set(words)) * 1000000) // max(len(words), 1)

    expected = set()
    for i, (t, n, lang) in enumerate(docs):
        q1, q2 = scores(t, n)
        dominated = any(
            l2 == lang
            and (p1 >= q1 and p2 >= q2)
            and (p1 > q1 or p2 > q2)
            for j, (t2, n2, l2) in enumerate(docs)
            if j != i
            for (p1, p2) in [scores(t2, n2)]
        )
        if not dominated:
            expected.add((lang, i))
    assert got == expected


# --- collocation lift vs brute-force counting: the oracle shares the
# marginals-of-pair-counts formulation, so this recounts every bigram
# in plain Python and recomputes lift from scratch.

COLLOC_DOCS = st.lists(
    st.text(alphabet="abc ", min_size=0, max_size=30),
    min_size=0,
    max_size=15,
)


@given(texts=COLLOC_DOCS)
@_SETTINGS
def test_collocations_lift_matches_bruteforce(spark, tmp_path_factory, texts):
    from collections import Counter

    import pyarrow as pa
    import pyarrow.parquet as pq

    from plc_data_etl_pipeline_spark.registry import all_queries

    tmpdir = tmp_path_factory.mktemp("prop_colloc")
    table = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["s"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(table, f"{tmpdir}/documents.parquet")

    got = {
        (r["w1"], r["w2"]): (r["pair_n"], r["lift"])
        for r in all_queries()["text_collocations_lift"]
        .fn(spark, str(tmpdir))
        .collect()
    }

    pairs = Counter()
    for t in texts:
        w = t.split(" ")
        for i in range(len(w) - 1):
            pairs[(w[i], w[i + 1])] += 1
    nb = sum(pairs.values())
    left, right = Counter(), Counter()
    for (w1, w2), c in pairs.items():
        left[w1] += c
        right[w2] += c
    import math

    expected = {}
    for (w1, w2), cb in pairs.items():
        if cb < 5:
            continue
        lift = math.floor(
            (float(cb) * nb) / (float(left[w1]) * right[w2]) * 1000000.0
            + 0.5
        ) / 1000000.0
        expected[(w1, w2)] = (cb, lift)
    # the query cuts to top-100; the generator can't produce >100
    # qualifying pairs (alphabet of 4 chars), so sets compare directly
    assert len(expected) <= 100
    assert got == expected


# --- sequence-pattern matching vs a plain-Python regex reference:
# exercises the non-overlapping leftmost scan, ties in ts (broken by
# event_id), NULL timestamps (excluded), and unknown event codes.

PATTERN_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),             # user_id
        st.integers(min_value=0, max_value=1),             # day offset
        st.integers(min_value=0, max_value=3),             # hour
        st.sampled_from(
            ["view", "click", "purchase", "signup", "error", "other"]
        ),
        st.just(0),                                        # value cents
        st.booleans(),                                     # ts present?
    ),
    min_size=0,
    max_size=40,
)


@given(rows=PATTERN_ROWS)
@_SETTINGS
def test_pattern_match_matches_python_re(spark, tmp_path_factory, rows):
    import datetime
    import re

    from plc_data_etl_pipeline_spark.registry import all_queries

    # minute_mod=2 forces REAL timestamp ties so the (ts, event_id)
    # tie-break is actually exercised (review finding: i %% 60 with
    # <=40 unique i never collides)
    sf_dir = _write_events(
        tmp_path_factory.mktemp("prop_pattern"), rows, minute_mod=2
    )
    got = {
        (r["user_id"], str(r["day"])): (
            r["seq_len"], r["n_matches"], r["max_match_len"],
            r["first_match"],
        )
        for r in all_queries()["event_pattern_match"]
        .fn(spark, sf_dir)
        .collect()
    }

    code = {"view": "v", "click": "c", "purchase": "p",
            "signup": "s", "error": "e"}
    series: dict = {}
    for i, (u, d, h, e, _c, has_ts) in enumerate(rows):
        if not has_ts:
            continue  # the query excludes timestamp-less rows
        ts = datetime.datetime(2024, 1, 1 + d, h, i % 2)
        series.setdefault((u, str(ts.date())), []).append(
            (ts, i, code.get(e, "x"))
        )
    expected = {}
    for key, evs in series.items():
        evs.sort(key=lambda r: (r[0], r[1]))
        seq = "".join(ch for (_t, _i, ch) in evs)
        hits = re.findall("e[vc]*p", seq)
        if hits:
            expected[key] = (
                len(seq), len(hits), max(len(x) for x in hits), hits[0]
            )
    assert got == expected


# --- round-6 NULL-ts hardening: the five pre-existing order/session-
# dependent operators now drop NULL-ts rows identically on both sides
# (engine filter + oracle WHERE) instead of relying on the generator's
# never-NULL-ts precondition. EVENT_ROWS generates NULL ts, NULL value,
# tie-heavy timestamps — exactly the domain that used to diverge.


@given(rows=EVENT_ROWS)
@_SETTINGS
def test_ewma_null_ts_property(spark, tmp_path_factory, rows):
    _check_events_query(spark, tmp_path_factory, rows, "ts_ewma")


@given(rows=EVENT_ROWS)
@_SETTINGS
def test_holt_trend_null_ts_property(spark, tmp_path_factory, rows):
    _check_events_query(spark, tmp_path_factory, rows, "ts_holt_trend")


@given(rows=EVENT_ROWS)
@_SETTINGS
def test_downsample_ohlc_null_ts_property(spark, tmp_path_factory, rows):
    _check_events_query(spark, tmp_path_factory, rows, "ts_downsample_ohlc")


@given(rows=EVENT_ROWS)
@_SETTINGS
def test_win_session_id_null_ts_property(spark, tmp_path_factory, rows):
    _check_events_query(spark, tmp_path_factory, rows, "win_session_id")


@given(rows=EVENT_ROWS)
@_SETTINGS
def test_stream_session_null_ts_property(spark, tmp_path_factory, rows):
    _check_events_query(spark, tmp_path_factory, rows, "stream_session")


# --- round-6: partition-pruned CDC merge vs a plain-Python reference.
# Random signed feeds over a month-partitioned table must produce the
# identical final state whether or not pruning fires (the feed's
# partition locality is random, so examples cover one-partition,
# many-partition, new-partition, delete-only and NULL-partition cases).

MAINT_OPS = st.lists(
    st.lists(  # one merge commit = a list of (pval, key, payload, sign)
        st.tuples(
            st.one_of(st.none(), st.integers(min_value=0, max_value=4)),
            st.integers(min_value=0, max_value=14),
            st.integers(min_value=0, max_value=99),
            st.sampled_from([1, -1]),
        ),
        min_size=0,
        max_size=8,
    ),
    min_size=1,
    max_size=4,
)


@given(commits=MAINT_OPS)
@_SETTINGS
def test_partitioned_merge_random_feeds_property(spark, tmp_path_factory, commits):
    from plc_data_etl_pipeline_spark.pipeline.txlog import (
        TransactionalParquetTable,
    )

    tmp = tmp_path_factory.mktemp("prop_pmerge")
    t = TransactionalParquetTable(spark, str(tmp / "t"), partition_by="p")
    seed = [(p, k, -1) for p in range(3) for k in range(3)]
    t.overwrite(
        spark.createDataFrame(seed, "p int, k int, payload int")
    )
    ref = {(p, k): -1 for (p, k, _x) in seed}
    null_rows: list = []
    for commit in commits:
        # net each commit to one version per key (the validated contract)
        net: dict = {}
        for (p, k, payload, sign) in commit:
            net[(p, k)] = (p, k, payload, sign)
        rows = list(net.values())
        if not rows:
            continue
        t.merge_apply_changes(
            spark.createDataFrame(
                rows, "p int, k int, payload int, _sign int"
            ),
            keys=["p", "k"],
        )
        for (p, k, payload, sign) in rows:
            if p is None:
                # SQL MERGE-on-equality semantics (Delta-faithful,
                # documented on merge_apply_changes): a NULL key
                # matches NO target row — positive rows APPEND, deletes
                # are no-ops.
                if sign > 0:
                    null_rows.append((p, k, payload))
            elif sign > 0:
                ref[(p, k)] = payload
            else:
                ref.pop((p, k), None)
    got = sorted(
        ((r["p"], r["k"], r["payload"]) for r in t.read().collect()),
        key=str,
    )
    want = sorted(
        [(p, k, v) for (p, k), v in ref.items()] + null_rows, key=str
    )
    assert got == want


def test_partitioned_merge_too_wide_feed_falls_back(spark, tmp_path, monkeypatch):
    """A feed touching more partitions than MAX_PRUNED_PARTITIONS must
    fall back to the full-snapshot merge and stay correct."""
    from plc_data_etl_pipeline_spark.pipeline import txlog as TX

    t = TX.TransactionalParquetTable(
        spark, str(tmp_path / "t"), partition_by="p"
    )
    t.overwrite(
        spark.createDataFrame(
            [(p, 0, "old") for p in range(6)], "p int, k int, v string"
        )
    )
    monkeypatch.setattr(
        TX.TransactionalParquetTable, "MAX_PRUNED_PARTITIONS", 2
    )
    ups = spark.createDataFrame(
        [(p, 0, "new", 1) for p in range(5)], "p int, k int, v string, _sign int"
    )
    t.merge_apply_changes(ups, keys=["p", "k"])
    got = sorted(map(tuple, t.read().collect()))
    assert got == [(p, 0, "new" if p < 5 else "old") for p in range(6)]


@given(rows=EVENT_ROWS)
@_SETTINGS
def test_stl_decompose_property(spark, tmp_path_factory, rows):
    """ts_stl_decompose over random events (NULL ts/value, tie-heavy
    minutes, negative readings): the exact-integer trend/seasonal
    pipeline must match the oracle on every generated corpus."""
    _check_events_query(spark, tmp_path_factory, rows, "ts_stl_decompose")


@given(rows=EVENT_ROWS)
@_SETTINGS
def test_stream_session_dynamic_null_ts_property(spark, tmp_path_factory, rows):
    """Round-8: the dynamic-gap twin gets the same NULL-ts hardening the
    static form got in r6 — Spark's session_window silently drops NULL
    timestamps while the oracle's NULL epoch rode the running-max window
    into phantom sessions (found by a planted probe, pinned here over
    the same tie-heavy NULL-generating domain)."""
    _check_events_query(spark, tmp_path_factory, rows, "stream_session_dynamic")


@given(rows=EVENT_ROWS)
@_SETTINGS
def test_stream_tumbling_null_ts_property(spark, tmp_path_factory, rows):
    """Round-8: window() drops NULL timestamps, the tumbling oracle
    grouped them under a NULL bucket — pinned after a planted probe."""
    _check_events_query(spark, tmp_path_factory, rows, "stream_tumbling")


@given(rows=EVENT_ROWS)
@_SETTINGS
def test_stream_sliding_null_ts_property(spark, tmp_path_factory, rows):
    """stream_sliding's oracle drops NULL ts structurally (ts >= s is
    NULL-false); pinned so a future oracle rewrite can't regress it."""
    _check_events_query(spark, tmp_path_factory, rows, "stream_sliding")


@given(rows=EVENT_ROWS)
@_SETTINGS
def test_win_moving_avg_null_ts_property(spark, tmp_path_factory, rows):
    """Round-8 NULL-ts sweep: a ts-ordered moving frame places NULL-ts
    rows first (Spark) vs last (DuckDB); both sides drop them now."""
    _check_events_query(spark, tmp_path_factory, rows, "win_moving_avg")


@given(rows=EVENT_ROWS)
@_SETTINGS
def test_event_transitions_null_ts_property(spark, tmp_path_factory, rows):
    """Round-8 NULL-ts sweep: NULL-ts rows injected phantom transitions
    at opposite ends of each user's sequence; both sides drop them."""
    _check_events_query(spark, tmp_path_factory, rows, "event_transitions")


@given(rows=EVENT_ROWS)
@_SETTINGS
def test_dq_drift_psi_null_ts_property(spark, tmp_path_factory, rows):
    """Round-8 NULL-ts sweep: a NULL ts belongs to neither time half —
    Spark's NULL comparison dropped it from both sums while the
    oracle's CASE ELSE counted it as 'after'; both sides drop it now."""
    _check_events_query(spark, tmp_path_factory, rows, "dq_drift_psi")
