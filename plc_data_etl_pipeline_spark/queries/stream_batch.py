"""Batch-checkable event-time window queries (SURVEY.md §2.2 streaming
row): the exact expressions streaming/windows.py runs under Structured
Streaming, executed in batch so the DuckDB oracle can verify them.

Oracle equivalences:
  tumbling  window(ts, '1 hour')            ≡ time_bucket(INTERVAL 1 HOUR, ts)
  sliding   window(ts, '1 hour', '30 min')  ≡ the two 30-min-aligned starts
            s ∈ {bucket30(ts), bucket30(ts) - 30min} with s <= ts < s + 1h
  session   session_window(ts, '10 min')    ≡ gaps-and-islands (lag + cumsum)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load
from ..registry import query
from ..streaming import windows as W

from ._conv import sql_cents

# cents-guard + in-domain count: see queries/_conv.py CENTS_CAP
# (round-8 extreme-float sweep).
_AGG_SQL = f"""
       COUNT(*) AS n_events,
       CAST(SUM({sql_cents('value')}) AS DOUBLE) / 100
         / COUNT({sql_cents('value')}) AS avg_value,
       MIN(value) AS min_value,
       MAX(value) AS max_value
"""


@query(
    "stream_tumbling",
    oracle=f"""
    SELECT STRFTIME(time_bucket(INTERVAL 1 HOUR, ts), '%Y-%m-%d %H:%M:%S')
             AS window_start,
           event_type,
           {_AGG_SQL}
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY time_bucket(INTERVAL 1 HOUR, ts), event_type
    """,
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time windows per event_type — identical
    expression runs streaming with a watermark (streaming/windows.py).
    NULL-ts rows are dropped identically on both sides (round-8: Spark's
    window() silently drops them, the oracle's time_bucket grouped them
    under a NULL window — same class as the session twins; the sliding
    form's WHERE already excluded them structurally)."""
    from pyspark.sql import functions as F

    return W.tumbling(
        load(spark, sf_dir, "events").filter(F.col("ts").isNotNull()),
        "1 hour",
    )


@query(
    "stream_sliding",
    oracle=f"""
    WITH starts AS (
      SELECT e.*, time_bucket(INTERVAL 30 MINUTES, ts) AS s FROM events e
      UNION ALL
      SELECT e.*, time_bucket(INTERVAL 30 MINUTES, ts) - INTERVAL 30 MINUTES AS s
      FROM events e
    )
    SELECT STRFTIME(s, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           {_AGG_SQL}
    FROM starts
    WHERE ts >= s AND ts < s + INTERVAL 1 HOUR
    GROUP BY s, event_type
    """,
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h size, 30 min slide): each event belongs to two
    windows; oracle materializes both aligned starts per event."""
    return W.sliding(load(spark, sf_dir, "events"), "1 hour", "30 minutes")


@query(
    "stream_session",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL 10 MINUTES
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session,
             event_id
      FROM events WHERE ts IS NOT NULL
    ), numbered AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    )
    SELECT STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           user_id,
           {_AGG_SQL}
    FROM numbered
    GROUP BY user_id, session_no
    """,
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (10-minute gap) per user via session_window();
    oracle reproduces the merge semantics with gaps-and-islands (an event
    exactly ``gap`` after its predecessor MERGES into the same session —
    Spark's session merge condition is inclusive, empirically pinned by
    tests/test_boundary_semantics.py and the round-7 hypothesis
    falsifying example). NULL-ts rows are dropped identically on
    both sides (r6 hardening): a streaming run could never see them
    anyway — event-time sessionization watermarks on ts — and the
    DuckDB twin's NULLS-LAST window order would otherwise diverge from
    Spark's session_window null handling."""
    from pyspark.sql import functions as F

    return W.session(
        load(spark, sf_dir, "events").filter(F.col("ts").isNotNull()),
        "10 minutes",
    )


@query(
    "stream_session_dynamic",
    oracle=f"""
    WITH t AS (
      SELECT user_id, ts, value, event_id,
             epoch_us(ts) AS tu,
             epoch_us(ts) + CASE WHEN event_type = 'purchase'
                                 THEN 1200000000 ELSE 600000000 END AS eu
      FROM events WHERE ts IS NOT NULL
    ), flagged AS (
      SELECT *,
             CASE WHEN MAX(eu) OVER prev IS NULL
                    OR tu > MAX(eu) OVER prev
                  THEN 1 ELSE 0 END AS new_session
      FROM t
      WINDOW prev AS (PARTITION BY user_id ORDER BY tu, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), numbered AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id
                                       ORDER BY tu, event_id
                                       ROWS UNBOUNDED PRECEDING) AS s
      FROM flagged
    )
    SELECT STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           user_id,
           {_AGG_SQL}
    FROM numbered
    GROUP BY user_id, s
    """,
)
def stream_session_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-gap session windows: purchases hold the session open 20
    minutes, other events 10 — the per-event timeout form
    (session_window with a Column gap) that static-gap sessionization
    can't express. The oracle reproduces interval-overlap merging with
    a running MAX of per-event window ends in exact integer
    microseconds (an event starting exactly at the running end MERGES —
    Spark's session merge condition is inclusive, empirically pinned by
    tests/test_boundary_semantics.py). NULL-ts rows are dropped
    identically on both sides (round-8: Spark's session_window silently
    drops them, but the oracle's NULL tu rode the running-max window
    into a phantom session — the r6 hardening had covered only the
    static-gap form; hypothesis property + planted boundary test)."""
    from pyspark.sql import functions as F

    return W.session_dynamic(
        load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    )


@query(
    "stream_enrich_static",
    oracle=f"""
    SELECT c.c_mktsegment, e.event_type,
           COUNT(*) AS n_events,
           CAST(SUM({sql_cents('e.value')}) AS DOUBLE)
             / 100 AS sum_value
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment, e.event_type
    """,
)
def stream_enrich_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment (batch twin): events broadcast-joined to
    the customer dimension, rolled up per (segment, event_type). The
    identical join body runs under Structured Streaming in
    tests/test_streaming.py with an AvailableNow trigger — the static
    side is re-read per micro-batch, never buffered in state."""
    from pyspark.sql import functions as F

    from ..streaming.joins import enrich_stream_with_dim
    from ._conv import dsum

    ev = load(spark, sf_dir, "events")
    dim = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        enrich_stream_with_dim(ev, dim)
        .groupBy("c_mktsegment", "event_type")
        .agg(F.count("*").alias("n_events"), dsum("value", "sum_value"))
    )


@query(
    "stream_join_interval",
    oracle="""
    SELECT e.user_id, e.event_id AS error_id, p.event_id AS purchase_id,
           STRFTIME(e.ts, '%Y-%m-%d %H:%M:%S') AS error_time,
           STRFTIME(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_time,
           p.value AS purchase_value
    FROM events e JOIN events p
      ON e.user_id = p.user_id
     AND p.ts >= e.ts AND p.ts <= e.ts + INTERVAL 10 MINUTE
    WHERE e.event_type = 'error' AND p.event_type = 'purchase'
    """,
)
def stream_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stream-stream interval join
    (streaming/joins.py::error_purchase_pairs): each error paired with
    the same user's purchases in the following 10 minutes. The exact
    same function body runs as a watermarked two-stream join (the
    interval bounds are what let Spark evict buffered state —
    tests/test_streaming.py proves streaming/batch convergence); here
    the batch form is value-checked against the SQL self-join."""
    from ..streaming.joins import error_purchase_pairs

    return error_purchase_pairs(load(spark, sf_dir, "events"))


@query(
    "stream_join_interval_outer",
    oracle="""
    SELECT e.user_id, e.event_id AS error_id,
           STRFTIME(e.ts, '%Y-%m-%d %H:%M:%S') AS error_time,
           p.event_id AS purchase_id, p.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id
     AND p.ts >= e.ts AND p.ts <= e.ts + INTERVAL 10 MINUTE
    """,
)
def stream_join_interval_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER stream-stream interval join — the null-emission form
    stream_join_interval's inner join can't express: every error event
    emits at least one row, with NULL purchase columns when no purchase
    followed within 10 minutes. In streaming this is the semantically
    hard case — the engine may emit the null row only once the
    watermark PROVES no match can still arrive (state eviction doubles
    as negative evidence); in batch the same join condition under
    how='left' gives the final answer directly, which is what the
    oracle checks. The body is streaming/joins.py::
    error_purchase_pairs_outer, built ON the existing interval_join
    (how='left') and shared verbatim with the streaming convergence
    test in tests/test_streaming.py — query and test cannot drift
    (round-6 review replaced a hand-rolled copy). Watermark-bounded
    state like the inner form: O(rate x interval), never the stream
    length."""
    from ..streaming.joins import error_purchase_pairs_outer

    return error_purchase_pairs_outer(load(spark, sf_dir, "events"))


@query("stream_heavy_hitters", oracle=None)  # order-dependent sketch state
def stream_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries frequent-users sketch per event type, batch form:
    the events table folded in (ts, event_id) order through the SAME
    pure mg_step the streaming operator
    (streaming/stateful.py::heavy_hitters_stream) applies per
    micro-batch — deterministic, so rows are stable across runs, but
    the counter VALUES are a function of arrival order (no SQL twin
    exists; Misra & Gries 1982). The pytest contract is the classic
    guarantee pinned against exact batch counts: every user above
    n/k of an event type's volume survives in the candidates, and no
    counter overestimates (underestimate bounded by n/k); plus the
    chunk-invariance (split-anywhere) property that justifies resuming
    from GroupState, and a streaming-equals-batch convergence run.
    Output is bounded: (k-1) rows per event type."""
    import pandas as pd

    from ..streaming.stateful import MG_OUTPUT_SCHEMA, mg_step

    ev = load(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "user_id"
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"], na_position="first")
        # NULL user_id -> NaN in a float64 column; int(nan) raises.
        # Skip NULL items and count only folded ones, matching the
        # streaming twin's hardening (ADVICE r6).
        folded = pdf["user_id"].dropna()
        counters = mg_step((int(u) for u in folded), None)
        return pd.DataFrame(
            [
                {
                    "event_type": pdf["event_type"].iloc[0],
                    "user_id": i,
                    "est_count": c,
                    "n_processed": len(folded),
                }
                for i, c in sorted(counters.items())
            ]
        )

    return ev.groupBy("event_type").applyInPandas(fold, MG_OUTPUT_SCHEMA)


@query(
    "stream_quantile_bottomk",
    oracle="""
    WITH s AS (
      SELECT event_type, value, event_id,
             DENSE_RANK() OVER (
               PARTITION BY event_type
               ORDER BY CAST(('0x' || substr(
                   md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT),
                 event_id) AS rn
      FROM events
      WHERE value IS NOT NULL AND NOT isnan(value)
        AND event_id IS NOT NULL
    ), k AS (
      SELECT event_type, event_id, MIN(value) AS value
      FROM s WHERE rn <= 256 GROUP BY event_type, event_id
    ), o AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (
               PARTITION BY event_type ORDER BY value, event_id) - 1 AS i,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM k
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_sample,
           MAX(CASE WHEN i = ((n - 1) * 50) // 100 THEN value END) AS p50,
           MAX(CASE WHEN i = ((n - 1) * 90) // 100 THEN value END) AS p90,
           MAX(CASE WHEN i = ((n - 1) * 99) // 100 THEN value END) AS p99
    FROM o GROUP BY event_type
    """,
)
def stream_quantile_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimation from a DETERMINISTIC bottom-k sample — the
    batch twin of the streaming quantile sketch
    (streaming/stateful.py::quantile_bottomk_stream). The sample is the
    k=256 rows with the SMALLEST md5-derived hash of event_id per event
    type (a bottom-k sketch, Cohen & Kaplan 2007): hash-uniform, so it
    is a uniform random sample — but a deterministic, ORDER-INVARIANT
    function of the row SET, which is what makes the streaming fold
    chunk-invariant and this batch form oracle-checkable. Quantiles are
    row PICKS from the sorted sample (index floor((n-1)p/100), value
    then event_id tiebreak) — no interpolation arithmetic to diverge
    between engines.

    Scale shape: rank<=k per group compiles to WindowGroupLimit (a
    map-side top-k per partition, then one merge per group — the corpus
    is never globally sorted; same plan family as sample_domain_cap,
    plan-locked there). Everything after runs on k rows per group. At
    100 TB this is THE way to get quantiles in one pass with bounded
    memory; the mergeable sample also unions across shards/streams."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from ._conv import hash_u32

    # NOT isnan: SQL NULL filters keep NaN, but the streaming twin's
    # pandas dropna removes it — and NaN breaks the min-merge's
    # order-invariance (round-8 review). Both sides exclude it.
    ev = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
        & ~F.isnan("value")
        & F.col("event_id").isNotNull()
    )
    wk = Window.partitionBy("event_type").orderBy(
        hash_u32(F.col("event_id").cast("string")), "event_id"
    )
    # dense_rank (not row_number) + MIN per event_id: the sample is the
    # first 256 DISTINCT event_ids by (hash, eid) with the minimum value
    # observed per id — set-semantics identical to the streaming fold's
    # duplicate merge (round-8 ADVICE; with unique event_ids, as in the
    # driver testdata, the output is unchanged). dense_rank still
    # compiles to WindowGroupLimit, and the dedup groupBy runs on <= 256
    # ids x duplicate multiplicity per group, not the corpus.
    samp = (
        ev.select("event_type", "value", "event_id")
        .withColumn("rn", F.dense_rank().over(wk))
        .filter(F.col("rn") <= 256)
        .groupBy("event_type", "event_id")
        .agg(F.min("value").alias("value"))
    )
    wo = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    o = samp.withColumn("i", F.row_number().over(wo) - 1).withColumn(
        "n", F.count("*").over(wn)
    )

    def pick(p):
        idx = F.expr(f"((n - 1) * {p}) div 100")
        return F.max(F.when(F.col("i") == idx, F.col("value"))).alias(
            f"p{p}"
        )

    return o.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_sample"),
        pick(50), pick(90), pick(99),
    )
