"""Product/event analytics over the ``events`` stream table.

The reference pipeline lands raw sensor events in a warehouse table
(`consumer/sensor_data_consumer.py:124-138`) and stops; every real
deployment immediately asks the next three questions — "how do users
move through the funnel?", "do cohorts come back?", "what follows
what?".  This module answers them with oracle-checked, shuffle-lean
plans:

* ``event_funnel`` — ordered multi-step funnel (view → click →
  purchase) computed with ONE shuffle: three stacked unordered window
  mins over the same ``user_id`` partitioning (the exchange is planned
  once), then a co-partitioned per-user collapse and a single-row
  global rollup.  No self-joins, no per-step rescans of the event log.
* ``event_retention`` — classic cohort/day-offset retention triangle.
  First-touch cohort is one partial-agg shuffle on ``user_id``; the
  join back is co-partitioned on the same key.
* ``event_transitions`` — first-order Markov transition counts via
  LAG over (user, time) — the sequence-mining primitive.
* ``agg_bitmap_intersect`` — exact audience-overlap matrix via
  mergeable roaring-style bitmaps and inclusion–exclusion
  (|A∩B| = |A|+|B|−|A∪B|, union through ``bitmap_or_agg``): distinct
  sets are sketched ONCE per event type, then every pairwise overlap
  is computed on ≤4 KB bitmap states — never by re-joining raw events.

Determinism: every output is a count, an integer basis-point ratio, a
DATE, or a small string — exact under any aggregation order (SURVEY
§7.3 conventions).

All counts are over driver testdata; at 100 TB the shapes hold: every
shuffle is a partial-aggregated equi-key exchange on ``user_id`` (high
cardinality, no skewed sentinel keys in the domain), window frames are
unordered full-partition mins (no sort-by-time needed), and bitmap
state is bounded by id-bucket, not row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query
from ._conv import CENTS_CAP, cents, fbucket


def _moment_domain() -> F.Column:
    """Exact-moment input envelope shared by the power-sum statistics
    (regression, skew/kurtosis, seasonal 3-sigma): value is non-NULL,
    finite, and |value| <= 1e6, so cents fit DECIMAL(9/10,0) and fourth
    powers stay far inside DECIMAL(38)/HUGEINT. Rows outside it (incl.
    NaN/Inf — round-8 extreme-float sweep) are excluded as incomplete/
    unrepresentable observations on BOTH engines; beyond this envelope
    widen the casts as each docstring prescribes."""
    v = F.col("value")
    return v.isNotNull() & ~F.isnan(v) & (F.abs(v) <= F.lit(1000000.0))


@query(
    "event_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts >= s1.t1
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
      GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM s2) AS BIGINT) AS n_click,
           CAST((SELECT COUNT(*) FROM s3) AS BIGINT) AS n_purchase,
           CAST((SELECT COUNT(*) FROM s2) * 10000
                // NULLIF((SELECT COUNT(*) FROM s1), 0)
                AS BIGINT) AS conv_click_bp,
           CAST((SELECT COUNT(*) FROM s3) * 10000
                // NULLIF((SELECT COUNT(*) FROM s1), 0)
                AS BIGINT) AS conv_purchase_bp
    """,
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-step funnel: first 'view', then the first 'click'
    at-or-after it, then the first 'purchase' at-or-after that.

    The oracle spells the textbook formulation (three aggregate-join
    phases, each rescanning events). The engine plan instead stacks
    three unordered window MINs over the SAME ``user_id`` partitioning
    — Catalyst plans one Exchange and evaluates the three frames in one
    pass per partition, because step n's threshold (a per-user
    constant) is just another window expression over the partition.
    One shuffle of the event log total, versus three scans + three
    shuffles for the naive form. Conversion ratios are integer basis
    points (exact integer division, hash-stable across engines)."""
    from ..operators.events import funnel_times

    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    per_user = funnel_times(ev, ["view", "click", "purchase"])
    totals = per_user.agg(
        F.count("t1").alias("n_view"),
        F.count("t2").alias("n_click"),
        F.count("t3").alias("n_purchase"),
    )
    return totals.select(
        "n_view",
        "n_click",
        "n_purchase",
        # NULLIF: a corpus with zero step-1 events otherwise crashes
        # the ANSI integer division on BOTH engines.
        F.expr("n_click * 10000 div nullif(n_view, 0)").alias(
            "conv_click_bp"
        ),
        F.expr("n_purchase * 10000 div nullif(n_view, 0)").alias(
            "conv_purchase_bp"
        ),
    )


@query(
    "event_retention",
    oracle="""
    WITH cohort AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d0
      FROM events GROUP BY user_id
    ), act AS (
      SELECT DISTINCT e.user_id, c.d0,
             CAST(CAST(e.ts AS DATE) - c.d0 AS INT) AS day_offset
      FROM events e JOIN cohort c ON e.user_id = c.user_id
      WHERE CAST(e.ts AS DATE) - c.d0 < 7
    )
    SELECT d0 AS cohort_date, day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM act GROUP BY d0, day_offset
    """,
)
def event_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-touch date,
    counted on each of their first 7 active day-offsets — the standard
    "day-N retention" report. Plan: first-touch cohort is one
    partial-agg shuffle on ``user_id``; the activity join is
    co-partitioned on the same key (AQE picks broadcast when the cohort
    side is small); DISTINCT collapses repeat same-day activity before
    the final tiny (cohort×7) aggregate. DATE output per SURVEY §7.3
    (never a raw timestamp)."""
    ev = (
        load(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("d"))
    )
    cohort = ev.groupBy("user_id").agg(F.min("d").alias("cohort_date"))
    act = (
        ev.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_date",
            F.datediff("d", "cohort_date").alias("day_offset"),
        )
        .where(F.col("day_offset") < 7)
        .distinct()
    )
    return act.groupBy("cohort_date", "day_offset").agg(
        F.count("*").alias("n_users")
    )


@query(
    "event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events WHERE ts IS NOT NULL
    )
    SELECT prev_type AS from_type, event_type AS to_type,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over each user's event
    sequence (the path-analysis primitive behind sankey/flow reports).
    One window shuffle on ``user_id`` with a (ts, event_id) sort —
    event_id breaks timestamp ties identically in both engines — then
    a partial-aggregated count over a 5×5 key domain. NULL-ts rows
    have no position in the sequence (Spark sorts them first, DuckDB
    last — they would inject phantom transitions at opposite ends) and
    are dropped identically on both sides (round-8 NULL-ts sweep)."""
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("to_type"),
        F.lag("event_type").over(w).alias("from_type"),
    )
    return (
        seq.where(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("n"))
    )


@query(
    "agg_bitmap_intersect",
    oracle="""
    WITH t AS (SELECT DISTINCT event_type, user_id FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(COUNT(*) AS BIGINT) AS n_both
    FROM t a JOIN t b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY a.event_type, b.event_type
    """,
)
def agg_bitmap_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT audience-overlap matrix (distinct users per event-type
    pair) via mergeable bitmaps + inclusion–exclusion.

    The oracle self-joins the distinct (type,user) set — at 100 TB that
    join re-shuffles every distinct user once per pair. The engine
    instead sketches each type's user set ONCE into per-32k-id-bucket
    roaring bitmaps (same states agg_bitmap_distinct builds), then
    computes every pairwise overlap purely on bitmap state:
    |A∩B| = |A| + |B| − |A∪B|, with the union folded by
    ``bitmap_or_agg`` over ≤4 KB bucket bitmaps. Adding a new day of
    events ORs into the stored sketches — the overlap matrix refreshes
    without ever rescanning history. ids map 1-based
    (bitmap_bit_position is 1-based; user_id 0 would otherwise drop)."""
    ev = load(spark, sf_dir, "events")
    # One pass: per-(type, bucket) bitmap + its cardinality.
    sk = ev.groupBy(
        "event_type",
        F.expr("bitmap_bucket_number(user_id + 1)").alias("bkt"),
    ).agg(
        F.expr(
            "bitmap_construct_agg(bitmap_bit_position(user_id + 1))"
        ).alias("bmp")
    )
    sk = sk.withColumn("cnt", F.expr("bitmap_count(bmp)"))
    # Per-type exact distinct counts (sum of bucket cardinalities).
    per_type = sk.groupBy("event_type").agg(F.sum("cnt").alias("n"))
    # All unordered type pairs (tiny: k*(k-1)/2 rows) — broadcast.
    types = per_type.select("event_type")
    pairs = (
        types.alias("a")
        .crossJoin(types.alias("b"))
        .where(F.col("a.event_type") < F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
    )
    # Route each type's bucket bitmaps to every pair containing the type,
    # then union per (pair, bucket) and count.
    routed = sk.join(
        F.broadcast(pairs),
        (F.col("event_type") == F.col("type_a"))
        | (F.col("event_type") == F.col("type_b")),
    )
    union_cnt = (
        routed.groupBy("type_a", "type_b", "bkt")
        .agg(F.expr("bitmap_count(bitmap_or_agg(bmp))").alias("ucnt"))
        .groupBy("type_a", "type_b")
        .agg(F.sum("ucnt").alias("n_union"))
    )
    na = per_type.select(
        F.col("event_type").alias("type_a"), F.col("n").alias("n_a")
    )
    nb = per_type.select(
        F.col("event_type").alias("type_b"), F.col("n").alias("n_b")
    )
    return (
        union_cnt.join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .select(
            "type_a",
            "type_b",
            (F.col("n_a") + F.col("n_b") - F.col("n_union")).alias("n_both"),
        )
        # The oracle's inner self-join emits nothing for disjoint
        # audiences; inclusion-exclusion emits n_both=0 — align.
        .where(F.col("n_both") > 0)
    )


@query(
    "win_sliding_distinct",
    oracle="""
    WITH days AS (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events),
    u AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events)
    SELECT days.d AS day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT)
             AS n_users_7d
    FROM days JOIN u ON u.d BETWEEN days.d - 6 AND days.d
    GROUP BY days.d
    """,
)
def win_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per day — the metric COUNT
    (DISTINCT) OVER a RANGE frame cannot express (distinct doesn't
    merge across frame rows) and the oracle solves with a 7× band-join
    replication of the DISTINCT user set.

    The engine instead merges mergeable state: one pass sketches each
    (day, 32k-id-bucket) into an exact roaring-style bitmap, each
    bitmap row fans out to the ≤7 window ends it contributes to
    (replicating ≤4 KB sketches, never user rows), and
    ``bitmap_or_agg`` + ``bitmap_count`` fold each window exactly.
    At 100 TB the shuffled state is (days × buckets) bitmaps —
    independent of event count — and a new day's partial ORs into
    yesterday's materialization without rescanning the trailing week.
    A semi-join restricts window ends to days that actually have
    events (matching the oracle's day spine).

    Implementation is SHARED with the continuously-maintained form
    (streaming/sliding_distinct.py): the batch query is literally
    present(bucketize(events)) — the same sketch-build and window-fold
    the streaming materialization uses, so the two cannot drift."""
    from ..streaming import sliding_distinct as SD

    ev = load(spark, sf_dir, "events").select("ts", "user_id")
    return SD.present(SD._bucketize(ev))


@query(
    "dq_drift_psi",
    oracle="""
    WITH binned AS (
      SELECT event_type,
             CAST(GREATEST(LEAST(CASE WHEN NOT isnan(value) AND abs(value) <= 1e+15 THEN CAST(FLOOR(value / 50.0) AS BIGINT) END, 9), -1) AS INT) AS bin,
             CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS half
      FROM events WHERE ts IS NOT NULL
    ), bins AS (
      SELECT t.event_type, b.bin,
             1 + COALESCE(SUM(CASE WHEN half = 1 THEN 1 END), 0) AS ca,
             1 + COALESCE(SUM(CASE WHEN half = 0 THEN 1 END), 0) AS cb
      FROM (SELECT DISTINCT event_type FROM events
            WHERE ts IS NOT NULL) t
      CROSS JOIN (SELECT UNNEST(range(10)) AS bin) b
      LEFT JOIN binned USING (event_type, bin)
      GROUP BY t.event_type, b.bin
    ), tot AS (
      SELECT event_type, SUM(ca) AS ta, SUM(cb) AS tb FROM bins
      GROUP BY event_type
    )
    SELECT bins.event_type,
           CAST(SUM(ca) - 10 AS BIGINT) AS n_before,
           CAST(SUM(cb) - 10 AS BIGINT) AS n_after,
           ROUND(SUM((CAST(ca AS DOUBLE) / ta - CAST(cb AS DOUBLE) / tb)
                     * LN((CAST(ca AS DOUBLE) / ta)
                          / (CAST(cb AS DOUBLE) / tb))), 4) AS psi
    FROM bins JOIN tot ON bins.event_type = tot.event_type
    GROUP BY bins.event_type
    """,
)
def dq_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type between the first and
    second half of the month — the standard drift gate a training-data
    pipeline runs before admitting a new snapshot (PSI > 0.2 is the
    conventional "distribution moved" alarm). Fixed 10-bin histogram
    over the value domain with +1 Laplace smoothing (no empty-bin
    log-of-zero, deterministic in both engines), one scan with
    conditional partial aggregation — the per-type totals join touches
    only the (types × bins) frame, never the event log again. PSI is
    an order-independent SUM over 10 exact-rational terms, rounded to
    4dp on both sides. NULL-ts rows belong to NEITHER half — Spark's
    NULL comparison summed to neither bucket while the oracle's CASE
    ELSE routed them to 'after' (round-8 NULL-ts sweep); both sides
    now drop them."""
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    binned = ev.select(
        "event_type",
        # floor, not cast: cast truncates toward zero, so a negative
        # reading would bin differently than the oracle's FLOOR.
        # clamp in BIGINT before the narrow cast: a mid-range reading
        # (1e12 is inside the cents domain) makes a bucket far outside
        # INT on both engines; bins < 0 never match the dense 0..9 grid
        # so -1 is a faithful representative (round-8 sweep). An
        # out-of-domain NULL bucket rides LEAST's NULL-skipping into
        # bin 9 identically on both engines.
        F.greatest(
            F.least(fbucket("value", 50.0), F.lit(9).cast("bigint")),
            F.lit(-1).cast("bigint"),
        ).cast("int").alias("bin"),
        (F.col("ts") < F.lit("2024-01-16").cast("timestamp"))
        .cast("int")
        .alias("half"),
    )
    # Dense (type x bin) grid so empty bins still get the +1 smoothing.
    grid = (
        binned.select("event_type")
        .distinct()
        .crossJoin(spark.range(10).select(F.col("id").cast("int").alias("bin")))
    )
    counts = binned.groupBy("event_type", "bin").agg(
        F.sum("half").alias("ra"),
        F.sum(F.lit(1) - F.col("half")).alias("rb"),
    )
    bins = (
        grid.join(counts, ["event_type", "bin"], "left")
        .select(
            "event_type",
            "bin",
            (F.lit(1) + F.coalesce("ra", F.lit(0))).alias("ca"),
            (F.lit(1) + F.coalesce("rb", F.lit(0))).alias("cb"),
        )
    )
    tot = bins.groupBy("event_type").agg(
        F.sum("ca").alias("ta"), F.sum("cb").alias("tb")
    )
    pa = F.col("ca").cast("double") / F.col("ta")
    pb = F.col("cb").cast("double") / F.col("tb")
    return (
        bins.join(tot, "event_type")
        .groupBy("event_type")
        .agg(
            (F.sum("ca") - 10).cast("bigint").alias("n_before"),
            (F.sum("cb") - 10).cast("bigint").alias("n_after"),
            F.round(F.sum((pa - pb) * F.log(pa / pb)), 4).alias("psi"),
        )
    )


@query(
    "win_session_id",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM g
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT)
             AS duration_us
    FROM s GROUP BY user_id, session_id
    """,
)
def win_session_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization with explicit per-event session NUMBERS —
    the gaps-and-islands form (new-session flag on a >30-min gap, then
    a running sum), complementing stream_session (which returns window
    bounds, not ids). Downstream per-session features (ordinal joins,
    'session 3 of user X') need the id form. One window shuffle on
    ``user_id`` evaluates both the LAG and the running SUM (same
    partitioning and sort, tie-broken on event_id); the per-session
    rollup is co-partitioned. Durations are exact integer microseconds
    in UTC epoch space. NULL-ts rows have no position in the gap order
    (Spark sorts them first, DuckDB last) and are dropped identically
    on both sides (r6 hardening; the generator never emits them —
    BASELINE.md input-domain note)."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("user_id", "ts", "event_id")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Full-microsecond gap — a second-truncated cast would classify a
    # 1800.5 s gap as <= 30 min while the oracle's INTERVAL compare
    # (microsecond-precise) starts a new session.
    gap = F.unix_micros(F.col("ts").cast("timestamp")) - F.lag(
        F.unix_micros(F.col("ts").cast("timestamp"))
    ).over(w)
    new_s = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    sessioned = ev.withColumn(
        "session_id",
        F.sum(new_s).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    return sessioned.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (F.max(us) - F.min(us)).alias("duration_us"),
    )


@query(
    "dq_profile",
    oracle="""
    SELECT 'o_orderstatus' AS col, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(o_orderstatus) AS BIGINT) AS n_filled,
           CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS n_distinct,
           CAST(MIN(o_orderstatus) AS VARCHAR) AS min_s,
           CAST(MAX(o_orderstatus) AS VARCHAR) AS max_s
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(o_orderpriority) AS BIGINT),
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
           CAST(MIN(o_orderpriority) AS VARCHAR),
           CAST(MAX(o_orderpriority) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', CAST(COUNT(*) AS BIGINT),
           CAST(COUNT(o_totalprice) AS BIGINT),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
           CAST(MIN(o_totalprice) AS VARCHAR),
           CAST(MAX(o_totalprice) AS VARCHAR)
    FROM orders
    """,
)
def dq_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile report (the ingest-time "describe" every catalog
    tool materializes): per column — fill count, distinct count,
    min/max — computed in ONE scan via Spark's multi-aggregate hash
    agg, then unpivoted to the long (col, metric...) form. The oracle
    spells it as three scans UNION ALL'd; Catalyst's single Aggregate
    with 3x5 expressions reads orders once (COUNT DISTINCT columns
    expand through one Expand — still one scan). Min/max emit as
    strings so one schema profiles heterogeneous column types."""
    o = load(spark, sf_dir, "orders")

    def prof(c):
        return [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.count(c).alias(f"{c}__f"),
            F.countDistinct(c).alias(f"{c}__d"),
            F.min(c).cast("string").alias(f"{c}__mn"),
            F.max(c).cast("string").alias(f"{c}__mx"),
        ]

    cols = ["o_orderstatus", "o_orderpriority", "o_totalprice"]
    wide = o.agg(*[e for c in cols for e in prof(c)])
    rows = [
        F.struct(
            F.lit(c).alias("col"),
            F.col(f"{c}__n").alias("n_rows"),
            F.col(f"{c}__f").alias("n_filled"),
            F.col(f"{c}__d").alias("n_distinct"),
            F.col(f"{c}__mn").alias("min_s"),
            F.col(f"{c}__mx").alias("max_s"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


@query(
    "agg_regression_trend",
    oracle="""
    WITH pts AS (
      SELECT event_type,
             CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS x,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
      FROM events
      WHERE ts IS NOT NULL AND value IS NOT NULL AND NOT isnan(value) AND abs(value) <= 1000000.0
    ), s AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
             SUM(x * x) AS sxx
      FROM pts GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(NULLIF(n * sxx - sx * sx, 0) AS DOUBLE), 6)
             AS slope_r6
    FROM s
    """,
)
def agg_regression_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-database OLS trend per sensor stream: the REGR_SLOPE of
    value (exact cents) against event day, computed from the five
    classic regression sums — one partial-aggregated scan, no window,
    no collect. Sums accumulate in DECIMAL(38) (HUGEINT on the oracle
    side) — exact and order-independent at any corpus size, matching
    agg_skew_kurtosis — and the slope is emitted BOTH as the exact
    rational (numerator, denominator; BIGINT output envelope documented
    below) and as one rounded IEEE division of identical operands for
    readability. A single-day (or single-row) group has slope_den = 0:
    try_divide/NULLIF yield NULL on both engines instead of an ANSI
    divide-by-zero crash. The native REGR_SLOPE aggregate does the
    same math in floating point; the exact form is what survives an
    order-insensitive cross-engine hash. Output envelope: |num|,|den|
    < 2^63 holds through ~1e14 rows at this x/y scale; past that,
    widen the two output casts to DECIMAL(38,0)."""
    ev = load(spark, sf_dir, "events")
    # OLS is defined on complete (x, y) pairs: a NULL ts or value row
    # must drop from EVERY sum (n, sx, sy, sxy, sxx) together, else the
    # slope mixes an all-rows count with pairwise-deleted sums.
    ev = ev.filter(F.col("ts").isNotNull() & _moment_domain())
    pts = ev.select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("decimal(10,0)")
        .alias("x"),
        F.floor(F.col("value") * 100 + 0.5).cast("decimal(10,0)").alias("y"),
    )
    s = pts.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nd = F.col("n").cast("decimal(38,0)")
    num = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    den = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    return s.select(
        "event_type",
        "n",
        num.cast("bigint").alias("slope_num"),
        den.cast("bigint").alias("slope_den"),
        F.round(
            F.try_divide(
                num.cast("double"),
                F.when(den != 0, den).cast("double"),
            ),
            6,
        ).alias("slope_r6"),
    )


@query(
    "win_islands_consecutive",
    oracle="""
    WITH d AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), g AS (
      SELECT user_id, day,
             day - CAST(ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY day) AS INT) AS grp
      FROM d
    )
    SELECT user_id, MIN(day) AS streak_start, MAX(day) AS streak_end,
           CAST(COUNT(*) AS BIGINT) AS n_days
    FROM g GROUP BY user_id, grp
    """,
)
def win_islands_consecutive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands, date-dense form: collapse each user's activity
    days into maximal CONSECUTIVE-day streaks via the classic
    row-number-difference trick (day − rn is constant exactly within a
    consecutive run) — the streak/retention primitive behind "7-day
    streak" features. One distinct shuffle + one window on the same
    user partitioning + a co-partitioned rollup; no self-joins, no
    recursion. Complements win_session_id (time-gap islands on raw
    timestamps) with the calendar-dense variant."""
    ev = load(spark, sf_dir, "events")
    d = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    g = d.withColumn(
        "grp", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    return g.groupBy("user_id", "grp").agg(
        F.min("day").alias("streak_start"),
        F.max("day").alias("streak_end"),
        F.count("*").alias("n_days"),
    ).drop("grp")


@query(
    "agg_skew_kurtosis",
    oracle="""
    WITH m AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS s1,
             CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS s2,
             CAST(SUM(CAST(y AS HUGEINT) * y * y) AS DOUBLE) AS s3,
             CAST(SUM(CAST(y AS HUGEINT) * y * y * y) AS DOUBLE) AS s4
      FROM (SELECT event_type,
                   CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
            FROM events
            WHERE value IS NOT NULL AND NOT isnan(value) AND abs(value) <= 1000000.0)
      GROUP BY event_type
    )
    SELECT event_type, n,
           CASE WHEN (s2 / n) - (s1 / n) * (s1 / n) > 0 THEN
             ROUND(((s3 / n) - 3 * (s1 / n) * (s2 / n)
                    + 2 * (s1 / n) * (s1 / n) * (s1 / n))
                   / POW((s2 / n) - (s1 / n) * (s1 / n), 1.5), 4)
           END AS skew_r4,
           CASE WHEN (s2 / n) - (s1 / n) * (s1 / n) > 0 THEN
             ROUND(((s4 / n) - 4 * (s1 / n) * (s3 / n)
                    + 6 * (s1 / n) * (s1 / n) * (s2 / n)
                    - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
                   / POW((s2 / n) - (s1 / n) * (s1 / n), 2.0) - 3.0, 4)
           END AS kurt_r4
    FROM m
    """,
)
def agg_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population skewness and excess kurtosis per sensor stream from
    EXACT raw moments: the four power sums accumulate in DECIMAL(38)
    (HUGEINT on the oracle side) over integer cents — order-independent
    and overflow-safe to ~1e38 — then one identical chain of IEEE
    double ops on both engines derives the shape statistics
    (dimensionless, so the cent scaling cancels). The native
    skewness()/kurtosis() aggregates fold doubles in partition order —
    unusable under a cross-engine hash; exact-moments-then-derive is
    the mergeable form an incremental pipeline stores anyway."""
    ev = load(spark, sf_dir, "events").filter(_moment_domain())
    y = F.floor(F.col("value") * 100 + 0.5).cast("decimal(9,0)")
    m = ev.select("event_type", y.alias("y")).groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.col("y")).cast("double").alias("s1"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("s2"),
        F.sum(F.col("y") * F.col("y") * F.col("y")).cast("double").alias("s3"),
        F.sum(F.col("y") * F.col("y") * F.col("y") * F.col("y"))
        .cast("double")
        .alias("s4"),
    )
    n = F.col("n")
    mu = F.col("s1") / n
    var = F.col("s2") / n - mu * mu
    skew = (F.col("s3") / n - 3 * mu * (F.col("s2") / n) + 2 * mu * mu * mu) / (
        F.pow(var, 1.5)
    )
    kurt = (
        F.col("s4") / n
        - 4 * mu * (F.col("s3") / n)
        + 6 * mu * mu * (F.col("s2") / n)
        - 3 * mu * mu * mu * mu
    ) / F.pow(var, 2.0) - 3.0
    # Zero-variance guard (constant/stuck-at sensor stream): emit NULL
    # instead of an ANSI divide-by-zero crash — matching the oracle's
    # CASE WHEN var > 0 form.
    return m.select(
        "event_type",
        "n",
        F.when(var > 0, F.round(skew, 4)).alias("skew_r4"),
        F.when(var > 0, F.round(kurt, 4)).alias("kurt_r4"),
    )


@query(
    "dq_referential_integrity",
    oracle="""
    SELECT 'lineitem.l_orderkey -> orders' AS check_name,
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS n_violations
    UNION ALL
    SELECT 'orders.o_custkey -> customer',
           CAST((SELECT COUNT(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT)
    UNION ALL
    SELECT 'customer.c_nationkey -> nation',
           CAST((SELECT COUNT(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = c.c_nationkey))
                AS BIGINT)
    UNION ALL
    SELECT 'orders.o_orderkey unique',
           CAST((SELECT COALESCE(SUM(cnt - 1), 0) FROM
                 (SELECT COUNT(*) AS cnt FROM orders
                  GROUP BY o_orderkey HAVING COUNT(*) > 1))
                AS BIGINT)
    """,
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse constraint audit — the checks a database enforces with
    FOREIGN KEY / PRIMARY KEY that a lakehouse must assert itself:
    orphan-row counts for the three star-schema relationships (each a
    LEFT ANTI join: broadcast when the parent side is a dim, shuffle
    otherwise — never a row-by-row probe) plus surplus-duplicate count
    on the orders primary key (partial-aggregated). The oracle states
    each as NOT EXISTS / HAVING SQL. All-zeros on healthy fixtures;
    the value is that regressions surface as nonzero rows, not silent
    joins dropping data downstream.

    Single lazy plan (round-4 verdict item 6): the four checks are
    scalar aggregates UNIONed into one DataFrame, so the whole audit is
    ONE job with all four scans scheduled together — not four eager
    driver-side actions reading the warehouse serially (4x the I/O wall
    at 100 TB, and no shared scan scheduling)."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey")

    def orphans(name, child, key, parent, pkey):
        return (
            child.join(parent, F.col(key) == F.col(pkey), "left_anti")
            .agg(F.count("*").cast("bigint").alias("n_violations"))
            .select(F.lit(name).alias("check_name"), "n_violations")
        )

    dup_surplus = (
        o.groupBy("o_orderkey")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt") > 1)
        .agg(
            F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0))
            .cast("bigint")
            .alias("n_violations")
        )
        .select(
            F.lit("orders.o_orderkey unique").alias("check_name"),
            "n_violations",
        )
    )
    return (
        orphans("lineitem.l_orderkey -> orders",
                li, "l_orderkey", o.select("o_orderkey"), "o_orderkey")
        .unionAll(orphans("orders.o_custkey -> customer",
                          o, "o_custkey", c.select("c_custkey"), "c_custkey"))
        .unionAll(orphans("customer.c_nationkey -> nation",
                          c, "c_nationkey", n, "n_nationkey"))
        .unionAll(dup_surplus)
    )


@query(
    "dq_anomaly_seasonal",
    oracle="""
    WITH pts AS (
      SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INT) AS hod,
             CAST(floor(value * 100 + 0.5) AS HUGEINT) AS y
      FROM events WHERE value IS NOT NULL AND NOT isnan(value) AND abs(value) <= 1000000.0
    ), cell AS (
      SELECT event_type, hod, COUNT(*) AS n,
             SUM(y) AS s1, SUM(y * y) AS s2
      FROM pts GROUP BY event_type, hod
    )
    SELECT p.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN c.n >= 2
                         AND (p.y * c.n - c.s1) * (p.y * c.n - c.s1)
                             > 9 * (c.n * c.s2 - c.s1 * c.s1)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
    FROM pts p JOIN cell c
      ON p.event_type = c.event_type AND p.hod = c.hod
    GROUP BY p.event_type
    """,
)
def dq_anomaly_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-baseline anomaly detection — the analytic the reference
    pipeline exists to feed (sensor readings -> 'is this reading
    abnormal for this sensor at this time of day?'). Each event is
    tested against its (event_type, hour-of-day) cell's 3-sigma gate in
    PURE INTEGER algebra — (y·n − s1)² > 9(n·s2 − s1²), the same
    square-both-sides trick as dq_rolling_outliers: no sqrt, no
    division, bit-exact under any aggregation order (HUGEINT oracle /
    DECIMAL-widened engine sums; the squares exceed BIGINT at cell
    populations past ~1e5 rows, hence the widening). Plan: one
    partial-agg pass builds the 5×24-cell profile, the join back
    broadcasts it, and the verdict rollup is co-partitioned — events
    scan twice, shuffle fractions of a KB."""
    ev = load(spark, sf_dir, "events").where(_moment_domain())
    pts = ev.select(
        "event_type",
        F.hour("ts").alias("hod"),
        F.floor(F.col("value") * 100 + 0.5).cast("decimal(38,0)").alias("y"),
    )
    cell = pts.groupBy("event_type", "hod").agg(
        F.count("*").cast("decimal(38,0)").alias("n"),
        F.sum("y").alias("s1"),
        F.sum(F.col("y") * F.col("y")).alias("s2"),
    )
    j = pts.join(F.broadcast(cell), ["event_type", "hod"])
    dev = F.col("y") * F.col("n") - F.col("s1")
    var_n2 = F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    is_anom = (F.col("n") >= 2) & (dev * dev > 9 * var_n2)
    return j.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.sum(is_anom.cast("int")).cast("bigint").alias("n_anomalies"),
    )


@query(
    "event_attribution",
    oracle="""
    WITH j AS (
      SELECT user_id, event_type, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events WHERE ts IS NOT NULL
    ),
    conv AS (
      SELECT user_id,
             SUM(CASE WHEN NOT isnan(value) AND abs(value) <= 1e+15 THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END) AS conv_cents,
             MIN(rn) AS fp_rn
      FROM j WHERE event_type = 'purchase' GROUP BY user_id
    ),
    pre AS (
      SELECT t.user_id,
             arg_min(t.event_type, t.rn) AS first_touch,
             arg_max(t.event_type, t.rn) AS last_touch
      FROM j t JOIN conv c ON t.user_id = c.user_id AND t.rn < c.fp_rn
      WHERE t.event_type <> 'purchase'
      GROUP BY t.user_id
    ),
    base AS (
      SELECT c.user_id, c.conv_cents,
             COALESCE(p.first_touch, 'direct') AS first_touch,
             COALESCE(p.last_touch, 'direct') AS last_touch
      FROM conv c
      LEFT JOIN pre p ON c.user_id = p.user_id
    )
    SELECT model, channel, n_users,
           CAST(cents AS DOUBLE) / 100 AS attributed_value
    FROM (
      SELECT 'first_touch' AS model, first_touch AS channel,
             COUNT(*) AS n_users, SUM(conv_cents) AS cents
      FROM base GROUP BY first_touch
      UNION ALL
      SELECT 'last_touch', last_touch, COUNT(*), SUM(conv_cents)
      FROM base GROUP BY last_touch
    )
    """,
)
def event_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-style conversion attribution over user journeys — the
    analytics shape every event warehouse grows next to funnels and
    retention: credit each converting user's total purchase value to a
    channel under two models at once. Both models score only
    PRE-CONVERSION touches (non-purchase events strictly before the
    user's first purchase — a touch seen after converting can't have
    caused it): first_touch = the earliest such type, last_touch = the
    latest; users who purchase with no prior touch credit 'direct'
    under both. One row_number window (ts, event_id — the unique
    tiebreak the minute-quantized adversarial fixture requires), then
    one conversion aggregate, one shared pre-conversion aggregate
    (min_by and max_by in the same pass) and one join, ALL keyed on
    user_id so every exchange reuses the same hash partitioning;
    channel rollups shuffle k rows. NULL event types drop out of both the touch and conversion
    sides identically in both engines (<> and = are NULL-rejecting);
    NULL purchase values are skipped by SUM on both sides. Money follows
    the exact integer-cents convention (queries/_conv.py). NULL-ts rows
    have no journey position (Spark ranks them first, DuckDB last —
    flipping which touch is 'first') and are dropped identically on
    both sides (round-8 NULL-ts sweep)."""
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    j = ev.select(
        "user_id", "event_type", "value", F.row_number().over(w).alias("rn")
    )
    is_p = F.col("event_type") == "purchase"
    conv = j.filter(is_p).groupBy("user_id").agg(
        F.sum(cents("value").cast("bigint")).alias("conv_cents"),
        F.min("rn").alias("fp_rn"),
    )
    pre = (
        j.filter(F.col("event_type") != "purchase")
        .join(conv.select("user_id", "fp_rn"), "user_id")
        .filter(F.col("rn") < F.col("fp_rn"))
        .groupBy("user_id")
        .agg(
            F.min_by("event_type", "rn").alias("first_touch"),
            F.max_by("event_type", "rn").alias("last_touch"),
        )
    )
    base = conv.join(pre, "user_id", "left").select(
        "conv_cents",
        F.coalesce("first_touch", F.lit("direct")).alias("first_touch"),
        F.coalesce("last_touch", F.lit("direct")).alias("last_touch"),
    )

    def rollup(channel_col: str, model: str) -> DataFrame:
        return base.groupBy(F.col(channel_col).alias("channel")).agg(
            F.count("*").alias("n_users"),
            (F.sum("conv_cents").cast("double") / 100).alias(
                "attributed_value"
            ),
        ).select(
            F.lit(model).alias("model"),
            "channel",
            "n_users",
            "attributed_value",
        )

    return rollup("first_touch", "first_touch").unionByName(
        rollup("last_touch", "last_touch")
    )


@query(
    "dq_k_anonymity",
    oracle="""
    WITH classes AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CASE WHEN NOT isnan(value) AND abs(value) <= 1e+15 THEN CAST(FLOOR(value / 50) AS BIGINT) END AS vbin,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2, 3
    )
    SELECT event_type,
           COUNT(*) AS n_classes,
           CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_small_classes,
           CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
             AS rows_at_risk,
           CAST(SUM(n) AS BIGINT) AS rows_total,
           CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) * 10000
                // SUM(n) AS BIGINT) AS risk_bps
    FROM classes GROUP BY event_type
    """,
)
def dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity privacy audit (Sweeney 2002) — the re-identification
    gate a training-data pipeline runs beside PII scrubbing
    (text_pii_scrub): rows whose quasi-identifier combination
    (event type, event day, 50-unit value bucket) is shared by fewer
    than k=5 records are individually re-identifiable even with the
    direct identifier (user_id) removed. Per event type: equivalence-
    class census, classes below k, rows at risk, and the risk share in
    exact basis points.

    One partial-aggregated groupBy over the quasi-identifier (the only
    shuffle — class counts combine map-side), then a tiny re-aggregate
    per event type. The value bucket is FLOOR of one IEEE division of
    identical doubles — deterministic across engines; every output is
    an exact integer.
    """
    ev = load(spark, sf_dir, "events")
    classes = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        fbucket("value", 50).alias("vbin"),
    ).agg(F.count("*").alias("n"))
    small = F.when(F.col("n") < 5, F.col("n")).otherwise(F.lit(0))
    return classes.groupBy("event_type").agg(
        F.count("*").alias("n_classes"),
        F.sum(F.when(F.col("n") < 5, 1).otherwise(0)).alias(
            "n_small_classes"
        ),
        F.sum(small).alias("rows_at_risk"),
        F.sum("n").alias("rows_total"),
        F.expr(
            "CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) * 10000"
            " div sum(n) AS BIGINT)"
        ).alias("risk_bps"),
    )


@query(
    "dq_benford",
    oracle="""
    WITH c0 AS (
      SELECT CASE WHEN NOT isnan(value) AND abs(value) <= 1e15 THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END AS cents
      FROM events WHERE value IS NOT NULL
    ), c AS (
      SELECT CAST(SUBSTRING(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit
      FROM c0 WHERE cents >= 1
    ), g AS (
      SELECT digit, COUNT(*) AS n FROM c GROUP BY digit
    )
    SELECT digit, n,
           CAST(n * 10000 // SUM(n) OVER () AS BIGINT) AS share_bps,
           CAST(CASE digit WHEN 1 THEN 3010 WHEN 2 THEN 1761
                WHEN 3 THEN 1249 WHEN 4 THEN 969 WHEN 5 THEN 792
                WHEN 6 THEN 669 WHEN 7 THEN 580 WHEN 8 THEN 512
                ELSE 458 END AS BIGINT) AS benford_bps,
           CAST(n * 10000 // SUM(n) OVER ()
                - CASE digit WHEN 1 THEN 3010 WHEN 2 THEN 1761
                  WHEN 3 THEN 1249 WHEN 4 THEN 969 WHEN 5 THEN 792
                  WHEN 6 THEN 669 WHEN 7 THEN 580 WHEN 8 THEN 512
                  ELSE 458 END AS BIGINT) AS deviation_bps
    FROM g
    """,
)
def dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit audit (Newcomb 1881 / Benford
    1938) — the classic forensic screen for fabricated or truncated
    measure columns: the observed leading-digit distribution of the
    sensor values in exact basis points, next to the Benford
    expectation (10000*log10(1+1/d), precomputed integer constants so
    no libm call can diverge between engines). Big deviations on a
    naturally-spanning measure flag synthetic or clipped data — here
    the fixture's uniform values SHOULD deviate (uniforms are not
    Benford), which is exactly what the audit reports.

    Leading digit is extracted in exact integer space: the 2-decimal
    value scales to BIGINT cents (the _conv convention) and the first
    character of the decimal rendering is the digit — no log10/power
    boundary risk. One partial-aggregated groupBy on 9 keys; the
    share window runs over the 9-row aggregate.
    """
    ev = load(spark, sf_dir, "events")
    cents = F.expr("CASE WHEN NOT isnan(value) AND abs(value) <= 1e15 THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END")
    # gate on the SCALED value: 0 < value < 0.005 rounds to zero cents,
    # whose leading '0' is not a significant digit and would both take
    # digit 9's expected bps and inflate every share's denominator
    # (review finding)
    g = (
        ev.filter(F.col("value").isNotNull() & (cents >= 1))
        .groupBy(
            F.substring(cents.cast("string"), 1, 1).cast("int").alias(
                "digit"
            )
        )
        .agg(F.count("*").alias("n"))
    )
    benford = (
        "CASE digit WHEN 1 THEN 3010 WHEN 2 THEN 1761 WHEN 3 THEN 1249"
        " WHEN 4 THEN 969 WHEN 5 THEN 792 WHEN 6 THEN 669 WHEN 7 THEN 580"
        " WHEN 8 THEN 512 ELSE 458 END"
    )
    total = F.sum("n").over(Window.partitionBy())
    share_bps = ((F.col("n") * 10000) - ((F.col("n") * 10000) % total)) / total
    # exact integer division: (a - a%b)/b on exact BIGINTs divides
    # without remainder, so the one double division is exact (same
    # convention as the oracle's // on the identical operands)
    return g.select(
        "digit",
        "n",
        share_bps.cast("long").alias("share_bps"),
        F.expr(benford).cast("long").alias("benford_bps"),
        (
            share_bps.cast("long") - F.expr(benford).cast("long")
        ).alias("deviation_bps"),
    )


@query(
    "event_paths_topk",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type, 2) OVER w AS p1,
             LAG(event_type, 1) OVER w AS p2
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT p1 || '>' || p2 || '>' || event_type AS path,
           COUNT(*) AS n
    FROM seq WHERE p1 IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, path NULLS LAST
    LIMIT 10
    """,
)
def event_paths_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most common 3-step event paths — the sequence-n-gram
    mining behind every "common user journeys" report (the 3-gram
    generalization of event_transitions' first-order pairs): two LAGs
    over the per-user event order, one path aggregate, deterministic
    top-10 (ties break on the path string).

    Scale: one shuffle to the user window (the LAGs share it), one
    partial-aggregated shuffle on the path key (cardinality <=
    |event_type|^3), and the top-10 is a TakeOrderedAndProject — no
    global sort ever materializes. NULL-ts rows have no sequence
    position and are dropped identically on both sides (round-8
    NULL-ts sweep).
    """
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
    )
    seq = ev.select(
        F.lag("event_type", 2).over(w).alias("p1"),
        F.lag("event_type", 1).over(w).alias("p2"),
        "event_type",
    ).filter(F.col("p1").isNotNull())
    return (
        seq.groupBy(
            # F.concat, NOT concat_ws: || in the oracle PROPAGATES a
            # NULL event_type (the whole path groups under NULL) while
            # concat_ws silently skips the segment and fabricates a
            # 2-step path — review finding, NULL-type divergence
            F.concat(
                "p1", F.lit(">"), "p2", F.lit(">"), "event_type"
            ).alias("path")
        )
        .agg(F.count("*").alias("n"))
        # explicit NULLS LAST: Spark's asc default is nulls-first,
        # DuckDB's is nulls-last — a NULL-path group tying at the
        # top-10 boundary would otherwise diverge
        .orderBy(F.col("n").desc(), F.col("path").asc_nulls_last())
        .limit(10)
    )


@query(
    "dq_schema_drift",
    oracle="""
    WITH a AS (
      SELECT
        COUNT(*) FILTER (CAST(ts AS DATE) <= DATE '2024-01-15') AS n_h1,
        COUNT(*) FILTER (CAST(ts AS DATE) >  DATE '2024-01-15') AS n_h2,
        COUNT(*) FILTER (CAST(ts AS DATE) <= DATE '2024-01-15'
                         AND event_type IS NULL) AS nul_et_h1,
        COUNT(*) FILTER (CAST(ts AS DATE) >  DATE '2024-01-15'
                         AND event_type IS NULL) AS nul_et_h2,
        COUNT(*) FILTER (CAST(ts AS DATE) <= DATE '2024-01-15'
                         AND value IS NULL) AS nul_v_h1,
        COUNT(*) FILTER (CAST(ts AS DATE) >  DATE '2024-01-15'
                         AND value IS NULL) AS nul_v_h2,
        COUNT(*) FILTER (CAST(ts AS DATE) <= DATE '2024-01-15'
                         AND props IS NULL) AS nul_p_h1,
        COUNT(*) FILTER (CAST(ts AS DATE) >  DATE '2024-01-15'
                         AND props IS NULL) AS nul_p_h2,
        COUNT(DISTINCT event_type)
          FILTER (CAST(ts AS DATE) <= DATE '2024-01-15') AS d_et_h1,
        COUNT(DISTINCT event_type)
          FILTER (CAST(ts AS DATE) >  DATE '2024-01-15') AS d_et_h2,
        COUNT(DISTINCT value)
          FILTER (CAST(ts AS DATE) <= DATE '2024-01-15') AS d_v_h1,
        COUNT(DISTINCT value)
          FILTER (CAST(ts AS DATE) >  DATE '2024-01-15') AS d_v_h2,
        COUNT(DISTINCT props)
          FILTER (CAST(ts AS DATE) <= DATE '2024-01-15') AS d_p_h1,
        COUNT(DISTINCT props)
          FILTER (CAST(ts AS DATE) >  DATE '2024-01-15') AS d_p_h2
      FROM events
    )
    SELECT col,
           CAST(nuls_h1 * 10000 // NULLIF(n_h1, 0) AS BIGINT)
             AS null_bps_h1,
           CAST(nuls_h2 * 10000 // NULLIF(n_h2, 0) AS BIGINT)
             AS null_bps_h2,
           CAST(d_h1 AS BIGINT) AS n_distinct_h1,
           CAST(d_h2 AS BIGINT) AS n_distinct_h2,
           CAST(d_h2 - d_h1 AS BIGINT) AS distinct_delta
    FROM (
      SELECT 'event_type' AS col, nul_et_h1 AS nuls_h1, nul_et_h2 AS
             nuls_h2, d_et_h1 AS d_h1, d_et_h2 AS d_h2, n_h1, n_h2 FROM a
      UNION ALL
      SELECT 'value', nul_v_h1, nul_v_h2, d_v_h1, d_v_h2, n_h1, n_h2 FROM a
      UNION ALL
      SELECT 'props', nul_p_h1, nul_p_h2, d_p_h1, d_p_h2, n_h1, n_h2 FROM a
    )
    """,
)
def dq_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structural column-drift gate between the first and second half of
    the month — the companion to dq_drift_psi (which watches the VALUE
    distribution): per column, null-rate basis points and distinct
    cardinality per half, plus the cardinality delta. A column that
    suddenly goes nullable, collapses to one value, or explodes in
    cardinality fails the snapshot-admission gate even when its value
    histogram looks stable.

    One scan: every half x column metric is a FILTER aggregate in a
    single aggregate row (the distinct counts expand map-side like
    agg_distinct), then a 3-row stack unpivots it — no self-joins, no
    second pass. Exact integers only.
    """
    ev = load(spark, sf_dir, "events")
    h1 = F.to_date("ts") <= F.lit("2024-01-15").cast("date")
    h2 = ~h1
    aggs = [
        F.count(F.when(h1, 1)).alias("n_h1"),
        F.count(F.when(h2, 1)).alias("n_h2"),
    ]
    for short, c in (("et", "event_type"), ("v", "value"), ("p", "props")):
        aggs += [
            F.count(F.when(h1 & F.col(c).isNull(), 1)).alias(
                f"nul_{short}_h1"
            ),
            F.count(F.when(h2 & F.col(c).isNull(), 1)).alias(
                f"nul_{short}_h2"
            ),
            F.count_distinct(F.when(h1, F.col(c))).alias(f"d_{short}_h1"),
            F.count_distinct(F.when(h2, F.col(c))).alias(f"d_{short}_h2"),
        ]
    a = ev.agg(*aggs)
    stacked = a.select(
        F.expr(
            "stack(3,"
            " 'event_type', nul_et_h1, nul_et_h2, d_et_h1, d_et_h2,"
            " 'value', nul_v_h1, nul_v_h2, d_v_h1, d_v_h2,"
            " 'props', nul_p_h1, nul_p_h2, d_p_h1, d_p_h2"
            ") AS (col, nuls_h1, nuls_h2, d_h1, d_h2)"
        ),
        "n_h1",
        "n_h2",
    )
    return stacked.select(
        "col",
        # NULLIF: an empty half (e.g. an empty snapshot) must report
        # NULL bps, not crash ANSI division (round-8 empty-input sweep)
        F.expr("CAST(nuls_h1 * 10000 div nullif(n_h1, 0) AS BIGINT)").alias(
            "null_bps_h1"
        ),
        F.expr("CAST(nuls_h2 * 10000 div nullif(n_h2, 0) AS BIGINT)").alias(
            "null_bps_h2"
        ),
        F.col("d_h1").cast("long").alias("n_distinct_h1"),
        F.col("d_h2").cast("long").alias("n_distinct_h2"),
        (F.col("d_h2") - F.col("d_h1")).cast("long").alias("distinct_delta"),
    )


@query(
    "event_pattern_match",
    oracle="""
    WITH coded AS (
      SELECT user_id, CAST(ts AS DATE) AS day, ts, event_id,
             CASE WHEN event_type = 'view' THEN 'v'
                  WHEN event_type = 'click' THEN 'c'
                  WHEN event_type = 'purchase' THEN 'p'
                  WHEN event_type = 'signup' THEN 's'
                  WHEN event_type = 'error' THEN 'e'
                  ELSE 'x' END AS ch
      FROM events WHERE ts IS NOT NULL
    ), seqs AS (
      SELECT user_id, day,
             string_agg(ch, '' ORDER BY ts, event_id) AS seq
      FROM coded GROUP BY user_id, day
    ), m AS (
      SELECT user_id, day, seq,
             regexp_extract_all(seq, 'e[vc]*p') AS hits
      FROM seqs
    )
    SELECT user_id, day,
           CAST(length(seq) AS BIGINT) AS seq_len,
           CAST(len(hits) AS BIGINT) AS n_matches,
           CAST(list_max(list_transform(hits, x -> length(x)))
                AS BIGINT) AS max_match_len,
           hits[1] AS first_match
    FROM m WHERE len(hits) > 0
    """,
)
def event_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-pattern mining — the MATCH_RECOGNIZE shape (SQL:2016
    row-pattern recognition; neither Spark nor DuckDB implements the
    clause) expressed as regex over per-partition event-code strings:
    each (user, day) timeline becomes a character sequence (one code
    per event type, time-ordered), and the pattern ``e[vc]*p`` — an
    ERROR followed, possibly via views/clicks, by a PURCHASE — is the
    "recovered after a failure" journey every checkout-funnel report
    wants. Emits one row per (user, day) with >=1 match: sequence
    length, match count, longest match, first matched subsequence.

    Engine-parity design: the regex's character class ([vc]) is
    DISJOINT from its terminator (p), so every possible match has
    exactly ONE extent regardless of leftmost-first (Java regex) vs
    leftmost-longest (POSIX/RE2) semantics, and non-overlapping
    continuation after a match is identical in both engines — the
    pattern is chosen to be semantics-invariant, not just convenient.
    NULL event_type codes to 'x' on both sides (CASE falls through a
    NULL comparison to ELSE in both engines).

    Scale shape: ONE shuffle (groupBy user_id+day); state per group is
    the day's event-code string — bounded by daily per-user activity,
    the same boundedness argument as session windows (at 100 TB,
    sessionize first if a user-day can exceed memory; the regex pass
    is then per-session). The sort is inside each group
    (array_sort on a collected struct — no global sort), and the
    regex runs ONCE per group string, JVM-side, inside codegen.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    ch = (
        F.when(F.col("event_type") == "view", "v")
        .when(F.col("event_type") == "click", "c")
        .when(F.col("event_type") == "purchase", "p")
        .when(F.col("event_type") == "signup", "s")
        .when(F.col("event_type") == "error", "e")
        .otherwise("x")
    )
    coded = ev.select(
        "user_id",
        F.to_date("ts").alias("day"),
        F.struct("ts", "event_id", ch.alias("ch")).alias("evt"),
    )
    seqs = coded.groupBy("user_id", "day").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(F.collect_list("evt")), lambda s: s["ch"]
            ),
        ).alias("seq")
    )
    m = seqs.select(
        "user_id",
        "day",
        "seq",
        F.expr("regexp_extract_all(seq, 'e[vc]*p', 0)").alias("hits"),
    )
    return m.filter(F.size("hits") > 0).select(
        "user_id",
        "day",
        F.length("seq").cast("long").alias("seq_len"),
        F.size("hits").cast("long").alias("n_matches"),
        F.array_max(F.transform("hits", F.length)).cast("long").alias(
            "max_match_len"
        ),
        F.element_at("hits", 1).alias("first_match"),
    )


@query(
    "dq_l_diversity",
    oracle="""
    WITH classes AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CASE WHEN NOT isnan(value) AND abs(value) <= 1e+15 THEN CAST(FLOOR(value / 50) AS BIGINT) END AS vbin,
             COUNT(*) AS n,
             COUNT(DISTINCT user_id) AS l
      FROM events GROUP BY 1, 2, 3
    )
    SELECT event_type,
           COUNT(*) AS n_classes,
           CAST(MIN(l) AS BIGINT) AS min_l,
           CAST(SUM(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_low_diversity,
           CAST(SUM(CASE WHEN l < 3 THEN n ELSE 0 END) AS BIGINT)
             AS rows_exposed,
           CAST(SUM(CASE WHEN l < 3 THEN n ELSE 0 END) * 10000
                // SUM(n) AS BIGINT) AS exposure_bps
    FROM classes GROUP BY event_type
    """,
)
def dq_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity privacy audit (Machanavalhala 2007) — the attribute-
    disclosure gate k-anonymity misses: an equivalence class can hold
    k>=5 rows and STILL leak if they all belong to the same few
    subjects. Over the same quasi-identifier classes as
    dq_k_anonymity (event type, day, 50-unit value bucket), counts the
    distinct sensitive values (user_id) per class and reports, per
    event type, the classes with l < 3, the rows they expose, and the
    exposure share in exact basis points.

    Same shuffle shape as the k-anonymity twin plus the distinct:
    Spark plans COUNT(DISTINCT user_id) per class as two-phase partial
    aggregation on the one class-key exchange (no extra shuffle vs the
    plain count — the distinct key is appended to the grouping in the
    expand phase), then a tiny per-type re-aggregate. Every output is
    an exact integer; the only float op is one IEEE division inside
    FLOOR, identical in both engines.
    """
    ev = load(spark, sf_dir, "events")
    classes = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        fbucket("value", 50).alias("vbin"),
    ).agg(
        F.count("*").alias("n"),
        F.countDistinct("user_id").alias("l"),
    )
    low = F.col("l") < 3
    return classes.groupBy("event_type").agg(
        F.count("*").alias("n_classes"),
        F.min("l").alias("min_l"),
        F.sum(F.when(low, 1).otherwise(0)).alias("n_low_diversity"),
        F.sum(F.when(low, F.col("n")).otherwise(0)).alias("rows_exposed"),
        F.expr(
            "CAST(sum(CASE WHEN l < 3 THEN n ELSE 0 END) * 10000"
            " div sum(n) AS BIGINT)"
        ).alias("exposure_bps"),
    )


@query(
    "dq_functional_dependency",
    oracle="""
    WITH fd1 AS (
      SELECT 'o_orderkey' AS determinant, 'o_orderdate' AS dependent,
             CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating,
             CAST(MAX(nd) AS BIGINT) AS max_distinct
      FROM (SELECT o_orderkey, COUNT(DISTINCT o_orderdate) AS nd
            FROM orders GROUP BY o_orderkey)
    ), fd2 AS (
      SELECT 'o_custkey' AS determinant, 'o_orderpriority' AS dependent,
             CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating,
             CAST(MAX(nd) AS BIGINT) AS max_distinct
      FROM (SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS nd
            FROM orders GROUP BY o_custkey)
    ), fd3 AS (
      SELECT 'l_partkey' AS determinant, 'l_suppkey' AS dependent,
             CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violating,
             CAST(MAX(nd) AS BIGINT) AS max_distinct
      FROM (SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS nd
            FROM lineitem GROUP BY l_partkey)
    )
    SELECT *, n_violating = 0 AS holds FROM fd1
    UNION ALL SELECT *, n_violating = 0 FROM fd2
    UNION ALL SELECT *, n_violating = 0 FROM fd3
    """,
)
def dq_functional_dependency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit — the schema-inference / key-discovery
    primitive of a data-profiling pass: for each candidate FD X -> Y,
    count determinant groups, groups violating (|distinct Y| > 1 within
    an X group), and the worst multiplicity. Candidates chosen to pin
    all three outcomes on the TPC-H-ish data: the PK dependency
    o_orderkey -> o_orderdate HOLDS; o_custkey -> o_orderpriority and
    l_partkey -> l_suppkey are violated (a customer orders at many
    priorities; a part ships from several suppliers). Downstream,
    holding FDs become candidate keys / dedup columns and violations
    become normalization findings.

    Plan shape per FD: one partial-aggregated two-level group-by
    (X-group distinct counts are the classic two-phase distinct expand),
    then a constant-size summary — the scan dominates, never the
    summary. Each FD scans only its own table projection."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")

    def audit(df: DataFrame, det: str, dep: str) -> DataFrame:
        per = df.groupBy(det).agg(F.countDistinct(dep).alias("nd"))
        return per.agg(
            F.lit(det).alias("determinant"),
            F.lit(dep).alias("dependent"),
            F.count("*").alias("n_groups"),
            F.sum(F.when(F.col("nd") > 1, 1).otherwise(0)).alias(
                "n_violating"
            ),
            F.max("nd").cast("bigint").alias("max_distinct"),
        )
    out = (
        audit(o, "o_orderkey", "o_orderdate")
        .unionByName(audit(o, "o_custkey", "o_orderpriority"))
        .unionByName(audit(li, "l_partkey", "l_suppkey"))
    )
    return out.withColumn("holds", F.col("n_violating") == 0)
