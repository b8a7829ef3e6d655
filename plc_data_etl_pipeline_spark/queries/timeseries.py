"""Time-series regularization queries (sensor-domain surface the
reference's PLC stream implies but never implements): dense hourly
grids per entity, gap detection, and last-observation-carried-forward
interpolation.

Scale posture: the grid is generated per entity with ``sequence()``
(no driver loop, no cross join against a calendar table); everything
downstream is one left join on (entity, bucket) + bounded per-entity
windows. Timestamps are emitted as formatted strings (SURVEY §7.3 —
never raw TIMESTAMP across the collect boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..registry import query
from ._conv import CENTS_CAP, cents, cents_m, davg, fbucket, sql_davg

def _dom(col: str) -> F.Column:
    """In-domain projection for order-statistic aggregates: NaN/Inf/
    out-of-envelope readings become NULL (aggregates skip them) — the
    same exclusion contract as cents(), see _conv.CENTS_CAP."""
    x = F.col(col)
    return F.when(~F.isnan(x) & (F.abs(x) <= F.lit(CENTS_CAP)), x)



@query(
    "ts_gap_fill_locf",
    oracle="""
    WITH hourly AS (
      SELECT user_id, time_bucket(INTERVAL 1 HOUR, ts) AS h,
             COUNT(*) AS n_events,
             CAST(SUM(CASE WHEN NOT isnan(value) AND abs(value) <= 1e+15 THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END) AS DOUBLE)
               / 100 / COUNT(CASE WHEN NOT isnan(value) AND abs(value) <= 1e+15 THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END) AS avg_value
      FROM events WHERE user_id < 40 GROUP BY user_id, h
    ), bounds AS (
      SELECT user_id, MIN(h) AS h_min, MAX(h) AS h_max FROM hourly GROUP BY user_id
    ), grid AS (
      SELECT user_id, UNNEST(generate_series(h_min, h_max, INTERVAL 1 HOUR)) AS h
      FROM bounds
    ), joined AS (
      SELECT g.user_id, g.h,
             COALESCE(hr.n_events, 0) AS n_events,
             hr.avg_value
      FROM grid g LEFT JOIN hourly hr ON g.user_id = hr.user_id AND g.h = hr.h
    )
    SELECT user_id,
           STRFTIME(h, '%Y-%m-%d %H:%M:%S') AS hour,
           n_events,
           n_events = 0 AS is_gap,
           last_value(avg_value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS avg_value_locf
    FROM joined
    """,
)
def ts_gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly grid per user (bounded id range) with gap flags and
    last-observation-carried-forward interpolation of the hourly average
    — the standard sensor-stream regularization pass. The grid comes
    from ``sequence()`` per entity (no calendar cross join); LOCF is one
    ignore-nulls window."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.count("*").alias("n_events"),
        (
            F.sum(cents("value")).cast("double")
            / 100
            / F.count(cents("value"))
        ).alias("avg_value"),
    )
    bounds = hourly.groupBy("user_id").agg(
        F.min("h").alias("h_min"), F.max("h").alias("h_max")
    )
    grid = bounds.select(
        "user_id",
        F.explode(
            F.sequence("h_min", "h_max", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    joined = grid.join(hourly, ["user_id", "h"], "left").select(
        "user_id",
        "h",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "avg_value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        "n_events",
        (F.col("n_events") == 0).alias("is_gap"),
        F.last("avg_value", ignorenulls=True).over(w).alias("avg_value_locf"),
    )


@query(
    "agg_mode_per_group",
    oracle="""
    WITH counts AS (
      SELECT event_type, CASE WHEN NOT isnan(value) AND abs(value) <= 1e+15 THEN CAST(FLOOR(value / 50) AS BIGINT) END AS value_bucket,
             COUNT(*) AS n
      FROM events GROUP BY event_type, value_bucket
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY n DESC, value_bucket) AS rn
      FROM counts
    )
    SELECT event_type, value_bucket AS modal_bucket, n AS modal_count
    FROM ranked WHERE rn = 1
    """,
)
def agg_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode (most frequent value bucket, ties to
    the smallest bucket) — built from count + row_number rather than the
    engines' ``mode()`` builtins, whose tie-breaking is unspecified and
    differs between engines."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy(
        "event_type", fbucket("value", 50).alias("value_bucket")
    ).agg(F.count("*").alias("n"))
    # asc_nulls_last: the degenerate NULL bucket (NaN/Inf/out-of-
    # envelope readings — see _conv.fbucket) loses count ties to every
    # real bucket; Spark's default NULLS FIRST would flip the winner
    # vs DuckDB's NULLS LAST (round-8 extreme-float sweep).
    w = Window.partitionBy("event_type").orderBy(
        F.col("n").desc(), F.col("value_bucket").asc_nulls_last()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("value_bucket").alias("modal_bucket"),
            F.col("n").alias("modal_count"),
        )
    )


@query(
    "agg_histogram",
    oracle="""
    SELECT event_type,
           CASE WHEN NOT isnan(value) AND abs(value) <= 1e+15 THEN CAST(FLOOR(value / 25) AS BIGINT) END AS bin,
           CASE WHEN NOT isnan(value) AND abs(value) <= 1e+15 THEN CAST(FLOOR(value / 25) AS BIGINT) END * 25 AS bin_low,
           COUNT(*) AS n
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type, bin
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram (25-unit bins) of sensor values per event
    type — exact integer bin arithmetic, single partial-aggregated
    group-by; the building block for distribution monitoring at scale."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    bin_ = fbucket("value", 25)
    return ev.groupBy(
        "event_type",
        bin_.alias("bin"),
        (bin_ * 25).alias("bin_low"),
    ).agg(F.count("*").alias("n"))


@query(
    "agg_percentiles",
    oracle="""
    SELECT event_type,
           ROUND(QUANTILE_CONT(CASE WHEN NOT isnan(value) AND abs(value) <= 1e+15 THEN value END, 0.25), 4) AS p25,
           ROUND(QUANTILE_CONT(CASE WHEN NOT isnan(value) AND abs(value) <= 1e+15 THEN value END, 0.50), 4) AS p50,
           ROUND(QUANTILE_CONT(CASE WHEN NOT isnan(value) AND abs(value) <= 1e+15 THEN value END, 0.75), 4) AS p75,
           ROUND(QUANTILE_CONT(CASE WHEN NOT isnan(value) AND abs(value) <= 1e+15 THEN value END, 0.95), 4) AS p95,
           ROUND(QUANTILE_CONT(CASE WHEN NOT isnan(value) AND abs(value) <= 1e+15 THEN value END, 0.99), 4) AS p99
    FROM events
    GROUP BY event_type
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-quantile summary per event type (p25/p50/p75/p95/p99,
    linear interpolation — Spark percentile == DuckDB quantile_cont,
    rounded to 4 on both sides). At 100 TB you'd swap in
    approx_percentile sketches; this is the exact baseline the sketch is
    judged against (cf. agg_approx_distinct)."""
    ev = load(spark, sf_dir, "events")
    cols = [
        F.round(F.percentile(_dom("value"), F.lit(q)), 4).alias(name)
        for q, name in [(0.25, "p25"), (0.5, "p50"), (0.75, "p75"),
                        (0.95, "p95"), (0.99, "p99")]
    ]
    return ev.groupBy("event_type").agg(*cols)


@query("agg_approx_percentiles", oracle=None)  # KLL-style sketch — bounded error
def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile sketch per event type — the 100 TB companion to
    the exact agg_percentiles: a fixed-size mergeable sketch per
    partition instead of a full sort, so cost is O(rows) map-side plus a
    constant-size shuffle. accuracy=10000 bounds rank error at 1/10000;
    tests/test_extensions.py pins observed error against the exact
    quantiles."""
    ev = load(spark, sf_dir, "events")
    pct = F.approx_percentile(
        F.col("value"), F.array(*[F.lit(q) for q in (0.25, 0.5, 0.75, 0.95, 0.99)]),
        F.lit(10000),
    )
    return ev.groupBy("event_type").agg(
        *[
            F.round(F.element_at(pct, i + 1), 4).alias(n)
            for i, n in enumerate(["p25", "p50", "p75", "p95", "p99"])
        ]
    )


from ._conv import dsum, sql_dsum  # noqa: E402


@query(
    "ts_downsample_ohlc",
    oracle=f"""
    WITH r AS (
      SELECT event_type, time_bucket(INTERVAL 1 HOUR, ts) AS h, value,
             ROW_NUMBER() OVER (
               PARTITION BY event_type, time_bucket(INTERVAL 1 HOUR, ts)
               ORDER BY ts, event_id) AS rno,
             ROW_NUMBER() OVER (
               PARTITION BY event_type, time_bucket(INTERVAL 1 HOUR, ts)
               ORDER BY ts DESC, event_id DESC) AS rnc
      FROM events WHERE ts IS NOT NULL
    )
    SELECT event_type,
           STRFTIME(h, '%Y-%m-%d %H:%M:%S') AS hour,
           COUNT(*) AS n_events,
           MAX(CASE WHEN rno = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rnc = 1 THEN value END) AS close,
           {sql_dsum('value', 'volume')}
    FROM r
    GROUP BY event_type, h
    """,
)
def ts_downsample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC downsample per event type — the classic time-series
    compaction (first/last/extreme per bucket) used to shrink raw 100 TB
    tick streams into per-bucket summaries. ``min_by``/``max_by`` pick
    open/close in ONE hash-aggregate pass (no row_number window, no
    second shuffle), ordered by (micros-within-hour << 31 | event_id)
    packed into one BIGINT: equal timestamps break deterministically on
    both engines (the adversarial minute-quantized fixture is full of
    them; the oracle spells the same tiebreak as ranked windows since
    DuckDB's arg_min takes no composite key), and the scalar key keeps
    the aggregate HASH-based — a STRUCT key silently degrades to
    SortAggregate (plan-locked in test_plans). Envelope: event_id <
    2^31 (same documented-packing pattern as join_asof's 2^43 keys).
    Volume follows the exact scaled-integer sum convention.

    NULL-ts hardening (r6): rows without a timestamp have no bucket and
    no open/close position — dropped identically on both sides (see
    ts_ewma's note; generator never produces them)."""
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    hour = F.date_trunc("hour", F.col("ts"))
    okey = (
        F.unix_micros(F.col("ts").cast("timestamp"))
        - F.unix_micros(hour.cast("timestamp"))
    ) * F.lit(1 << 31) + F.col("event_id")
    return (
        ev.groupBy("event_type", hour.alias("__h"))
        .agg(
            F.count("*").alias("n_events"),
            F.min_by("value", okey).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", okey).alias("close"),
            dsum("value", "volume"),
        )
        .select(
            "event_type",
            F.date_format("__h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "n_events", "open", "high", "low", "close", "volume",
        )
    )


@query(
    "ts_seasonal_profile",
    oracle=f"""
    SELECT event_type,
           CAST(EXTRACT(hour FROM ts) AS INT) AS hour_of_day,
           COUNT(*) AS n_events,
           {sql_davg('value', 'avg_value')}
    FROM events
    GROUP BY event_type, CAST(EXTRACT(hour FROM ts) AS INT)
    """,
)
def ts_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal profile per sensor type — the diurnal
    baseline a monitoring pipeline compares live traffic against.
    Group-key cardinality is |event_type| x 24 regardless of input size,
    so the post-shuffle reduce is constant-size at any scale."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type", F.hour("ts").alias("hour_of_day")
    ).agg(
        F.count("*").alias("n_events"),
        davg("value", "avg_value"),
    )


@query(
    "ts_ewma",
    oracle="""
    WITH s AS (
      SELECT user_id, list(value ORDER BY ts, event_id) AS vals
      FROM events WHERE ts IS NOT NULL GROUP BY user_id
    )
    SELECT user_id, CAST(len(vals) AS INT) AS n_events,
           list_reduce(vals, (acc, x) -> acc + 0.2 * (x - acc)) AS ewma_final
    FROM s
    """,
)
def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the stateful streaming EWMA detector
    (streaming/stateful.py ewma_step: ewma += alpha*(x - ewma),
    alpha = 0.2): final per-user EWMA over the event stream in event
    order.

    Determinism: the recursion is ORDER-DEPENDENT by definition, so
    both engines fold the SAME deterministic sequence — values sorted
    by (ts, event_id) — with the identical expression acc + 0.2*(x-acc)
    (Spark F.aggregate left fold ≡ DuckDB list_reduce). The results are
    bit-exact with no rounding: same operands, same op order.

    Scale posture: one shuffle to group by key; per-key sequences are
    bounded (a device's history fits an array — the same state-fits-
    in-memory assumption the streaming operator already makes). For
    unbounded keys the streaming path with RocksDB state is the
    answer; this query is its auditable batch oracle.

    NULL-ts hardening (r6): a timestamp-less reading has no defined
    position in an order-dependent fold (Spark sorts NULL ts first,
    DuckDB's list ORDER BY puts it last), so BOTH sides drop it
    explicitly — the same contract the r5 order-dependent operators
    adopted. The generator never emits NULL ts (BASELINE.md input-
    domain note), so committed results are unchanged; dq_freshness /
    dq_profile are where such rows get counted.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    s = ev.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("evs")
    )
    vals = F.transform("evs", lambda e: e["value"])
    sv = s.select("user_id", vals.alias("vals"))
    fold = F.aggregate(
        F.expr("slice(vals, 2, greatest(size(vals) - 1, 0))"),
        F.element_at("vals", 1),
        lambda acc, x: acc + F.lit(0.2) * (x - acc),
    )
    return sv.select(
        "user_id",
        F.size("vals").alias("n_events"),
        fold.alias("ewma_final"),
    )


@query(
    "ts_interp_linear",
    oracle="""
    WITH hourly AS (
      SELECT user_id, time_bucket(INTERVAL 1 HOUR, ts) AS h,
             CAST(FLOOR(
               CAST(SUM(CASE WHEN NOT isnan(value) AND abs(value) <= 1000000.0 THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END) AS DOUBLE)
                 / 100 / COUNT(CASE WHEN NOT isnan(value) AND abs(value) <= 1000000.0 THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END) * 1000000 + 0.5) AS BIGINT) AS v_micro
      FROM events WHERE user_id < 40 GROUP BY user_id, h
    ), bounds AS (
      SELECT user_id, MIN(h) AS h_min, MAX(h) AS h_max
      FROM hourly GROUP BY user_id
    ), grid AS (
      SELECT user_id, UNNEST(generate_series(h_min, h_max, INTERVAL 1 HOUR)) AS h
      FROM bounds
    ), joined AS (
      SELECT g.user_id, g.h,
             CAST(FLOOR(epoch(g.h)) AS BIGINT) // 3600 AS t,
             hr.v_micro
      FROM grid g LEFT JOIN hourly hr ON g.user_id = hr.user_id AND g.h = hr.h
    ), ctx AS (
      SELECT user_id, h, t, v_micro,
             last_value(CASE WHEN v_micro IS NOT NULL THEN t END IGNORE NULLS)
               OVER wp AS t_prev,
             last_value(v_micro IGNORE NULLS) OVER wp AS v_prev,
             first_value(CASE WHEN v_micro IS NOT NULL THEN t END IGNORE NULLS)
               OVER wn AS t_next,
             first_value(v_micro IGNORE NULLS) OVER wn AS v_next
      FROM joined
      WINDOW wp AS (PARTITION BY user_id ORDER BY t
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY user_id ORDER BY t
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id,
           STRFTIME(h, '%Y-%m-%d %H:%M:%S') AS hour,
           v_micro IS NULL AS is_interpolated,
           CAST(COALESCE(
             v_micro,
             (v_prev * (t_next - t) + v_next * (t - t_prev)
              - (v_prev * (t_next - t) + v_next * (t - t_prev))
                % (t_next - t_prev)) / (t_next - t_prev)
           ) AS DOUBLE) / 1000000 AS value_interp
    FROM ctx
    """,
)
def ts_interp_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation over the dense hourly grid (the upgrade
    from ts_gap_fill_locf's step function): each gap hour gets the
    time-weighted blend of the surrounding observed hourly averages.
    Grid generation and window shapes match the LOCF query (bounded
    per-entity state, no corpus sort); the blend is computed entirely
    in scaled-integer space — micro-unit values, integer hour indexes,
    and a divisibility-corrected integer division — so both engines
    produce bit-identical doubles. Interior gaps always have both
    neighbors because the grid spans min..max observed hours."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", "ts").alias("h")
    ).agg(
        F.floor(
            F.sum(cents_m("value")).cast("double")
            / 100
            / F.count(cents_m("value"))
            * 1000000
            + 0.5
        ).alias("v_micro")
    )
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("h").alias("h_min"), F.max("h").alias("h_max"))
        .select(
            "user_id",
            F.explode(
                F.sequence("h_min", "h_max", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    joined = grid.join(hourly, ["user_id", "h"], "left").select(
        "user_id",
        "h",
        (F.unix_timestamp("h") / 3600).cast("long").alias("t"),
        "v_micro",
    )
    obs_t = F.when(F.col("v_micro").isNotNull(), F.col("t"))
    wp = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    ctx = joined.select(
        "user_id",
        "h",
        "t",
        "v_micro",
        F.last(obs_t, ignorenulls=True).over(wp).alias("t_prev"),
        F.last("v_micro", ignorenulls=True).over(wp).alias("v_prev"),
        F.first(obs_t, ignorenulls=True).over(wn).alias("t_next"),
        F.first("v_micro", ignorenulls=True).over(wn).alias("v_next"),
    )
    num = F.col("v_prev") * (F.col("t_next") - F.col("t")) + F.col(
        "v_next"
    ) * (F.col("t") - F.col("t_prev"))
    den = F.col("t_next") - F.col("t_prev")
    interp = (num - num % den) / den  # exact: numerator made divisible
    return ctx.select(
        "user_id",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.col("v_micro").isNull().alias("is_interpolated"),
        (
            F.coalesce("v_micro", interp).cast("double") / 1000000
        ).alias("value_interp"),
    )


@query(
    "dq_rolling_outliers",
    oracle="""
    WITH c AS (
      SELECT event_id, user_id, ts, value,
             CASE WHEN NOT isnan(value) AND abs(value) <= 1000000.0 THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END AS x
      FROM events WHERE ts IS NOT NULL
    ), w AS (
      SELECT event_id, user_id, value, x,
             COUNT(*) OVER win AS n,
             SUM(x) OVER win AS s,
             SUM(x * x) OVER win AS sq
      FROM c
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 24 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, value, CAST(n AS BIGINT) AS n_window,
           n >= 10 AND (n * x - s) * (n * x - s) > 9 * (n * sq - s * s)
             AS is_outlier
    FROM w
    """,
)
def dq_rolling_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score outlier gate per sensor stream: each reading is
    compared against the trailing-25-sample mean/variance of its own
    user. The 3-sigma test is evaluated in pure integer algebra —
    (n*x - s)^2 > 9*(n*sq - s^2) is the |x - mean| > 3*stddev_pop
    condition multiplied through by n^2 — so no float division or sqrt
    ever happens and both engines agree bit-exactly. One shuffle on
    user_id; bounded 25-row frame state. Integer envelope: cents <=
    6e4, so every term stays far below 2^63. NULL-ts rows have no
    position in the trailing frame and are dropped identically on both
    sides (round-8 NULL-ts sweep)."""
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    x = cents_m("value")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-24, 0)
    )
    base = ev.select(
        "event_id",
        "user_id",
        "value",
        x.alias("x"),
        F.count("*").over(w).alias("n"),
        F.sum(x).over(w).alias("s"),
        F.sum(x * x).over(w).alias("sq"),
    )
    n, s, sq = F.col("n"), F.col("s"), F.col("sq")
    dev = n * F.col("x") - s
    return base.select(
        "event_id",
        "user_id",
        "value",
        n.cast("bigint").alias("n_window"),
        ((n >= 10) & (dev * dev > 9 * (n * sq - s * s))).alias(
            "is_outlier"
        ),
    )


@query(
    "ts_holt_trend",
    oracle="""
    WITH s AS (
      SELECT user_id, list(value ORDER BY ts, event_id) AS vals
      FROM events WHERE ts IS NOT NULL GROUP BY user_id
    ), seeded AS (
      SELECT user_id, CAST(len(vals) AS INT) AS n_events,
             list_reduce(
               list_concat(
                 [[vals[2], vals[2] - vals[1], CAST(0.0 AS DOUBLE)]],
                 [[CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), v]
                  FOR v IN vals[3:]]
               ),
               (acc, e) -> [
                 0.2 * e[3] + 0.8 * (acc[1] + acc[2]),
                 0.1 * ((0.2 * e[3] + 0.8 * (acc[1] + acc[2]))
                        - acc[1]) + 0.9 * acc[2],
                 CAST(0.0 AS DOUBLE)]
             ) AS st
      FROM s WHERE len(vals) >= 2
    )
    SELECT user_id, n_events, st[1] AS level_final,
           st[2] AS trend_final,
           st[1] + 3 * st[2] AS forecast_3
    FROM seeded
    """,
)
def ts_holt_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential smoothing (level + linear trend) per
    sensor stream — the forecasting step up from ts_ewma when streams
    drift: level = 0.2*x + 0.8*(level + trend), trend = 0.1*(Δlevel) +
    0.9*trend, seeded l=x2, b=x2-x1, folded over x3.. in event order;
    emits the final state and the 3-step-ahead forecast l + 3b.

    Determinism: the coupled recursion is order-dependent by
    definition, so both engines fold the SAME deterministic sequence
    (values sorted by (ts, event_id)) with textually identical
    expressions — Spark F.aggregate with a [level, trend, x] ARRAY
    accumulator ≡ DuckDB list_reduce over a seed-first list-of-lists
    (DuckDB 1.0 list_reduce has no init argument, so the seed state IS
    the first element; and its STRUCT-typed accumulator mis-evaluates
    coupled field updates — verified wrong on a planted sequence —
    while the list form folds correctly). Bit-exact, no rounding.

    Scale posture: identical to ts_ewma — one shuffle to group by key,
    per-key history bounded by the same state-fits-in-memory assumption
    the streaming stateful operator makes; unbounded keys belong to the
    streaming path. NULL-ts rows are dropped identically on both sides
    (r6 hardening — see ts_ewma's note).
    """
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    s = ev.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", "value"))
        ).alias("evs")
    )
    sv = s.select(
        "user_id", F.transform("evs", lambda e: e["value"]).alias("vals")
    ).filter(F.size("vals") >= 2)
    init = F.array(
        F.element_at("vals", 2),
        F.element_at("vals", 2) - F.element_at("vals", 1),
        F.lit(0.0),
    )
    rest = F.transform(
        F.expr("slice(vals, 3, greatest(size(vals) - 2, 0))"),
        lambda v: F.array(F.lit(0.0), F.lit(0.0), v),
    )

    def step(acc, e):
        lvl, trd, x = (
            F.element_at(acc, 1),
            F.element_at(acc, 2),
            F.element_at(e, 3),
        )
        return F.array(
            F.lit(0.2) * x + F.lit(0.8) * (lvl + trd),
            F.lit(0.1)
            * ((F.lit(0.2) * x + F.lit(0.8) * (lvl + trd)) - lvl)
            + F.lit(0.9) * trd,
            F.lit(0.0),
        )

    st = F.aggregate(rest, init, step)
    return sv.select(
        "user_id",
        F.size("vals").alias("n_events"),
        F.element_at(st, 1).alias("level_final"),
        F.element_at(st, 2).alias("trend_final"),
        (F.element_at(st, 1) + F.lit(3) * F.element_at(st, 2)).alias(
            "forecast_3"
        ),
    )


@query(
    "ts_changepoint_cusum",
    oracle="""
    WITH pts AS (
      SELECT event_type, ts, event_id,
             CASE WHEN NOT isnan(value) AND abs(value) <= 1e+15 THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END AS cents
      FROM events WHERE value IS NOT NULL
    ), base AS (
      SELECT event_type, ts, event_id,
             cents - ((SUM(cents) OVER p) // (COUNT(*) OVER p)) AS dev
      FROM pts
      WINDOW p AS (PARTITION BY event_type ORDER BY ts NULLS FIRST, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING)
    ), calib AS (
      SELECT event_type, ts, event_id, dev,
             GREATEST((SUM(ABS(dev)) OVER p) // (COUNT(*) OVER p), 1) AS mad
      FROM base
      WINDOW p AS (PARTITION BY event_type ORDER BY ts NULLS FIRST, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING)
    ), d AS (
      SELECT event_type, ts, event_id, dev,
             mad // 2 AS k, 20 * mad AS h
      FROM calib
    ), pre AS (
      SELECT event_type, ts, event_id, h,
             SUM(dev - k) OVER w AS p_up,
             SUM(-dev - k) OVER w AS p_dn
      FROM d
      WINDOW w AS (PARTITION BY event_type ORDER BY ts NULLS FIRST, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), s AS (
      SELECT event_type, ts, h,
             p_up - LEAST(MIN(p_up) OVER w, 0) AS s_up,
             p_dn - LEAST(MIN(p_dn) OVER w, 0) AS s_dn
      FROM pre
      WINDOW w AS (PARTITION BY event_type ORDER BY ts NULLS FIRST, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           CAST(SUM(CASE WHEN s_up > h THEN 1 ELSE 0 END) AS BIGINT)
             AS n_alarms_up,
           CAST(SUM(CASE WHEN s_dn > h THEN 1 ELSE 0 END) AS BIGINT)
             AS n_alarms_dn,
           CAST(MAX(s_up) AS BIGINT) AS max_s_up,
           CAST(MAX(s_dn) AS BIGINT) AS max_s_dn,
           STRFTIME(MIN(CASE WHEN s_up > h OR s_dn > h THEN ts END),
                    '%Y-%m-%d %H:%M:%S') AS first_alarm
    FROM s GROUP BY event_type
    """,
)
def ts_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM change-point detector (Page's test) per series —
    the streaming-SPC primitive behind every "did this sensor drift?"
    monitor. The textbook statistic is a sequential recurrence
    ``S_t = max(0, S_{t-1} + x_t - k)`` that no window frame expresses
    directly; this uses its closed form
    ``S_t = P_t - min(0, min_{j<=t} P_j)`` where ``P`` is the prefix
    sum of ``(x_t - k)`` — two stacked running windows (prefix SUM,
    then prefix MIN of it) over ONE sort of each series.

    Determinism: the entire pipeline is INTEGER arithmetic — values as
    exact cents, reference level ``mu = SUM DIV n``, slack
    ``k = (mean |dev|) DIV 2`` and threshold ``h = 20 x mean |dev|``
    all integer-derived — so prefix sums are order-exact BIGINTs and
    both engines agree bitwise, with no float-summation treatment
    needed anywhere (SURVEY §7.3: the strongest convention is to never
    leave the integers).

    Scale shape: ONE scan, ONE exchange. The calibration stats (mu,
    mean |dev|) are UNORDERED full-partition windows over the same
    key the ordered CUSUM windows use, so all four window passes stack
    on a single hash exchange (the unordered ones need no sort; the
    ordered ones share one sort) — no second read of the fact table,
    no calibration join. At 100 TB the partition key generalizes to
    (machine_id, sensor) — millions of bounded series, no global sort;
    the alarm scan is one pass.
    """
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            "ts",
            "event_id",
            cents("value").cast("long").alias("cents"),
        )
    )
    # full-partition frames carry the SAME (ts, event_id) ordering as
    # the CUSUM prefix windows below, so all four window passes share
    # one Exchange AND one Sort (plan-verified: a bare unordered
    # PARTITION BY costs a second key-only Sort pass)
    full = (
        "(PARTITION BY event_type ORDER BY ts, event_id"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
    )
    base = ev.select(
        "event_type",
        "ts",
        "event_id",
        (
            F.col("cents")
            - F.expr(
                f"(SUM(cents) OVER {full}) DIV (COUNT(*) OVER {full})"
            )
        ).alias("dev"),
    )
    d = base.select(
        "event_type",
        "ts",
        "event_id",
        "dev",
        F.greatest(
            F.expr(
                f"(SUM(ABS(dev)) OVER {full}) DIV (COUNT(*) OVER {full})"
            ),
            F.lit(1).cast("long"),
        ).alias("_m"),
    ).select(
        "event_type",
        "ts",
        "event_id",
        "dev",
        F.expr("_m DIV 2").alias("k"),
        (F.col("_m") * 20).alias("h"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre = d.select(
        "event_type",
        "ts",
        "event_id",
        "h",
        F.sum(F.col("dev") - F.col("k")).over(w).alias("p_up"),
        F.sum(-F.col("dev") - F.col("k")).over(w).alias("p_dn"),
    )
    s = pre.select(
        "event_type",
        "ts",
        "h",
        (F.col("p_up") - F.least(F.min("p_up").over(w), F.lit(0))).alias(
            "s_up"
        ),
        (F.col("p_dn") - F.least(F.min("p_dn").over(w), F.lit(0))).alias(
            "s_dn"
        ),
    )
    alarm = (F.col("s_up") > F.col("h")) | (F.col("s_dn") > F.col("h"))
    return s.groupBy("event_type").agg(
        F.count("*").alias("n_points"),
        F.sum(F.when(F.col("s_up") > F.col("h"), 1).otherwise(0))
        .cast("long")
        .alias("n_alarms_up"),
        F.sum(F.when(F.col("s_dn") > F.col("h"), 1).otherwise(0))
        .cast("long")
        .alias("n_alarms_dn"),
        F.max("s_up").cast("long").alias("max_s_up"),
        F.max("s_dn").cast("long").alias("max_s_dn"),
        F.date_format(
            F.min(F.when(alarm, F.col("ts"))), "yyyy-MM-dd HH:mm:ss"
        ).alias("first_alarm"),
    )


def _acf_formula(k: int) -> str:
    """Shared Spark/DuckDB expression for the lag-k autocorrelation from
    exact integer moments: r_k = sum((x_t-m)(x_{t-k}-m)) / sum((x_t-m)^2)
    expanded so every aggregate is an order-free BIGINT and the float
    work is one fixed-shape expression over identical operands."""
    m = f"(CAST(s1 AS DOUBLE) / n)"
    num = (
        f"(CAST(sxy{k} AS DOUBLE) - {m} * sx{k} - {m} * sy{k}"
        f" + n{k} * {m} * {m})"
    )
    den = f"(CAST(s2 AS DOUBLE) - n * {m} * {m})"
    from ._conv import sql_quant as _sq

    return (
        f"CASE WHEN {den} = 0.0 OR n < 4 THEN CAST(NULL AS DOUBLE)"
        f" ELSE {_sq(f'{num} / {den}')} END"
    )


@query(
    "ts_autocorr",
    oracle=f"""
    WITH pts AS (
      SELECT event_type, ts, event_id,
             CASE WHEN NOT isnan(value) AND abs(value) <= 1000000.0 THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END AS y
      FROM events WHERE value IS NOT NULL
    ), lagged AS (
      SELECT event_type, y,
             LAG(y, 1) OVER w AS y1,
             LAG(y, 2) OVER w AS y2,
             LAG(y, 3) OVER w AS y3
      FROM pts
      WINDOW w AS (PARTITION BY event_type ORDER BY ts NULLS FIRST, event_id)
    ), g AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(y) AS BIGINT) AS s1,
             CAST(SUM(y * y) AS BIGINT) AS s2,
             COUNT(y1) AS n1,
             CAST(SUM(y * y1) AS BIGINT) AS sxy1,
             CAST(SUM(CASE WHEN y1 IS NOT NULL THEN y END) AS BIGINT) AS sx1,
             CAST(SUM(y1) AS BIGINT) AS sy1,
             COUNT(y2) AS n2,
             CAST(SUM(y * y2) AS BIGINT) AS sxy2,
             CAST(SUM(CASE WHEN y2 IS NOT NULL THEN y END) AS BIGINT) AS sx2,
             CAST(SUM(y2) AS BIGINT) AS sy2,
             COUNT(y3) AS n3,
             CAST(SUM(y * y3) AS BIGINT) AS sxy3,
             CAST(SUM(CASE WHEN y3 IS NOT NULL THEN y END) AS BIGINT) AS sx3,
             CAST(SUM(y3) AS BIGINT) AS sy3
      FROM lagged GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_points,
           {_acf_formula(1)} AS r1,
           {_acf_formula(2)} AS r2,
           {_acf_formula(3)} AS r3
    FROM g
    """,
)
def ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation function (lags 1-3) per series — the
    diagnostic behind "is this sensor white noise, a slow drift, or a
    copy-paste of the last reading?" and the standard first look before
    fitting any forecaster (Box-Jenkins identification step).

    Determinism: the classical estimator sums float cross-products in
    data order, which two engines would do differently. This expands
    r_k around exact integer moments instead — per-series BIGINT sums
    of y, y^2, y_t*y_{t-k} and the matched-edge sums (all order-free) —
    then evaluates ONE fixed-shape double expression over those exact
    operands in both engines (``_acf_formula``, interpolated verbatim
    into the Spark selectExpr AND the DuckDB oracle), quantized to 6
    digits. Overflow envelope: |y| <= ~5.6e4 on this domain, so the
    y*y sums hold exactly to ~3e9 rows PER SERIES in BIGINT.

    Scale shape: ONE exchange on the series key; the three LAG windows
    share one sort; everything after is a partial-aggregable groupBy on
    the same key (no second shuffle — verified in the plan test). At
    100 TB the series key generalizes to (machine, sensor): millions of
    bounded series, no global sort, one pass."""
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            "ts",
            "event_id",
            cents_m("value").cast("long").alias("y"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    lagged = ev.select(
        "event_type",
        "y",
        F.lag("y", 1).over(w).alias("y1"),
        F.lag("y", 2).over(w).alias("y2"),
        F.lag("y", 3).over(w).alias("y3"),
    )

    def _lag_aggs(k: int) -> list:
        yk = F.col(f"y{k}")
        return [
            F.count(yk).alias(f"n{k}"),
            F.sum(F.col("y") * yk).alias(f"sxy{k}"),
            F.sum(F.when(yk.isNotNull(), F.col("y"))).alias(f"sx{k}"),
            F.sum(yk).alias(f"sy{k}"),
        ]

    g = lagged.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("y").alias("s1"),
        F.sum(F.col("y") * F.col("y")).alias("s2"),
        *_lag_aggs(1),
        *_lag_aggs(2),
        *_lag_aggs(3),
    )
    return g.selectExpr(
        "event_type",
        "CAST(n AS BIGINT) AS n_points",
        f"{_acf_formula(1)} AS r1",
        f"{_acf_formula(2)} AS r2",
        f"{_acf_formula(3)} AS r3",
    )


def _harmonic_consts() -> dict:
    """Quantized cos/sin lattice constants for the 24-point diurnal
    DFT, floor(trig(2*pi*k*h/24) * 1e6 + 0.5) for k=1..3, h=0..23.
    Generated ONCE here and inlined as literals into BOTH the Spark
    plan and the DuckDB oracle, so no engine ever evaluates cos/sin —
    libm trig is not correctly-rounded and its last ulp differs across
    builds (sqrt, by contrast, is IEEE-mandated correctly-rounded and
    safe to run on identical operands in both engines)."""
    import math

    out = {}
    for k in (1, 2, 3):
        out[f"c{k}"] = [
            int(math.floor(math.cos(2 * math.pi * k * h / 24) * 1e6 + 0.5))
            for h in range(24)
        ]
        out[f"s{k}"] = [
            int(math.floor(math.sin(2 * math.pi * k * h / 24) * 1e6 + 0.5))
            for h in range(24)
        ]
    return out


def _amp_formula(k: int) -> str:
    """Shared Spark/DuckDB amplitude of diurnal harmonic k from the
    exact integer lattice sums: 2/N * |DFT_k| rescaled out of the
    centi-cent x 1e-6-trig integer units."""
    from ._conv import sql_quant as _sq

    t = (
        f"(2e0 / 24 * SQRT(CAST(sc{k} AS DOUBLE) * sc{k}"
        f" + CAST(ss{k} AS DOUBLE) * ss{k}) / 1e10)"
    )
    return _sq(t)


_HC = _harmonic_consts()


@query(
    "ts_periodogram",
    oracle=f"""
    WITH cell AS (
      SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INT) AS hod,
             COUNT(CASE WHEN NOT isnan(value) AND abs(value) <= 1000000.0 THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END) AS n,
             CAST(SUM(CASE WHEN NOT isnan(value) AND abs(value) <= 1000000.0 THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END) AS BIGINT)
               AS s1
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
      GROUP BY event_type, hod
    ), m AS (
      SELECT event_type, hod,
             CAST(FLOOR(CAST(s1 AS DOUBLE) / n * 100 + 0.5) AS BIGINT) AS mv
      FROM cell
    ), g AS (
      SELECT event_type,
             COUNT(*) AS n_hours,
             CAST(SUM(mv * list_extract({_HC['c1']}, hod + 1)) AS BIGINT) AS sc1,
             CAST(SUM(mv * list_extract({_HC['s1']}, hod + 1)) AS BIGINT) AS ss1,
             CAST(SUM(mv * list_extract({_HC['c2']}, hod + 1)) AS BIGINT) AS sc2,
             CAST(SUM(mv * list_extract({_HC['s2']}, hod + 1)) AS BIGINT) AS ss2,
             CAST(SUM(mv * list_extract({_HC['c3']}, hod + 1)) AS BIGINT) AS sc3,
             CAST(SUM(mv * list_extract({_HC['s3']}, hod + 1)) AS BIGINT) AS ss3
      FROM m GROUP BY event_type
    ), amps AS (
      SELECT event_type, CAST(n_hours AS BIGINT) AS n_hours,
             {_amp_formula(1)} AS amp_24h,
             {_amp_formula(2)} AS amp_12h,
             {_amp_formula(3)} AS amp_8h
      FROM g
    )
    SELECT event_type, n_hours, amp_24h, amp_12h, amp_8h,
           CASE WHEN amp_24h >= amp_12h AND amp_24h >= amp_8h THEN 1
                WHEN amp_12h >= amp_8h THEN 2 ELSE 3 END AS dominant_k
    FROM amps
    """,
)
def ts_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diurnal periodogram per series: amplitude of the 24 h / 12 h /
    8 h harmonics of the hour-of-day profile plus the dominant
    harmonic — "does this sensor breathe with the day shift, the
    half-day, or neither?", the spectral sibling of
    ts_seasonal_profile and the feature a forecaster keys its season
    length from.

    Determinism: a DFT is float trig times float means — doubly
    non-portable. This stays integer until the last step: hour-of-day
    means quantized to exact centi-cent BIGINTs, multiplied by a
    PRE-QUANTIZED trig lattice (``_harmonic_consts`` — Python
    generates the 24x6 constants once and inlines the SAME literals
    into the Spark plan and the oracle; neither engine calls cos/sin),
    summed exactly, and only then folded through SQRT — which IEEE
    mandates correctly-rounded, so identical BIGINT operands give
    bit-identical amplitudes. Dominant-harmonic argmax compares the
    QUANTIZED amplitudes (ties to the longer period).

    Scale shape: two stacked partial-aggregable groupBys — (series,
    hod) cells, then a 24-rows-per-series fold; nothing downstream of
    the first aggregate is bigger than 24 rows per series. Missing
    hours contribute nothing to the lattice sum in either engine (the
    profile is treated as zero-filled after centering is ignored —
    adequate for a strength DIAGNOSTIC, documented, and identical on
    both sides)."""
    ev = (
        load(spark, sf_dir, "events")
        # ts IS NOT NULL is semantic (an hour-of-day profile is
        # undefined for a timestamp-less reading) AND load-bearing:
        # Spark 4.1.2's element_at(<literal array>, <null column
        # expr>) returns the LAST element instead of NULL (verified;
        # a literal NULL index returns NULL correctly), so a NULL hod
        # reaching the lattice lookup would corrupt the sums silently.
        # The hypothesis property test caught this.
        .filter(F.col("value").isNotNull() & F.col("ts").isNotNull())
        .select(
            "event_type",
            F.hour("ts").alias("hod"),
            cents_m("value").cast("long").alias("cents"),
        )
    )
    cell = ev.groupBy("event_type", "hod").agg(
        F.count("cents").alias("n"), F.sum("cents").alias("s1")
    )
    m = cell.select(
        "event_type",
        "hod",
        F.floor(F.col("s1").cast("double") / F.col("n") * 100 + 0.5)
        .cast("long")
        .alias("mv"),
    )

    def lattice(name: str) -> F.Column:
        arr = F.array(*[F.lit(v) for v in _HC[name]])
        return F.element_at(arr, F.col("hod") + 1)

    aggs = [F.count("*").alias("n_hours")]
    for k in (1, 2, 3):
        aggs.append(F.sum(F.col("mv") * lattice(f"c{k}")).alias(f"sc{k}"))
        aggs.append(F.sum(F.col("mv") * lattice(f"s{k}")).alias(f"ss{k}"))
    g = m.groupBy("event_type").agg(*aggs)
    amps = g.selectExpr(
        "event_type",
        "CAST(n_hours AS BIGINT) AS n_hours",
        f"{_amp_formula(1)} AS amp_24h",
        f"{_amp_formula(2)} AS amp_12h",
        f"{_amp_formula(3)} AS amp_8h",
    )
    return amps.selectExpr(
        "event_type",
        "n_hours",
        "amp_24h",
        "amp_12h",
        "amp_8h",
        "CASE WHEN amp_24h >= amp_12h AND amp_24h >= amp_8h THEN 1"
        " WHEN amp_12h >= amp_8h THEN 2 ELSE 3 END AS dominant_k",
    )


@query(
    "ts_stl_decompose",
    oracle="""
    WITH hourly AS (
      SELECT event_type, time_bucket(INTERVAL 1 HOUR, ts) AS h,
             SUM(CASE WHEN NOT isnan(value) AND abs(value) <= 1e+15 THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END) AS sum_cents,
             COUNT(CASE WHEN NOT isnan(value) AND abs(value) <= 1e+15 THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END) AS n
      FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      GROUP BY event_type, time_bucket(INTERVAL 1 HOUR, ts)
    ), with_trend AS (
      SELECT event_type, h, sum_cents, n,
             CAST(sum_cents AS DOUBLE) / 100 / n AS v,
             CAST(SUM(sum_cents) OVER w AS DOUBLE) / 100
               / SUM(n) OVER w AS trend
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY h
                   ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
    ), dev AS (
      SELECT *, CAST(FLOOR((v - trend) * 1000000 + 0.5) AS BIGINT)
                  AS dev_micro,
             CAST(EXTRACT(hour FROM h) AS INT) AS hod
      FROM with_trend
    ), seasonal AS (
      SELECT event_type, hod,
             CAST(SUM(dev_micro) AS DOUBLE) / 1000000 / COUNT(*) AS s
      FROM dev GROUP BY event_type, hod
    )
    SELECT d.event_type,
           STRFTIME(d.h, '%Y-%m-%d %H:%M:%S') AS hour,
           d.v AS value, d.trend, s.s AS seasonal,
           d.v - d.trend - s.s AS residual
    FROM dev d JOIN seasonal s
      ON d.event_type = s.event_type AND d.hod = s.hod
    """,
)
def ts_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-style seasonal-trend decomposition of the hourly sensor
    series per event type: trend = event-weighted mean over a centered
    25-bucket window, seasonal = mean detrended deviation per
    hour-of-day, residual = value - trend - seasonal — the
    decomposition a monitoring pipeline runs before alarming on
    residuals (ts_seasonal_profile's diurnal baseline is the seasonal
    term alone; this separates drift from cycle from noise).

    Determinism (the whole trick): every aggregation that crosses rows
    happens in EXACT integer space — hourly sums as BIGINT cents,
    window-frame sums of those BIGINTs, per-bucket deviations quantized
    to BIGINT micro-units BEFORE the seasonal mean — so no engine ever
    sums doubles in engine-dependent order; the only floating-point
    steps are identical single divisions/subtractions of identical
    operands. Trend is the weighted mean (frame event mass), which both
    engines express as two exact window sums.

    Scale: one shuffle to the hourly grain (bucket count = hours x
    types, tiny vs input), two frame sums on one exchange+sort, and the
    seasonal mean as a WINDOW over (event_type, hour-of-day) rather
    than a groupBy+join — a join-back formulation re-derived the whole
    hourly branch (second scan of the raw table, 5 exchanges; caught in
    the round-6 plan audit). The raw 100 TB stream is touched once;
    plan-locked in test_plans."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("value").isNotNull()
    )
    hour = F.date_trunc("hour", F.col("ts"))
    hourly = ev.groupBy(
        "event_type", hour.alias("h")
    ).agg(
        F.sum(cents("value").cast("bigint")).alias(
            "sum_cents"
        ),
        F.count(cents("value")).alias("n"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-12, 12)
    )
    with_trend = hourly.select(
        "event_type",
        "h",
        (F.col("sum_cents").cast("double") / 100 / F.col("n")).alias("v"),
        (
            F.sum("sum_cents").over(w).cast("double")
            / 100
            / F.sum("n").over(w)
        ).alias("trend"),
    )
    dev = with_trend.withColumn(
        "dev_micro",
        F.floor((F.col("v") - F.col("trend")) * 1000000 + 0.5).cast("bigint"),
    ).withColumn("hod", F.hour("h"))
    w2 = Window.partitionBy("event_type", "hod")
    s = (
        F.sum("dev_micro").over(w2).cast("double")
        / 1000000
        / F.count("*").over(w2)
    )
    return dev.select(
        "event_type",
        F.date_format("h", "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.col("v").alias("value"),
        "trend",
        s.alias("seasonal"),
        (F.col("v") - F.col("trend") - s).alias("residual"),
    )
