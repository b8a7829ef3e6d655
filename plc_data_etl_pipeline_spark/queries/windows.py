"""Window-function family (SURVEY.md §2.2 — ABSENT in reference).

Scale posture: every window partitions by a high-cardinality key
(user_id, order priority across many groups) so state per partition is
bounded; there is no global (unpartitioned) window over a fact table
anywhere in the engine. ORDER BY inside each window always carries a
unique tiebreaker so ranks are deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..registry import query
from ._conv import cents


def _csum(col: str, w) -> "F.Column":
    """Windowed order-exact sum of a 2-decimal double: exact integer-cents
    sum over the frame, divided back in double (queries/_conv.py). The
    cents() guard NULLs NaN/Inf/out-of-envelope values so one poisoned
    row cannot ANSI-overflow a whole frame (round-8 sweep)."""
    return F.sum(cents(col)).over(w).cast("double") / 100


@query(
    "win_rank",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn,
           NTILE(4) OVER (PARTITION BY o_orderpriority
                          ORDER BY o_totalprice DESC, o_orderkey) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC)
    """,
)
def win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/row_number/ntile per priority class. row_number and
    ntile get a unique tiebreaker (o_orderkey) for determinism."""
    o = load(spark, sf_dir, "orders")
    w_rank = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc())
    w_unique = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.rank().over(w_rank).alias("rnk"),
        F.dense_rank().over(w_rank).alias("drnk"),
        F.row_number().over(w_unique).alias("rn"),
        F.ntile(4).over(w_unique).alias("quartile"),
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id, value,
           LAG(value) OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           value - LAG(value) OVER w AS delta,
           FIRST_VALUE(value) OVER w AS first_value
    FROM events
    WHERE ts IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first_value per user timeline (sessionized sensor deltas —
    the reference's per-machine reading stream, analyzed). NULL-ts rows
    have no position in the timeline (Spark sorts them first, DuckDB
    last) and are dropped identically on both sides (round-8 NULL-ts
    sweep)."""
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
        F.first("value").over(w).alias("first_value"),
    )


@query(
    "win_running_sum",
    oracle=f"""
    SELECT event_id, user_id, value,
           CAST(SUM(CASE WHEN NOT isnan(value) AND abs(value) <= 1e+15 THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 100 AS running_sum,
           COUNT(*) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS running_n
    FROM events
    WHERE ts IS NOT NULL
    """,
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running (cumulative) sum per user over event time; integer-cents
    sum so the cumulative sum is order-exact on both engines; explicit
    ROWS frame (the default RANGE frame differs on ties). NULL-ts rows
    are dropped identically on both sides (round-8 NULL-ts sweep)."""
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "value",
        _csum("value", w).alias("running_sum"),
        F.count("*").over(w).alias("running_n"),
    )


@query(
    "win_moving_avg",
    oracle="""
    SELECT event_id, user_id, value,
           CAST(SUM(CASE WHEN NOT isnan(value) AND abs(value) <= 1e+15 THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END) OVER w AS DOUBLE)
             / 100 / COUNT(CASE WHEN NOT isnan(value) AND abs(value) <= 1e+15 THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END) OVER w AS moving_avg,
           MIN(value) OVER w AS moving_min,
           MAX(value) OVER w AS moving_max
    FROM events
    WHERE ts IS NOT NULL
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving 4-row average/min/max per user — the classic sensor-smoothing
    query over the reference's reading stream (FIXTURES.md §1 mapping).
    NULL-ts rows have no position in the moving order (Spark windows
    sort them first, DuckDB last) and are dropped identically on both
    sides (round-8 NULL-ts sweep — same r6 hardening class)."""
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "value",
        (_csum("value", w) / F.count(cents("value")).over(w)).alias("moving_avg"),
        F.min("value").over(w).alias("moving_min"),
        F.max("value").over(w).alias("moving_max"),
    )


@query(
    "win_range_interval",
    oracle="""
    SELECT event_id, user_id, value,
           CAST(SUM(CASE WHEN NOT isnan(value) AND abs(value) <= 1e+15 THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END) OVER (
             PARTITION BY user_id ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) / 100 AS hour_sum,
           COUNT(*) OVER (
             PARTITION BY user_id ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW
           ) AS hour_n
    FROM events
    """,
)
def win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: per-user trailing-hour sum/count —
    the value-based frame (all rows within 3600s), not a row-count frame.
    Both engines order by FLOORED epoch seconds (Spark's unix_timestamp
    truncates; DuckDB's epoch() keeps microseconds) so frame boundaries
    agree exactly."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "value",
        _csum("value", w).alias("hour_sum"),
        F.count("*").over(w).alias("hour_n"),
    )


@query(
    "win_ntile_cume",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           NTILE(4) OVER w AS quartile,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def win_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: NTILE quartiles, CUME_DIST and
    PERCENT_RANK per market segment. Ordering carries c_custkey as a
    unique tiebreaker so bucket assignment is deterministic; both
    engines use the SQL-standard NTILE split (larger buckets first)."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


@query(
    "win_first_last_nth",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           FIRST_VALUE(o_orderkey) OVER w AS first_key,
           LAST_VALUE(o_orderkey) OVER w AS last_key,
           NTH_VALUE(o_orderkey, 2) OVER w AS second_key
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional window navigation: each order sees its customer's
    biggest, smallest and runner-up orders. The full-partition ROWS
    frame is stated explicitly — default frames differ between engines
    (RANGE..CURRENT ROW), which silently changes last_value."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.first("o_orderkey").over(w).alias("first_key"),
        F.last("o_orderkey").over(w).alias("last_key"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
    )


@query(
    "win_cumulative_distinct",
    oracle="""
    WITH f AS (
      SELECT user_id, MIN(CAST(date_trunc('day', ts) AS DATE)) AS first_day
      FROM events GROUP BY user_id
    ),
    d AS (SELECT first_day AS day, COUNT(*) AS new_users FROM f GROUP BY first_day)
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS BIGINT) AS cum_users
    FROM d
    """,
)
def win_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative DISTINCT count over time (daily new users + running
    total) — the window shape no engine supports directly
    (COUNT(DISTINCT) OVER is illegal); the scalable rewrite is
    first-occurrence-per-key (one keyed agg) -> per-day counts (tiny) ->
    cumulative sum over the day domain. The corpus never sorts; the
    window runs over |days| rows only."""
    ev = load(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", "ts").cast("date")).alias("first_day")
    )
    per_day = first.groupBy(F.col("first_day").alias("day")).agg(
        F.count("*").alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        "day", "new_users", F.sum("new_users").over(w).alias("cum_users")
    )


@query(
    "win_lag_ignore_nulls",
    oracle="""
    SELECT event_id, user_id,
           last_value(CASE WHEN event_type = 'purchase' THEN value END
                      IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ) AS prev_purchase_value
    FROM events
    WHERE ts IS NOT NULL
    """,
)
def win_lag_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-tolerant LAG: each event sees the user's most recent
    PURCHASE value strictly before it (non-purchase rows are NULL and
    skipped) — the sparse-signal carry-forward every sessionized
    feature pipeline needs. Expressed as last_value IGNORE NULLS over
    an exclusive trailing frame, the portable form of
    ``LAG(...) IGNORE NULLS``; one shuffle on user_id, bounded
    per-partition state. NULL-ts rows have no position in the carry
    order and are dropped identically on both sides (round-8 NULL-ts
    sweep)."""
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.last(purchase_val, ignorenulls=True)
        .over(w)
        .alias("prev_purchase_value"),
    )


@query(
    "win_share_of_total",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(FLOOR(
             CAST(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                  AS DOUBLE)
             / CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                    OVER (PARTITION BY l_orderkey) AS DOUBLE)
             * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0 AS order_share
    FROM lineitem
    """,
)
def win_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report window: each line's share of its order's revenue
    (the classic percent-of-total shape). One shuffle on the partition
    key, unbounded frame collapses to a single per-partition total that
    Spark computes in one pass — no self-join against a per-order
    aggregate. Exact integer-cents numerator/denominator make the
    double quotient bit-identical across engines; quantized to 6
    decimals for presentation."""
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey")
    line_c = F.floor(F.col("l_extendedprice") * 100 + 0.5)
    share = line_c.cast("double") / F.sum(line_c).over(w).cast("double")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.floor(share * 1000000.0 + 0.5).cast("double") / 1000000.0).alias(
            "order_share"
        ),
    )
