"""Core relational operator surface (SURVEY.md §2.2).

The reference has no query layer at all (exhaustive read, SURVEY §2.2) —
its only row transforms are projection (consumer/sensor_data_consumer.py:
116-122) and epoch→timestamp (ibid:131-134). This module declares the
Spark-native relational surface over the driver's test tables: projection,
filters, joins, aggregations, window functions, sort/top-k, set ops,
scalar functions.

Scale posture per operator family:
* filters/projections compile to parquet pushed-filters + pruned ReadSchema;
* small-dim joins hash-broadcast (we hint ``broadcast()`` explicitly where
  the dim is known-small; AQE handles the rest);
* aggregations use partial (map-side) aggregation automatically;
* window functions partition by high-cardinality keys — a single global
  window (no partitionBy) is only used on provably tiny inputs (top-k
  after limit), never on the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..registry import query
from ._conv import DECIMAL_MODE, cents, davg, dsum, sql_davg, sql_dsum

# ---------------------------------------------------------------------------
# Flagship: per-sensor daily rollup over the PLC-stream analog table.
# events.user_id ~ machine_id, event_type ~ sensor, value ~ reading,
# ts ~ t_stamp (FIXTURES.md §1).
# ---------------------------------------------------------------------------


@query(
    "sensor_rollup_daily",
    oracle=f"""
    SELECT event_type,
           CAST(date_trunc('day', ts) AS DATE) AS day,
           COUNT(*) AS n_events,
           {sql_davg('value', 'avg_value')},
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type, CAST(date_trunc('day', ts) AS DATE)
    """,
)
def sensor_rollup_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: daily per-sensor stats (scan→agg on event-time buckets).

    Reference analog: this is the analytic question the reference pipeline
    exists to feed (sensor readings into Postgres for inspection,
    README.md:6-8), answered directly in Spark.

    Shape: two-level aggregation instead of ``countDistinct``. The naive
    form plans an Expand (2 rows per input) before the exchange; here
    level 1 partial-aggregates every stat per (event_type, day, user_id)
    — so shuffle 1 carries one pre-combined row per user-day, strictly
    less than Expand's doubled stream — and level 2 folds user rows into
    the final day rows, where ``n_users`` is a plain non-null count of
    the already-distinct user keys (measured 1.5x faster at sf0.1; the
    gap widens with row count at fixed user cardinality). Sums stay in
    exact integer cents through both levels (BIGINT addition is
    associative, so regrouping preserves bit-equality with the oracle's
    single-level sum; see _conv.py)."""
    ev = load(spark, sf_dir, "events")
    if DECIMAL_MODE:  # env-gated exact-decimal fallback (>1e12-row scales)
        return ev.groupBy(
            "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
        ).agg(
            F.count("*").alias("n_events"),
            davg("value", "avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    per_user = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
        "user_id",
    ).agg(
        F.count("*").alias("c_all"),
        # in-domain count to pair with the guarded cents sum, matching
        # davg()'s denominator (round-8 extreme-float sweep)
        F.count(cents("value")).alias("c_val"),
        F.sum(cents("value")).alias("sc"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    return per_user.groupBy("event_type", "day").agg(
        F.sum("c_all").cast("bigint").alias("n_events"),
        # Identical operands and op order as davg(): (sum/10^2)/count.
        (F.sum("sc").cast("double") / 100 / F.sum("c_val")).alias("avg_value"),
        F.min("mn").alias("min_value"),
        F.max("mx").alias("max_value"),
        # Level-1 keys are already distinct; COUNT of non-NULL user keys
        # == COUNT(DISTINCT user_id) (both skip the NULL-user group).
        F.count("user_id").alias("n_users"),
    )


# ---------------------------------------------------------------------------
# Projection / filter family
# ---------------------------------------------------------------------------


@query(
    "project_filter",
    oracle="""
    SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_returnflag = 'R' AND l_quantity > 25.0
    """,
)
def project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + conjunctive predicate; both push into the parquet scan
    (explain shows PushedFilters + 4-column ReadSchema). Reference analog:
    projection at consumer/sensor_data_consumer.py:116-122 (no predicates
    exist in the reference)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_returnflag") == "R") & (F.col("l_quantity") > 25.0)).select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )


@query(
    "filter_in_between",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    WHERE o_orderstatus IN ('F', 'P')
      AND o_totalprice BETWEEN 50000.0 AND 150000.0
      AND o_orderdate >= TIMESTAMP '1996-01-01'
    """,
)
def filter_in_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list + BETWEEN + timestamp comparison predicates (all pushed)."""
    o = load(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("F", "P")
        & F.col("o_totalprice").between(50000.0, 150000.0)
        & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


@query(
    "filter_null_safe",
    oracle="""
    SELECT e.event_id, e.user_id, e.value
    FROM events e
    WHERE e.props IS NOT NULL
      AND (e.value IS NULL OR e.value >= 100.0)
      AND e.event_type IS DISTINCT FROM 'click'
    """,
)
def filter_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-aware predicates: IS NOT NULL, OR-with-null, null-safe
    inequality (IS DISTINCT FROM ≡ NOT eqNullSafe)."""
    ev = load(spark, sf_dir, "events")
    return ev.filter(
        F.col("props").isNotNull()
        & (F.col("value").isNull() | (F.col("value") >= 100.0))
        & ~F.col("event_type").eqNullSafe(F.lit("click"))
    ).select("event_id", "user_id", "value")
