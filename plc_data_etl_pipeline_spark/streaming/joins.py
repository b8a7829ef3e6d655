"""Stream-stream and stream-static joins (Structured Streaming).

The reference has nothing like this (its consumer is a single linear
pipe), but any real PLC deployment correlates streams — e.g. "pair each
error event with the purchases the same user makes within the next ten
minutes". Structured Streaming's stream-stream join buffers both sides
in watermark-bounded state and emits matches as they become provable;
the time-interval predicate is what lets the engine EVICT state (without
it, both sides would buffer forever).

Scale posture: state is keyed by (join key, event time), sharded across
``spark.sql.shuffle.partitions`` state stores; each side's watermark
bounds retention, so state size is O(rate x window), independent of
total stream length. The SAME join expression runs in batch — tested by
batch/stream convergence in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .windows import with_event_time


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_s: int = 0,
    upper_s: int = 600,
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Equi-key + time-interval join: right.ts in
    [left.ts + lower_s, left.ts + upper_s].

    Works identically on two streaming inputs (watermarks applied here;
    Spark derives state eviction from the interval bounds) and on batch
    inputs (watermark is a no-op on batch DataFrames, so the exact same
    function body is the batch twin).
    """
    l_ = with_event_time(left, left_ts).withWatermark(left_ts, watermark).alias("l")
    r_ = with_event_time(right, right_ts).withWatermark(right_ts, watermark).alias("r")
    lts, rts = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rts >= lts + F.expr(f"INTERVAL {lower_s} SECONDS"))
        & (rts <= lts + F.expr(f"INTERVAL {upper_s} SECONDS"))
    )
    return l_.join(r_, cond, how)


def error_purchase_pairs(
    events: DataFrame,
    follow_minutes: int = 10,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Errors paired with the same user's purchases within the next
    ``follow_minutes`` — the concrete correlation query both engines of
    the convergence test run (streaming self-join: the events source is
    read twice; each read is an independent stream head)."""
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("error_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    e = with_event_time(errors, "error_ts").withWatermark("error_ts", watermark)
    p = with_event_time(purchases, "purchase_ts").withWatermark("purchase_ts", watermark)
    cond = (
        (e.user_id == p.p_user_id)
        & (p.purchase_ts >= e.error_ts)
        & (
            p.purchase_ts
            <= e.error_ts + F.expr(f"INTERVAL {follow_minutes} MINUTES")
        )
    )
    return e.join(p, cond, "inner").select(
        "user_id",
        "error_id",
        "purchase_id",
        F.date_format("error_ts", "yyyy-MM-dd HH:mm:ss").alias("error_time"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias(
            "purchase_time"
        ),
        "purchase_value",
    )


def enrich_stream_with_dim(
    stream_df: DataFrame,
    dim_df: DataFrame,
    stream_key: str = "user_id",
    dim_key: str = "c_custkey",
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    (batch) dimension with an explicit broadcast hint.

    Scale posture: the static side is stateless — Structured Streaming
    re-evaluates the dim per micro-batch (picking up new dim files on
    object storage), and the broadcast keeps the stream side from ever
    shuffling. State stores are NOT involved: unlike stream-stream
    joins, nothing is buffered, so this composes freely under any
    watermark. The same function body is the batch twin (a broadcast
    hash join) — oracle-checked as ``stream_enrich_static``.
    """
    return stream_df.join(
        F.broadcast(dim_df), stream_df[stream_key] == dim_df[dim_key], how
    )


def error_purchase_pairs_outer(
    events: DataFrame,
    follow_minutes: int = 10,
    watermark: str = "30 minutes",
) -> DataFrame:
    """LEFT OUTER twin of :func:`error_purchase_pairs`: every error
    emits at least one row, with NULL purchase columns when no purchase
    followed within ``follow_minutes``. Built ON :func:`interval_join`
    (how='left') — one join body shared by the oracle-checked batch
    query (stream_join_interval_outer) and the streaming convergence
    test, so the two cannot drift (round-6 review). In streaming the
    null row emits only once the purchase-side watermark PROVES no
    match can still arrive — eviction doubles as negative evidence."""
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("error_id"),
        F.col("ts").alias("error_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    j = interval_join(
        errors,
        purchases,
        key="user_id",
        left_ts="error_ts",
        right_ts="purchase_ts",
        lower_s=0,
        upper_s=follow_minutes * 60,
        watermark=watermark,
        how="left",
    )
    return j.select(
        F.col("l.user_id").alias("user_id"),
        "error_id",
        F.date_format("error_ts", "yyyy-MM-dd HH:mm:ss").alias("error_time"),
        "purchase_id",
        "purchase_value",
    )
