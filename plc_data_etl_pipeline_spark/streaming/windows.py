"""Event-time windowed aggregation (tumbling / sliding / session) and
watermarked dedup.

The reference has no event-time processing at all — its only notion of
time is the processing-time flush timeout (R12). These operators are the
Spark-native windowing surface the PLC stream *should* have, and they are
identical expressions in batch and streaming (Structured Streaming's core
design) — so correctness is oracle-checked in batch
(queries/stream_batch.py) and the streaming tests only need to assert
batch/stream convergence.

Scale: windowed agg state is partitioned by (window, keys); the watermark
bounds state size — state for windows older than the watermark is
dropped. At 100 TB/day the knobs are watermark delay (state memory) and
``spark.sql.shuffle.partitions`` (state shards).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_event_time(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize an event-time column to TIMESTAMP (LTZ) for watermarking.

    Parquet written with isAdjustedToUTC=false reads back as
    TIMESTAMP_NTZ, which ``withWatermark`` rejects
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE). The session timezone is pinned
    to UTC (session.py), so NTZ -> LTZ reinterprets the same wall-clock
    instant — a no-op on values, required by the state-store clock."""
    if dict(df.dtypes).get(col) == "timestamp_ntz":
        df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def _agg_cols() -> list[Column]:
    # avg via exact integer-cents sum (order-independent, oracle
    # bit-parity — queries/_conv.py rationale). cents() NULLs NaN/Inf/
    # out-of-envelope readings so one poisoned value cannot ANSI-
    # overflow the fold; the count is over in-domain values to match
    # (round-8 extreme-float sweep).
    from ..queries._conv import cents

    return [
        F.count("*").alias("n_events"),
        (
            F.sum(cents("value")).cast("double")
            / 100
            / F.count(cents("value"))
        ).alias("avg_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    ]


def tumbling(df: DataFrame, duration: str = "1 hour",
             watermark: str | None = None) -> DataFrame:
    """Non-overlapping event-time buckets per event_type."""
    if watermark:
        df = with_event_time(df).withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", duration).alias("w"), F.col("event_type"))
        .agg(*_agg_cols())
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "avg_value",
            "min_value",
            "max_value",
        )
    )


def sliding(df: DataFrame, duration: str = "1 hour", slide: str = "30 minutes",
            watermark: str | None = None) -> DataFrame:
    """Overlapping windows: each event lands in duration/slide windows."""
    if watermark:
        df = with_event_time(df).withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", duration, slide).alias("w"), F.col("event_type"))
        .agg(*_agg_cols())
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "avg_value",
            "min_value",
            "max_value",
        )
    )


def session(df: DataFrame, gap: str = "10 minutes",
            watermark: str | None = None) -> DataFrame:
    """Session windows per user: events at most ``gap`` apart merge
    (inclusive — an event exactly ``gap`` after its predecessor joins the
    same session); only a strictly larger gap starts a new session
    (session_window, Spark >= 3.2; pinned empirically in
    tests/test_boundary_semantics.py)."""
    if watermark:
        df = with_event_time(df).withWatermark("ts", watermark)
    return (
        df.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(*_agg_cols())
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "user_id",
            "n_events",
            "avg_value",
            "min_value",
            "max_value",
        )
    )


def session_dynamic(df: DataFrame,
                    watermark: str | None = None) -> DataFrame:
    """Dynamic-gap session windows (Spark >= 3.2 session_window with a
    Column gap): each event extends its session by an event-dependent
    timeout — here purchases hold sessions open 20 minutes, everything
    else 10. The semantics are interval-overlap merging of
    [ts, ts+gap(event)) per key; identical expression runs streaming
    (state eviction follows the watermark + per-event gaps)."""
    if watermark:
        df = with_event_time(df).withWatermark("ts", watermark)
    gap = F.when(
        F.col("event_type") == "purchase", F.lit("20 minutes")
    ).otherwise(F.lit("10 minutes"))
    return (
        df.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(*_agg_cols())
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            "user_id",
            "n_events",
            "avg_value",
            "min_value",
            "max_value",
        )
    )


def dedup_with_watermark(df: DataFrame, keys: list[str],
                         watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: state holds keys only until the watermark
    passes (bounded memory — the streaming analog of dedup_exact)."""
    return with_event_time(df).withWatermark("ts", watermark).dropDuplicates(keys)
