"""Continuously-maintained rolling-distinct materialization.

The batch form (queries/events.py::win_sliding_distinct — rolling 7-day
distinct active users per day) maintained INCREMENTALLY: the stored
state is one exact roaring-style bitmap per (day, 32k-id bucket), and
each micro-batch ORs its own per-day bitmaps into the store. The
7-day window counts are derived from the state at read time (fan each
day's bitmaps to the ≤7 window ends they feed, OR-fold, count) — raw
events are never rescanned, and the state size is days × buckets,
independent of event volume.

Replay safety is STRUCTURAL here, not bookkept: bitmap OR is
idempotent (x ∨ x = x), so a micro-batch re-delivered after a crash
between upsert and checkpoint commit folds in a second time with no
effect. Compare streaming/continuous.py, whose SUM states need the
last_batch_id guard — idempotent-by-algebra beats idempotent-by-
bookkeeping when the sketch allows it (the reason mergeable sketches
are the right state for exactly-once-adjacent pipelines).

Scale: per micro-batch the merge touches only the (day, bucket) rows
the batch produced; the upsert rewrites matched rows only
(pipeline/sink.py::upsert_parquet — Delta/Iceberg MERGE on a real
lakehouse). Presenting the window is a ≤7× fan-out of ≤4 KB sketch
rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def _bucketize(df: DataFrame) -> DataFrame:
    """Per-(day, id-bucket) exact bitmap of the batch's active users."""
    return df.select(
        F.to_date("ts").alias("day"), "user_id"
    ).groupBy(
        "day", F.expr("bitmap_bucket_number(user_id + 1)").alias("bkt")
    ).agg(
        F.expr(
            "bitmap_construct_agg(bitmap_bit_position(user_id + 1))"
        ).alias("bmp")
    )


def _merge_states(old: DataFrame, new: DataFrame) -> DataFrame:
    both = old.unionByName(new)
    return both.groupBy("day", "bkt").agg(
        F.expr("bitmap_or_agg(bmp)").alias("bmp")
    )


def merge_micro_batch(
    batch_df: DataFrame, batch_id: int, materialization_path: str
) -> None:
    """OR one micro-batch's bitmaps into the store. ``batch_id`` is
    unused by design — the OR is idempotent, replays are free."""
    import os

    spark = batch_df.sparkSession
    fresh = _bucketize(batch_df)
    if os.path.exists(materialization_path):
        current = spark.read.parquet(materialization_path)
        touched = fresh.select("day", "bkt").distinct()
        relevant = current.join(touched, ["day", "bkt"], "left_semi")
        merged = _merge_states(relevant, fresh)
    else:
        merged = fresh
    from ..pipeline.sink import upsert_parquet

    upsert_parquet(merged, materialization_path, ["day", "bkt"])


def present(materialized: DataFrame, window_days: int = 7) -> DataFrame:
    """Rolling ``window_days``-day distinct counts per active day,
    derived purely from the bitmap state (same semantics as the batch
    win_sliding_distinct query)."""
    fanout = materialized.select(
        F.explode(F.sequence(F.lit(0), F.lit(window_days - 1))).alias("off"),
        F.col("day"),
        "bkt",
        "bmp",
    ).select(F.date_add("day", F.col("off")).alias("day"), "bkt", "bmp")
    days = materialized.select("day").distinct()
    windowed = fanout.join(days, "day", "left_semi")
    return (
        windowed.groupBy("day", "bkt")
        .agg(F.expr("bitmap_count(bitmap_or_agg(bmp))").alias("c"))
        .groupBy("day")
        .agg(F.sum("c").alias("n_users_7d"))
    )


def start_sliding_distinct(
    event_stream: DataFrame,
    materialization_path: str,
    checkpoint: str,
    trigger_seconds: float = 1.0,
) -> StreamingQuery:
    """Maintain the bitmap store from a streaming events DataFrame."""

    def update(batch_df: DataFrame, batch_id: int) -> None:
        merge_micro_batch(batch_df, batch_id, materialization_path)

    return (
        event_stream.writeStream.foreachBatch(update)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
