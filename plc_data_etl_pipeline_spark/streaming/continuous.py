"""Continuously-maintained materialized rollup (hypertable-style
continuous aggregate).

The flagship analytic question (per-sensor daily stats,
queries/relational.py::sensor_rollup_daily) maintained INCREMENTALLY as
events stream in: each micro-batch recomputes only the (event_type, day)
buckets it touched and MERGEs them into a parquet materialization
(pipeline/sink.py::upsert_parquet). Readers always see a complete,
current rollup without ever scanning raw history.

Correctness contract (tested): after any prefix of the stream is
processed, the materialization equals the batch rollup over exactly the
events seen so far — because per-bucket partial states (count/sum/min/
max) are associative, the upsert replaces whole buckets, and the merge
is IDEMPOTENT per micro-batch: each bucket records the last batch id
merged into it, so a batch replayed after a crash between upsert and
checkpoint commit (Structured Streaming re-runs the failed batch with
the same batch_id) is detected and skipped instead of double-counted.

Scale: state is bounded by active buckets per micro-batch (tiny); the
MERGE rewrites only matched buckets. On a lakehouse this is Delta MERGE
into a partitioned table; the dataflow is identical.

Float exactness: the mergeable sum is integer cents (events.value is an
exact 2-decimal measure — queries/_conv.py), so merge order can never
change the presented average.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def _state_aggs():
    """Partial-state columns kept in the materialization: everything
    needed to merge a new batch associatively AND to present final
    metrics. (Built lazily — Column construction needs a session.)"""
    return [
        F.count("*").alias("n_events"),
        F.sum(F.floor(F.col("value") * 100 + 0.5)).alias("sum_value_cents"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    ]


def _bucketize(df: DataFrame) -> DataFrame:
    return df.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(*_state_aggs())


def _merge_states(old: DataFrame, new: DataFrame) -> DataFrame:
    """Associative merge of two partial-state frames on the bucket key.
    Either side may carry ``last_batch_id``; the merged bucket keeps the
    max (the newest batch folded in)."""
    cols = [
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value_cents").alias("sum_value_cents"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    ]
    if "last_batch_id" in old.columns and "last_batch_id" in new.columns:
        cols.append(F.max("last_batch_id").alias("last_batch_id"))
    both = old.unionByName(new, allowMissingColumns=False)
    return both.groupBy("event_type", "day").agg(*cols)


def present(materialized: DataFrame) -> DataFrame:
    """Final reader view: derive avg from the mergeable partial state."""
    return materialized.select(
        "event_type",
        "day",
        "n_events",
        (
            F.col("sum_value_cents").cast("double") / 100 / F.col("n_events")
        ).alias("avg_value"),
        "min_value",
        "max_value",
    )


def merge_micro_batch(
    batch_df: DataFrame, batch_id: int, materialization_path: str
) -> None:
    """Fold one micro-batch into the materialization, idempotently.

    Replay guard: a bucket whose recorded ``last_batch_id`` is >= this
    batch's id has already absorbed it (foreachBatch re-delivers a failed
    batch under the SAME id) — the stored state is kept and the fresh
    partial dropped for that bucket.
    """
    import os

    spark = batch_df.sparkSession
    fresh = _bucketize(batch_df).withColumn(
        "last_batch_id", F.lit(batch_id).cast("long")
    )
    if os.path.exists(materialization_path):
        current = spark.read.parquet(materialization_path)
        if "last_batch_id" not in current.columns:  # pre-upgrade state
            current = current.withColumn(
                "last_batch_id", F.lit(-1).cast("long")
            )
        touched = fresh.select("event_type", "day").distinct()
        relevant = current.join(touched, ["event_type", "day"], "left_semi")
        already = relevant.filter(
            F.col("last_batch_id") >= batch_id
        ).select("event_type", "day")
        fresh_new = fresh.join(already, ["event_type", "day"], "left_anti")
        merged = _merge_states(relevant, fresh_new)
    else:
        merged = fresh
    from ..pipeline.sink import upsert_parquet

    upsert_parquet(merged, materialization_path, ["event_type", "day"])


def start_continuous_rollup(
    event_stream: DataFrame,
    materialization_path: str,
    checkpoint: str,
    trigger_seconds: float = 1.0,
) -> StreamingQuery:
    """Maintain the daily-rollup materialization from a streaming events
    DataFrame. Each micro-batch: aggregate the batch into bucket partial
    states, merge with the stored states for the touched buckets
    (skipping buckets that already folded this batch_id in — replay
    safety), upsert.
    """
    def update(batch_df: DataFrame, batch_id: int) -> None:
        merge_micro_batch(batch_df, batch_id, materialization_path)

    return (
        event_stream.writeStream.foreachBatch(update)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
