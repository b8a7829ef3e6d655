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
max) are associative and the upsert replaces whole buckets.

Scale: state is bounded by active buckets per micro-batch (tiny); the
MERGE rewrites only matched buckets. On a lakehouse this is Delta MERGE
into a partitioned table; the dataflow is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

_DEC = "decimal(38,6)"

def _state_aggs():
    """Partial-state columns kept in the materialization: everything
    needed to merge a new batch associatively AND to present final
    metrics. (Built lazily — Column construction needs a session.)"""
    return [
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast(_DEC)).alias("sum_value_dec"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    ]


def _bucketize(df: DataFrame) -> DataFrame:
    return df.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(*_state_aggs())


def _merge_states(old: DataFrame, new: DataFrame) -> DataFrame:
    """Associative merge of two partial-state frames on the bucket key."""
    both = old.unionByName(new)
    return both.groupBy("event_type", "day").agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value_dec").alias("sum_value_dec"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def present(materialized: DataFrame) -> DataFrame:
    """Final reader view: derive avg from the mergeable partial state."""
    return materialized.select(
        "event_type",
        "day",
        "n_events",
        (F.col("sum_value_dec").cast("double") / F.col("n_events")).alias("avg_value"),
        "min_value",
        "max_value",
    )


def start_continuous_rollup(
    event_stream: DataFrame,
    materialization_path: str,
    checkpoint: str,
    trigger_seconds: float = 1.0,
) -> StreamingQuery:
    """Maintain the daily-rollup materialization from a streaming events
    DataFrame. Each micro-batch: aggregate the batch into bucket partial
    states, merge with the stored states for the touched buckets, upsert.
    """
    import os

    def update(batch_df: DataFrame, _batch_id: int) -> None:
        spark = batch_df.sparkSession
        fresh = _bucketize(batch_df)
        if os.path.exists(materialization_path):
            current = spark.read.parquet(materialization_path)
            touched = fresh.select("event_type", "day").distinct()
            relevant = current.join(touched, ["event_type", "day"], "left_semi")
            merged = _merge_states(relevant, fresh)
        else:
            merged = fresh
        from ..pipeline.sink import upsert_parquet

        upsert_parquet(merged, materialization_path, ["event_type", "day"])

    return (
        event_stream.writeStream.foreachBatch(update)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
