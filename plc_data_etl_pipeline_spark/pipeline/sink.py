"""Micro-batched sinks with the reference's delivery semantics
(reference operators R12-R18).

Reference consumer (consumer/sensor_data_consumer.py): poll loop →
in-memory batch → flush on count>=N OR age>=T (R12) → epoch→timestamp
(R13) → execute_values INSERT (R14) → DB commit → Kafka offset commit
(R15) ⇒ at-least-once, duplicates possible and silently kept (no natural
key, postgres/init.sql:3-9).

Spark-first mapping:
  * micro-batching       -> Structured Streaming's native model; trigger =
                            ProcessingTime(T) + maxOffsetsPerTrigger≈N
                            (count-OR-time has no exact analog — SURVEY
                            §4.2.1; the guarantee "a record waits at most
                            T, batches are bounded" is preserved)
  * offset-after-commit  -> checkpointLocation (the checkpoint commits
                            AFTER foreachBatch returns — identical
                            at-least-once contract for plain appends)
  * at-least-once append -> ``mode="append"`` (reference parity: dups kept)
  * idempotent upgrade   -> ``mode="idempotent"`` writes each micro-batch
                            to a batchId-named subdir first, making replays
                            overwrite instead of duplicate (the Delta MERGE
                            stand-in; this container has no Delta jar)
  * epoch→timestamp      -> timestamp_seconds (R13) under pinned UTC
  * surrogate key (R17)  -> monotonically_increasing_id (partition-unique,
                            not gapless — same as SERIAL under concurrency)
  * counters (R18)       -> df.observe() / StreamingQueryListener
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def finalize_plc_rows(df: DataFrame, with_id: bool = True) -> DataFrame:
    """R11+R13+R17: project to sink column order, epoch→timestamp,
    surrogate key. The reference's fromtimestamp is naive-localtime
    (consumer:132); we pin UTC session tz (session.py) so semantics are
    deterministic."""
    out = df.select(
        "machine_id",
        "sensor",
        "reading",
        F.timestamp_seconds("t_stamp").alias("t_stamp"),
    )
    if with_id:
        out = out.withColumn("id", F.monotonically_increasing_id())
    return out


def observed(df: DataFrame, name: str = "plc_metrics") -> DataFrame:
    """R18 throughput counters: observable metrics travel with the plan
    (query.lastProgress['observedMetrics'][name] in streaming;
    collected via QueryExecutionListener in batch)."""
    return df.observe(name, F.count(F.lit(1)).alias("rows"),
                      F.min("t_stamp").alias("min_ts"),
                      F.max("t_stamp").alias("max_ts"))


def write_batch(df: DataFrame, path: str, mode: str = "append") -> None:
    """Batch parity sink: partitioned parquet append (the Postgres INSERT
    analog; .jdbc(...) is a drop-in alternative behind the same frame)."""
    df.write.mode(mode).parquet(path)


def start_micro_batch_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    mode: str = "append",
    trigger_seconds: float = 2.0,
    dead_letter_path: str | None = None,
) -> StreamingQuery:
    """R12-R16: micro-batched streaming sink via foreachBatch.

    ``mode="append"``     — reference-parity at-least-once: a batch
                            replayed after a crash between sink write and
                            checkpoint commit appends duplicates (exactly
                            the reference's DB-commit-before-offset-commit
                            window, consumer:108/138).
    ``mode="idempotent"`` — replay-safe: each micro-batch lands in a
                            batchId-keyed subdir with overwrite, so
                            re-execution replaces rather than duplicates.
    ``mode="transactional"`` — exactly-once: each micro-batch commits to
                            a transactional parquet table
                            (pipeline/txlog.py) carrying the batch id as
                            its txn marker; a batch replayed after a
                            crash between commit and checkpoint is
                            detected in the log and skipped. Read the
                            sink with ``TransactionalParquetTable.read``.
    ``dead_letter_path``  — R10 upgrade: rows with NULL decode results are
                            appended there instead of silently dropped
                            (the reference logs-and-drops; we do better
                            but keep the drop from the main stream).
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        good = batch_df
        if "machine_id" in batch_df.columns:
            bad = batch_df.filter(F.col("machine_id").isNull())
            good = batch_df.filter(F.col("machine_id").isNotNull())
            if dead_letter_path is not None:
                bad.write.mode("append").parquet(dead_letter_path)
        if mode == "idempotent":
            good.write.mode("overwrite").parquet(
                os.path.join(path, f"batch_id={batch_id}")
            )
        elif mode == "transactional":
            from .txlog import TransactionalParquetTable

            TransactionalParquetTable(good.sparkSession, path).append(
                good, txn=("micro_batch_sink", batch_id)
            )
        else:
            good.write.mode("append").parquet(path)

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )


def upsert_parquet(
    spark_df: DataFrame, path: str, keys: list[str]
) -> None:
    """MERGE-style upsert onto a parquet target: rows matching on
    ``keys`` are replaced by the incoming version, others are kept.

    This is the exactly-once upgrade path over the reference's blind
    append (SURVEY §4.2.2) expressed without a transactional table
    format: read target → anti-join out the matched keys → union the
    updates → rewrite. On a real deployment this is Delta/Iceberg
    ``MERGE`` (transactional, file-pruned); the dataflow — anti-join +
    union on the key — is identical. The rewrite is atomic-enough for
    tests via a temp-dir swap; a production parquet-only variant would
    partition the target and rewrite only affected partitions.
    """
    import os
    import shutil
    import tempfile

    spark = spark_df.sparkSession
    if os.path.exists(path):
        target = spark.read.parquet(path)
        keep = target.join(spark_df.select(*keys).distinct(), keys, "left_anti")
        merged = keep.unionByName(spark_df)
    else:
        merged = spark_df
    tmp = tempfile.mkdtemp(prefix="upsert_")
    merged.write.mode("overwrite").parquet(tmp)
    out = spark.read.parquet(tmp)
    out.count()  # materialize before the target is replaced
    if os.path.exists(path):
        shutil.rmtree(path)
    shutil.move(tmp, path)
