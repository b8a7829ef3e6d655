"""Kafka and JDBC connector surface (reference operators R5, R8, R14).

The reference's endpoints are a 3-broker Kafka cluster (producer R5,
consumer R8 — docker-compose.yml:2-151) and Postgres via execute_values
(R14 — consumer/sensor_data_consumer.py:124-138). On Spark both are
config passthroughs around the SAME DataFrames the rest of the engine
produces; these wrappers pin the reference's delivery semantics
(idempotent producer, earliest offsets, batched inserts) as defaults.

This container ships no Kafka broker and no spark-sql-kafka package, so
the Kafka wrappers raise a clear error if the integration jars are
absent (``require_kafka_support``) — the call shapes are still
unit-testable and the parquet/Avro pipeline covers the dataflow
semantics end-to-end (pipeline/sink.py, tests/test_pipeline.py).

The JDBC path (R14) IS executed: Spark bundles the Derby engine
(jars/derby-10.16.*), so ``embedded_derby_url`` gives an in-process
SQL database standing in for the reference's Postgres — batched
append, read-back, and the streaming foreachBatch→JDBC consumer shape
all run for real in tests/test_pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

# Reference producer config (producer/sensor_data_producer.py:15-16,37-44).
PRODUCER_DEFAULTS = {
    "kafka.enable.idempotence": "true",
    "kafka.acks": "all",
    "kafka.retries": "5",
    "kafka.batch.size": "16384",
    "kafka.linger.ms": "10",
}


def require_kafka_support(spark: SparkSession) -> None:
    """Fail fast with a useful message when spark-sql-kafka is absent."""
    try:
        # py4j resolves missing classes lazily; Class.forName forces it
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
    except Exception as e:
        raise RuntimeError(
            "Kafka integration requires the spark-sql-kafka-0-10 package "
            "(--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>); "
            "not bundled in this environment"
        ) from e


def kafka_sink_options(bootstrap: str, topic: str) -> dict[str, str]:
    """R5: producer options with the reference's idempotent settings."""
    return {
        "kafka.bootstrap.servers": bootstrap,
        "topic": topic,
        **PRODUCER_DEFAULTS,
    }


def kafka_source_options(bootstrap: str, topic: str) -> dict[str, str]:
    """R8: consumer options — earliest offsets like the reference
    (consumer/sensor_data_consumer.py:52); offset tracking moves from
    group commits to the streaming checkpoint."""
    return {
        "kafka.bootstrap.servers": bootstrap,
        "subscribe": topic,
        "startingOffsets": "earliest",
    }


def write_kafka(df: DataFrame, bootstrap: str, topic: str) -> None:
    """Batch write of a binary ``value`` column (e.g. avro_codec output)."""
    require_kafka_support(df.sparkSession)
    writer = df.write.format("kafka")
    for k, v in kafka_sink_options(bootstrap, topic).items():
        writer = writer.option(k, v)
    writer.save()


def read_kafka_stream(spark: SparkSession, bootstrap: str, topic: str,
                      max_offsets_per_trigger: int | None = None) -> DataFrame:
    """Streaming Kafka source; ``maxOffsetsPerTrigger`` is the count half
    of the reference's count-OR-time flush trigger (SURVEY §4.2.1)."""
    require_kafka_support(spark)
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(bootstrap, topic).items():
        reader = reader.option(k, v)
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


# Embedded Derby: the JDBC database bundled with Spark itself (used by
# its Hive metastore). In-process, zero-install — the executable
# stand-in for the reference's Postgres sink.
DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def embedded_derby_url(db_dir: str) -> str:
    """JDBC URL for an embedded Derby database at ``db_dir`` (created on
    first use). Single-JVM only — for production use a server-mode URL
    (postgresql/mysql/...) with the same ``write_jdbc`` call."""
    return f"jdbc:derby:{db_dir};create=true"


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "append",
               batchsize: int = 500, **properties: str) -> None:
    """R14: batched JDBC append — ``batchsize`` mirrors the reference's
    execute_values page size (BATCH_SIZE=500 compose profile,
    docker-compose.yml:190)."""
    (
        df.write.mode(mode)
        .format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .options(**properties)
        .save()
    )


def jdbc_micro_batch_sink(stream_df: DataFrame, url: str, table: str,
                          checkpoint: str, batchsize: int = 500,
                          **properties: str) -> StreamingQuery:
    """Streaming → JDBC via foreachBatch: the exact Spark shape of the
    reference consumer (micro-batch insert then checkpoint commit ⇒
    at-least-once, SURVEY §3.2)."""

    def sink(batch_df: DataFrame, _batch_id: int) -> None:
        write_jdbc(batch_df, url, table, "append", batchsize, **properties)

    return (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .start()
    )
