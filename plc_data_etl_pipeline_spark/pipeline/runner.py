"""End-to-end reference-pipeline runner: the whole
producer→Kafka(Avro)→consumer→Postgres dataflow as one Spark job.

A user of the reference runs ``docker compose up`` (SURVEY §3.3) to get:
random PLC readings → Avro-encoded to a topic → decoded → micro-batched
→ inserted into a table. ``run_batch``/``run_stream`` are the drop-in
equivalents: same record shape, same Avro wire format, same delivery
semantics, one function call — with the broker/DB endpoints swappable in
via pipeline/connectors.py when those services exist.

The Avro encode→decode hop is kept in the middle ON PURPOSE: it
exercises the exact serialization boundary the reference has between
producer and consumer (R4→R9), including poison-pill handling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from . import avro_codec as A
from . import generator as G
from . import sink as K


def _through_wire(plc: DataFrame, dead_letter: bool = True) -> DataFrame:
    """producer→consumer serialization boundary: encode to the Confluent
    Avro frame, decode back, drop (or side-channel) undecodables."""
    encoded = plc.select(
        A.avro_encode(
            F.col("machine_id"), F.col("sensor"), F.col("reading"), F.col("t_stamp")
        ).alias("value")
    )
    decoded = encoded.select(A.avro_decode(F.col("value")).alias("rec")).select(
        "rec.*"
    )
    return decoded


def run_batch(
    spark: SparkSession,
    out_path: str,
    n_rows: int = 80,
    partitions: int = 4,
) -> DataFrame:
    """Reference pipeline, batch form: generate → Avro roundtrip →
    project/epoch→timestamp/surrogate-key → parquet append. Returns the
    sink-shaped DataFrame (also written to ``out_path``)."""
    plc = G.generate_batch(spark, n_rows=n_rows, partitions=partitions)
    rows = K.finalize_plc_rows(_through_wire(plc))
    K.write_batch(rows, out_path, mode="append")
    return rows


def run_stream(
    spark: SparkSession,
    out_path: str,
    checkpoint: str,
    rows_per_second: int = 100,
    trigger_seconds: float = 1.0,
    mode: str = "append",
) -> StreamingQuery:
    """Reference pipeline, streaming form: rate source → Avro roundtrip →
    finalize → micro-batched parquet sink with checkpointing (the
    consumer's offset-commit contract, SURVEY §3.2)."""
    plc = G.generate_stream(spark, rows_per_second=rows_per_second)
    rows = K.finalize_plc_rows(_through_wire(plc), with_id=False)
    return K.start_micro_batch_sink(
        rows, out_path, checkpoint, mode=mode, trigger_seconds=trigger_seconds
    )
