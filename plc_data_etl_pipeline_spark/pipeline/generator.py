"""Synthetic PLC sensor-reading source (reference operators R1-R3).

Reference behavior (producer/sensor_data_producer.py:53-59,92-99):
4 threads × N messages, each ``{machine_id: random M1-M3, sensor: random
temperature/pressure/vibration, reading: uniform[0,100), t_stamp:
time.time()}``, throttled by INTERVAL_MS (R2).

Spark-first: a *declarative* row source — ``spark.range`` (batch) or the
rate source (streaming) — with column expressions for the random fields.
Thread fan-out (R3) becomes partition parallelism; the throttle (R2)
becomes ``rowsPerSecond``. Determinism: rand(seed) + a fixed epoch base
so tests can assert exact values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MACHINES = ("M1", "M2", "M3")
SENSORS = ("temperature", "pressure", "vibration")

# Fixed base epoch for deterministic t_stamp in tests (2024-01-01 UTC).
BASE_EPOCH = 1704067200.0


def _pick(options: tuple[str, ...], r: F.Column) -> F.Column:
    """Uniform choice among options given r ~ U[0,1) — the Spark analog of
    random.choice (producer/sensor_data_producer.py:55-56)."""
    arr = F.array(*[F.lit(o) for o in options])
    idx = (r * len(options)).cast("int") + 1  # element_at is 1-based
    return F.element_at(arr, idx)


def generate_batch(
    spark: SparkSession,
    n_rows: int = 80,
    partitions: int = 4,
    seed: int = 42,
    interval_s: float = 0.5,
) -> DataFrame:
    """Batch PLC readings: the reference's 4-thread × 20-message run
    (producer defaults, sensor_data_producer.py:11-14) as one DataFrame.

    ``partitions`` plays the THREAD_COUNT role — each partition generates
    independently, exactly like the reference's threads. t_stamp advances
    by interval_s per row within a partition (the reference's sleep).
    """
    rows_per_part = n_rows // partitions
    df = spark.range(0, n_rows, 1, partitions)
    part = (F.col("id") / rows_per_part).cast("long")
    return df.select(
        _pick(MACHINES, F.rand(seed)).alias("machine_id"),
        _pick(SENSORS, F.rand(seed + 1)).alias("sensor"),
        (F.rand(seed + 2) * 100.0).alias("reading"),
        (
            F.lit(BASE_EPOCH)
            + (F.col("id") % rows_per_part) * interval_s
            + part * 0.001  # per-"thread" phase offset
        ).alias("t_stamp"),
    )


def generate_stream(
    spark: SparkSession,
    rows_per_second: int = 100,
    partitions: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Streaming PLC readings from the rate source (R1+R2 streaming form:
    rowsPerSecond is the declarative throttle replacing the sleep loop).
    t_stamp is real event time (``timestamp`` from the rate source), like
    the reference's time.time()."""
    df = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .option("numPartitions", partitions)
        .load()
    )  # schema: timestamp, value
    return df.select(
        _pick(MACHINES, F.rand(seed)).alias("machine_id"),
        _pick(SENSORS, F.rand(seed + 1)).alias("sensor"),
        (F.rand(seed + 2) * 100.0).alias("reading"),
        F.col("timestamp").cast("double").alias("t_stamp"),
    )
