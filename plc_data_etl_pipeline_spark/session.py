"""SparkSession factory and per-session tuning.

Two entry paths:
  * ``get_spark()``     - build a session with scale-oriented defaults
                          (local test harness, bench.py, pytest).
  * ``ensure_tuned(s)`` - idempotently apply the *runtime-settable* subset
                          of those defaults to a session we did not build
                          (the driver passes us its own SparkSession).

Scale posture (100 TB / 1000 executors): every knob here is either
runtime-safe or a build-time default that degrades gracefully on a real
cluster — AQE handles post-shuffle partition sizing and skew joins, so the
static ``spark.sql.shuffle.partitions`` only seeds the initial value.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs, applied to ANY session we touch (incl. driver's).
_RUNTIME_CONF = {
    # Oracle parity: the reference converts epoch->timestamp via naive
    # localtime (consumer/sensor_data_consumer.py:132); we keep the
    # semantics but pin the zone so Spark and DuckDB agree (SURVEY §7.3).
    "spark.sql.session.timeZone": "UTC",
    # AQE: runtime coalescing of shuffle partitions + skew-join splitting.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas_udf / mapInPandas path (10-100x over row UDFs).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Bound the bytes in flight per Arrow batch (guide §4.2: Spark 4's
    # direct knob; lower it for wide rows / large text cells). Round-8
    # measurement: on this environment the JVM->Python worker feed
    # exhibits intermittent multi-second stalls PROPORTIONAL to the
    # in-flight batch bytes (full diagnostic chain in
    # OPTIMIZATION_r08.md: not the UDF body — inner-timed at 0.2 s
    # while the task walls 3-15 s; not GC — gc log clean; not worker
    # re-forks — pids stable; vanishes when batches shrink). The
    # default 64 MB cap let a 5k-document text column travel as one
    # multi-MB batch: dedup_minhash's noop wall was 6-15 s on 6 of 8
    # passes vs 1.1-2.6 s on 8 of 8 with this cap. 256 KB also bounds
    # per-worker memory at scale (wide text rows can't balloon a
    # batch); retune upward on clusters whose local sockets are
    # healthy if per-batch Python overhead ever dominates (measured
    # here: sub-10% on the embedding/numeric Arrow paths).
    "spark.sql.execution.arrow.maxBytesPerBatch": str(256 * 1024),
    # Dimension tables (region/nation/supplier/customer/part at test SF)
    # must broadcast; 64 MB is still safe on 4 GB executors.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # events.parquet carries TIMESTAMP(NANOS) which Spark cannot read
    # natively; read as long and convert in catalog.load (DuckDB parity:
    # it truncates ns -> us).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def ensure_tuned(spark: SparkSession) -> SparkSession:
    """Idempotently apply runtime-settable tuning to an existing session."""
    for k, v in _RUNTIME_CONF.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            pass  # non-settable on this build; defaults are acceptable
    return spark


def get_spark(
    app_name: str = "plc-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver contract) or
    ``local[*]``. ``shuffle_partitions`` seeds AQE; at 100 TB you would set
    this to ~2-3x total cores and let AQE coalesce.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or (32 if cpus == "*" else int(cpus))),
        )
        # Generous result cap for local bench collects; the engine itself
        # never collects unbounded data (SURVEY §7.3: no collect() in
        # operator paths).
        .config("spark.driver.maxResultSize", "2g")
        # local[N] runs driver+executors in ONE JVM whose default heap
        # is 1g — far too small for a 32-thread 128 GiB box (measured:
        # iterative-join caching GC-thrashed at 10x scale). Only applies
        # when THIS builder creates the JVM; a pre-existing session
        # (e.g. the grading driver's) keeps its own setting.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        )
        .config("spark.sql.parquet.compression.codec", "snappy")
    )
    for k, v in _RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return ensure_tuned(spark)
