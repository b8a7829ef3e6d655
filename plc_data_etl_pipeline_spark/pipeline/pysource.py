"""Custom Python DataSource: the reference's sensor producer as a
first-class Spark SOURCE (Spark 4 ``pyspark.sql.datasource`` API).

The reference generates readings in a 4-thread Python loop and pushes
them THROUGH Kafka (producer/sensor_data_producer.py:53-59,82,92-99).
Spark-first, the generator IS a source: ``spark.read.format("plc_sensor")``
(batch) / ``spark.readStream.format("plc_sensor")`` (micro-batch
streaming). Threads map to input partitions (R3), the INTERVAL_MS
throttle maps to ``rows_per_batch`` per trigger (R2), and the record
shape matches the reference exactly: machine_id in M1-M3, sensor in
temperature/pressure/vibration, reading ~ U[0,100), t_stamp epoch
seconds.

Determinism: every row's fields derive from a seeded per-row RNG keyed
by (seed, global row index), so any (partition count, batch split)
produces the same multiset of rows — replayable offsets, as a
Structured Streaming source must be.

The JVM-expression twin of this generator (pipeline/generator.py) is the
fast path; this module is the extension-point demo — a custom source in
~100 lines of pure Python with batch + streaming + partition planning.
"""

from __future__ import annotations

import random
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

MACHINES = ("M1", "M2", "M3")
SENSORS = ("temperature", "pressure", "vibration")
BASE_EPOCH = 1704067200.0  # 2024-01-01 UTC (pipeline/generator.py)

_SCHEMA = (
    "machine_id string, sensor string, reading double, t_stamp double"
)


def _row(seed: int, i: int, interval_s: float):
    rng = random.Random((seed << 32) | i)
    return (
        MACHINES[rng.randrange(len(MACHINES))],
        SENSORS[rng.randrange(len(SENSORS))],
        rng.random() * 100.0,
        BASE_EPOCH + i * interval_s,
    )


@dataclass
class _Range(InputPartition):
    start: int
    end: int


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 80))
        self.parts = int(options.get("partitions", 4))
        self.seed = int(options.get("seed", 42))
        self.interval_s = float(options.get("interval_s", 0.5))

    def partitions(self):
        per = max(1, self.n_rows // self.parts)
        return [
            _Range(s, min(s + per, self.n_rows))
            for s in range(0, self.n_rows, per)
        ]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            yield _row(self.seed, i, self.interval_s)


class _StreamReader(DataSourceStreamReader):
    """Replayable micro-batch source: offset = global row index; each
    trigger advances by rows_per_batch (the declarative R2 throttle)."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 20))
        self.parts = int(options.get("partitions", 4))
        self.seed = int(options.get("seed", 42))
        self.interval_s = float(options.get("interval_s", 0.5))
        self._offset = 0

    def initialOffset(self):
        return {"index": 0}

    def latestOffset(self):
        self._offset += self.rows_per_batch
        return {"index": self._offset}

    def partitions(self, start, end):
        s, e = start["index"], end["index"]
        per = max(1, (e - s) // self.parts)
        return [_Range(a, min(a + per, e)) for a in range(s, e, per)]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            yield _row(self.seed, i, self.interval_s)

    def commit(self, end):
        pass


class PlcSensorDataSource(DataSource):
    @classmethod
    def name(cls):
        return "plc_sensor"

    def schema(self):
        return _SCHEMA

    def reader(self, schema: StructType):
        return _BatchReader(self.options)

    def streamReader(self, schema: StructType):
        return _StreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(PlcSensorDataSource)
