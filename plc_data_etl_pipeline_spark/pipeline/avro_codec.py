"""Avro binary encode/decode for the reference's PLCData record
(reference operators R4/R9/R10).

Reference wire format (schema/schema.avsc:1-11 + Confluent serializer,
producer/sensor_data_producer.py:32-36,67): a 5-byte Confluent header
(magic 0x00 + big-endian int32 schema id) followed by Avro binary:
  machine_id: string  -> zigzag-varint byte-length + UTF-8 bytes
  sensor:     string  -> same
  reading:    double  -> 8 bytes little-endian IEEE-754
  t_stamp:    double  -> same

The spark-avro external module is not in this container, so the wire
format is implemented directly from the public Avro 1.12 spec
(https://avro.apache.org/docs/1.12.0/specification/ — "Binary encoding")
inside Arrow-batched Pandas UDFs. With the jar present,
``from_avro``/``to_avro`` drop in behind the same column signature; the
pure-Python path doubles as an independent cross-check of those builtins.

Poison-pill tolerance (R10, consumer/sensor_data_consumer.py:101-102):
``avro_decode`` yields NULL for undecodable payloads; callers either
filter them out (reference behavior: drop + continue) or route them to a
dead-letter side output — both shown in pipeline/sink.py.
"""

from __future__ import annotations

import io
import struct

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

PLC_SCHEMA_JSON = """{
  "type": "record", "name": "PLCData", "namespace": "com.example.plc",
  "fields": [
    {"name": "machine_id", "type": "string"},
    {"name": "sensor", "type": "string"},
    {"name": "reading", "type": "double"},
    {"name": "t_stamp", "type": "double"}
  ]
}"""

PLC_STRUCT = StructType(
    [
        StructField("machine_id", StringType()),
        StructField("sensor", StringType()),
        StructField("reading", DoubleType()),
        StructField("t_stamp", DoubleType()),
    ]
)

MAGIC = b"\x00"
# Default wire-header schema id: what a SchemaRegistryStub assigns the
# PLC schema on first registration (subject {topic}-value, SURVEY §1.1;
# pipeline/schema_registry.py). encode/decode take an explicit id for
# multi-schema topics.
SCHEMA_ID = 1


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag_decode(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def encode_record(machine_id: str, sensor: str, reading: float, t_stamp: float,
                  schema_id: int = SCHEMA_ID) -> bytes:
    """One PLCData record -> Confluent-framed Avro binary bytes."""
    out = bytearray()
    out += MAGIC + struct.pack(">i", schema_id)
    for s in (machine_id, sensor):
        raw = s.encode("utf-8")
        out += _zigzag_encode(len(raw)) + raw
    out += struct.pack("<d", reading) + struct.pack("<d", t_stamp)
    return bytes(out)


def decode_record(payload: bytes,
                  expected_schema_id: int | None = SCHEMA_ID
                  ) -> tuple[str, str, float, float] | None:
    """Confluent-framed Avro binary -> record tuple, or None if corrupt
    (poison-pill skip, R10) OR framed with a schema id other than
    ``expected_schema_id`` (registry semantics — decoding with the wrong
    schema would mis-parse, so wrong-id payloads take the dead-letter
    path; pass None to skip the id check)."""
    try:
        if payload is None or len(payload) < 5 or payload[0] != 0:
            return None
        if expected_schema_id is not None:
            (wire_id,) = struct.unpack(">i", payload[1:5])
            if wire_id != expected_schema_id:
                return None
        buf = io.BytesIO(payload[5:])
        strs = []
        for _ in range(2):
            n = _zigzag_decode(buf)
            if n < 0 or n > 10_000:
                return None
            raw = buf.read(n)
            if len(raw) != n:
                return None
            strs.append(raw.decode("utf-8"))
        rest = buf.read(16)
        if len(rest) != 16:
            return None
        reading, t_stamp = struct.unpack("<dd", rest)
        return (strs[0], strs[1], reading, t_stamp)
    except Exception:
        return None


@F.pandas_udf(BinaryType())
def _encode_udf(machine_id: pd.Series, sensor: pd.Series, reading: pd.Series,
                t_stamp: pd.Series) -> pd.Series:
    return pd.Series(
        [
            encode_record(m, s, r, t)
            for m, s, r, t in zip(machine_id, sensor, reading, t_stamp)
        ]
    )


def avro_encode(machine_id: Column, sensor: Column, reading: Column,
                t_stamp: Column) -> Column:
    """PLC columns -> Avro-framed binary ``value`` column (R4). Drop-in
    shape for ``df.write.format("kafka")`` which wants a binary value."""
    return _encode_udf(machine_id, sensor, reading, t_stamp)


def avro_decode(payload: Column,
                expected_schema_id: int | None = SCHEMA_ID) -> Column:
    """Binary ``value`` column -> PLCData struct column; NULL on corrupt
    payloads (R9 + R10) or on a wire-header schema id that doesn't match
    ``expected_schema_id`` (registry validation — wrong-id messages take
    the dead-letter path). Select ``decoded.*`` to flatten."""

    @F.pandas_udf(PLC_STRUCT)
    def _decode_udf(payload: pd.Series) -> pd.DataFrame:
        rows = [decode_record(p, expected_schema_id) for p in payload]
        return pd.DataFrame(
            [(None, None, None, None) if r is None else r for r in rows],
            columns=["machine_id", "sensor", "reading", "t_stamp"],
        )

    return _decode_udf(payload)
