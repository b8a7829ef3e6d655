"""Reference-parity ETL pipeline (SURVEY.md §2.1 operators R1-R20).

The reference is producer → Kafka(Avro) → consumer → Postgres
(/root/reference, SURVEY.md §0). Spark-first re-expression:

  generator.py  — synthetic PLC reading source, batch + streaming (R1-R3)
  avro_codec.py — Avro binary encode/decode + poison-pill tolerance
                  (R4, R9, R10) — pure-Python wire format in Pandas UDFs
                  (the spark-avro external jar is not in this container)
  sink.py       — micro-batched sinks with at-least-once/idempotent modes,
                  surrogate keys, throughput counters (R12-R18)

Kafka and JDBC endpoints are config passthroughs on the same DataFrames
(``.format("kafka")`` / ``.jdbc(...)``) — not exercised here because the
container has no brokers/DB, but the operator surface is identical.
"""
