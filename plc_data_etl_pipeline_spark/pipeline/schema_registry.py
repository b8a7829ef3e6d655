"""In-memory Schema-Registry stub (the Confluent-registry subset the
reference relies on).

The reference producer registers its Avro schema with a Schema Registry
under subject ``{topic}-value`` and ships the assigned schema id inside
every message's 5-byte wire header (magic 0x00 + big-endian int32 id —
producer/sensor_data_producer.py:30-36); the consumer's deserializer
resolves the header id back to a schema before decoding
(consumer/sensor_data_consumer.py:30-36,49-57). No registry service
exists in this container, so this stub reproduces the semantics that
matter to the pipeline:

* subject -> versioned schema registration, idempotent per schema text
  (re-registering the same schema returns the same id — Confluent
  behavior);
* id -> schema lookup for decoders;
* wire-header validation: ``pipeline.avro_codec.avro_decode`` rejects
  payloads whose header id is not the expected one, routing them to the
  poison-pill/dead-letter path instead of mis-decoding them with the
  wrong schema.

At scale the registry client is a tiny metadata lookup cached per
executor; nothing here touches the data path's per-row cost.
"""

from __future__ import annotations

import json
from dataclasses import dataclass


def _canonical(schema_json: str) -> str:
    """Canonical form for idempotency: whitespace-insensitive JSON."""
    return json.dumps(json.loads(schema_json), sort_keys=True, separators=(",", ":"))


@dataclass(frozen=True)
class RegisteredSchema:
    schema_id: int
    subject: str
    version: int
    schema_json: str


class SchemaRegistryStub:
    """id <-> schema map with Confluent-style subject/version semantics."""

    def __init__(self) -> None:
        self._by_id: dict[int, RegisteredSchema] = {}
        self._id_by_canonical: dict[str, int] = {}
        self._versions: dict[str, list[int]] = {}
        self._next_id = 1

    def register(self, subject: str, schema_json: str) -> int:
        """Register a schema under a subject; returns its global id.

        Idempotent: the same schema text (canonicalized) keeps its id,
        and re-registering it under a subject it already has does not
        bump the subject's version list.
        """
        canon = _canonical(schema_json)
        sid = self._id_by_canonical.get(canon)
        if sid is None:
            sid = self._next_id
            self._next_id += 1
            self._id_by_canonical[canon] = sid
        versions = self._versions.setdefault(subject, [])
        if sid not in versions:
            versions.append(sid)
            self._by_id[sid] = RegisteredSchema(
                sid, subject, len(versions), schema_json
            )
        return sid

    def schema_by_id(self, schema_id: int) -> RegisteredSchema | None:
        return self._by_id.get(schema_id)

    def latest(self, subject: str) -> RegisteredSchema | None:
        versions = self._versions.get(subject)
        return self._by_id[versions[-1]] if versions else None
