"""Custom Python DataSource SINK: the reference's DB sink as a
first-class Spark writer (Spark 4 ``pyspark.sql.datasource`` API).

The reference's consumer flushes batched INSERTs to Postgres and acks
offsets after the flush (consumer/sensor_data_consumer.py:124-138 batched
execute_values; :88,108 commit-after-flush). No Postgres (or Kafka jar)
exists in this sandbox, so connectors.py can only declare option
surfaces — THIS module supplies the executed coverage for the sink
protocol itself, which is the part Spark owns regardless of the target
system:

  * ``write(iterator)`` runs per task and STAGES its rows (a temp file
    here; a DB transaction or staging table in production), returning a
    commit message — nothing is visible yet;
  * ``commit(messages)`` runs once on the driver after every task
    succeeded and atomically publishes the staged pieces (manifest file
    here; COMMIT in a DB);
  * ``abort(messages)`` discards staged pieces after any task failure —
    a failed job leaves NO partial output.

Streaming commits receive ``batchId`` and are idempotent: a manifest
already present for the batch means a checkpoint replay, and the staged
duplicate is discarded — upgrading the reference's at-least-once to
exactly-once (SURVEY §4.2 R15/R16).

Readers of the sink's output must take the union of files named by the
``_manifest-*`` files, NOT the directory listing — staged-but-uncommitted
garbage is invisible by construction. ``read_committed`` does exactly
that.

Scale posture: one staged file per write task (no driver fan-in of row
data), commit messages carry only file names + counts (bytes never flow
through the driver), and the manifest write is a single atomic rename.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _Staged(WriterCommitMessage):
    file: str  # absolute path of the staged piece
    n_rows: int


def _stage_rows(path: str, iterator) -> _Staged:
    """Task-side: spill this partition's rows to a staged JSONL file."""
    staging = os.path.join(path, "_staging")
    os.makedirs(staging, exist_ok=True)
    fname = os.path.join(staging, f"part-{uuid.uuid4().hex}.jsonl")
    n = 0
    with open(fname, "w", encoding="utf-8") as f:
        for row in iterator:
            f.write(json.dumps(row.asDict(), default=str) + "\n")
            n += 1
    return _Staged(file=fname, n_rows=n)


def _publish(path: str, messages, manifest_name: str) -> None:
    """Driver-side: move staged pieces into place, then atomically
    publish the manifest naming them. Crash before the rename = nothing
    committed (staged files are garbage-collected by abort/next job);
    crash after = fully committed."""
    os.makedirs(path, exist_ok=True)
    files, total = [], 0
    for m in messages:
        if m is None or m.n_rows == 0:
            if m is not None and os.path.exists(m.file):
                os.remove(m.file)
            continue
        final = os.path.join(path, os.path.basename(m.file))
        os.replace(m.file, final)
        files.append(os.path.basename(final))
        total += m.n_rows
    tmp = os.path.join(path, f".{manifest_name}.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump({"files": files, "n_rows": total}, f)
    os.replace(tmp, os.path.join(path, manifest_name))


def _discard(messages) -> None:
    for m in messages:
        if m is not None and os.path.exists(m.file):
            os.remove(m.file)


class _BatchWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        return _stage_rows(self.path, iterator)

    def commit(self, messages):
        _publish(self.path, messages, f"_manifest-job-{uuid.uuid4().hex}")

    def abort(self, messages):
        _discard(messages)


class _StreamWriter(DataSourceStreamWriter):
    """Micro-batch sink with exactly-once commits: the manifest is keyed
    by batchId, so a replayed batch (crash between sink commit and
    checkpoint commit — the reference's R16 window) is detected and its
    staged duplicate discarded instead of double-published."""

    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator):
        return _stage_rows(self.path, iterator)

    def commit(self, messages, batchId):
        manifest = os.path.join(self.path, f"_manifest-{batchId:020d}")
        if os.path.exists(manifest):  # checkpoint replay: already published
            _discard(messages)
            return
        _publish(self.path, messages, f"_manifest-{batchId:020d}")

    def abort(self, messages, batchId):
        _discard(messages)


class PlcDbSink(DataSource):
    """``df.write.format("plc_db_sink").option("path", dir).save()`` /
    ``df.writeStream.format("plc_db_sink")...``."""

    @classmethod
    def name(cls):
        return "plc_db_sink"

    def writer(self, schema, overwrite: bool):
        if overwrite:
            raise NotImplementedError(
                "plc_db_sink is append-only (the reference's INSERT "
                "semantics); use mode('append')"
            )
        return _BatchWriter(self.options)

    def streamWriter(self, schema, overwrite: bool):
        return _StreamWriter(self.options)


def read_committed(spark, path: str, schema: str):
    """Read ONLY committed output: the union of files named by manifests."""
    if not os.path.isdir(path):  # nothing committed yet
        return spark.createDataFrame([], schema)
    files = []
    for m in sorted(os.listdir(path)):
        if m.startswith("_manifest-"):
            with open(os.path.join(path, m), encoding="utf-8") as f:
                files += [os.path.join(path, x) for x in json.load(f)["files"]]
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)


def register(spark) -> None:
    spark.dataSource.register(PlcDbSink)
