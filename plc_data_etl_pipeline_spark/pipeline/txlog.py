"""Minimal transactional parquet table (exactly-once sink upgrade).

The reference's sink is a blind at-least-once INSERT into Postgres
(consumer/sensor_data_consumer.py:124-138: DB commit before Kafka offset
commit — a crash in between replays the batch as duplicates). The
lakehouse fix is a transactional table format (Delta/Iceberg MERGE); no
such jar ships in this container, so this module implements the minimal
log-structured commit protocol those formats are built on — enough for
snapshot-isolated reads, atomic writes, and idempotent (exactly-once)
streaming commits, entirely on parquet + a JSON log:

  <table>/
    _txlog/00000000000000000001.json   one manifest per committed version
    data/<uuid>/part-*.parquet         immutable data files

* A manifest lists the exact data files live in that version plus an
  optional ``txn`` marker {app, id}. Readers resolve the LATEST manifest
  and read only its files — writers never mutate committed files, so a
  reader holds a consistent snapshot for as long as it wants.
* Commit = create the next-version manifest with O_CREAT|O_EXCL: on a
  POSIX filesystem exactly one concurrent committer wins; losers re-read
  table state and retry (append/upsert) — optimistic concurrency, the
  same shape as Delta's conditional-PUT protocol on object stores.
* Exactly-once: a committer passing ``txn=(app, id)`` is skipped if any
  committed manifest already carries that marker — a streaming
  foreachBatch that crashed between commit and checkpoint re-runs as a
  no-op instead of duplicating (tested).
* Crash safety: data files are fully written BEFORE the manifest exists;
  a pre-commit crash leaves unreferenced files only (``vacuum`` removes
  them), never a torn table.

Scale: the log is O(versions) tiny JSON; data file counts per commit
come from Spark's normal partitioned write, and MERGE rewrites only the
files of the current snapshot (at real scale you'd partition and prune
— the protocol is unchanged).

Data skipping: every commit also records per-file min/max envelopes for
the leaf numeric/string/date columns (read from the parquet footers the
writer already produced — a metadata-only pass, no data re-read; the
same stats Delta keeps in its log and Iceberg in manifests).
``read(where=...)`` prunes files whose envelope cannot satisfy a
conjunctive predicate BEFORE Spark ever lists them — on a 100 TB table
with range-clustered files (write_zordered / repartitionByRange) this is
the difference between scanning everything and scanning one file.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CommitConflict(Exception):
    """Another writer committed this version first; re-read and retry."""


def _stat_literal(x):
    """Normalize a partition-key literal into the manifest's stat
    domain (the mapping ``_collect_file_stats`` applies to footer
    min/max). Deliberately STRICTER than the stat collector: only types
    whose normalization provably agrees between a pyarrow footer value
    and a Spark-collected value are admitted (int, str, date — date
    isoformat is identical on both paths). Timestamps are excluded:
    pyarrow may return tz-aware datetimes whose isoformat carries an
    offset suffix while Spark collects naive ones, and a false
    "cannot match" there would silently skip a rewrite. None = not
    representable; callers must fall back to no pruning."""
    import datetime

    if isinstance(x, bool):
        return None  # bool envelopes are not collected
    if isinstance(x, (int, str)):
        return x
    if isinstance(x, datetime.date) and not isinstance(x, datetime.datetime):
        return x.isoformat()
    return None


class TransactionalParquetTable:
    """Log-structured parquet table with atomic, idempotent commits.

    ``partition_by`` (optional, one column) makes every write CLUSTER
    its data files by that column — each data file holds exactly one
    partition value, so the per-file min/max envelope for the column is
    exact ([v, v]) and file pruning on it is partition pruning. MERGE,
    DELETE and the CDC apply then rewrite only the files of TOUCHED
    partitions (see :meth:`merge_apply_changes`) — at 100 TB a
    maintenance merge against a day-partitioned table rewrites one
    day, not the table. The key is recorded in the manifest, so a
    reopened table inherits it without the caller restating it.
    """

    MAX_RETRIES = 10
    # A change feed touching more distinct partitions than this skips
    # pruning (the full-snapshot merge is then cheaper than the
    # per-partition bookkeeping); bounds the driver-side collect too.
    MAX_PRUNED_PARTITIONS = 1024

    def __init__(self, spark: SparkSession, path: str,
                 partition_by: str | None = None):
        self.spark = spark
        self.path = path
        self._log_dir = os.path.join(path, "_txlog")
        self._data_dir = os.path.join(path, "data")
        self.partition_by = partition_by
        if partition_by is None:
            vs = self._versions()
            if vs:
                self.partition_by = self._read_manifest(vs[-1]).get(
                    "partitionBy"
                )

    # ----------------------------------------------------------------- log
    def _manifest_path(self, version: int) -> str:
        return os.path.join(self._log_dir, f"{version:020d}.json")

    def _versions(self) -> list[int]:
        if not os.path.isdir(self._log_dir):
            return []
        return sorted(
            int(f.split(".")[0])
            for f in os.listdir(self._log_dir)
            if f.endswith(".json")
        )

    def version(self) -> int:
        """Latest committed version (0 = table does not exist yet)."""
        vs = self._versions()
        return vs[-1] if vs else 0

    def _oldest_version(self) -> int:
        """Oldest RETAINED version (> 1 after expire_snapshots)."""
        vs = self._versions()
        return vs[0] if vs else 0

    def _read_manifest(self, version: int) -> dict:
        with open(self._manifest_path(version)) as f:
            return json.load(f)

    def history(self) -> list[dict]:
        return [self._read_manifest(v) for v in self._versions()]

    def _txn_already_committed(self, txn: tuple[str, int] | None) -> bool:
        if txn is None:
            return False
        app, tid = txn
        return any(
            m.get("txn") == {"app": app, "id": tid} for m in self.history()
        )

    # ---------------------------------------------------------------- read
    def read(self, version: int | None = None) -> DataFrame:
        """Snapshot read of ``version`` (default: latest committed).

        Files are read under the MANIFEST's schema, not whatever schema
        the first listed file happens to carry: after additive schema
        evolution (``append(..., merge_schema=True)``) older files lack
        the new columns, and the explicit schema makes Spark fill them
        with NULL — the same read-time reconciliation Delta/Iceberg do.
        """
        v = self.version() if version is None else version
        if v == 0:
            raise FileNotFoundError(f"no committed version in {self.path}")
        m = self._read_manifest(v)
        files = m["files"]
        if not files:
            # empty table snapshot: preserve schema via the log
            return self.spark.createDataFrame([], m.get("schema"))
        return self.spark.read.schema(m["schema"]).parquet(
            *[os.path.join(self.path, f) for f in files]
        )

    # ------------------------------------------------------ data skipping
    @staticmethod
    def _envelope_may_match(stats: dict, col: str, op: str, value) -> bool:
        """Can any row of a file with this [min,max] envelope satisfy
        ``col op value``? Missing stats -> conservatively True."""
        env = stats.get(col)
        if env is None:
            return True
        lo, hi = env
        if lo is None or hi is None:
            return True
        if op == "=":
            return lo <= value <= hi
        if op == "<":
            return lo < value
        if op == "<=":
            return lo <= value
        if op == ">":
            return hi > value
        if op == ">=":
            return hi >= value
        if op == "between":
            vlo, vhi = value
            return not (hi < vlo or lo > vhi)
        raise ValueError(f"unsupported predicate op {op!r}")

    def candidate_files(
        self, where: list[tuple], version: int | None = None
    ) -> list[str]:
        """Table-relative files whose stat envelopes may satisfy the
        conjunction ``where`` = [(col, op, value), ...] — the pruning
        decision alone, exposed for tests/observability (how many of the
        snapshot's files a predicate actually touches)."""
        v = self.version() if version is None else version
        m = self._read_manifest(v)
        stats = m.get("stats", {})
        return [
            f
            for f in m["files"]
            if all(
                self._envelope_may_match(stats.get(f, {}), c, op, val)
                for (c, op, val) in where
            )
        ]

    def read_where(
        self, where: list[tuple], version: int | None = None
    ) -> DataFrame:
        """Snapshot read with file-level data skipping: files whose
        min/max envelope cannot satisfy the conjunctive predicate are
        never given to Spark (no listing, no footer read, no scan task),
        and the exact predicate is still applied row-level to the
        survivors. ``where`` literals: numbers or strings."""
        v = self.version() if version is None else version
        if v == 0:
            raise FileNotFoundError(f"no committed version in {self.path}")
        m = self._read_manifest(v)
        keep = self.candidate_files(where, version=v)
        if not keep:
            return self.spark.createDataFrame([], m.get("schema"))
        df = self.spark.read.schema(m["schema"]).parquet(
            *[os.path.join(self.path, f) for f in keep]
        )
        return df.filter(self._condition(where))

    @staticmethod
    def _condition(where: list[tuple]):
        """Conjunctive (col, op, value) predicate list -> one Column."""
        cond = F.lit(True)
        for col, op, val in where:
            c = F.col(col)
            term = {
                "=": c == val,
                "<": c < val,
                "<=": c <= val,
                ">": c > val,
                ">=": c >= val,
            }.get(op)
            if term is None and op == "between":
                term = c.between(val[0], val[1])
            if term is None:
                raise ValueError(f"unsupported predicate op {op!r}")
            cond = cond & term
        return cond

    def _collect_file_stats(
        self, rel_files: list[str], prior: dict | None = None
    ) -> dict:
        """Per-file {col: [min, max]} envelopes from parquet footers —
        metadata-only (no row read). Envelopes for files already present
        in ``prior`` (the parent manifest) are carried forward unread:
        files are immutable, so a 100 TB table re-reads footers only for
        the files THIS commit added."""
        import datetime

        import pyarrow.parquet as pq

        def jsonable(x):
            if isinstance(x, (int, float, str)):
                return x if not (isinstance(x, float) and x != x) else None
            if isinstance(x, (datetime.datetime, datetime.date)):
                return x.isoformat()
            return None  # binary/decimal/etc: skip, prune stays sound

        out: dict = {}
        for rel in rel_files:
            if prior and rel in prior:
                out[rel] = prior[rel]
                continue
            meta = pq.ParquetFile(os.path.join(self.path, rel)).metadata
            env: dict = {}
            for rg in range(meta.num_row_groups):
                row_group = meta.row_group(rg)
                for ci in range(row_group.num_columns):
                    col = row_group.column(ci)
                    st = col.statistics
                    if st is None or not st.has_min_max:
                        env[col.path_in_schema] = None
                        continue
                    lo, hi = jsonable(st.min), jsonable(st.max)
                    if lo is None or hi is None:
                        env[col.path_in_schema] = None
                        continue
                    cur = env.get(col.path_in_schema)
                    if cur is None and col.path_in_schema in env:
                        continue  # a previous row group had no stats
                    if cur is None:
                        env[col.path_in_schema] = [lo, hi]
                    else:
                        env[col.path_in_schema] = [
                            min(cur[0], lo),
                            max(cur[1], hi),
                        ]
            out[rel] = {k: v for k, v in env.items() if v is not None}
        return out

    def read_changes(
        self, from_version: int, to_version: int | None = None
    ) -> DataFrame:
        """Change feed between two committed versions (CDF-style): every
        row added or removed by each commit in ``(from_version,
        to_version]``, tagged with ``_change_type`` ('inserted' /
        'removed') and ``_commit_version``.

        Computed purely from the log: a commit's change set is the FILE
        diff of its manifest against its parent — rows in newly-listed
        files are inserts, rows in dropped files are removals. No
        per-row bookkeeping is ever written. Append commits therefore
        produce exact inserts; merge/overwrite commits (which rewrite
        the snapshot's files) degenerate to removed-snapshot +
        inserted-snapshot — consumers diff the two sides for net
        changes. A production table would partition data files so
        merges rewrite only touched partitions, tightening this to
        near-row granularity; the LOG semantics are identical.

        Commits carrying ``dataChange: false`` (``compact``) are skipped
        entirely: they rearrange bytes, not rows. The skip composes with
        the file-diff because the NEXT data commit diffs against the
        compacted manifest — rows the compaction repacked appear in
        neither side of that diff.
        """
        to_v = self.version() if to_version is None else to_version
        # Retention boundary: the loop needs every manifest in
        # [max(from_version, 1), to_v]; after expire_snapshots an
        # expired start must fail with a RESYNC signal, not a raw
        # FileNotFoundError mid-loop (round-6 review).
        lo = self._oldest_version()
        if from_version + 1 <= to_v and max(from_version, 1) < lo:
            raise ValueError(
                f"read_changes: history before version {lo} of "
                f"{self.path} has been expired (expire_snapshots); the "
                f"consumer checkpointed at {from_version} must fully "
                "resync from a snapshot read"
            )
        frames: list[DataFrame] = []
        for v in range(from_version + 1, to_v + 1):
            if not self._read_manifest(v).get("dataChange", True):
                continue
            prev = (
                set(self._read_manifest(v - 1)["files"]) if v > 1 else set()
            )
            cur = set(self._read_manifest(v)["files"])
            # Each side reads under ITS version's schema (inserted files
            # under v, removed under v-1) so schema-evolved commits
            # reconcile; the final union tolerates the column delta.
            for files, typ, sv in (
                (sorted(cur - prev), "inserted", v),
                (sorted(prev - cur), "removed", max(v - 1, 1)),
            ):
                if not files:
                    continue
                df = self.spark.read.schema(
                    self._read_manifest(sv)["schema"]
                ).parquet(*[os.path.join(self.path, f) for f in files])
                frames.append(
                    df.withColumn("_change_type", F.lit(typ)).withColumn(
                        "_commit_version", F.lit(v)
                    )
                )
        if not frames:
            schema = self._read_manifest(to_v)["schema"]
            return self.spark.createDataFrame([], schema).withColumn(
                "_change_type", F.lit("")
            ).withColumn("_commit_version", F.lit(0))
        out = frames[0]
        for f in frames[1:]:
            out = out.unionByName(f, allowMissingColumns=True)
        return out

    # --------------------------------------------------------------- write
    def _write_data_files(self, df: DataFrame) -> list[str]:
        """Write immutable data files; return table-relative paths.

        When the table has a ``partition_by`` column present in ``df``,
        the write goes through ``partitionBy`` on a DUPLICATE of the
        column (so the original stays inside the files and snapshot
        reads are unchanged), then the ``__part=v/`` Hive dirs are
        flattened into the commit dir with the partition token prefixed
        to the (task-unique) file name. Result: one partition value per
        file, tight [v, v] footer envelopes, and no Hive-style dirs for
        Spark to mis-infer on multi-file reads.

        Zero-row part files (a Spark write emits one per empty task,
        e.g. after a selective filter over many partitions) are dropped
        before registration: they carry no stats (so they defeat file
        pruning conservatively) and accrete open/footer cost on every
        scan. The check reads footers only — no row data."""
        import shutil

        import pyarrow.parquet as pq

        sub = os.path.join("data", uuid.uuid4().hex)
        target = os.path.join(self.path, sub)
        p = self.partition_by
        if p is not None and p in df.columns:
            # Cluster rows by the partition column BEFORE the Hive-style
            # write: without it every write task emits one file per
            # partition value it happens to hold (tasks x values small
            # files — measured 2.5k files and a 13 s footer-stat wall on
            # the factor-50 probe), with it each value lands in exactly
            # one task => one file per partition value per commit. At
            # real scale a single file per value can be too coarse —
            # repartition(N, col) with N > |values| splits hot
            # partitions while keeping cold ones single-file.
            (
                df.repartition(F.col(p))
                .withColumn("__part", F.col(p))
                .write.partitionBy("__part")
                .mode("overwrite")
                .parquet(target)
            )
            for d in sorted(os.listdir(target)):
                full_d = os.path.join(target, d)
                if not (os.path.isdir(full_d) and d.startswith("__part=")):
                    continue
                token = d.split("=", 1)[1]  # already Hive-escaped: fs-safe
                for f in sorted(os.listdir(full_d)):
                    if f.endswith(".parquet"):
                        # 'v-' guard: a token starting with '_' or '.'
                        # (e.g. __HIVE_DEFAULT_PARTITION__ for NULLs)
                        # would make Spark's hidden-file path filter
                        # silently skip the file at read time.
                        os.rename(
                            os.path.join(full_d, f),
                            os.path.join(target, f"v-{token}-{f}"),
                        )
                shutil.rmtree(full_d, ignore_errors=True)
        else:
            df.write.mode("overwrite").parquet(target)
        out = []
        for f in sorted(os.listdir(target)):
            if not f.endswith(".parquet"):
                continue
            full = os.path.join(target, f)
            if pq.ParquetFile(full).metadata.num_rows == 0:
                os.remove(full)
                continue
            out.append(os.path.join(sub, f))
        return out

    def _commit(self, files: list[str], schema_ddl: str,
                txn: tuple[str, int] | None, base_version: int,
                data_change: bool = True,
                schema_provisional: bool = False) -> int:
        """Atomically publish ``files`` as version base_version+1.

        ``schema_provisional`` marks the manifest's schema as a
        PLACEHOLDER (a marker-only commit on an uncreated table knows
        only the feed's key columns): the first schema-carrying commit
        against a provisional base ESTABLISHES the real table schema
        instead of failing the exact-schema validation (ADVICE r6)."""
        os.makedirs(self._log_dir, exist_ok=True)
        next_v = base_version + 1
        prior = (
            self._read_manifest(base_version).get("stats")
            if base_version > 0
            else None
        )
        manifest = {
            "version": next_v,
            "files": files,
            "stats": self._collect_file_stats(files, prior),
            "schema": schema_ddl,
            "txn": None if txn is None else {"app": txn[0], "id": txn[1]},
            "dataChange": data_change,
            "partitionBy": self.partition_by,
        }
        if schema_provisional:
            manifest["schemaProvisional"] = True
        payload = json.dumps(manifest, indent=1).encode()
        try:
            fd = os.open(
                self._manifest_path(next_v),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
        except FileExistsError as e:
            raise CommitConflict(
                f"version {next_v} of {self.path} was committed concurrently"
            ) from e
        try:
            os.write(fd, payload)
            os.fsync(fd)
        finally:
            os.close(fd)
        return next_v

    def _retrying(self, build_files, txn: tuple[str, int] | None) -> int:
        """Optimistic-concurrency loop: (re)compute against the current
        snapshot, attempt the commit, retry on conflict."""
        for _ in range(self.MAX_RETRIES):
            if self._txn_already_committed(txn):
                return self.version()  # exactly-once: replay is a no-op
            base = self.version()
            files, schema_ddl = build_files(base)
            try:
                return self._commit(files, schema_ddl, txn, base)
            except CommitConflict:
                continue
        raise CommitConflict(
            f"gave up after {self.MAX_RETRIES} conflicting commits on {self.path}"
        )

    def append(self, df: DataFrame, txn: tuple[str, int] | None = None,
               merge_schema: bool = False) -> int:
        """Add rows; previous files stay live (no rewrite).

        ``merge_schema=True`` permits ADDITIVE schema evolution: columns
        ``df`` carries beyond the table schema are appended to the
        manifest schema, and snapshot reads fill them with NULL for the
        pre-evolution files (see ``read``). Existing columns must keep
        their types; a type change raises instead of silently corrupting
        the table (matching Delta's mergeSchema contract). Without the
        flag, a schema mismatch is an error."""
        new_files = self._write_data_files(df)  # write once, commit w/ retry

        def build(base: int):
            prev_m = self._read_manifest(base) if base else None
            prev = prev_m["files"] if prev_m else []
            ddl = df._jdf.schema().toDDL()
            if prev_m is not None:
                if prev_m.get("schemaProvisional") and not prev_m["files"]:
                    # The base is a marker-only placeholder (delete-only
                    # CDC feed before any data): this append ESTABLISHES
                    # the real schema, same as the merge path — the
                    # placeholder's keys-only columns must not trigger
                    # the evolution guard (round-7 review).
                    return new_files, ddl
                ddl = self._evolve_schema(prev_m["schema"], df, merge_schema)
            return prev + new_files, ddl

        return self._retrying(build, txn)

    def _evolve_schema(self, table_ddl: str, df: DataFrame,
                       merge_schema: bool) -> str:
        """Union the table schema with ``df``'s (additive only)."""
        from pyspark.sql.types import StructType

        table_schema = StructType.fromDDL(table_ddl)
        have = {f.name: f for f in table_schema.fields}
        extra = []
        for f in df.schema.fields:
            if f.name not in have:
                extra.append(f)
            elif have[f.name].dataType != f.dataType:
                raise ValueError(
                    f"column {f.name!r}: incompatible type change "
                    f"{have[f.name].dataType} -> {f.dataType}"
                )
        if extra and not merge_schema:
            raise ValueError(
                f"append adds columns {[f.name for f in extra]}; pass "
                "merge_schema=True to evolve the table schema"
            )
        if not extra:
            return table_ddl
        return StructType(table_schema.fields + extra).toDDL()

    def _snapshot_retrying(self, compute, txn: tuple[str, int] | None,
                           verb: str) -> int:
        """Shared optimistic-concurrency loop for snapshot-recomputing
        writers (merge/delete/compact): per attempt, honor an
        already-committed txn marker, recompute against the current
        snapshot, and commit only if the snapshot is still current.

        ``compute(base) -> (files, schema_ddl, data_change[,
        schema_provisional]) | None``; None means the operation is a
        logical no-op. A no-op WITH a txn marker still commits a
        marker-only manifest (same files, ``dataChange: false``) so
        exactly-once replay detection works — otherwise a crash-replay
        of the no-op batch could re-execute against LATER data that now
        matches. The restate path carries the base manifest's
        ``schemaProvisional`` flag forward, so a chain of marker-only
        commits on an uncreated table stays schema-provisional until a
        real upsert establishes the schema (ADVICE r6)."""
        for _ in range(self.MAX_RETRIES):
            if self._txn_already_committed(txn):
                return self.version()
            base = self.version()
            res = compute(base)
            if res is None:
                if txn is None:
                    return base
                if base == 0:
                    # No manifest exists to restate: a compute() that
                    # needs a marker-only commit on an UNCREATED table
                    # must return ([], schema, False, True) itself (see
                    # merge_apply_changes), because only it knows a
                    # schema to record (ADVICE r5).
                    raise FileNotFoundError(
                        f"no committed version in {self.path}: cannot "
                        "record a marker-only no-op commit without a "
                        "prior manifest"
                    )
                m = self._read_manifest(base)
                res = (
                    m["files"], m["schema"], False,
                    m.get("schemaProvisional", False),
                )
            files, ddl, data_change, *rest = res
            provisional = rest[0] if rest else False
            try:
                if self.version() != base:  # lost the race: re-plan
                    continue
                return self._commit(
                    files, ddl, txn, base, data_change=data_change,
                    schema_provisional=provisional,
                )
            except CommitConflict:
                continue
        raise CommitConflict(
            f"gave up after {self.MAX_RETRIES} conflicting {verb}s on "
            f"{self.path}"
        )

    def delete_where(self, where: list[tuple],
                     txn: tuple[str, int] | None = None) -> int:
        """Row-level DELETE, copy-on-write with file-level pruning: only
        files whose min/max envelope MAY contain matching rows are
        rewritten (with the survivors of the exact predicate); every
        other file is carried into the new version untouched. On a
        range-clustered 100 TB table a selective delete therefore
        rewrites a handful of files, not the table — the same dataflow
        as Delta's DELETE with data skipping.

        SQL DELETE semantics: a row is deleted only when the predicate
        is TRUE — rows where it evaluates to NULL (e.g. a column added
        by schema evolution that is NULL in pre-evolution rows) are
        KEPT, so survivors filter on ``predicate IS NOT TRUE``, not
        ``NOT predicate``."""

        def compute(base: int):
            if base == 0:
                raise FileNotFoundError(f"no committed version in {self.path}")
            m = self._read_manifest(base)
            touched = self.candidate_files(where, version=base)
            if not touched:
                return None
            untouched = [f for f in m["files"] if f not in set(touched)]
            cond = self._condition(where)
            survivors = self.spark.read.schema(m["schema"]).parquet(
                *[os.path.join(self.path, f) for f in touched]
            ).filter(~F.coalesce(cond, F.lit(False)))
            return untouched + self._write_data_files(survivors), m["schema"], True

        return self._snapshot_retrying(compute, txn, "delete")

    def overwrite(self, df: DataFrame, txn: tuple[str, int] | None = None) -> int:
        """Replace the table contents with ``df``."""
        new_files = self._write_data_files(df)

        def build(base: int):
            return new_files, df._jdf.schema().toDDL()

        return self._retrying(build, txn)

    def merge_upsert(self, updates: DataFrame, keys: list[str],
                     txn: tuple[str, int] | None = None) -> int:
        """MERGE: rows matching on ``keys`` are replaced by the incoming
        version, unmatched target rows kept, new rows inserted — the
        Delta/Iceberg ``MERGE WHEN MATCHED UPDATE WHEN NOT MATCHED
        INSERT`` dataflow (anti-join + union) under this log's snapshot
        isolation (the merge recomputes against the current snapshot on
        every commit-conflict retry)."""

        if "_sign" in updates.columns:
            raise ValueError(
                "merge_upsert: updates carry a '_sign' column, which is "
                "the CDC apply's reserved marker — rename it or call "
                "merge_apply_changes directly"
            )
        return self.merge_apply_changes(
            updates.withColumn("_sign", F.lit(1)), keys, txn=txn
        )

    def merge_apply_changes(self, changes: DataFrame, keys: list[str],
                            sign_col: str = "_sign",
                            txn: tuple[str, int] | None = None) -> int:
        """CDC apply: ONE snapshot commit for a SIGNED keyed change set.
        Rows with ``sign_col`` > 0 are the new version of their key
        (upsert); keys whose change rows are all negative are deleted;
        every untouched target row is carried. This is the Delta
        ``MERGE WHEN MATCHED UPDATE/DELETE WHEN NOT MATCHED INSERT``
        dataflow driven by a change feed — the write-side complement of
        :meth:`read_changes` (together: a full CDC round trip), and the
        apply step of incremental view maintenance (the change set is
        the VIEW delta a maintenance plan computed; see
        sink_incremental_join). Positive rows must carry the full
        target schema and at most ONE version per key (validated —
        Delta's MERGE raises on multi-match too); a delete-only feed
        may carry just (keys, sign). Snapshot-isolated like every
        commit here: on conflict the merge recomputes against the new
        base.

        The feed's lineage is PINNED (localCheckpoint) exactly once at
        entry — the duplicate-key validation, the anti-join and the
        written rows all read the same materialized change set, so a
        non-deterministic feed cannot pass validation on one execution
        and write different rows on the next, and conflict retries
        re-plan against the pinned rows instead of re-running the feed
        (ADVICE r5). The pin is released before return. An
        already-committed ``txn`` marker still short-circuits BEFORE
        the pin, so exactly-once replay never executes the feed.

        Partition pruning: when the table has ``partition_by`` P and P
        is one of ``keys``, a matched target row can only live in a
        file whose P-envelope covers one of the feed's P values (every
        data file holds a single P value — see ``_write_data_files``).
        The merge then reads and rewrites ONLY those files; every other
        file is carried into the new version byte-identical. NULL P
        values in the feed match no target row under SQL join equality,
        so they never widen the touched set (their positive rows are
        still inserted). Feeds touching more than MAX_PRUNED_PARTITIONS
        partitions fall back to the full-snapshot merge."""
        if self._txn_already_committed(txn):
            return self.version()
        from ..catalog import release_local_checkpoint

        pinned = changes.localCheckpoint(eager=True)
        try:
            return self._merge_apply_pinned(pinned, keys, sign_col, txn)
        finally:
            release_local_checkpoint(pinned)

    def _merge_apply_pinned(self, changes: DataFrame, keys: list[str],
                            sign_col: str, txn) -> int:
        ups = changes.filter(F.col(sign_col) > 0).drop(sign_col)

        def compute(base: int):
            # Delta's MERGE raises on multiple source rows per key; so
            # does this apply — two positive versions of one key in a
            # change set have no defined winner and would both be
            # written. One delta-sized aggregation yields both the
            # per-key max multiplicity and the positive-row count.
            stats = ups.groupBy(*keys).agg(
                F.count("*").alias("__n")
            ).agg(
                F.coalesce(F.max("__n"), F.lit(0)).alias("mx"),
                F.count("*").alias("nkeys"),
            ).collect()[0]
            if stats["mx"] > 1:
                raise ValueError(
                    "merge_apply_changes: multiple positive-sign rows for "
                    "one key; net the change set to one version per key "
                    "first"
                )
            has_ups = stats["nkeys"] > 0
            if base == 0 and not has_ups:
                if txn is None:
                    return None  # delete-only feed on a non-existent table
                # Marker-only commit on an UNCREATED table: record the
                # txn against an empty snapshot (keys-only schema from
                # the feed) so exactly-once replay bookkeeping exists
                # even for this degenerate batch (ADVICE r5). The
                # schema is PROVISIONAL — it is whatever columns the
                # delete-only feed happened to carry, not the table's
                # real schema; without the flag the first real upsert
                # would fail the exact-schema validation forever,
                # bricking the CDC stream (ADVICE r6 medium).
                ddl = changes.drop(sign_col)._jdf.schema().toDDL()
                return [], ddl, False, True
            touched = changes.select(*keys).distinct()
            if base:
                from pyspark.sql.types import StructType

                m = self._read_manifest(base)
                if has_ups and m.get("schemaProvisional") and not m["files"]:
                    # The base is a marker-only placeholder chain on an
                    # uncreated table (delete-only feed before any
                    # data): this first upsert ESTABLISHES the real
                    # table schema. No data files exist, so the merge
                    # is a pure insert; the provisional flag is cleared
                    # by committing a real manifest (ADVICE r6 medium).
                    files = self._write_data_files(ups)
                    return files, ups._jdf.schema().toDDL(), True
                # Positive rows must carry EXACTLY the table schema —
                # name set AND types. Validated before any write: the
                # manifest pins m["schema"] for carried files, so a
                # type-divergent feed (e.g. 'v long' into a 'v int'
                # table) would otherwise COMMIT data files whose
                # physical type contradicts the declared schema and
                # poison every subsequent read (round-6 review,
                # reproduced). An implicit cast is no fix — a silent
                # long->int narrowing corrupts values; the caller must
                # cast intentionally.
                table_fields = {
                    f.name: f.dataType
                    for f in StructType.fromDDL(m["schema"]).fields
                }
                if has_ups:
                    ups_fields = {f.name: f.dataType for f in ups.schema.fields}
                    if ups_fields != table_fields:
                        only_ups = sorted(set(ups_fields) - set(table_fields))
                        only_tab = sorted(set(table_fields) - set(ups_fields))
                        diff = sorted(
                            n
                            for n in set(ups_fields) & set(table_fields)
                            if ups_fields[n] != table_fields[n]
                        )
                        raise ValueError(
                            "merge_apply_changes: positive rows must carry "
                            "exactly the table schema; feed-only columns "
                            f"{only_ups}, missing columns {only_tab}, "
                            f"type-mismatched columns {diff} (cast the feed "
                            "to the table's types explicitly)"
                        )
                else:
                    # Delete-only feeds bypass the exact-schema check
                    # above, but their KEY columns still drive the
                    # anti-join: a type-divergent key would throw a raw
                    # ANSI CAST_INVALID_INPUT mid-job (or silently
                    # cross-type-match via coercion). Fail fast for ANY
                    # key, not just the partition key (round-7 review —
                    # the first guard lived in _split_touched_files and
                    # missed unpartitioned tables / non-partition keys).
                    feed_fields = {
                        f.name: f.dataType for f in touched.schema.fields
                    }
                    bad = sorted(
                        k
                        for k in keys
                        if table_fields.get(k) != feed_fields.get(k)
                    )
                    if bad:
                        detail = ", ".join(
                            f"{k}: feed "
                            f"{feed_fields[k].simpleString() if k in feed_fields else 'absent'}"
                            " vs table "
                            f"{table_fields[k].simpleString() if k in table_fields else 'absent'}"
                            for k in bad
                        )
                        raise ValueError(
                            "merge_apply_changes: delete-only feed key "
                            f"type mismatch ({detail}); cast the feed "
                            "keys to the table's types explicitly"
                        )
                live, carried = self._split_touched_files(m, keys, touched)
                if not live:
                    if not has_ups:
                        return None  # feed touches no existing partition
                    target = None
                else:
                    target = self.spark.read.schema(m["schema"]).parquet(
                        *[os.path.join(self.path, f) for f in live]
                    )
                if target is not None:
                    keep = target.join(touched, keys, "left_anti")
                    # A delete-only feed may carry just (keys, sign):
                    # only union the positive side when it exists, so
                    # retraction feeds need not fabricate full target
                    # rows.
                    merged = keep.unionByName(ups) if has_ups else keep
                else:
                    merged = ups
                # Normalize to the TABLE's column order: the USING
                # anti-join moves the key columns first, and carried
                # files must stay readable under the one manifest
                # schema, so both written and carried files declare
                # m["schema"] verbatim (types validated above).
                tcols = [
                    f.name for f in StructType.fromDDL(m["schema"]).fields
                ]
                merged = merged.select(*tcols)
                files = carried + self._write_data_files(merged)
                return files, m["schema"], True
            merged = ups
            files = self._write_data_files(merged)
            return files, merged._jdf.schema().toDDL(), True

        return self._snapshot_retrying(compute, txn, "merge")

    def _split_touched_files(
        self, manifest: dict, keys: list[str], touched: DataFrame
    ) -> tuple[list[str], list[str]]:
        """(live, carried) file split for a keyed merge: ``live`` files
        may hold rows matching the feed's keys and must be read +
        rewritten; ``carried`` files provably cannot and move into the
        new version untouched. Without a partition key among ``keys``
        every file is live (the pre-partitioning behavior)."""
        files = manifest["files"]
        p = self.partition_by
        if p is None or p not in keys:
            return files, []
        # Key TYPE safety: by the time this split runs, every caller
        # path has validated the feed's key types against the table
        # schema (has_ups feeds via the exact-schema check, delete-only
        # feeds via the any-key guard in merge_apply_changes — round-7
        # review replaced the narrower partition-key-only guard that
        # lived here), so the stat-domain comparisons below never see
        # cross-type values.
        vals = [
            r[0]
            for r in touched.select(p)
            .filter(F.col(p).isNotNull())
            .distinct()
            .limit(self.MAX_PRUNED_PARTITIONS + 1)
            .collect()
        ]
        if len(vals) > self.MAX_PRUNED_PARTITIONS:
            return files, []  # too wide: full merge beats bookkeeping
        norm = [_stat_literal(x) for x in vals]
        if any(v is None for v in norm):
            # A feed value the stat domain can't represent (binary,
            # decimal, ...) could match ANY file — disable pruning
            # rather than risk missing a matched row.
            return files, []
        vals = norm
        stats = manifest.get("stats", {})
        live, carried = [], []
        for f in files:
            env = stats.get(f, {})
            if any(
                self._envelope_may_match(env, p, "=", v) for v in vals
            ):
                live.append(f)
            else:
                carried.append(f)
        return live, carried

    # ------------------------------------------------------------ restore
    def restore(self, version: int,
                txn: tuple[str, int] | None = None) -> int:
        """RESTORE TABLE TO VERSION AS OF — commit snapshot ``version``'s
        exact file list (and schema) as the NEW latest version, undoing
        every later commit without rewriting a byte: data files are
        immutable and still on disk (``vacuum`` only removes
        UNREFERENCED files, and a restored manifest re-references them),
        so restore is a metadata-only O(1) commit — Delta's RESTORE
        semantics. History is preserved: the undone versions remain
        time-travelable, and ``read_changes`` across the restore commit
        shows the net removed/inserted file diff like any other commit.
        No-op (current snapshot already == target) commits nothing
        unless a txn marker needs recording."""

        def compute(base: int):
            if base == 0:
                raise FileNotFoundError(f"no committed version in {self.path}")
            lo = self._oldest_version()
            if not lo <= version <= base:
                raise ValueError(
                    f"restore target {version} outside the retained "
                    f"range {lo}..{base} of {self.path}"
                    + (
                        " (older versions were expired by"
                        " expire_snapshots)" if lo > 1 else ""
                    )
                )
            target = self._read_manifest(version)
            if target["files"] == self._read_manifest(base)["files"]:
                return None  # already at the target snapshot
            # A restore TO a provisional placeholder re-opens schema
            # establishment (the flag travels with the snapshot).
            return (target["files"], target["schema"], True,
                    target.get("schemaProvisional", False))

        return self._snapshot_retrying(compute, txn, "restore")

    def _part_col_all_null(self, rel: str) -> bool:
        """Footer-only check: does ``rel`` hold ONLY NULLs in the
        partition column? True also when the column is absent from the
        file's schema (pre-evolution file — reads back as NULL). Used by
        compact() to split the files whose footer yields NO usable
        min/max envelope (round-8 ADVICE): all-NULL partitions have a
        one-merged-file floor, while OPAQUE files (non-NULL values of a
        stats-incapable type) must be left in place. Missing statistics
        count as NOT-all-NULL — the conservative side: the file is then
        merely never rewritten, same as before the probe existed."""
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(os.path.join(self.path, rel))
        try:
            meta = pf.metadata
            for rg in range(meta.num_row_groups):
                row_group = meta.row_group(rg)
                for ci in range(row_group.num_columns):
                    col = row_group.column(ci)
                    if col.path_in_schema != self.partition_by:
                        continue
                    st = col.statistics
                    if (
                        st is None
                        or st.null_count is None
                        or st.null_count != col.num_values
                    ):
                        return False
            return True  # all chunks all-NULL, or column absent entirely
        finally:
            pf.close()

    # ------------------------------------------------------------ compact
    def compact(self, target_file_bytes: int = 128 << 20) -> int:
        """OPTIMIZE: bin-pack the current snapshot's files into
        ~``target_file_bytes`` outputs and commit the rewrite with
        ``dataChange: false`` — readers see the identical row multiset,
        ``read_changes`` skips the commit entirely, and time travel to
        pre-compaction versions still works (old files stay referenced
        by old manifests until the log itself is truncated).

        This is the small-file fix for high-frequency streaming appends:
        at 100 TB a table ingesting N micro-batches/hour accretes
        thousands of KB-sized files whose per-file open/footer cost
        dominates scans; periodic bin-packing restores
        ~target-size scan units. A production table would compact per
        partition; the commit protocol here is unchanged.
        """
        def compute(base: int):
            if base == 0:
                raise FileNotFoundError(f"no committed version in {self.path}")
            manifest = self._read_manifest(base)
            old_files = manifest["files"]
            if self.partition_by is not None:
                # Partitioned tables bin-pack PER PARTITION VALUE (the
                # write path re-clusters, so the reachable minimum is
                # one file per value — target_file_bytes cannot
                # subdivide a value without breaking the exact [v, v]
                # envelopes pruning relies on) and rewrite ONLY the
                # disordered files (ADVICE r6):
                #   * partitions holding >1 exact-envelope file — the
                #     steady-state case after streaming appends;
                #   * wide-envelope files (pre-partitioning legacy,
                #     multiple values mixed) — rewritten together with
                #     every single-exact-file partition inside their
                #     span and every no-envelope file, so ONE call
                #     reaches the floor even on mixed tables (a wide
                #     file's values would otherwise land next to their
                #     carried exact twins and re-create multi-file
                #     partitions — round-7 review);
                #   * files whose MANIFEST carries no envelope (written
                #     before stats recording existed) get the envelope
                #     recovered straight from the parquet FOOTER with
                #     the same extraction the write path uses
                #     (_collect_file_stats) — round-8 ADVICE+review: the
                #     r7 code assumed manifest-no-envelope == all-NULL,
                #     so a legacy file holding real values kept its
                #     partitions multi-file forever. With the recovered
                #     envelope such files classify as exact/wide and
                #     the normal rules converge to the floor in one
                #     call. Files with NO usable footer stats split by
                #     a null-count probe into:
                #       - all-NULL partitions: >=2 merge into one, a
                #         single one is already at its floor;
                #       - OPAQUE (non-NULL values of a stats-incapable
                #         type): left in place — rewriting would
                #         reproduce stat-less files and churn forever.
                # Every other file is carried byte-identical.
                p = self.partition_by
                stats = manifest.get("stats", {})
                by_val: dict = {}
                wide, spans, nullish, opaque = [], [], [], []
                for f in old_files:
                    env = stats.get(f, {}).get(p)
                    if env is None:
                        env = self._collect_file_stats([f]).get(
                            f, {}
                        ).get(p)
                    if env is None:
                        (nullish if self._part_col_all_null(f)
                         else opaque).append(f)
                    elif env[0] == env[1]:
                        by_val.setdefault(env[0], []).append(f)
                    else:
                        wide.append(f)
                        spans.append(env)
                rewrite = list(wide)
                if nullish and (wide or len(nullish) >= 2):
                    rewrite += nullish  # wide files may hold NULLs too
                for v, fs in by_val.items():
                    if len(fs) > 1 or any(
                        lo <= v <= hi for (lo, hi) in spans
                    ):
                        rewrite += fs
                if not rewrite:
                    return None  # one file per value: at the floor
                rw = set(rewrite)  # hoisted: per-element set() is O(n^2)
                carried = [f for f in old_files if f not in rw]
                sub = self.spark.read.schema(manifest["schema"]).parquet(
                    *[os.path.join(self.path, f) for f in rewrite]
                )
                files = carried + self._write_data_files(sub)
                return files, manifest["schema"], False
            # unpartitioned: size-driven bin-packing (the getsize walk
            # is only paid on this branch — round-7 review)
            total = sum(
                os.path.getsize(os.path.join(self.path, f)) for f in old_files
            )
            n_out = max(1, -(-total // target_file_bytes))
            if len(old_files) <= n_out:
                return None  # already compact enough: no-op
            snapshot = self.read(base)
            files = self._write_data_files(snapshot.coalesce(int(n_out)))
            return files, manifest["schema"], False

        return self._snapshot_retrying(compute, None, "compaction")

    # ------------------------------------------------------ log retention
    def expire_snapshots(self, keep_last: int) -> int:
        """Retire history: delete all but the newest ``keep_last``
        manifests (Iceberg's expire_snapshots / the retention half of
        Delta's VACUUM). Time travel to expired versions stops working
        — that is the point: data files referenced ONLY by expired
        manifests become unreferenced, so a following :meth:`vacuum`
        reclaims their space (without expiry, a long-lived table's
        every rewritten byte stays on disk forever). The CURRENT
        snapshot and exactly-once txn markers within the kept window
        are untouched; returns the number of manifests removed.

        Expired manifests are removed OLDEST-FIRST so a crash mid-expiry
        leaves a contiguous (possibly longer-than-asked) history suffix
        — never a gap that would break version arithmetic.

        Caveat (same as Delta's VACUUM retention): txn markers recorded
        ONLY in expired manifests are forgotten — a stream replaying a
        batch from before the retention window would re-apply it. Size
        ``keep_last`` beyond the longest plausible replay horizon
        (checkpoint recovery replays only the last uncommitted batch,
        so any real window is safe); locked by
        test_expire_snapshots_forgets_ancient_txn_markers."""
        if keep_last < 1:
            raise ValueError("expire_snapshots: keep_last must be >= 1")
        vs = self._versions()
        drop = vs[:-keep_last]
        for v in drop:  # oldest first: crash-safe prefix removal
            os.remove(self._manifest_path(v))
        return len(drop)

    # ------------------------------------------------------------- vacuum
    def vacuum(self) -> int:
        """Delete data files unreferenced by ANY committed version
        (pre-commit crash leftovers). Returns the number removed."""
        live: set[str] = set()
        for m in self.history():
            live.update(m["files"])
        removed = 0
        if not os.path.isdir(self._data_dir):
            return 0
        for sub in os.listdir(self._data_dir):
            subdir = os.path.join(self._data_dir, sub)
            for f in os.listdir(subdir):
                rel = os.path.join("data", sub, f)
                if f.endswith(".parquet") and rel not in live:
                    os.remove(os.path.join(self.path, rel))
                    removed += 1
            if not any(x.endswith(".parquet") for x in os.listdir(subdir)):
                import shutil

                shutil.rmtree(subdir, ignore_errors=True)
        return removed


def apply_changes(base: DataFrame, changes: DataFrame) -> DataFrame:
    """Apply a ``read_changes`` feed to a materialized base snapshot,
    producing the source's final multiset — the downstream-replica
    (CDC sync) primitive: a consumer holding version N applies the
    feed instead of re-copying the table.

    Multiset algebra, order-free: base rows weigh +1, feed rows weigh
    +1/-1 by ``_change_type``, one hash aggregation nets the weights
    per distinct row and ``sequence``-explode restores multiplicity.
    Commit ordering inside the feed is irrelevant because file-diff
    feeds are net-consistent per version chain (a row removed and
    re-inserted nets to its final count). One shuffle on the full row
    key; at 100 TB the replica applies day-partition feeds the same
    way, partition by partition.
    """
    cols = [c for c in base.columns]
    weighted = base.select(*cols, F.lit(1).alias("_w")).unionByName(
        changes.select(
            *cols,
            F.when(F.col("_change_type") == "inserted", 1)
            .otherwise(-1)
            .alias("_w"),
        )
    )
    net = weighted.groupBy(*cols).agg(F.sum("_w").alias("_n")).filter(
        F.col("_n") > 0
    )
    return net.select(
        *cols, F.explode(F.sequence(F.lit(1), F.col("_n"))).alias("_i")
    ).drop("_i")
