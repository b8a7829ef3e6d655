"""Transactional parquet table (pipeline/txlog.py): snapshot isolation,
atomic commits, exactly-once txn markers, MERGE, vacuum, and the
transactional streaming sink mode."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from plc_data_etl_pipeline_spark.pipeline import sink as K
from plc_data_etl_pipeline_spark.pipeline.txlog import (
    CommitConflict,
    TransactionalParquetTable,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def test_append_overwrite_snapshots_and_history(spark, tmp_path):
    t = TransactionalParquetTable(spark, str(tmp_path / "t"))
    assert t.version() == 0
    with pytest.raises(FileNotFoundError):
        t.read()

    assert t.append(_df(spark, [(1, "a"), (2, "b")])) == 1
    assert t.append(_df(spark, [(3, "c")])) == 2
    assert sorted(map(tuple, t.read().collect())) == [(1, "a"), (2, "b"), (3, "c")]
    # time travel: version 1 snapshot unchanged by later appends
    assert sorted(map(tuple, t.read(version=1).collect())) == [(1, "a"), (2, "b")]

    assert t.overwrite(_df(spark, [(9, "z")])) == 3
    assert [tuple(r) for r in t.read().collect()] == [(9, "z")]
    assert [m["version"] for m in t.history()] == [1, 2, 3]


def test_merge_upsert_semantics(spark, tmp_path):
    t = TransactionalParquetTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    t.merge_upsert(_df(spark, [(2, "B2"), (4, "d")]), keys=["k"])
    assert sorted(map(tuple, t.read().collect())) == [
        (1, "a"),
        (2, "B2"),
        (3, "c"),
        (4, "d"),
    ]


def test_txn_marker_makes_replay_a_noop(spark, tmp_path):
    """Exactly-once: committing the same (app, id) twice applies once."""
    t = TransactionalParquetTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]), txn=("app", 7))
    v = t.append(_df(spark, [(1, "a")]), txn=("app", 7))  # replay
    assert v == 1
    assert t.read().count() == 1
    t.merge_upsert(_df(spark, [(1, "A")]), keys=["k"], txn=("app", 8))
    t.merge_upsert(_df(spark, [(1, "WRONG")]), keys=["k"], txn=("app", 8))
    assert [tuple(r) for r in t.read().collect()] == [(1, "A")]


def test_commit_conflict_detected_and_retried(spark, tmp_path):
    """A manifest created by 'someone else' for the next version forces
    the optimistic committer to re-read and commit the version after."""
    t = TransactionalParquetTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))
    # simulate a concurrent winner for version 2
    conflict = t._manifest_path(2)
    os.makedirs(os.path.dirname(conflict), exist_ok=True)
    with open(conflict, "w") as f:
        f.write('{"version": 2, "files": [], "schema": "k INT, v STRING", "txn": null}')
    v = t.append(_df(spark, [(2, "b")]))
    assert v == 3  # retried past the conflicting version
    assert sorted(map(tuple, t.read().collect())) == [(2, "b")]  # v2 emptied, v3 = v2files+new


def test_precommit_crash_leaves_clean_table_and_vacuum(spark, tmp_path):
    t = TransactionalParquetTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))
    # simulate a writer that crashed after writing files, before commit
    orphaned = t._write_data_files(_df(spark, [(99, "crash")]))
    assert t.read().count() == 1  # reader never sees uncommitted files
    removed = t.vacuum()
    assert removed == len(orphaned) and removed > 0
    assert t.read().count() == 1


def test_transactional_streaming_sink_exactly_once(spark, tmp_path):
    """mode='transactional': replaying a batch (same batch_id) commits
    nothing the second time — exactly-once through the sink."""
    src = str(tmp_path / "src")
    events = spark.range(0, 50).select(
        F.col("id").cast("int").alias("k"), F.lit("x").alias("v")
    )
    events.coalesce(2).write.mode("overwrite").parquet(src)

    out = str(tmp_path / "out")
    stream = spark.readStream.schema("k int, v string").option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = K.start_micro_batch_sink(
        stream, out, checkpoint=str(tmp_path / "ckpt"),
        mode="transactional", trigger_seconds=0.5,
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    t = TransactionalParquetTable(spark, out)
    assert t.read().count() == 50

    # crash-replay simulation: re-deliver batch 0's data under batch_id 0
    batch0 = spark.read.parquet(src).limit(25)
    TransactionalParquetTable(spark, out).append(
        batch0, txn=("micro_batch_sink", 0)
    )
    assert t.read().count() == 50  # no duplicates


def test_change_feed_appends_and_merge(spark, tmp_path):
    """read_changes: append commits yield exact inserts; a merge commit
    (full-file rewrite) yields removed-snapshot + inserted-snapshot whose
    multiset difference is exactly the net update."""
    t = TransactionalParquetTable(spark, str(tmp_path / "cdf"))
    t.overwrite(_df(spark, [(1, "a"), (2, "b")]))          # v1
    t.append(_df(spark, [(3, "c")]))                        # v2
    t.merge_upsert(_df(spark, [(2, "B2")]), keys=["k"])     # v3

    c12 = t.read_changes(1, 2).collect()
    assert [(r["k"], r["v"], r["_change_type"], r["_commit_version"])
            for r in c12] == [(3, "c", "inserted", 2)]

    c23 = t.read_changes(2, 3).collect()
    ins = sorted((r["k"], r["v"]) for r in c23
                 if r["_change_type"] == "inserted")
    rem = sorted((r["k"], r["v"]) for r in c23
                 if r["_change_type"] == "removed")
    from collections import Counter
    net_added = Counter(ins) - Counter(rem)
    net_removed = Counter(rem) - Counter(ins)
    assert dict(net_added) == {(2, "B2"): 1}
    assert dict(net_removed) == {(2, "b"): 1}

    # full-range feed covers both commits; replaying it over v1 yields v3
    all_changes = t.read_changes(1).collect()
    assert {r["_commit_version"] for r in all_changes} == {2, 3}
    base = Counter((r["k"], r["v"]) for r in t.read(1).collect())
    for r in all_changes:
        if r["_change_type"] == "inserted":
            base[(r["k"], r["v"])] += 1
        else:
            base[(r["k"], r["v"])] -= 1
    final = Counter((r["k"], r["v"]) for r in t.read(3).collect())
    assert +base == final


def test_compact_binpacks_without_changing_rows(spark, tmp_path):
    """OPTIMIZE: repeated small appends -> many files; compact() rewrites
    them into one, rows identical, dataChange=false, change feed skips
    the compaction, time travel to pre-compaction versions intact."""
    t = TransactionalParquetTable(spark, str(tmp_path / "t"))
    for i in range(4):  # 4 appends x 2 partitions = 8 small files
        t.append(_df(spark, [(2 * i, f"v{2 * i}"), (2 * i + 1, f"v{2 * i + 1}")]).repartition(2))
    before = sorted(map(tuple, t.read().collect()))
    n_files_before = len(t.history()[-1]["files"])
    assert n_files_before >= 8

    v = t.compact()
    assert v == 5
    assert t.history()[-1]["dataChange"] is False
    assert len(t.history()[-1]["files"]) == 1  # tiny table -> one file
    assert sorted(map(tuple, t.read().collect())) == before
    # time travel unaffected: version 2 still reads the old files
    assert t.read(version=2).count() == 4

    # change feed: the compaction contributes NOTHING; appends still do
    ch = t.read_changes(0)
    assert ch.filter(F.col("_commit_version") == 5).count() == 0
    assert ch.filter(F.col("_change_type") == "removed").count() == 0
    assert ch.filter(F.col("_change_type") == "inserted").count() == 8

    # a post-compaction append diffs against the compacted manifest:
    # exactly its own rows, never the repacked ones
    t.append(_df(spark, [(100, "x")]))
    ch2 = t.read_changes(5)
    assert [tuple(r)[:2] for r in ch2.collect()] == [(100, "x")]

    # the 2-file table (compacted + append) packs again, then the
    # single-file result makes further compaction a no-op
    assert t.compact() == 7
    assert t.compact() == 7 and t.version() == 7


def test_compact_is_a_noop_below_threshold(spark, tmp_path):
    t = TransactionalParquetTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]).coalesce(1))
    assert t.compact() == 1
    assert len(t.history()) == 1


def test_data_skipping_prunes_files_by_stats(spark, tmp_path):
    """Range-clustered appends leave tight per-file envelopes; a point /
    range predicate reads only the files that can match, and the
    pruned read returns exactly what a full-scan filter would."""
    t = TransactionalParquetTable(spark, str(tmp_path / "t"))
    # three commits with disjoint k ranges -> disjoint file envelopes
    for lo in (0, 100, 200):
        t.append(
            spark.createDataFrame(
                [(lo + i, f"v{lo + i}") for i in range(50)], "k int, v string"
            ).coalesce(1)
        )
    all_files = t._read_manifest(t.version())["files"]
    assert len(all_files) == 3

    # point lookup: exactly one file survives pruning
    cand = t.candidate_files([("k", "=", 120)])
    assert len(cand) == 1
    got = sorted(map(tuple, t.read_where([("k", "=", 120)]).collect()))
    assert got == [(120, "v120")]

    # range predicate spanning two commits: two files survive
    cand = t.candidate_files([("k", "between", (40, 110))])
    assert len(cand) == 2
    got = sorted(map(tuple, t.read_where([("k", "between", (40, 110))]).collect()))
    want = sorted(
        map(tuple, t.read().filter(F.col("k").between(40, 110)).collect())
    )
    assert got == want

    # impossible predicate: zero files, empty result, schema preserved
    assert t.candidate_files([("k", ">", 10_000)]) == []
    empty = t.read_where([("k", ">", 10_000)])
    assert empty.count() == 0
    assert set(empty.columns) == {"k", "v"}


def test_data_skipping_string_stats_and_carry_forward(spark, tmp_path):
    """String envelopes prune too, and a commit re-reads footers only
    for its own new files (parent stats carried forward by identity)."""
    t = TransactionalParquetTable(spark, str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(1, "apple"), (2, "banana")], "k int, v string"
        ).coalesce(1)
    )
    m1 = t._read_manifest(1)
    t.append(
        spark.createDataFrame([(3, "zebra")], "k int, v string").coalesce(1)
    )
    m2 = t._read_manifest(2)
    # parent file's stats are byte-identical carried-forward objects
    for f in m1["files"]:
        assert m2["stats"][f] == m1["stats"][f]
    # string envelope pruning: only the zebra file can hold v >= 'x'
    cand = t.candidate_files([("v", ">=", "x")])
    assert len(cand) == 1
    assert [tuple(r) for r in t.read_where([("v", ">=", "x")]).collect()] == [
        (3, "zebra")
    ]


def test_delete_where_prunes_untouched_files(spark, tmp_path):
    """Copy-on-write DELETE must rewrite ONLY envelope-candidate files:
    files that cannot contain matching rows are carried into the new
    version byte-identically (same relative path)."""
    t = TransactionalParquetTable(spark, str(tmp_path / "t"))
    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    t.overwrite(df.repartitionByRange(4, "k"))
    before = t._read_manifest(t.version())["files"]
    cand = t.candidate_files([("k", ">=", 900)])
    assert 0 < len(cand) < len(before), "range clustering should localize"
    v = t.delete_where([("k", ">=", 900)])
    after = t._read_manifest(v)["files"]
    # every non-candidate file survives verbatim
    for f in before:
        if f not in cand:
            assert f in after
    # no candidate file survives (all rewritten)
    assert not set(cand) & set(after)
    rows = t.read().count()
    assert rows == 900
    assert t.read().agg(F.max("k")).collect()[0][0] == 899


def test_delete_where_noop_commits_nothing(spark, tmp_path):
    t = TransactionalParquetTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(10).select(F.col("id").alias("k")))
    v1 = t.version()
    assert t.delete_where([("k", ">", 1000)]) == v1
    assert t.version() == v1  # no empty commit


def test_schema_evolution_null_fill_and_guards(spark, tmp_path):
    t = TransactionalParquetTable(spark, str(tmp_path / "t"))
    t.overwrite(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    )
    extra = spark.createDataFrame([(3, "c", 9.5)], "k int, v string, w double")
    # without the flag: adding a column is an error, table unchanged
    with pytest.raises(ValueError, match="merge_schema"):
        t.append(extra)
    # type change is never allowed
    with pytest.raises(ValueError, match="incompatible type"):
        t.append(
            spark.createDataFrame([(4, 5)], "k int, v int"),
            merge_schema=True,
        )
    v = t.append(extra, merge_schema=True)
    got = {tuple(r) for r in t.read(v).collect()}
    assert got == {(1, "a", None), (2, "b", None), (3, "c", 9.5)}
    # time travel to the pre-evolution version keeps the OLD schema
    assert t.read(v - 1).columns == ["k", "v"]
    # change feed reconciles across the evolution boundary
    cdf = t.read_changes(v - 1, v)
    assert {tuple(r) for r in cdf.collect()} == {(3, "c", 9.5, "inserted", v)}


def test_delete_where_keeps_null_predicate_rows(spark, tmp_path):
    """SQL DELETE semantics: rows where the predicate evaluates to NULL
    are KEPT. The schema-evolution interaction is the sharp edge:
    pre-evolution rows have NULL in the new column AND their files have
    no stats for it, so every old file is a rewrite candidate — the
    rewrite must not drop those rows."""
    t = TransactionalParquetTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"))
    t.append(
        spark.createDataFrame([(3, "c", 5.0), (4, "d", 9.0)],
                              "k int, v string, w double"),
        merge_schema=True,
    )
    t.delete_where([("w", "=", 5.0)])
    got = {tuple(r) for r in t.read().collect()}
    assert got == {(1, "a", None), (2, "b", None), (4, "d", 9.0)}


def test_delete_where_noop_with_txn_records_marker(spark, tmp_path):
    """Exactly-once: a no-op delete carrying a txn marker must still
    commit a marker-only manifest, so a crash-replay of that batch is
    recognized and does NOT re-execute against later-arriving data."""
    t = TransactionalParquetTable(spark, str(tmp_path / "t"))
    t.overwrite(spark.range(10).select(F.col("id").alias("k")))
    v = t.delete_where([("k", ">", 1000)], txn=("app", 7))
    m = t._read_manifest(v)
    assert m["txn"] == {"app": "app", "id": 7}
    assert m["dataChange"] is False
    assert t.read().count() == 10
    # later data that WOULD match the predicate arrives...
    t.append(spark.createDataFrame([(2000,)], "k long"))
    # ...then the crashed batch replays: must be a no-op, row survives
    assert t.delete_where([("k", ">", 1000)], txn=("app", 7)) == t.version()
    assert t.read().count() == 11


def test_truly_concurrent_writers_no_lost_updates(spark, tmp_path):
    """Six REAL threads race appends at the same table (the earlier
    conflict test simulates the loser; this one exercises the actual
    O_CREAT|O_EXCL claim + optimistic retry under genuine contention).
    Every writer's rows must land exactly once and the version history
    must be strictly sequential — no lost updates, no double commits."""
    import threading

    t = TransactionalParquetTable(spark, str(tmp_path / "race"))
    t.append(_df(spark, [(0, "seed")]))
    n_writers, rows_each = 6, 3
    errors: list[Exception] = []

    def writer(w: int) -> None:
        try:
            rows = [(w * 100 + i, f"w{w}r{i}") for i in range(rows_each)]
            t2 = TransactionalParquetTable(spark, str(tmp_path / "race"))
            t2.append(_df(spark, rows), txn=(f"writer{w}", 1))
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(n_writers)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=120)
    assert not errors, errors

    got = sorted(r["k"] for r in t.read().collect())
    want = sorted([0] + [w * 100 + i for w in range(n_writers) for i in range(rows_each)])
    assert got == want, "lost or duplicated rows under contention"
    hist = t.history()
    versions = sorted(m["version"] for m in hist)
    assert versions == list(range(1, n_writers + 2))  # seed + one per writer
    markers = {(m["txn"]["app"], m["txn"]["id"]) for m in hist if m.get("txn")}
    assert len(markers) == n_writers  # every writer committed exactly once


def test_merge_apply_changes_cdc_semantics(spark, tmp_path):
    """The signed CDC apply: +1 rows upsert their key, keys with only
    -1 rows delete, untouched rows carry; a key receiving BOTH (-1 old,
    +1 new — the standard update encoding) lands on the new version."""
    t = TransactionalParquetTable(spark, str(tmp_path / "cdc"))
    t.overwrite(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    changes = spark.createDataFrame(
        [
            (2, "b", -1),            # pure delete
            (3, "c", -1), (3, "C", 1),  # update encoded as -old +new
            (4, "d", 1),             # insert
        ],
        "k int, v string, _sign int",
    )
    t.merge_apply_changes(changes, keys=["k"])
    got = sorted((r.k, r.v) for r in t.read().collect())
    assert got == [(1, "a"), (3, "C"), (4, "d")]


def test_incremental_join_view_equals_recompute(spark):
    """The maintained JOIN view itself (not just the registered
    query's aggregate) must equal the full recompute over the mutated
    base tables, and each maintenance commit's change feed must be
    delta-sized — the two invariants incremental view maintenance has
    to keep."""
    import os as _os
    import tempfile

    from plc_data_etl_pipeline_spark.catalog import load
    from plc_data_etl_pipeline_spark.queries._conv import cents
    from plc_data_etl_pipeline_spark.registry import all_queries

    from .conftest import SF_DIR

    # run the registered query (it builds + maintains the view)
    all_queries()["sink_incremental_join"].fn(spark, SF_DIR).collect()
    from plc_data_etl_pipeline_spark.catalog import session_tmp_path

    t = TransactionalParquetTable(
        spark, session_tmp_path(spark, "incr_join")
    )

    orders = load(spark, SF_DIR, "orders").filter(
        F.col("o_orderkey") % 97 != 0
    )
    cust = load(spark, SF_DIR, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.when(F.col("c_custkey") % 101 == 0, "MOVED")
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
    )
    recomputed = orders.join(
        cust, F.col("o_custkey") == F.col("c_custkey")
    ).select(
        "o_orderkey",
        "o_custkey",
        cents("o_totalprice").alias("price_cents"),
        "c_nationkey",
        "seg",
    )
    view = t.read().select(*recomputed.columns)
    assert view.exceptAll(recomputed).count() == 0
    assert recomputed.exceptAll(view).count() == 0

    # Change feed for the dim-move commit (v3 -> v4). This log's CDF
    # is a FILE diff, and merges rewrite the snapshot, so consumers
    # net the two sides: the NET insert side must be exactly the moved
    # customers' rows re-tagged MOVED, the NET removed side the same
    # keys under their old segment.
    feed = t.read_changes(3, 4).select("o_orderkey", "o_custkey", "seg",
                                       "_change_type")
    ins4 = feed.filter("_change_type = 'inserted'").drop("_change_type")
    rem4 = feed.filter("_change_type = 'removed'").drop("_change_type")
    net_in, net_out = ins4.exceptAll(rem4), rem4.exceptAll(ins4)
    expected_moved = view.filter(F.col("o_custkey") % 101 == 0).count()
    assert expected_moved > 0, "fixture must exercise the dim move"
    assert net_in.count() == expected_moved
    assert net_out.count() == expected_moved
    assert {r.seg for r in net_in.select("seg").distinct().collect()} == {
        "MOVED"
    }
    assert "MOVED" not in {
        r.seg for r in net_out.select("seg").distinct().collect()
    }


def test_merge_apply_changes_contract(spark, tmp_path):
    """Review-finding regressions: (1) two positive versions of one key
    in a single change set must raise (Delta MERGE multi-match rule) —
    not silently write duplicate key rows; (2) a delete-only feed may
    carry just (keys, sign) without fabricating full target rows."""
    t = TransactionalParquetTable(spark, str(tmp_path / "cdc2"))
    t.overwrite(_df(spark, [(1, "a"), (2, "b")]))
    dup = spark.createDataFrame(
        [(3, "x", 1), (3, "y", 1)], "k int, v string, _sign int"
    )
    with pytest.raises(ValueError, match="multiple positive-sign rows"):
        t.merge_apply_changes(dup, keys=["k"])
    assert t.version() == 1, "failed apply must not commit"

    t.merge_apply_changes(
        spark.createDataFrame([(1, -1)], "k int, _sign int"), keys=["k"]
    )
    assert [(r.k, r.v) for r in t.read().collect()] == [(2, "b")]


def test_merge_apply_changes_edge_contracts(spark, tmp_path):
    """Follow-on review findings: a delete-only feed against a table
    with NO committed version is a logical no-op (must not commit a
    keys-only schema); merge_upsert rejects updates that carry the
    reserved '_sign' column instead of silently clobbering it."""
    t = TransactionalParquetTable(spark, str(tmp_path / "cdc3"))
    t.merge_apply_changes(
        spark.createDataFrame([(1, -1)], "k int, _sign int"), keys=["k"]
    )
    assert t.version() == 0
    with pytest.raises(FileNotFoundError):
        t.read()

    t.overwrite(_df(spark, [(1, "a")]))
    signed = spark.createDataFrame([(2, 1)], "k int, _sign int")
    with pytest.raises(ValueError, match="reserved"):
        t.merge_upsert(signed, keys=["k"])


def test_merge_apply_changes_txn_replay_skips_validation(spark, tmp_path):
    """Exactly-once contract: replaying a committed txn marker must
    no-op WITHOUT re-executing the change feed's lineage — even if the
    re-derived feed would now fail validation."""
    t = TransactionalParquetTable(spark, str(tmp_path / "cdc4"))
    t.overwrite(_df(spark, [(1, "a")]))
    good = spark.createDataFrame([(2, "b", 1)], "k int, v string, _sign int")
    v = t.merge_apply_changes(good, keys=["k"], txn=("app", 7))
    # replay the SAME txn with a feed that would fail the dup check:
    # the marker short-circuit must win and return without raising
    bad = spark.createDataFrame(
        [(3, "x", 1), (3, "y", 1)], "k int, v string, _sign int"
    )
    assert t.merge_apply_changes(bad, keys=["k"], txn=("app", 7)) == v
    assert sorted((r.k, r.v) for r in t.read().collect()) == [
        (1, "a"), (2, "b"),
    ]


def test_ivm_random_mutations_equal_recompute(spark, tmp_path):
    """Randomized (seeded) incremental-view-maintenance property: for a
    keyed fact A(k, fk, v) and dim B(fk, attr), maintain M = A |x| B
    through a random sequence of fact inserts, fact deletes, and dim
    updates using the delta-join algebra + merge_apply_changes, and
    assert the maintained view row-equals the recompute after EVERY
    commit — the invariant that makes the algebra trustworthy beyond
    the registered query's one fixed scenario."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(20260816)
    a_rows = {k: (k, rng.randint(0, 5), k * 10) for k in range(30)}
    b_rows = {f: (f, f"seg{f}") for f in range(6)}

    def a_df(rows):
        return spark.createDataFrame(
            list(rows), "k int, fk int, v int"
        )

    def b_df(rows):
        return spark.createDataFrame(list(rows), "fk int, attr string")

    def view(a, b):
        return a.join(b, "fk").select("k", "fk", "v", "attr")

    t = TransactionalParquetTable(spark, str(tmp_path / "ivm"))
    t.overwrite(view(a_df(a_rows.values()), b_df(b_rows.values())))

    def check():
        cur = t.read().select("k", "fk", "v", "attr")
        rec = view(a_df(a_rows.values()), b_df(b_rows.values()))
        assert cur.exceptAll(rec).count() == 0
        assert rec.exceptAll(cur).count() == 0

    next_k = 100
    for _step in range(6):
        op = rng.choice(["insert", "delete", "dim_update"])
        if op == "insert":
            new = {
                next_k + i: (next_k + i, rng.randint(0, 5), rng.randint(0, 99))
                for i in range(rng.randint(1, 4))
            }
            next_k += 10
            a_rows.update(new)
            delta = view(a_df(new.values()), b_df(b_rows.values()))
            t.merge_apply_changes(
                delta.withColumn("_sign", F.lit(1)), keys=["k"]
            )
        elif op == "delete" and a_rows:
            ks = rng.sample(sorted(a_rows), min(3, len(a_rows)))
            for k in ks:
                del a_rows[k]
            dels = spark.createDataFrame(
                [(k, -1) for k in ks], "k int, _sign int"
            )
            t.merge_apply_changes(dels, keys=["k"])
        else:
            f = rng.randrange(6)
            b_rows[f] = (f, f"seg{f}x{_step}")
            # A |x| dB: only the touched dim key's fact rows re-emit
            touched = a_df(
                [r for r in a_rows.values() if r[1] == f]
            )
            delta = view(touched, b_df([b_rows[f]]))
            t.merge_apply_changes(
                delta.withColumn("_sign", F.lit(1)), keys=["k"]
            )
        check()


# ---------------------------------------------------------------------------
# Partition-aware maintenance (round 6): clustered writes, pruned MERGE
# ---------------------------------------------------------------------------


def _pdf(spark, rows):
    return spark.createDataFrame(rows, "p int, k int, v string")


def test_partitioned_write_one_value_per_file(spark, tmp_path):
    """partition_by clusters every data file on ONE partition value:
    each file's stat envelope for the column is exact ([v, v]), which is
    what makes file pruning partition pruning."""
    t = TransactionalParquetTable(spark, str(tmp_path / "t"), partition_by="p")
    t.append(_pdf(spark, [(p, k, f"r{p}{k}") for p in (1, 2, 3) for k in range(4)]))
    m = t.history()[-1]
    assert m["partitionBy"] == "p"
    assert m["files"], "no data files registered"
    for f in m["files"]:
        env = m["stats"][f]["p"]
        assert env[0] == env[1], f"file {f} spans partition values {env}"
    # the duplicate __part column never reaches the table schema
    assert "__part" not in t.read().columns
    assert sorted(map(tuple, t.read().collect())) == sorted(
        (p, k, f"r{p}{k}") for p in (1, 2, 3) for k in range(4)
    )


def test_partitioned_merge_rewrites_only_touched_partition(spark, tmp_path):
    """A CDC merge whose keys include the partition column rewrites only
    the touched partition's files; every other file is carried into the
    new version byte-identical (same relative path, same bytes)."""
    import hashlib

    t = TransactionalParquetTable(spark, str(tmp_path / "t"), partition_by="p")
    t.append(_pdf(spark, [(p, k, f"r{p}{k}") for p in (1, 2, 3) for k in range(4)]))
    before = t.history()[-1]

    def digest(rel):
        with open(os.path.join(str(tmp_path / "t"), rel), "rb") as fh:
            return hashlib.sha256(fh.read()).hexdigest()

    pre_hash = {f: digest(f) for f in before["files"]}
    p2_files = {f for f in before["files"] if before["stats"][f]["p"] == [2, 2]}
    other = set(before["files"]) - p2_files
    assert p2_files and other

    changes = spark.createDataFrame(
        [(2, 1, "UPD", 1), (2, 3, None, -1), (2, 99, "NEW", 1)],
        "p int, k int, v string, _sign int",
    )
    t.merge_apply_changes(changes, keys=["p", "k"])
    after = t.history()[-1]
    # untouched partitions: carried by reference, bytes identical
    assert other <= set(after["files"])
    for f in other:
        assert digest(f) == pre_hash[f]
    # touched partition: every old file replaced
    assert not (p2_files & set(after["files"]))
    got = sorted(map(tuple, t.read().collect()))
    want = sorted(
        [(p, k, f"r{p}{k}") for p in (1, 3) for k in range(4)]
        + [(2, 0, "r20"), (2, 1, "UPD"), (2, 2, "r22"), (2, 99, "NEW")]
    )
    assert got == want


def test_partitioned_key_inherited_from_manifest(spark, tmp_path):
    """A reopened handle inherits partition_by from the log; its merges
    stay partition-pruned without the caller restating the key."""
    t = TransactionalParquetTable(spark, str(tmp_path / "t"), partition_by="p")
    t.append(_pdf(spark, [(1, 1, "a"), (2, 1, "b")]))
    t2 = TransactionalParquetTable(spark, str(tmp_path / "t"))
    assert t2.partition_by == "p"
    before = set(t2.history()[-1]["files"])
    p1_files = {
        f for f in before if t2.history()[-1]["stats"][f]["p"] == [1, 1]
    }
    t2.merge_upsert(_pdf(spark, [(2, 1, "B")]), keys=["p", "k"])
    after = set(t2.history()[-1]["files"])
    assert p1_files <= after  # p=1 untouched
    assert sorted(map(tuple, t2.read().collect())) == [(1, 1, "a"), (2, 1, "B")]


def test_partitioned_merge_without_partition_key_falls_back(spark, tmp_path):
    """keys that do NOT include the partition column cannot prune (a key
    could live in any partition): the merge rewrites the full snapshot
    and stays correct."""
    t = TransactionalParquetTable(spark, str(tmp_path / "t"), partition_by="p")
    t.append(_pdf(spark, [(1, 1, "a"), (2, 2, "b")]))
    # move key k=2 to partition p=9: only correct under a full merge
    t.merge_upsert(_pdf(spark, [(9, 2, "B")]), keys=["k"])
    assert sorted(map(tuple, t.read().collect())) == [(1, 1, "a"), (9, 2, "B")]


def test_partitioned_merge_null_partition_value(spark, tmp_path):
    """NULL partition values in the feed match no target row (SQL join
    equality); their positive rows still insert, and non-null pruning is
    unaffected."""
    t = TransactionalParquetTable(spark, str(tmp_path / "t"), partition_by="p")
    t.append(_pdf(spark, [(1, 1, "a"), (2, 2, "b")]))
    changes = spark.createDataFrame(
        [(None, 7, "nullp", 1), (2, 2, "B", 1)],
        "p int, k int, v string, _sign int",
    )
    t.merge_apply_changes(changes, keys=["p", "k"])
    assert sorted(map(tuple, t.read().collect()), key=str) == sorted(
        [(1, 1, "a"), (2, 2, "B"), (None, 7, "nullp")], key=str
    )


def test_merge_delete_only_uncreated_table_with_txn(spark, tmp_path):
    """ADVICE r5: a delete-only feed + txn marker on a table that does
    not exist yet commits a marker-only EMPTY manifest (so exactly-once
    replay bookkeeping exists) instead of crashing in _read_manifest(0)."""
    t = TransactionalParquetTable(spark, str(tmp_path / "t"))
    dels = spark.createDataFrame([(1, -1)], "k int, _sign int")
    v = t.merge_apply_changes(dels, keys=["k"], txn=("app", 3))
    assert v == 1
    m = t.history()[-1]
    assert m["files"] == [] and m["txn"] == {"app": "app", "id": 3}
    assert m["dataChange"] is False
    assert t.read().count() == 0  # empty snapshot, keys-only schema
    # replay is a no-op
    assert t.merge_apply_changes(dels, keys=["k"], txn=("app", 3)) == 1
    # without a txn marker the same feed stays a version-0 no-op
    t2 = TransactionalParquetTable(spark, str(tmp_path / "t2"))
    assert t2.merge_apply_changes(dels, keys=["k"]) == 0


def test_merge_pins_change_feed_once(spark, tmp_path):
    """ADVICE r5: the change feed's lineage executes exactly ONCE per
    merge (pinned via localCheckpoint) — validation, anti-join and the
    written rows all see the same materialization, so a
    non-deterministic feed cannot pass validation then write different
    rows."""
    sc = spark.sparkContext
    acc = sc.accumulator(0)

    def tag(row):
        acc.add(1)
        return row

    rdd = sc.parallelize([(1, "a", 1), (2, "b", 1)], 2).map(tag)
    changes = spark.createDataFrame(rdd, "k int, v string, _sign int")
    t = TransactionalParquetTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "old")]))
    t.merge_apply_changes(changes, keys=["k"])
    assert acc.value == 2, f"feed lineage ran {acc.value / 2:.0f}x, want 1x"
    assert sorted(map(tuple, t.read().collect())) == [(1, "a"), (2, "b")]


def test_sink_partitioned_maintenance_carries_untouched_months(spark):
    """Scenario lock for the registered sink_partitioned_maintenance
    query: each of its three maintenance commits touches exactly one
    month partition — every other month's files are carried into the
    new version by reference (identical relative paths ⇒ identical
    bytes; files are immutable once committed)."""
    import tempfile

    from plc_data_etl_pipeline_spark.registry import all_queries

    all_queries()["sink_partitioned_maintenance"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    from plc_data_etl_pipeline_spark.catalog import session_tmp_path

    t = TransactionalParquetTable(
        spark, session_tmp_path(spark, "part_maint")
    )
    assert t.partition_by == "omonth"
    h = t.history()
    assert len(h) == 4  # seed + backfill + purge + correction

    def months(m, files):
        out = set()
        for f in files:
            env = m["stats"][f]["omonth"]
            assert env[0] == env[1], f"{f} spans months {env}"
            out.add(env[0])
        return out

    seed, backfill, purge, corr = h
    # backfill: every seed file carried; additions are all 1995-03
    assert set(seed["files"]) <= set(backfill["files"])
    assert months(
        backfill, set(backfill["files"]) - set(seed["files"])
    ) == {"1995-03"}
    # purge: drops/adds touch only 1995-06
    dropped = set(backfill["files"]) - set(purge["files"])
    added = set(purge["files"]) - set(backfill["files"])
    assert dropped and months(backfill, dropped) == {"1995-06"}
    assert months(purge, added) <= {"1995-06"}
    # correction: drops/adds touch only 1997-01
    dropped = set(purge["files"]) - set(corr["files"])
    added = set(corr["files"]) - set(purge["files"])
    assert dropped and months(purge, dropped) == {"1997-01"}
    assert months(corr, added) == {"1997-01"}


def test_restore_is_metadata_only_and_preserves_history(spark, tmp_path):
    """RESTORE re-references the target version's exact files (zero
    rewrite), later versions stay time-travelable, restore-to-current
    is a no-op, an out-of-range target raises, and vacuum after restore
    removes nothing the restored snapshot needs."""
    t = TransactionalParquetTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a"), (2, "b")]))            # v1
    t.merge_upsert(_df(spark, [(2, "B2"), (3, "c")]), keys=["k"])  # v2
    t.delete_where([("k", "=", 1)])                        # v3
    v = t.restore(1)                                       # v4
    assert v == 4
    assert t.history()[-1]["files"] == t.history()[0]["files"]
    assert sorted(map(tuple, t.read().collect())) == [(1, "a"), (2, "b")]
    # undone versions still time-travel
    assert sorted(map(tuple, t.read(version=3).collect())) == [
        (2, "B2"), (3, "c")
    ]
    # restore to the current snapshot: no-op, no new version
    assert t.restore(4) == 4
    assert t.restore(1) == 4  # v4 already IS v1's snapshot
    # out-of-range target
    import pytest as _pytest

    with _pytest.raises(ValueError):
        t.restore(99)
    # vacuum only removes unreferenced files; the restored snapshot's
    # files are referenced by v1 AND v4
    t.vacuum()
    assert sorted(map(tuple, t.read().collect())) == [(1, "a"), (2, "b")]
    # change feed across the restore commit shows the net file diff
    ch = t.read_changes(3, 4)
    got = {(r["k"], r["v"], r["_change_type"]) for r in ch.collect()}
    assert got == {
        (2, "B2", "removed"), (3, "c", "removed"),
        (1, "a", "inserted"), (2, "b", "inserted"),
    }


def test_restore_txn_marker_exactly_once(spark, tmp_path):
    """A restore with a txn marker replays as a no-op — including when
    the target equals the current snapshot (marker-only commit)."""
    t = TransactionalParquetTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))                       # v1
    t.overwrite(_df(spark, [(9, "z")]))                    # v2
    v = t.restore(1, txn=("app", 1))                       # v3
    assert v == 3
    assert t.restore(1, txn=("app", 1)) == 3  # replay: no-op
    # marker-only path: restore-to-current with a NEW txn still records
    v2 = t.restore(3, txn=("app", 2))
    m = t.history()[-1]
    assert v2 == 4 and m["txn"] == {"app": "app", "id": 2}
    assert m["dataChange"] is False
    assert sorted(map(tuple, t.read().collect())) == [(1, "a")]


def test_partitioned_compact_preserves_clustering(spark, tmp_path):
    """OPTIMIZE on a partitioned table keeps one-value-per-file
    clustering (the write path re-clusters by the partition column), so
    partition pruning stays exact after compaction and readers see the
    identical row multiset."""
    t = TransactionalParquetTable(spark, str(tmp_path / "t"), partition_by="p")
    for _ in range(3):  # several commits -> several files per partition
        t.append(_pdf(spark, [(p, k, f"x{p}{k}") for p in (1, 2) for k in range(3)]))
    before = sorted(map(tuple, t.read().collect()))
    assert len(t.history()[-1]["files"]) >= 6
    v = t.compact(target_file_bytes=1 << 30)
    m = t.history()[-1]
    assert m["dataChange"] is False and m["version"] == v
    for f in m["files"]:
        env = m["stats"][f]["p"]
        assert env[0] == env[1], f"compacted file {f} spans partitions {env}"
    assert sorted(map(tuple, t.read().collect())) == before


def test_partitioned_merge_cdf_is_partition_tight(spark, tmp_path):
    """After a partition-pruned merge, the change feed degenerates to
    removed+inserted of ONLY the touched partition's files — carried
    partitions contribute nothing (the file-diff CDF inherits the
    maintenance granularity)."""
    t = TransactionalParquetTable(spark, str(tmp_path / "t"), partition_by="p")
    t.append(_pdf(spark, [(p, k, f"x{p}{k}") for p in (1, 2, 3) for k in range(3)]))
    v1 = t.version()
    t.merge_upsert(_pdf(spark, [(2, 1, "UPD")]), keys=["p", "k"])
    ch = t.read_changes(v1)
    rows = {(r["p"], r["k"], r["v"], r["_change_type"]) for r in ch.collect()}
    assert all(p == 2 for (p, _k, _v, _t) in rows), (
        f"CDF leaked untouched partitions: {sorted(rows)}"
    )
    assert (2, 1, "UPD", "inserted") in rows
    assert (2, 1, "x21", "removed") in rows


def test_expire_snapshots_reclaims_space(spark, tmp_path):
    """Retention: expiring history makes previously-referenced rewrite
    garbage vacuumable; the current snapshot and version numbering are
    untouched; expired versions stop time-traveling."""
    t = TransactionalParquetTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a"), (2, "b")]))            # v1
    t.overwrite(_df(spark, [(3, "c")]))                    # v2 (v1 garbage)
    t.merge_upsert(_df(spark, [(3, "C2")]), keys=["k"])    # v3 (v2 garbage)
    assert t.vacuum() == 0  # everything still referenced by history
    assert t.expire_snapshots(keep_last=1) == 2
    assert [m["version"] for m in t.history()] == [3]
    reclaimed = t.vacuum()
    assert reclaimed >= 2  # v1+v2 data files freed
    assert sorted(map(tuple, t.read().collect())) == [(3, "C2")]
    with pytest.raises(FileNotFoundError):
        t.read(version=1)
    # version numbering continues past the expired prefix
    t.append(_df(spark, [(4, "d")]))
    assert t.version() == 4
    with pytest.raises(ValueError):
        t.expire_snapshots(keep_last=0)


def test_expire_snapshots_forgets_ancient_txn_markers(spark, tmp_path):
    """Documented retention caveat, locked: a txn marker recorded only
    in an expired manifest no longer dedupes a replay — markers inside
    the kept window still do."""
    t = TransactionalParquetTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]), txn=("app", 1))       # v1
    t.append(_df(spark, [(2, "b")]), txn=("app", 2))       # v2
    t.append(_df(spark, [(3, "c")]), txn=("app", 3))       # v3
    t.expire_snapshots(keep_last=2)                        # drop v1
    # marker within the window: replay still a no-op
    assert t.append(_df(spark, [(2, "DUP")]), txn=("app", 2)) == 3
    assert t.read().filter("v = 'DUP'").count() == 0
    # marker only in the expired manifest: replay re-applies
    t.append(_df(spark, [(1, "REPLAYED")]), txn=("app", 1))
    assert t.read().filter("v = 'REPLAYED'").count() == 1


# --- round-6 review fixes -------------------------------------------------


def test_merge_rejects_type_mismatched_feed(spark, tmp_path):
    """Round-6 review finding 1 (reproduced): a feed whose column types
    diverge from the table schema must be REJECTED at merge time — the
    carried files pin the manifest schema, so committing physically
    different types would poison every subsequent read."""
    t = TransactionalParquetTable(spark, str(tmp_path / "t"), partition_by="p")
    t.append(_pdf(spark, [(1, 1, "a")]))  # v string
    bad = spark.createDataFrame(
        [(2, 1, 7, 1)], "p int, k int, v long, _sign int"  # v long != string
    )
    with pytest.raises(ValueError, match="type-mismatched columns \\['v'\\]"):
        t.merge_apply_changes(bad, keys=["p", "k"])
    # extra / missing columns rejected too
    extra = spark.createDataFrame(
        [(2, 1, "x", "?", 1)], "p int, k int, v string, w string, _sign int"
    )
    with pytest.raises(ValueError, match="feed-only columns \\['w'\\]"):
        t.merge_apply_changes(extra, keys=["p", "k"])
    missing = spark.createDataFrame([(2, 1, 1)], "p int, k int, _sign int")
    with pytest.raises(ValueError, match="missing columns \\['v'\\]"):
        t.merge_apply_changes(missing, keys=["p", "k"])
    # table still readable and unchanged
    assert sorted(map(tuple, t.read().collect())) == [(1, 1, "a")]


def test_partitioned_compact_converges(spark, tmp_path):
    """Round-6 review finding 2: compact() on a partitioned table packs
    to the per-partition-value floor and then becomes a NO-OP — it must
    not rewrite the whole table forever."""
    t = TransactionalParquetTable(spark, str(tmp_path / "t"), partition_by="p")
    for _ in range(3):
        t.append(_pdf(spark, [(p, k, "x") for p in (1, 2) for k in range(2)]))
    v = t.compact(target_file_bytes=1 << 30)
    assert v == t.version()
    assert len(t.history()[-1]["files"]) == 2  # one per partition value
    assert t.compact(target_file_bytes=1 << 30) == v  # no-op now
    assert t.version() == v


def test_expired_history_gives_clear_errors(spark, tmp_path):
    """Round-6 review finding 3: read_changes from an expired version
    raises a resync-signalling ValueError (not a raw FileNotFoundError
    mid-loop), and restore's range error names the RETAINED range."""
    t = TransactionalParquetTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a")]))       # v1
    t.append(_df(spark, [(2, "b")]))       # v2
    t.append(_df(spark, [(3, "c")]))       # v3
    t.expire_snapshots(keep_last=2)        # drop v1
    with pytest.raises(ValueError, match="resync"):
        t.read_changes(1)
    assert t.read_changes(2).count() > 0   # within retention: fine
    with pytest.raises(ValueError, match="retained range 2..3"):
        t.restore(1)
    assert t.restore(2) == 4               # retained target works


def test_marker_only_schema_is_provisional_not_bricking(spark, tmp_path):
    """ADVICE r6 (medium): a delete-only + txn feed on an UNCREATED
    table records a keys-only schema — but flagged PROVISIONAL, so the
    first real upsert establishes the true table schema instead of
    failing the exact-schema validation forever (an unrecoverable CDC
    stream otherwise)."""
    t = TransactionalParquetTable(spark, str(tmp_path / "t"))
    dels = spark.createDataFrame([(1, -1)], "k int, _sign int")
    assert t.merge_apply_changes(dels, keys=["k"], txn=("app", 1)) == 1
    assert t.history()[-1].get("schemaProvisional") is True

    # a second delete-only marker keeps the chain provisional
    dels2 = spark.createDataFrame([(2, -1)], "k int, _sign int")
    assert t.merge_apply_changes(dels2, keys=["k"], txn=("app", 2)) == 2
    assert t.history()[-1].get("schemaProvisional") is True

    # the first REAL upsert establishes the schema — this used to raise
    ups = spark.createDataFrame([(1, "a", 1), (3, "c", 1)],
                                "k int, v string, _sign int")
    assert t.merge_apply_changes(ups, keys=["k"], txn=("app", 3)) == 3
    m = t.history()[-1]
    assert m.get("schemaProvisional") is None  # flag cleared for good
    assert sorted(map(tuple, t.read().collect())) == [(1, "a"), (3, "c")]

    # from here the exact-schema validation is back in force
    bad = spark.createDataFrame([(9, 1)], "k int, _sign int")
    bad = bad.withColumn("v", F.lit(5)).select("k", "v", "_sign")
    with pytest.raises(ValueError, match="type-mismatched columns"):
        t.merge_apply_changes(bad, keys=["k"])
    # and normal merges keep working
    t.merge_apply_changes(
        spark.createDataFrame([(3, "C", 1)], "k int, v string, _sign int"),
        keys=["k"],
    )
    assert sorted(map(tuple, t.read().collect())) == [(1, "a"), (3, "C")]


def test_delete_only_type_divergent_partition_key_no_typeerror(spark, tmp_path):
    """ADVICE r6: delete-only feeds bypass the exact-schema validation,
    so a type-divergent partition key (string feed vs int table) used to
    reach _envelope_may_match and raise a raw TypeError mid-merge (or,
    past the split, an ANSI CAST_INVALID_INPUT inside the anti-join).
    Now the merge fails FAST with a clear contract error and the table
    is untouched; a correctly-typed feed still works."""
    t = TransactionalParquetTable(spark, str(tmp_path / "t"), partition_by="p")
    t.append(_pdf(spark, [(1, 1, "a"), (2, 1, "b")]))
    dels = spark.createDataFrame([("x", 1, -1)], "p string, k int, _sign int")
    with pytest.raises(ValueError, match="p: feed string vs table int"):
        t.merge_apply_changes(dels, keys=["p", "k"])
    assert sorted(map(tuple, t.read().collect())) == [(1, 1, "a"), (2, 1, "b")]
    # a correctly-cast feed applies normally
    dels2 = spark.createDataFrame([(2, 1, -1)], "p int, k int, _sign int")
    t.merge_apply_changes(dels2, keys=["p", "k"])
    assert sorted(map(tuple, t.read().collect())) == [(1, 1, "a")]


def test_partitioned_compact_rewrites_only_multifile_partitions(spark, tmp_path):
    """ADVICE r6: compact() on a partitioned table rewrites ONLY the
    partitions holding more than one file; single-file partitions are
    carried byte-identical (same table-relative path)."""
    t = TransactionalParquetTable(spark, str(tmp_path / "t"), partition_by="p")
    t.append(_pdf(spark, [(1, 1, "a"), (2, 1, "b")]))  # one file per value
    t.append(_pdf(spark, [(1, 2, "c")]))               # p=1 gains a 2nd file
    before = t.history()[-1]["files"]
    stats = t.history()[-1]["stats"]
    p2_files = [f for f in before if stats[f]["p"] == [2, 2]]
    assert len(p2_files) == 1
    v = t.compact(target_file_bytes=1 << 30)
    after = t.history()[-1]["files"]
    assert p2_files[0] in after, "single-file partition must be carried"
    assert len(after) == 2  # p=1 merged to one file
    assert sorted(map(tuple, t.read().collect())) == [
        (1, 1, "a"), (1, 2, "c"), (2, 1, "b")]
    assert t.compact(target_file_bytes=1 << 30) == v  # converged: no-op


def test_partitioned_compact_packs_legacy_loose_files(spark, tmp_path):
    """ADVICE r6: files WITHOUT an exact [v, v] envelope (written before
    partition_by existed) used to each count as their own floor unit, so
    legacy tables hit the no-op guard forever without ever re-clustering.
    One compact() now rewrites them into exact-envelope files and the
    next call is a no-op."""
    # write v1 unpartitioned (legacy), then reopen WITH partition_by
    legacy = TransactionalParquetTable(spark, str(tmp_path / "t"))
    legacy.append(
        _pdf(spark, [(p, k, "x") for p in (1, 2) for k in range(3)]).coalesce(1)
    )
    t = TransactionalParquetTable(spark, str(tmp_path / "t"), partition_by="p")
    stats = t.history()[-1]["stats"]
    assert any(
        (e := env.get("p")) and e[0] != e[1]
        for env in stats.values()
    ), "setup must produce at least one wide-envelope legacy file"
    v = t.compact(target_file_bytes=1 << 30)
    assert v == t.version() and v > 1, "legacy files must be re-clustered"
    stats = t.history()[-1]["stats"]
    for f in t.history()[-1]["files"]:
        env = stats[f]["p"]
        assert env[0] == env[1], f"{f} still spans partitions {env}"
    assert t.read().count() == 6
    assert t.compact(target_file_bytes=1 << 30) == v  # converged


def test_concurrent_disjoint_partition_merges_both_commit(spark, tmp_path):
    """Round-6 verdict item 4: two REAL threads merge into DISJOINT
    partitions of one partitioned table concurrently. The optimistic
    protocol serializes them — the loser's conflict retry recomputes
    against the winner's snapshot (partition pruning then carries the
    winner's files untouched) — so BOTH commits land, neither update is
    lost, and untouched partitions' files are carried byte-identical
    through both merges. Documented rule: commits serialize on the
    single version counter even when partitions are disjoint; disjointness
    guarantees retry SUCCESS (no semantic conflict), not lock-free
    parallel commits — the same rule as Delta's optimistic protocol
    with partition-level conflict detection resolving to retry."""
    import threading

    path = str(tmp_path / "pt_race")
    t = TransactionalParquetTable(spark, path, partition_by="p")
    t.append(_pdf(spark, [(p, 1, "seed") for p in (1, 2, 3)]))
    seed_stats = t.history()[-1]["stats"]
    p3_file = [f for f in t.history()[-1]["files"]
               if seed_stats[f]["p"] == [3, 3]]
    barrier = threading.Barrier(2)
    errors: list[Exception] = []

    def merge(p: int) -> None:
        try:
            feed = spark.createDataFrame(
                [(p, 1, f"upd{p}", 1)], "p int, k int, v string, _sign int"
            )
            t2 = TransactionalParquetTable(spark, path)
            barrier.wait(timeout=60)
            t2.merge_apply_changes(feed, keys=["p", "k"],
                                   txn=(f"writer{p}", 1))
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append(e)

    threads = [threading.Thread(target=merge, args=(p,)) for p in (1, 2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=180)
    assert not errors, errors
    assert sorted(map(tuple, t.read().collect())) == [
        (1, 1, "upd1"), (2, 1, "upd2"), (3, 1, "seed")]
    hist = t.history()
    assert [m["version"] for m in hist] == [1, 2, 3]  # strictly serialized
    markers = {m["txn"]["app"] for m in hist if m.get("txn")}
    assert markers == {"writer1", "writer2"}  # both committed exactly once
    # the untouched p=3 partition's seed file survived BOTH merges
    assert p3_file and p3_file[0] in hist[-1]["files"]


def test_delete_only_nonpartition_key_type_mismatch_fails_fast(spark, tmp_path):
    """Round-7 review: the delete-only key-type guard must cover EVERY
    join key on any table — not just the partition key — or the
    anti-join throws a raw ANSI cast error mid-job (unpartitioned
    table) / silently cross-type-matches (numeric strings)."""
    # unpartitioned table
    t = TransactionalParquetTable(spark, str(tmp_path / "t"))
    t.append(_df(spark, [(1, "a"), (2, "b")]))
    dels = spark.createDataFrame([("2", -1)], "k string, _sign int")
    with pytest.raises(ValueError, match="delete-only feed key type "
                                         "mismatch \\(k: feed string"):
        t.merge_apply_changes(dels, keys=["k"])
    assert t.read().count() == 2  # untouched
    # partitioned table, divergent NON-partition key
    t2 = TransactionalParquetTable(spark, str(tmp_path / "t2"),
                                   partition_by="p")
    t2.append(_pdf(spark, [(1, 1, "a")]))
    dels2 = spark.createDataFrame([(1, "1", -1)],
                                  "p int, k string, _sign int")
    with pytest.raises(ValueError, match="k: feed string vs table int"):
        t2.merge_apply_changes(dels2, keys=["p", "k"])


def test_append_establishes_schema_over_provisional_marker(spark, tmp_path):
    """Round-7 review: append() against a marker-only provisional base
    must establish the real schema (the merge path already did), not
    trip the schema-evolution guard on the keys-only placeholder."""
    t = TransactionalParquetTable(spark, str(tmp_path / "t"))
    dels = spark.createDataFrame([(1, -1)], "k int, _sign int")
    t.merge_apply_changes(dels, keys=["k"], txn=("app", 1))
    assert t.history()[-1].get("schemaProvisional") is True
    t.append(_df(spark, [(1, "a"), (2, "b")]))  # used to raise
    m = t.history()[-1]
    assert m.get("schemaProvisional") is None
    assert sorted(map(tuple, t.read().collect())) == [(1, "a"), (2, "b")]
    # evolution guard back in force against the ESTABLISHED schema
    widened = spark.createDataFrame([(3, "c", 1.0)],
                                    "k int, v string, w double")
    with pytest.raises(ValueError, match="append adds columns"):
        t.append(widened)


def test_partitioned_compact_mixed_wide_and_exact_converges_in_one_call(
    spark, tmp_path
):
    """Round-7 review: a wide-envelope legacy file whose span covers a
    value that ALSO has a carried exact file must pull that exact file
    into the rewrite — otherwise the new exact outputs land next to the
    carried twin and the committed version still has a multi-file
    partition (compact() would need a second call to reach the floor)."""
    legacy = TransactionalParquetTable(spark, str(tmp_path / "t"))
    legacy.append(
        _pdf(spark, [(p, k, "x") for p in (1, 2) for k in range(3)]).coalesce(1)
    )  # one wide file spanning p in [1, 2]
    t = TransactionalParquetTable(spark, str(tmp_path / "t"), partition_by="p")
    t.append(_pdf(spark, [(1, 9, "y")]))  # exact single file for p=1
    v = t.compact(target_file_bytes=1 << 30)
    assert v == t.version()
    m = t.history()[-1]
    stats = m["stats"]
    per_val: dict = {}
    for f in m["files"]:
        env = stats[f]["p"]
        assert env[0] == env[1], f"{f} still spans {env}"
        per_val[env[0]] = per_val.get(env[0], 0) + 1
    assert per_val == {1: 1, 2: 1}, per_val  # ONE file per value already
    assert t.read().count() == 7
    assert t.compact(target_file_bytes=1 << 30) == v  # immediate no-op


def test_txlog_random_ops_match_python_model(spark, tmp_path):
    """Model-based protocol test (round 7): a seeded random sequence of
    {merge-upsert, delete-only merge, append, compact, restore} against
    a PARTITIONED table, starting from a provisional marker-only commit,
    checked after EVERY operation against a pure-Python model:
    current-snapshot row sets, version arithmetic, time travel to every
    retained version, dataChange semantics (compact commits don't
    change rows), and exact [v, v] partition envelopes after compacts.
    One randomized walk exercises protocol interactions (e.g. restore
    onto a compacted version, delete after restore) no fixed scenario
    covers."""
    import random

    rng = random.Random(20260817)
    path = str(tmp_path / "model_t")
    t = TransactionalParquetTable(spark, path, partition_by="p")

    def row(k):
        return (k % 4, k, f"v{k}_{rng.randint(0, 9)}")

    # provisional start: delete-only feed + txn on the uncreated table
    dels = spark.createDataFrame([(0, 99, -1)], "p int, k int, _sign int")
    assert t.merge_apply_changes(dels, keys=["p", "k"], txn=("m", 0)) == 1
    model: dict[int, tuple] = {}          # k -> (p, k, v)
    snapshots = {1: dict(model)}          # version -> model copy
    next_key = 0

    def check():
        got = sorted(map(tuple, t.read().collect()))
        want = sorted(model.values())
        assert got == want, f"snapshot diverged at v{t.version()}"

    for step in range(24):
        op = rng.choice(
            ["upsert", "upsert", "delete", "append", "compact", "restore"]
        )
        if op == "append" and model:
            op = "upsert"  # append only establishes/extends fresh keys
        if op == "upsert" or op == "append":
            ks = [next_key + i for i in range(rng.randint(1, 4))]
            next_key += len(ks)
            ks += rng.sample(sorted(model), min(len(model), rng.randint(0, 2)))
            rows = [row(k) for k in set(ks)]
            feed = spark.createDataFrame(
                [(p, k, v, 1) for (p, k, v) in rows],
                "p int, k int, v string, _sign int",
            )
            t.merge_apply_changes(feed, keys=["p", "k"], txn=("m", step + 1))
            for (p, k, v) in rows:
                model[k] = (p, k, v)
        elif op == "delete":
            if not model:
                continue
            ks = rng.sample(sorted(model), rng.randint(1, min(3, len(model))))
            feed = spark.createDataFrame(
                [(model[k][0], k, -1) for k in ks],
                "p int, k int, _sign int",
            )
            t.merge_apply_changes(feed, keys=["p", "k"], txn=("m", step + 1))
            for k in ks:
                del model[k]
        elif op == "compact":
            v_before = t.version()
            t.compact(target_file_bytes=1 << 30)
            if t.version() != v_before:  # a real compaction committed
                m = t.history()[-1]
                assert m["dataChange"] is False
                for f in m["files"]:
                    env = m["stats"][f].get("p")
                    assert env and env[0] == env[1], f"{f}: {env}"
        else:  # restore
            targets = [v for v in snapshots if v <= t.version()]
            tgt = rng.choice(sorted(targets))
            t.restore(tgt, txn=("m", step + 1))
            model = dict(snapshots[tgt])
        snapshots[t.version()] = dict(model)
        check()
        # time travel to one random retained snapshot
        tv = rng.choice(sorted(snapshots))
        got = sorted(map(tuple, t.read(version=tv).collect()))
        assert got == sorted(snapshots[tv].values()), f"time travel v{tv}"
    assert len(model) > 0 and t.version() >= 20  # the walk did real work


def test_four_writer_mixed_ops_contention_invariants(spark, tmp_path):
    """Heavier optimistic-concurrency stress (round 7): FOUR real
    threads interleave upserts, deletes and a compaction against one
    partitioned table, each owning a disjoint key range. Invariants
    that must survive any interleaving: contiguous version history, at
    most one commit per txn marker, no lost updates (every thread's
    final state is exactly its last write), and exact partition
    envelopes on every committed file."""
    import threading

    path = str(tmp_path / "stress")
    t = TransactionalParquetTable(spark, path, partition_by="p")
    t.append(_pdf(spark, [(w, k, "seed") for w in range(4) for k in range(3)]))
    errors: list[Exception] = []
    barrier = threading.Barrier(4)

    def worker(w: int) -> None:
        try:
            t2 = TransactionalParquetTable(spark, path)
            barrier.wait(timeout=60)
            # upsert own keys, delete one, compact once, upsert again
            t2.merge_apply_changes(
                spark.createDataFrame(
                    [(w, k, f"w{w}r1", 1) for k in range(3)],
                    "p int, k int, v string, _sign int",
                ),
                keys=["p", "k"], txn=(f"w{w}", 1),
            )
            t2.merge_apply_changes(
                spark.createDataFrame(
                    [(w, 2, -1)], "p int, k int, _sign int"
                ),
                keys=["p", "k"], txn=(f"w{w}", 2),
            )
            if w == 0:
                t2.compact(target_file_bytes=1 << 30)
            t2.merge_apply_changes(
                spark.createDataFrame(
                    [(w, 0, f"w{w}final", 1)],
                    "p int, k int, v string, _sign int",
                ),
                keys=["p", "k"], txn=(f"w{w}", 3),
            )
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(w,)) for w in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(timeout=300)
    assert not errors, errors
    got = sorted(map(tuple, t.read().collect()))
    want = sorted(
        [(w, 0, f"w{w}final") for w in range(4)]
        + [(w, 1, f"w{w}r1") for w in range(4)]
    )
    assert got == want, "lost update under 4-writer contention"
    hist = t.history()
    versions = [m["version"] for m in hist]
    assert versions == list(range(1, len(hist) + 1)), "history not contiguous"
    markers = [
        (m["txn"]["app"], m["txn"]["id"]) for m in hist if m.get("txn")
    ]
    assert len(markers) == len(set(markers)) == 12  # 3 commits x 4 writers
    final = hist[-1]
    for f in final["files"]:
        env = final["stats"][f].get("p")
        assert env and env[0] == env[1], f"{f}: non-exact envelope {env}"


def test_partitioned_compact_lone_stripped_stats_legacy_file(spark, tmp_path):
    """ADVICE r8: a SINGLE no-envelope file holding real (non-NULL)
    partition values next to exact-envelope files used to persist
    forever — it was treated as an all-NULL floor unit unless wide
    files happened to exist, so its partitions never reached the
    one-file-per-value floor. The footer null-count probe
    (_part_col_all_null) now classifies it as LEGACY and one compact()
    reaches the floor."""
    path = str(tmp_path / "t")
    legacy = TransactionalParquetTable(spark, path)
    legacy.append(_pdf(spark, [(1, 1, "a"), (2, 1, "b")]).coalesce(1))
    t = TransactionalParquetTable(spark, path, partition_by="p")
    t.append(_pdf(spark, [(1, 2, "c"), (2, 2, "d")]))  # exact files
    # Simulate the pre-stats-era manifest: strip the legacy file's
    # partition envelope so it is indistinguishable from all-NULL at
    # the manifest level (only the parquet footer can tell).
    v = t.version()
    mp = t._manifest_path(v)
    with open(mp) as fh:
        m = json.load(fh)
    victims = [f for f, env in m["stats"].items() if env.get("p") == [1, 2]]
    assert len(victims) == 1, "setup: exactly one wide legacy file"
    del m["stats"][victims[0]]["p"]
    with open(mp, "w") as fh:
        json.dump(m, fh)
    t2 = TransactionalParquetTable(spark, path, partition_by="p")
    v2 = t2.compact(target_file_bytes=1 << 30)
    assert v2 > v, "legacy no-envelope file must trigger a rewrite"
    m2 = t2.history()[-1]
    assert len(m2["files"]) == 2, "floor = one file per partition value"
    for f in m2["files"]:
        env = m2["stats"][f]["p"]
        assert env[0] == env[1], f"{f} still not exact: {env}"
    assert sorted(map(tuple, t2.read().collect())) == [
        (1, 1, "a"), (1, 2, "c"), (2, 1, "b"), (2, 2, "d")]
    assert t2.compact(target_file_bytes=1 << 30) == v2  # converged


def test_partitioned_compact_single_allnull_file_stays_floor(spark, tmp_path):
    """The counterpart boundary: ONE genuinely all-NULL-partition file
    next to single-file exact partitions is already at its floor — the
    footer probe keeps it in the all-NULL class and compact() stays a
    no-op (no churn: rewriting it would reproduce an identical
    stat-less file every call)."""
    t = TransactionalParquetTable(spark, str(tmp_path / "t"), partition_by="p")
    t.append(_pdf(spark, [(None, 1, "n"), (1, 1, "a"), (2, 1, "b")]))
    v = t.version()
    assert t.compact(target_file_bytes=1 << 30) == v
    assert sorted(t.read().collect(), key=str) == sorted(
        t.read(v).collect(), key=str)


def test_partitioned_compact_fully_legacy_table_reaches_floor(spark, tmp_path):
    """Round-8 review: a table whose EVERY file predates manifest stats
    (stats map empty) must still re-cluster — the envelope is recovered
    from the parquet footers, so 'no manifest envelope anywhere' no
    longer reads as 'stats-incapable type, never compact'."""
    path = str(tmp_path / "t")
    legacy = TransactionalParquetTable(spark, path)
    legacy.append(_pdf(spark, [(1, 1, "a"), (2, 1, "b")]).coalesce(1))
    legacy.append(_pdf(spark, [(1, 2, "c"), (2, 2, "d")]).coalesce(1))
    t = TransactionalParquetTable(spark, path, partition_by="p")
    v = t.version()
    mp = t._manifest_path(v)
    with open(mp) as fh:
        m = json.load(fh)
    m["stats"] = {}
    with open(mp, "w") as fh:
        json.dump(m, fh)
    t2 = TransactionalParquetTable(spark, path, partition_by="p")
    v2 = t2.compact(target_file_bytes=1 << 30)
    assert v2 > v, "footer-recovered envelopes must trigger the rewrite"
    m2 = t2.history()[-1]
    assert len(m2["files"]) == 2, "floor = one file per partition value"
    for f in m2["files"]:
        env = m2["stats"][f]["p"]
        assert env[0] == env[1]
    assert sorted(map(tuple, t2.read().collect())) == [
        (1, 1, "a"), (1, 2, "c"), (2, 1, "b"), (2, 2, "d")]
    assert t2.compact(target_file_bytes=1 << 30) == v2  # converged
