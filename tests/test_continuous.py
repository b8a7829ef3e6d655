"""Continuous-aggregate tests: the incrementally-maintained rollup must
equal the batch rollup over the same events at every point
(streaming/continuous.py)."""

from __future__ import annotations

from plc_data_etl_pipeline_spark.catalog import load
from plc_data_etl_pipeline_spark.streaming import continuous as C

from .conftest import SF_DIR


def _normalize(rows):
    return sorted(
        (r.event_type, r.day, r.n_events, round(r.avg_value, 9), r.min_value, r.max_value)
        for r in rows
    )


def test_continuous_rollup_matches_batch(spark, tmp_path):
    events = load(spark, SF_DIR, "events")
    src = str(tmp_path / "src")
    # 6 files => 3 micro-batches at maxFilesPerTrigger=2
    events.repartition(6).write.mode("overwrite").parquet(src)

    mat = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    schema = events.schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 2).parquet(src)
    q = C.start_continuous_rollup(stream, mat, ckpt, trigger_seconds=0.5)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = _normalize(C.present(spark.read.parquet(mat)).collect())
    # batch recompute over ALL events through the same bucketize/present
    want = _normalize(C.present(C._bucketize(events)).collect())
    assert got == want


def test_continuous_rollup_incremental_update(spark, tmp_path):
    """Appending a new file and reprocessing only merges the new events
    (counts strictly grow; untouched buckets remain identical)."""
    events = load(spark, SF_DIR, "events")
    first = events.filter("event_id % 2 = 0")
    second = events.filter("event_id % 2 = 1")

    src = str(tmp_path / "src")
    mat = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    first.coalesce(1).write.mode("overwrite").parquet(src)

    schema = events.schema

    def run_once():
        stream = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
        )
        q = C.start_continuous_rollup(stream, mat, ckpt, trigger_seconds=0.5)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    n_first = C.present(spark.read.parquet(mat)).agg({"n_events": "sum"}).collect()[0][0]
    assert n_first == first.count()

    second.coalesce(1).write.mode("append").parquet(src)
    run_once()  # restart from checkpoint — only the new file processes
    got = _normalize(C.present(spark.read.parquet(mat)).collect())
    want = _normalize(C.present(C._bucketize(events)).collect())
    assert got == want


def test_continuous_rollup_replayed_batch_is_idempotent(spark, tmp_path):
    """A micro-batch re-delivered with the same batch_id (crash between
    upsert and checkpoint commit) must not double-count its events."""
    events = load(spark, SF_DIR, "events")
    b0 = events.filter("event_id % 3 = 0")
    b1 = events.filter("event_id % 3 = 1")
    mat = str(tmp_path / "rollup")

    C.merge_micro_batch(b0, 0, mat)
    C.merge_micro_batch(b1, 1, mat)
    C.merge_micro_batch(b1, 1, mat)  # replay of batch 1

    got = _normalize(C.present(spark.read.parquet(mat)).collect())
    want = _normalize(
        C.present(C._bucketize(b0.unionByName(b1))).collect()
    )
    assert got == want


def test_sliding_distinct_matches_batch_and_replay_free(spark, tmp_path):
    """The bitmap-state materialization must equal the batch
    win_sliding_distinct query over the same events, and a replayed
    micro-batch must be a no-op (OR is idempotent — no batch-id
    bookkeeping needed)."""
    from plc_data_etl_pipeline_spark.registry import all_queries
    from plc_data_etl_pipeline_spark.streaming import sliding_distinct as S

    events = load(spark, SF_DIR, "events")
    src = str(tmp_path / "src")
    events.repartition(4).write.mode("overwrite").parquet(src)

    mat = str(tmp_path / "bitmaps")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = S.start_sliding_distinct(stream, mat, ckpt, trigger_seconds=0.5)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = sorted(
        (r["day"], r["n_users_7d"])
        for r in S.present(spark.read.parquet(mat)).collect()
    )
    want = sorted(
        (r["day"], r["n_users_7d"])
        for r in all_queries()["win_sliding_distinct"].fn(spark, SF_DIR).collect()
    )
    assert got == want and len(got) > 0

    # Replay an arbitrary slice twice — state must not change.
    S.merge_micro_batch(events.filter("event_id % 5 = 0"), 99, mat)
    again = sorted(
        (r["day"], r["n_users_7d"])
        for r in S.present(spark.read.parquet(mat)).collect()
    )
    assert again == want
