"""Adversarial NULL-ts/NULL-value sweep over EVERY events-only oracled
query (round-8).

The round-6 hardening fixed five operators that diverged when ts is
NULL (Spark windows sort NULLs first, DuckDB last; Spark's
window()/session_window() DROP NULL timestamps; NULL comparisons are
NULL-false in filters but CASE ELSE routes them somewhere). Round 8
swept the WHOLE registry against a planted fixture mixing NULL ts,
NULL value, duplicate timestamps, and a NULL-ts-only user — and found
THIRTEEN more: stream_session_dynamic, stream_tumbling, win_moving_avg,
win_lag_lead, win_running_sum, win_lag_ignore_nulls, event_transitions,
event_attribution, event_paths_topk, dq_drift_psi, dq_rolling_outliers,
sink_incremental_rollup, sink_partition_overwrite_dynamic. All now drop
NULL-ts rows identically on both sides (or, for the dynamic-overwrite
backfill, both sides keep the NULL Hive partition as untouched).

This test re-runs the sweep so the class can't regress: every oracled
query that can run on the events table alone must MATCH its oracle on
the planted fixture. Queries needing other tables are skipped (they get
the hypothesis/EVENT_ROWS treatment where ts-ordered).
"""

from __future__ import annotations

import datetime

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

from .oracle_compare import compare


def _fixture(tmpdir) -> str:
    rows = [
        (0, datetime.datetime(2024, 1, 10, 0, 30), 1, "view", 1.0),
        (1, None, 1, "click", 2.0),
        (2, datetime.datetime(2024, 1, 10, 0, 45), 1, "purchase", 3.0),
        (3, None, 2, "error", 500.0),
        (4, datetime.datetime(2024, 1, 20, 1, 30), 2, "view", 4.0),
        (5, None, 2, "view", None),
        (6, datetime.datetime(2024, 1, 20, 1, 30), 3, "signup", None),
    ]
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([None] * len(rows), pa.string()),
        }
    )
    pq.write_table(table, f"{tmpdir}/events.parquet")
    return str(tmpdir)


def test_all_events_only_oracles_survive_null_ts(spark, tmp_path_factory):
    from plc_data_etl_pipeline_spark.registry import all_queries

    sf_dir = _fixture(tmp_path_factory.mktemp("null_ts_sweep"))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    bad, ran = [], 0
    try:
        for name, qd in all_queries().items():
            if qd.oracle is None:
                continue
            try:
                sdf = qd.fn(spark, sf_dir)
                srows = [tuple(r) for r in sdf.collect()]
            except Exception:
                continue  # needs tables beyond events
            try:
                rel = con.sql(qd.oracle)
                problems = compare(
                    list(sdf.columns), srows,
                    [d[0] for d in rel.description], rel.fetchall(),
                )
            except Exception:
                continue  # oracle references other tables
            ran += 1
            if problems:
                bad.append(f"{name}: {problems[-1][:140]}")
    finally:
        con.close()
    assert ran >= 60, f"sweep shrank to {ran} queries — fixture drift?"
    assert not bad, "NULL-ts divergence:\n" + "\n".join(bad)
