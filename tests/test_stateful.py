"""Stateful streaming operator tests: EWMA anomaly detection with
cross-micro-batch state (streaming/stateful.py)."""

from __future__ import annotations

import pytest

from plc_data_etl_pipeline_spark.streaming import stateful as ST


def test_ewma_math_flags_planted_spike():
    normal = [(50.0 + (i % 5) * 0.1, float(i)) for i in range(50)]
    spike = [(95.0, 50.0)]
    anomalies, state = ST.ewma_step(normal + spike, None)
    assert state[2] == 51
    assert len(anomalies) == 1
    assert anomalies[0][0] == 95.0
    assert abs(anomalies[0][3]) >= ST.Z_THRESHOLD


def test_ewma_state_carries_across_calls():
    """Splitting the same stream into two calls (≙ two micro-batches)
    yields the same anomalies as one call — state continuity."""
    data = [(50.0 + (i % 5) * 0.1, float(i)) for i in range(50)] + [(95.0, 50.0)]
    one_shot, final1 = ST.ewma_step(data, None)
    a1, mid = ST.ewma_step(data[:30], None)
    a2, final2 = ST.ewma_step(data[30:], mid)
    assert one_shot == a1 + a2
    assert final1 == pytest.approx(final2)


def test_streaming_anomaly_detector_end_to_end(spark, tmp_path):
    """Two parquet files streamed as two micro-batches: the spike in the
    second file is only an anomaly if EWMA state survived batch one."""
    import pandas as pd

    src = str(tmp_path / "plc_src")
    batch1 = [("M1", "temperature", 50.0 + (i % 5) * 0.1, float(i)) for i in range(40)]
    cols = "machine_id string, sensor string, reading double, t_stamp double"
    spark.createDataFrame(batch1, cols).coalesce(1).write.mode("overwrite").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        ST.detect_anomalies(stream)
        .writeStream.format("memory")
        .queryName("anomalies_mem")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM anomalies_mem").count() == 0
        batch2 = [("M1", "temperature", 50.2, 40.0), ("M1", "temperature", 95.0, 41.0)]
        spark.createDataFrame(batch2, cols).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM anomalies_mem").collect()
        assert len(rows) == 1
        r = rows[0]
        assert r.reading == 95.0 and r.machine_id == "M1"
        assert r.n_seen == 42  # proves state counted batch-1 rows too
    finally:
        q.stop()


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas needs protobuf (absent in this env)",
)
def test_transform_with_state_matches_apply_in_pandas_with_state(spark, tmp_path):
    """The Spark 4 StatefulProcessor implementation emits the identical
    anomaly set as the applyInPandasWithState implementation across the
    same two micro-batches (state continuity through the new API)."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    src = str(tmp_path / "plc_src_tws")
    batch1 = [("M1", "temperature", 50.0 + (i % 5) * 0.1, float(i)) for i in range(40)]
    cols = "machine_id string, sensor string, reading double, t_stamp double"
    spark.createDataFrame(batch1, cols).coalesce(1).write.mode("overwrite").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        ST.detect_anomalies_tws(stream)
        .writeStream.format("memory")
        .queryName("anomalies_tws_mem")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.sql("SELECT * FROM anomalies_tws_mem").count() == 0
        batch2 = [("M1", "temperature", 50.2, 40.0), ("M1", "temperature", 95.0, 41.0)]
        spark.createDataFrame(batch2, cols).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM anomalies_tws_mem").collect()
        assert len(rows) == 1
        r = rows[0]
        assert r.reading == 95.0 and r.machine_id == "M1"
        assert r.n_seen == 42
    finally:
        q.stop()


def test_transform_with_state_fails_fast_without_protobuf(spark):
    """Without protobuf the new-API wrapper raises a clear, actionable
    error instead of a deep streaming crash."""
    if _has_protobuf():
        pytest.skip("protobuf present; fail-fast path not reachable")
    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .selectExpr(
            "'M1' AS machine_id", "'t' AS sensor",
            "CAST(value AS DOUBLE) AS reading",
            "CAST(value AS DOUBLE) AS t_stamp",
        )
    )
    with pytest.raises(RuntimeError, match="protobuf"):
        ST.detect_anomalies_tws(stream)


def test_batch_ewma_twin_matches_pure_step_function(spark):
    """The oracle-checked ts_ewma batch query must reproduce, bit-exactly,
    the final EWMA the streaming step function (ewma_step) reaches after
    consuming each user's events in event order — tying the DuckDB-
    verified batch twin to the stateful streaming operator's math."""
    from plc_data_etl_pipeline_spark.catalog import load
    from plc_data_etl_pipeline_spark.registry import all_queries

    from .conftest import SF_DIR

    got = {
        r["user_id"]: (r["n_events"], r["ewma_final"])
        for r in all_queries()["ts_ewma"].fn(spark, SF_DIR).collect()
    }
    rows = (
        load(spark, SF_DIR, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    by_user: dict = {}
    by_user_n: dict = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        # same recursion as ewma_step: ewma += alpha * (x - ewma)
        if r["user_id"] not in by_user:
            by_user[r["user_id"]] = r["value"]
            by_user_n[r["user_id"]] = 1
        else:
            prev = by_user[r["user_id"]]
            by_user[r["user_id"]] = prev + ST.ALPHA * (r["value"] - prev)
            by_user_n[r["user_id"]] += 1
    assert set(got) == set(by_user)
    for uid, ewma in by_user.items():
        n, final = got[uid]
        assert n == by_user_n[uid]
        assert final == ewma, f"user {uid}: {final} != {ewma}"


def test_funnel_step_pure_math():
    """State transitions: ordered progression, at-or-after thresholds,
    no skipping, state resumes across calls."""
    from plc_data_etl_pipeline_spark.streaming.funnel import funnel_step

    # click before any view does not advance; view then click does.
    out, st = funnel_step([("click", 5), ("view", 10), ("click", 12)], None)
    assert out == [(1, 10), (2, 12)] and st == (2, 12)
    # resume: purchase before t_stage is ignored, at t_stage counts.
    out2, st2 = funnel_step([("purchase", 11)], st)
    assert out2 == [] and st2 == (2, 12)
    out3, st3 = funnel_step([("purchase", 12)], st2)
    assert out3 == [(3, 12)] and st3 == (3, 12)
    # completed funnel absorbs further events.
    out4, st4 = funnel_step([("view", 99), ("purchase", 99)], st3)
    assert out4 == [] and st4 == (3, 12)


def test_streaming_funnel_matches_batch_counts(spark, tmp_path):
    """Stream the month in three time-ordered slices; the max stage per
    user from the transition log must reproduce event_funnel's batch
    counts (state carries stage progress across micro-batches)."""
    from plc_data_etl_pipeline_spark.catalog import load
    from plc_data_etl_pipeline_spark.registry import all_queries
    from plc_data_etl_pipeline_spark.streaming.funnel import track_funnel

    from .conftest import SF_DIR

    events = load(spark, SF_DIR, "events").select("user_id", "event_type", "ts")
    src = str(tmp_path / "src")
    slices = [
        events.filter("CAST(ts AS DATE) < DATE'2024-01-11'"),
        events.filter(
            "CAST(ts AS DATE) >= DATE'2024-01-11' AND CAST(ts AS DATE) < DATE'2024-01-21'"
        ),
        events.filter("CAST(ts AS DATE) >= DATE'2024-01-21'"),
    ]
    slices[0].coalesce(1).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        track_funnel(stream)
        .writeStream.format("memory")
        .queryName("funnel_mem")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        for sl in slices[1:]:
            sl.coalesce(1).write.mode("append").parquet(src)
            q.processAllAvailable()
        per_user = spark.sql(
            "SELECT user_id, MAX(stage) AS stage FROM funnel_mem GROUP BY user_id"
        ).collect()
    finally:
        q.stop()

    reached = [0, 0, 0]
    for r in per_user:
        for s in range(r["stage"]):
            reached[s] += 1
    batch = all_queries()["event_funnel"].fn(spark, SF_DIR).collect()[0]
    assert reached[0] == batch["n_view"]
    assert reached[1] == batch["n_click"]
    assert reached[2] == batch["n_purchase"]


def test_holt_step_state_carries_across_calls():
    """Splitting the sequence at ANY batch boundary must reach the same
    final state as the one-shot fold (exactly-once micro-batch replay)."""
    vals = [10.0, 12.0, 11.0, 15.0, 13.0, 14.5, 12.25, 16.0]
    one = ST.holt_step(vals, None)
    for cut in range(len(vals) + 1):
        mid = ST.holt_step(vals[:cut], None)
        final = ST.holt_step(vals[cut:], mid)
        assert final == one, f"cut at {cut}: {final} != {one}"


def test_batch_holt_twin_matches_pure_step_function(spark):
    """The oracle-checked ts_holt_trend batch query must reproduce,
    bit-exactly, the final (level, trend) the streaming step function
    (holt_step) reaches after folding each user's ordered values —
    locking the streaming operator to the driver-checked batch twin."""
    from plc_data_etl_pipeline_spark.catalog import load
    from plc_data_etl_pipeline_spark.registry import all_queries

    from .conftest import SF_DIR

    batch = {
        r["user_id"]: (r["n_events"], r["level_final"], r["trend_final"])
        for r in all_queries()["ts_holt_trend"].fn(spark, SF_DIR).collect()
    }
    ev = load(spark, SF_DIR, "events")
    by_user: dict[int, list[float]] = {}
    for r in ev.select("user_id", "ts", "event_id", "value").orderBy(
        "user_id", "ts", "event_id"
    ).collect():
        by_user.setdefault(r.user_id, []).append(r.value)
    for uid, vals in by_user.items():
        if len(vals) < 2:
            assert uid not in batch
            continue
        _x1, level, trend, n = ST.holt_step(vals, None)
        assert batch[uid] == (n, level, trend), f"user {uid}"


def test_streaming_holt_forecast_end_to_end(spark, tmp_path):
    """Two parquet files streamed as two micro-batches: the final
    emitted forecast must equal the one-shot fold over the concatenated
    sequence — state survived the batch boundary."""
    import datetime as dt

    import pandas as pd  # noqa: F401

    src = str(tmp_path / "holt_src")
    cols = "user_id long, ts timestamp, event_id long, value double"
    t0 = dt.datetime(2024, 1, 1)

    def rows(i0, n):
        return [
            (7, t0 + dt.timedelta(seconds=i), i, 50.0 + (i % 7) * 1.25)
            for i in range(i0, i0 + n)
        ]

    spark.createDataFrame(rows(0, 5), cols).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        ST.holt_trend_stream(stream)
        .writeStream.format("memory")
        .queryName("holt_mem")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows(5, 4), cols).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
        got = (
            spark.sql("SELECT * FROM holt_mem ORDER BY n_seen DESC")
            .limit(1)
            .collect()[0]
        )
    finally:
        q.stop()
    vals = [v for (_u, _t, _e, v) in rows(0, 9)]
    _x1, level, trend, n = ST.holt_step(vals, None)
    assert got.n_seen == n == 9
    assert got.level == level and got.trend == trend
    assert got.forecast_3 == level + 3 * trend


class _FakeState:
    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)
        self.exists = True


def test_holt_group_fn_orders_across_chunks_and_drops_nans():
    """Review-finding regressions: (1) a group arriving as several
    Arrow chunks must fold in GLOBAL (ts, event_id) order, not
    per-chunk order; (2) NULL readings (NaN) must be dropped, not
    poison the state forever."""
    import math

    import pandas as pd

    vals = [10.0, 12.0, 11.0, 15.0, 13.0, 14.5]
    rows = [
        {"user_id": 7, "ts": i, "event_id": i, "value": v}
        for i, v in enumerate(vals)
    ]
    # interleave: chunk A gets even rows, chunk B odd rows (each chunk
    # is internally sorted — the old per-chunk sort would pass it
    # through unchanged and fold A then B, out of order)
    chunks = [pd.DataFrame(rows[0::2]), pd.DataFrame(rows[1::2])]
    state = _FakeState()
    out = list(ST._holt((7,), iter(chunks), state))
    assert state._v == ST.holt_step(vals, None)
    assert len(out) == 1 and out[0]["n_seen"].iloc[0] == 6

    # NaN must be skipped: same final state as the NaN-free sequence,
    # and nothing downstream sees a poisoned level/trend
    rows_nan = rows[:3] + [
        {"user_id": 7, "ts": 2.5, "event_id": 99, "value": float("nan")}
    ] + rows[3:]
    state2 = _FakeState()
    list(ST._holt((7,), iter([pd.DataFrame(rows_nan)]), state2))
    assert state2._v == ST.holt_step(vals, None)
    assert not any(math.isnan(x) for x in state2._v[:3])


def _batch_cusum_calibration(rows):
    """Re-derive the batch query's self-calibration in plain Python.
    Spark's DIV truncates toward zero while Python // floors, so mu —
    whose numerator CAN be negative on negative-reading series — uses
    explicit truncating division; the other divisions are over
    non-negative operands where the two agree."""
    cents = [c for (_t, _e, c) in rows]
    n = len(cents)
    s_ = sum(cents)
    mu = s_ // n if s_ >= 0 else -((-s_) // n)
    devs = [c - mu for c in cents]
    m = max(sum(abs(d) for d in devs) // n, 1)
    return mu, m // 2, 20 * m, devs


def test_cusum_closed_form_equals_recurrence(spark):
    """The batch query computes Page's statistic through its
    prefix-sum/prefix-min closed form; the pure recurrence must land on
    the identical alarm census per key — this PROVES the window rewrite
    against the textbook definition, independent of the DuckDB oracle
    (which mirrors the same closed form)."""
    import math

    from plc_data_etl_pipeline_spark.registry import all_queries

    from .conftest import SF_DIR

    batch = {
        r["event_type"]: r
        for r in all_queries()["ts_changepoint_cusum"]
        .fn(spark, SF_DIR)
        .collect()
    }
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .where("value IS NOT NULL")
        .select("event_type", "ts", "event_id", "value")
        .collect()
    )
    series: dict = {}
    for r in ev:
        series.setdefault(r["event_type"], []).append(
            (r["ts"], r["event_id"], int(math.floor(r["value"] * 100 + 0.5)))
        )
    assert set(series) == set(batch)
    for etype, rows in series.items():
        rows.sort(key=lambda r: (r[0], r[1]))
        _mu, k, h, devs = _batch_cusum_calibration(rows)
        s_up, s_dn, n, a_up, a_dn, m_up, m_dn = ST.cusum_step(
            devs, None, k, h
        )
        b = batch[etype]
        assert (n, a_up, a_dn, m_up, m_dn) == (
            b["n_points"],
            b["n_alarms_up"],
            b["n_alarms_dn"],
            b["max_s_up"],
            b["max_s_dn"],
        ), etype


def test_cusum_step_state_chaining():
    """Split-anywhere: folding a prefix then the suffix with the carried
    state equals one fold over the whole deviation sequence."""
    devs = [5, -40, 300, 2, -2, 500, -600, 0, 7, 90, -90, 12]
    one = ST.cusum_step(devs, None, 3, 100)
    for cut in range(len(devs) + 1):
        mid = ST.cusum_step(devs[:cut], None, 3, 100)
        final = ST.cusum_step(devs[cut:], mid, 3, 100)
        assert final == one, cut


def test_streaming_cusum_end_to_end(spark, tmp_path):
    """Two parquet micro-batches with a planted level shift in the
    second: the final emitted alarm census must equal the one-shot
    recurrence over the concatenated series — state survived the batch
    boundary, and the shift (not the calm prefix) raised the alarms."""
    import datetime as dt

    src = str(tmp_path / "cusum_src")
    cols = "event_type string, ts timestamp, event_id long, value double"
    t0 = dt.datetime(2024, 1, 1)

    def rows(i0, n, base):
        return [
            ("m1", t0 + dt.timedelta(seconds=i), i, base + (i % 3) * 0.5)
            for i in range(i0, i0 + n)
        ]

    calm, shifted = rows(0, 20, 10.0), rows(20, 20, 50.0)
    cal = {"m1": (1000, 25, 1000)}  # mu=10.00, k=0.25, h=10.00 in cents
    spark.createDataFrame(calm, cols).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        ST.cusum_stream(stream, cal)
        .writeStream.format("memory")
        .queryName("cusum_mem")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        calm_row = (
            spark.sql("SELECT * FROM cusum_mem ORDER BY n_seen DESC")
            .limit(1)
            .collect()[0]
        )
        assert calm_row.n_alarms_up == 0, "calm prefix must not alarm"
        spark.createDataFrame(shifted, cols).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()
        got = (
            spark.sql("SELECT * FROM cusum_mem ORDER BY n_seen DESC")
            .limit(1)
            .collect()[0]
        )
    finally:
        q.stop()
    import math

    devs = [
        int(math.floor(v * 100 + 0.5)) - 1000
        for (_m, _t, _e, v) in calm + shifted
    ]
    s_up, s_dn, n, a_up, a_dn, m_up, m_dn = ST.cusum_step(
        devs, None, 25, 1000
    )
    assert got.n_seen == n == 40
    assert (got.n_alarms_up, got.n_alarms_dn) == (a_up, a_dn)
    assert (got.max_s_up, got.max_s_dn) == (m_up, m_dn)
    assert got.n_alarms_up >= 15, "the planted shift must alarm"


# ---------------------------------------------------------------------------
# Misra-Gries streaming heavy hitters
# ---------------------------------------------------------------------------


def test_mg_step_classic_guarantees():
    """Misra-Gries contract on a planted stream: every item above n/k
    survives; counters never overestimate and underestimate by at most
    n/k. Adversarial mix: one heavy item (35%), one at the boundary,
    long tail of singletons."""
    import collections

    stream = []
    for i in range(1000):
        stream.append(7)          # 1000x: heavy
        stream.append(100 + i)    # 1000 singletons
    stream += [9] * 400           # mid item
    n = len(stream)
    k = ST.MG_K
    counters = ST.mg_step(stream, None)
    true = collections.Counter(stream)
    for item, c in counters.items():
        assert c <= true[item], "MG must never overestimate"
        assert true[item] - c <= n / k, "underestimate bound violated"
    for item, t in true.items():
        if t > n / k:
            assert item in counters, f"heavy item {item} evicted"
    assert 7 in counters and 9 in counters


def test_mg_step_chunk_invariant():
    """Split-anywhere: folding any prefix then the suffix with carried
    state equals the one-shot fold — the property that lets micro-
    batches resume from GroupState."""
    import random

    rng = random.Random(6)
    stream = [rng.randrange(12) for _ in range(300)]
    one = ST.mg_step(stream, None)
    for cut in (0, 1, 7, 150, 299, 300):
        mid = ST.mg_step(stream[:cut], None)
        assert ST.mg_step(stream[cut:], mid) == one, cut


def test_batch_mg_query_matches_pure_fold(spark):
    """The registered stream_heavy_hitters batch form equals the pure
    mg_step fold over each event type's (ts, event_id)-ordered users,
    and every emitted row honors the guarantees vs exact counts."""
    import collections

    from plc_data_etl_pipeline_spark.catalog import load
    from plc_data_etl_pipeline_spark.registry import all_queries

    from .conftest import SF_DIR

    got = collections.defaultdict(dict)
    for r in all_queries()["stream_heavy_hitters"].fn(spark, SF_DIR).collect():
        got[r["event_type"]][r["user_id"]] = r["est_count"]

    ev = load(spark, SF_DIR, "events").select(
        "event_type", "ts", "event_id", "user_id"
    ).collect()
    by_type = collections.defaultdict(list)
    for r in ev:
        by_type[r["event_type"]].append((r["ts"], r["event_id"], r["user_id"]))
    for etype, rows in by_type.items():
        rows.sort(key=ST._null_ts_first_key)
        want = ST.mg_step((u for (_t, _e, u) in rows), None)
        assert got[etype] == want, etype
        true = collections.Counter(u for (_t, _e, u) in rows)
        n = len(rows)
        for item, c in want.items():
            assert c <= true[item] and true[item] - c <= n / ST.MG_K


def test_streaming_mg_end_to_end(spark, tmp_path):
    """Three event-time-ordered parquet micro-batches through
    heavy_hitters_stream: the FINAL emitted state per key must equal
    the one-shot fold over the concatenated ordered stream — GroupState
    carried the counters across batch boundaries."""
    import datetime as dt

    src = str(tmp_path / "mg_src")
    cols = "event_type string, ts timestamp, event_id long, user_id long"
    t0 = dt.datetime(2024, 1, 1)
    eid = 0
    batches = []
    for b in range(3):
        rows = []
        for i in range(120):
            # user 5 heavy (every other event), rotating tail
            u = 5 if i % 2 == 0 else 100 * b + i
            rows.append(("m", t0 + dt.timedelta(seconds=eid), eid, u))
            eid += 1
        batches.append(rows)
    for b, rows in enumerate(batches):
        spark.createDataFrame(rows, cols).coalesce(1).write.parquet(
            f"{src}/b{b}"
        )
    stream = (
        spark.readStream.schema(cols)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*")
    )
    q = (
        ST.heavy_hitters_stream(stream)
        .writeStream.format("memory")
        .queryName("mg_mem")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    final = {}
    for r in spark.sql(
        "SELECT * FROM mg_mem ORDER BY n_processed"
    ).collect():
        if r["n_processed"] == 360:  # rows from the final state emission
            final[r["user_id"]] = r["est_count"]
    allrows = [u for rows in batches for (_m, _t, _e, u) in rows]
    want = ST.mg_step(allrows, None)
    assert final == want
    assert 5 in final  # the planted heavy user survived


def test_streaming_mg_skips_null_user_ids(spark, tmp_path):
    """ADVICE r6: a single NULL user_id used to make the pandas column
    float64 with NaN, and int(nan) crashed the streaming query. NULLs
    are skipped (they identify nobody) and n counts only FOLDED items,
    in both the streaming operator and the batch twin's fold."""
    import datetime as dt

    src = str(tmp_path / "mg_null_src")
    cols = "event_type string, ts timestamp, event_id long, user_id long"
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(60):
        u = None if i % 5 == 0 else (7 if i % 2 == 0 else i)
        rows.append(("m", t0 + dt.timedelta(seconds=i), i, u))
    spark.createDataFrame(rows, cols).coalesce(1).write.parquet(f"{src}/b0")
    stream = spark.readStream.schema(cols).parquet(f"{src}/b*")
    q = (
        ST.heavy_hitters_stream(stream)
        .writeStream.format("memory")
        .queryName("mg_null_mem")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql("SELECT * FROM mg_null_mem").collect()
    assert out, "query must survive NULL user_ids and emit state"
    non_null = [u for (_m, _t, _e, u) in rows if u is not None]
    want = ST.mg_step(non_null, None)
    got = {r["user_id"]: r["est_count"] for r in out}
    assert got == want
    assert all(r["n_processed"] == len(non_null) for r in out)

    # batch twin: the REGISTERED query over a synthetic events table
    # with the same rows — identical fold, identical NULL handling
    from plc_data_etl_pipeline_spark.registry import all_queries

    sf_dir = str(tmp_path / "sf_null")
    spark.createDataFrame(rows, cols).coalesce(1).write.parquet(
        f"{sf_dir}/events.parquet"
    )
    out2 = all_queries()["stream_heavy_hitters"].fn(spark, sf_dir).collect()
    assert {r["user_id"]: r["est_count"] for r in out2} == want
    assert all(r["n_processed"] == len(non_null) for r in out2)


def test_mg_and_cusum_under_processing_time_trigger(spark, tmp_path):
    """Round-6 verdict item 3: the stateful operators' guarantees under
    a REAL periodic trigger (processingTime), not just the default
    run-once trigger — batch slicing is now wall-clock-dependent (files
    may coalesce into one trigger or split across several), so this
    leans on the chunk-invariance property: the FINAL state must equal
    the one-shot fold regardless of how the trigger sliced the feed."""
    import datetime as dt
    import math

    t0 = dt.datetime(2024, 1, 1)

    # --- Misra-Gries under processingTime trigger
    src = str(tmp_path / "mg_pt_src")
    cols = "event_type string, ts timestamp, event_id long, user_id long"
    all_users = []
    for b in range(3):
        rows = []
        for i in range(80):
            u = 7 if i % 2 == 0 else 1000 * b + i
            eid = b * 80 + i
            rows.append(("m", t0 + dt.timedelta(seconds=eid), eid, u))
            all_users.append(u)
        spark.createDataFrame(rows, cols).coalesce(1).write.parquet(
            f"{src}/b{b}"
        )
    stream = spark.readStream.schema(cols).parquet(f"{src}/b*")
    q = (
        ST.heavy_hitters_stream(stream)
        .writeStream.format("memory")
        .queryName("mg_pt_mem")
        .outputMode("update")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    final = {}
    for r in spark.sql("SELECT * FROM mg_pt_mem ORDER BY n_processed").collect():
        if r["n_processed"] == len(all_users):
            final[r["user_id"]] = r["est_count"]
    assert final == ST.mg_step(all_users, None)
    assert 7 in final

    # --- CUSUM under processingTime trigger
    csrc = str(tmp_path / "cusum_pt_src")
    ccols = "event_type string, ts timestamp, event_id long, value double"
    calm = [("m1", t0 + dt.timedelta(seconds=i), i, 10.0 + (i % 3) * 0.5)
            for i in range(20)]
    shifted = [("m1", t0 + dt.timedelta(seconds=i), i, 50.0 + (i % 3) * 0.5)
               for i in range(20, 40)]
    cal = {"m1": (1000, 25, 1000)}
    spark.createDataFrame(calm, ccols).coalesce(1).write.parquet(f"{csrc}/b0")
    spark.createDataFrame(shifted, ccols).coalesce(1).write.parquet(f"{csrc}/b1")
    cstream = spark.readStream.schema(ccols).parquet(f"{csrc}/b*")
    cq = (
        ST.cusum_stream(cstream, cal)
        .writeStream.format("memory")
        .queryName("cusum_pt_mem")
        .outputMode("update")
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    try:
        cq.processAllAvailable()
    finally:
        cq.stop()
    got = (
        spark.sql("SELECT * FROM cusum_pt_mem ORDER BY n_seen DESC")
        .limit(1)
        .collect()[0]
    )
    devs = [int(math.floor(v * 100 + 0.5)) - 1000
            for (_m, _t, _e, v) in calm + shifted]
    s_up, s_dn, n, a_up, a_dn, m_up, m_dn = ST.cusum_step(devs, None, 25, 1000)
    assert got.n_seen == n == 40
    assert (got.n_alarms_up, got.n_alarms_dn) == (a_up, a_dn)
    assert (got.max_s_up, got.max_s_dn) == (m_up, m_dn)


def test_qk_step_chunk_invariant_and_set_semantics():
    """The bottom-k sample is a pure function of the row SET: any split
    of the stream folds to the identical sample, and re-delivering an
    event_id (at-least-once replay) cannot duplicate it."""
    import random

    rng = random.Random(7)
    stream = [(eid, rng.uniform(0, 100)) for eid in rng.sample(range(10000), 800)]
    one = ST.qk_step(stream, None, k=64)
    assert len(one) == 64
    for cut in (0, 1, 100, 799, 800):
        mid = ST.qk_step(stream[:cut], None, k=64)
        assert ST.qk_step(stream[cut:], mid, k=64) == one, cut
    # replay a prefix: no change (set semantics)
    assert ST.qk_step(stream[:50], one, k=64) == one
    # priorities match the engine-portable hash
    for (p, e, _v) in one[:5]:
        assert p == ST.qk_prio(e)


def test_streaming_quantile_bottomk_matches_batch_twin(spark, tmp_path):
    """Three micro-batches through quantile_bottomk_stream: the FINAL
    emission per event type must equal the oracle-checked batch twin
    (stream_quantile_bottomk) over the concatenated rows EXACTLY — the
    deterministic sample makes a streaming APPROXIMATE operator
    value-reconcilable with its batch form, which no order-dependent
    sketch (EWMA, Misra-Gries) can claim. NULL event_id/value rows are
    skipped identically on both sides."""
    import datetime as dt
    import random

    from plc_data_etl_pipeline_spark.registry import all_queries

    rng = random.Random(11)
    t0 = dt.datetime(2024, 1, 1)
    src = str(tmp_path / "qk_src")
    cols = ("event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string")
    all_rows = []
    eid = 0
    for b in range(3):
        rows = []
        for _ in range(300):
            typ = rng.choice(["click", "error"])
            val = None if rng.random() < 0.05 else rng.uniform(0, 500)
            rows.append((eid, t0 + dt.timedelta(seconds=eid), 1, typ,
                         val, None))
            eid += 1
        rows.append((None, t0, 1, "click", 1.0, None))  # NULL event_id
        all_rows += rows
        spark.createDataFrame(rows, cols).coalesce(1).write.parquet(
            f"{src}/b{b}"
        )
    stream = (
        spark.readStream.schema(cols)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/b*")
    )
    q = (
        ST.quantile_bottomk_stream(stream)
        .writeStream.format("memory")
        .queryName("qk_mem")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    final = {}
    for r in spark.sql("SELECT * FROM qk_mem ORDER BY n_seen").collect():
        final[r["event_type"]] = (r["n_sample"], r["p50"], r["p90"], r["p99"])
    # batch twin over the identical rows via a synthetic sf_dir
    sf_dir = str(tmp_path / "sf_qk")
    spark.createDataFrame(all_rows, cols).coalesce(1).write.parquet(
        f"{sf_dir}/events.parquet"
    )
    batch = {
        r["event_type"]: (r["n_sample"], r["p50"], r["p90"], r["p99"])
        for r in all_queries()["stream_quantile_bottomk"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert final == batch
    # sanity: a 256-sample p50 of U(0,500) lands near 250
    assert 150 < final["click"][1] < 350


def test_ewma_and_funnel_survive_null_inputs(spark, tmp_path):
    """Round-7 hardening sweep: a NULL reading must not poison the EWMA
    state (a NaN folds into ewma forever -> detector permanently
    silent), and a NULL ts must not crash the funnel's NaT->int64
    conversion. Both operators drop the undefined rows and keep
    working."""
    import pandas as pd

    # EWMA: calm -> NULL -> spike; spike must still alarm
    src = str(tmp_path / "null_plc")
    cols = "machine_id string, sensor string, reading double, t_stamp double"
    calm = [("M1", "t", 50.0 + (i % 5) * 0.1, float(i)) for i in range(40)]
    nulls = [("M1", "t", None, 40.0), ("M1", "t", 50.1, None)]
    spike = [("M1", "t", 95.0, 41.0)]
    spark.createDataFrame(calm + nulls + spike, cols).coalesce(1).write.parquet(src)
    stream = (spark.readStream.schema(cols)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (ST.detect_anomalies(stream).writeStream.format("memory")
         .queryName("null_ewma_mem").outputMode("append").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM null_ewma_mem").collect()
    assert len(rows) == 1 and rows[0].reading == 95.0
    assert rows[0].n_seen == 41  # 40 calm + spike; the 2 NULL rows skipped

    # funnel: a NULL-ts event among valid ones must not crash the fold
    from plc_data_etl_pipeline_spark.streaming.funnel import track_funnel

    fsrc = str(tmp_path / "null_funnel")
    fcols = ("event_id long, ts timestamp, user_id long, "
             "event_type string, value double, props string")
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    frows = [
        (1, t0, 7, "view", 1.0, None),
        (2, None, 7, "click", 1.0, None),            # NULL ts: dropped
        (3, t0 + dt.timedelta(minutes=1), 7, "click", 1.0, None),
        (4, t0 + dt.timedelta(minutes=2), 7, "purchase", 1.0, None),
    ]
    spark.createDataFrame(frows, fcols).coalesce(1).write.parquet(fsrc)
    fq = (track_funnel(
            spark.readStream.schema(fcols).parquet(fsrc))
          .writeStream.format("memory").queryName("null_funnel_mem")
          .outputMode("append").start())
    try:
        fq.processAllAvailable()
    finally:
        fq.stop()
    out = spark.sql("SELECT * FROM null_funnel_mem ORDER BY stage").collect()
    assert [r["stage"] for r in out] == [1, 2, 3]  # full funnel completed


def test_qk_step_duplicate_eids_min_merge_order_invariant():
    """Round-8 ADVICE: a duplicated event_id (at-least-once delivery with
    differing payloads, or genuinely non-unique ids) must merge
    DETERMINISTICALLY — the sample keeps the MIN value per id, so any
    arrival order and any chunking fold to the identical sample."""
    import random

    rng = random.Random(13)
    base = [(eid, float(eid)) for eid in range(100)]
    dups = [(7, 0.5), (7, 99.0), (42, 3.25), (42, 200.0), (42, 1.125)]
    stream = base + dups
    expected_vals = {eid: float(eid) for eid in range(100)}
    expected_vals[7] = 0.5
    expected_vals[42] = 1.125
    ref = ST.qk_step(stream, None, k=64)
    for trial in range(5):
        shuffled = stream[:]
        rng.shuffle(shuffled)
        cut = rng.randrange(len(shuffled) + 1)
        mid = ST.qk_step(shuffled[:cut], None, k=64)
        out = ST.qk_step(shuffled[cut:], mid, k=64)
        assert out == ref, f"trial {trial}: order/chunk-dependent sample"
    for (_p, eid, val) in ref:
        assert val == expected_vals[eid], (eid, val)
