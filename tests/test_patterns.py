"""Planted-semantics tests for the sequence/changepoint/LM-score
operators added in round 5: tiny hand-built fixtures where the correct
answer is known by construction, independent of the DuckDB oracle
(which shares any misreading of the spec the engine might make)."""

from __future__ import annotations

import datetime
import os
import shutil

import pytest

from plc_data_etl_pipeline_spark.registry import all_queries
from .conftest import flatten_parquet_dir as _flatten

_DIR = "/tmp/plc_etl_planted_patterns"


@pytest.fixture(scope="module")
def planted_dir(spark):
    """events table with hand-scripted per-user timelines (single day);
    the other tables are irrelevant to these queries and not written."""
    shutil.rmtree(_DIR, ignore_errors=True)
    os.makedirs(_DIR)
    base = datetime.datetime(2024, 3, 1, 8, 0, 0)

    def seq(user, codes, t0=0):
        names = {"v": "view", "c": "click", "p": "purchase",
                 "s": "signup", "e": "error"}
        return [
            (user * 1000 + i, base + datetime.timedelta(minutes=t0 + i),
             user, names[ch], 100.0, None)
            for i, ch in enumerate(codes)
        ]

    rows = []
    # user 1: evvcp -> ONE match 'evvcp' (error, browse, purchase)
    rows += seq(1, "evvcp")
    # user 2: epep  -> TWO non-overlapping matches 'ep','ep'
    rows += seq(2, "epep")
    # user 3: evcs  -> NO match (signup breaks the [vc]* run before p)
    rows += seq(3, "evcs")
    # user 4: vvcp  -> NO match (no error)
    rows += seq(4, "vvcp")
    # user 5: eep   -> ONE match 'ep' (second 'e' starts the match;
    #                  the first 'e' cannot reach p through [vc]*)
    rows += seq(5, "eep")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{_DIR}/events.parquet")
    _flatten(f"{_DIR}/events.parquet")
    yield _DIR


def test_event_pattern_match_planted(spark, planted_dir):
    fn = all_queries()["event_pattern_match"].fn
    got = {
        r["user_id"]: (r["n_matches"], r["max_match_len"], r["first_match"])
        for r in fn(spark, planted_dir).collect()
    }
    assert got == {
        1: (1, 5, "evvcp"),
        2: (2, 2, "ep"),
        5: (1, 2, "ep"),
    }  # users 3 and 4 emit no row


def test_event_pattern_match_order_not_arrival(spark, planted_dir):
    """Matching must follow EVENT TIME, not row order: reverse the
    arrival order of user 1's rows and the match is unchanged."""
    fn = all_queries()["event_pattern_match"].fn
    df = spark.read.parquet(f"{planted_dir}/events.parquet")
    shuf = "/tmp/plc_etl_planted_patterns_shuffled"
    shutil.rmtree(shuf, ignore_errors=True)
    os.makedirs(shuf)
    df.orderBy(df.ts.desc()).coalesce(1).write.mode("overwrite").parquet(
        f"{shuf}/events.parquet"
    )
    _flatten(f"{shuf}/events.parquet")
    got = {r["user_id"]: r["first_match"]
           for r in fn(spark, shuf).collect()}
    assert got[1] == "evvcp"


@pytest.fixture(scope="module")
def cusum_dir(spark):
    """Two planted series: 'steady' is constant 50.00 (never alarms —
    MAD floors at 1 cent, the statistic stays at 0); 'shifted' runs at
    ~50.00 for 200 points then jumps to ~80.00 — a textbook level
    shift a two-sided CUSUM anchored on the global mean must flag in
    BOTH directions (each regime deviates from the midpoint mean)."""
    d = "/tmp/plc_etl_planted_cusum"
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    base = datetime.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for i in range(400):
        ts = base + datetime.timedelta(minutes=i)
        rows.append((eid, ts, 1, "steady", 50.0, None))
        eid += 1
        # deterministic +/-0.25 jitter so MAD is small but nonzero
        jitter = 0.25 if i % 2 == 0 else -0.25
        level = 50.0 if i < 200 else 80.0
        rows.append((eid, ts, 2, "shifted", level + jitter, None))
        eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
    _flatten(f"{d}/events.parquet")
    yield d


def test_cusum_planted_level_shift(spark, cusum_dir):
    fn = all_queries()["ts_changepoint_cusum"].fn
    got = {r["event_type"]: r.asDict() for r in fn(spark, cusum_dir).collect()}
    steady, shifted = got["steady"], got["shifted"]
    # constant series: zero deviation everywhere, no alarms ever
    assert steady["n_alarms_up"] == 0 and steady["n_alarms_dn"] == 0
    assert steady["max_s_up"] == 0 and steady["max_s_dn"] == 0
    # Level shift: the detector is anchored at the GLOBAL series mean
    # (65 here — midway between the regimes), so BOTH halves deviate:
    # the pre-shift regime (50) drives the DOWN-side statistic, the
    # post-shift regime (80) the UP-side. A retrospective two-sided
    # CUSUM must flag both.
    assert shifted["n_alarms_up"] > 0
    assert shifted["n_alarms_dn"] > 0
    assert shifted["first_alarm"] is not None
    # the statistic must dwarf the threshold (20x MAD) in both
    # directions — this is a 2x-MAD-per-point sustained excursion
    assert shifted["max_s_up"] > 100 * 20  # h = 20 * mad, mad >= 1 cent
    assert shifted["max_s_dn"] > 100 * 20
