"""Planted-semantics tests for the statistical-profiling operators
added late in round 5 (ts_autocorr, dq_l_diversity,
text_collocations_lift): tiny hand-built fixtures where the correct
answer is known in closed form, independent of the DuckDB oracle
(which shares any misreading of the spec the engine might make)."""

from __future__ import annotations

import datetime
import os
import shutil

import pytest

from plc_data_etl_pipeline_spark.registry import all_queries
from .conftest import flatten_parquet_dir as _flatten

_DIR = "/tmp/plc_etl_planted_profiling"


@pytest.fixture(scope="module")
def planted_dir(spark):
    """events + documents tables with closed-form-checkable content."""
    shutil.rmtree(_DIR, ignore_errors=True)
    os.makedirs(_DIR)
    base = datetime.datetime(2024, 3, 1, 8, 0, 0)

    def ev(i, etype, user, value):
        return (i, base + datetime.timedelta(minutes=i), user, etype,
                value, None)

    rows = []
    # 'alt': 12,8,12,8,... x100 (even n => mean exactly 10.0).
    # Closed-form ACF with the full-series denominator:
    # r_k = (-1)^k * (n-k)/n  ->  r1=-0.99, r2=0.98, r3=-0.97.
    rows += [ev(i, "alt", 1, 12.0 if i % 2 == 0 else 8.0)
             for i in range(100)]
    # 'const': zero variance -> ACF undefined -> NULLs.
    rows += [ev(200 + i, "const", 2, 7.0) for i in range(10)]
    # 'short': n=3 < 4 -> NULLs by the min-length rule.
    rows += [ev(300 + i, "short", 3, float(i)) for i in range(3)]
    # 'click', one day, two value bins (50-unit buckets):
    #   bin 0 (value 10): 6 rows, ALL user 42      -> l=1 (exposed)
    #   bin 1 (value 60): 6 rows, users 1,2,3,4,1,2 -> l=4 (fine)
    rows += [ev(400 + i, "click", 42, 10.0) for i in range(6)]
    rows += [ev(500 + i, "click", [1, 2, 3, 4, 1, 2][i], 60.0)
             for i in range(6)]
    # 'diurnal': value = 10 + 4*cos(2*pi*h/24) at every hour, two days
    # -> amp_24h ~= 4, higher harmonics ~= 0, dominant k=1.
    # 'flat': same value every hour -> the quantized trig lattice sums
    # to EXACTLY zero by symmetry -> all amplitudes exactly 0.0.
    import math

    i = 600
    for day in (2, 3):
        for h in range(24):
            t = datetime.datetime(2024, 3, day, h, 5)
            rows.append((i, t, 9, "diurnal",
                         round(10 + 4 * math.cos(2 * math.pi * h / 24), 2),
                         None))
            rows.append((i + 1, t, 9, "flat", 7.0, None))
            i += 2
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{_DIR}/events.parquet")
    _flatten(f"{_DIR}/events.parquet")

    # Collocation corpus (pairs universe N=19):
    #   (a,b) x5  cl(a)=10 cr(b)=5  -> lift = 5*19/(10*5)  = 1.9
    #   (c,d) x5  cl(c)=5  cr(d)=10 -> lift = 5*19/(5*10)  = 1.9
    #   (a,d) x5  cl(a)=10 cr(d)=10 -> lift = 5*19/(10*10) = 0.95
    #   (d,a) x4  -> dropped by the min-count >= 5 cut
    docs = [(i, "a b", "en", "s", 3) for i in range(5)]
    docs += [(100 + i, "c d", "en", "s", 3) for i in range(5)]
    docs += [(200, "a d a d a d a d a d", "en", "s", 19)]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{_DIR}/documents.parquet"
    )
    _flatten(f"{_DIR}/documents.parquet")
    yield _DIR


def test_ts_autocorr_planted(spark, planted_dir):
    fn = all_queries()["ts_autocorr"].fn
    got = {
        r["event_type"]: (r["n_points"], r["r1"], r["r2"], r["r3"])
        for r in fn(spark, planted_dir).collect()
    }
    assert got["alt"] == (100, -0.99, 0.98, -0.97)
    assert got["const"] == (10, None, None, None)  # zero variance
    assert got["short"] == (3, None, None, None)   # n < 4


def test_dq_l_diversity_planted(spark, planted_dir):
    fn = all_queries()["dq_l_diversity"].fn
    row = next(
        r for r in fn(spark, planted_dir).collect()
        if r["event_type"] == "click"
    )
    assert (
        row["n_classes"], row["min_l"], row["n_low_diversity"],
        row["rows_exposed"], row["exposure_bps"],
    ) == (2, 1, 1, 6, 5000)


def test_ts_periodogram_planted(spark, planted_dir):
    fn = all_queries()["ts_periodogram"].fn
    got = {
        r["event_type"]: r for r in fn(spark, planted_dir).collect()
    }
    d = got["diurnal"]
    assert d["n_hours"] == 24
    assert abs(d["amp_24h"] - 4.0) < 0.01   # planted first harmonic
    assert d["amp_12h"] < 0.01 and d["amp_8h"] < 0.01
    assert d["dominant_k"] == 1
    f = got["flat"]
    # constant profile: the quantized lattice cancels EXACTLY
    assert (f["amp_24h"], f["amp_12h"], f["amp_8h"]) == (0.0, 0.0, 0.0)


def test_text_collocations_lift_planted(spark, planted_dir):
    fn = all_queries()["text_collocations_lift"].fn
    got = {
        (r["w1"], r["w2"]): (r["pair_n"], r["lift"])
        for r in fn(spark, planted_dir).collect()
    }
    assert got == {
        ("a", "b"): (5, 1.9),
        ("c", "d"): (5, 1.9),
        ("a", "d"): (5, 0.95),
    }


_PARETO_DIR = "/tmp/plc_etl_planted_pareto"


@pytest.fixture(scope="module")
def pareto_dir(spark):
    """documents table with a hand-built dominance structure:
    (len, diversity_ppm) = A(100, 1/2) B(90, 3/5) C(90, 1/2)
    D(100, 1/2) E(80, 3/5) F(120, 1/10). C is dominated by A
    (longer, equal diversity), E by B (longer, equal diversity);
    A and D tie on both objectives so BOTH survive (incomparable)."""
    shutil.rmtree(_PARETO_DIR, ignore_errors=True)
    os.makedirs(_PARETO_DIR)
    docs = [
        (1, "a a", "x", "s", 100),                  # div 500000 - frontier
        (2, "a b c a a", "x", "s", 90),             # div 600000 - frontier
        (3, "b b", "x", "s", 90),                   # dominated by A/D
        (4, "c c", "x", "s", 100),                  # tie with A - frontier
        (5, "d e f d d", "x", "s", 80),             # dominated by B
        (6, "a a a a a a a a a a", "x", "s", 120),  # div 100000 - frontier
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{_PARETO_DIR}/documents.parquet"
    )
    _flatten(f"{_PARETO_DIR}/documents.parquet")
    yield _PARETO_DIR


def test_curation_pareto_frontier_planted(spark, pareto_dir):
    fn = all_queries()["curation_pareto_frontier"].fn
    got = {r["doc_id"]: (r["len_score"], r["diversity_ppm"])
           for r in fn(spark, pareto_dir).collect()}
    assert got == {
        1: (100, 500000),
        2: (90, 600000),
        4: (100, 500000),
        6: (120, 100000),
    }


_CMS_DIR = "/tmp/plc_etl_planted_cms"


@pytest.fixture(scope="module")
def cms_dir(spark):
    """events table with 50k distinct users — far above the sketch's
    2000-counter row width (Spark allocates depth 7 x width 2/eps at
    eps=0.001), forcing real collisions — plus one planted heavy user
    (id 7, 500 extra rows) that must surface exactly."""
    shutil.rmtree(_CMS_DIR, ignore_errors=True)
    os.makedirs(_CMS_DIR)
    from pyspark.sql import functions as F

    base = spark.range(60000).select(
        F.col("id").alias("event_id"),
        F.lit("2024-03-01 08:00:00").cast("timestamp").alias("ts"),
        (F.col("id") % 50021).alias("user_id"),
        F.lit("click").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit(None).cast("string").alias("props"),
    )
    heavy = spark.range(60000, 60500).select(
        F.col("id").alias("event_id"),
        F.lit("2024-03-01 08:00:00").cast("timestamp").alias("ts"),
        F.lit(7).cast("long").alias("user_id"),
        F.lit("view").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit(None).cast("string").alias("props"),
    )
    base.unionByName(heavy).coalesce(1).write.mode("overwrite").parquet(
        f"{_CMS_DIR}/events.parquet"
    )
    _flatten(f"{_CMS_DIR}/events.parquet")
    yield _CMS_DIR


def test_count_min_sketch_contract(spark, cms_dir):
    """The CMS contract on a collision-forcing corpus: every estimate
    is one-sided (est >= exact) and within eps*N of exact; the planted
    heavy hitter ranks first with its exact count recovered."""
    fn = all_queries()["agg_count_min_sketch"].fn
    rows = fn(spark, cms_dir).collect()
    assert rows[0]["user_id"] == 7 and rows[0]["exact_n"] == 502
    n_total = 60500
    for r in rows:
        assert r["est_n"] >= r["exact_n"], "CMS must never underestimate"
        assert r["est_n"] - r["exact_n"] <= 0.001 * n_total, (
            f"estimate error beyond eps*N for user {r['user_id']}"
        )
