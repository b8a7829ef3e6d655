"""Round-8 extreme-float sweep: the FULL oracled registry against
a fixture planting NaN, +/-Infinity, -0.0, 1e308, the smallest denormal,
and normal rows together.

At 100 TB a sensor stream WILL contain poisoned readings. The first run
of this sweep crashed TWENTY-SIX queries — one NaN/Inf/1e308 row killed
whole rollups with ANSI overflow in the exact-cents floor
(``floor(value*100+0.5)`` as BIGINT), the histogram/privacy bucket
floors, and the DECIMAL power-sum casts — and diverged two more;
extending the fixture with MID-RANGE magnitudes (1e12: inside the
cents domain, outside narrower envelopes) then exposed five
integer-product overflows (windowed squares, autocorrelation and
periodogram cross-products, micro-unit interpolation, the argmax
packing key) and one NULL-ordering tie flip. The contract that fixed
it, uniformly on BOTH engines:

- ``_conv.cents``/``sql_cents``/``quant``/``sql_quant``/``fbucket``:
  values outside the exact-cents domain (NaN, Inf, |x| > CENTS_CAP)
  map to NULL, so exact aggregates SKIP them instead of dying; paired
  counts (davg, moving averages, rollup denominators) count in-domain
  values so means stay means of what was summed.
- Power-sum and integer-product statistics (regression,
  skew/kurtosis, seasonal 3-sigma, rolling outliers, autocorrelation,
  periodogram, linear interpolation, the argmax packing key) share a
  documented exact-moment envelope (_conv.MOMENT_CAP: |value| <= 1e6
  keeps 4th powers inside DECIMAL(38)/HUGEINT and windowed products
  inside BIGINT): out-of-envelope rows are excluded as unrepresentable
  observations on both engines.
- Order statistics (percentiles, MAD outliers) evaluate in-domain
  readings only — a NaN has no meaningful rank or |v - median|.
- Histogram/privacy buckets send out-of-domain readings to the NULL
  bucket (their own flaggable equivalence class); deterministic mode
  tie-breaks order real buckets before the NULL bucket on both engines
  (asc_nulls_last vs DuckDB's NULLS LAST default).
"""

from __future__ import annotations

import datetime

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from .oracle_compare import compare

SPECIALS = [
    float("nan"), float("inf"), float("-inf"), -0.0, 0.0,
    1e308, -1e308, 5e-324, 1e-300, 123.456,
    1e12, -1e12, 12345678.9,
]


@pytest.fixture(scope="module")
def numerics_sf(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("numerics_sf")
    base = datetime.datetime(2024, 1, 10, 0, 0)
    m = datetime.timedelta(minutes=1)
    rows = []
    i = 0
    for day in range(3):
        for k, v in enumerate(SPECIALS):
            ts = base + datetime.timedelta(days=day) + k * m * 7
            rows.append((i, ts, 1 + (i % 4),
                         ("view", "click", "purchase", "error",
                          "signup")[i % 5], v, None))
            i += 1
    for k in range(40):  # normal filler so windows/sessions have shape
        rows.append((i, base + k * m * 3, 1 + (i % 4),
                     ("view", "click")[i % 2], float(k) * 1.5,
                     '{"k": 1}'))
        i += 1
    table = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([r[4] for r in rows], pa.float64()),
        "props": pa.array([r[5] for r in rows], pa.string()),
    })
    pq.write_table(table, f"{d}/events.parquet")
    # real copies of every OTHER table so multi-table queries join the
    # poisoned events instead of being skipped — the full-surface form
    # of the sweep (246 oracled queries green at pinning time)
    import shutil

    from plc_data_etl_pipeline_spark.catalog import TABLES

    from .conftest import SF_DIR

    for t in TABLES:
        if t != "events":
            shutil.copyfile(f"{SF_DIR}/{t}.parquet", f"{d}/{t}.parquet")
    return str(d)


def test_events_oracles_survive_extreme_floats(spark, numerics_sf):
    from plc_data_etl_pipeline_spark.registry import all_queries

    from plc_data_etl_pipeline_spark.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{numerics_sf}/{t}.parquet')"
        )
    bad, ran = [], 0
    try:
        for name, qd in all_queries().items():
            if qd.oracle is None:
                continue
            try:
                sdf = qd.fn(spark, numerics_sf)
                srows = [tuple(r) for r in sdf.collect()]
            except Exception as e:
                msg = str(e)
                if ("PATH_NOT_FOUND" in msg or "Parquet" in msg
                        or "FileNotFound" in msg):
                    continue  # needs tables beyond events
                bad.append(f"{name}: CRASH {type(e).__name__}: {msg[:140]}")
                continue
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
                bad.append(f"{name}: {problems[-1][:160]}")
    finally:
        con.close()
    assert ran >= 240, f"sweep shrank to {ran} queries — fixture drift?"
    assert not bad, "extreme-float divergence:\n" + "\n".join(bad)
