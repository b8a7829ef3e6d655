"""Planted exactly-at-the-boundary fixtures for every hand-written twin
of a Spark built-in (round-8, VERDICT item 2).

The round-7 session-window bug was a CLASS, not an instance: a
hand-written DuckDB oracle that reproduces a Spark operator's semantics
can silently disagree at a tie that the driver fixture never generates
(Spark's session_window merges events exactly ``gap`` apart; the oracle
split on ``>=``). Each test here plants a fixture where a value sits
EXACTLY on the operator's boundary — the tolerance edge, the window end,
the interval-touch point, the frame bound — then (a) runs the engine and
its declared oracle on the same parquet and asserts they agree, and
(b) asserts the EXPECTED behavior at the tie explicitly, so both sides
breaking the same way can't hide.

Empirical semantics pinned here (Spark 4.1, verified by execution):
  - session_window (static + dynamic gap): merge condition is INCLUSIVE —
    an event exactly gap after its predecessor (or exactly at the running
    window end) joins the SAME session.
  - window() tumbling/sliding: start inclusive, end EXCLUSIVE.
  - RANGE BETWEEN n PRECEDING: frame bound inclusive on both engines.
  - band/tolerance joins: the repo's contracts are <= (inclusive) edges.
  - interval-overlap join: strict < — touching intervals do NOT overlap.
"""

from __future__ import annotations

import datetime

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from .oracle_compare import compare

T0 = datetime.datetime(2024, 3, 1, 0, 0, 0)


def _ts(h=0, m=0, s=0, us=0, day=1):
    return datetime.datetime(2024, 3, day, h, m, s, us)


def _write_table(tmpdir, name, cols: dict, types: dict):
    table = pa.table(
        {c: pa.array(v, types[c]) for c, v in cols.items()}
    )
    pq.write_table(table, f"{tmpdir}/{name}.parquet")


def _events(tmpdir, rows):
    """rows: list of (event_id, ts, user_id, event_type, value)."""
    _write_table(
        tmpdir,
        "events",
        {
            "event_id": [r[0] for r in rows],
            "ts": [r[1] for r in rows],
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [r[4] for r in rows],
            "props": [None] * len(rows),
        },
        {
            "event_id": pa.int64(),
            "ts": pa.timestamp("us"),
            "user_id": pa.int64(),
            "event_type": pa.string(),
            "value": pa.float64(),
            "props": pa.string(),
        },
    )


def _orders(tmpdir, rows):
    """rows: list of (o_orderkey, o_custkey, o_orderdate)."""
    _write_table(
        tmpdir,
        "orders",
        {
            "o_orderkey": [r[0] for r in rows],
            "o_custkey": [r[1] for r in rows],
            "o_orderstatus": ["O"] * len(rows),
            "o_totalprice": [100.0] * len(rows),
            "o_orderdate": [r[2] for r in rows],
            "o_orderpriority": ["1-URGENT"] * len(rows),
        },
        {
            "o_orderkey": pa.int64(),
            "o_custkey": pa.int64(),
            "o_orderstatus": pa.string(),
            "o_totalprice": pa.float64(),
            "o_orderdate": pa.timestamp("us"),
            "o_orderpriority": pa.string(),
        },
    )


def _run_both(spark, sf_dir, name, tables=("events",)):
    """Run engine + declared oracle on the planted dir; assert they agree.

    Returns the engine rows (list of Row) for explicit planted asserts."""
    from plc_data_etl_pipeline_spark.registry import all_queries

    qd = all_queries()[name]
    sdf = qd.fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    try:
        for t in tables:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        rel = con.sql(qd.oracle)
        problems = compare(
            list(sdf.columns), srows,
            [d[0] for d in rel.description], rel.fetchall(),
        )
    finally:
        con.close()
    assert not problems, f"{name} engine/oracle diverge at boundary:\n" + \
        "\n".join(problems)
    return sdf.collect()


# ---------------------------------------------------------------------------
# 1. Static-gap session window: exactly-gap ties MERGE (inclusive).
# ---------------------------------------------------------------------------

def test_stream_session_exact_gap_merges(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bnd_sess")
    _events(tmp, [
        # user 1: exactly 10:00.000000 apart -> ONE session (inclusive merge)
        (0, _ts(0, 0), 1, "view", 1.0),
        (1, _ts(0, 10), 1, "view", 2.0),
        # user 2: one microsecond beyond the gap -> TWO sessions
        (2, _ts(0, 0), 2, "view", 1.0),
        (3, _ts(0, 10, 0, 1), 2, "view", 2.0),
    ])
    rows = _run_both(spark, str(tmp), "stream_session")
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[1]) == 1 and by_user[1][0]["n_events"] == 2
    assert len(by_user[2]) == 2


# ---------------------------------------------------------------------------
# 2. Dynamic-gap session window: event exactly at the running window end
#    MERGES (inclusive), one microsecond past it splits.
# ---------------------------------------------------------------------------

def test_stream_session_dynamic_exact_end_merges(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bnd_dsess")
    _events(tmp, [
        # user 1: purchase holds 20 min; view exactly at 00:20 -> merged
        (0, _ts(0, 0), 1, "purchase", 1.0),
        (1, _ts(0, 20), 1, "view", 2.0),
        # user 2: purchase + view at 00:20.000001 -> split
        (2, _ts(0, 0), 2, "purchase", 1.0),
        (3, _ts(0, 20, 0, 1), 2, "view", 2.0),
        # user 3: 10-min default gap, exactly at 00:10 -> merged
        (4, _ts(0, 0), 3, "view", 1.0),
        (5, _ts(0, 10), 3, "click", 2.0),
        # NULL-ts rows: dropped identically on both sides (r8 hardening)
        (6, None, 1, "view", 9.0),
        (7, None, 4, "click", 9.0),
    ])
    rows = _run_both(spark, str(tmp), "stream_session_dynamic")
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[1]) == 1 and by_user[1][0]["n_events"] == 2
    assert len(by_user[2]) == 2
    assert len(by_user[3]) == 1 and by_user[3][0]["n_events"] == 2


# ---------------------------------------------------------------------------
# 3. Batch gaps-and-islands sessionization: gap EXACTLY 30 min stays in
#    the same session (contract is strict >); +1us starts a new one.
# ---------------------------------------------------------------------------

def test_win_session_id_exact_gap_same_session(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bnd_sid")
    _events(tmp, [
        (0, _ts(0, 0), 1, "view", 1.0),
        (1, _ts(0, 30), 1, "view", 2.0),          # exactly 30 min
        (2, _ts(0, 0), 2, "view", 1.0),
        (3, _ts(0, 30, 0, 1), 2, "view", 2.0),    # 30 min + 1us
    ])
    rows = _run_both(spark, str(tmp), "win_session_id")
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert len(by_user[1]) == 1 and by_user[1][0]["n_events"] == 2
    assert len(by_user[2]) == 2


# ---------------------------------------------------------------------------
# 4. Tumbling windows: start inclusive, end EXCLUSIVE — an event exactly
#    at 01:00:00 lands in the 01:00 bucket, not the 00:00 one.
# ---------------------------------------------------------------------------

def test_stream_tumbling_window_end_exclusive(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bnd_tumb")
    _events(tmp, [
        (0, _ts(0, 59, 59, 999999), 1, "view", 1.0),
        (1, _ts(1, 0, 0, 0), 1, "view", 2.0),
    ])
    rows = _run_both(spark, str(tmp), "stream_tumbling")
    starts = sorted(r["window_start"] for r in rows)
    assert starts == ["2024-03-01 00:00:00", "2024-03-01 01:00:00"]
    assert all(r["n_events"] == 1 for r in rows)


# ---------------------------------------------------------------------------
# 5. Sliding windows (1h size / 30m slide): an event exactly at a slide
#    boundary starts a window (inclusive) and is excluded from the window
#    that ENDS there (exclusive) — it appears in exactly 2 windows.
# ---------------------------------------------------------------------------

def test_stream_sliding_boundary_membership(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bnd_slide")
    _events(tmp, [
        (0, _ts(1, 0, 0, 0), 1, "view", 1.0),  # exactly on the hour
    ])
    rows = _run_both(spark, str(tmp), "stream_sliding")
    starts = sorted(r["window_start"] for r in rows)
    # member of [00:30, 01:30) and [01:00, 02:00); NOT [00:00, 01:00)
    assert starts == ["2024-03-01 00:30:00", "2024-03-01 01:00:00"]


# ---------------------------------------------------------------------------
# 6. Band join: |dt| <= 60s is INCLUSIVE at exactly 60s; 60s + 1us is out.
#    Also exercises the band-bucket cell edge (cell width == band width).
# ---------------------------------------------------------------------------

def test_join_band_time_edge_inclusive(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bnd_band")
    _events(tmp, [
        (0, _ts(1, 0, 0), 1, "error", 1.0),
        (1, _ts(1, 1, 0), 2, "purchase", 2.0),          # exactly +60s: IN
        (2, _ts(1, 1, 0, 1), 3, "purchase", 3.0),       # +60s + 1us: OUT
        (3, _ts(0, 59, 0), 4, "purchase", 4.0),         # exactly -60s: IN
    ])
    rows = _run_both(spark, str(tmp), "join_band_time")
    pairs = sorted((r["err_id"], r["buy_id"], r["dt_us"]) for r in rows)
    assert pairs == [(0, 1, 60_000_000), (0, 3, -60_000_000)]


# ---------------------------------------------------------------------------
# 7. As-of join with tolerance: both edges inclusive — an order exactly AT
#    the event ts matches, an order exactly 90 days stale still matches,
#    one microsecond staler keeps NULLs.
# ---------------------------------------------------------------------------

def test_join_asof_tolerance_edges(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bnd_asof")
    t = datetime.datetime(2024, 5, 31, 12, 0)  # 90d back = 2024-03-02 12:00
    stale_edge = t - datetime.timedelta(days=90)
    _events(tmp, [
        (0, t, 1, "purchase", 1.0),   # order exactly at ts
        (1, t, 2, "purchase", 1.0),   # order exactly 90 days before
        (2, t, 3, "purchase", 1.0),   # order 90 days + 1us before -> NULL
    ])
    _orders(tmp, [
        (10, 1, t),
        (20, 2, stale_edge),
        (30, 3, stale_edge - datetime.timedelta(microseconds=1)),
    ])
    rows = _run_both(
        spark, str(tmp), "join_asof_tolerance", tables=("events", "orders")
    )
    got = {r["event_id"]: r["o_orderkey"] for r in rows}
    assert got == {0: 10, 1: 20, 2: None}


# ---------------------------------------------------------------------------
# 8. RANGE frame: 3600 PRECEDING is INCLUSIVE — an event exactly 3600s
#    earlier is in the frame; 3601s is out.
# ---------------------------------------------------------------------------

def test_win_range_interval_frame_edge(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bnd_range")
    _events(tmp, [
        (0, _ts(0, 0, 0), 1, "view", 1.0),
        (1, _ts(1, 0, 0), 1, "view", 2.0),   # exactly 3600s later
        (2, _ts(0, 0, 0), 2, "view", 1.0),
        (3, _ts(1, 0, 1), 2, "view", 2.0),   # 3601s later
    ])
    rows = _run_both(spark, str(tmp), "win_range_interval")
    n = {r["event_id"]: r["hour_n"] for r in rows}
    assert n[1] == 2, "event exactly 3600s back must be IN the RANGE frame"
    assert n[3] == 1, "event 3601s back must be OUT of the RANGE frame"


# ---------------------------------------------------------------------------
# 9. Interval-overlap join: strict < — an activity span that ends EXACTLY
#    when the error window starts does NOT overlap; 1s of overlap does.
# ---------------------------------------------------------------------------

def test_join_interval_overlap_touching_excluded(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bnd_ovl")
    _events(tmp, [
        # user 1's span: [08:00, 09:00] — touches the window start exactly
        (0, _ts(8, 0), 1, "view", 1.0),
        (1, _ts(9, 0), 1, "view", 1.0),
        # user 3's span: [08:00, 09:00:01] — overlaps by exactly 1s
        (2, _ts(8, 0), 3, "view", 1.0),
        (3, _ts(9, 0, 1), 3, "view", 1.0),
        # user 2 emits the critical error at 09:30 -> window [09:00, 10:00]
        (4, _ts(9, 30), 2, "error", 500.0),
    ])
    rows = _run_both(spark, str(tmp), "join_interval_overlap")
    got = {r["user_id"]: (r["n_error_windows"], r["overlap_sec_total"])
           for r in rows}
    assert 1 not in got, "touching intervals must NOT count as overlap"
    assert got[3] == (1, 1.0)
    assert got[2] == (1, 0.0)  # degenerate span exactly inside the window


# ---------------------------------------------------------------------------
# 10. Funnel step ties: a click at EXACTLY the first view's ts counts
#     (>= semantics), a click strictly before does not.
# ---------------------------------------------------------------------------

def test_event_funnel_step_tie_inclusive(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bnd_funnel")
    t = _ts(10, 0)
    _events(tmp, [
        # user 1: view, click, purchase all at the SAME instant -> full funnel
        (0, t, 1, "view", 1.0),
        (1, t, 1, "click", 1.0),
        (2, t, 1, "purchase", 1.0),
        # user 2: click strictly BEFORE the first view -> no click step
        (3, t, 2, "click", 1.0),
        (4, _ts(10, 0, 0, 1), 2, "view", 1.0),
    ])
    rows = _run_both(spark, str(tmp), "event_funnel")
    r = rows[0]
    assert (r["n_view"], r["n_click"], r["n_purchase"]) == (2, 1, 1)


# ---------------------------------------------------------------------------
# 11. Stream-stream interval join: a purchase exactly 10 minutes after the
#     error is IN (<= inclusive); +1us is OUT; exactly AT the error is IN
#     (>= inclusive).
# ---------------------------------------------------------------------------

def test_stream_join_interval_bounds_inclusive(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bnd_sji")
    _events(tmp, [
        (0, _ts(2, 0, 0), 1, "error", 1.0),
        (1, _ts(2, 10, 0), 1, "purchase", 2.0),        # exactly +10min: IN
        (2, _ts(2, 10, 0, 1), 1, "purchase", 3.0),     # +10min + 1us: OUT
        (3, _ts(2, 0, 0), 1, "purchase", 4.0),         # exactly at ts: IN
    ])
    rows = _run_both(spark, str(tmp), "stream_join_interval")
    got = sorted(r["purchase_id"] for r in rows)
    assert got == [1, 3]


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-x", "-q"]))


# ---------------------------------------------------------------------------
# 12. Bottom-k quantile sample: duplicated event_ids merge
#     deterministically (MIN value), identically in engine and oracle.
# ---------------------------------------------------------------------------

def test_stream_quantile_bottomk_duplicate_eids(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bnd_qk")
    rows = [(i, _ts(0, i % 60), 1, "click", float(i)) for i in range(20)]
    # eid 5 re-delivered with a SMALLER and a LARGER value: the sample
    # must keep min(5.0, 1.0, 9.0) = 1.0 regardless of row order
    rows += [(5, _ts(1, 0), 1, "click", 9.0), (5, _ts(1, 1), 1, "click", 1.0)]
    _events(tmp, rows)
    out = _run_both(spark, str(tmp), "stream_quantile_bottomk")
    r = out[0]
    assert r["n_sample"] == 20  # 20 DISTINCT event_ids, not 22 rows
    # p50 over the deduped multiset {0..19 with 5->1.0}
    vals = sorted([float(i) for i in range(20) if i != 5] + [1.0])
    assert r["p50"] == vals[(19 * 50) // 100]


# ---------------------------------------------------------------------------
# 13. Weighted SSSP distance cap: a node whose shortest distance is
#     EXACTLY the cap (200) reports -1 on BOTH engines (the oracle's
#     recursive walk prunes at >= cap; the engine converges fully then
#     clamps) — the round-8 ADVICE divergence, pinned. The chain is
#     40 edges x weight 5, well under the 200-round bound, so only the
#     DISTANCE cap separates the two sides.
# ---------------------------------------------------------------------------

def test_graph_sssp_distance_cap_clamps_both_sides(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bnd_sssp")
    orders, lineitems = [], []
    okey = 0
    m = 20  # customers c_0..c_20, suppliers s_0..s_19: dist(c_j) = 10j

    def edge(cust, supp):
        nonlocal okey
        for _ in range(3):  # support 3 -> weight GREATEST(1, 8-3) = 5
            okey += 1
            orders.append((okey, cust))
            lineitems.append((okey, supp))

    for i in range(m):
        edge(i, i)        # c_i  -- s_i
        edge(i + 1, i)    # s_i  -- c_{i+1}
    _orders(tmp, [(k, c, datetime.datetime(2024, 1, 1)) for (k, c) in orders])
    _write_table(
        tmp,
        "lineitem",
        {
            "l_orderkey": [r[0] for r in lineitems],
            "l_partkey": [1] * len(lineitems),
            "l_suppkey": [r[1] for r in lineitems],
            "l_linenumber": [1] * len(lineitems),
            "l_quantity": [1.0] * len(lineitems),
            "l_extendedprice": [1.0] * len(lineitems),
            "l_discount": [0.0] * len(lineitems),
            "l_tax": [0.0] * len(lineitems),
            "l_returnflag": ["N"] * len(lineitems),
            "l_linestatus": ["O"] * len(lineitems),
            "l_shipdate": [datetime.datetime(2024, 1, 2)] * len(lineitems),
        },
        {
            "l_orderkey": pa.int64(),
            "l_partkey": pa.int64(),
            "l_suppkey": pa.int64(),
            "l_linenumber": pa.int32(),
            "l_quantity": pa.float64(),
            "l_extendedprice": pa.float64(),
            "l_discount": pa.float64(),
            "l_tax": pa.float64(),
            "l_returnflag": pa.string(),
            "l_linestatus": pa.string(),
            "l_shipdate": pa.timestamp("us"),
        },
    )
    rows = _run_both(
        spark, str(tmp), "graph_sssp_weighted", tables=("lineitem", "orders")
    )
    hist = {r["dist"]: r["n_nodes"] for r in rows}
    assert hist.get(-1) == 1, "c_20 at distance exactly 200 must clamp to -1"
    assert hist.get(195) == 1  # s_19, one edge short of the cap
    assert max(hist) < 200, "no reported distance may reach the cap"
