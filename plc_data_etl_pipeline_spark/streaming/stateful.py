"""Custom stateful streaming operator: per-key EWMA anomaly detection
via ``applyInPandasWithState``.

The reference pipeline has no per-key state at all (its only state is
the in-memory flush batch, consumer/sensor_data_consumer.py:22); this is
the operator a PLC monitoring pipeline actually wants: for each
(machine_id, sensor) group, maintain an exponentially-weighted moving
average + variance across micro-batches and flag readings that deviate
more than ``z_threshold`` standard deviations.

Scale design: state is keyed by (machine_id, sensor) — bounded by the
device fleet, not the event volume; each micro-batch touches only keys
present in that batch; state TTL (``GroupStateTimeout``) evicts dead
keys. The same function body runs in batch tests via direct invocation
on grouped pandas frames (the function is pure given (key, frames,
state)).
"""

from __future__ import annotations

import math
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("machine_id", StringType()),
        StructField("sensor", StringType()),
        StructField("reading", DoubleType()),
        StructField("t_stamp", DoubleType()),
        StructField("ewma", DoubleType()),
        StructField("zscore", DoubleType()),
        StructField("n_seen", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("ewma", DoubleType()),
        StructField("ewvar", DoubleType()),
        StructField("n", LongType()),
    ]
)

ALPHA = 0.2
Z_THRESHOLD = 3.0
WARMUP_N = 10  # no verdicts until the variance estimate has support


def ewma_step(
    readings: Iterable[tuple[float, float]],
    state: tuple[float, float, int] | None,
    alpha: float = ALPHA,
    z_threshold: float = Z_THRESHOLD,
    warmup_n: int = WARMUP_N,
) -> tuple[list[tuple[float, float, float, float, int]], tuple[float, float, int]]:
    """Pure EWMA/EW-variance update over (reading, t_stamp) pairs.

    Returns (anomalies, new_state); anomalies are rows whose |z| exceeds
    the threshold after the warmup period (a near-zero early variance
    estimate would otherwise flag ordinary jitter). Kept engine-free so
    unit tests pin the math without a SparkSession.
    """
    ewma, ewvar, n = state if state is not None else (0.0, 0.0, 0)
    out = []
    for reading, t_stamp in readings:
        if n == 0:
            ewma, ewvar = reading, 0.0
            z = 0.0
        else:
            delta = reading - ewma
            std = ewvar**0.5
            z = delta / std if std > 1e-12 else 0.0
            ewma = ewma + alpha * delta
            ewvar = (1 - alpha) * (ewvar + alpha * delta * delta)
        n += 1
        if abs(z) >= z_threshold and n > warmup_n:
            out.append((reading, t_stamp, ewma, z, n))
    return out, (ewma, ewvar, n)


def _detect(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    machine_id, sensor = key
    prev = tuple(state.get) if state.exists else None
    # Concatenate ALL Arrow chunks before the ONE sort: a group whose
    # micro-batch spans several chunks (arrow.maxRecordsPerBatch rows
    # each, arbitrary shuffle order) would otherwise fold per-chunk
    # sorted runs in arrival order — out of global t_stamp order.
    rows: list[tuple[float, float]] = []
    for pdf in pdfs:
        rows.extend(zip(pdf["reading"], pdf["t_stamp"]))
    # NULL/NaN guard (round-7 hardening, mirrors Holt/CUSUM/MG): a NaN
    # reading would poison the EWMA state FOREVER (every later z-score
    # NaN -> the detector goes permanently silent), and a NaN t_stamp
    # makes the sort nondeterministic (NaN compares False both ways).
    # `is not None` as well as self-equality (round-8 ADVICE, mirrors
    # _mg_group): an object-dtype column delivers Python None, which
    # passes the NaN check (None == None) and then crashes the sort.
    rows = [
        (r, t)
        for (r, t) in rows
        if r is not None and r == r and t is not None and t == t
    ]
    rows.sort(key=lambda r: r[1])
    anomalies, new_state = ewma_step(rows, prev)
    state.update(new_state)
    if anomalies:
        yield pd.DataFrame(
            [
                {
                    "machine_id": machine_id,
                    "sensor": sensor,
                    "reading": r,
                    "t_stamp": t,
                    "ewma": e,
                    "zscore": z,
                    "n_seen": n,
                }
                for r, t, e, z, n in anomalies
            ]
        )


def detect_anomalies(plc_stream: DataFrame) -> DataFrame:
    """Streaming anomaly detector over the PLC record shape
    (machine_id, sensor, reading, t_stamp). Works on a streaming
    DataFrame; state persists across micro-batches per (machine, sensor).
    """
    return (
        plc_stream.groupBy("machine_id", "sensor")
        .applyInPandasWithState(
            _detect,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Spark 4 StatefulProcessor variant (transformWithStateInPandas)
# ---------------------------------------------------------------------------

try:  # Spark >= 4.0 only
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class EwmaAnomalyProcessor(StatefulProcessor):
        """Same per-(machine, sensor) EWMA detector as ``_detect``, on the
        Spark 4 arbitrary-state API: explicit typed ValueState handles,
        lifecycle hooks, timers — the forward-looking replacement for
        applyInPandasWithState. Identical math (delegates to ewma_step);
        tests assert both implementations emit identical anomalies."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "ewma_state", "ewma double, ewvar double, n bigint"
            )

        def handleInputRows(self, key, rows, timerValues):
            prev = tuple(self._state.get()) if self._state.exists() else None
            pairs: list[tuple[float, float]] = []
            for pdf in rows:
                pdf = pdf.sort_values("t_stamp")
                pairs.extend(zip(pdf["reading"], pdf["t_stamp"]))
            anomalies, new_state = ewma_step(pairs, prev)
            self._state.update(new_state)
            machine_id, sensor = key
            if anomalies:
                yield pd.DataFrame(
                    [
                        {
                            "machine_id": machine_id,
                            "sensor": sensor,
                            "reading": r,
                            "t_stamp": t,
                            "ewma": e,
                            "zscore": z,
                            "n_seen": n,
                        }
                        for r, t, e, z, n in anomalies
                    ]
                )

        def close(self) -> None:
            pass

    def detect_anomalies_tws(plc_stream: DataFrame) -> DataFrame:
        """detect_anomalies on the Spark 4 transformWithStateInPandas API.

        Requires the ``protobuf`` package (the API's Python state server
        speaks protobuf to the JVM) and the RocksDB state store provider;
        fails fast with a clear message when protobuf is absent — this
        container ships without it (BASELINE.md), so executed coverage
        stays on the applyInPandasWithState path above.
        """
        try:
            from google.protobuf import descriptor  # noqa: F401
        except ImportError as e:
            raise RuntimeError(
                "transformWithStateInPandas needs the 'protobuf' package "
                "(its state-server protocol); not installed in this "
                "environment — use detect_anomalies (applyInPandasWithState) "
                "instead"
            ) from e
        return plc_stream.groupBy("machine_id", "sensor").transformWithStateInPandas(
            statefulProcessor=EwmaAnomalyProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="None",
        )

except ImportError:  # pragma: no cover - older Spark
    EwmaAnomalyProcessor = None

    def detect_anomalies_tws(plc_stream: DataFrame) -> DataFrame:
        raise NotImplementedError(
            "transformWithStateInPandas requires Spark >= 4.0"
        )


# ---------------------------------------------------------------------------
# Holt level+trend forecaster (streaming twin of queries/timeseries.py::
# ts_holt_trend)
# ---------------------------------------------------------------------------

HOLT_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_seen", LongType()),
        StructField("level", DoubleType()),
        StructField("trend", DoubleType()),
        StructField("forecast_3", DoubleType()),
    ]
)

def _null_ts_first_key(r):
    """Deterministic (ts, event_id) sort key with NULL/NaT timestamps
    FIRST — Spark's ascending default. A bare tuple sort would leave
    NaT rows wherever timsort found them (NaT compares False both
    ways), making the fold order — and thus any stateful twin's pinned
    equality with its batch form — nondeterministic."""
    t = r[0]
    missing = t is None or t != t
    return (0 if missing else 1, r[1]) if missing else (1, t, r[1])


HOLT_STATE_SCHEMA = StructType(
    [
        StructField("x1", DoubleType()),
        StructField("level", DoubleType()),
        StructField("trend", DoubleType()),
        StructField("n", LongType()),
    ]
)

# Literal constants, NOT computed (1 - 0.2 is not the double 0.8):
# the batch twin folds with F.lit(0.8) etc., and bit-exact convergence
# demands the identical operands.
HOLT_ALPHA = 0.2
HOLT_OM_ALPHA = 0.8
HOLT_BETA = 0.1
HOLT_OM_BETA = 0.9


def holt_step(
    values: Iterable[float],
    state: tuple[float, float, float, int] | None,
) -> tuple[float, float, float, int]:
    """Pure Holt double-exponential update over a value sequence:
    seeded l=x2, b=x2-x1, then l' = 0.2x + 0.8(l+b),
    b' = 0.1(l'-l) + 0.9b — the exact expression order of the batch
    fold in ts_holt_trend, so given the same value order the final
    (level, trend) is BIT-IDENTICAL to the oracle-checked batch query
    (pinned by tests/test_stateful.py). Engine-free for unit testing.
    """
    x1, level, trend, n = state if state is not None else (0.0, 0.0, 0.0, 0)
    for x in values:
        if n == 0:
            x1 = x
        elif n == 1:
            level, trend = x, x - x1
        else:
            new_level = HOLT_ALPHA * x + HOLT_OM_ALPHA * (level + trend)
            trend = (
                HOLT_BETA
                * ((HOLT_ALPHA * x + HOLT_OM_ALPHA * (level + trend)) - level)
                + HOLT_OM_BETA * trend
            )
            level = new_level
        n += 1
    return (x1, level, trend, n)


def _holt(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    prev = tuple(state.get) if state.exists else None
    # Concatenate ALL Arrow chunks, then ONE sort over (ts, event_id):
    # per-chunk sorting would interleave sorted runs in arrival order
    # for groups spanning multiple chunks, breaking the documented
    # bit-parity with the batch fold. NULL readings (NaN in pandas) are
    # dropped: a monitoring stream must not poison its state forever,
    # whereas the batch AUDIT deliberately propagates NULL to flag
    # affected keys — divergence documented here and in the batch twin.
    rows: list[tuple] = []
    for pdf in pdfs:
        rows.extend(
            zip(pdf["ts"], pdf["event_id"], pdf["value"].astype(float))
        )
    rows.sort(key=_null_ts_first_key)
    vals = [v for (_t, _e, v) in rows if v == v]
    new = holt_step(vals, prev)
    state.update(new)
    _x1, level, trend, n = new
    if n >= 2:
        yield pd.DataFrame(
            [
                {
                    "user_id": user_id,
                    "n_seen": n,
                    "level": level,
                    "trend": trend,
                    "forecast_3": level + 3 * trend,
                }
            ]
        )


def holt_trend_stream(events_stream: DataFrame) -> DataFrame:
    """Continuously-maintained Holt forecast per user over the events
    stream shape (user_id, ts, event_id, value): each micro-batch folds
    its rows (ordered by ts, event_id) into the per-key (level, trend)
    state and emits the refreshed forecast — the streaming serving path
    whose auditable batch oracle is ts_holt_trend. State is 3 doubles +
    a counter per key: bounded by the device fleet, not event volume.
    """
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _holt,
        outputStructType=HOLT_OUTPUT_SCHEMA,
        stateStructType=HOLT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming CUSUM change-point monitor — the stateful serving twin of the
# oracle-checked ts_changepoint_cusum batch query. The batch form computes
# Page's statistic through its prefix-sum/prefix-min CLOSED FORM
# (S_t = P_t - min(0, min_{j<=t} P_j)); this twin runs the textbook
# sequential recurrence (S_t = max(0, S_{t-1} + dev_t - k)) — the equality
# of the two is exactly what tests/test_stateful.py pins per key on the
# fixture data, so the window rewrite in the batch query is PROVEN against
# the recurrence it claims to express, not just oracle-mirrored.
#
# Calibration (mu, k, h) is an explicit parameter: a monitor calibrates on
# a reference window and then watches the live stream (SPC practice); the
# batch AUDIT instead self-calibrates on the full series, so the twin test
# feeds it the batch-identical integers. All state is 7 BIGINTs per key.

CUSUM_STATE_SCHEMA = StructType(
    [
        StructField("s_up", LongType()),
        StructField("s_dn", LongType()),
        StructField("n", LongType()),
        StructField("alarms_up", LongType()),
        StructField("alarms_dn", LongType()),
        StructField("max_s_up", LongType()),
        StructField("max_s_dn", LongType()),
    ]
)

CUSUM_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_seen", LongType()),
        StructField("n_alarms_up", LongType()),
        StructField("n_alarms_dn", LongType()),
        StructField("max_s_up", LongType()),
        StructField("max_s_dn", LongType()),
    ]
)


def cusum_step(
    devs: Iterable[int],
    prev: tuple | None,
    k: int,
    h: int,
) -> tuple:
    """Fold integer deviations (cents - mu) through Page's two-sided
    recurrence. Pure and associative-by-chaining: feeding a prefix and
    then the suffix with the returned state equals one fold over the
    whole sequence (split-anywhere test-locked)."""
    s_up, s_dn, n, a_up, a_dn, m_up, m_dn = prev or (0, 0, 0, 0, 0, 0, 0)
    for d in devs:
        s_up = max(0, s_up + d - k)
        s_dn = max(0, s_dn - d - k)
        n += 1
        if s_up > h:
            a_up += 1
        if s_dn > h:
            a_dn += 1
        if s_up > m_up:
            m_up = s_up
        if s_dn > m_dn:
            m_dn = s_dn
    return (s_up, s_dn, n, a_up, a_dn, m_up, m_dn)


def make_cusum_group_fn(calibration: dict):
    """Build the applyInPandasWithState group function for a given
    per-key calibration {event_type: (mu, k, h)} in integer cents.
    Keys without calibration are passed through silently (a monitor
    must not crash on a new sensor; it has no reference yet)."""

    def _cusum(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        cal = calibration.get(event_type)
        if cal is None:
            return
        mu, k, h = cal
        prev = tuple(state.get) if state.exists else None
        rows: list[tuple] = []
        for pdf in pdfs:
            rows.extend(
                zip(pdf["ts"], pdf["event_id"], pdf["value"].astype(float))
            )
        # ONE global sort across Arrow chunks (same posture as _holt).
        # The v == v guard drops pandas NaN — which is how SQL NULL
        # arrives in the Arrow path, matching the batch twin's
        # IS NOT NULL filter. A LITERAL NaN reading is therefore also
        # dropped here, while the batch audit cannot accept one at all
        # (ANSI cast of NaN to BIGINT errors): NaN input is undefined
        # for the pair, and the equality proof holds on NULL-or-valid
        # data.
        rows.sort(key=_null_ts_first_key)
        devs = [
            int(math.floor(v * 100 + 0.5)) - mu
            for (_t, _e, v) in rows
            if v == v
        ]
        new = cusum_step(devs, prev, k, h)
        state.update(new)
        s_up, s_dn, n, a_up, a_dn, m_up, m_dn = new
        yield pd.DataFrame(
            [
                {
                    "event_type": event_type,
                    "n_seen": n,
                    "n_alarms_up": a_up,
                    "n_alarms_dn": a_dn,
                    "max_s_up": m_up,
                    "max_s_dn": m_dn,
                }
            ]
        )

    return _cusum


def cusum_stream(events_stream: DataFrame, calibration: dict) -> DataFrame:
    """Continuously-maintained two-sided CUSUM per sensor over the
    events stream shape (event_type, ts, event_id, value): each
    micro-batch folds its rows (ordered by ts, event_id) into the
    per-key statistic and emits the refreshed alarm census. State is 7
    BIGINTs per key — bounded by the sensor fleet, not event volume;
    the calibration dict rides the task closure (KBs for realistic
    fleets; at millions of sensors it becomes a state-initialized
    column, same recurrence)."""
    return events_stream.groupBy("event_type").applyInPandasWithState(
        make_cusum_group_fn(calibration),
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Streaming Misra-Gries heavy hitters — the deterministic frequent-items
# sketch as per-key stream state (k-1 counters per group), completing the
# stateful species set: recurrence folds (EWMA/Holt/CUSUM) keep O(1)
# numeric state; this keeps a BOUNDED SET, the shape of
# frequent-items/top-k serving at stream scale. Classic guarantees
# (Misra & Gries 1982): with capacity k-1, every item whose true
# frequency exceeds n/k survives in the counters, and every counter
# underestimates its item's true count by at most n/k. The fold is
# chunk-invariant — processing a sequence in any contiguous chunking
# yields the identical state — which is exactly what lets micro-batches
# resume from GroupState (split-anywhere property, test-locked).

MG_K = 8  # counter capacity + 1: guarantees survivors above n/8

MG_STATE_SCHEMA = StructType(
    [
        StructField("items", StringType()),   # csv of item ids (bounded: k-1)
        StructField("counts", StringType()),  # csv of counter values
        StructField("n", LongType()),
    ]
)

MG_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("user_id", LongType()),
        StructField("est_count", LongType()),
        StructField("n_processed", LongType()),
    ]
)


def mg_step(
    items: Iterable[int],
    state: dict[int, int] | None,
    k: int = MG_K,
) -> dict[int, int]:
    """Pure Misra-Gries update: fold ``items`` into the counter map
    (capacity k-1). Engine-free; chunk-invariant by construction (one
    item at a time, no batch-level shortcuts)."""
    counters: dict[int, int] = dict(state) if state else {}
    for x in items:
        if x in counters:
            counters[x] += 1
        elif len(counters) < k - 1:
            counters[x] = 1
        else:
            for key in list(counters):
                counters[key] -= 1
                if counters[key] == 0:
                    del counters[key]
    return counters


def _mg_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (event_type,) = key
    if state.exists:
        s_items, s_counts, n = state.get
        prev = (
            dict(zip(map(int, s_items.split(",")),
                     map(int, s_counts.split(","))))
            if s_items
            else {}
        )
    else:
        prev, n = {}, 0
    rows: list[tuple] = []
    for pdf in pdfs:
        rows.extend(zip(pdf["ts"], pdf["event_id"], pdf["user_id"]))
    rows.sort(key=_null_ts_first_key)
    # NULL user_id: one NULL makes the pandas column float64 with NaN
    # and int(nan) raises, killing the streaming query (ADVICE r6).
    # A NULL item identifies nobody — skip it (mirrors the NULL-ts
    # hardening); n counts FOLDED items so the n/k guarantee stays
    # exact over the items the sketch actually saw.
    items = [int(u) for (_t, _e, u) in rows if u is not None and u == u]
    counters = mg_step(items, prev)
    n += len(items)
    ordered = sorted(counters.items())  # deterministic state encoding
    state.update(
        (
            ",".join(str(i) for i, _c in ordered),
            ",".join(str(c) for _i, c in ordered),
            n,
        )
    )
    yield pd.DataFrame(
        [
            {
                "event_type": event_type,
                "user_id": i,
                "est_count": c,
                "n_processed": n,
            }
            for i, c in ordered
        ]
    )


def heavy_hitters_stream(events_stream: DataFrame) -> DataFrame:
    """Continuously-maintained Misra-Gries frequent-users sketch per
    event type: each micro-batch folds its rows (ordered by ts,
    event_id — the shared stateful-twin convention) into the bounded
    counter state and emits the refreshed candidate set. State is at
    most k-1 (item, count) pairs + a counter per key — bounded by
    k x |event types|, never by stream length; survivors-above-n/k and
    the n/k underestimate bound are the classic MG guarantees,
    pytest-locked against exact batch counts."""
    return events_stream.groupBy("event_type").applyInPandasWithState(
        _mg_group,
        outputStructType=MG_OUTPUT_SCHEMA,
        stateStructType=MG_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Bottom-k quantile sketch (deterministic uniform sample; Cohen & Kaplan
# 2007 "Summarizing data using bottom-k sketches"). The sample is the k
# DISTINCT event_ids with the SMALLEST md5-derived 32-bit hash, keeping
# the MIN value per id — a pure function of the row SET (duplicates
# merge deterministically), so folding it per micro-batch is
# chunk-invariant by construction (set union then truncate), mergeable
# across shards, and identical to the oracle-checked batch twin
# (queries/stream_batch.py::stream_quantile_bottomk). Quantiles are row
# picks from the sorted sample (index floor((n-1)p/100), value then
# event_id tiebreak) — no interpolation arithmetic. State is bounded:
# k (priority, event_id, value) triples + one counter per key.

QK_K = 256

QK_STATE_SCHEMA = StructType(
    [
        StructField("prios", StringType()),   # csv of sample hash prios
        StructField("eids", StringType()),    # csv of sample event_ids
        StructField("vals", StringType()),    # csv of repr(value)
        StructField("n", LongType()),
    ]
)

QK_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("n_seen", LongType()),
        StructField("n_sample", LongType()),
        StructField("p50", DoubleType()),
        StructField("p90", DoubleType()),
        StructField("p99", DoubleType()),
    ]
)


def qk_prio(event_id: int) -> int:
    """The engine-portable 32-bit hash priority (_conv.hash_u32 twin):
    first 8 hex chars of md5(str(event_id)) as an int."""
    import hashlib

    return int(hashlib.md5(str(event_id).encode()).hexdigest()[:8], 16)


def qk_step(
    items: Iterable[tuple[int, float]],
    state: list[tuple[int, int, float]] | None,
    k: int = QK_K,
) -> list[tuple[int, int, float]]:
    """Pure bottom-k fold: merge (event_id, value) items into the sample
    of the k smallest (prio, event_id) entries. Set-semantics over
    event_id with a MIN-value merge on duplicates (round-8 ADVICE: a
    first-seen rule made the sample arrival-order-dependent for
    non-unique event_ids), so any chunking AND any ordering of the
    stream yields the identical final sample — min is associative and
    commutative, and an eid in the final bottom-k is never evicted once
    added (its fixed prio stays under the only-ever-shrinking k-th
    prio), so it observes every duplicate. Matches the batch twin's
    dense_rank + MIN(value) form exactly. NaN values are skipped here
    as well as at the group-fn boundary (round-8 review: `val < NaN`
    comparisons would make the merge arrival-order-dependent; the batch
    twin filters NOT isnan identically)."""
    sample = {eid: (prio, eid, val) for (prio, eid, val) in (state or [])}
    for eid, val in items:
        if val != val:  # NaN
            continue
        cur = sample.get(eid)
        if cur is None or val < cur[2]:
            sample[eid] = (qk_prio(eid), eid, val)
    return sorted(sample.values())[:k]


def qk_quantiles(sample: list[tuple[int, int, float]]) -> tuple:
    """(p50, p90, p99) row picks from the sample, value-sorted with
    event_id tiebreak — the same selection as the batch twin's SQL."""
    by_val = sorted((val, eid) for (_p, eid, val) in sample)
    n = len(by_val)
    if n == 0:
        return (None, None, None)
    return tuple(by_val[((n - 1) * p) // 100][0] for p in (50, 90, 99))


def _qk_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (event_type,) = key
    if state.exists:
        s_prios, s_eids, s_vals, n = state.get
        prev = [
            (int(p), int(e), float(v))
            for p, e, v in zip(
                s_prios.split(","), s_eids.split(","), s_vals.split(",")
            )
        ] if s_prios else []
    else:
        prev, n = [], 0
    items: list[tuple[int, float]] = []
    for pdf in pdfs:
        # NULL event_id has no identity to sample by; NULL value is no
        # observation (mirrors the batch twin's filters and the round's
        # NULL hardening). Vectorized dropna beats a per-row guard.
        sub = pdf[["event_id", "value"]].dropna()
        items.extend(
            zip(
                sub["event_id"].astype("int64").tolist(),
                sub["value"].astype(float).tolist(),
            )
        )
    sample = qk_step(items, prev)
    n += len(items)
    state.update(
        (
            ",".join(str(p) for (p, _e, _v) in sample),
            ",".join(str(e) for (_p, e, _v) in sample),
            ",".join(repr(v) for (_p, _e, v) in sample),
            n,
        )
    )
    p50, p90, p99 = qk_quantiles(sample)
    yield pd.DataFrame(
        [
            {
                "event_type": event_type,
                "n_seen": n,
                "n_sample": len(sample),
                "p50": p50,
                "p90": p90,
                "p99": p99,
            }
        ]
    )


def quantile_bottomk_stream(events_stream: DataFrame) -> DataFrame:
    """Continuously-maintained per-event-type quantile estimates from
    the deterministic bottom-k sample (module comment above): each
    micro-batch folds its rows into the bounded sample and emits the
    refreshed (p50, p90, p99). The final emission equals the batch twin
    over the same rows EXACTLY — the sample is a function of the row
    set, not the arrival order (pytest-locked, incl. chunk-invariance
    and a convergence run)."""
    return events_stream.groupBy("event_type").applyInPandasWithState(
        _qk_group,
        outputStructType=QK_OUTPUT_SCHEMA,
        stateStructType=QK_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
