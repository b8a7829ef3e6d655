"""Streaming funnel: per-user ordered-step progression as a stateful
operator (applyInPandasWithState), the streaming twin of
queries/events.py::event_funnel / operators/events.py::funnel_times.

State per user is two scalars — the furthest stage reached and the
timestamp that reached it — so state size is users × 12 bytes no
matter how long the stream runs (contrast the batch form, which needs
the user's whole event set in one partition). Each micro-batch's rows
are processed in event-time order; a stage advances when the next
step's event type arrives at-or-after the previous stage's time,
exactly the batch semantics PROVIDED events arrive per-user in
event-time order across batches (the same in-order contract the EWMA
detector documents — with out-of-order sources, put a watermark +
sort-within-batch in front, and late events beyond the watermark are
dropped rather than retro-advancing a stage).

Output (append mode): one row per stage TRANSITION — (user_id, stage,
ts_us) — the event-sourced form; max(stage) per user reproduces the
funnel counts, and the transition log itself is the input marketing
attribution wants.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("stage", IntegerType()),
        StructField("ts_us", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("stage", IntegerType()),
        StructField("t_stage", LongType()),
    ]
)

FUNNEL_STEPS = ("view", "click", "purchase")


def funnel_step(
    rows: list[tuple[str, int]],
    prev: tuple[int, int] | None,
    steps: tuple[str, ...] = FUNNEL_STEPS,
) -> tuple[list[tuple[int, int]], tuple[int, int]]:
    """Pure state transition: fold (event_type, ts_us) rows (already
    event-time-sorted) into (stage, t_stage) state; returns the stage
    transitions emitted. Separated from the Spark glue so the math is
    unit-testable without a stream."""
    stage, t_stage = prev if prev is not None else (0, 0)
    out: list[tuple[int, int]] = []
    for etype, ts in rows:
        if stage < len(steps) and etype == steps[stage] and ts >= t_stage:
            stage += 1
            t_stage = ts
            out.append((stage, ts))
    return out, (stage, t_stage)


def _advance(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    prev = tuple(state.get) if state.exists else None
    step_rank = {s: i for i, s in enumerate(FUNNEL_STEPS)}
    rows: list[tuple[str, int]] = []
    for pdf in pdfs:
        # NULL-ts guard (round-7 hardening): NaT.astype('int64') raises
        # in pandas 2 — and an event with no event time cannot place in
        # an ordered funnel anyway, so it is dropped, not folded.
        pdf = pdf[pdf["ts"].notna()]
        ts_us = (pdf["ts"].astype("int64") // 1000).tolist()
        rows.extend(zip(pdf["event_type"].tolist(), ts_us))
    # One sort over the concatenated rows (per-chunk pre-sorting would
    # be dead work). Tiebreak equal timestamps by funnel-step order so
    # a same-instant view+click advances both stages — matching the
    # order-independent batch semantics (batch takes min qualifying ts
    # per stage, which admits the same-instant later step).
    rows.sort(key=lambda r: (r[1], step_rank.get(r[0], len(FUNNEL_STEPS))))
    transitions, new_state = funnel_step(rows, prev)
    state.update(new_state)
    if transitions:
        yield pd.DataFrame(
            [
                {"user_id": user_id, "stage": s, "ts_us": t}
                for s, t in transitions
            ]
        )


def track_funnel(event_stream: DataFrame) -> DataFrame:
    """Apply the stateful funnel to a streaming events DataFrame with
    (user_id, event_type, ts) columns."""
    return event_stream.groupBy("user_id").applyInPandasWithState(
        _advance,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
