"""Reusable event-sequence operators (queries/events.py consumes these).

Kept separate from the query layer so pipelines can compose them over
any (user, type, time) stream — the funnel here is the general N-step
form of the 3-step query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel_times(
    df: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    strategy: str = "window",
) -> DataFrame:
    """Per-user ordered-funnel step times: t[0] = first ``steps[0]``
    event; t[i] = first ``steps[i]`` event at-or-after t[i-1]. Returns
    one row per user with one nullable column per step (``t1..tN``);
    a NULL marks the step (and all later ones) unreached.

    Two physically different plans, identical semantics (equality
    pytest-locked on fixtures and random frames):

    * ``strategy="window"`` (default) — ONE shuffle on ``user_col``:
      each step threshold is a per-user constant, so step i is just
      another unordered window MIN over the same partitioning;
      Catalyst plans a single Exchange and evaluates the stacked
      frames in one pass per partition. Best when user event counts
      are balanced — a bot user's entire history lands in one task.
    * ``strategy="aggregate"`` — N phases of groupBy(user).min +
      broadcast-friendly join-back. N shuffles instead of one, but
      every phase PARTIAL-AGGREGATES map-side: a user with 100M
      events shrinks to one row per mapper before any exchange, so
      hot keys never concentrate in a task. The skew-robust choice
      for power-law event logs at 100 TB.
    """
    if not steps:
        raise ValueError("at least one funnel step required")
    if strategy not in ("window", "aggregate"):
        raise ValueError(
            f"unknown funnel strategy {strategy!r}: use 'window' or 'aggregate'"
        )
    if strategy == "aggregate":
        return _funnel_times_agg(df, steps, user_col, type_col, ts_col)
    w = Window.partitionBy(user_col)
    out = df.select(user_col, type_col, ts_col)
    prev: Column | None = None
    names = []
    for i, step in enumerate(steps):
        cond = F.col(type_col) == step
        if prev is not None:
            cond = cond & (F.col(ts_col) >= F.col(prev))
        name = f"t{i + 1}"
        out = out.withColumn(
            name, F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        prev = name
        names.append(name)
    return out.groupBy(user_col).agg(
        *[F.max(n).alias(n) for n in names]
    )


def _funnel_times_agg(
    df: DataFrame,
    steps: list[str],
    user_col: str,
    type_col: str,
    ts_col: str,
) -> DataFrame:
    """Aggregate-join funnel strategy (see funnel_times): each phase is
    a map-side-combinable MIN per user joined back to the running
    per-user frame. The per-user frame stays one-row-per-user, so every
    join is small-side-friendly and co-partitioned on user_col."""
    ev = df.select(user_col, type_col, ts_col)
    # Phase 1: unconditional min of the first step.
    acc = (
        ev.filter(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        prev = f"t{i - 1}"
        cand = (
            ev.filter(F.col(type_col) == step)
            .join(acc.select(user_col, prev), user_col)
            .filter(F.col(ts_col) >= F.col(prev))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t{i}"))
        )
        acc = acc.join(cand, user_col, "left")
    # Users who never reached step 1 still get a row (all NULLs).
    spine = ev.select(user_col).distinct()
    return spine.join(acc, user_col, "left").select(
        user_col, *[f"t{i + 1}" for i in range(len(steps))]
    )
