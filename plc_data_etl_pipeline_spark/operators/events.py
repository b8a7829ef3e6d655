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
) -> DataFrame:
    """Per-user ordered-funnel step times: t[0] = first ``steps[0]``
    event; t[i] = first ``steps[i]`` event at-or-after t[i-1]. Returns
    one row per user with one nullable column per step (``t1..tN``);
    a NULL marks the step (and all later ones) unreached.

    ONE shuffle on ``user_col``: each step threshold is a per-user
    constant, so step i is just another unordered window MIN over the
    same partitioning — Catalyst plans a single Exchange and evaluates
    the stacked frames in one pass per partition. The per-user collapse
    afterwards is co-partitioned (no reshuffle). Compare the textbook
    N-phase aggregate-join chain: N scans of the event log, N shuffles.
    """
    if not steps:
        raise ValueError("at least one funnel step required")
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
