"""Slowly-changing-dimension (SCD type 2) maintenance.

The reference loads sensor rows into a single flat Postgres table
(``consumer/sensor_data_consumer.py:124-138``) with no notion of history;
any warehouse built on it would immediately need versioned dimensions.
``scd2_apply`` is that operator: given the current dimension state and a
batch of updates, it closes changed rows (valid_to = change date) and
opens new versions (valid_from = change date, valid_to = NULL), leaving
unchanged and historical rows untouched.

Scale shape: ONE left join from current rows to the update batch (update
batches are small next to the dimension -> broadcast them), a null-safe
change predicate, and a union of three disjoint projections over that
single joined relation — Spark evaluates the join once per branch but
each branch is a narrow filter+project, and the whole thing is
shuffle-free when the update side broadcasts. No window, no sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    change_col: str = "change_date",
) -> DataFrame:
    """Apply an update batch to an SCD2 dimension; returns the new full
    dimension state (history + kept current + closed + fresh versions).

    ``updates`` carries (key, tracked..., change_col). A row counts as
    changed only if some tracked attribute differs null-safely — updates
    that restate the current value are no-ops (no spurious versions).
    """
    hist = dim.filter(F.col(valid_to).isNotNull())
    cur = dim.filter(F.col(valid_to).isNull())
    u = F.broadcast(
        updates.select(
            F.col(key),
            *[F.col(c).alias(f"__new_{c}") for c in tracked],
            F.col(change_col).alias("__ch"),
        )
    )
    j = cur.join(u, key, "left")
    changed: Column = F.lit(False)
    for c in tracked:
        changed = changed | ~F.col(c).eqNullSafe(F.col(f"__new_{c}"))
    changed = F.col("__ch").isNotNull() & changed
    out_cols = [key, *tracked, valid_from, valid_to]
    kept = j.filter(~changed).select(*out_cols)
    closed = j.filter(changed).select(
        key,
        *tracked,
        F.col(valid_from),
        F.col("__ch").alias(valid_to),
    )
    fresh = j.filter(changed).select(
        key,
        *[F.col(f"__new_{c}").alias(c) for c in tracked],
        F.col("__ch").alias(valid_from),
        F.lit(None).cast(dim.schema[valid_to].dataType).alias(valid_to),
    )
    return hist.unionByName(kept).unionByName(closed).unionByName(fresh)
