"""Data-quality validation: declarative expectation checks over any
DataFrame (the ETL gate the reference lacks entirely — its consumer
inserts whatever decodes, consumer/sensor_data_consumer.py:116-138).

Rules are pure column predicates evaluated in ONE pass (a single
aggregate of conditional counts — no per-rule scans, no collects), so a
100 TB validation costs one scan regardless of rule count.

Rule spec: ``(rule_name, violation_predicate_column)`` — the predicate
is True when the row VIOLATES the rule. Helpers build the common ones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> tuple[str, Column]:
    return (f"{col}_null_count", F.col(col).isNull())


def in_range(col: str, lo: float, hi: float) -> tuple[str, Column]:
    """Violated when non-null and outside [lo, hi]."""
    c = F.col(col)
    return (f"{col}_out_of_range_count", c.isNotNull() & ~c.between(lo, hi))


def in_set(col: str, values: tuple) -> tuple[str, Column]:
    c = F.col(col)
    return (f"{col}_not_in_set_count", c.isNotNull() & ~c.isin(*values))


def matches(col: str, pattern: str) -> tuple[str, Column]:
    c = F.col(col)
    return (f"{col}_no_match_count", c.isNotNull() & ~c.rlike(pattern))


def validate_summary(df: DataFrame, rules: list[tuple[str, Column]]) -> DataFrame:
    """One-pass rule summary: total rows + violation count per rule.

    Output: one row — (n_rows, <rule_name> per rule). Conditional counts
    compile to a single partial-aggregable scan.
    """
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            F.sum(F.when(pred, 1).otherwise(0)).alias(name)
            for name, pred in rules
        ],
    )


def violations(df: DataFrame, rules: list[tuple[str, Column]],
               keep_cols: list[str]) -> DataFrame:
    """Row-level violation report: one row per (row, failed rule) with
    the offending rule name — the dead-letter side of the gate. Same
    single scan; array of failed rule names exploded per row."""
    failed = F.array_compact(
        F.array(
            *[F.when(pred, F.lit(name)) for name, pred in rules]
        )
    )
    return (
        df.select(*keep_cols, failed.alias("failed_rules"))
        .filter(F.size("failed_rules") > 0)
        .select(*keep_cols, F.explode("failed_rules").alias("rule"))
    )
