"""Float/time determinism conventions shared by engine queries and oracles.

The driver hash-compares Spark results against DuckDB results
order-insensitively, so every value must be bit-identical across two
engines that sum doubles in different orders. Conventions (SURVEY §7.3):

* SUM/AVG over doubles: cast each value to DECIMAL first — the per-value
  cast is deterministic (round-half-up to fixed scale in both engines) and
  decimal addition is exact, so the aggregate is order-independent. The
  final result is cast back to DOUBLE (nearest-double of a given decimal is
  unique). Helpers: ``dsum`` / ``davg`` (Spark) and the SQL strings built by
  ``sql_dsum`` / ``sql_davg``.
* MIN/MAX/COUNT: exact and order-independent — no treatment needed.
* Ratios / stddev and other genuinely order-dependent doubles: ROUND to a
  stable number of digits on both sides (documented per query).
* Timestamps in output: emit DATE or an explicitly formatted string, never
  a raw TIMESTAMP (collect-side timezone conversion differs per harness).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Scale of the per-value decimal cast. Test data doubles are 2-decimal
# money-ish values; 18,6 is exact for them and keeps sums inside 38 digits
# at 100 TB row counts (1e12 rows * 1e6 max value = 1e18 << 1e32).
_PREC = "decimal(38,6)"
_SQL_PREC = "DECIMAL(38,6)"


def dsum(col: str | Column, alias: str) -> Column:
    """Order-independent SUM over a double column, emitted as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_PREC)).cast("double").alias(alias)


def davg(col: str | Column, alias: str) -> Column:
    """Order-independent AVG (decimal-sum / count), emitted as DOUBLE.

    The division is done in double on bit-identical operands, so the
    quotient is bit-identical too.
    """
    c = F.col(col) if isinstance(col, str) else col
    return (
        (F.sum(c.cast(_PREC)).cast("double") / F.count(c))
        .alias(alias)
    )


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {_SQL_PREC})) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS {_SQL_PREC})) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
