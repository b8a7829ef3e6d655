"""Float/time determinism conventions shared by engine queries and oracles.

The driver hash-compares Spark results against DuckDB results
order-insensitively, so every value must be bit-identical across two
engines that sum doubles in different orders. Conventions (SURVEY §7.3):

* SUM/AVG over fixed-scale doubles (all money/measure columns in the test
  star schema are exact 2-decimal values — verified empirically): scale
  each value to an exact integer (``ROUND(x * 10^s)`` — x*10^s is within
  ~1e-6 of an integer, so the round is tie-free and identical in both
  engines), SUM as BIGINT (exact, order-independent, and the fastest
  aggregation path both engines have), then divide back in double (one
  correctly-rounded IEEE division of identical operands). Helpers:
  ``dsum`` / ``davg`` (Spark) and ``sql_dsum`` / ``sql_davg`` (DuckDB).
  Derived money products keep exactness with a wider scale: price*(1-disc)
  is an exact 4-decimal value (scale=4), price*(1-disc)*(1+tax) exact
  6-decimal (scale=6).

  Overflow envelope: |x|*10^s < 2^53 per value and n_rows * max_cents <
  2^63 for the BIGINT sum. At the bench scales (<=6e5 rows, scale<=6,
  |x|<=5e5) the headroom is >100x; beyond ~1e12 rows * scale 6 set
  ``SPARK_GRAFT_EXACT_DECIMAL=1`` to switch both sides to the exact
  DECIMAL(38,6) path (slower, unbounded).

* Plain double SUM + ROUND is NOT safe: Spark rounds the shortest-repr
  decimal string HALF_UP while DuckDB rounds the binary value, so exact
  .xx5 ties diverge — the integer path never rounds an inexact value.
* MIN/MAX/COUNT: exact and order-independent — no treatment needed.
* Ratios / stddev and other genuinely order-dependent doubles: ROUND to a
  stable number of digits on both sides (documented per query).
* Timestamps in output: emit DATE or an explicitly formatted string, never
  a raw TIMESTAMP (collect-side timezone conversion differs per harness).
"""

from __future__ import annotations

import os

from pyspark.sql import Column
from pyspark.sql import functions as F

# Exact-decimal fallback (order-independent at ANY row count; ~5x slower).
DECIMAL_MODE = os.environ.get("SPARK_GRAFT_EXACT_DECIMAL", "") == "1"

_PREC = "decimal(38,6)"
_SQL_PREC = "DECIMAL(38,6)"


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def cents(col: str | Column, scale: int = 2) -> Column:
    """Exact scaled-integer (BIGINT) of a fixed-scale double column.

    ``floor(x*10^s + 0.5)`` instead of ``round``: x*10^s lands within
    ~1e-6 of an integer (never near the .5 boundary), so both forms yield
    the exact integer — but floor stays in whole-stage codegen while
    Spark's ROUND allocates a BigDecimal per value (~0.15 s per 600k-row
    column). The oracle twin uses the same formula.
    """
    return F.floor(_c(col) * (10**scale) + 0.5)


def quant(col: str | Column, digits: int = 6) -> Column:
    """Cheap deterministic quantization of an arbitrary double to
    ``digits`` decimals: ``floor(x*10^d + 0.5) / 10^d`` — bit-identical
    across engines because both run the same IEEE ops (unlike ROUND,
    where Spark rounds the shortest-repr string and DuckDB the binary
    value), and ~5x faster than Spark's BigDecimal-backed ROUND. Use for
    presentation-rounding of order-independent doubles in hot paths; the
    oracle twin is ``sql_quant``."""
    m = float(10**digits)
    return F.floor(_c(col) * m + 0.5).cast("double") / m


def sql_quant(expr: str, digits: int = 6) -> str:
    m = float(10**digits)
    return f"CAST(FLOOR(({expr}) * {m} + 0.5) AS DOUBLE) / {m}"


def dsum(col: str | Column, alias: str, scale: int = 2) -> Column:
    """Order-independent SUM over a fixed-scale double column, as DOUBLE."""
    if DECIMAL_MODE:
        return F.sum(_c(col).cast(_PREC)).cast("double").alias(alias)
    return (F.sum(cents(col, scale)).cast("double") / (10**scale)).alias(alias)


def davg(col: str | Column, alias: str, scale: int = 2) -> Column:
    """Order-independent AVG (exact sum / count), emitted as DOUBLE.

    Divisions are done in double on bit-identical operands in a fixed
    order ((sum/10^s)/count), so the quotient is bit-identical too.
    """
    c = _c(col)
    if DECIMAL_MODE:
        return (F.sum(c.cast(_PREC)).cast("double") / F.count(c)).alias(alias)
    return (
        (F.sum(cents(col, scale)).cast("double") / (10**scale) / F.count(c))
        .alias(alias)
    )


def sql_cents(expr: str, scale: int = 2) -> str:
    return f"CAST(FLOOR(({expr}) * {10**scale} + 0.5) AS BIGINT)"


def sql_dsum(expr: str, alias: str, scale: int = 2) -> str:
    if DECIMAL_MODE:
        return f"CAST(SUM(CAST({expr} AS {_SQL_PREC})) AS DOUBLE) AS {alias}"
    return (
        f"CAST(SUM({sql_cents(expr, scale)}) AS DOUBLE) / {10**scale}"
        f" AS {alias}"
    )


def sql_davg(expr: str, alias: str, scale: int = 2) -> str:
    if DECIMAL_MODE:
        return (
            f"CAST(SUM(CAST({expr} AS {_SQL_PREC})) AS DOUBLE)"
            f" / COUNT({expr}) AS {alias}"
        )
    return (
        f"CAST(SUM({sql_cents(expr, scale)}) AS DOUBLE) / {10**scale}"
        f" / COUNT({expr}) AS {alias}"
    )


def hash_u32(col: str | Column) -> Column:
    """Deterministic 32-bit uniform from content: first 8 hex chars of
    md5 as a BIGINT in [0, 2^32). Engine-portable (md5 hex is identical
    everywhere) — the hash-uniform every deterministic sampling/weight
    derivation shares. Oracle twin: :func:`sql_hash_u32`."""
    return F.conv(F.substring(F.md5(_c(col)), 1, 8), 16, 10).cast("long")


def sql_hash_u32(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"
