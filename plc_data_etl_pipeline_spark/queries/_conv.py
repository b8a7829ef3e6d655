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


# Exact-cents domain: |x| <= 1e15 keeps floor(x*10^s + 0.5) far inside
# BIGINT at every scale used (true envelope ~9.2e16 at scale 2). A value
# outside it — NaN, +/-Inf, or a runaway magnitude — maps to NULL on
# BOTH engines, so exact-cents aggregates skip it instead of one
# poisoned sensor reading killing a 100 TB rollup with an ANSI overflow
# (round-8 extreme-float sweep). The dq_* family is the place that
# COUNTS such rows; the money/measure rollups exclude them by contract.
CENTS_CAP = 1.0e15


def cents(col: str | Column, scale: int = 2) -> Column:
    """Exact scaled-integer (BIGINT) of a fixed-scale double column.

    ``floor(x*10^s + 0.5)`` instead of ``round``: x*10^s lands within
    ~1e-6 of an integer (never near the .5 boundary), so both forms yield
    the exact integer — but floor stays in whole-stage codegen while
    Spark's ROUND allocates a BigDecimal per value (~0.15 s per 600k-row
    column). The oracle twin uses the same formula. Values outside the
    exact-cents domain (see CENTS_CAP) yield NULL.
    """
    x = _c(col)
    return F.when(
        ~F.isnan(x) & (F.abs(x) <= F.lit(CENTS_CAP)),
        F.floor(x * (10**scale) + 0.5),
    )


def _quant_cap(m: float) -> float:
    """Quantization domain bound: |x|*m + 0.5 must stay inside BIGINT
    for the floor; 9e17/m leaves ~10x margin under 2^63."""
    return 9.0e17 / m


def quant(col: str | Column, digits: int = 6) -> Column:
    """Cheap deterministic quantization of an arbitrary double to
    ``digits`` decimals: ``floor(x*10^d + 0.5) / 10^d`` — bit-identical
    across engines because both run the same IEEE ops (unlike ROUND,
    where Spark rounds the shortest-repr string and DuckDB the binary
    value), and ~5x faster than Spark's BigDecimal-backed ROUND. Use for
    presentation-rounding of order-independent doubles in hot paths; the
    oracle twin is ``sql_quant``. NaN/Inf/out-of-envelope inputs yield
    NULL on both engines (round-8 extreme-float sweep — the floor cast
    would otherwise ANSI-overflow on a single poisoned value)."""
    m = float(10**digits)
    x = _c(col)
    return F.when(
        ~F.isnan(x) & (F.abs(x) <= F.lit(_quant_cap(m))),
        F.floor(x * m + 0.5).cast("double") / m,
    )


def sql_quant(expr: str, digits: int = 6) -> str:
    m = float(10**digits)
    return (
        f"CASE WHEN NOT isnan({expr}) AND abs({expr}) <= {_quant_cap(m)!r} "
        f"THEN CAST(FLOOR(({expr}) * {m} + 0.5) AS DOUBLE) / {m} END"
    )


# Tighter envelope for INTEGER-PRODUCT statistics (windowed squares,
# autocorrelation/periodogram cross-products, micro-unit interpolation):
# |value| <= 1e6 keeps cents <= 1e8, so squares and products with
# window counts / minute deltas stay far inside BIGINT. Same exclusion
# contract as CENTS_CAP, tighter bound (round-8 extreme-float sweep).
MOMENT_CAP = 1.0e6


def cents_m(col: str | Column, scale: int = 2) -> Column:
    """cents() under the integer-product envelope MOMENT_CAP."""
    x = _c(col)
    return F.when(
        ~F.isnan(x) & (F.abs(x) <= F.lit(MOMENT_CAP)),
        F.floor(x * (10**scale) + 0.5),
    )


def sql_cents_m(expr: str, scale: int = 2) -> str:
    return (
        f"CASE WHEN NOT isnan({expr}) AND abs({expr}) <= {MOMENT_CAP!r} "
        f"THEN CAST(FLOOR(({expr}) * {10**scale} + 0.5) AS BIGINT) END"
    )


def fbucket(col: str | Column, width: float) -> Column:
    """Fixed-width histogram bucket ``floor(x / width)`` with the
    exact-cents domain guard: NaN/Inf/out-of-envelope values land in
    the NULL bucket (one degenerate class, identical on both engines)
    instead of ANSI-overflowing the long floor (round-8 extreme-float
    sweep). A NULL bucket is the RIGHT privacy/monitoring semantics
    too: a 1e308 reading is its own tiny, flaggable equivalence class.
    Oracle twin: :func:`sql_fbucket`."""
    x = _c(col)
    return F.when(
        ~F.isnan(x) & (F.abs(x) <= F.lit(CENTS_CAP)),
        F.floor(x / F.lit(width)),
    )


def sql_fbucket(expr: str, width: float) -> str:
    return (
        f"CASE WHEN NOT isnan({expr}) AND abs({expr}) <= {CENTS_CAP!r} "
        f"THEN CAST(FLOOR(({expr}) / {width}) AS BIGINT) END"
    )


def dsum(col: str | Column, alias: str, scale: int = 2) -> Column:
    """Order-independent SUM over a fixed-scale double column, as DOUBLE."""
    if DECIMAL_MODE:
        return F.sum(_c(col).cast(_PREC)).cast("double").alias(alias)
    return (F.sum(cents(col, scale)).cast("double") / (10**scale)).alias(alias)


def davg(col: str | Column, alias: str, scale: int = 2) -> Column:
    """Order-independent AVG (exact sum / count), emitted as DOUBLE.

    Divisions are done in double on bit-identical operands in a fixed
    order ((sum/10^s)/count), so the quotient is bit-identical too.
    The count is over IN-DOMAIN values (COUNT(cents(x)), not COUNT(x)):
    a NaN/Inf reading is excluded from numerator AND denominator, so
    the mean stays a mean of what was actually summed (round-8
    extreme-float sweep).
    """
    c = _c(col)
    if DECIMAL_MODE:
        return (F.sum(c.cast(_PREC)).cast("double") / F.count(c)).alias(alias)
    return (
        (
            F.sum(cents(col, scale)).cast("double")
            / (10**scale)
            / F.count(cents(col, scale))
        )
        .alias(alias)
    )


def sql_cents(expr: str, scale: int = 2) -> str:
    return (
        f"CASE WHEN NOT isnan({expr}) AND abs({expr}) <= {CENTS_CAP!r} "
        f"THEN CAST(FLOOR(({expr}) * {10**scale} + 0.5) AS BIGINT) END"
    )


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
        f" / COUNT({sql_cents(expr, scale)}) AS {alias}"
    )


def hash_u32(col: str | Column) -> Column:
    """Deterministic 32-bit uniform from content: first 8 hex chars of
    md5 as a BIGINT in [0, 2^32). Engine-portable (md5 hex is identical
    everywhere) — the hash-uniform every deterministic sampling/weight
    derivation shares. Oracle twin: :func:`sql_hash_u32`."""
    return F.conv(F.substring(F.md5(_c(col)), 1, 8), 16, 10).cast("long")


def sql_hash_u32(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"
