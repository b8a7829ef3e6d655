"""Order-insensitive result comparison mimicking the driver's value-hash.

The driver sorts columns by name, then hash-compares row-count + schema +
values order-insensitively (``__spark_entry__.py`` docstring). We reproduce
that as an exact multiset comparison over canonicalized Python values, so a
local pass strongly predicts a driver pass — plus better diagnostics
(first differing rows, float max-abs-diff) when it fails.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal


def _canon(v):
    """Canonicalize a cell value for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, int):
        return int(v)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def rows_to_multiset(columns: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    """Sort columns by name (driver behavior), canonicalize, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    out = sorted(
        (tuple(_canon(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t),
    )
    return cols, out


def compare(spark_cols, spark_rows, ora_cols, ora_rows) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    sc, sr = rows_to_multiset(spark_cols, spark_rows)
    oc, orow = rows_to_multiset(ora_cols, ora_rows)
    if sc != oc:
        problems.append(f"column names differ: spark={sc} oracle={oc}")
        return problems
    if len(sr) != len(orow):
        problems.append(f"row count differs: spark={len(sr)} oracle={len(orow)}")
    n_diff = 0
    max_float_diff = 0.0
    for a, b in zip(sr, orow):
        if a != b:
            n_diff += 1
            for x, y in zip(a, b):
                if isinstance(x, float) and isinstance(y, float):
                    max_float_diff = max(max_float_diff, abs(x - y))
            if n_diff <= 3:
                problems.append(f"row diff:\n  spark : {a}\n  oracle: {b}")
    if n_diff:
        problems.append(
            f"{n_diff}/{len(sr)} rows differ; max float |diff|={max_float_diff:.3e}"
        )
    return problems
