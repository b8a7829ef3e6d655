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
    """Canonicalize a cell value, TYPE-TAGGED: the driver likely hashes a
    string/typed representation, so int 2 vs float 2.0 must NOT compare
    equal here even though Python's ``==`` says they do."""
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds"))
    if isinstance(v, datetime.date):
        return ("d", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("arr", tuple(_canon(x) for x in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((k, _canon(x)) for k, x in v.items())))
    if isinstance(v, (bytes, bytearray)):
        return ("bin", bytes(v))
    return ("s", str(v))


def rows_to_multiset(columns: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    """Sort columns by name (driver behavior), canonicalize, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    out = sorted((tuple(_canon(r[i]) for i in order) for r in rows), key=str)
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
                if x[0] == "f" and y[0] == "f" and x != y and x[1] != "NaN" and y[1] != "NaN":
                    max_float_diff = max(max_float_diff, abs(x[1] - y[1]))
            if n_diff <= 3:
                problems.append(f"row diff:\n  spark : {a}\n  oracle: {b}")
    if n_diff:
        problems.append(
            f"{n_diff}/{len(sr)} rows differ; max float |diff|={max_float_diff:.3e}"
        )
    return problems
