"""Query registry powering ``__spark_entry__.py``.

Each engine query registers itself with ``@query(name, oracle=...)``:

    @query("agg_basic", oracle="SELECT ...")
    def agg_basic(spark, sf_dir) -> DataFrame: ...

``oracle`` is the ANSI-SQL twin the driver runs through DuckDB on the same
parquet tables (views: region nation customer supplier part orders lineitem
events documents embeddings). ``oracle=None`` declares a rows-only check
(non-SQL-expressible op: LSH, pandas-UDF internals, streaming state).

Contract gotcha (driver compares by column NAME before value-hashing):
every computed column must carry the same alias in the Spark query and in
the oracle SQL. Helpers in queries/_conv.py enforce the float-determinism
conventions (exact scaled-integer sums, floor-quantized outputs) on both
sides.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB, or None -> rows-only check
    doc: str


_REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register an engine query (and optionally its DuckDB oracle twin)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QueryDef(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def all_queries() -> dict[str, QueryDef]:
    """Name -> QueryDef for every registered query (imports query modules)."""
    # Importing the package populates the registry via decorators.
    from . import queries as _  # noqa: F401

    return dict(_REGISTRY)


def spark_queries() -> dict[str, QueryFn]:
    return {n: d.fn for n, d in all_queries().items()}


def oracle_queries() -> dict[str, str]:
    return {n: d.oracle for n, d in all_queries().items() if d.oracle is not None}
