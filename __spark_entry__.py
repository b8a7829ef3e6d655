"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``plc_data_etl_pipeline_spark``; this file only
adapts the registry to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from plc_data_etl_pipeline_spark.registry import oracle_queries, spark_queries
from plc_data_etl_pipeline_spark.session import ensure_tuned

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (per-sensor daily rollup) on sf0.001; rows > 0."""
    ensure_tuned(spark)
    from plc_data_etl_pipeline_spark.queries.relational import sensor_rollup_daily

    return sensor_rollup_daily(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin per query (omitted -> rows-only)."""
    return oracle_queries()
