"""Shared fixtures: one SparkSession per test session, DuckDB oracle conn."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from plc_data_etl_pipeline_spark.catalog import TABLES
from plc_data_etl_pipeline_spark.session import get_spark

# Small SF for fast local iteration; the driver checks sf0.01.
SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("plc-etl-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def oracle():
    """DuckDB connection with the driver's views pre-registered."""
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def flatten_parquet_dir(path: str) -> None:
    """Spark writes a directory; the planted fixtures (and DuckDB's view
    glob) use single files — promote the lone part file. Shared by the
    planted-fixture suites (review finding: it was copy-pasted three
    times)."""
    import shutil

    part = next(
        f for f in os.listdir(path)
        if f.endswith(".parquet") and f.startswith("part-")
    )
    tmp = path + ".file"
    shutil.move(os.path.join(path, part), tmp)
    shutil.rmtree(path)
    shutil.move(tmp, path)
