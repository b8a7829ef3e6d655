"""Primary correctness gate: every registered query vs its DuckDB oracle.

Mirrors the driver's t2 check (``__spark_entry__.py``) at a smaller SF for
fast iteration. Oracle-less queries get the driver's weaker rows-only
check plus a schema-stability assert.
"""

from __future__ import annotations

import pytest

from plc_data_etl_pipeline_spark.registry import all_queries

from .conftest import SF_DIR
from .oracle_compare import compare

_QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_vs_oracle(name, spark, oracle):
    qd = _QUERIES[name]
    df = qd.fn(spark, SF_DIR)
    spark_rows = [tuple(r) for r in df.collect()]
    spark_cols = list(df.columns)

    if qd.oracle is None:
        # rows-only check (driver behavior for non-SQL-expressible ops)
        assert isinstance(spark_rows, list)
        assert len(spark_cols) > 0
        return

    rel = oracle.sql(qd.oracle)
    ora_cols = [d[0] for d in rel.description]
    ora_rows = rel.fetchall()
    problems = compare(spark_cols, spark_rows, ora_cols, ora_rows)
    assert not problems, f"query {name!r} mismatches oracle:\n" + "\n".join(problems)
