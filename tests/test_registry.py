"""Registry-wide output contract checks.

The driver canonicalizes every declared query's result through pandas
(sort_values + row hashing); top-level array/map/binary columns make that
canonicalization crash (`unhashable type: numpy.ndarray`) — exactly what
took `text_langid` and `multimodal_decode` down in round 1. This test
walks EVERY registered query, builds its (lazy) DataFrame at sf0.001 and
asserts the declared schema contains only hashable scalar types at the
top level. Complex values must be projected (to_json / round+concat_ws)
before registration; the raw operator APIs keep their native types.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, BinaryType, MapType, StructType

from plc_data_etl_pipeline_spark.registry import all_queries
from tests.conftest import SF_DIR

FORBIDDEN = (ArrayType, MapType, BinaryType, StructType)


def _query_names():
    return sorted(all_queries())


@pytest.mark.parametrize("name", _query_names())
def test_no_complex_toplevel_columns(spark, name):
    qdef = all_queries()[name]
    df = qdef.fn(spark, SF_DIR)
    bad = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, FORBIDDEN)
    ]
    assert not bad, (
        f"query {name!r} declares non-scalar top-level column(s) {bad}; "
        "project them to JSON/strings before registering (driver "
        "canonicalizer cannot hash array/map/binary/struct values)"
    )


def test_no_hugeint_oracle_columns(oracle):
    """Registry-wide oracle TYPE audit (round-3 verdict item 1).

    DuckDB widens SUM(BIGINT) to HUGEINT (int128). ``fetchall`` hands
    HUGEINT back as plain Python int, so the local multiset compare can
    never see the difference — but the driver's pandas-canonicalized hash
    DOES (the round-3 ``pack_sequences`` red). Guard the whole class:
    no oracle result column may have DuckDB type HUGEINT/UHUGEINT; wrap
    the offending expression in CAST(... AS BIGINT). Cheap: plan-only,
    no Spark session and no row fetch.
    """
    from plc_data_etl_pipeline_spark.registry import oracle_queries

    offenders = {}
    for name, sql in sorted(oracle_queries().items()):
        rel = oracle.sql(sql)
        bad = [
            f"{col}:{t}"
            for col, t in zip(rel.columns, (str(t) for t in rel.types))
            if t in ("HUGEINT", "UHUGEINT")
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracle columns with int128 type (driver hash will reject even "
        f"value-identical results) — CAST to BIGINT: {offenders}"
    )
