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


def test_driver_slot_ordering(monkeypatch, tmp_path):
    """__spark_entry__._ordered rank semantics (round-4 verdict items
    2+4, advice items 3+5): failed reds first, then never-checked
    ORACLED names in family-priority order (family rank scoped to this
    rank only), then already-green oracled names stalest-green-first,
    then rows-only names last (a rows-only slot can only ever record
    `no_oracle`)."""
    import __spark_entry__ as E

    oracled = {"o_new", "o_old_green", "o_fresh_green", "o_failed"}
    monkeypatch.setattr(
        E, "oracle_queries", lambda: {n: "SELECT 1" for n in oracled}
    )
    monkeypatch.setattr(
        E,
        "_driver_history",
        lambda: (
            {"o_old_green": 1, "o_fresh_green": 4, "r_checked": 2},
            {"o_failed"},
        ),
    )
    monkeypatch.setattr(E, "_family_rank", lambda n: 0)
    mapping = {
        n: None
        for n in (
            "r_checked",
            "o_fresh_green",
            "o_old_green",
            "r_never",
            "o_new",
            "o_failed",
        )
    }
    assert list(E._ordered(mapping)) == [
        "o_failed",       # latest row red: re-check the fix first
        "o_new",          # never checked + oracled
        "o_old_green",    # green, stale (r1) before
        "o_fresh_green",  # green, fresh (r4)
        "r_never",        # rows-only, never checked
        "r_checked",      # rows-only, already has its no_oracle row
    ]


def test_driver_history_replays_rounds_numerically(tmp_path):
    """CORRECTNESS files must replay in PARSED round order: with the
    lexicographic sort r10 lands between r1 and r2, so r2's newer green
    would be overwritten by r10's older verdict — here the TRUE latest
    row (r10) is red and must win over the r2 green (round-4 advice:
    the real risk begins at r100 vs zero-padded r010)."""
    import json

    import __spark_entry__ as E

    green = {"q": {"err": None, "rows_match": True, "hash_match": True}}
    red = {"q": {"err": None, "rows_match": False}}
    (tmp_path / "CORRECTNESS_r2.json").write_text(json.dumps(green))
    (tmp_path / "CORRECTNESS_r10.json").write_text(json.dumps(red))
    done, failed = E._driver_history(here=str(tmp_path))
    assert failed == {"q"} and "q" not in done
