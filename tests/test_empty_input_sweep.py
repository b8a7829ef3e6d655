"""Round-8 empty-input sweep: EVERY registered query against zero-row
replicas of all ten tables (exact driver schemas).

Empty inputs are routine at 100 TB — an empty day partition, a filtered
source that matched nothing, a backfill window before data starts. The
first run of this sweep found FOURTEEN crashes and SIX divergences
invisible on the driver fixtures: a partitionBy write of zero rows
leaves no data files so the unschema'd read-back fails inference (5
queries); ANSI division by a zero row count (dq_schema_drift both
engines' halves); observe() SUM over zero rows yields NULL, not 0;
k-means/IVF/PQ codebook training collapsed on an empty sample;
crosstab's data-derived pivot schema lost its columns; Spark's
grouping-set aggregates emit zero rows on an empty relation where ANSI
engines emit the grand-total () group (rollup/cube/grouping-sets/
grouping-id oracles now carry a no-op-on-nonempty HAVING COUNT(*)>0);
and the Morton range-partitioner had no min/max span.

Three exceptions are CONTRACTS, asserted exactly here:

- ``emb_pca_power`` / ``emb_whiten_audit`` fail LOUDLY (ValueError) on
  an empty embedding frame: eigenvectors of a nonexistent covariance
  have no meaningful value and a silent empty result would poison
  downstream whitening.
- ``sink_txn_history``: the txlog elides no-op commits (a predicate
  DELETE that touches no file envelope and a compact() with nothing to
  do record NO version unless a txn marker demands a marker-only
  commit — ``txlog._snapshot_retrying`` docstring), so the known
  overwrite→append→delete→compact script yields versions {1, 2} on an
  empty table, not the oracle's literal four.
"""

from __future__ import annotations

import duckdb
import pyarrow.parquet as pq
import pytest

from plc_data_etl_pipeline_spark.catalog import TABLES

from .conftest import SF_DIR
from .oracle_compare import compare

# name -> exception class it must raise on empty input (loud-failure
# contracts; anything else raising ANYTHING is a sweep failure).
LOUD = {"emb_pca_power": ValueError, "emb_whiten_audit": ValueError}

# Engine-contract outputs on empty input that deliberately differ from
# the oracle literal (see module docstring).
EXPECT_ROWS = {"sink_txn_history": {(1, 1, 0), (2, 1, 0)}}


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        schema = pq.read_schema(f"{SF_DIR}/{t}.parquet")
        pq.write_table(schema.empty_table(), f"{d}/{t}.parquet")
    return str(d)


def test_every_query_survives_empty_tables(spark, empty_sf):
    from plc_data_etl_pipeline_spark.registry import all_queries

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{empty_sf}/{t}.parquet')"
        )
    bad, ran = [], 0
    try:
        for name, qd in all_queries().items():
            ran += 1
            if name in LOUD:
                with pytest.raises(LOUD[name]):
                    qd.fn(spark, empty_sf).collect()
                continue
            try:
                sdf = qd.fn(spark, empty_sf)
                srows = [tuple(r) for r in sdf.collect()]
            except Exception as e:  # noqa: BLE001 — report, don't mask
                bad.append(f"{name}: CRASH {type(e).__name__}: {e}"[:200])
                continue
            if name in EXPECT_ROWS:
                if set(srows) != EXPECT_ROWS[name]:
                    bad.append(f"{name}: contract rows {srows}")
                continue
            if qd.oracle is None:
                continue
            rel = con.sql(qd.oracle)
            problems = compare(
                list(sdf.columns), srows,
                [d[0] for d in rel.description], rel.fetchall(),
            )
            if problems:
                bad.append(f"{name}: {problems[-1][:160]}")
    finally:
        con.close()
    assert ran >= 270, f"sweep shrank to {ran} queries — registry drift?"
    assert not bad, "empty-input divergence:\n" + "\n".join(bad)
