"""Scale-layout operator tests: partition pruning, shuffle-free bucketed
joins, salted skew joins (operators/scale.py). Assertions are on the
PHYSICAL PLAN (the thing that matters at 100 TB), plus exact-result
checks against the unsalted/unpartitioned equivalents."""

from __future__ import annotations

import contextlib
import os
import io

import pytest
from pyspark.sql import functions as F

from plc_data_etl_pipeline_spark.catalog import load
from plc_data_etl_pipeline_spark.operators import scale as SC

from .conftest import SF_DIR


def _plan(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_partitioned_write_prunes(spark, tmp_path):
    orders = load(spark, SF_DIR, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_part")
    SC.write_partitioned(orders, path, ["order_year"])

    back = spark.read.parquet(path).filter(F.col("order_year") == 1997)
    p = _plan(back)
    assert "PartitionFilters" in p and "order_year" in p.split("PartitionFilters")[1].split("\n")[0]
    want = orders.filter(F.col("order_year") == 1997).count()
    assert back.count() == want
    # directory layout is hive-style
    import os

    years = {d for d in os.listdir(path) if d.startswith("order_year=")}
    assert len(years) >= 5


def test_bucketed_join_skips_shuffle(spark, tmp_path):
    # saveAsTable writes to the session's spark-warehouse dir (static
    # conf; DROP TABLE below cleans it up)
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    o = load(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    SC.write_bucketed(li, "li_b", "l_orderkey", 8, sort_col="l_orderkey")
    SC.write_bucketed(o, "o_b", "o_orderkey", 8, sort_col="o_orderkey")
    a = spark.table("li_b")
    b = spark.table("o_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        joined = a.join(b, a.l_orderkey == b.o_orderkey)
        p = _plan(joined)
        assert "SortMergeJoin" in p
        assert "Exchange" not in p, "bucketed join must not shuffle either side"
        # same result as the plain join
        want = li.join(o, li.l_orderkey == o.o_orderkey).count()
        assert joined.count() == want
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")


def test_salted_join_exact_and_spread(spark):
    """Salted join returns exactly the plain join's rows on a skewed
    input (90% of rows share one key)."""
    import random

    random.seed(7)
    big_rows = [(1 if random.random() < 0.9 else random.randint(2, 20), i)
                for i in range(5000)]
    big = spark.createDataFrame(big_rows, "k int, payload int")
    small = spark.createDataFrame([(k, f"dim{k}") for k in range(1, 21)], "k int, label string")

    plain = big.join(small, "k").select("k", "payload", "label")
    salted = SC.salted_join(big, small, "k").select("k", "payload", "label")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark):
    big = spark.createDataFrame([(1, 10), (1, 11), (99, 12)], "k int, payload int")
    small = spark.createDataFrame([(1, "one")], "k int, label string")
    out = SC.salted_join(big, small, "k", how="left").select("k", "payload", "label")
    rows = sorted(map(tuple, out.collect()))
    assert rows == [(1, 10, "one"), (1, 11, "one"), (99, 12, None)]


def test_hot_keys_finds_planted_hot_tail(spark):
    """The sampled detector flags the 90%-share key and none of the
    long-tail keys (at full-sample fraction the check is exact)."""
    import random

    random.seed(11)
    rows = [(1 if random.random() < 0.9 else random.randint(2, 200), i)
            for i in range(20000)]
    big = spark.createDataFrame(rows, "k int, payload int")
    hot = SC.hot_keys(big, "k", sample_fraction=1.0, hot_share=0.05)
    assert [r.k for r in hot.collect()] == [1]


def test_salted_join_hot_exact_vs_plain(spark):
    """Hot-key salting preserves row multiplicity exactly on a skewed
    input — including when the sample misses keys (tiny fraction) and
    when it flags everything (hot_share=0)."""
    import random

    random.seed(13)
    big_rows = [(1 if random.random() < 0.9 else random.randint(2, 20), i)
                for i in range(5000)]
    big = spark.createDataFrame(big_rows, "k int, payload int")
    small = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(1, 21)], "k int, label string"
    )
    plain = sorted(
        map(tuple, big.join(small, "k").select("k", "payload", "label").collect())
    )
    for frac, share in [(1.0, 0.05), (0.02, 0.5), (1.0, 0.0)]:
        out = SC.salted_join_hot(
            big, small, "k", sample_fraction=frac, hot_share=share
        ).select("k", "payload", "label")
        assert sorted(map(tuple, out.collect())) == plain, (frac, share)


def test_salted_join_hot_left_outer_and_how_guard(spark):
    big = spark.createDataFrame(
        [(1, 10), (1, 11), (99, 12)], "k int, payload int"
    )
    small = spark.createDataFrame([(1, "one")], "k int, label string")
    out = SC.salted_join_hot(big, small, "k", how="left").select(
        "k", "payload", "label"
    )
    assert sorted(map(tuple, out.collect())) == [
        (1, 10, "one"), (1, 11, "one"), (99, 12, None)
    ]
    with pytest.raises(ValueError, match="salted_join_hot"):
        SC.salted_join_hot(big, small, "k", how="full")


def test_salted_join_rejects_nonpositive_buckets(spark):
    """salt_buckets=0 is silent data loss (plain form: empty salt array
    explodes the small side away, inner join returns NOTHING; hot form:
    descending sequence(0,-1) phantom replicas) — both fail eagerly."""
    big = spark.createDataFrame([(1, 10)], "k int, payload int")
    small = spark.createDataFrame([(1, "one")], "k int, label string")
    for bad in (0, -3):
        with pytest.raises(ValueError, match="salt_buckets"):
            SC.salted_join(big, small, "k", salt_buckets=bad)
        with pytest.raises(ValueError, match="salt_buckets"):
            SC.salted_join_hot(big, small, "k", salt_buckets=bad)


def test_key_distribution_diagnoses_skew(spark):
    big = spark.createDataFrame(
        [(1, i) for i in range(900)] + [(2, i) for i in range(100)],
        "k int, payload int",
    )
    top = SC.key_distribution(big, "k").collect()
    assert top[0].k == 1 and top[0].n_rows == 900
    assert abs(top[0].share - 0.9) < 1e-9


def test_schema_evolution_merge(spark, tmp_path):
    """Parquet schema evolution: files written before a column existed
    read back as NULL for that column under mergeSchema — the append-only
    lake pattern for adding fields without rewriting history."""
    path = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")
    v1.write.mode("append").parquet(path)
    v2 = spark.createDataFrame(
        [(3, "c", 1.5)], "id int, name string, score double"
    )
    v2.write.mode("append").parquet(path)

    merged = spark.read.option("mergeSchema", True).parquet(path)
    assert set(merged.columns) == {"id", "name", "score"}
    rows = {r.id: (r.name, r.score) for r in merged.collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", 1.5)}


def test_zorder_layout_shrinks_minmax_envelopes(spark, tmp_path):
    """Z-ordered files must have dramatically tighter per-file min-max
    envelopes on BOTH clustered dimensions than an arbitrary layout —
    that envelope IS what parquet stats pruning consumes. (A plain sort
    would tighten only the leading column.)"""
    import pyarrow.parquet as pq
    from plc_data_etl_pipeline_spark.catalog import load
    from plc_data_etl_pipeline_spark.operators.scale import write_zordered

    from .conftest import SF_DIR

    ev = load(spark, SF_DIR, "events").select("user_id", "value")
    lo_u, hi_u, lo_v, hi_v = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()
    plain_dir = str(tmp_path / "plain")
    z_dir = str(tmp_path / "zorder")
    ev.repartition(8).write.mode("overwrite").parquet(plain_dir)
    write_zordered(
        ev, z_dir, ["user_id", "value"],
        [float(lo_u), float(lo_v)], [float(hi_u), float(hi_v)], num_files=8,
    )

    def mean_spread(d: str, col: str, full: float) -> float:
        spreads = []
        for f in os.listdir(d):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(d, f)).metadata
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        spreads.append(
                            (c.statistics.max - c.statistics.min) / full
                        )
        return sum(spreads) / len(spreads)

    fu, fv = float(hi_u - lo_u), float(hi_v - lo_v)
    for col, full in [("user_id", fu), ("value", fv)]:
        plain = mean_spread(plain_dir, col, full)
        z = mean_spread(z_dir, col, full)
        assert z < 0.55 * plain, (col, z, plain)


def test_runtime_bloom_filter_prunes_fact_scan(spark):
    """Big-big join posture: when neither side broadcasts, Catalyst
    injects a runtime bloom filter built from the selective (filtered)
    side and pushes might_contain() onto the fact scan — rows that can't
    join die at the scan, before the shuffle. The size thresholds are
    scaled down to this fixture (at real scale the 10 GB default
    application-side threshold triggers naturally)."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        # sf0.1 regardless of SF_DIR: at sf0.001 both sides are a few KB
        # and the optimizer's cost heuristic (rightly) declines the filter.
        # load() first — it runs ensure_tuned, which restores the 64 MB
        # broadcast threshold; the no-broadcast override must outlive it.
        li = load(spark, "/root/testdata/sf0.1", "lineitem")
        o = load(spark, "/root/testdata/sf0.1", "orders").filter(
            F.col("o_totalprice") > 500000
        )
        for k, v in confs.items():
            spark.conf.set(k, v)
        assert spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.enabled"
        ) == "true"
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .count()
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain("formatted")
        p = buf.getvalue()
        assert "might_contain" in p, "no runtime bloom filter injected"
        assert "bloom_filter_agg" in p
        # the membership probe must sit on the lineitem (application) side
        probe = [l for l in p.splitlines() if "might_contain" in l]
        assert any("l_orderkey" in l for l in probe), probe
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark):
    """Skew posture: AQE detects a hot key at RUNTIME from map-output
    stats and splits its shuffle partition across tasks — no salting, no
    code change. Thresholds scaled to the fixture; at 100 TB the 256 MB
    defaults trigger naturally. (operators/scale.py::salted_join remains
    the static fallback for engines/paths where AQE can't apply.)"""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
        fact = spark.range(0, 300000).select(
            F.when(F.col("id") % 10 < 9, 0)
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            (F.rand(7) * 1000).alias("v"),
        )
        dim = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = fact.join(dim, "k")
        rows = j.collect()
        assert len(rows) == 300000  # every fact row matches exactly one dim
        p = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in p, "AQE did not split the skewed partition"
        assert "skewed" in p.lower()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_band_join_exact_boundaries_and_cross_cell(spark):
    """Band join finds pairs exactly at the band edge and pairs whose
    cells differ (neighbor-probe coverage), and emits each pair once."""
    import datetime as dt

    from plc_data_etl_pipeline_spark.operators.scale import band_join

    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def t(sec, us=0):
        return base + dt.timedelta(seconds=sec, microseconds=us)

    left = spark.createDataFrame(
        [(1, t(100)), (2, t(500))], "id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (10, t(40)),        # exactly -60s from id 1: in band
            (11, t(160)),       # exactly +60s from id 1: in band
            (12, t(160, 1)),    # 60s + 1us: out of band
            (13, t(119)),       # same pair, different cell than id 1
            (14, t(505)),       # near id 2
        ],
        "id long, ts timestamp",
    )
    got = sorted(
        (r.l_id, r.r_id, r.dt_us)
        for r in band_join(left, right, "ts", "ts", 60_000_000).collect()
    )
    assert got == [
        (1, 10, -60_000_000),
        (1, 11, 60_000_000),
        (1, 13, 19_000_000),
        (2, 14, 5_000_000),
    ]


def test_constrained_heap_spills_instead_of_oom(tmp_path):
    """Executed spill-safety proof for the 100 TB posture: the sf1
    fact-fact shuffle join and the flagship rollup must COMPLETE — with
    correct row counts — inside a deliberately undersized 1.5g driver
    heap (the round-2 audit showed the default 1g heap dying on far
    smaller state when spill paths are mis-sized). Runs in a fresh
    subprocess because heap size is fixed at JVM launch."""
    import json
    import subprocess
    import sys

    from scripts.make_sf1 import is_ready, make

    if not is_ready("/tmp/sf1", 10):
        make("/root/testdata/sf0.1", "/tmp/sf1", 10)

    import duckdb

    con = duckdb.connect()
    want_join = con.sql(
        "SELECT COUNT(*) FROM read_parquet('/tmp/sf1/lineitem.parquet') l "
        "JOIN read_parquet('/tmp/sf1/orders.parquet') o "
        "ON l.l_orderkey = o.o_orderkey WHERE o.o_orderstatus = 'F'"
    ).fetchone()[0]
    con.close()

    prog = """
import json, sys
from plc_data_etl_pipeline_spark.session import get_spark
from plc_data_etl_pipeline_spark.registry import all_queries
spark = get_spark("spill-proof")
spark.conf.set("spark.sql.shuffle.partitions", "64")
spark.sparkContext.setLogLevel("ERROR")
out = {
    "heap": spark.sparkContext._conf.get("spark.driver.memory"),
    "join": all_queries()["join_inner"].fn(spark, "/tmp/sf1").count(),
    "sensor": all_queries()["sensor_rollup_daily"].fn(spark, "/tmp/sf1").count(),
}
print("RESULT:" + json.dumps(out))
"""
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="1500m")
    proc = subprocess.run(
        [sys.executable, "-c", prog],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = next(
        ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT:")
    )
    got = json.loads(line[len("RESULT:"):])
    assert got["heap"] == "1500m"
    assert got["join"] == want_join
    assert got["sensor"] == 150  # 5 event types x 30 days
