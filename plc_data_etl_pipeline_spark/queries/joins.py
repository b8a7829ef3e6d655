"""Join operator family (SURVEY.md §2.2 — ABSENT in reference, Spark-native).

Scale posture: the fact-side tables (lineitem/orders/events) shuffle on the
join key only when both sides are large; dimension sides (region/nation/
supplier, and customer at test SF) are explicitly ``broadcast()`` so the
plan is a BroadcastHashJoin with NO shuffle of the fact table. At 100 TB
the same hints hold (dims stay small); AQE converts sort-merge back to
broadcast at runtime if a filtered side shrinks below the threshold.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load, session_tmp_path, shuffle_partitions
from ..registry import query
from ._conv import dsum, sql_dsum

# As-of top-1 packing (shared by join_asof / join_asof_tolerance): pack
# (date, key) into ONE BIGINT so the per-left-row top-1 is a plain
# hash-aggregatable MAX. Numeric order on the packed value IS
# lexicographic (latest date, highest key) order while key < 2^43
# (TPC-H orderkeys reach ~6e12 around SF 100k — comfortably inside).
_ASOF_KEY_BITS = 43


def _pack_date_key(date_col: str, key_col: str) -> F.Column:
    return (
        F.unix_date(F.col(date_col).cast("date")).cast("long")
        * F.lit(1 << _ASOF_KEY_BITS)
        + F.col(key_col)
    )


def _unpack_date_key(m: str, key_alias: str, date_alias: str) -> list:
    """NULL-propagating unpack — safe under LEFT semantics."""
    return [
        (F.col(m) % F.lit(1 << _ASOF_KEY_BITS)).alias(key_alias),
        F.date_from_unix_date(
            F.shiftright(F.col(m), _ASOF_KEY_BITS).cast("int")
        ).alias(date_alias),
    ]


@query(
    "join_inner",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_quantity,
           o.o_orderstatus, o.o_totalprice
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join fact-to-fact; filter pushed below the join on the
    orders side so only 'F' orders shuffle (or broadcast under AQE)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_linenumber", "l_quantity", "o_orderstatus", "o_totalprice"
    )


@query(
    "join_left",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers without orders (nulls)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "join_semi",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_mktsegment
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000.0)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with at least one big order.
    Semi-join never duplicates the left side — no post-join dedup shuffle."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no orders at all."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_range",
    oracle="""
    SELECT s.s_suppkey, s.s_name, c.c_custkey, s.s_acctbal, c.c_acctbal
    FROM supplier s JOIN customer c
      ON s.s_nationkey = c.c_nationkey AND s.s_acctbal < c.c_acctbal
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi key (nation) + range predicate (acctbal). The equi
    part drives the hash join; the inequality is a post-join filter in the
    same stage. Supplier is tiny -> broadcast, zero shuffle of customer."""
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    return (
        F.broadcast(s)
        .join(c, (s.s_nationkey == c.c_nationkey) & (s.s_acctbal < c.c_acctbal))
        .select("s_suppkey", "s_name", "c_custkey", "s_acctbal", "c_acctbal")
    )


@query(
    "join_asof",
    oracle="""
    WITH ranked AS (
      SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e JOIN orders o
        ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
      WHERE e.event_type = 'purchase'
    )
    SELECT event_id, user_id, o_orderkey,
           CAST(o_orderdate AS DATE) AS asof_orderdate
    FROM ranked WHERE rn = 1
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase event, the most recent order of that
    customer at-or-before the event time. Spark lacks a native ASOF JOIN;
    the scalable pattern is equi-join on the entity key + per-left-row
    top-1. The top-1 is a MAX over (epoch_day << 43 | o_orderkey) packed
    into ONE BIGINT: numeric order on the packed value IS lexicographic
    (latest date, highest key) order while o_orderkey < 2^43 (TPC-H keys
    reach ~6e12 around SF 100k — comfortably inside), so the max is the
    deterministic as-of match. Packing matters physically: MAX(BIGINT) is
    hash-aggregatable, while MAX(struct) forces SortAggregate with a
    per-partition sort on both sides of the shuffle (measured ~1.7x
    slower). An aggregate beats the row_number() window either way
    because max() partial-aggregates map-side: each candidate set
    collapses to one row BEFORE the event_id shuffle."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    o = load(spark, sf_dir, "orders")
    joined = ev.join(
        o, (ev.user_id == o.o_custkey) & (o.o_orderdate <= ev.ts)
    )
    return (
        joined.groupBy("event_id", "user_id")
        .agg(F.max(_pack_date_key("o_orderdate", "o_orderkey")).alias("m"))
        .select(
            "event_id",
            "user_id",
            *_unpack_date_key("m", "o_orderkey", "asof_orderdate"),
        )
    )


@query(
    "join_multiway",
    oracle=f"""
    SELECT n.n_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue', scale=4)},
           COUNT(*) AS n_items
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN supplier s ON s.s_nationkey = n.n_nationkey
    JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE r.r_name IN ('ASIA', 'EUROPE') AND o.o_orderstatus <> 'P'
    GROUP BY n.n_name
    """,
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 5-way star join + aggregation. All dimension sides
    (region, nation, supplier) broadcast, so lineitem is scanned once.

    The orders join contributes no output columns and ``o_orderkey`` is
    the orders primary key, so the inner join is rewritten to LEFT SEMI
    on the pruned key column (classic PK/FK join elimination): no row
    multiplication, no orders payload through the plan, and the planner
    is free to hash-build the single-column side. At 100 TB the same
    semi join runs as a shuffled semi (or a Bloom-filter pushdown under
    AQE) — still strictly cheaper than the inner form. The oracle keeps
    the plain inner join; equivalence is exactly the PK argument."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "EUROPE"))
    n = load(spark, sf_dir, "nation")
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") != "P")
        .select("o_orderkey")
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(o, li.l_orderkey == o.o_orderkey, "left_semi")
        .groupBy("n_name")
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
                scale=4,
            ),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "join_right",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_custkey, c.c_name
    FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (kept distinct from join_left to exercise the
    build/probe-side swap in the physical plan)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "right").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name"
    )


@query(
    "join_full",
    oracle="""
    WITH big_cust AS (SELECT * FROM customer WHERE c_acctbal > 7000.0),
         big_ord  AS (SELECT * FROM orders WHERE o_totalprice > 250000.0)
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM big_cust c FULL OUTER JOIN big_ord o ON c.c_custkey = o.o_custkey
    """,
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join on filtered sides: unmatched rows survive from
    BOTH inputs with nulls on the other side."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 7000.0)
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 250000.0)
    return c.join(o, c.c_custkey == o.o_custkey, "full").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "join_cross",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN (SELECT * FROM nation WHERE n_nationkey < 5) n
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product of two tiny bounded inputs (the only
    place a cross join is ever acceptable; the plan audit forbids
    accidental ones elsewhere)."""
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 5)
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "join_fuzzy_levenshtein",
    oracle="""
    SELECT a.s_suppkey AS key_a, b.s_suppkey AS key_b,
           levenshtein(a.s_name, b.s_name) AS edit_dist
    FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
    WHERE levenshtein(a.s_name, b.s_name) <= 2
    """,
)
def join_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching via edit distance — the record-linkage
    primitive (near-identical entity names). The pair space is the
    (dimension-sized) supplier table squared — inherently O(n^2) work,
    but made distributable and band-limited:

    * the stream side is repartitioned to ``spark.sql.shuffle.partitions``
      — a single-file dimension otherwise runs the whole nested-loop
      join in ONE task (sf5 audit: 50k x 50k pairs pinned one core for
      25+ minutes while 31 idled);
    * ``|len(a) - len(b)| <= 2`` (a necessary condition for ed <= 2)
      sits in the join condition over per-row precomputed lengths, so
      pairs are rejected before any DP;
    * the survivor pairs use the threshold form ``levenshtein(a, b, 2)``
      (banded DP, O(k*L) per pair with early exit, -1 when above the
      bound) instead of the full O(L^2) matrix.

    At corpus (non-dimension) scale you'd gate the quadratic behind LSH
    candidates exactly like dedup_minhash does, with levenshtein as the
    verify stage."""
    s = load(spark, sf_dir, "supplier")
    n_shuffle = shuffle_partitions(spark)
    a = s.select(
        F.col("s_suppkey").alias("key_a"),
        F.col("s_name").alias("name_a"),
        F.length("s_name").alias("len_a"),
    ).repartition(n_shuffle)
    b = s.select(
        F.col("s_suppkey").alias("key_b"),
        F.col("s_name").alias("name_b"),
        F.length("s_name").alias("len_b"),
    )
    d = F.levenshtein("name_a", "name_b", 2)
    return (
        a.join(
            b,
            (F.col("key_a") < F.col("key_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= 2),
        )
        .filter(d >= 0)
        .select("key_a", "key_b", d.alias("edit_dist"))
    )


@query(
    "join_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue', scale=4)},
           CAST(o.o_orderdate AS DATE) AS o_orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l.l_orderkey
    LIMIT 10
    """,
)
def join_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered customers -> unshipped orders ->
    revenue per order, top 10. The classic 3-way join + agg + top-k plan.

    Scale posture: customer filtered to one segment still scales with SF,
    so it is NOT broadcast — both joins shuffle on their keys and AQE can
    re-plan the post-filter sides at runtime. The final top-10 is a
    TakeOrderedAndProject (no global sort materialization). The l_orderkey
    tiebreaker makes the LIMIT selection deterministic for the oracle
    compare (revenue ties are possible across the cut line)."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
                scale=4,
            )
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "join_salted_skew",
    oracle=f"""
    SELECT o.o_orderstatus,
           COUNT(*) AS n_items,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue', scale=4)}
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe salted join, oracle-checked against the PLAIN join: the
    big side's key is salted into 8 buckets, the small side replicated
    once per bucket, the join runs on (key, salt) — and the aggregate
    proves row multiplicity is preserved exactly (the salt changes
    execution, never semantics). The defense for power-law keys beyond
    what AQE's skew split handles (operators/scale.py:salted_join)."""
    from ..operators.scale import salted_join

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    j = salted_join(li, o, "l_orderkey", salt_buckets=8, how="inner")
    return j.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_items"),
        dsum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")),
            "revenue",
            scale=4,
        ),
    )


@query(
    "join_salted_hot",
    oracle=f"""
    WITH big AS (
      SELECT o_orderkey
      FROM orders, UNNEST(range(1, CASE WHEN o_orderkey % 1000 = 0
                                        THEN 501 ELSE 3 END)) AS t(i)
    )
    SELECT o.o_orderstatus,
           COUNT(*) AS n_rows,
           {sql_dsum('o.o_totalprice', 'total_price')}
    FROM big b JOIN orders o USING (o_orderkey)
    GROUP BY o.o_orderstatus
    """,
)
def join_salted_hot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-ONLY salted join (operators/scale.py::salted_join_hot) —
    the 100 TB refinement of join_salted_skew's blanket salting, which
    replicates the whole small side per bucket (measured at sf50: 600M
    replicated rows, guaranteed spill). Here a sampled pass detects the
    hot keys and only THEIR small-side rows replicate; cold keys join
    with zero overhead. The fixture plants real skew deterministically:
    every 1000th order explodes into 500 fact rows (others 2), so the
    sampler genuinely fires on the hot tail. The oracle is the PLAIN
    join — the salt must change execution, never semantics, whatever
    the sample detected."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    mult = F.when(F.col("o_orderkey") % 1000 == 0, F.lit(500)).otherwise(
        F.lit(2)
    )
    big = o.select(
        "o_orderkey",
        F.explode(F.sequence(F.lit(1), mult)).alias("__i"),
    ).select("o_orderkey")
    from ..operators.scale import salted_join_hot

    j = salted_join_hot(
        big,
        o,
        "o_orderkey",
        salt_buckets=8,
        how="inner",
        sample_fraction=0.5,
        hot_share=0.005,
    )
    return j.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_rows"),
        dsum("o_totalprice", "total_price"),
    )


@query(
    "join_shuffle_hash",
    oracle=f"""
    SELECT n.n_name,
           COUNT(*) AS n_customers,
           {sql_dsum('c.c_acctbal', 'total_acctbal')}
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def join_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy control surface: SHUFFLE_HASH hint forces a
    ShuffledHashJoin (no sort phase on either side) where the planner
    would default to broadcast/sort-merge — the right call when both
    sides are large but one partition's build side fits memory, and
    sorting would dominate (plan locked by tests/test_plans.py).
    Results are strategy-invariant, which is exactly what the oracle
    check proves."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation").hint("shuffle_hash")
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_customers"),
            dsum("c_acctbal", "total_acctbal"),
        )
    )


@query(
    "join_band_time",
    oracle="""
    SELECT a.event_id AS err_id, b.event_id AS buy_id,
           epoch_us(b.ts) - epoch_us(a.ts) AS dt_us
    FROM events a JOIN events b
      ON ABS(epoch_us(b.ts) - epoch_us(a.ts)) <= 60000000
    WHERE a.event_type = 'error' AND b.event_type = 'purchase'
    """,
)
def join_band_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyless band join: every purchase within +-60s of an error event —
    NO shared key exists, so a naive theta join is a cartesian. The
    bucketed band join (operators/scale.py:band_join) cells event time
    into band-width buckets and probes only neighbor cells; the oracle
    is the brute-force inequality join, proving the bucketing loses no
    pair and invents none."""
    from ..operators.scale import band_join

    ev = load(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select("event_id", "ts")
    buys = ev.filter(F.col("event_type") == "purchase").select("event_id", "ts")
    j = band_join(errors, buys, "ts", "ts", band_us=60_000_000)
    return j.select(
        F.col("l_event_id").alias("err_id"),
        F.col("r_event_id").alias("buy_id"),
        "dt_us",
    )


@query(
    "join_asof_tolerance",
    oracle="""
    WITH ranked AS (
      SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      FROM events e LEFT JOIN orders o
        ON e.user_id = o.o_custkey
           AND o.o_orderdate <= e.ts
           AND o.o_orderdate >= e.ts - INTERVAL 90 DAY
      WHERE e.event_type = 'purchase'
    )
    SELECT event_id, user_id, o_orderkey,
           CAST(o_orderdate AS DATE) AS asof_orderdate
    FROM ranked WHERE rn = 1
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness tolerance (pandas merge_asof
    ``tolerance`` analog): the most recent order at-or-before each
    purchase event, but only within a 90-day window — events whose
    nearest order is staler keep NULLs (LEFT semantics), the standard
    contract for sensor/price lookups where an old reading is worse
    than none.

    Plan shape: same packed-BIGINT max aggregate as join_asof (map-side
    partial, no window sort); the tolerance bound ALSO shrinks the
    intermediate join — at 100 TB the [ts-90d, ts] band is what keeps
    the per-event candidate set constant as history grows. LEFT
    semantics come from joining the aggregated matches back to the
    event spine (NULL-propagating unpack)."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    o = load(spark, sf_dir, "orders")
    joined = ev.join(
        o,
        (ev.user_id == o.o_custkey)
        & (o.o_orderdate <= ev.ts)
        & (o.o_orderdate >= ev.ts - F.expr("INTERVAL 90 DAYS")),
    )
    matches = joined.groupBy("event_id").agg(
        F.max(_pack_date_key("o_orderdate", "o_orderkey")).alias("m")
    )
    return (
        ev.select("event_id", "user_id")
        .join(matches, "event_id", "left")
        .select(
            "event_id",
            "user_id",
            *_unpack_date_key("m", "o_orderkey", "asof_orderdate"),
        )
    )


@query(
    "join_bucketed_colocated",
    oracle=f"""
    SELECT c_mktsegment, COUNT(*) AS n,
           {sql_dsum("o_totalprice", "revenue")}
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free co-located join via bucketed layout: both sides are
    written ``bucketBy(8, custkey)`` + sorted, so the join reads
    pre-partitioned, pre-sorted buckets and the SortMergeJoin needs NO
    Exchange on either side (plan-locked in tests/test_plans.py). This
    is THE layout strategy for a 100 TB fact table joined on the same
    key every day — the shuffle is paid once at write time, then every
    subsequent join is bucket-local. The only Exchange left in this
    plan belongs to the final rollup."""
    import os
    import shutil
    import tempfile

    from ..operators.scale import write_bucketed

    base = session_tmp_path(spark, "bucketed")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    for name, df, key in (
        ("bkt_orders", o, "o_custkey"),
        ("bkt_customer", c, "c_custkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        path = os.path.join(base, name)
        shutil.rmtree(path, ignore_errors=True)
        write_bucketed(
            df, name, key, 8, sort_col=key, path=path, align_tasks=True
        )
    # merge hint pins SortMergeJoin (at test SF the planner would
    # broadcast the tiny side, hiding the bucket-locality being proven;
    # at 100 TB SMJ is what the planner picks anyway).
    joined = spark.table("bkt_orders").hint("merge").join(
        spark.table("bkt_customer"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"), dsum("o_totalprice", "revenue")
    )


@query(
    "join_dynamic_partition_prune",
    oracle=f"""
    SELECT event_type, COUNT(*) AS n,
           {sql_dsum("value", "sum_value")}
    FROM events
    WHERE dayofweek(CAST(ts AS DATE)) = 0
    GROUP BY event_type
    """,
)
def join_dynamic_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact side is a Hive-partitioned
    (by day) copy of events; the dim side is a date spine filtered to
    Sundays — a predicate on a DIM attribute, so the matching fact
    partitions are unknowable at plan time. Catalyst inserts a
    dynamicpruning subquery that reuses the broadcast dim to skip
    non-Sunday partition directories entirely (no listing, no scan
    tasks) — the runtime analog of static partition pruning, and the
    single biggest scan saver on date-partitioned 100 TB facts joined
    to filtered dims. The oracle states the Sunday rollup from raw
    events (DuckDB dayofweek: Sunday=0; Spark: Sunday=1), so pruning
    is value-checked; the dynamicpruning plan shape is locked in
    tests/test_plans.py."""
    import shutil
    import tempfile

    ev = load(spark, sf_dir, "events")
    path = session_tmp_path(spark, "dpp_fact")
    shutil.rmtree(path, ignore_errors=True)
    staged = ev.withColumn("day", F.to_date("ts"))
    staged.write.partitionBy("day").parquet(path)
    # explicit schema: an EMPTY frame's partitionBy write leaves no
    # data files and inference fails (round-8 empty-input sweep)
    fact = spark.read.schema(staged.schema).parquet(path)
    dim = (
        spark.sql(
            "SELECT explode(sequence(DATE'2024-01-01', DATE'2024-01-31')) AS day"
        )
        .withColumn("dow", F.dayofweek("day"))
    )
    return (
        fact.join(F.broadcast(dim.where(F.col("dow") == 1)), "day")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), dsum("value", "sum_value"))
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH ranked AS (
      SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY ABS(epoch_us(e.ts)
                            - epoch_us(CAST(o.o_orderdate AS TIMESTAMP))),
                        o.o_orderdate, o.o_orderkey) AS rn
      FROM events e LEFT JOIN orders o
        ON e.user_id = o.o_custkey
           AND o.o_orderdate >= e.ts - INTERVAL 45 DAY
           AND o.o_orderdate <= e.ts + INTERVAL 45 DAY
      WHERE e.event_type = 'signup'
    )
    SELECT event_id, user_id, o_orderkey,
           CAST(o_orderdate AS DATE) AS nearest_orderdate
    FROM ranked WHERE rn = 1
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, nearest-in-either-direction (pandas merge_asof
    ``direction='nearest'``): each signup event picks the order with
    the smallest |event − order| time distance within a ±45-day band,
    ties broken earlier-date-then-key; events with no order in the
    band keep NULLs. Distances are exact integer microseconds
    (epoch space, UTC-pinned), so the argmin is hash-stable.

    Plan: banded equi-join on user (the band keeps per-event candidates
    constant as history grows) → ONE map-side-combinable MIN of a
    (distance, date, key) struct per event — no per-event window sort,
    same shape as join_asof's packed max — then a NULL-propagating
    join back to the event spine for LEFT semantics."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "signup")
    o = load(spark, sf_dir, "orders")
    od_ts = F.to_timestamp(o.o_orderdate)
    joined = ev.join(
        o,
        (ev.user_id == o.o_custkey)
        & (o.o_orderdate >= ev.ts - F.expr("INTERVAL 45 DAYS"))
        & (o.o_orderdate <= ev.ts + F.expr("INTERVAL 45 DAYS")),
    )
    # ts reads as TIMESTAMP_NTZ; the session TZ is pinned UTC, so the
    # cast to instant is exact and matches DuckDB's epoch_us.
    dist = F.abs(
        F.unix_micros(ev.ts.cast("timestamp"))
        - F.unix_micros(od_ts.cast("timestamp"))
    )
    best = joined.groupBy("event_id").agg(
        F.min(
            F.struct(
                dist.alias("d"),
                F.unix_micros(od_ts.cast("timestamp")).alias("od_us"),
                o.o_orderkey.alias("k"),
            )
        ).alias("b")
    )
    spine = ev.select("event_id", "user_id")
    return spine.join(best, "event_id", "left").select(
        "event_id",
        "user_id",
        F.col("b.k").alias("o_orderkey"),
        F.to_date(F.timestamp_micros(F.col("b.od_us"))).alias(
            "nearest_orderdate"
        ),
    )


@query(
    "join_asof_forward",
    oracle="""
    WITH ranked AS (
      SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
             ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY o.o_orderdate ASC, o.o_orderkey ASC) AS rn
      FROM events e LEFT JOIN orders o
        ON e.user_id = o.o_custkey AND o.o_orderdate >= e.ts
      WHERE e.event_type = 'error'
    )
    SELECT event_id, user_id, o_orderkey,
           CAST(o_orderdate AS DATE) AS next_orderdate
    FROM ranked WHERE rn = 1
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, FORWARD direction (merge_asof direction='forward'):
    for each error event, the customer's NEXT order at-or-after the
    event — "did the error precede churn or a reorder?". Completes the
    as-of family (backward: join_asof; tolerance; nearest). Same
    packed-BIGINT trick as join_asof but inverted: MIN over
    (epoch_day << 43 | o_orderkey) yields earliest-date-lowest-key —
    one map-side-combinable aggregate, no per-event window sort — then
    a NULL-propagating join back to the event spine for LEFT
    semantics (events with no later order keep NULLs)."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    o = load(spark, sf_dir, "orders")
    joined = ev.join(
        o, (ev.user_id == o.o_custkey) & (o.o_orderdate >= ev.ts)
    )
    best = joined.groupBy("event_id").agg(
        F.min(_pack_date_key("o_orderdate", "o_orderkey")).alias("m")
    )
    spine = ev.select("event_id", "user_id")
    return spine.join(best, "event_id", "left").select(
        "event_id",
        "user_id",
        *_unpack_date_key("m", "o_orderkey", "next_orderdate"),
    )


@query(
    "join_interval_overlap",
    oracle="""
    WITH spans AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             MIN(epoch_us(ts)) AS a_start, MAX(epoch_us(ts)) AS a_end
      FROM events GROUP BY 1, 2
    ), errs AS (
      SELECT epoch_us(ts) - 1800000000 AS b_start,
             epoch_us(ts) + 1800000000 AS b_end
      FROM events WHERE event_type = 'error' AND value >= 450
    )
    SELECT s.user_id, s.day,
           COUNT(*) AS n_error_windows,
           CAST(SUM(LEAST(s.a_end, e.b_end)
                    - GREATEST(s.a_start, e.b_start)) AS DOUBLE) / 1e6
             AS overlap_sec_total
    FROM spans s JOIN errs e
      ON s.a_start < e.b_end AND e.b_start < s.a_end
    GROUP BY 1, 2
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join (both sides are INTERVALS — distinct from
    join_band_time's point-vs-band shape): each user's per-day activity
    span [first event, last event] against every +-30-minute window
    around a CRITICAL error event (value >= 450); report, per user-day,
    how many critical-error windows the user's activity overlapped and
    the total overlap seconds.

    Cardinality honesty: overlap-join output is data-determined — dense
    interval sets overlap quadratically no matter the algorithm, so the
    interesting window set must be selective (here the critical-error
    filter, pushed to the scan). The grid join's candidate count,
    sum over bins of |A_bin| x |B_bin|, is tight against the true pair
    count for windows shorter than a bin (an activity span covering an
    hour overlaps most windows inside it), so the plan does output-
    proportional work — the optimum for this operator class.

    Scale posture: a naive overlap theta-join is a cartesian. Instead
    both interval sets are EXPLODED onto a fixed one-hour epoch grid
    (``sequence`` over integer bin ids — an activity span covers <= 25
    bins, an error window <= 2) and equi-joined ON BIN, so the shuffle
    is hash-partitioned by time bucket and each task sees only the
    intervals that share an hour — the standard grid-blocking scheme
    for spatial/temporal overlap joins (cf. Spark's own range-join hint
    binning). Bin-duplicate pairs are collapsed with dropDuplicates on
    the pair key before aggregation. The plan lock asserts no
    CartesianProduct/BroadcastNestedLoopJoin survives.

    Determinism: overlap length is exact BIGINT microseconds summed as
    BIGINT, divided once to seconds — bit-identical to the oracle.
    """
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    half_window_us = 1_800_000_000  # +-30 min
    bin_us = 3_600_000_000  # one-hour grid
    ev = load(spark, sf_dir, "events")
    spans = ev.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.min(us).alias("a_start"), F.max(us).alias("a_end"))
    errs = ev.filter(
        (F.col("event_type") == "error") & (F.col("value") >= 450)
    ).select(
        F.col("event_id").alias("err_id"),
        (us - half_window_us).alias("b_start"),
        (us + half_window_us).alias("b_end"),
    )
    a = spans.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.expr(f"a_start div {bin_us}"), F.expr(f"a_end div {bin_us}")
            )
        ),
    )
    b = errs.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.expr(f"b_start div {bin_us}"), F.expr(f"b_end div {bin_us}")
            )
        ),
    )
    pairs = (
        a.join(b, "bin")
        .filter(
            (F.col("a_start") < F.col("b_end"))
            & (F.col("b_start") < F.col("a_end"))
        )
        .select(
            "user_id",
            "day",
            "err_id",
            (
                F.least("a_end", "b_end") - F.greatest("a_start", "b_start")
            ).alias("overlap_us"),
        )
        .dropDuplicates(["user_id", "day", "err_id"])
    )
    return pairs.groupBy("user_id", "day").agg(
        F.count("*").alias("n_error_windows"),
        (F.sum("overlap_us").cast("double") / F.lit(1e6)).alias(
            "overlap_sec_total"
        ),
    )


@query(
    "join_bloom_runtime",
    oracle=f"""
    SELECT l.l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue",
                     scale=4)}
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY l.l_returnflag
    """,
)
def join_bloom_runtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join: urgent-order revenue by return flag,
    planned so Catalyst injects a bloom filter built from the filtered
    orders side into the lineitem scan
    (``might_contain(xxhash64(l_orderkey))`` ahead of the shuffle) —
    the Spark-native runtime-filter pattern that replaces a hand-built
    semi-join reduction when BOTH join sides are fact-sized: at 100 TB
    the filtered dimension of this join is tens of GB (no broadcast),
    and without the bloom the full lineitem table shuffles only to
    drop ~80% of it at the merge join.

    InjectRuntimeFilter declines when the creation side is small
    enough to broadcast (the bloom would be redundant with the
    broadcast-hash probe), which at bench SFs is always — so the confs
    that make the plan scale-representative (no auto-broadcast, no
    application-side size floor) are applied ONLY around an eager
    materialization of the small aggregated result inside this
    function and restored in a finally block; the session the driver
    shares sees no conf drift. The bloom is a pure pruner — false
    positives just pass through to the exact join condition — so the
    result is bit-identical to the plain join the oracle states.
    The tiny grouped result is finalized (materialize + release) so no
    checkpoint blocks outlive the call.
    """
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    plan = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_items"),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
                scale=4,
            ),
        )
    )
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter"
        ".applicationSideScanSizeThreshold": "0",
        # InjectRuntimeFilter also DECLINES when the creation side
        # exceeds creationSideThreshold (default 10 MB) — exactly the
        # tens-of-GB regime this query targets. Raise it so the demo
        # keeps injecting at probe SFs; real deployments budget this
        # against executor memory (the bloom broadcasts to every task).
        "spark.sql.optimizer.runtime.bloomFilter"
        ".creationSideThreshold": "8GB",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        # conf-set INSIDE the try: if any set() is rejected midway the
        # finally still restores the ones already applied, so the shared
        # session never keeps partial conf drift (ADVICE r5).
        for k, v in confs.items():
            spark.conf.set(k, v)
        out = plan.localCheckpoint()  # eager: runs under the bloom plan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
    from ..operators.graph import _register_round_state, finalize_round_result

    # 3-grouping-key result: materialize and free the checkpoint blocks
    # immediately — nothing stays resident after the call.
    st = _register_round_state(out, out)
    return finalize_round_result(st, st)
