"""Classic decision-support query shapes (TPC-H Q2/Q7/Q8/Q10/Q13-Q19/Q22
adapted to the driver's reduced star schema — no partsupp table, so
part-cost shapes source prices from lineitem).

These widen SURVEY.md §2.2 relational coverage with the optimizer-hard
shapes a warehouse engine must get right: correlated aggregate
subqueries (Q17), min-per-group join-back (Q2), disjunctive predicate
pushdown (Q19), grouped outer-join distributions (Q13), HAVING on a
grouped fact (Q18), scalar-subquery thresholds (Q15/Q22), and
ratio-of-sums market shares (Q8/Q14).

Scale posture: every dimension side is broadcast (part/supplier/nation
at any realistic SF; customer at test SF only where noted), every
aggregate is partial/map-side, and the only full-fact shuffles are the
unavoidable groupBy-key exchanges. Money math uses the exact
scaled-integer convention from ``_conv`` so results hash-match DuckDB
bit-for-bit; thresholds computed from those exact sums are single IEEE
ops on identical operands, so comparisons agree across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query
from ._conv import cents, dsum, sql_cents, sql_dsum


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH p AS (SELECT p_partkey, p_name FROM part WHERE p_size = 15),
         pl AS (SELECT l.l_partkey, l.l_suppkey,
                       {price_c} AS price_c
                FROM lineitem l JOIN p ON p.p_partkey = l.l_partkey),
         m AS (SELECT l_partkey, MIN(price_c) AS min_c FROM pl GROUP BY l_partkey)
    SELECT DISTINCT p.p_partkey, p.p_name, s.s_name, n.n_name,
           CAST(m.min_c AS DOUBLE) / 100 AS min_price
    FROM pl
    JOIN m ON m.l_partkey = pl.l_partkey AND pl.price_c = m.min_c
    JOIN p ON p.p_partkey = pl.l_partkey
    JOIN supplier s ON s.s_suppkey = pl.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    """.format(price_c=sql_cents("l.l_extendedprice")),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape (partsupp-free): cheapest supplier per selected part —
    min-per-group then join back on the exact integer-cents price.

    Plan: part filter broadcasts into the lineitem scan (one fact pass),
    the per-part MIN is a partial agg on the pruned rows only, and the
    join-back keys on (partkey, exact cents) so float equality is never
    consulted. Supplier/nation broadcast. At 100 TB the pruned subset is
    |parts(size=15)| * lines-per-part — still a hash-agg, never a sort.
    """
    p = load(spark, sf_dir, "part").filter(F.col("p_size") == 15).select(
        "p_partkey", "p_name"
    )
    li = load(spark, sf_dir, "lineitem")
    pl = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "p_partkey", "p_name", "l_suppkey",
        cents("l_extendedprice").alias("price_c"),
    )
    m = pl.groupBy("p_partkey").agg(F.min("price_c").alias("min_c"))
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return (
        pl.join(m, ["p_partkey"])
        .filter(F.col("price_c") == F.col("min_c"))
        .select("p_partkey", "p_name", "l_suppkey", "min_c")
        .distinct()
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "p_partkey", "p_name", "s_name", "n_name",
            (F.col("min_c").cast("double") / 100).alias("min_price"),
        )
        .distinct()
    )


@query(
    "q7_nation_volume",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(YEAR(l.l_shipdate) AS INT) AS ship_year,
           {rev}
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY n1.n_name, n2.n_name, CAST(YEAR(l.l_shipdate) AS INT)
    """.format(
        rev=sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue", 4)
    ),
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: bilateral trade volume between two nations per ship year.

    Plan: supplier+nation broadcast prunes lineitem to the two supplier
    nations BEFORE the orders join (the only big-big join), then the
    customer-side nation filter prunes again. Group keys are tiny
    (2 x years) so the final agg is map-side dominated.
    """
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    sn = s.join(F.broadcast(n1), s.s_nationkey == F.col("s_nkey")).filter(
        F.col("supp_nation").isin("NATION_1", "NATION_2")
    )
    cn = c.join(F.broadcast(n2), c.c_nationkey == F.col("c_nkey")).filter(
        F.col("cust_nation").isin("NATION_1", "NATION_2")
    )
    return (
        li.join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cn, o.o_custkey == cn.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", 4))
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT CAST(YEAR(o.o_orderdate) AS INT) AS order_year,
           CAST(SUM(CASE WHEN n1.n_name = 'NATION_2' THEN {rev_c} ELSE 0 END)
                AS DOUBLE)
             / CAST(SUM({rev_c}) AS DOUBLE) AS mkt_share
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n2.n_regionkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    GROUP BY CAST(YEAR(o.o_orderdate) AS INT)
    """.format(rev_c=sql_cents("l.l_extendedprice * (1 - l.l_discount)", 4)),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: one nation's share of ECONOMY-part revenue sold into
    ASIA-region customers, per order year.

    Ratio-of-sums determinism: both numerator and denominator are exact
    BIGINT cent sums; the share is ONE double division of identical
    operands, so it hash-matches DuckDB without rounding. All dims
    broadcast; lineitem shuffles once for the orders join.
    """
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n2 = (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(F.col("n_nationkey").alias("c_nkey"))
    )
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    cn = c.join(F.broadcast(n2), c.c_nationkey == F.col("c_nkey")).select("c_custkey")
    rev_c = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(sn), li.l_suppkey == sn.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(cn, o.o_custkey == cn.c_custkey)
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_2", rev_c).otherwise(F.lit(0))
            ).alias("_nat_c"),
            F.sum(rev_c).alias("_tot_c"),
        )
        .select(
            "order_year",
            (F.col("_nat_c").cast("double") / F.col("_tot_c").cast("double")).alias(
                "mkt_share"
            ),
        )
    )


@query(
    "q10_returned_revenue",
    oracle="""
    SELECT c.c_custkey, c.c_name, {rev}, c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1996-04-01'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY SUM({rev_c}) DESC, c.c_custkey
    LIMIT 20
    """.format(
        rev=sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue", 4),
        rev_c=sql_cents("l.l_extendedprice * (1 - l.l_discount)", 4),
    ),
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: top-20 customers by lost revenue from returned items in
    one quarter. The LIMIT is deterministic because the sort key is the
    exact integer-cents revenue with c_custkey as tiebreak.

    Plan: the orderdate filter pushes into the orders scan, the
    returnflag filter into lineitem; the quarter slice is small so AQE
    demotes the orders-lineitem join to broadcast at runtime. Top-20 is
    TakeOrderedAndProject — no full sort.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    rev_c = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(rev_c).alias("_rev_c"))
        .orderBy(F.col("_rev_c").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey", "c_name",
            (F.col("_rev_c").cast("double") / 10000).alias("revenue"),
            "c_acctbal", "n_name",
        )
    )


@query(
    "q13_order_count_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    ) t
    GROUP BY c_count
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: distribution of per-customer order counts, where the
    join predicate (not a WHERE) excludes one priority class — customers
    with zero qualifying orders must still appear with c_count = 0.

    Plan: outer join keyed on custkey, COUNT(o_orderkey) counts only
    matched rows (null-skipping), then a second tiny agg over the
    distinct counts. Both aggs partial; the second groupBy key
    cardinality is ~max orders-per-customer (tiny).
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


@query(
    "q14_promo_share",
    oracle="""
    SELECT 100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {rev_c} ELSE 0 END)
                        AS DOUBLE)
                 / CAST(SUM({rev_c}) AS DOUBLE) AS promo_share
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-02-01'
    """.format(rev_c=sql_cents("l.l_extendedprice * (1 - l.l_discount)", 4)),
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: percentage of one month's revenue from PROMO parts.

    Determinism: numerator/denominator are exact BIGINT cent sums; the
    result is 100.0 * num / den evaluated left-to-right in both engines
    — two IEEE ops on identical operands. Part broadcasts; the month
    filter pushes into the lineitem scan (row-group pruning on shipdate).
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-02-01")
    )
    p = load(spark, sf_dir, "part")
    rev_c = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.sum(
                F.when(F.col("p_type") == "PROMO", rev_c).otherwise(F.lit(0))
            ).alias("_promo_c"),
            F.sum(rev_c).alias("_tot_c"),
        )
        .select(
            (
                F.lit(100.0)
                * F.col("_promo_c").cast("double")
                / F.col("_tot_c").cast("double")
            ).alias("promo_share")
        )
    )


@query(
    "q15_top_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey, SUM({rev_c}) AS total_c
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(rev.total_c AS DOUBLE) / 10000 AS total_revenue
    FROM rev JOIN supplier s ON s.s_suppkey = rev.l_suppkey
    WHERE rev.total_c = (SELECT MAX(total_c) FROM rev)
    """.format(rev_c=sql_cents("l_extendedprice * (1 - l_discount)", 4)),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: supplier(s) achieving the maximum quarterly revenue
    (a scalar-subquery threshold over a derived view). Exact integer
    cents make the max-equality tie-safe across engines.

    Plan: one partial agg over the quarter slice, a broadcast of the
    1-row max, and a broadcast supplier join — the fact table is read
    once. At 100 TB the rev view is |suppliers| rows: still tiny.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)).alias(
            "total_c"
        )
    )
    mx = rev.agg(F.max("total_c").alias("_max_c"))
    s = load(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.total_c == F.col("_max_c"))
        .join(F.broadcast(s), rev.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey", "s_name",
            (F.col("total_c").cast("double") / 10000).alias("total_revenue"),
        )
    )


@query(
    "q16_supplier_count_by_part",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 5, 9, 13)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_count_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: distinct supplier counts per part attribute triple,
    excluding a denylist of suppliers (NOT IN subquery -> broadcast
    anti-join; the denylist is null-free so NOT IN == anti-join).

    Plan: part filter broadcasts, the anti-join side is 6 rows, and
    COUNT(DISTINCT) expands to a two-level agg (distinct-first) on the
    (brand,type,size,suppkey) key — partial on both levels.
    """
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 9, 13)
    )
    bad = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH p AS (SELECT p_partkey FROM part
               WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'),
         pa AS (SELECT l.l_partkey,
                       CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS DOUBLE)
                         / COUNT(*) AS avg_qty
                FROM lineitem l JOIN p ON p.p_partkey = l.l_partkey
                GROUP BY l.l_partkey)
    SELECT CAST(SUM({price_c}) AS DOUBLE) / 100 / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN pa ON pa.l_partkey = l.l_partkey
    WHERE l.l_quantity < 0.2 * pa.avg_qty
    """.format(price_c=sql_cents("l.l_extendedprice")),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: revenue from below-average-quantity orders of a part
    subset — the classic correlated aggregate subquery, decorrelated
    into a per-part average joined back to the fact.

    Determinism: quantities are integer-valued, so avg_qty is one exact
    division and 0.2*avg_qty one IEEE multiply — the strict comparison
    agrees across engines. Plan: the avg is computed ONLY over the
    filtered parts (semi-join pushdown), the join-back broadcasts the
    tiny per-part average table, and the fact is scanned once per side.
    """
    part_keys = (
        load(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL"))
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem")
    pruned = li.join(F.broadcast(part_keys), li.l_partkey == F.col("p_partkey"))
    pa = pruned.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast("bigint")).cast("double") / F.count("*")
        ).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(pa), ["l_partkey"])
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            (F.sum(cents("l_extendedprice")).cast("double") / 100 / 7.0).alias(
                "avg_yearly"
            )
        )
    )


@query(
    "q18_large_orders",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           CAST(o.o_orderdate AS DATE) AS o_orderdate,
           o.o_totalprice, t.sum_qty
    FROM (
      SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS BIGINT)) > 300
    ) t
    JOIN orders o ON o.o_orderkey = t.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: orders whose total quantity exceeds 300 units, with
    their customers (HAVING on a grouped fact, then enrich).

    Plan: the heavy groupBy runs FIRST, shrinking lineitem to the ~0.3%
    of orders that qualify; the survivors broadcast into orders (AQE
    picks this up from runtime stats), so neither orders nor customer
    shuffles. Quantities summed as BIGINT — exact.
    """
    li = load(spark, sf_dir, "lineitem")
    t = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        t.join(o, t.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "o_totalprice", "sum_qty",
        )
    )


@query(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT {rev}
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """.format(
        rev=sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue", 4)
    ),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: revenue under three OR'd brand/size/quantity triples —
    the canonical disjunctive-pushdown test.

    Plan: Catalyst extracts the common sub-predicates per side —
    l_quantity BETWEEN 1 AND 30 pushes into the lineitem scan and the
    brand/size disjunction into the part scan — before the broadcast
    join evaluates the full residual. One fact pass, no shuffle (single
    scalar output row).
    """
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(cond).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", 4)
    )


@query(
    "q22_idle_customers",
    oracle="""
    WITH ab AS (
      SELECT CAST(SUM({bal_c}) AS DOUBLE) / 100 / COUNT(*) AS avg_bal
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey, COUNT(*) AS numcust, {tot}
    FROM customer c
    WHERE c.c_acctbal > (SELECT avg_bal FROM ab)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-06-01')
    GROUP BY c.c_nationkey
    """.format(
        bal_c=sql_cents("c_acctbal"),
        tot=sql_dsum("c.c_acctbal", "totacctbal"),
    ),
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: above-average-balance customers with no recent orders
    (scalar-subquery threshold + date-windowed NOT EXISTS anti-join),
    grouped by nation.

    Determinism: the threshold is exact-cents-sum / 100 / count — the
    same two IEEE ops both engines run — so the strict > agrees. Plan:
    the 1-row average broadcasts (crossJoin of a broadcast scalar, no
    collect), the anti-join side is pre-filtered by the pushed-down
    date predicate, and the final agg groups on 25 nation keys.
    """
    c = load(spark, sf_dir, "customer")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(cents("c_acctbal")).cast("double") / 100 / F.count("*")
            ).alias("avg_bal")
        )
    )
    recent = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "2000-06-01")
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("numcust"), dsum("c_acctbal", "totacctbal"))
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: orders per priority class that have at least one line
    shipped after the order date (correlated EXISTS with a non-equi
    correlate -> left-semi join with the date comparison as residual).

    Plan: the quarter filter pushes into the orders scan first; the
    semi-join never duplicates orders, so the final count needs no
    dedup. The lineitem side prunes to (l_orderkey, l_shipdate) only.
    """
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM({prod_c}) AS DOUBLE) / 10000 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24.0
    """.format(prod_c=sql_cents("l_extendedprice * l_discount", 4)),
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: the canonical scan-and-sum — revenue delta from a
    discount-policy change, three conjunctive filters, no join at all.
    Every predicate pushes into the parquet scan (row-group pruning on
    shipdate); the single-row answer is a map-side partial sum.
    l_discount is an exact 2-decimal value, so the BETWEEN bounds
    compare exactly in both engines; the price*discount product is an
    exact 4-decimal -> integer-cents sum."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            (
                F.sum(cents(F.col("l_extendedprice") * F.col("l_discount"), 4))
                .cast("double")
                / 10000
            ).alias("revenue")
        )
    )


@query(
    "q9_product_profit",
    oracle="""
    SELECT n.n_name AS nation, CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
           CAST(SUM({profit_c}) AS DOUBLE) / 10000 AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, CAST(YEAR(o.o_orderdate) AS INT)
    """.format(
        profit_c=sql_cents(
            "l.l_extendedprice * (1 - l.l_discount)"
            " - p.p_retailprice * l.l_quantity",
            4,
        )
    ),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape (partsupp-free): profit per supplier nation per year for
    a part-name pattern — revenue minus cost, where cost uses
    p_retailprice*quantity in place of the missing ps_supplycost.

    Determinism: the profit expression is exact at scale 4 (price and
    retailprice are 2-decimal, discount 2-decimal, quantity integer),
    so the signed cents sum is exact. Plan: the LIKE filter broadcasts
    the pruned part list into the fact scan; supplier/nation broadcast;
    the only big-big join is orders.
    """
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    profit = cents(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity"),
        4,
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg((F.sum(profit).cast("double") / 10000).alias("profit"))
    )


@query(
    "q12_priority_class_by_segment",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY c.c_mktsegment
    """,
)
def q12_priority_class_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape (shipmode-free): conditional CASE counts — high- vs
    low-priority orders per market segment for one year. The classic
    pivot-in-aggregate pattern: one pass, two conditional sums, no
    second grouping. Customer broadcasts under AQE after the year
    filter shrinks orders."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    c = load(spark, sf_dir, "customer")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )
