"""Sort / limit / top-k and set-operation families (SURVEY.md §2.2).

Scale posture: global ORDER BY + LIMIT k compiles to TakeOrderedAndProject
(per-partition top-k then a k-row merge on the driver — no global sort
shuffle). Per-group top-k uses a partitioned window, not a global sort.
Set ops are hash-based distinct shuffles on the full row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load
from ..registry import query


@query(
    "sort_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 by price (unique tiebreaker o_orderkey). Physical plan
    is TakeOrderedAndProject — no full sort at any scale."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .limit(10)
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 5
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 orders per priority class: row_number window + filter — the
    scalable per-group top-k (one shuffle on the group key; Spark pushes a
    per-partition WindowGroupLimit before the shuffle since 3.5)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
    )


@query(
    "set_union",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000.0
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): building-segment customers ∪ big-order customers."""
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select(F.col("c_custkey").alias("custkey"))
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0).select(
        F.col("o_custkey").alias("custkey")
    )
    return c.union(o).distinct()


@query(
    "set_intersect",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000.0
    INTERSECT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): rich customers ∩ open-order customers."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000.0).select(
        F.col("c_custkey").alias("custkey")
    )
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    return c.intersect(o)


@query(
    "set_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): all customers minus those with finished orders."""
    c = load(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("custkey")
    )
    return c.subtract(o)


@query(
    "distinct_rows",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus,
           CAST(l_shipdate AS DATE) AS ship_date
    FROM lineitem
    """,
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a projection (hash-aggregate, map-side partials)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_returnflag", "l_linestatus", F.col("l_shipdate").cast("date").alias("ship_date")
    ).distinct()


@query(
    "set_ops_all",
    oracle="""
    WITH a AS (SELECT o_orderpriority, CAST(YEAR(o_orderdate) AS INT) AS yr
               FROM orders WHERE o_orderstatus = 'F'),
         b AS (SELECT o_orderpriority, CAST(YEAR(o_orderdate) AS INT) AS yr
               FROM orders WHERE o_orderstatus = 'O')
    SELECT 'intersect_all' AS op, *
    FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
    UNION ALL
    SELECT 'except_all' AS op, *
    FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
    """,
)
def set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiplicity-preserving set operations (INTERSECT ALL / EXCEPT
    ALL): bag semantics — a row appearing 3x in A and 2x in B survives
    INTERSECT ALL twice and EXCEPT ALL once. Spark plans both as a
    single aggregate producing per-row counts on each side followed by a
    generate (replicate min/diff count) — one shuffle per operator, no
    join explosion; DuckDB's bag operators are the oracle."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(
        "o_orderpriority", F.year("o_orderdate").alias("yr")
    )
    b = o.filter(F.col("o_orderstatus") == "O").select(
        "o_orderpriority", F.year("o_orderdate").alias("yr")
    )
    inter = a.intersectAll(b).select(
        F.lit("intersect_all").alias("op"), "o_orderpriority", "yr"
    )
    exc = a.exceptAll(b).select(
        F.lit("except_all").alias("op"), "o_orderpriority", "yr"
    )
    return inter.unionByName(exc)
