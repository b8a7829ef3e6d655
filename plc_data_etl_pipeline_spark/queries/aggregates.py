"""Aggregation operator family (SURVEY.md §2.2 — ABSENT in reference).

The reference's only grouping-adjacent logic is the micro-batch count at
consumer/sensor_data_consumer.py:85-89; the analytic aggregation surface
is Spark-native. Every aggregate here uses partial (map-side) aggregation
automatically; group-key cardinality is low, so the post-shuffle reduce is
tiny regardless of input scale.

Float determinism: SUM/AVG go through the exact scaled-integer convention
(queries/_conv.py); genuinely order-dependent stats (stddev/var/corr/
median) are ROUNDed to 4 digits on both engines (error ~1e-8 vs boundary
5e-5 — see _conv.py rationale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query
from ._conv import cents, davg, dsum, sql_cents, sql_davg, sql_dsum


@query(
    "agg_basic",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_base_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price', scale=4)},
           {sql_davg('l_quantity', 'avg_qty')},
           {sql_davg('l_extendedprice', 'avg_price')},
           CAST(MIN(l_shipdate) AS DATE) AS min_shipdate,
           CAST(MAX(l_shipdate) AS DATE) AS max_shipdate,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: sum/avg/min/max/count per flag."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity", "sum_qty"),
        dsum("l_extendedprice", "sum_base_price"),
        dsum(
            F.col("l_extendedprice") * (1 - F.col("l_discount")),
            "sum_disc_price",
            scale=4,
        ),
        davg("l_quantity", "avg_qty"),
        davg("l_extendedprice", "avg_price"),
        F.min("l_shipdate").cast("date").alias("min_shipdate"),
        F.max("l_shipdate").cast("date").alias("max_shipdate"),
        F.count("*").alias("count_order"),
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT o_orderpriority,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(DISTINCT o_orderstatus) AS n_statuses,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — Spark expands to a two-phase partial-distinct
    aggregate (expand + two shuffles), still fully distributed."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
        F.count("*").alias("n_orders"),
    )


@query(
    "agg_stats",
    oracle="""
    SELECT event_type,
           ROUND(STDDEV_SAMP(value), 4) AS sd_value,
           ROUND(VAR_SAMP(value), 4) AS var_value,
           ROUND(CORR(value, CAST(user_id AS DOUBLE)), 4) AS corr_vu,
           ROUND(COVAR_SAMP(value, CAST(user_id AS DOUBLE)), 4) AS covar_vu,
           ROUND(QUANTILE_CONT(value, 0.5), 4) AS median_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev/variance/corr/covar/median.

    median: Spark ``percentile`` and DuckDB ``quantile_cont`` both linearly
    interpolate over the sorted values — same formula, rounded to 4.

    corr is spelled covar_pop/(stddev_pop·stddev_pop) with try_divide:
    Spark's native corr() raises DIVIDE_BY_ZERO under ANSI mode when
    either side is constant (a stuck-at sensor stream), while DuckDB's
    CORR returns NULL — the manual form yields NULL on both engines
    (adversarial-fixture-tested).
    """
    ev = load(spark, sf_dir, "events")
    # Pairwise-complete masking: corr is defined over rows where BOTH
    # sides are non-null. covar_pop already pairwise-deletes, but a
    # bare stddev_pop("value") would average over rows whose partner
    # is NULL — masking each side on the other's null reproduces the
    # native CORR semantics exactly (adversarial NULL fixture).
    uid = F.when(
        F.col("value").isNotNull(), F.col("user_id").cast("double")
    )
    val = F.when(F.col("user_id").isNotNull(), F.col("value"))
    corr = F.try_divide(
        F.covar_pop(val, uid), F.stddev_pop(val) * F.stddev_pop(uid)
    )
    return ev.groupBy("event_type").agg(
        F.round(F.stddev_samp("value"), 4).alias("sd_value"),
        F.round(F.var_samp("value"), 4).alias("var_value"),
        F.round(corr, 4).alias("corr_vu"),
        F.round(F.covar_samp(F.col("value"), uid), 4).alias("covar_vu"),
        F.round(F.percentile(F.col("value"), F.lit(0.5)), 4).alias("median_value"),
    )


@query(
    "agg_rollup",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice', 'sum_price')}
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    HAVING COUNT(*) > 0
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: hierarchical subtotals (status, status+priority, grand).

    Empty-input semantics: Spark's grouping-set aggregates (Expand +
    hash agg) emit ZERO rows on an empty relation, while ANSI engines
    emit the grand-total () group once. The oracle's HAVING COUNT(*)>0
    is a no-op on any non-empty input (every emitted group covers >= 1
    row) and removes exactly that phantom row on empty — pinned by
    tests/test_empty_input_sweep.py."""
    o = load(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice", "sum_price"),
    )


@query(
    "agg_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n_items,
           {sql_dsum('l_quantity', 'sum_qty')}
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    HAVING COUNT(*) > 0
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all grouping-set combinations incl. grand total.

    HAVING COUNT(*)>0 in the oracle: see agg_rollup — aligns the ANSI
    grand-total-on-empty row with Spark's zero-rows-on-empty."""
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_items"),
        dsum("l_quantity", "sum_qty"),
    )


@query("agg_approx_distinct", oracle=None)  # HLL sketch — engine-specific
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): the 100 TB-scale answer to
    COUNT(DISTINCT) — single shuffle of fixed-size sketches instead of the
    two-phase exact expansion. Rows-only check here; the pytest suite
    asserts the estimate is within 5% of exact (SURVEY §5.2.5)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_orders"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
    )


@query("agg_heavy_hitters", oracle=None)  # frequency sketch — engine-specific
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most frequent terms via ``approx_top_k`` (Spark 4 frequency
    sketch): the 100 TB heavy-hitters answer — per-partition sketches of
    bounded size merge in one reduce instead of shuffling the full
    term-count table and globally sorting it. With maxItemsTracked=10000
    far above the fixture vocabulary the counts are exact; pytest asserts
    equality with the exact group-by (SURVEY §5.2.5). Output is exploded
    to scalar columns (driver canonicalizer: no top-level arrays)."""
    from ..operators import text as T

    d = load(spark, sf_dir, "documents")
    sk = (
        d.select(F.explode(T.tokens("text")).alias("term"))
        .agg(F.expr("approx_top_k(term, 10, 10000)").alias("tk"))
        .select(F.explode("tk").alias("e"))
        .select(F.col("e.item").alias("term"), F.col("e.count").alias("cnt"))
    )
    return sk.orderBy(F.desc("cnt"), "term")


@query(
    "agg_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice', 'sum_price')}
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    HAVING COUNT(*) > 0
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (by status, by priority, grand total) —
    the general form behind rollup/cube, via the SQL entry point.
    Oracle HAVING COUNT(*)>0: see agg_rollup (empty-input alignment)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs_v")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n_orders,
               CAST(SUM(FLOOR(o_totalprice * 100 + 0.5)) AS DOUBLE)
                 / 100 AS sum_price
        FROM orders_gs_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@query(
    "agg_unpivot",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             CAST(SUM(FLOOR(l_quantity * 100 + 0.5)) AS DOUBLE) / 100
               AS sum_qty,
             CAST(SUM(FLOOR(l_extendedprice * 100 + 0.5)) AS DOUBLE) / 100
               AS sum_price
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS val FROM s
    UNION ALL
    SELECT l_returnflag, 'sum_price' AS measure, sum_price AS val FROM s
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide -> long melt) of a two-measure aggregate: the
    relational inverse of agg_pivot. Spark's unpivot is a zero-shuffle
    Expand over the already-aggregated (tiny) result."""
    li = load(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        dsum("l_quantity", "sum_qty"), dsum("l_extendedprice", "sum_price")
    )
    return wide.unpivot("l_returnflag", ["sum_qty", "sum_price"], "measure", "val")


@query(
    "agg_string_agg",
    oracle="""
    SELECT o_orderpriority,
           STRING_AGG(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
             AS statuses,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG/STRING_AGG): collect_set ->
    array_sort -> array_join gives a deterministic comma list regardless of
    row arrival order — the only safe way to emit collected values through
    an order-insensitive hash compare. Distinct-set size is bounded by the
    status domain (3), so the collected state stays tiny at any scale."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias(
            "statuses"
        ),
        F.count("*").alias("n_orders"),
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via mergeable roaring-style bitmaps
    (Spark 4 bitmap_construct_agg) — the exact counterpart of the
    agg_hll_union sketch path: per-(group, 32k-id bucket) bitmaps whose
    cardinalities SUM to the exact distinct count.

    Why it scales better than COUNT(DISTINCT): the shuffled state is one
    ≤4 KB bitmap per (group, bucket) instead of every distinct value
    (COUNT DISTINCT expands rows through an Expand + two-level agg), and
    bucket bitmaps are mergeable — incremental refreshes OR new bitmaps
    into stored ones without rescanning history. ids map 1-based
    (bitmap_bit_position is 1-based; user_id 0 would otherwise drop)."""
    ev = load(spark, sf_dir, "events")
    per_bucket = ev.groupBy(
        "event_type",
        F.expr("bitmap_bucket_number(user_id + 1)").alias("bkt"),
    ).agg(
        F.expr(
            "bitmap_count(bitmap_construct_agg(bitmap_bit_position(user_id + 1)))"
        ).alias("cnt")
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum("cnt").alias("n_users")
    )


@query(
    "agg_grouping_id",
    oracle="""
    SELECT COALESCE(l_returnflag, '<all>') AS returnflag,
           COALESCE(l_linestatus, '<all>') AS linestatus,
           CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INT) AS g_status,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    HAVING COUNT(*) > 0
    """,
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() flags over a ROLLUP: the standard way to tell a real
    NULL key from a subtotal row — every BI tool's cube reader depends
    on it. COALESCE folds the subtotal NULLs to a sentinel so the flags
    carry the distinction. One Expand + partial/final agg, same cost
    envelope as agg_rollup; oracle HAVING COUNT(*)>0 likewise (see
    agg_rollup's empty-input note)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("linestatus"),
            "g_flag", "g_status", "n",
        )
    )


@query(
    "agg_filtered",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           {sql_dsum("o_totalprice", "rev_all")},
           CAST(COALESCE(SUM({sql_cents("o_totalprice")})
                  FILTER (WHERE o_orderstatus = 'F'), 0) AS DOUBLE) / 100
             AS rev_finished,
           BOOL_AND(o_totalprice > 0) AS all_positive,
           BOOL_OR(o_totalprice > 400000) AS any_jumbo
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered/boolean aggregate surface: COUNT FILTER (count_if),
    conditional exact-cents SUM FILTER, BOOL_AND/BOOL_OR per group — the
    one-pass alternative to self-joining per condition. All aggregates
    remain map-side partial; the FILTER predicate evaluates per row
    inside the same hash-aggregate, so the fact table is scanned once
    for all six measures."""
    o = load(spark, sf_dir, "orders")
    fin = F.col("o_orderstatus") == "F"
    return o.groupBy("o_orderpriority").agg(
        F.count_if(fin).alias("n_finished"),
        dsum("o_totalprice", "rev_all"),
        (
            F.coalesce(
                F.sum(F.when(fin, cents("o_totalprice"))), F.lit(0)
            ).cast("double")
            / 100
        ).alias("rev_finished"),
        F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_jumbo"),
    )


@query(
    "agg_argmax",
    oracle=f"""
    SELECT event_type,
           ARG_MIN(user_id, event_id) AS first_user,
           ARG_MAX(user_id, event_id) AS last_user,
           ARG_MAX(event_id,
                   CASE WHEN NOT isnan(value) AND abs(value) <= 1000000.0
                        THEN {sql_cents("value")} * 10000000000 + event_id
                   END)
             AS peak_value_event
    FROM events
    GROUP BY event_type
    """,
)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARG_MAX/ARG_MIN (max_by/min_by): 'value of column A at the
    extreme of column B' without a join-back — one pass, mergeable
    partial state (the pair (best_key, payload) merges associatively,
    so it scales exactly like min/max). Ordering keys are made unique
    (event_id; value packed with event_id for the tiebreak) so the
    answer is deterministic in both engines."""
    ev = load(spark, sf_dir, "events")
    # Packing envelope: cents*1e10 + event_id needs |cents| < 9.2e8,
    # i.e. |value| <= 1e6 (the shared exact-moment envelope). Readings
    # beyond it have a NULL key and are skipped by max_by/ARG_MAX
    # identically on both engines (round-8 extreme-float sweep).
    v = F.col("value")
    peak_key = F.when(
        ~F.isnan(v) & (F.abs(v) <= F.lit(1000000.0)),
        cents("value") * F.lit(10000000000) + F.col("event_id"),
    )
    return ev.groupBy("event_type").agg(
        F.min_by("user_id", "event_id").alias("first_user"),
        F.max_by("user_id", "event_id").alias("last_user"),
        F.max_by("event_id", peak_key).alias("peak_value_event"),
    )


@query(
    "agg_pivot_multi",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F_n,
           CAST(COALESCE(SUM({sql_cents("o_totalprice")})
                  FILTER (WHERE o_orderstatus = 'F'), 0) AS DOUBLE) / 100
             AS F_rev,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O_n,
           CAST(COALESCE(SUM({sql_cents("o_totalprice")})
                  FILTER (WHERE o_orderstatus = 'O'), 0) AS DOUBLE) / 100
             AS O_rev,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P_n,
           CAST(COALESCE(SUM({sql_cents("o_totalprice")})
                  FILTER (WHERE o_orderstatus = 'P'), 0) AS DOUBLE) / 100
             AS P_rev
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_pivot_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-measure PIVOT: each pivoted status column carries BOTH a
    count and an exact-cents revenue (Spark suffixes the aggregate
    alias per pivot value). The status domain is listed explicitly —
    at 100 TB the values-known form skips the extra distinct-values
    job and keeps the pivot a single pass."""
    o = load(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),  # count("*") is illegal in pivot
            (F.sum(cents("o_totalprice")).cast("double") / 100).alias("rev"),
        )
    )
    # A pivot cell with no contributing rows is NULL; the FILTER-based
    # oracle (and most BI expectations) say 0 — normalize explicitly.
    return piv.select(
        "o_orderpriority",
        *[
            F.coalesce(
                F.col(c), F.lit(0 if c.endswith("_n") else 0.0)
            ).alias(c)
            for c in piv.columns[1:]
        ],
    )


@query(
    "agg_crosstab",
    oracle="""
    SELECT o_orderpriority AS o_orderpriority_o_orderstatus,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS F,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS O,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS P
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def agg_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contingency table (df.stat.crosstab): priority x status counts —
    the quick two-way frequency audit. Spark implements it as one
    hash-aggregate over the pair plus a tiny pivot of the distinct
    statuses; the oracle states the pivoted counts directly. The status
    domain is the TPC-H constant {F,O,P}, so the pivoted schema is
    stable across scale factors — crosstab() itself derives columns
    from the DATA, so absent statuses (e.g. an empty partition's
    replica of this table) are padded with zero columns here to keep
    the schema stable by construction (round-8 empty-input sweep)."""
    o = load(spark, sf_dir, "orders")
    ct = o.stat.crosstab("o_orderpriority", "o_orderstatus")
    for c in ("F", "O", "P"):
        if c not in ct.columns:
            ct = ct.withColumn(c, F.lit(0).cast("bigint"))
    return ct.select(
        "o_orderpriority_o_orderstatus",
        *[F.col(c).alias(c) for c in ("F", "O", "P")],
    )


@query("agg_count_min_sketch", oracle=None)  # sketch binary — engine-specific
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation (Cormode & Muthukrishnan
    2005) — the mergeable point-frequency sibling of the HLL/bitmap
    cardinality sketches: per-group CMS binaries built map-side
    (``count_min_sketch`` aggregate, eps=0.001, conf=0.99, fixed seed),
    merged driver-side through the JVM sketch library (counter
    matrices ADD, so merge order is irrelevant), then probed for the
    exact top-10 heaviest users. Measured geometry at these params:
    depth 7 x width 2000 counters, ~112 KB serialized per group. Output pairs every estimate with the
    exact count so the CMS one-sided-error contract (est >= exact,
    est - exact <= eps * N w.p. conf) is directly visible — the pytest
    locks both bounds.

    Scale shape: the shuffled state is one ~112 KB sketch per group
    instead of every distinct key; sketches OR into stored ones for
    incremental refresh exactly like the bitmap path. The driver
    collects ONLY |groups| sketch binaries and 10 probe keys — both
    bounded. The exact side is a TakeOrdered top-10, not a global
    sort. Rows-only: the sketch layout is engine-specific (Spark's
    CountMinSketch wire format), so there is no cross-engine oracle;
    correctness is pinned by the error-contract pytest instead."""
    ev = load(spark, sf_dir, "events")
    per_group = ev.groupBy("event_type").agg(
        F.count_min_sketch(
            "user_id", F.lit(0.001), F.lit(0.99), F.lit(42)
        ).alias("cms")
    )
    jvm = spark.sparkContext._jvm
    merged = None
    for row in sorted(per_group.collect(), key=lambda r: r["event_type"]):
        sk = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
            bytes(row["cms"])
        )
        if merged is None:
            merged = sk
        else:
            merged.mergeInPlace(sk)
    top = (
        ev.groupBy("user_id")
        .agg(F.count("*").alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "user_id")
        .limit(10)
        .collect()
    )
    rows = [
        (
            r["user_id"],
            r["exact_n"],
            int(merged.estimateCount(jvm.java.lang.Long(int(r["user_id"])))),
        )
        for r in top
    ]
    return spark.createDataFrame(
        rows, "user_id long, exact_n long, est_n long"
    )
