"""Scalar-function family (SURVEY.md §2.2): string, date, math, JSON,
array. The reference's only scalar transform is epoch→timestamp
(consumer/sensor_data_consumer.py:131-134, covered by the pipeline parity
module); everything else is the Spark-native function surface.

All expressions here are JVM-side built-ins inside whole-stage codegen —
no Python UDFs in any hot path. Transcendental results (ln/pow) are
rounded to 6 digits: Java's Math.log and C's libm may differ in the last
ulp (~1e-16 relative), far below the 5e-7 rounding boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load
from ..registry import query
from ._conv import cents, quant


@query(
    "scalar_string",
    oracle="""
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           SUBSTRING(p_name, 1, 8) AS name_prefix,
           p_brand || '/' || p_type AS brand_type,
           LENGTH(p_name) AS name_len,
           REGEXP_EXTRACT(p_brand, '[0-9]+') AS brand_num,
           SPLIT_PART(p_type, ' ', 1) AS type_head,
           REPLACE(p_type, ' ', '_') AS type_snake,
           TRIM(LOWER(p_name)) AS name_lower
    FROM part
    """,
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions: upper/lower/substring/concat/length/regexp/
    split/replace/trim over the part table."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.regexp_extract("p_brand", "[0-9]+", 0).alias("brand_num"),
        F.split("p_type", " ").getItem(0).alias("type_head"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.trim(F.lower("p_name")).alias("name_lower"),
    )


@query(
    "scalar_date",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS order_year,
           CAST(MONTH(o_orderdate) AS INT) AS order_month,
           CAST(DAY(o_orderdate) AS INT) AS order_day,
           CAST(QUARTER(o_orderdate) AS INT) AS order_quarter,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           DATEDIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since_95,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due_date,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS iso_date
    FROM orders
    """,
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions: year/month/day/quarter extraction, month
    truncation, day arithmetic, date difference, formatting."""
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("order_year"),
        F.month(d).alias("order_month"),
        F.dayofmonth(d).alias("order_day"),
        F.quarter(d).alias("order_quarter"),
        F.date_trunc("month", d).cast("date").alias("month_start"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
        F.date_add(d.cast("date"), 30).alias("due_date"),
        F.date_format(d, "yyyy-MM-dd").alias("iso_date"),
    )


@query(
    "scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           FLOOR((FLOOR(l_extendedprice * 100 + 0.5)
                  * FLOOR((1 - l_discount) * 100 + 0.5)
                  * FLOOR((1 + l_tax) * 100 + 0.5) + 5000) / 10000) / 100
             AS charged,
           ABS(l_discount - 0.05) AS disc_dev,
           CAST(FLOOR(l_quantity / 10.0) AS BIGINT) AS qty_bucket,
           CAST(CEIL(l_extendedprice / 1000.0) AS BIGINT) AS price_k,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
           CAST(FLOOR(LN(l_extendedprice + 1.0) * 1000000.0 + 0.5) AS DOUBLE)
             / 1000000.0 AS log_price,
           CAST(FLOOR(SQRT(l_quantity) * 1000000.0 + 0.5) AS DOUBLE)
             / 1000000.0 AS sqrt_qty,
           CAST(FLOOR(POWER(l_discount, 2) * 1000000.0 + 0.5) AS DOUBLE)
             / 1000000.0 AS disc_sq,
           CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS disc_sign,
           GREATEST(l_discount, l_tax) AS max_rate,
           LEAST(l_discount, l_tax) AS min_rate
    FROM lineitem
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math functions: round/abs/floor/ceil/mod/ln/sqrt/power/sign/
    greatest/least over lineitem (TPC-H charge formula)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # Exact-integer money arithmetic: the charge is an exact 6-decimal
        # rational that can tie at the .xx5 rounding boundary, so the
        # half-up round to cents is done on the exact integer micros
        # ((p6 + 5000) div 10^4) — tie-safe and identical in both engines,
        # without the decimal-type cost (see _conv.py; cents() rationale
        # for floor-instead-of-ROUND).
        (
            F.floor(
                (
                    cents("l_extendedprice")
                    * cents(F.lit(1) - F.col("l_discount"))
                    * cents(F.lit(1) + F.col("l_tax"))
                    + 5000
                )
                / 10000
            ).cast("double")
            / 100
        ).alias("charged"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor(F.col("l_quantity") / 10.0).alias("qty_bucket"),
        F.ceil(F.col("l_extendedprice") / 1000.0).alias("price_k"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
        quant(F.log(F.col("l_extendedprice") + 1.0)).alias("log_price"),
        quant(F.sqrt("l_quantity")).alias("sqrt_qty"),
        quant(F.pow("l_discount", F.lit(2))).alias("disc_sq"),
        F.signum(F.col("l_discount") - 0.05).alias("disc_sign"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


@query(
    "scalar_json",
    oracle="""
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           json_extract_string(props, '$.missing') AS missing_val
    FROM events
    WHERE props IS NOT NULL
    """,
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props payload column (the driver
    fixture's semi-structured field — FIXTURES.md §2); missing paths yield
    NULL in both engines."""
    ev = load(spark, sf_dir, "events").filter(F.col("props").isNotNull())
    return ev.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
        F.get_json_object("props", "$.missing").alias("missing_val"),
    )


@query(
    "scalar_json_struct",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
    """,
)
def scalar_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json into a typed struct (schema-on-read for semi-structured
    columns) + predicate on the parsed field."""
    from pyspark.sql.types import LongType, StructField, StructType

    ev = load(spark, sf_dir, "events")
    schema = StructType([StructField("k", LongType())])
    parsed = ev.select(
        "event_id", F.from_json("props", schema).alias("p")
    ).select("event_id", F.col("p.k").alias("k_val"))
    return parsed.filter(F.col("k_val") >= 50)


@query(
    "array_explode",
    oracle="""
    SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
    FROM documents
    WHERE doc_id < 100
    """,
)
def array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split + explode: one row per token (the building block for all the
    text-analysis operators in queries/extensions.py)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))


@query(
    "array_funcs",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           ROUND(list_aggregate(list_transform(embedding,
                 x -> CAST(x AS DOUBLE)), 'sum'), 4) AS vec_sum,
           ROUND(CAST(list_max(embedding) AS DOUBLE), 4) AS vec_max,
           embedding[1] AS first_elem,
           list_contains(list_transform(embedding, x -> x > 0.0), true) AS any_pos
    FROM embeddings
    WHERE vec_id < 100
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions over the embedding column: size,
    aggregate (sum via fold over doubles — same left-to-right order as
    DuckDB's list_aggregate), max, indexing, exists. All JVM-side."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(
            F.aggregate(
                F.transform("embedding", lambda x: x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            4,
        ).alias("vec_sum"),
        F.round(F.array_max("embedding").cast("double"), 4).alias("vec_max"),
        F.element_at("embedding", 1).alias("first_elem"),
        F.exists("embedding", lambda x: x > 0.0).alias("any_pos"),
    )


@query(
    "array_posexplode",
    oracle="""
    SELECT doc_id,
           CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INT) AS pos,
           unnest(string_split(text, ' ')) AS token
    FROM documents
    WHERE doc_id < 50
    """,
)
def array_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: token with its 0-based position (order-preserving
    explode — the building block for positional n-gram features)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token"))


@query(
    "scalar_map",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS status_val,
           o_orderpriority AS prio_val,
           2 AS n_keys,
           'priority' AS first_key
    FROM orders WHERE o_orderkey < 500
    """,
)
def scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: build a map column, read it back via element_at /
    map_keys / sorted key order. The oracle mirrors the *values* (map
    internals are Spark-side; the check proves the round trip)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("priority"), F.col("o_orderpriority"),
    )
    return o.select(
        "o_orderkey",
        F.element_at(m, "status").alias("status_val"),
        F.element_at(m, "priority").alias("prio_val"),
        F.size(m).alias("n_keys"),
        F.array_min(F.map_keys(m)).alias("first_key"),
    )


@query(
    "scalar_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice >= 200000 THEN 'large'
                WHEN o_totalprice >= 50000 THEN 'medium'
                ELSE 'small' END AS size_tier,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_or_open,
           CASE WHEN o_orderpriority LIKE '1%'
                  OR o_orderpriority LIKE '2%' THEN 1 ELSE 0 END AS is_urgent
    FROM orders
    """,
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional expression surface: CASE/WHEN tiering, NULLIF +
    COALESCE null plumbing, boolean-to-flag projection — all
    whole-stage-codegen expressions, no UDFs."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 200000, "large")
        .when(F.col("o_totalprice") >= 50000, "medium")
        .otherwise("small")
        .alias("size_tier"),
        F.coalesce(
            F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")
        ).alias("status_or_open"),
        F.when(
            F.col("o_orderpriority").like("1%")
            | F.col("o_orderpriority").like("2%"),
            1,
        )
        .otherwise(0)
        .alias("is_urgent"),
    )


@query(
    "scalar_variant",
    oracle="""
    SELECT o_orderkey, o_orderstatus AS status, o_totalprice AS price,
           CAST(o_orderkey % 7 AS BIGINT) AS shard
    FROM orders WHERE o_orderkey < 1000
    """,
)
def scalar_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VariantType surface (Spark 4 semi-structured type): serialize each
    row to JSON, parse_json() into a variant, then read typed paths back
    with variant_get. The oracle is the identity projection — the check
    proves the JSON->variant->typed-path roundtrip is lossless."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    j = F.to_json(
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("price"),
            F.struct((F.col("o_orderkey") % 7).alias("shard")).alias("meta"),
        )
    )
    v = F.parse_json(j)
    return o.select(
        "o_orderkey",
        F.variant_get(v, "$.status", "string").alias("status"),
        F.variant_get(v, "$.price", "double").alias("price"),
        F.variant_get(v, "$.meta.shard", "bigint").alias("shard"),
    )


@query(
    "scalar_try_cast",
    oracle="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
           TRY_CAST(event_type AS BIGINT) AS not_a_number,
           CAST(FLOOR((value / NULLIF(CAST(
                 TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) - 50
                 AS DOUBLE), 0)) * 1000000.0 + 0.5) AS DOUBLE) / 1000000.0
             AS ratio
    FROM events
    """,
)
def scalar_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe casts/arithmetic (ANSI-mode-proof ingestion): try_cast
    yields NULL instead of failing on malformed input; try_divide yields
    NULL on /0 (DuckDB twin: NULLIF denominator). The divide-by-zero rows
    (k=50) and the never-numeric event_type column exercise both NULL
    paths; quantized to 6 digits for cross-engine bit-equality."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("bigint")
    return ev.select(
        "event_id",
        k.alias("k_val"),
        F.col("event_type").try_cast("bigint").alias("not_a_number"),
        quant(F.try_divide(F.col("value"), (k - 50).cast("double")), 6).alias(
            "ratio"
        ),
    )


@query(
    "scalar_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS k_and,
           o_orderkey | 4096 AS k_or,
           xor(o_orderkey, 1365) AS k_xor,
           o_orderkey << 3 AS k_shl,
           o_orderkey >> 2 AS k_shr,
           CAST(bit_count(o_orderkey) AS INT) AS k_pop
    FROM orders WHERE o_orderkey < 1000
    """,
)
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar surface: AND/OR/XOR, shifts, popcount — the
    primitives the engine's own SimHash/bitmap operators build on,
    exercised as user-facing functions. Pure codegen projection over a
    pushed-down key filter."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("k_and"),
        k.bitwiseOR(F.lit(4096)).alias("k_or"),
        k.bitwiseXOR(F.lit(1365)).alias("k_xor"),
        F.shiftleft(k, 3).alias("k_shl"),
        F.shiftright(k, 2).alias("k_shr"),
        F.bit_count(k).alias("k_pop"),
    )


@query(
    "scalar_interval",
    oracle="""
    SELECT event_id,
           STRFTIME(ts + INTERVAL 90 MINUTE, '%Y-%m-%d %H:%M:%S')
             AS ts_plus_90m,
           STRFTIME(ts + INTERVAL 2 MONTH, '%Y-%m-%d') AS date_plus_2mo,
           CAST(FLOOR(epoch(ts)) AS BIGINT) AS epoch_s,
           CAST(isodow(ts) AS INT) AS iso_dow,
           CAST(FLOOR((FLOOR(epoch(ts))
                       - FLOOR(epoch(date_trunc('month', ts)))) / 60)
                AS BIGINT) AS mins_into_month
    FROM events
    """,
)
def scalar_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/timestamp arithmetic surface: add minute- and
    month-granularity intervals (month addition is calendar-aware),
    epoch extraction, ISO day-of-week, and elapsed-minutes arithmetic
    done in integer epoch space so both engines agree exactly.
    Timestamps cross the collect boundary as formatted strings
    (SURVEY §7.3)."""
    ev = load(spark, sf_dir, "events")
    epoch_s = F.unix_timestamp("ts")
    month_start = F.unix_timestamp(F.date_trunc("month", "ts"))
    return ev.select(
        "event_id",
        F.date_format(
            F.col("ts") + F.expr("INTERVAL 90 MINUTES"),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("ts_plus_90m"),
        F.date_format(
            F.col("ts") + F.expr("INTERVAL 2 MONTHS"), "yyyy-MM-dd"
        ).alias("date_plus_2mo"),
        epoch_s.alias("epoch_s"),
        (F.weekday("ts") + 1).cast("int").alias("iso_dow"),
        F.floor((epoch_s - month_start) / 60).alias("mins_into_month"),
    )


@query(
    "scalar_hash",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256,
           md5(text) = md5(md5(text)) AS md5_collision_sanity
    FROM documents WHERE doc_id < 200
    """,
)
def scalar_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic digest surface (md5 / sha-256): the
    engine-independent content keys behind dedup_exact's survivor
    election, sample_train_split's leak-free hashing, and every
    content-addressed artifact store. Both engines emit lowercase hex,
    so digests are directly comparable across systems — unlike
    xxhash64, whose seed/implementation is engine-specific (and which
    the engine therefore only uses internally)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        (F.md5("text") == F.md5(F.md5("text"))).alias(
            "md5_collision_sanity"
        ),
    )


@query(
    "array_explode_outer",
    oracle="""
    SELECT d.doc_id, t.tok
    FROM (SELECT doc_id,
                 list_filter(string_split(text, ' '),
                             x -> length(x) > 9) AS toks
          FROM documents) d
    LEFT JOIN LATERAL (SELECT UNNEST(d.toks) AS tok) t ON TRUE
    """,
)
def array_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: unlike plain explode, documents whose filtered
    token array is empty (no word longer than 9 chars) survive with a
    NULL token — the generator form that preserves the left row set,
    which matters whenever the exploded output is re-aggregated per
    document (a dropped doc would silently vanish from the rollup).
    Oracle is the LEFT JOIN LATERAL UNNEST equivalent."""
    docs = load(spark, sf_dir, "documents")
    toks = F.filter(
        F.split("text", " "), lambda x: F.length(x) > 9
    )
    return docs.select(
        "doc_id", F.explode_outer(toks).alias("tok")
    )


@query(
    "scalar_collation",
    oracle="""
    SELECT source,
           CAST(COUNT(DISTINCT LOWER(w)) AS BIGINT) AS n_ci,
           CAST(COUNT(DISTINCT w) AS BIGINT) AS n_cs
    FROM (SELECT source, string_split(text, ' ')[1] AS w FROM documents)
    GROUP BY source
    """,
)
def scalar_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware semantics (Spark 4 collated strings): distinct
    leading words per source counted under UTF8_LCASE — the collation
    makes DISTINCT itself case-insensitive, no LOWER() rewrite of the
    data — beside the case-sensitive count. The oracle expresses the
    same via LOWER() (equivalent on this ASCII corpus; collations go
    further on full Unicode). Collation participates in the hash
    aggregate directly, so the plan is the same two-level distinct
    count as any other column."""
    docs = load(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ").getItem(0)
    return (
        docs.select("source", w.alias("w"))
        .groupBy("source")
        .agg(
            F.countDistinct(F.expr("collate(w, 'UTF8_LCASE')")).alias("n_ci"),
            F.countDistinct("w").alias("n_cs"),
        )
    )
