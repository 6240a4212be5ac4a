"""Scalar function queries (SURVEY.md §2 category H).

All expressions are built-in ``pyspark.sql.functions`` (JVM-side, inside
whole-stage codegen) — no Python UDFs in these paths. Cross-engine notes:
math fns (pow/log/exp) can differ by 1 ulp between JVM and libm, so their
outputs are rounded to 6dp (inputs are generic doubles, so decimal-grid
tie risk is negligible — unlike money, see functions/canonical.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_data_pipeline_spark.catalog import load_table
from etl_data_pipeline_spark.plans.registry import query


@query(
    "h1_string_funcs",
    oracle="""
    SELECT p_partkey,
           LOWER(p_name) AS name_lower,
           UPPER(p_brand) AS brand_upper,
           TRIM('  ' || p_name || ' ') AS name_trimmed,
           SUBSTR(p_name, 1, 4) AS name_prefix,
           p_brand || '/' || p_type AS brand_type,
           LENGTH(p_name) AS name_len,
           LPAD(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
           REGEXP_EXTRACT(p_name, '([a-z]+)$', 1) AS last_word,
           REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS devoweled,
           SPLIT_PART(p_name, ' ', 1) AS first_token,
           CONTAINS(p_name, 'red') AS has_red,
           STARTS_WITH(p_brand, 'Brand#1') AS brand_1x
    FROM part
    """,
)
def h1_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H1: string functions (lower/upper/trim/substr/concat/length/lpad/
    regexp_extract/regexp_replace/split/contains/startswith)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias(
            "name_trimmed"
        ),
        F.substring("p_name", 1, 4).alias("name_prefix"),
        F.concat_ws("/", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").cast("long").alias("name_len"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
        F.split("p_name", " ").getItem(0).alias("first_token"),
        F.col("p_name").contains("red").alias("has_red"),
        F.col("p_brand").startswith("Brand#1").alias("brand_1x"),
    )


@query(
    "h2_datetime_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS BIGINT) AS order_year,
           CAST(MONTH(o_orderdate) AS BIGINT) AS order_month,
           CAST(DAY(o_orderdate) AS BIGINT) AS order_day,
           CAST(DAYOFWEEK(o_orderdate) AS BIGINT) + 1 AS order_dow,
           CAST(QUARTER(o_orderdate) AS BIGINT) AS order_quarter,
           CAST(CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS VARCHAR) AS month_start,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE)::VARCHAR AS due_date,
           DATEDIFF('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS days_to_y2k,
           EPOCH(o_orderdate)::BIGINT AS epoch_s,
           CAST(LAST_DAY(o_orderdate) AS VARCHAR) AS month_end,
           CAST(STRPTIME('2024-03-05 12:34:56', '%Y-%m-%d %H:%M:%S') AS VARCHAR) AS parsed_ts
    FROM orders
    """,
)
def h2_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2: date/time functions (extract, trunc, add, diff, epoch, parse).

    DOW convention differs (DuckDB Sunday=0, Spark dayofweek Sunday=1) —
    the oracle adds 1 to pin one convention.
    """
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.month("o_orderdate").cast("long").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("long").alias("order_day"),
        F.dayofweek("o_orderdate").cast("long").alias("order_dow"),
        F.quarter("o_orderdate").cast("long").alias("order_quarter"),
        F.date_trunc("month", "o_orderdate").cast("string").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30)
        .cast("string")
        .alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("long")
        .alias("days_to_y2k"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
        F.last_day("o_orderdate").cast("string").alias("month_end"),
        F.to_timestamp(F.lit("2024-03-05 12:34:56"), "yyyy-MM-dd HH:mm:ss")
        .cast("string")
        .alias("parsed_ts"),
    )


@query(
    "h3_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice / 7, 2) AS seventh,
           FLOOR(l_extendedprice / 1000) AS price_kfloor,
           CEIL(l_discount * 100) AS disc_pct_ceil,
           ABS(l_quantity - 25) AS qty_dev,
           ROUND(SQRT(l_extendedprice), 6) AS price_sqrt,
           ROUND(POW(l_quantity, 1.5), 6) AS qty_pow,
           ROUND(LN(l_extendedprice), 6) AS price_ln,
           ROUND(LOG10(l_extendedprice), 6) AS price_log10,
           ROUND(EXP(l_discount), 6) AS disc_exp,
           CAST(l_quantity AS BIGINT) % 7 AS qty_mod,
           CAST(SIGN(l_quantity - 25.0) AS DOUBLE) AS qty_sign
    FROM lineitem
    """,
)
def h3_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H3: math functions; transcendentals rounded to 6dp (1-ulp libm
    divergence), floor/ceil/abs/sign/mod exact."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") / 7, 2).alias("seventh"),
        F.floor(F.col("l_extendedprice") / 1000).cast("double").alias("price_kfloor"),
        F.ceil(F.col("l_discount") * 100).cast("double").alias("disc_pct_ceil"),
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.pow("l_quantity", F.lit(1.5)), 6).alias("qty_pow"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        (F.col("l_quantity").cast("bigint") % 7).alias("qty_mod"),
        F.signum(F.col("l_quantity") - 25.0).alias("qty_sign"),
    )


@query(
    "h4_array_funcs",
    oracle="""
    SELECT vec_id,
           LEN(embedding) AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
           ROUND(CAST(embedding[64] AS DOUBLE), 6) AS last_val,
           ROUND(LIST_SUM(LIST_TRANSFORM(embedding[1:8],
                 x -> CAST(x AS DOUBLE))), 6) AS head_sum,
           LEN(LIST_FILTER(embedding, x -> x > 0)) AS n_positive,
           ROUND(CAST(LIST_MAX(embedding) AS DOUBLE), 6) AS max_val
    FROM embeddings
    """,
)
def h4_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H4: array higher-order functions (size/element_at/slice/transform/
    filter/aggregate/array_max) over the embedding vectors.

    Elements are float32; every arithmetic output goes through an explicit
    double cast on both sides so the widening point is identical.
    """
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(F.element_at("embedding", 64).cast("double"), 6).alias("last_val"),
        F.round(
            F.aggregate(
                F.transform(F.slice("embedding", 1, 8), lambda x: x.cast("double")),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            6,
        ).alias("head_sum"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias(
            "n_positive"
        ),
        F.round(F.array_max("embedding").cast("double"), 6).alias("max_val"),
    )


@query(
    "h5_map_funcs",
    oracle="""
    WITH m AS (
      SELECT user_id, event_type, MAX(CAST(value AS DOUBLE)) AS max_value
      FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           STRING_AGG(event_type, ',' ORDER BY event_type) AS type_keys,
           MAX(CASE WHEN event_type = 'click' THEN max_value END) AS click_val,
           CAST(COUNT(*) AS BIGINT) AS n_types
    FROM m GROUP BY user_id
    """,
)
def h5_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H5: map functions — build a map per event type, extract keys /
    values / size via map_keys / element_at / size.

    The map itself stays internal to the query; the final projection is
    all scalars (keys joined to a CSV string) because the driver's
    canonicalizer cannot sort array/map cells (round-2 failure:
    `unhashable numpy.ndarray`). That also upgrades this from a
    rows-only check to an exact oracle: the map extraction must equal
    the plain relational aggregation on the DuckDB side. Supporting
    authority: tests/test_operators.py::test_h5_map_extract_matches_plain_agg.
    """
    ev = load_table(spark, sf_dir, "events")
    # dedupe to one entry per (user, type) BEFORE building the map —
    # map_from_entries raises DUPLICATED_MAP_KEY otherwise
    maxed = ev.groupBy("user_id", "event_type").agg(
        F.max(F.col("value").cast("double")).alias("max_value")
    )
    per_type = maxed.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "max_value")))
        ).alias("latest_by_type")
    )
    return per_type.select(
        "user_id",
        F.array_join(F.map_keys("latest_by_type"), ",").alias("type_keys"),
        F.element_at("latest_by_type", "click").alias("click_val"),
        F.size("latest_by_type").cast("long").alias("n_types"),
    )


@query(
    "h6_json_extract",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
           json_extract_string(props, '$.missing') AS missing_val
    FROM events
    """,
)
def h6_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6: JSON extraction from the events.props payload column.

    get_json_object is JVM-side (Jackson); from_json with an explicit
    schema is the bulk-parse path (h6b).
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_val"),
        (F.get_json_object("props", "$.k").cast("bigint") % 10).alias("k_mod"),
        F.get_json_object("props", "$.missing").alias("missing_val"),
    )


@query(
    "h6b_from_json",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total
    FROM events
    GROUP BY event_type
    """,
)
def h6b_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6: schema-on-read JSON parse (from_json + StructType) then agg."""
    from pyspark.sql import types as T

    ev = load_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    return (
        ev.withColumn("parsed", F.from_json("props", schema))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("parsed.k")).alias("k_total"),
        )
    )


@query(
    "h1b_string_funcs_more",
    oracle="""
    SELECT c_custkey,
           REVERSE(c_mktsegment) AS seg_rev,
           REPEAT(c_mktsegment, 2) AS seg_twice,
           CAST(INSTR(c_name, '0') AS BIGINT) AS first_zero,
           TRANSLATE(c_mktsegment, 'AEIOU', 'aeiou') AS seg_lower_vowels,
           LEFT(c_name, 8) AS name_l8,
           RIGHT(c_name, 3) AS name_r3,
           CAST(ASCII(c_mktsegment) AS BIGINT) AS first_code
    FROM customer
    """,
)
def h1b_string_funcs_more(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H1 extension: reverse / repeat / instr / translate / left / right /
    ascii — the remaining everyday string surface, all JVM codegen."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.repeat("c_mktsegment", 2).alias("seg_twice"),
        F.instr("c_name", "0").cast("long").alias("first_zero"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_lower_vowels"),
        F.substring("c_name", 1, 8).alias("name_l8"),
        F.substring(F.col("c_name"), -3, 3).alias("name_r3"),
        F.ascii("c_mktsegment").cast("long").alias("first_code"),
    )


@query(
    "h2b_datetime_funcs_more",
    oracle="""
    SELECT o_orderkey,
           CAST(QUARTER(o_orderdate) AS BIGINT) AS q,
           CAST(WEEKOFYEAR(o_orderdate) AS BIGINT) AS iso_week,
           CAST(ISODOW(o_orderdate) AS BIGINT) AS iso_dow,
           CAST(LAST_DAY(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)::VARCHAR
             AS plus3m
    FROM orders
    """,
)
def h2b_datetime_funcs_more(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2 extension: quarter / ISO week / ISO day-of-week / last_day /
    add_months. Spark's weekday() is Monday=0, DuckDB's ISODOW Monday=1 —
    bridged with +1; both engines clamp month-end in add_months."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.quarter("o_orderdate").cast("long").alias("q"),
        F.weekofyear("o_orderdate").cast("long").alias("iso_week"),
        (F.weekday("o_orderdate") + 1).cast("long").alias("iso_dow"),
        F.last_day("o_orderdate").cast("string").alias("month_end"),
        F.add_months("o_orderdate", 3).cast("string").alias("plus3m"),
    )


@query(
    "h1c_regexp_extract_all",
    oracle="""
    SELECT doc_id,
           COALESCE(ARRAY_TO_STRING(REGEXP_EXTRACT_ALL(text, '[a-z]*ing'),
                                    ' '), '') AS ing_words,
           CAST(COALESCE(LEN(REGEXP_EXTRACT_ALL(text, '[a-z]*ing')), 0)
                AS BIGINT) AS n_ing
    FROM documents
    """,
)
def h1c_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H1 extension: regexp_extract_all — multi-match extraction (both
    engines return matches in left-to-right document order).

    The match array is serialized to a space-joined string in the final
    projection: the driver's canonicalizer sorts on every output column
    and cannot order list cells (round-2 failure: `unhashable
    numpy.ndarray`), so array-typed results must leave the query as
    scalars. The array op itself is still exercised — join happens after
    extraction.

    Null/empty contract (matched by COALESCEs in the oracle): no-match
    AND null-text both yield ('', 0) on BOTH engines — DuckDB's
    ARRAY_TO_STRING([], ' ') is NULL and Spark's legacy size(NULL) is
    -1, so each side needs its own guard to land on the same pair."""
    d = load_table(spark, sf_dir, "documents")
    matches = F.regexp_extract_all("text", F.lit("[a-z]*ing"))
    return d.select(
        "doc_id",
        F.coalesce(F.array_join(matches, " "), F.lit("")).alias("ing_words"),
        F.greatest(F.size(matches), F.lit(0)).cast("long").alias("n_ing"),
    )


@query(
    "h9_collation",
    oracle="""
    WITH mixed AS (
      SELECT CASE WHEN p_partkey % 2 = 0 THEN UPPER(p_brand)
                  ELSE p_brand END AS brand_mixed
      FROM part
    )
    SELECT LOWER(brand_mixed) AS brand_lc,
           CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM mixed GROUP BY LOWER(brand_mixed)
    """,
)
def h9_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H completion (Spark 4): string COLLATIONs — grouping under
    UTF8_LCASE merges case variants engine-side, without the LOWER()
    rewrite every pre-collation pipeline hand-rolls (and with the same
    benefit for joins and comparisons). The query manufactures mixed
    case deterministically (even part keys uppercase their brand), lets
    the COLLATE grouping merge them, and emits a lowercase display key;
    DuckDB has no Spark-style collation clause, so the oracle IS the
    LOWER() rewrite — asserting the semantic equivalence.
    """
    p = load_table(spark, sf_dir, "part")
    mixed = p.select(
        F.when(
            F.col("p_partkey") % 2 == 0, F.upper(F.col("p_brand"))
        )
        .otherwise(F.col("p_brand"))
        .alias("brand_mixed")
    )
    return (
        mixed.select(
            F.expr("brand_mixed COLLATE UTF8_LCASE").alias("brand_coll")
        )
        .groupBy("brand_coll")
        .agg(F.count(F.lit(1)).alias("n_parts"))
        .select(
            F.lower(F.col("brand_coll")).cast("string").alias("brand_lc"),
            "n_parts",
        )
    )
