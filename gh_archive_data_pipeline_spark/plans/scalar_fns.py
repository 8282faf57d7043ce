"""Scalar-function catalog (SURVEY.md §2.10, F1-F9).

All expressions are built-in pyspark.sql.functions — JVM-side, inside
whole-stage codegen. No Python UDFs anywhere in this module; the same
expressions are written in portable SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .registry import register


# --------------------------------------------------------------------------
# q26 — string functions (F3)
# --------------------------------------------------------------------------
@register(
    "q26_string_functions",
    sql="""
    SELECT c_custkey,
           upper(c_name)                                   AS name_upper,
           CAST(length(c_name) AS BIGINT)                  AS name_len,
           CAST(regexp_extract(c_name, '([0-9]+)$', 1) AS BIGINT) AS name_num,
           substr(c_name, 1, 8)                            AS name_prefix,
           concat(c_mktsegment, ':', CAST(c_nationkey AS VARCHAR)) AS seg_nation,
           replace(lower(c_name), 'customer', 'cust')      AS name_short
    FROM customer
    """,
)
def q26_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: upper/length/regexp_extract/substring/concat/replace — all codegen'd."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.length("c_name").cast("bigint").alias("name_len"),
        F.regexp_extract("c_name", r"([0-9]+)$", 1).cast("bigint").alias("name_num"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat("c_mktsegment", F.lit(":"), F.col("c_nationkey").cast("string"))
        .alias("seg_nation"),
        F.replace(F.lower("c_name"), F.lit("customer"), F.lit("cust"))
        .alias("name_short"),
    )


# --------------------------------------------------------------------------
# q27 — JSON extraction (F4) over the events.props payload column
# --------------------------------------------------------------------------
@register(
    "q27_json_extract",
    sql="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
           count(*) AS n,
           count(DISTINCT event_type) AS n_types
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY 1
    ORDER BY k_mod
    """,
)
def q27_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 get_json_object on a raw-JSON string column — the engine-side
    realization of the reference's `payload` escape hatch
    (/root/reference/pipeline/schema.py:54), which it dropped instead of
    parsing. At scale prefer from_json with an explicit schema (single parse)
    over repeated get_json_object calls."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.filter(k.isNotNull())
        .groupBy((k % 10).alias("k_mod"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("event_type").alias("n_types"),
        )
        .orderBy("k_mod")
    )


# --------------------------------------------------------------------------
# q28 — timestamp functions (F2)
# --------------------------------------------------------------------------
@register(
    "q28_date_functions",
    sql="""
    SELECT CAST(date_part('year', o_orderdate) AS BIGINT)  AS order_year,
           CAST(date_part('month', o_orderdate) AS BIGINT) AS order_month,
           date_trunc('month', o_orderdate)                AS month_start,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY 1, 2, 3
    ORDER BY order_year, order_month
    """,
)
def q28_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: year/month extraction + date_trunc, grouped monthly revenue —
    realizes the reference's latent `created_at` timestamp intent
    (/root/reference/pipeline/airflow/dags/load_data_task.py:120)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            F.month("o_orderdate").cast("bigint").alias("order_month"),
            F.date_trunc("month", F.col("o_orderdate")).cast("timestamp_ntz")
            .alias("month_start"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("order_year", "order_month")
    )


# --------------------------------------------------------------------------
# q29 — math + conditional (F5, F7)
# --------------------------------------------------------------------------
@register(
    "q29_math_conditional",
    sql="""
    SELECT CASE WHEN l_discount > 0.05 THEN 'HIGH'
                WHEN l_discount > 0.02 THEN 'MID'
                ELSE 'LOW' END AS disc_band,
           count(*) AS n,
           round(sum(ln(l_extendedprice)), 4)        AS sum_log_price,
           round(avg(sqrt(l_quantity)), 6)           AS avg_sqrt_qty,
           round(max(abs(l_extendedprice - l_tax * 1000)), 2) AS max_abs_expr,
           round(sum(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END), 2)
             AS returned_value
    FROM lineitem
    GROUP BY 1
    ORDER BY disc_band
    """,
)
def q29_math_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 math (ln/sqrt/abs) + F7 when/otherwise, including the
    conditional-aggregation (pivot-by-CASE) idiom."""
    li = load_table(spark, sf_dir, "lineitem")
    band = (
        F.when(F.col("l_discount") > 0.05, "HIGH")
        .when(F.col("l_discount") > 0.02, "MID")
        .otherwise("LOW")
    )
    return (
        li.groupBy(band.alias("disc_band"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.log(F.col("l_extendedprice"))), 4).alias("sum_log_price"),
            F.round(F.avg(F.sqrt(F.col("l_quantity"))), 6).alias("avg_sqrt_qty"),
            F.round(F.max(F.abs(F.col("l_extendedprice") - F.col("l_tax") * 1000)), 2)
            .alias("max_abs_expr"),
            F.round(
                F.sum(F.when(F.col("l_returnflag") == "R",
                             F.col("l_extendedprice")).otherwise(0.0)), 2)
            .alias("returned_value"),
        )
        .orderBy("disc_band")
    )


# --------------------------------------------------------------------------
# q30 — array functions over tokenized text (F6)
# --------------------------------------------------------------------------
@register(
    "q30_array_functions",
    sql="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT)                AS n_tokens,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
           list_sort(list_distinct(string_split(text, ' ')))[1]        AS first_token,
           CAST(len(list_filter(string_split(text, ' '),
                                t -> length(t) > 5)) AS BIGINT)        AS n_long_tokens
    FROM documents
    """,
)
def q30_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 split/size/array_distinct/sort/filter — higher-order functions on
    arrays, all JVM-side (no UDF)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
        F.element_at(F.array_sort(F.array_distinct(toks)), 1).alias("first_token"),
        F.size(F.filter(toks, lambda t: F.length(t) > 5)).cast("bigint")
        .alias("n_long_tokens"),
    )


# --------------------------------------------------------------------------
# q31 — explode + top words (F6 explode, A3, O3)
# --------------------------------------------------------------------------
@register(
    "q31_top_words",
    sql="""
    SELECT token, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    WHERE token <> ''
    GROUP BY token
    ORDER BY n DESC, token
    LIMIT 25
    """,
)
def q31_top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 explode → word frequencies → deterministic top-25. The explode
    multiplies rows ~|tokens| but partial aggregation collapses them before
    the shuffle — safe on a 100 TB corpus."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(25)
    )


# --------------------------------------------------------------------------
# q32 — hashing / fingerprints (F8)
# --------------------------------------------------------------------------
@register(
    "q32_hash_fingerprint",
    sql="""
    SELECT doc_id,
           md5(text) AS text_md5,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS norm_md5
    FROM documents
    """,
)
def q32_hash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 content hashing: raw md5 + normalized (lower, whitespace-collapsed)
    md5 — the exact-dedup fingerprint primitive. (xxhash64 is the cheaper
    in-engine choice; md5 is used where the oracle must reproduce it.)"""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower("text"), r"\s+", " "))
    return docs.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.md5(norm).alias("norm_md5"),
    )


# --------------------------------------------------------------------------
# q114 — safe casts / arithmetic (ANSI mode without the blast radius)
# --------------------------------------------------------------------------
@register(
    "q114_try_functions",
    sql="""
    SELECT event_id,
           TRY_CAST(json_extract_string(props, '$.retries') AS INTEGER)
             AS retries,
           TRY_CAST(event_type AS DOUBLE) AS bogus_num,
           CASE WHEN TRY_CAST(json_extract_string(props, '$.retries')
                              AS INTEGER) = 0 THEN NULL
                ELSE round(value / TRY_CAST(json_extract_string(props,
                           '$.retries') AS INTEGER), 4) END AS value_per_retry
    FROM events
    """,
)
def q114_try_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safe casts and division under ANSI mode: try_cast/try_divide return
    NULL on bad input instead of failing the 1000-executor job at hour 9 —
    the per-cell error policy for dirty data (the job-level policy is the
    PERMISSIVE CSV reader's corrupt-record column)."""
    ev = load_table(spark, sf_dir, "events")
    retries = F.get_json_object("props", "$.retries").try_cast("int")
    return ev.select(
        "event_id",
        retries.alias("retries"),
        F.col("event_type").try_cast("double").alias("bogus_num"),
        F.round(F.try_divide("value", retries), 4).alias("value_per_retry"),
    )


@register(
    "q160_regex_extract_all",
    sql="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '\\b[a-z]{6,}\\b'))
                AS BIGINT) AS n_long_words,
           coalesce(array_to_string(list_sort(list_distinct(
               regexp_extract_all(text, '\\b[a-z]{6,}\\b'))), ','), '')
               AS long_words
    FROM documents
    """,
)
def q160_regex_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 depth: regexp_extract_all — pull every ≥6-letter word per document
    and emit the count plus a deterministic (sorted, distinct, joined)
    rendering; the flattened string keeps the result hash-comparable (array
    columns break the driver's sort-based compare)."""
    docs = load_table(spark, sf_dir, "documents")
    # idx 0 = whole match (Spark defaults to capture group 1; DuckDB to 0)
    words = F.expr(r"regexp_extract_all(text, '\\b[a-z]{6,}\\b', 0)")
    return docs.select(
        "doc_id",
        F.size(words).cast("bigint").alias("n_long_words"),
        F.array_join(F.array_sort(F.array_distinct(words)), ",")
        .alias("long_words"),
    )


@register(
    "q161_json_keys",
    sql="""
    SELECT k AS prop_key,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
    FROM (SELECT event_type, unnest(json_keys(props)) AS k FROM events)
    GROUP BY k
    """,
)
def q161_json_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 depth: schema DISCOVERY over a raw JSON column — explode each
    payload's key set (json_object_keys) and profile key frequency. This is
    the first step a pipeline runs on an unknown payload column before
    committing to a from_json schema; one explode + one grouped count."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("event_type",
                  F.explode(F.json_object_keys("props")).alias("prop_key"))
        .groupBy("prop_key")
        .agg(F.count("*").cast("bigint").alias("n_events"),
             F.countDistinct("event_type").cast("bigint").alias("n_types"))
    )


@register(
    "q221_collated_grouping",
    sql="""
    WITH mangled AS (
        SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_type)
                    ELSE lower(p_type) END AS t
        FROM part
    )
    SELECT CAST(count(DISTINCT t) AS BIGINT)        AS n_binary_distinct,
           CAST(count(DISTINCT lower(t)) AS BIGINT) AS n_collated_distinct
    FROM mangled
    """,
)
def q221_collated_grouping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware comparison (Spark 4 COLLATE): part types case-mangled
    per row, then counted distinct under binary vs UTF8_LCASE collation —
    the collated count collapses case variants without materializing a
    lower() copy (the collation travels with the type, so joins/groupBys
    downstream compare case-insensitively too). The oracle models the
    collated semantics with lower(); the Spark side uses the real collated
    column."""
    part = load_table(spark, sf_dir, "part")
    mangled = part.select(
        F.when(F.col("p_partkey") % 2 == 0, F.upper("p_type"))
        .otherwise(F.lower("p_type")).alias("t"))
    return mangled.agg(
        F.countDistinct("t").cast("bigint").alias("n_binary_distinct"),
        F.countDistinct(F.collate("t", "UTF8_LCASE")).cast("bigint")
        .alias("n_collated_distinct"))


@register(
    "q222_xml_ingest",
    sql="""
    SELECT o_orderkey AS order_key,
           o_orderstatus AS status,
           CAST(o_orderdate AS VARCHAR) AS order_date
    FROM orders WHERE o_orderkey % 97 = 0
    """,
)
def q222_xml_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML ingestion surface (Spark 4 from_xml): order rows rendered to XML
    documents and parsed back with an explicit schema; the extracted fields
    must round-trip exactly (the oracle recomputes them from the raw
    columns). This is the expression-level path the spark-xml file source
    shares — schema enforcement, type coercion, nested element access."""
    orders = (load_table(spark, sf_dir, "orders")
              .filter(F.col("o_orderkey") % 97 == 0))
    xml = F.concat(
        F.lit("<order><key>"), F.col("o_orderkey").cast("string"),
        F.lit("</key><status>"), F.col("o_orderstatus"),
        F.lit("</status><date>"), F.col("o_orderdate").cast("string"),
        F.lit("</date></order>"))
    parsed = orders.select(
        F.from_xml(xml, "key BIGINT, status STRING, date STRING").alias("p"))
    return parsed.select(
        F.col("p.key").alias("order_key"),
        F.col("p.status").alias("status"),
        F.col("p.date").alias("order_date"))


@register(
    "q223_csv_expression",
    sql="""
    WITH lines AS (
        SELECT CASE WHEN l_linenumber = 7 THEN 'x' ELSE CAST(l_orderkey AS VARCHAR) END
                   AS k_str,
               l_linenumber, l_returnflag
        FROM lineitem
    )
    SELECT l_returnflag AS returnflag,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CASE WHEN TRY_CAST(k_str AS BIGINT) IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_malformed,
           CAST(sum(TRY_CAST(k_str AS BIGINT)) AS BIGINT) AS key_sum
    FROM lines GROUP BY l_returnflag
    """,
)
def q223_csv_expression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV ingestion at expression level (from_csv, the S-surface sibling of
    q55's from_json): lineitem rows rendered to csv lines with a planted
    malformed key on every 7th line number, parsed back with an explicit
    schema — malformed ints surface as NULL (PERMISSIVE semantics), counted
    per returnflag. The oracle reproduces the parse contract with
    TRY_CAST."""
    li = load_table(spark, sf_dir, "lineitem")
    line = F.concat_ws(
        ",",
        F.when(F.col("l_linenumber") == 7, F.lit("x"))
        .otherwise(F.col("l_orderkey").cast("string")),
        F.col("l_linenumber").cast("string"),
        F.col("l_returnflag"))
    parsed = li.select(
        F.from_csv(line, F.lit("k BIGINT, ln INT, flag STRING")).alias("p"))
    return (parsed.groupBy(F.col("p.flag").alias("returnflag"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_lines"),
                 F.sum(F.when(F.col("p.k").isNull(), 1).otherwise(0))
                 .cast("bigint").alias("n_malformed"),
                 F.sum("p.k").cast("bigint").alias("key_sum")))


@register(
    "q241_explode_outer",
    sql="""
    WITH rare AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), t -> t = 'vector')
                   AS hits
        FROM documents WHERE doc_id < 200
    )
    SELECT r.doc_id, u.hit,
           CAST(len(r.hits) AS BIGINT) AS n_hits
    FROM rare r
    LEFT JOIN LATERAL (SELECT unnest(r.hits) AS hit) u ON true
    """,
)
def q241_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-preserving explode (explode_outer) — the F6 corner plain explode
    gets wrong in audits: documents whose filtered token array is EMPTY must
    still appear (with a NULL element), or every "docs without X" count
    downstream silently drops them. The oracle models it with
    LEFT JOIN LATERAL unnest."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    hits = F.filter(F.split("text", " "), lambda t: t == "vector")
    rare = docs.select("doc_id", hits.alias("hits"))
    return rare.select(
        "doc_id",
        F.explode_outer("hits").alias("hit"),
        F.size("hits").cast("bigint").alias("n_hits"))


@register(
    "q242_array_hofs",
    sql="""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS w
        FROM documents WHERE doc_id < 300
    )
    SELECT doc_id,
           len(w) > 0 AND list_bool_or(list_transform(w, x -> x = 'spark'))
               AS has_spark,
           coalesce(list_bool_and(list_transform(w, x -> length(x) < 12)),
                    true)                                  AS all_short,
           CAST(len(list_filter(w, x -> length(x) >= 6)) AS BIGINT)
                                                           AS n_long,
           CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT)
                                                           AS total_chars,
           round(list_reduce(list_transform(w, x -> length(x)::DOUBLE),
                             (acc, x) -> acc + x)
                 / len(w), 4)                              AS avg_token_len
    FROM t
    """,
)
def q242_array_hofs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions in one sweep — exists, forall, filter,
    transform, aggregate/reduce — the F6 lambda surface, each pinned
    against DuckDB's list_* equivalents. All JVM-side codegen'd
    expressions; no explode, no shuffle: per-row array algebra is the
    pattern that keeps 100 TB token-level work inside the scan stage."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    w = F.split("text", " ")
    t = docs.select("doc_id", w.alias("w"))
    lens = F.transform("w", lambda x: F.length(x).cast("double"))
    return t.select(
        "doc_id",
        F.exists("w", lambda x: x == "spark").alias("has_spark"),
        F.forall("w", lambda x: F.length(x) < 12).alias("all_short"),
        F.size(F.filter("w", lambda x: F.length(x) >= 6)).cast("bigint")
        .alias("n_long"),
        F.aggregate(F.transform("w", lambda x: F.length(x)),
                    F.lit(0), lambda acc, x: acc + x).cast("bigint")
        .alias("total_chars"),
        F.round(F.aggregate(lens, F.lit(0.0), lambda acc, x: acc + x)
                / F.size("w"), 4).alias("avg_token_len"))
