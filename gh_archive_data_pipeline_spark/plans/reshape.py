"""Reshaping queries: pivot, structured JSON parsing, stream-static joins.

Extends the catalog with the wide↔long reshapes and typed-JSON operators the
reference's analytics endpoints imply (SURVEY.md §2.6 A-family, §2.10 F4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.readers import load_table
from .registry import register

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "q54_pivot_event_values",
    sql="""
    SELECT user_id,
           round(sum(CASE WHEN event_type = 'click'    THEN value END), 2) AS click,
           round(sum(CASE WHEN event_type = 'error'    THEN value END), 2) AS error,
           round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
           round(sum(CASE WHEN event_type = 'signup'   THEN value END), 2) AS signup,
           round(sum(CASE WHEN event_type = 'view'     THEN value END), 2) AS view
    FROM events
    GROUP BY user_id
    """,
)
def q54_pivot_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long→wide): per-user value totals by event type. The pivot
    value list is explicit — with it, Spark skips the extra distinct-values
    job, which is mandatory practice on a 100 TB fact table."""
    ev = load_table(spark, sf_dir, "events")
    piv = (
        ev.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.round(F.sum("value"), 2))
    )
    return piv


@register(
    "q55_from_json_typed",
    sql="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 = 0
                AS BOOLEAN) AS k_div7
    FROM events
    """,
)
def q55_from_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 from_json with an explicit schema — ONE parse per row into a typed
    struct (vs one parse per get_json_object call), the right pattern when a
    payload column is consulted more than once."""
    ev = load_table(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.LongType())])
    parsed = ev.select("event_id", F.from_json("props", schema).alias("p"))
    return parsed.select(
        "event_id",
        F.col("p.k").alias("k"),
        (F.col("p.k") % 7 == 0).alias("k_div7"),
    )


@register(
    "q56_unpivot_profile",
    sql="""
    SELECT c_custkey, metric, round(val, 2) AS val
    FROM (
      SELECT c_custkey, 'acctbal' AS metric, c_acctbal AS val FROM customer
      UNION ALL
      SELECT c_custkey, 'nationkey', CAST(c_nationkey AS DOUBLE) FROM customer
    )
    """,
)
def q56_unpivot_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long) via the stack() generator — the inverse reshape of
    q54, used to turn per-column metrics into metric rows."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.expr("stack(2, 'acctbal', c_acctbal, "
               "'nationkey', cast(c_nationkey as double)) as (metric, val)"),
    ).select("c_custkey", "metric", F.round("val", 2).alias("val"))


@register(
    "q103_variant_json",
    sql="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.device') AS VARCHAR) AS device,
           CAST(json_extract(props, '$.retries') AS INTEGER) AS retries,
           CAST(json_extract_string(props, '$.ab_test') AS VARCHAR) AS ab_test
    FROM events
    """,
)
def q103_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured VARIANT path (Spark 4): parse the props JSON once
    into a Variant value, then typed-path extraction with variant_get —
    the open-schema alternative to from_json's fixed struct (q27/q55): new
    JSON keys appear without a schema migration, extraction stays typed."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.device", "string").alias("device"),
        F.variant_get(v, "$.retries", "int").alias("retries"),
        F.variant_get(v, "$.ab_test", "string").alias("ab_test"),
    )


@register(
    "q143_unpivot_metrics",
    sql="""
    WITH w AS (
        SELECT o_orderpriority,
               CAST(count(*) AS DOUBLE) AS n_orders,
               round(sum(o_totalprice), 2) AS total_price,
               round(avg(o_totalprice), 2) AS avg_price
        FROM orders GROUP BY o_orderpriority
    )
    SELECT o_orderpriority, 'n_orders' AS metric, n_orders AS value FROM w
    UNION ALL
    SELECT o_orderpriority, 'total_price', total_price FROM w
    UNION ALL
    SELECT o_orderpriority, 'avg_price', avg_price FROM w
    """,
)
def q143_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide metrics → long (metric, value) rows), the inverse of
    q54's pivot — the export shape metric stores and plotting layers want.
    The unpivot runs on the 5-row aggregate, so the melt is free; Spark's
    native `unpivot` avoids the N-way self-union the SQL oracle spells out.
    """
    wide = (load_table(spark, sf_dir, "orders")
            .groupBy("o_orderpriority")
            .agg(F.count("*").cast("double").alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("total_price"),
                 F.round(F.avg("o_totalprice"), 2).alias("avg_price")))
    return wide.unpivot(
        ids=["o_orderpriority"],
        values=["n_orders", "total_price", "avg_price"],
        variableColumnName="metric",
        valueColumnName="value",
    )
