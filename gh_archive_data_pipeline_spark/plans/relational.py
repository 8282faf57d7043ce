"""Relational query catalog: scans, filters, joins, aggregations.

Covers SURVEY.md §2.3 (projections/filters), §2.5 (joins J1-J6), §2.6
(aggregations A1-A8). The reference delegates this whole surface to
Trino/Postgres over its gold tables (/root/reference/README.md:7,277-287);
here it is expressed as Catalyst logical plans over the driver fixtures.

Scale notes per query are inline; the common levers:
- dimension joins broadcast explicitly (region/nation/supplier are tiny at
  any SF; customer broadcasts until ~sf100, after which AQE's sort-merge is
  correct anyway because the hint degrades gracefully);
- aggregations are expressed so Catalyst plans partial (map-side) aggregation
  before the shuffle;
- every filter is a plain column predicate → parquet PushedFilters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# q01 — TPC-H Q1 style pricing summary (flagship: scan→filter→agg→sort)
# --------------------------------------------------------------------------
@register(
    "q01_pricing_summary",
    sql="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 6)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 grouped agg + O2 sort. Partial aggregation happens map-side; only
    |returnflag × linestatus| (=6) groups cross the shuffle — constant-size
    exchange at any data scale."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# q02 — predicate surface: comparison / IN / LIKE / BETWEEN / IS NOT NULL
# --------------------------------------------------------------------------
@register(
    "q02_filter_predicates",
    sql="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size,
           round(p_retailprice, 2) AS p_retailprice
    FROM part
    WHERE p_size BETWEEN 10 AND 30
      AND p_type IN ('SMALL', 'LARGE', 'PROMO')
      AND p_name LIKE '%a%'
      AND p_retailprice > 900
      AND p_brand IS NOT NULL
    """,
)
def q02_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 row filters. All five predicate shapes are plain column predicates
    → all of them reach the parquet scan as PushedFilters."""
    part = _t(spark, sf_dir, "part")
    return (
        part.filter(
            F.col("p_size").between(10, 30)
            & F.col("p_type").isin("SMALL", "LARGE", "PROMO")
            & F.col("p_name").like("%a%")
            & (F.col("p_retailprice") > 900)
            & F.col("p_brand").isNotNull()
        )
        .select(
            "p_partkey", "p_name", "p_brand", "p_type", "p_size",
            F.round("p_retailprice", 2).alias("p_retailprice"),
        )
    )


# --------------------------------------------------------------------------
# q03 — TPC-H Q3 style: 3-way join + grouped revenue + top-k
# --------------------------------------------------------------------------
@register(
    "q03_shipping_priority",
    sql="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-06-01'
      AND l_shipdate  > TIMESTAMP '1998-06-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 equi joins + A3 + O3 top-k. customer is filtered before the join and
    broadcast (dim side); orders⋈lineitem is the only shuffle pair. The final
    orderBy+limit plans as TakeOrderedAndProject — no global sort."""
    cutoff = F.lit("1998-06-01").cast("timestamp_ntz")
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------------
# q04 — EXISTS via left-semi join (TPC-H Q4 style)
# --------------------------------------------------------------------------
@register(
    "q04_order_priority",
    sql="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 left-semi join expressing EXISTS. The semi join keeps only the
    orders-side columns across the shuffle; lineitem is pre-projected to the
    two columns the predicate needs (column pruning at the scan)."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp_ntz"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    semi = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        semi.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# q05 — multi-way star join through broadcast dims (TPC-H Q5 style)
# --------------------------------------------------------------------------
@register(
    "q05_region_revenue",
    sql="""
    SELECT r_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY r_name
    ORDER BY revenue DESC, r_name
    """,
)
def q05_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1+J4: fact⋈fact shuffle join (lineitem⋈orders) then a cascade of
    broadcast joins (customer→nation→region never shuffles the fact side).
    Exactly the plan you want at 100 TB: one shuffle, then map-side joins."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = _t(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .orderBy(F.col("revenue").desc(), "r_name")
    )


# --------------------------------------------------------------------------
# q06 — TPC-H Q6: tight scan-filter-agg, no group keys
# --------------------------------------------------------------------------
@register(
    "q06_forecast_revenue",
    sql="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_quantity < 24
    """,
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5+A3 global agg. All four predicates push to the scan; the aggregate
    is a single partial→final pair with a 1-row exchange."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp_ntz"))
            & F.col("l_discount").between(0.02, 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --------------------------------------------------------------------------
# q07 — left outer join + null handling (customers with zero orders kept)
# --------------------------------------------------------------------------
@register(
    "q07_customer_order_stats",
    sql="""
    SELECT c_custkey,
           count(o_orderkey)                         AS n_orders,
           round(coalesce(sum(o_totalprice), 0), 2)  AS total_spend
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def q07_customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 left outer + F7 coalesce. count(col) skips nulls from the outer
    side, so zero-order customers report 0/0.0 — the classic outer-join-agg
    correctness trap, pinned by the oracle."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey", "o_totalprice")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2)
            .alias("total_spend"),
        )
    )


# --------------------------------------------------------------------------
# q08 — anti join: customers that never ordered
# --------------------------------------------------------------------------
@register(
    "q08_customers_without_orders",
    sql="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def q08_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 left-anti join (NOT EXISTS). Only the orders key column is read on
    the probe side — ReadSchema shows a single-column scan."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


# --------------------------------------------------------------------------
# q09 — cross join (tiny × tiny)
# --------------------------------------------------------------------------
@register(
    "q09_region_nation_matrix",
    sql="""
    SELECT r.r_name, n.n_name,
           CAST(r.r_regionkey = n.n_regionkey AS BOOLEAN) AS is_home
    FROM region r CROSS JOIN nation n
    """,
)
def q09_region_nation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J6 explicit cross join. Guarded to dimension tables — at scale a cross
    join is only ever sane when one side broadcasts (5×25 here)."""
    region = _t(spark, sf_dir, "region")
    nation = _t(spark, sf_dir, "nation")
    return (
        region.crossJoin(F.broadcast(nation))
        .select(
            "r_name", "n_name",
            (F.col("r_regionkey") == F.col("n_regionkey")).alias("is_home"),
        )
    )


# --------------------------------------------------------------------------
# q10 — non-equi (range) join against a literal band table
# --------------------------------------------------------------------------
@register(
    "q10_price_band_join",
    sql="""
    SELECT b.band, count(*) AS n_parts,
           round(avg(p.p_retailprice), 4) AS avg_price
    FROM part p
    JOIN (VALUES ('budget', 0.0, 1000.0),
                 ('mid', 1000.0, 1500.0),
                 ('premium', 1500.0, 100000.0)) AS b(band, lo, hi)
      ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
    GROUP BY b.band
    ORDER BY b.band
    """,
)
def q10_price_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 theta join. The band table is a 3-row literal → Catalyst plans
    BroadcastNestedLoopJoin, which is the *correct* physical strategy for a
    non-equi predicate with a tiny build side at any fact-table scale."""
    part = _t(spark, sf_dir, "part")
    bands = spark.createDataFrame(
        [("budget", 0.0, 1000.0), ("mid", 1000.0, 1500.0),
         ("premium", 1500.0, 100000.0)],
        "band string, lo double, hi double",
    )
    return (
        part.join(
            F.broadcast(bands),
            (part.p_retailprice >= bands.lo) & (part.p_retailprice < bands.hi),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("p_retailprice"), 4).alias("avg_price"),
        )
        .orderBy("band")
    )


# --------------------------------------------------------------------------
# q11 — distinct (D1)
# --------------------------------------------------------------------------
@register(
    "q11_distinct_segments",
    sql="""
    SELECT DISTINCT c_mktsegment, c_nationkey
    FROM customer
    """,
)
def q11_distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 exact distinct — HashAggregate over both columns, partial map-side
    dedup before the shuffle (mirrors the reference's dimension builds,
    /root/reference/pipeline/airflow/dags/load_data_task.py:177-190)."""
    return _t(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


# --------------------------------------------------------------------------
# q12 — key-based dedup keeping a deterministic representative (D2)
# --------------------------------------------------------------------------
@register(
    "q12_dedup_first_event",
    sql="""
    SELECT user_id, event_type, event_id, value
    FROM (SELECT user_id, event_type, event_id, value,
                 row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts, event_id) AS rn
          FROM events) t
    WHERE rn = 1
    """,
)
def q12_dedup_first_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 keyed dedup. dropDuplicates() keeps an arbitrary row; for an
    oracle-stable (and production-sane) result we keep the *earliest* row per
    key via row_number over (ts, event_id) — same single shuffle cost."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "value")
    )


# --------------------------------------------------------------------------
# q13 — grouped counts + exact COUNT(DISTINCT) (A3/A4)
# --------------------------------------------------------------------------
@register(
    "q13_event_type_stats",
    sql="""
    SELECT event_type,
           count(*)                 AS n_events,
           count(DISTINCT user_id)  AS n_users,
           round(sum(value), 2)     AS total_value,
           round(avg(value), 4)     AS avg_value
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q13_event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3+A4. Catalyst plans COUNT(DISTINCT) as a two-phase expand+agg; the
    other aggregates ride the same shuffle."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# q14/q15 — rollup & cube (A5)
# --------------------------------------------------------------------------
@register(
    "q14_rollup_order_status",
    sql="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def q14_rollup_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 rollup: subtotals per status and a grand total (NULL group keys)."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@register(
    "q15_cube_returnflag_status",
    sql="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_items,
           round(sum(l_quantity), 2) AS total_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q15_cube_returnflag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 cube: all 2^2 grouping sets in one pass (Expand operator)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        )
    )


# --------------------------------------------------------------------------
# q16 — exact percentiles / median (A6)
# --------------------------------------------------------------------------
@register(
    "q16_acctbal_percentiles",
    sql="""
    SELECT c_mktsegment,
           round(quantile_cont(c_acctbal, 0.25), 4) AS p25,
           round(quantile_cont(c_acctbal, 0.50), 4) AS p50,
           round(quantile_cont(c_acctbal, 0.75), 4) AS p75,
           round(min(c_acctbal), 2) AS min_bal,
           round(max(c_acctbal), 2) AS max_bal
    FROM customer
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q16_acctbal_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 exact (interpolated) percentiles — Spark `percentile` ≡ DuckDB
    `quantile_cont`. For 100 TB use approx_percentile instead (single-pass
    sketch); the exact form is here because the oracle needs exactness."""
    cust = _t(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.round(F.expr("percentile(c_acctbal, 0.25)"), 4).alias("p25"),
            F.round(F.expr("percentile(c_acctbal, 0.50)"), 4).alias("p50"),
            F.round(F.expr("percentile(c_acctbal, 0.75)"), 4).alias("p75"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        )
        .orderBy("c_mktsegment")
    )


# --------------------------------------------------------------------------
# q17 — collect_set → ordered string agg (A7)
# --------------------------------------------------------------------------
@register(
    "q17_nation_segments",
    sql="""
    SELECT c_nationkey,
           string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
           count(DISTINCT c_mktsegment) AS n_segments
    FROM customer
    GROUP BY c_nationkey
    """,
)
def q17_nation_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 collect_set, rendered as a sorted CSV string so the value is
    deterministic (set order isn't) and comparable across engines."""
    cust = _t(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_nationkey")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_set("c_mktsegment")))
            .alias("segments"),
            F.countDistinct("c_mktsegment").alias("n_segments"),
        )
    )


# --------------------------------------------------------------------------
# q18 — histogram via width-bucketing (A8)
# --------------------------------------------------------------------------
@register(
    "q18_quantity_histogram",
    sql="""
    SELECT CAST(floor(l_quantity / 5) AS BIGINT) AS bucket,
           count(*) AS n,
           round(min(l_quantity), 2) AS lo,
           round(max(l_quantity), 2) AS hi
    FROM lineitem
    GROUP BY 1
    ORDER BY bucket
    """,
)
def q18_quantity_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 value-distribution histogram (the Deequ profile's histogram,
    /root/reference/pipeline/data_profiling.py:46, done natively)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.floor(F.col("l_quantity") / 5).cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("l_quantity"), 2).alias("lo"),
            F.round(F.max("l_quantity"), 2).alias("hi"),
        )
        .orderBy("bucket")
    )


# --------------------------------------------------------------------------
# q80 — right outer join (J2)
# --------------------------------------------------------------------------
@register(
    "q80_right_outer_orders",
    sql="""
    SELECT c_custkey, c_mktsegment,
           o_orderkey,
           round(o_totalprice, 2) AS o_totalprice
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
    """,
)
def q80_right_outer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 right outer join: every customer row survives; zero-order customers
    carry NULL order columns. Catalyst canonicalizes right⟷left by swapping
    sides, so the physical plan is the same broadcast/SMJ machinery — the
    query pins the NULL-extension semantics either way."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "right")
        .select("c_custkey", "c_mktsegment", "o_orderkey",
                F.round("o_totalprice", 2).alias("o_totalprice"))
    )


# --------------------------------------------------------------------------
# q81 — full outer join (J2)
# --------------------------------------------------------------------------
@register(
    "q81_full_outer_join",
    sql="""
    WITH big_orders AS (
      SELECT o_custkey, count(*) AS n_big
      FROM orders WHERE o_totalprice > 400000
      GROUP BY o_custkey
    ),
    building AS (
      SELECT c_custkey, round(c_acctbal, 2) AS acctbal
      FROM customer WHERE c_mktsegment = 'BUILDING'
    )
    SELECT coalesce(o_custkey, c_custkey) AS custkey,
           n_big, acctbal,
           (o_custkey IS NULL) AS no_big_orders,
           (c_custkey IS NULL) AS not_building
    FROM big_orders FULL OUTER JOIN building ON o_custkey = c_custkey
    """,
)
def q81_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 full outer join between two partially-overlapping keyed sets
    (customers with >400k orders vs BUILDING-segment customers) — both
    NULL-extension directions are exercised and pinned. Full outer cannot
    broadcast (both sides must see unmatched rows), so Catalyst plans a
    shuffle on the key — the correct, only-scalable strategy."""
    orders = _t(spark, sf_dir, "orders")
    big = (orders.filter(F.col("o_totalprice") > 400000)
           .groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_big")))
    building = (_t(spark, sf_dir, "customer")
                .filter(F.col("c_mktsegment") == "BUILDING")
                .select("c_custkey", F.round("c_acctbal", 2).alias("acctbal")))
    j = big.join(building, big.o_custkey == building.c_custkey, "full")
    return j.select(
        F.coalesce("o_custkey", "c_custkey").alias("custkey"),
        "n_big", "acctbal",
        F.col("o_custkey").isNull().alias("no_big_orders"),
        F.col("c_custkey").isNull().alias("not_building"),
    )


# --------------------------------------------------------------------------
# q95 — null-safe equality join (<=> / IS NOT DISTINCT FROM)
# --------------------------------------------------------------------------
@register(
    "q95_null_safe_join",
    sql="""
    WITH d AS (
      SELECT doc_id, nullif(lang, 'de') AS lang_n FROM documents
    ),
    stats AS (
      SELECT nullif(lang, 'de') AS lang_n, count(*) AS n_docs
      FROM documents GROUP BY 1
    )
    SELECT d.doc_id, d.lang_n, s.n_docs
    FROM d JOIN stats s ON d.lang_n IS NOT DISTINCT FROM s.lang_n
    """,
)
def q95_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join (eqNullSafe, SQL <=>): NULL keys match NULL keys
    instead of dropping out — the semantics dimension tables with 'unknown'
    members need. NULLs are planted deterministically (lang 'de' → NULL)."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id",
                    F.nullif(F.col("lang"), F.lit("de")).alias("lang_n"))
    stats = (d.groupBy("lang_n").agg(F.count(F.lit(1)).alias("n_docs"))
             .withColumnRenamed("lang_n", "s_lang_n"))
    return (d.join(F.broadcast(stats),
                   d.lang_n.eqNullSafe(stats.s_lang_n))
            .select("doc_id", "lang_n", "n_docs"))


# --------------------------------------------------------------------------
# q96 — schema-evolution union (unionByName with missing columns)
# --------------------------------------------------------------------------
@register(
    "q96_schema_evolution_union",
    sql="""
    WITH v1 AS (
      SELECT o_orderkey, o_totalprice, NULL::VARCHAR AS o_orderpriority
      FROM orders WHERE o_orderkey % 2 = 0
    ),
    v2 AS (
      SELECT o_orderkey, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderkey % 2 = 1
    ),
    u AS (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
    SELECT coalesce(o_orderpriority, '<missing>') AS priority,
           count(*) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM u GROUP BY 1
    """,
)
def q96_schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution merge: an old extract (no priority column) unions
    with the current schema via unionByName(allowMissingColumns=True); the
    missing column null-fills and downstream code handles it explicitly —
    the lakehouse pattern for reading across schema versions."""
    orders = load_table(spark, sf_dir, "orders")
    v1 = (orders.filter(F.col("o_orderkey") % 2 == 0)
          .select("o_orderkey", "o_totalprice"))          # old schema
    v2 = (orders.filter(F.col("o_orderkey") % 2 == 1)
          .select("o_orderkey", "o_totalprice", "o_orderpriority"))
    u = v1.unionByName(v2, allowMissingColumns=True)
    return (u.groupBy(F.coalesce("o_orderpriority", F.lit("<missing>"))
                      .alias("priority"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("o_totalprice"), 2).alias("total")))


@register(
    "q227_percent_of_parent",
    sql="""
    WITH base AS (
        SELECT r.r_name AS region, n.n_name AS nation,
               sum(c.c_acctbal) AS bal
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name
    )
    SELECT region, nation,
           round(bal, 2) AS balance,
           round(bal / sum(bal) OVER (PARTITION BY region), 6)
               AS share_of_region,
           round(sum(bal) OVER (PARTITION BY region)
                 / sum(bal) OVER (), 6) AS region_share_of_total
    FROM base
    """,
)
def q227_percent_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical percent-of-parent: nation balances as a share of their
    region, and each region as a share of the grand total — the drill-down
    ratio every BI rollup needs, expressed as two windows OVER the
    aggregated residue (125 rows), never over the fact table. The fact
    scan aggregates once; both dims broadcast."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    base = (cust
            .join(F.broadcast(nation),
                  cust["c_nationkey"] == nation["n_nationkey"])
            .join(F.broadcast(region),
                  nation["n_regionkey"] == region["r_regionkey"])
            .groupBy(F.col("r_name").alias("region"),
                     F.col("n_name").alias("nation"))
            .agg(F.sum("c_acctbal").alias("bal")))
    from pyspark.sql import Window
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    return base.select(
        "region", "nation",
        F.round("bal", 2).alias("balance"),
        F.round(F.col("bal") / F.sum("bal").over(w_region), 6)
        .alias("share_of_region"),
        F.round(F.sum("bal").over(w_region) / F.sum("bal").over(w_all), 6)
        .alias("region_share_of_total"))


@register(
    "q234_mass_cutoff",
    sql="""
    WITH per_user AS (
        SELECT event_type, user_id, sum(value) AS v
        FROM events GROUP BY event_type, user_id
    ),
    ranked AS (
        SELECT event_type, v,
               sum(v) OVER (PARTITION BY event_type
                            ORDER BY v DESC, user_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum_v,
               sum(v) OVER (PARTITION BY event_type) AS total_v,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY v DESC, user_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n_users
        FROM per_user
    )
    SELECT event_type,
           CAST(min(n_users) AS BIGINT) AS n_users,
           CAST(min(CASE WHEN cum_v >= 0.5 * total_v THEN rn END) AS BIGINT)
               AS users_for_half_mass,
           round(min(CASE WHEN cum_v >= 0.5 * total_v THEN rn END)::DOUBLE
                 / min(n_users), 6) AS concentration
    FROM ranked GROUP BY event_type
    """,
)
def q234_mass_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nucleus-style mass cutoff (top-p on data): per event type, the
    smallest number of users whose summed value covers 50 % of the total —
    the concentration statistic behind "how few heavy users carry this
    metric" (and the same cumulative-mass machinery as top-p sampling).
    Both windows and the groupBy share the event_type partitioning of the
    per-user residue; the fact table shuffles once."""
    ev = load_table(spark, sf_dir, "events")
    per_user = (ev.groupBy("event_type", "user_id")
                .agg(F.sum("value").alias("v")))
    from pyspark.sql import Window
    w_cum = (Window.partitionBy("event_type")
             .orderBy(F.desc("v"), "user_id")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = Window.partitionBy("event_type")
    ranked = per_user.select(
        "event_type", "v",
        F.sum("v").over(w_cum).alias("cum_v"),
        F.sum("v").over(w_all).alias("total_v"),
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(F.desc("v"), "user_id"))
        .alias("rn"),
        F.count(F.lit(1)).over(w_all).alias("n_users"))
    hit = F.when(F.col("cum_v") >= 0.5 * F.col("total_v"), F.col("rn"))
    return (ranked.groupBy("event_type")
            .agg(F.min("n_users").cast("bigint").alias("n_users"),
                 F.min(hit).cast("bigint").alias("users_for_half_mass"),
                 F.round(F.min(hit).cast("double") / F.min("n_users"), 6)
                 .alias("concentration")))


@register(
    "q243_event_type_overlap",
    sql="""
    WITH ut AS (
        SELECT DISTINCT user_id, event_type FROM events
    ),
    sizes AS (SELECT event_type, count(*) AS n FROM ut GROUP BY event_type)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(count(*) AS BIGINT) AS both_users,
           round(count(*)::DOUBLE / (sa.n + sb.n - count(*)), 6)
               AS user_jaccard
    FROM ut a
    JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
    JOIN sizes sa ON sa.event_type = a.event_type
    JOIN sizes sb ON sb.event_type = b.event_type
    GROUP BY a.event_type, b.event_type, sa.n, sb.n
    """,
)
def q243_event_type_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature co-usage matrix: for every pair of event types, how many
    users do BOTH and the Jaccard of their user sets — the adoption-overlap
    grid product analytics reads before bundling features. The self-join
    keys on user_id over the distinct (user, type) reduction (≤5 rows per
    user), so pair fan-out is bounded by type-count², not events²."""
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    sizes = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select(F.col("user_id").alias("u2"),
                  F.col("event_type").alias("type_b"))
    pairs = (a.join(b, (F.col("u2") == F.col("user_id"))
                    & (F.col("type_a") < F.col("type_b")))
             .groupBy("type_a", "type_b")
             .agg(F.count(F.lit(1)).cast("bigint").alias("both_users")))
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("nb"))
    return (pairs.join(F.broadcast(sa), "type_a")
            .join(F.broadcast(sb), "type_b")
            .select("type_a", "type_b", "both_users",
                    F.round(F.col("both_users").cast("double")
                            / (F.col("na") + F.col("nb") - F.col("both_users")),
                            6).alias("user_jaccard")))


@register(
    "q244_kpi_single_pass",
    sql="""
    SELECT CAST(count(*) AS BIGINT)                             AS n_orders,
           CAST(count(DISTINCT o_custkey) AS BIGINT)            AS n_customers,
           round(sum(o_totalprice), 2)                          AS gross,
           round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2)
                                                                AS gross_filled,
           round(avg(o_totalprice), 4)                          AS aov,
           round(avg(CASE WHEN o_orderpriority LIKE '1-%'
                          THEN o_totalprice END), 4)            AS aov_urgent,
           CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT)
                                                                AS open_orders,
           round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice
                          ELSE 0 END) / sum(o_totalprice), 6)   AS open_share,
           round(min(o_totalprice), 2)                          AS min_order,
           round(max(o_totalprice), 2)                          AS max_order
    FROM orders
    """,
)
def q244_kpi_single_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ten dashboard KPIs in ONE scan — conditional aggregation as metric
    batching: overall and segmented sums/averages, open-order share, and
    extrema computed together so the daily KPI job reads the fact table
    once, not once per metric. Everything is partial-aggregable except the
    exact COUNT DISTINCT, which Spark plans as a two-phase expand — still
    one scan."""
    orders = load_table(spark, sf_dir, "orders")
    tp = F.col("o_totalprice")
    return orders.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.countDistinct("o_custkey").cast("bigint").alias("n_customers"),
        F.round(F.sum(tp), 2).alias("gross"),
        F.round(F.sum(F.when(F.col("o_orderstatus") == "F", tp)), 2)
        .alias("gross_filled"),
        F.round(F.avg(tp), 4).alias("aov"),
        F.round(F.avg(F.when(F.col("o_orderpriority").like("1-%"), tp)), 4)
        .alias("aov_urgent"),
        F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
        .cast("bigint").alias("open_orders"),
        F.round(F.sum(F.when(F.col("o_orderstatus") == "O", tp).otherwise(0))
                / F.sum(tp), 6).alias("open_share"),
        F.round(F.min(tp), 2).alias("min_order"),
        F.round(F.max(tp), 2).alias("max_order"))


@register(
    "q253_customer_rfm",
    sql="""
    WITH per_cust AS (
        SELECT o_custkey,
               max(o_orderdate) AS last_order,
               count(*) AS frequency,
               sum(o_totalprice) AS monetary
        FROM orders GROUP BY o_custkey
    ),
    scored AS (
        SELECT o_custkey,
               ntile(5) OVER (ORDER BY last_order, o_custkey) AS r,
               ntile(5) OVER (ORDER BY frequency, o_custkey)  AS f,
               ntile(5) OVER (ORDER BY monetary, o_custkey)   AS m
        FROM per_cust
    )
    SELECT CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f,
           CAST(m AS BIGINT) AS m,
           CAST(count(*) AS BIGINT) AS n_customers,
           CASE WHEN r >= 4 AND f >= 4 AND m >= 4 THEN 'champion'
                WHEN r <= 2 AND f >= 4 THEN 'at_risk_loyal'
                WHEN r >= 4 AND f <= 2 THEN 'new'
                ELSE 'mid' END AS segment
    FROM scored GROUP BY r, f, m
    """,
)
def q253_customer_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency/frequency/monetary quintiles (ntile with
    custkey tie-breaks → deterministic) rolled into the classic segment
    grid. The per-customer reduction is the data-sized shuffle; the three
    global ntiles run on the customer residue — the known single-partition
    stage (q22's documented exception), bounded by customer count, and at
    100 TB replaced by percentile_approx cutpoints + a broadcast join."""
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (orders.groupBy("o_custkey")
                .agg(F.max("o_orderdate").alias("last_order"),
                     F.count(F.lit(1)).alias("frequency"),
                     F.sum("o_totalprice").alias("monetary")))
    from pyspark.sql import Window
    scored = per_cust.select(
        "o_custkey",
        F.ntile(5).over(Window.orderBy("last_order", "o_custkey")).alias("r"),
        F.ntile(5).over(Window.orderBy("frequency", "o_custkey")).alias("f"),
        F.ntile(5).over(Window.orderBy("monetary", "o_custkey")).alias("m"))
    segment = (F.when((F.col("r") >= 4) & (F.col("f") >= 4)
                      & (F.col("m") >= 4), "champion")
               .when((F.col("r") <= 2) & (F.col("f") >= 4), "at_risk_loyal")
               .when((F.col("r") >= 4) & (F.col("f") <= 2), "new")
               .otherwise("mid"))
    return (scored.groupBy(F.col("r").cast("bigint").alias("r"),
                           F.col("f").cast("bigint").alias("f"),
                           F.col("m").cast("bigint").alias("m"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
            .withColumn("segment", segment))


@register(
    "q255_revenue_waterfall",
    sql="""
    WITH monthly AS (
        SELECT o_orderpriority,
               strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
               sum(o_totalprice) AS rev
        FROM orders GROUP BY 1, 2
    ),
    bounds AS (
        SELECT min(month) AS m0, max(month) AS m1 FROM monthly
    ),
    pivoted AS (
        SELECT o_orderpriority,
               sum(CASE WHEN month = m0 THEN rev ELSE 0 END) AS rev_start,
               sum(CASE WHEN month = m1 THEN rev ELSE 0 END) AS rev_end
        FROM monthly CROSS JOIN bounds
        GROUP BY o_orderpriority
    )
    SELECT o_orderpriority,
           round(rev_start, 2) AS rev_start,
           round(rev_end, 2)   AS rev_end,
           round(rev_end - rev_start, 2) AS delta,
           round((rev_end - rev_start)
                 / sum(rev_end - rev_start) OVER (), 6) AS delta_share
    FROM pivoted
    """,
)
def q255_revenue_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue waterfall: first-vs-last-month revenue change decomposed per
    priority class, each segment's share of the total delta — the bridge
    chart's data. Segment deltas reconcile to the total by construction
    (the share column sums to 1), which is the property hand-built
    waterfalls usually break. Global window runs on the 5-row residue."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = (orders.groupBy(
        "o_orderpriority",
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM")
        .alias("month"))
        .agg(F.sum("o_totalprice").alias("rev")))
    bounds = monthly.agg(F.min("month").alias("m0"), F.max("month").alias("m1"))
    pivoted = (monthly.crossJoin(F.broadcast(bounds))
               .groupBy("o_orderpriority")
               .agg(F.sum(F.when(F.col("month") == F.col("m0"), F.col("rev"))
                          .otherwise(0)).alias("rev_start"),
                    F.sum(F.when(F.col("month") == F.col("m1"), F.col("rev"))
                          .otherwise(0)).alias("rev_end")))
    from pyspark.sql import Window
    delta = F.col("rev_end") - F.col("rev_start")
    return pivoted.select(
        "o_orderpriority",
        F.round("rev_start", 2).alias("rev_start"),
        F.round("rev_end", 2).alias("rev_end"),
        F.round(delta, 2).alias("delta"),
        F.round(delta / F.sum(delta).over(Window.partitionBy()), 6)
        .alias("delta_share"))


@register(
    "q256_group_mode",
    sql="""
    WITH counts AS (
        SELECT user_id, event_type, count(*) AS c
        FROM events GROUP BY user_id, event_type
    ),
    ranked AS (
        SELECT user_id, event_type, c,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY c DESC, event_type) AS rn
        FROM counts
    )
    SELECT user_id, event_type AS modal_type, CAST(c AS BIGINT) AS n
    FROM ranked WHERE rn = 1
    """,
)
def q256_group_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode: each user's most frequent event type,
    ties broken alphabetically — the manual rank form rather than the
    engines' mode() aggregates, whose tie-breaking is implementation-defined
    and would never hash-match across engines. Count then WindowGroupLimit,
    both on the user_id partitioning."""
    ev = load_table(spark, sf_dir, "events")
    counts = (ev.groupBy("user_id", "event_type")
              .agg(F.count(F.lit(1)).alias("c")))
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy(F.desc("c"), "event_type")
    return (counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", F.col("event_type").alias("modal_type"),
                    F.col("c").cast("bigint").alias("n")))


@register(
    "q257_duplicate_orders",
    sql="""
    SELECT a.o_orderkey AS order_a, b.o_orderkey AS order_b,
           a.o_custkey AS custkey,
           round(a.o_totalprice, 2) AS amount,
           CAST(date_diff('day', a.o_orderdate, b.o_orderdate) AS BIGINT)
               AS days_apart
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND a.o_totalprice = b.o_totalprice
     AND a.o_orderkey < b.o_orderkey
     AND b.o_orderdate BETWEEN a.o_orderdate
                           AND a.o_orderdate + INTERVAL 7 DAY
    """,
)
def q257_duplicate_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment screen: order pairs from the same customer with
    the IDENTICAL total within 7 days — the accounts-payable fraud/glitch
    audit. The join keys on (custkey, totalprice) — an equi-join, so the
    date band is a residual filter on already-tiny groups, not a range-join
    blowup."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.select(F.col("o_orderkey").alias("order_a"),
                      F.col("o_custkey").alias("custkey"),
                      F.col("o_totalprice").alias("amount"),
                      F.col("o_orderdate").alias("date_a"))
    b = orders.select(F.col("o_orderkey").alias("order_b"),
                      F.col("o_custkey").alias("ck2"),
                      F.col("o_totalprice").alias("tp2"),
                      F.col("o_orderdate").alias("date_b"))
    pairs = a.join(
        b,
        (F.col("ck2") == F.col("custkey"))
        & (F.col("tp2") == F.col("amount"))
        & (F.col("order_a") < F.col("order_b"))
        & (F.col("date_b") >= F.col("date_a"))
        & (F.col("date_b") <= F.date_add(F.col("date_a").cast("date"), 7)))
    return pairs.select(
        "order_a", "order_b", "custkey",
        F.round("amount", 2).alias("amount"),
        F.datediff(F.col("date_b").cast("date"), F.col("date_a").cast("date"))
        .cast("bigint").alias("days_apart"))


@register(
    "q270_rate_volume_decomposition",
    sql="""
    WITH monthly AS (
        SELECT o_orderpriority,
               strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
               count(*) AS n, sum(o_totalprice) AS rev
        FROM orders GROUP BY 1, 2
    ),
    bounds AS (SELECT min(month) AS m0, max(month) AS m1 FROM monthly),
    wide AS (
        SELECT o_orderpriority,
               sum(CASE WHEN month = m0 THEN n ELSE 0 END) AS n0,
               sum(CASE WHEN month = m0 THEN rev ELSE 0 END) AS r0,
               sum(CASE WHEN month = m1 THEN n ELSE 0 END) AS n1,
               sum(CASE WHEN month = m1 THEN rev ELSE 0 END) AS r1
        FROM monthly CROSS JOIN bounds GROUP BY o_orderpriority
    )
    SELECT o_orderpriority,
           round(r1 - r0, 2) AS delta_rev,
           round((n1 - n0) * (r0 / nullif(n0, 0)), 2) AS volume_effect,
           round(n1 * (r1 / nullif(n1, 0) - r0 / nullif(n0, 0)), 2)
               AS rate_effect,
           round((r1 - r0)
                 - (n1 - n0) * (r0 / nullif(n0, 0))
                 - n1 * (r1 / nullif(n1, 0) - r0 / nullif(n0, 0)), 2)
               AS residual
    FROM wide
    """,
)
def q270_rate_volume_decomposition(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Rate/volume decomposition of the revenue change per priority class:
    Δrev = Δorders·AOV₀ (volume effect) + orders₁·ΔAOV (rate effect) — an
    EXACT decomposition, so the residual column must be 0.00 everywhere
    and the oracle enforces that identity. The metric-explains-itself query
    every revenue review wants next to q255's waterfall. Residue-only math
    after one monthly aggregation."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = (orders.groupBy(
        "o_orderpriority",
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM")
        .alias("month"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("o_totalprice").alias("rev")))
    bounds = monthly.agg(F.min("month").alias("m0"), F.max("month").alias("m1"))
    def pick(col, m):
        return F.sum(F.when(F.col("month") == F.col(m), F.col(col)).otherwise(0))
    wide = (monthly.crossJoin(F.broadcast(bounds))
            .groupBy("o_orderpriority")
            .agg(pick("n", "m0").alias("n0"), pick("rev", "m0").alias("r0"),
                 pick("n", "m1").alias("n1"), pick("rev", "m1").alias("r1")))
    n0 = F.nullif(F.col("n0").cast("double"), F.lit(0.0))
    n1 = F.nullif(F.col("n1").cast("double"), F.lit(0.0))
    volume = (F.col("n1") - F.col("n0")) * (F.col("r0") / n0)
    rate = F.col("n1") * (F.col("r1") / n1 - F.col("r0") / n0)
    delta = F.col("r1") - F.col("r0")
    return wide.select(
        "o_orderpriority",
        F.round(delta, 2).alias("delta_rev"),
        F.round(volume, 2).alias("volume_effect"),
        F.round(rate, 2).alias("rate_effect"),
        F.round(delta - volume - rate, 2).alias("residual"))


@register(
    "q273_abc_classification",
    sql="""
    WITH ranked AS (
        SELECT p_type, p_partkey, p_retailprice,
               sum(p_retailprice) OVER (PARTITION BY p_type
                                        ORDER BY p_retailprice DESC, p_partkey
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS cum_v,
               sum(p_retailprice) OVER (PARTITION BY p_type) AS tot_v
        FROM part
    ),
    classed AS (
        SELECT p_type,
               CASE WHEN cum_v <= 0.5 * tot_v THEN 'A'
                    WHEN cum_v <= 0.8 * tot_v THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM ranked
    )
    SELECT p_type, abc_class,
           CAST(count(*) AS BIGINT) AS n_parts
    FROM classed GROUP BY p_type, abc_class
    """,
)
def q273_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification per part type: parts ranked by retail
    price, class A = the head covering 50 % of cumulative value, B to 80 %,
    C the tail — the Pareto operating split (q187 measures concentration;
    this ASSIGNS the classes). Cumulative and total windows share the
    p_type partitioning — one shuffle."""
    part = load_table(spark, sf_dir, "part")
    from pyspark.sql import Window
    w_cum = (Window.partitionBy("p_type")
             .orderBy(F.desc("p_retailprice"), "p_partkey")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = Window.partitionBy("p_type")
    ranked = part.select(
        "p_type",
        F.sum("p_retailprice").over(w_cum).alias("cum_v"),
        F.sum("p_retailprice").over(w_all).alias("tot_v"))
    abc = (F.when(F.col("cum_v") <= 0.5 * F.col("tot_v"), "A")
           .when(F.col("cum_v") <= 0.8 * F.col("tot_v"), "B")
           .otherwise("C"))
    return (ranked.select("p_type", abc.alias("abc_class"))
            .groupBy("p_type", "abc_class")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts")))


@register(
    "q278_market_concentration",
    sql="""
    WITH per_cust AS (
        SELECT n.n_name, c.c_custkey, sum(c.c_acctbal) AS bal
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name, c.c_custkey
    ),
    tot AS (
        SELECT n_name, sum(bal) AS t FROM per_cust GROUP BY n_name
    )
    SELECT p.n_name,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum((bal / t) * (bal / t)), 6) AS hhi,
           round(1.0 / count(*), 6) AS hhi_floor
    FROM per_cust p JOIN tot USING (n_name)
    WHERE t > 0
    GROUP BY p.n_name
    """,
)
def q278_market_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman concentration of account balances per nation:
    HHI = Σ share² against its 1/n floor — how dominated each market is by
    its largest customers (the antitrust statistic, and the Gini's
    squared-share cousin q164 doesn't cover). Negative balances make HHI
    ill-defined, so nations with non-positive totals are excluded on both
    sides; per-customer shares aggregate once, residue math after."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    per_cust = (cust.join(F.broadcast(nation),
                          cust["c_nationkey"] == nation["n_nationkey"])
                .groupBy("n_name", "c_custkey")
                .agg(F.sum("c_acctbal").alias("bal")))
    tot = per_cust.groupBy("n_name").agg(F.sum("bal").alias("t"))
    share = F.col("bal") / F.col("t")
    return (per_cust.join(F.broadcast(tot), "n_name")
            .filter(F.col("t") > 0)
            .groupBy("n_name")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"),
                 F.round(F.sum(share * share), 6).alias("hhi"),
                 F.round(1.0 / F.count(F.lit(1)), 6).alias("hhi_floor")))


@register(
    "q281_nation_trade_matrix",
    sql="""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(count(*) AS BIGINT) AS n_lines,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS volume
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    WHERE cn.n_name IN ('NATION_3', 'NATION_7')
      AND sn.n_name IN ('NATION_3', 'NATION_7')
      AND cn.n_name <> sn.n_name
    GROUP BY cn.n_name, sn.n_name
    """,
)
def q281_nation_trade_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-shaped cross-border trade volume: discounted revenue flowing
    between a chosen nation pair's customer/supplier sides — the two-fact-join
    (lineitem⋈orders on orderkey is the one real shuffle) with customer,
    supplier, and both nation hops broadcast, and the nation filters pushed
    through the dimension joins so the fact scan's probe side shrinks
    before shuffling."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cn = nation.filter(F.col("n_name").isin("NATION_3", "NATION_7")).select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation"))
    sn = nation.filter(F.col("n_name").isin("NATION_3", "NATION_7")).select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation"))
    c = (cust.join(F.broadcast(cn), cust["c_nationkey"] == F.col("cnk"))
         .select("c_custkey", "cust_nation"))
    s = (supp.join(F.broadcast(sn), supp["s_nationkey"] == F.col("snk"))
         .select("s_suppkey", "supp_nation"))
    joined = (li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
              .join(F.broadcast(c), orders["o_custkey"] == c["c_custkey"])
              .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
              .filter(F.col("cust_nation") != F.col("supp_nation")))
    return (joined.groupBy("cust_nation", "supp_nation")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_lines"),
                 F.round(F.sum(F.col("l_extendedprice")
                               * (1 - F.col("l_discount"))), 2)
                 .alias("volume")))
