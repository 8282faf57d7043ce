"""Sorts / top-k / set operations (SURVEY.md §2.8, §2.9).

Scale notes: orderBy+limit plans as TakeOrderedAndProject (per-partition
top-k, then a k-row merge on the driver — no global sort). Set ops are
hash-aggregates / hash-joins under the hood and shuffle once on the full row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .registry import register


# --------------------------------------------------------------------------
# q23 — top-k (O3) + global sort (O2)
# --------------------------------------------------------------------------
@register(
    "q23_top_orders",
    sql="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
           o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q23_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 top-k: TakeOrderedAndProject, k rows per partition cross the wire."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderkey", "o_custkey",
                F.round("o_totalprice", 2).alias("o_totalprice"),
                "o_orderpriority")
        .limit(20)
    )


# --------------------------------------------------------------------------
# q24 — union / intersect / except in one query (§2.9)
# --------------------------------------------------------------------------
@register(
    "q24_nation_set_ops",
    sql="""
    WITH cust_nations AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
         supp_nations AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
    SELECT nationkey, 'customers_only' AS side
    FROM (SELECT nationkey FROM cust_nations EXCEPT SELECT nationkey FROM supp_nations)
    UNION ALL
    SELECT nationkey, 'suppliers_only' AS side
    FROM (SELECT nationkey FROM supp_nations EXCEPT SELECT nationkey FROM cust_nations)
    UNION ALL
    SELECT nationkey, 'both' AS side
    FROM (SELECT nationkey FROM cust_nations INTERSECT SELECT nationkey FROM supp_nations)
    """,
)
def q24_nation_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 union + intersect + except composed into a nation partition-of-
    membership: which nations have only customers, only suppliers, or both."""
    cust = (load_table(spark, sf_dir, "customer")
            .select(F.col("c_nationkey").alias("nationkey")).distinct())
    supp = (load_table(spark, sf_dir, "supplier")
            .select(F.col("s_nationkey").alias("nationkey")).distinct())
    return (
        cust.exceptAll(supp).withColumn("side", F.lit("customers_only"))
        .unionByName(supp.exceptAll(cust).withColumn("side", F.lit("suppliers_only")))
        .unionByName(cust.intersect(supp).withColumn("side", F.lit("both")))
    )


# --------------------------------------------------------------------------
# q25 — partition-local sort (O4), exposed through a per-group first/last
# --------------------------------------------------------------------------
@register(
    "q25_latest_order_per_customer",
    sql="""
    SELECT o_custkey, o_orderkey AS latest_orderkey, o_orderdate AS latest_date
    FROM (SELECT o_custkey, o_orderkey, o_orderdate,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM orders) t
    WHERE rn = 1
    """,
)
def q25_latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4/W1: latest row per key — the workhorse 'current snapshot' pattern
    (sort within hash partitions only, never a global sort)."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey",
                F.col("o_orderkey").alias("latest_orderkey"),
                F.col("o_orderdate").alias("latest_date"))
    )


@register(
    "q217_bag_set_ops",
    sql="""
    WITH a AS (SELECT l_suppkey AS k FROM lineitem WHERE l_returnflag = 'R'),
         b AS (SELECT l_suppkey AS k FROM lineitem WHERE l_linestatus = 'F'),
         i AS (SELECT k FROM a INTERSECT ALL SELECT k FROM b),
         e AS (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
    SELECT 'intersect_all' AS op, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT k) AS BIGINT) AS n_keys
    FROM i
    UNION ALL
    SELECT 'except_all', CAST(count(*) AS BIGINT), CAST(count(DISTINCT k) AS BIGINT)
    FROM e
    UNION ALL
    SELECT 'union_all', CAST(count(*) AS BIGINT), CAST(count(DISTINCT k) AS BIGINT)
    FROM (SELECT k FROM a UNION ALL SELECT k FROM b)
    """,
)
def q217_bag_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics (ALL) set operations — the multiplicity-preserving
    corner of §2.9 that q24's DISTINCT variants don't exercise:
    INTERSECT ALL keeps min(multiplicity), EXCEPT ALL subtracts
    multiplicities, UNION ALL concatenates. Each arm collapses to a count
    pair so the oracle pins the multiplicity arithmetic, not row order.
    Spark plans INTERSECT/EXCEPT ALL as a single aggregate + generate
    (replicate_rows) round — one shuffle per arm, no join explosion."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R").select(F.col("l_suppkey").alias("k"))
    b = li.filter(F.col("l_linestatus") == "F").select(F.col("l_suppkey").alias("k"))

    def stats(df, op):
        return df.agg(F.lit(op).alias("op"),
                      F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                      F.countDistinct("k").cast("bigint").alias("n_keys"))

    return (stats(a.intersectAll(b), "intersect_all")
            .unionByName(stats(a.exceptAll(b), "except_all"))
            .unionByName(stats(a.unionAll(b), "union_all")))
