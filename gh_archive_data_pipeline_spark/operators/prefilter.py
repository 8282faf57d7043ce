"""Bloom-style semi-join reduction: prefilter a huge fact against a compact
hash signature of the dimension keys, then finish with the exact join.

Spark's own runtime bloom filtering (`spark.sql.optimizer.runtime.bloomFilter`)
covers the planner-injected case; this operator is the *explicit* version for
when the dim-key set is itself the product of a query and must be shipped
across stages or days (e.g. "events for users flagged yesterday" at 100 TB):
the signature is a ≤ k·W-row table of (seed, bucket) pairs — kilobytes —
where the raw key set might be tens of GB and unbroadcastable. No false
negatives (every true key hashes into the signature), and false positives
are removed by the exact semi join that follows, so the result is exact.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.readers import load_table

BLOOM_K = 3      # hash functions (xxhash64 seeds)
BLOOM_W = 8192   # buckets per hash


def bloom_signature(keys: DataFrame, key: str) -> list[DataFrame]:
    """One distinct (bucket) table per seed — each ≤ W rows regardless of
    key-set size, so each is always broadcastable."""
    return [
        keys.select(
            F.pmod(F.xxhash64(F.col(key), F.lit(k)), F.lit(BLOOM_W)).alias("bucket")
        ).distinct()
        for k in range(BLOOM_K)
    ]


def bloom_prefilter(fact: DataFrame, key: str, signature: list[DataFrame]) -> DataFrame:
    """Keep fact rows whose key lands in a set bucket under EVERY seed —
    k successive broadcast left-semi joins, each pruning further before the
    next; the fact never shuffles."""
    def one(df: DataFrame, seed_sig: tuple[int, DataFrame]) -> DataFrame:
        k, sig = seed_sig
        return df.join(
            F.broadcast(sig),
            F.pmod(F.xxhash64(F.col(key), F.lit(k)), F.lit(BLOOM_W)) == sig.bucket,
            "left_semi",
        )
    return reduce(one, enumerate(signature), fact)


@register(
    "q140_bloom_prefilter_join",
    sql="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'BUILDING')
    GROUP BY o_orderpriority
    """,
)
def q140_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join via bloom prefilter + exact verify: orders from BUILDING
    customers. The oracle is the plain IN-subquery — the bloom path must
    produce the identical result (no false negatives by construction, false
    positives removed by the final exact semi join). At fixture scale the
    signature is overkill; at 100 TB it is what makes the reduction shippable
    when the key set itself is too large to broadcast.
    """
    orders = load_table(spark, sf_dir, "orders")
    keys = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    candidates = bloom_prefilter(
        orders, "o_custkey", bloom_signature(keys, "c_custkey")
    )
    exact = candidates.join(
        F.broadcast(keys.withColumnRenamed("c_custkey", "o_custkey")),
        "o_custkey",
        "left_semi",
    )
    return exact.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )
