"""Feature-engineering operators: robust scaling, grouped regression,
forward fill, fuzzy matching — the numeric-preparation plane a training
pipeline runs after filtering (reference analytics surface:
/root/reference/README.md:7; profiling plane data_profiling.py).

All plans are two-phase where a global statistic is needed: aggregate the
statistic first (tiny result), broadcast it back over the fact — never a
global sort or a per-row subquery.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.registry import register
from ..sources.readers import load_table


@register(
    "q135_winsorized_scaling",
    sql="""
    WITH p AS (
        SELECT l_returnflag,
               quantile_cont(l_extendedprice, 0.01) AS p01,
               quantile_cont(l_extendedprice, 0.99) AS p99
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           round(any_value(p.p01), 2) AS p01,
           round(any_value(p.p99), 2) AS p99,
           CAST(sum(CASE WHEN l.l_extendedprice < p.p01
                           OR l.l_extendedprice > p.p99
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped,
           round(avg(l.l_extendedprice), 2) AS mean_raw,
           round(avg(least(greatest(l.l_extendedprice, p.p01), p.p99)), 2)
               AS mean_winsorized
    FROM lineitem l JOIN p USING (l_returnflag)
    GROUP BY l.l_returnflag
    """,
)
def q135_winsorized_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (1%/99%-clipped) robust scaling audit per return flag:
    exact percentile bounds, clip counts, and mean before/after clipping.
    Two-phase plan: the exact per-group percentiles aggregate down to 3 rows,
    broadcast back over the fact scan — the fact shuffles once on the group
    key and the percentile table never exceeds group cardinality.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_extendedprice, 0.01)").alias("p01"),
        F.expr("percentile(l_extendedprice, 0.99)").alias("p99"),
    )
    clipped = F.least(F.greatest(F.col("l_extendedprice"), F.col("p01")), F.col("p99"))
    out_of_band = (F.col("l_extendedprice") < F.col("p01")) | (
        F.col("l_extendedprice") > F.col("p99")
    )
    return (
        li.join(F.broadcast(p), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.any_value("p01"), 2).alias("p01"),
            F.round(F.any_value("p99"), 2).alias("p99"),
            F.sum(out_of_band.cast("int")).cast("bigint").alias("n_clipped"),
            F.round(F.avg("l_extendedprice"), 2).alias("mean_raw"),
            F.round(F.avg(clipped), 2).alias("mean_winsorized"),
        )
    )


# Grouped linear regression from EXACT moments. Float sums are
# summation-order-sensitive (regr_slope straight off doubles flipped a 6th
# decimal between Spark and DuckDB), so both engines sum fixed-point decimals
# — exact and order-independent — and only then run the identical IEEE-double
# slope/intercept/r² arithmetic on the finished moments. x is integer seconds
# since 2024-01-01 (fits DECIMAL(9,0) for the 30-day fixture window), y is
# value rounded to 4dp (DECIMAL(12,4)).
_REGR_BODY = """
    WITH m AS (
        SELECT event_type,
               count(*)      AS n,
               sum(xs)       AS sx,
               sum(y4)       AS sy,
               sum(xs * y4)  AS sxy,
               sum(xs * xs)  AS sxx,
               sum(y4 * y4)  AS syy
        FROM (SELECT event_type,
                     CAST({epoch_sec} - 1704067200 AS DECIMAL(9,0))  AS xs,
                     CAST(value AS DECIMAL(12,4))                    AS y4
              FROM {table})
        GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 * 86400.0, 6) AS slope_per_day,
           round((CAST(sy AS DOUBLE)
                  - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE), 4) AS intercept,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
    FROM m
"""


@register(
    "q136_group_regression",
    sql=_REGR_BODY.format(epoch_sec="CAST(floor(epoch(ts)) AS BIGINT)",
                          table="events"),
)
def q136_group_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares trend: value drift per day for each event
    type, from the five regression moments (n, Σx, Σy, Σxy, Σx², Σy²).
    The moments are distributive aggregates — one partial-aggregated shuffle
    on the 5-key group column, same shape as a plain grouped sum at 100 TB —
    and they're summed as fixed-point decimals so the result is exact and
    independent of partitioning/summation order (a run on 10 partitions and
    a run on 10,000 produce bit-identical slopes)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_regr_v")
    return spark.sql(_REGR_BODY.format(epoch_sec="unix_timestamp(ts)",
                                       table="events_regr_v"))


@register(
    "q138_forward_fill",
    sql="""
    WITH sparse AS (
        SELECT user_id, event_id, ts,
               CASE WHEN event_type = 'purchase' THEN value END AS purchase_value
        FROM events
    )
    SELECT user_id, event_id,
           round(last_value(purchase_value IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id), 2)
               AS last_purchase_value
    FROM sparse
    """,
)
def q138_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (LOCF): carry each user's most recent purchase value
    across their subsequent events — the gap-filling step for sparse signals
    before feature extraction. One shuffle on user_id, partition-local sort,
    `last(ignorenulls)` over the running frame; no spine materialization
    (complementing q91's resample, which fills a dense spine with zeros).
    """
    ev = load_table(spark, sf_dir, "events")
    sparse = ev.select(
        "user_id", "event_id", "ts",
        F.when(F.col("event_type") == "purchase", F.col("value")).alias("purchase_value"),
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return sparse.select(
        "user_id", "event_id",
        F.round(F.last("purchase_value", ignorenulls=True).over(w), 2)
        .alias("last_purchase_value"),
    )


@register(
    "q137_fuzzy_pairs",
    sql="""
    SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_distance
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_size = b.p_size
     AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 12
    """,
)
def q137_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy duplicate candidates by edit distance, blocked on
    (brand, size): the classic blocked string-similarity join — the
    blocking key bounds the quadratic comparison to within-block pairs
    (the same candidate-then-verify shape as MinHash/LSH in
    operators/dedup.py, with levenshtein as the verifier). The self-join
    shuffles once on the block key; no unblocked cross product exists in
    the plan.
    """
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_size"
    )
    a, b = part.alias("a"), part.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_size") == F.col("b.p_size"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .where(dist <= 12)
        .select(
            F.col("a.p_partkey").alias("key_a"),
            F.col("b.p_partkey").alias("key_b"),
            dist.cast("bigint").alias("edit_distance"),
        )
    )
