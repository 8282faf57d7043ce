"""Native column profiler — re-implements the reference's PyDeequ surface
(/root/reference/pipeline/data_profiling.py:41-54) without the JVM jar.

Per column: completeness (null rate), approx distinct, min/max/mean/stddev/
sum (numeric). Everything is computed in ONE wide aggregate pass over the
table — a single scan + single-row exchange regardless of table size, which
is exactly how a 100 TB profile must run (Deequ does the same internally).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load_table
from ..plans.registry import register

_NUMERIC = {"int", "bigint", "smallint", "tinyint", "double", "float", "decimal"}


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Profile ``df`` → one output row per column.

    Output: column, n_rows, n_nulls, completeness, approx_distinct, and for
    numeric columns min/max/mean/stddev/sum (null otherwise).
    """
    dtypes = dict(df.dtypes)
    cols = columns or list(dtypes)
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        is_num = dtypes[c].split("(")[0] in _NUMERIC
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nulls"),
            F.approx_count_distinct(c).alias(f"{c}__adist"),
            (F.min(F.col(c).cast("double")) if is_num else F.lit(None).cast("double")).alias(f"{c}__min"),
            (F.max(F.col(c).cast("double")) if is_num else F.lit(None).cast("double")).alias(f"{c}__max"),
            (F.avg(F.col(c).cast("double")) if is_num else F.lit(None).cast("double")).alias(f"{c}__mean"),
            (F.stddev(F.col(c).cast("double")) if is_num else F.lit(None).cast("double")).alias(f"{c}__std"),
            (F.sum(F.col(c).cast("double")) if is_num else F.lit(None).cast("double")).alias(f"{c}__sum"),
        ]
    wide = df.agg(*aggs)
    # Pivot the single wide row to one row per column via a stack expression —
    # stays distributed (the wide row is 1 row; stack is a cheap generator).
    stacked = wide.select(
        F.expr(
            "stack({n}, {args}) as (column, n_rows, n_nulls, approx_distinct, "
            "min_value, max_value, mean_value, stddev_value, sum_value)".format(
                n=len(cols),
                args=", ".join(
                    f"'{c}', __n, {c}__nulls, {c}__adist, {c}__min, {c}__max, "
                    f"{c}__mean, {c}__std, {c}__sum"
                    for c in cols
                ),
            )
        )
    )
    return stacked.withColumn(
        "completeness",
        F.round(1.0 - F.col("n_nulls") / F.col("n_rows"), 6),
    )


# --------------------------------------------------------------------------
# q33 — profiler as an oracle-checked query (approx_distinct excluded from
# the oracle — sketch algorithms differ across engines; exact stats checked).
# --------------------------------------------------------------------------
@register(
    "q33_profile_lineitem",
    sql="""
    SELECT 'l_quantity' AS column,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           round(min(l_quantity), 4) AS min_value,
           round(max(l_quantity), 4) AS max_value,
           round(avg(l_quantity), 4) AS mean_value,
           round(stddev_samp(l_quantity), 4) AS stddev_value,
           round(sum(l_quantity), 2) AS sum_value
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', count(*),
           CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           round(min(l_extendedprice), 4), round(max(l_extendedprice), 4),
           round(avg(l_extendedprice), 4), round(stddev_samp(l_extendedprice), 4),
           round(sum(l_extendedprice), 2)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', count(*),
           CAST(sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           round(min(l_discount), 4), round(max(l_discount), 4),
           round(avg(l_discount), 4), round(stddev_samp(l_discount), 4),
           round(sum(l_discount), 2)
    FROM lineitem
    """,
)
def q33_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2: the native profiler over lineitem's numeric measure columns
    (exact stats only; the approx-distinct sketch is exercised in q34)."""
    li = load_table(spark, sf_dir, "lineitem")
    prof = profile(li, ["l_quantity", "l_extendedprice", "l_discount"])
    return prof.select(
        "column", "n_rows",
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        F.round("min_value", 4).alias("min_value"),
        F.round("max_value", 4).alias("max_value"),
        F.round("mean_value", 4).alias("mean_value"),
        F.round("stddev_value", 4).alias("stddev_value"),
        F.round("sum_value", 2).alias("sum_value"),
    )


# --------------------------------------------------------------------------
# q34 — approx distinct (A2): tolerance oracle (the estimate itself differs
# by engine, but its error BOUND vs the exact count is SQL-expressible)
# --------------------------------------------------------------------------
@register(
    "q34_approx_distinct",
    sql="""
    SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           CAST(count(DISTINCT l_partkey)  AS BIGINT) AS exact_parts,
           CAST(count(DISTINCT l_suppkey)  AS BIGINT) AS exact_supps,
           TRUE AS orders_within_5pct,
           TRUE AS parts_within_5pct,
           TRUE AS supps_within_5pct
    FROM lineitem
    """,
)
def q34_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 approx_count_distinct (HyperLogLog++). DuckDB's HLL yields
    different estimates by design, so the hashed columns are the EXACT
    counts plus booleans encoding the estimate's relative-error bound
    (rsd 2%, bound 5% ≈ 2.5σ): the oracle emits the exact counts and TRUE,
    so the hash matches iff Spark's estimate lands inside the bound. The
    tighter empirical bound is additionally pinned in unit tests."""
    li = load_table(spark, sf_dir, "lineitem")

    def ok(approx, exact):
        return (F.abs(approx - exact) <= 0.05 * exact)

    agg = li.agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("a_o"),
        F.approx_count_distinct("l_partkey", 0.02).alias("a_p"),
        F.approx_count_distinct("l_suppkey", 0.02).alias("a_s"),
        F.count_distinct("l_orderkey").alias("exact_orders"),
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.count_distinct("l_suppkey").alias("exact_supps"),
    )
    return agg.select(
        "exact_orders", "exact_parts", "exact_supps",
        ok(F.col("a_o"), F.col("exact_orders")).alias("orders_within_5pct"),
        ok(F.col("a_p"), F.col("exact_parts")).alias("parts_within_5pct"),
        ok(F.col("a_s"), F.col("exact_supps")).alias("supps_within_5pct"),
    )


@register(
    "q111_approx_percentiles",
    sql="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS p25_exact,
           round(quantile_cont(l_extendedprice, 0.50), 4) AS p50_exact,
           round(quantile_cont(l_extendedprice, 0.75), 4) AS p75_exact,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99_exact,
           TRUE AS approx_within_half_pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q111_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (Greenwald-Khanna percentile_approx with
    relative-error 1/accuracy): the single-pass mergeable alternative to
    q16's exact percentiles — at 100 TB exact percentile needs a full sort
    or two passes, the sketch needs one partial-aggregable pass. Tolerance
    oracle: the hashed columns are the EXACT interpolated percentiles
    (Spark `percentile` ≡ DuckDB `quantile_cont`, same rank-interpolation
    formula) plus a boolean asserting every GK estimate is within 0.5% of
    its exact value — the oracle emits the exacts and literal TRUE, so the
    hash matches iff the sketch's bound holds. The raw estimates remain
    available via percentile_approx directly; the tighter unit-test pin in
    tests/test_new_operators.py is unchanged."""
    li = load_table(spark, sf_dir, "lineitem")
    ps = (0.25, 0.5, 0.75, 0.99)
    agg = (li.groupBy("l_returnflag")
           .agg(*[F.percentile_approx("l_extendedprice", p, 10_000)
                  .alias(f"a{int(p * 100):02d}") for p in ps],
                *[F.percentile("l_extendedprice", F.lit(p))
                  .alias(f"e{int(p * 100):02d}") for p in ps]))
    ok = [(F.abs(F.col(f"a{int(p*100):02d}") - F.col(f"e{int(p*100):02d}"))
           <= 0.005 * F.col(f"e{int(p*100):02d}")) for p in ps]
    bound = ok[0]
    for o in ok[1:]:
        bound = bound & o
    return agg.select(
        "l_returnflag",
        *[F.round(F.col(f"e{int(p*100):02d}"), 4)
          .alias(f"p{int(p*100):02d}_exact") for p in ps],
        bound.alias("approx_within_half_pct"))


@register(
    "q117_mad_outliers",
    sql="""
    WITH ranked AS (
      SELECT l_returnflag, l_extendedprice,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice) AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    ),
    med AS (
      SELECT l_returnflag, l_extendedprice AS med_price
      FROM ranked WHERE rn = (n + 1) // 2
    ),
    dev AS (
      SELECT l.l_returnflag,
             abs(l.l_extendedprice - m.med_price) AS adev,
             l.l_extendedprice, m.med_price
      FROM lineitem l JOIN med m USING (l_returnflag)
    ),
    dev_ranked AS (
      SELECT l_returnflag, adev,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY adev)
               AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM dev
    ),
    mad AS (
      SELECT l_returnflag, adev AS mad_price
      FROM dev_ranked WHERE rn = (n + 1) // 2
    )
    SELECT d.l_returnflag,
           round(any_value(d.med_price), 2) AS med_price,
           round(any_value(m.mad_price), 2) AS mad_price,
           CAST(sum(CASE WHEN d.adev > 3 * m.mad_price THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (l_returnflag)
    GROUP BY d.l_returnflag
    """,
)
def q117_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: median absolute deviation per group, rows
    beyond 3×MAD counted — the quality gate that survives the skewed
    distributions where mean±3σ fails. Exact lower-medians via per-group
    rank (a real data value — engine-portable, unlike interpolated
    medians); the fact table scans twice — unavoidable for exact medians,
    and why q111's mergeable percentile sketch is the single-pass
    alternative."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice")

    def lower_median(df: DataFrame, col: str, out: str) -> DataFrame:
        # exact LOWER median: a real data value at rank (n+1)//2 — no
        # interpolation, so Spark and the oracle agree bit-for-bit (the
        # interpolated median differs in the last ULP between engines)
        w = Window.partitionBy("l_returnflag").orderBy(col)
        wc = Window.partitionBy("l_returnflag")
        return (df.withColumn("__rn", F.row_number().over(w))
                .withColumn("__n", F.count(F.lit(1)).over(wc))
                .filter(F.col("__rn") == ((F.col("__n") + 1) / 2)
                        .cast("bigint"))
                .select("l_returnflag", F.col(col).alias(out)))

    med = lower_median(li, "l_extendedprice", "med_price")
    dev = (li.join(F.broadcast(med), "l_returnflag")
           .withColumn("adev", F.abs(F.col("l_extendedprice")
                                     - F.col("med_price"))))
    mad = lower_median(dev.select("l_returnflag", "adev"), "adev",
                       "mad_price")
    return (dev.join(F.broadcast(mad), "l_returnflag")
            .groupBy("l_returnflag")
            .agg(F.round(F.any_value("med_price"), 2).alias("med_price"),
                 F.round(F.any_value("mad_price"), 2).alias("mad_price"),
                 F.sum(F.when(F.col("adev") > 3 * F.col("mad_price"), 1)
                       .otherwise(0)).cast("bigint").alias("n_outliers")))


@register(
    "q325_kmv_sketch",
    sql="""
    WITH du AS (
        SELECT DISTINCT event_type, user_id FROM events
    ),
    hashed AS (
        SELECT event_type,
               CAST(('0x' || substr(md5('kmv-' || event_type || '-'
                                        || user_id), 1, 8))
                    AS BIGINT) / 4294967296.0 AS u
        FROM du
    ),
    ranked AS (
        SELECT event_type, u,
               row_number() OVER (PARTITION BY event_type ORDER BY u) AS rnk,
               count(*) OVER (PARTITION BY event_type) AS nd
        FROM hashed
    )
    SELECT event_type,
           CAST(min(nd) AS BIGINT) AS exact_distinct,
           round(CASE WHEN min(nd) <= 64 THEN min(nd)::DOUBLE
                      ELSE 63.0 / max(CASE WHEN rnk = 64 THEN u END)
                 END, 4) AS kmv_estimate,
           round(abs(CASE WHEN min(nd) <= 64 THEN min(nd)::DOUBLE
                          ELSE 63.0 / max(CASE WHEN rnk = 64 THEN u END)
                     END - min(nd)) / min(nd), 6) AS rel_error
    FROM ranked
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q325_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch (k = 64) per event type,
    with its error measured against the exact count in the same result.
    Unlike HLL (q34/q100 — engine-private register layouts, rows-only
    checkable), KMV built on an explicit md5-uniform IS deterministic
    and engine-portable: the estimate (k-1)/u_(k) reproduces bit-for-bit
    in any system that can hash and sort, which makes sketch results
    AUDITABLE across engine migrations — the property this query
    demonstrates by being value-checked against DuckDB. Mergeability at
    100 TB: per-partition bottom-k sets union and re-truncate (a
    map-side-combinable agg); the window form here is the bounded-residue
    equivalent."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select("event_type", "user_id").distinct()
    u = (F.conv(F.substring(
        F.md5(F.concat(F.lit("kmv-"), F.col("event_type"), F.lit("-"),
                       F.col("user_id").cast("string"))),
        1, 8), 16, 10).cast("bigint") / F.lit(4294967296.0))
    w = Window.partitionBy("event_type").orderBy("u")
    wc = Window.partitionBy("event_type")
    ranked = (du.select("event_type", u.alias("u"))
              .withColumn("rnk", F.row_number().over(w))
              .withColumn("nd", F.count(F.lit(1)).over(wc)))
    kth = F.max(F.when(F.col("rnk") == 64, F.col("u")))
    est = (F.when(F.min("nd") <= 64, F.min("nd").cast("double"))
           .otherwise(63.0 / kth))
    return (ranked.groupBy("event_type")
            .agg(F.min("nd").cast("bigint").alias("exact_distinct"),
                 F.round(est, 4).alias("kmv_estimate"),
                 F.round(F.abs(est - F.min("nd")) / F.min("nd"), 6)
                 .alias("rel_error"))
            .orderBy("event_type"))


@register(
    "q336_kmv_set_ops",
    sql="""
    WITH du AS (
        SELECT user_id,
               max(CASE WHEN event_type = 'click' AND value > 100
                        THEN 1 ELSE 0 END) AS in_a,
               max(CASE WHEN event_type = 'purchase' AND value > 150
                        THEN 1 ELSE 0 END) AS in_b
        FROM events WHERE event_type IN ('click', 'purchase')
        GROUP BY user_id
        HAVING max(CASE WHEN event_type = 'click' AND value > 100
                        THEN 1 ELSE 0 END) = 1
            OR max(CASE WHEN event_type = 'purchase' AND value > 150
                        THEN 1 ELSE 0 END) = 1
    ),
    hashed AS (
        SELECT user_id, in_a, in_b,
               CAST(('0x' || substr(md5('kmv-' || user_id), 1, 8))
                    AS BIGINT) / 4294967296.0 AS u
        FROM du
    ),
    unioned AS (
        SELECT *, row_number() OVER (ORDER BY u) AS rnk FROM hashed
    ),
    sketch AS (
        SELECT count(*)::DOUBLE AS k,
               sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
                   ::DOUBLE AS k_both,
               max(u) AS uk
        FROM unioned WHERE rnk <= 64
    ),
    exact AS (
        SELECT count(*)::DOUBLE AS n_union,
               sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
                   ::DOUBLE AS n_inter
        FROM hashed
    )
    SELECT CAST(e.n_union AS BIGINT) AS exact_union,
           CAST(e.n_inter AS BIGINT) AS exact_intersection,
           round((s.k - 1) / s.uk, 4) AS kmv_union_est,
           round(s.k_both / s.k, 6) AS kmv_jaccard_est,
           round((s.k_both / s.k) * ((s.k - 1) / s.uk), 4)
               AS kmv_intersection_est,
           round(e.n_inter / e.n_union, 6) AS exact_jaccard
    FROM sketch s CROSS JOIN exact e
    """,
)
def q336_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch SET operations: estimate the union size, Jaccard
    similarity, and intersection size of the click-users and
    purchase-users sets from one bottom-64 sketch of the union — the
    estimator pattern (union from the kth hash, Jaccard from the
    sketch's tagged fraction, intersection = J * union) that answers
    audience-overlap questions without ever materializing either set.
    Extends q325 from single-set counts to the set algebra; exact values
    computed alongside so the error is visible. Deterministic md5
    uniforms keep the estimates engine-portable and value-checkable."""
    ev = (load_table(spark, sf_dir, "events")
          .filter(F.col("event_type").isin("click", "purchase")))
    hi_a = F.max(F.when((F.col("event_type") == "click")
                        & (F.col("value") > 100), 1).otherwise(0))
    hi_b = F.max(F.when((F.col("event_type") == "purchase")
                        & (F.col("value") > 150), 1).otherwise(0))
    du = (ev.groupBy("user_id")
          .agg(hi_a.alias("in_a"), hi_b.alias("in_b"))
          .filter((F.col("in_a") == 1) | (F.col("in_b") == 1)))
    u = (F.conv(F.substring(
        F.md5(F.concat(F.lit("kmv-"), F.col("user_id").cast("string"))),
        1, 8), 16, 10).cast("bigint") / F.lit(4294967296.0))
    hashed = du.withColumn("u", u)
    ranked = hashed.withColumn("rnk",
                               F.row_number().over(Window.orderBy("u")))
    sketch = (ranked.filter(F.col("rnk") <= 64)
              .agg(F.count(F.lit(1)).cast("double").alias("k"),
                   F.sum(F.when((F.col("in_a") == 1) & (F.col("in_b") == 1),
                                1).otherwise(0)).cast("double")
                   .alias("k_both"),
                   F.max("u").alias("uk")))
    exact = hashed.agg(
        F.count(F.lit(1)).cast("double").alias("n_union"),
        F.sum(F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1)
              .otherwise(0)).cast("double").alias("n_inter"))
    un_est = (F.col("k") - 1) / F.col("uk")
    j_est = F.col("k_both") / F.col("k")
    return (sketch.crossJoin(F.broadcast(exact))
            .select(F.col("n_union").cast("bigint").alias("exact_union"),
                    F.col("n_inter").cast("bigint")
                    .alias("exact_intersection"),
                    F.round(un_est, 4).alias("kmv_union_est"),
                    F.round(j_est, 6).alias("kmv_jaccard_est"),
                    F.round(j_est * un_est, 4).alias("kmv_intersection_est"),
                    F.round(F.col("n_inter") / F.col("n_union"), 6)
                    .alias("exact_jaccard")))
