"""Data-quality constraint checks — the native replacement for the
reference's PyDeequ plane (SURVEY.md §2.13; data_profiling.py:41-54 profiles
columns but the Deequ library it loads is built for *constraint
verification*, which this module provides without the JVM jar).

Design: a Check collects constraints, then ``run()`` evaluates ALL of them
in ONE wide aggregation pass over the data — one job, one shuffle-free
scan-side reduction, regardless of constraint count. That batching is what
makes a 100-constraint suite affordable on 100 TB: cost is one table scan,
identical to Deequ's analyzer-batching architecture.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from ..plans.registry import register


@dataclass
class _Constraint:
    name: str
    metric: Column          # double-valued aggregate expression
    passed: Column          # boolean expression over the metric


@dataclass
class Check:
    """Fluent constraint collector; every constraint is one aggregate
    expression evaluated in a single pass by ``run()``."""

    df: DataFrame
    constraints: list[_Constraint] = field(default_factory=list)

    def _add(self, name: str, metric: Column, passed: Column) -> "Check":
        self.constraints.append(_Constraint(name, metric, passed))
        return self

    def is_complete(self, col: str) -> "Check":
        m = (F.count(col).cast("double") / F.count(F.lit(1)))
        return self._add(f"complete({col})", m, m == 1.0)

    def is_unique(self, *cols: str) -> "Check":
        # Distinct over a STRUCT of the keys, not count_distinct(cols...):
        # the latter skips rows where any key is NULL, whereas DuckDB's
        # count(DISTINCT (a,b)) counts NULL-bearing tuples. The struct is
        # never NULL, so both engines count every row's key tuple.
        m = (F.count_distinct(F.struct(*[F.col(c) for c in cols]))
             .cast("double") / F.count(F.lit(1)))
        return self._add(f"unique({','.join(cols)})", m, m == 1.0)

    def satisfies(self, predicate: str, name: str,
                  threshold: float = 1.0) -> "Check":
        m = (F.sum(F.when(F.expr(predicate), 1).otherwise(0)).cast("double")
             / F.count(F.lit(1)))
        return self._add(f"satisfies({name})", m, m >= threshold)

    def has_min(self, col: str, at_least: float) -> "Check":
        m = F.min(col).cast("double")
        return self._add(f"min({col})", m, m >= at_least)

    def has_max(self, col: str, at_most: float) -> "Check":
        m = F.max(col).cast("double")
        return self._add(f"max({col})", m, m <= at_most)

    def is_contained_in(self, col: str, values: list[str]) -> "Check":
        m = (F.sum(F.col(col).isin(values).cast("int")).cast("double")
             / F.count(F.lit(1)))
        return self._add(f"contained({col})", m, m == 1.0)

    def run(self) -> DataFrame:
        """One wide agg row → unpivoted (constraint, metric, passed) rows."""
        aggs = []
        for i, c in enumerate(self.constraints):
            aggs.append(F.round(c.metric, 6).alias(f"m_{i}"))
            aggs.append(c.passed.alias(f"p_{i}"))
        wide = self.df.agg(*aggs)
        rows = F.array(*[
            F.struct(F.lit(c.name).alias("constraint"),
                     F.col(f"m_{i}").alias("metric"),
                     F.col(f"p_{i}").alias("passed"))
            for i, c in enumerate(self.constraints)
        ])
        return (wide.select(F.explode(rows).alias("r"))
                .select("r.constraint", "r.metric", "r.passed"))


@register(
    "q77_quality_checks",
    sql="""
    WITH m AS (
      SELECT count(*) AS n,
             count(l_orderkey) AS c_ok,
             count(DISTINCT (l_orderkey, l_linenumber)) AS u_ol,
             sum(CASE WHEN l_quantity > 0 THEN 1 ELSE 0 END) AS s_qty,
             min(l_discount) AS min_disc,
             max(l_discount) AS max_disc,
             sum(CASE WHEN l_returnflag IN ('A','N','R') THEN 1 ELSE 0 END) AS c_rf
      FROM lineitem
    )
    SELECT 'complete(l_orderkey)' AS constraint,
           round(c_ok::DOUBLE / n, 6) AS metric, c_ok = n AS passed FROM m
    UNION ALL
    SELECT 'unique(l_orderkey,l_linenumber)',
           round(u_ol::DOUBLE / n, 6), u_ol = n FROM m
    UNION ALL
    SELECT 'satisfies(positive_qty)',
           round(s_qty::DOUBLE / n, 6), s_qty = n FROM m
    UNION ALL
    SELECT 'min(l_discount)', round(min_disc::DOUBLE, 6), min_disc >= 0 FROM m
    UNION ALL
    SELECT 'max(l_discount)', round(max_disc::DOUBLE, 6), max_disc <= 0.1 FROM m
    UNION ALL
    SELECT 'contained(l_returnflag)',
           round(c_rf::DOUBLE / n, 6), c_rf = n FROM m
    """,
)
def q77_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.13 constraint verification (Deequ's VerificationSuite, natively):
    six constraints over lineitem in ONE aggregation pass. The fixture's
    (l_orderkey, l_linenumber) is intentionally non-unique, so the suite
    exercises both passing and failing constraints."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        Check(li)
        .is_complete("l_orderkey")
        .is_unique("l_orderkey", "l_linenumber")
        .satisfies("l_quantity > 0", "positive_qty")
        .has_min("l_discount", 0.0)
        .has_max("l_discount", 0.1)
        .is_contained_in("l_returnflag", ["A", "N", "R"])
        .run()
    )


@register(
    "q155_referential_integrity",
    sql="""
    SELECT 'orders.custkey->customer' AS fk,
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT) AS orphans,
           CAST((SELECT count(*) FROM orders) AS BIGINT) AS total
    UNION ALL
    SELECT 'lineitem.orderkey->orders',
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT),
           CAST((SELECT count(*) FROM lineitem) AS BIGINT)
    UNION ALL
    SELECT 'lineitem.suppkey->supplier',
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                   WHERE s.s_suppkey = l.l_suppkey))
                AS BIGINT),
           CAST((SELECT count(*) FROM lineitem) AS BIGINT)
    """,
)
def q155_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit (the FK checks a lakehouse can't enforce
    declaratively): orphan counts for three fact→dim edges via left-anti
    joins. Each edge is one anti join — dims broadcast, the fact never
    shuffles — so the full audit costs three broadcast passes regardless of
    fact size; the Deequ-style Check suite (q77) covers in-table constraints
    and this covers cross-table ones."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")

    def edge(fk: str, fact: DataFrame, fact_key: str,
             dim: DataFrame, dim_key: str) -> DataFrame:
        orphans = fact.join(
            F.broadcast(dim.select(dim_key)),
            fact[fact_key] == dim[dim_key], "left_anti")
        return spark.createDataFrame([(fk,)], "fk string").crossJoin(
            orphans.agg(F.count("*").cast("bigint").alias("orphans"))
        ).crossJoin(
            fact.agg(F.count("*").cast("bigint").alias("total"))
        )

    return (
        edge("orders.custkey->customer", orders, "o_custkey",
             customer, "c_custkey")
        .unionByName(edge("lineitem.orderkey->orders", lineitem, "l_orderkey",
                          orders, "o_orderkey"))
        .unionByName(edge("lineitem.suppkey->supplier", lineitem, "l_suppkey",
                          supplier, "s_suppkey"))
    )


@register(
    "q156_key_skew_report",
    sql="""
    WITH freq AS (
        SELECT l_suppkey AS key, count(*) AS c FROM lineitem GROUP BY 1
    ),
    stats AS (
        SELECT CAST(count(*) AS BIGINT) AS n_keys,
               CAST(max(c) AS BIGINT) AS max_rows,
               round(avg(c), 4) AS avg_rows,
               round(quantile_cont(c, 0.5), 1) AS p50,
               round(quantile_cont(c, 0.99), 1) AS p99,
               round(max(c) / avg(c), 4) AS skew_factor
        FROM freq
    ),
    top AS (
        SELECT key, CAST(c AS BIGINT) AS c
        FROM freq ORDER BY c DESC, key LIMIT 3
    )
    SELECT s.*, t.key AS top_key, t.c AS top_rows
    FROM stats s, top t
    """,
)
def q156_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic — the report that decides between plain
    shuffle, AQE skew split, and explicit salting (operators/skew.py): key
    cardinality, per-key row percentiles, max/avg skew factor, and the top
    hot keys. One fact-side count aggregation; everything downstream runs
    on the key-frequency residue."""
    freq = (load_table(spark, sf_dir, "lineitem")
            .groupBy(F.col("l_suppkey").alias("key"))
            .agg(F.count("*").alias("c")))
    stats = freq.agg(
        F.count("*").cast("bigint").alias("n_keys"),
        F.max("c").cast("bigint").alias("max_rows"),
        F.round(F.avg("c"), 4).alias("avg_rows"),
        F.round(F.expr("percentile(c, 0.5)"), 1).alias("p50"),
        F.round(F.expr("percentile(c, 0.99)"), 1).alias("p99"),
        F.round(F.max("c") / F.avg("c"), 4).alias("skew_factor"),
    )
    top = (freq.orderBy(F.desc("c"), "key").limit(3)
           .select(F.col("key").alias("top_key"),
                   F.col("c").cast("bigint").alias("top_rows")))
    return stats.crossJoin(top)


@register(
    "q172_dlq_routing",
    sql="""
    SELECT CASE
             WHEN props IS NULL OR NOT json_valid(props) THEN 'invalid_json'
             WHEN json_extract_string(props, '$.k') IS NULL THEN 'missing_key'
             ELSE 'valid'
           END AS route,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
    FROM events
    GROUP BY 1
    """,
)
def q172_dlq_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dead-letter routing (the transform-stage twin of the permissive CSV
    ingest): classify each event's JSON payload as valid / missing required
    key / unparseable, the split a foreachBatch writer would fan to main
    and DLQ sinks. Pure expression classification — one pass, no UDF;
    try-parse via get_json_object returning NULL on bad JSON mirrors
    DuckDB's json_valid."""
    ev = load_table(spark, sf_dir, "events")
    parsed = F.get_json_object("props", "$.k")
    # get_json_object is NULL for both invalid JSON and a missing key;
    # distinguish via a whole-document extraction that only fails on
    # invalid JSON.
    whole = F.get_json_object("props", "$")
    route = (F.when(F.col("props").isNull() | whole.isNull(), "invalid_json")
             .when(parsed.isNull(), "missing_key")
             .otherwise("valid"))
    return (ev.groupBy(route.alias("route"))
            .agg(F.count("*").cast("bigint").alias("n"),
                 F.countDistinct("event_type").cast("bigint").alias("n_types")))


@register(
    "q205_psi_drift",
    sql="""
    WITH mid AS (
        SELECT epoch_us(min(ts))
               + (epoch_us(max(ts)) - epoch_us(min(ts))) // 2 AS m_us
        FROM events
    ),
    binned AS (
        SELECT event_type,
               CAST(least(floor(value / 25), 12) AS BIGINT) AS bin,
               CASE WHEN epoch_us(ts) < m_us THEN 'ref' ELSE 'cur' END AS half
        FROM events CROSS JOIN mid
    ),
    cells AS (
        SELECT event_type, bin,
               sum(CASE WHEN half = 'ref' THEN 1 ELSE 0 END) AS c_ref,
               sum(CASE WHEN half = 'cur' THEN 1 ELSE 0 END) AS c_cur
        FROM binned GROUP BY event_type, bin
    ),
    tot AS (
        SELECT event_type,
               sum(c_ref)::DOUBLE AS n_ref, sum(c_cur)::DOUBLE AS n_cur
        FROM cells GROUP BY event_type
    )
    SELECT cells.event_type,
           round(sum(((c_cur + 0.5) / (n_cur + 0.5) - (c_ref + 0.5) / (n_ref + 0.5))
                     * ln(((c_cur + 0.5) / (n_cur + 0.5))
                          / ((c_ref + 0.5) / (n_ref + 0.5)))), 6) AS psi,
           CAST(count(*) AS BIGINT) AS n_bins
    FROM cells JOIN tot USING (event_type)
    GROUP BY cells.event_type
    """,
)
def q205_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift monitor: the value distribution of
    each event type in the second half of the month vs the first half,
    binned on fixed 25-unit integer buckets (deterministic expression
    binning — no engine-specific percentile interpolation), with +0.5
    Laplace smoothing so empty cells don't blow up the log. PSI > 0.2 is
    the conventional retrain/alert trigger. One data-sized shuffle (the
    cell count), then per-type rollups on a 13-bin table."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    mid = ev.agg(
        (F.min(us) + F.floor((F.max(us) - F.min(us)) / 2)).cast("bigint")
        .alias("m_us"))
    binned = ev.crossJoin(F.broadcast(mid)).select(
        "event_type",
        F.least(F.floor(F.col("value") / 25), F.lit(12)).cast("bigint")
        .alias("bin"),
        F.when(us < F.col("m_us"), "ref").otherwise("cur").alias("half"))
    cells = (binned.groupBy("event_type", "bin")
             .agg(F.sum(F.when(F.col("half") == "ref", 1).otherwise(0))
                  .alias("c_ref"),
                  F.sum(F.when(F.col("half") == "cur", 1).otherwise(0))
                  .alias("c_cur")))
    tot = (cells.groupBy("event_type")
           .agg(F.sum("c_ref").cast("double").alias("n_ref"),
                F.sum("c_cur").cast("double").alias("n_cur")))
    p_cur = (F.col("c_cur") + 0.5) / (F.col("n_cur") + 0.5)
    p_ref = (F.col("c_ref") + 0.5) / (F.col("n_ref") + 0.5)
    return (cells.join(F.broadcast(tot), "event_type")
            .groupBy("event_type")
            .agg(F.round(F.sum((p_cur - p_ref) * F.log(p_cur / p_ref)), 6)
                 .alias("psi"),
                 F.count(F.lit(1)).cast("bigint").alias("n_bins")))


@register(
    "q206_benford_audit",
    sql="""
    WITH digits AS (
        SELECT CAST(substr(CAST(o_totalprice AS VARCHAR), 1, 1) AS BIGINT)
                   AS d
        FROM orders
    ),
    obs AS (SELECT d, count(*)::DOUBLE AS c FROM digits GROUP BY d),
    tot AS (SELECT sum(c) AS n FROM obs)
    SELECT d AS leading_digit,
           CAST(c AS BIGINT) AS observed,
           round(n * ln(1 + 1.0 / d) / ln(10), 4) AS expected,
           round((c - n * ln(1 + 1.0 / d) / ln(10))
                 * (c - n * ln(1 + 1.0 / d) / ln(10))
                 / (n * ln(1 + 1.0 / d) / ln(10)), 6) AS chi2_term
    FROM obs CROSS JOIN tot
    ORDER BY leading_digit
    """,
)
def q206_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order totals — the classic forensic
    data-quality screen for fabricated or truncated numeric columns: the
    observed leading-digit distribution vs ln(1+1/d)/ln(10), with the
    per-digit chi-square contribution. Leading digit comes from the string
    cast (no log10 boundary hazard at exact powers of ten). The whole plan
    is one 9-row aggregation; chi2 terms are expression-only."""
    orders = load_table(spark, sf_dir, "orders")
    obs = (orders.select(
        F.substring(F.col("o_totalprice").cast("string"), 1, 1)
        .cast("bigint").alias("d"))
        .groupBy("d").agg(F.count(F.lit(1)).cast("double").alias("c")))
    tot = obs.agg(F.sum("c").alias("n"))
    exp = F.col("n") * F.log(1 + 1.0 / F.col("d")) / F.log(F.lit(10.0))
    return (obs.crossJoin(F.broadcast(tot))
            .select(F.col("d").alias("leading_digit"),
                    F.col("c").cast("bigint").alias("observed"),
                    F.round(exp, 4).alias("expected"),
                    F.round((F.col("c") - exp) * (F.col("c") - exp) / exp, 6)
                    .alias("chi2_term"))
            .orderBy("leading_digit"))


@register(
    "q215_k_anonymity",
    sql="""
    WITH groups AS (
        SELECT c_nationkey, c_mktsegment, count(*) AS n
        FROM customer GROUP BY c_nationkey, c_mktsegment
    )
    SELECT CAST(count(*) AS BIGINT)                       AS n_groups,
           CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
                                                          AS risky_groups,
           CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
                                                          AS risky_individuals,
           round(sum(CASE WHEN n < 5 THEN n ELSE 0 END)::DOUBLE / sum(n), 6)
                                                          AS risky_frac,
           CAST(min(n) AS BIGINT)                         AS min_group_size
    FROM groups
    """,
)
def q215_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (k = 5) over the quasi-identifier pair
    (nation, market segment): how many identifier combinations — and how
    many individuals — sit in groups smaller than k, i.e. are
    re-identifiable by those attributes alone. The privacy-compliance
    counterpart of the PII redaction pass (q106): redaction removes direct
    identifiers, this measures the indirect ones. One count aggregation
    plus a constant-size rollup."""
    cust = load_table(spark, sf_dir, "customer")
    groups = (cust.groupBy("c_nationkey", "c_mktsegment")
              .agg(F.count(F.lit(1)).alias("n")))
    risky = F.when(F.col("n") < 5, F.col("n")).otherwise(0)
    return groups.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(F.when(F.col("n") < 5, 1).otherwise(0)).cast("bigint")
        .alias("risky_groups"),
        F.sum(risky).cast("bigint").alias("risky_individuals"),
        F.round(F.sum(risky).cast("double") / F.sum("n"), 6)
        .alias("risky_frac"),
        F.min("n").cast("bigint").alias("min_group_size"))


@register(
    "q226_dp_noisy_counts",
    sql="""
    WITH counts AS (
        SELECT c_nationkey, count(*)::DOUBLE AS n
        FROM customer GROUP BY c_nationkey
    ),
    seeded AS (
        SELECT c_nationkey, n,
               (CAST(CAST('0x' || substr(md5('dp-seed-' || c_nationkey), 1, 12)
                          AS BIGINT) AS DOUBLE) / 281474976710656.0) - 0.5 AS u
        FROM counts
    )
    SELECT c_nationkey,
           CAST(n AS BIGINT) AS true_count,
           round(n - sign(u) * ln(1 - 2 * abs(u)), 4) AS noisy_count
    FROM seeded
    """,
)
def q226_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differential-privacy-shaped noisy counts: per-nation customer counts
    with Laplace(1/ε, ε=1) noise via inverse-CDF sampling — u drawn from a
    content-addressed uniform (md5 of a seeded key mapped to [-0.5, 0.5)),
    noise = -sign(u)·ln(1-2|u|)·(1/ε). Deterministic seeding makes the
    release replayable and oracle-checkable; a production DP release swaps
    the seeded uniform for a true RNG and this query IS the release job
    (sensitivity 1 count queries). True counts ride along here only for
    the audit."""
    cust = load_table(spark, sf_dir, "customer")
    counts = (cust.groupBy("c_nationkey")
              .agg(F.count(F.lit(1)).cast("double").alias("n")))
    u = (F.conv(F.substring(F.md5(F.concat(F.lit("dp-seed-"),
                                           F.col("c_nationkey").cast("string"))),
                            1, 12), 16, 10).cast("double")
         / F.lit(281474976710656.0)) - 0.5
    seeded = counts.select("c_nationkey", "n", u.alias("u"))
    noise = -F.signum("u") * F.log(1 - 2 * F.abs(F.col("u")))
    return seeded.select(
        "c_nationkey",
        F.col("n").cast("bigint").alias("true_count"),
        F.round(F.col("n") + noise, 4).alias("noisy_count"))


@register(
    "q231_order_total_audit",
    sql="""
    WITH li AS (
        SELECT l_orderkey,
               round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                   AS computed
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN computed IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS childless_orders,
           CAST(sum(CASE WHEN abs(o_totalprice - computed) < 0.02
                         THEN 1 ELSE 0 END) AS BIGINT) AS consistent_orders,
           round(avg(abs(o_totalprice - computed)), 2) AS avg_abs_gap,
           round(max(abs(o_totalprice - computed)), 2) AS max_abs_gap
    FROM orders LEFT JOIN li ON o_orderkey = l_orderkey
    """,
)
def q231_order_total_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table financial reconciliation: o_totalprice vs the TPC-H
    pricing identity recomputed from lineitems — on this synthetic fixture
    the identity deliberately does NOT hold (0 consistent orders, 27
    childless at sf0.001), and the audit's job is to SAY so with gap
    magnitudes rather than assume. One lineitem aggregation, broadcast-side
    join back to orders, constant-size rollup."""
    orders = load_table(spark, sf_dir, "orders")
    li = (load_table(spark, sf_dir, "lineitem")
          .groupBy("l_orderkey")
          .agg(F.round(F.sum(F.col("l_extendedprice")
                             * (1 - F.col("l_discount"))
                             * (1 + F.col("l_tax"))), 2).alias("computed")))
    gap = F.abs(F.col("o_totalprice") - F.col("computed"))
    return (orders.join(li, orders["o_orderkey"] == li["l_orderkey"], "left")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                 F.sum(F.when(F.col("computed").isNull(), 1).otherwise(0))
                 .cast("bigint").alias("childless_orders"),
                 F.sum(F.when(gap < 0.02, 1).otherwise(0)).cast("bigint")
                 .alias("consistent_orders"),
                 F.round(F.avg(gap), 2).alias("avg_abs_gap"),
                 F.round(F.max(gap), 2).alias("max_abs_gap")))


@register(
    "q297_fd_discovery",
    sql="""
    WITH cands AS (
        SELECT 'events.user_id->event_type' AS fd,
               count(*) AS n_groups,
               sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS n_violations
        FROM (SELECT user_id, count(DISTINCT event_type) AS c
              FROM events GROUP BY user_id)
        UNION ALL
        SELECT 'orders.o_custkey->o_orderpriority',
               count(*), sum(CASE WHEN c > 1 THEN 1 ELSE 0 END)
        FROM (SELECT o_custkey, count(DISTINCT o_orderpriority) AS c
              FROM orders GROUP BY o_custkey)
        UNION ALL
        SELECT 'lineitem.l_partkey->l_returnflag',
               count(*), sum(CASE WHEN c > 1 THEN 1 ELSE 0 END)
        FROM (SELECT l_partkey, count(DISTINCT l_returnflag) AS c
              FROM lineitem GROUP BY l_partkey)
        UNION ALL
        SELECT 'customer.c_custkey->c_mktsegment',
               count(*), sum(CASE WHEN c > 1 THEN 1 ELSE 0 END)
        FROM (SELECT c_custkey, count(DISTINCT c_mktsegment) AS c
              FROM customer GROUP BY c_custkey)
        UNION ALL
        SELECT 'nation.n_nationkey->n_regionkey',
               count(*), sum(CASE WHEN c > 1 THEN 1 ELSE 0 END)
        FROM (SELECT n_nationkey, count(DISTINCT n_regionkey) AS c
              FROM nation GROUP BY n_nationkey)
    )
    SELECT fd, CAST(n_groups AS BIGINT) AS n_groups,
           CAST(n_violations AS BIGINT) AS n_violations,
           CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT)
               AS holds,
           round(n_violations::DOUBLE / n_groups, 6) AS violation_rate
    FROM cands
    ORDER BY fd
    """,
)
def q297_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery over candidate column pairs — the
    schema-profiling pass (Deequ/Metanome style) that answers "does A
    uniquely determine B?" by counting determinant groups with more than
    one distinct dependent value. Each candidate is one grouped
    count-distinct reduction (shuffle keyed on the determinant; map-side
    partial aggregation applies), so checking k candidates is k
    independent scans that run in parallel — no candidate ever needs the
    raw rows of another. Key-based candidates (c_custkey, n_nationkey)
    document the holds=1 baseline; behavioral ones surface real
    violations."""
    cands = [
        ("events", "user_id", "event_type"),
        ("orders", "o_custkey", "o_orderpriority"),
        ("lineitem", "l_partkey", "l_returnflag"),
        ("customer", "c_custkey", "c_mktsegment"),
        ("nation", "n_nationkey", "n_regionkey"),
    ]
    out = None
    for table, det, dep in cands:
        grouped = (load_table(spark, sf_dir, table)
                   .groupBy(det)
                   .agg(F.count_distinct(dep).alias("c")))
        row = grouped.agg(
            F.lit(f"{table}.{det}->{dep}").alias("fd"),
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).cast("bigint")
            .alias("n_violations"))
        out = row if out is None else out.unionAll(row)
    return (out.select(
        "fd", "n_groups", "n_violations",
        F.when(F.col("n_violations") == 0, 1).otherwise(0).cast("bigint")
        .alias("holds"),
        F.round(F.col("n_violations").cast("double") / F.col("n_groups"), 6)
        .alias("violation_rate"))
        .orderBy("fd"))


# ---------------------------------------------------------------------------
# q423 — k-anonymity audit (privacy governance)
# ---------------------------------------------------------------------------

K_ANON = 5


@register(
    "q423_k_anonymity_audit",
    sql=f"""
    SELECT c_nationkey, c_mktsegment,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(*) >= {K_ANON} AS INT) AS meets_k,
           round(1.0 / count(*), 6) AS reident_risk
    FROM customer
    GROUP BY c_nationkey, c_mktsegment
    ORDER BY c_nationkey, c_mktsegment
    """,
)
def q423_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier pair (nation, market
    segment): every equivalence class's size, whether it meets k=5, and
    the worst-case re-identification risk 1/n — the privacy-governance
    check a training-data release runs before shipping user-derived rows
    (classes below k get suppressed or generalized). One partial-aggregated
    groupBy over the quasi-identifier columns; at 100 TB the class table
    is bounded by the QI domain (nations x segments), not row count."""
    cust = load_table(spark, sf_dir, "customer")
    return (cust.groupBy("c_nationkey", "c_mktsegment")
            .agg(F.count("*").cast("bigint").alias("n"))
            .select("c_nationkey", "c_mktsegment", "n",
                    (F.col("n") >= K_ANON).cast("int").alias("meets_k"),
                    F.round(F.lit(1.0) / F.col("n"), 6).alias("reident_risk"))
            .orderBy("c_nationkey", "c_mktsegment"))


# ---------------------------------------------------------------------------
# q425 — population stability index (distribution drift monitor)
# ---------------------------------------------------------------------------

PSI_BUCKETS = 10
PSI_SMOOTH = 0.5   # add-half smoothing so empty buckets stay finite


@register(
    "q425_psi_drift_monitor",
    sql=f"""
    WITH m AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_words,
             CAST(substr(source, 4) AS INT) AS src_num
      FROM documents),
    base AS (SELECT n_words FROM m WHERE src_num < 10),
    cur AS (SELECT n_words FROM m WHERE src_num >= 10),
    rng AS (SELECT min(n_words) AS lo,
                   (max(n_words) - min(n_words)) / {float(PSI_BUCKETS)!r}
                     AS width
            FROM base),
    bb AS (SELECT least({PSI_BUCKETS - 1},
                        greatest(0, CAST(floor((n_words - lo) / width)
                                         AS BIGINT))) AS bucket
           FROM base, rng),
    cb AS (SELECT least({PSI_BUCKETS - 1},
                        greatest(0, CAST(floor((n_words - lo) / width)
                                         AS BIGINT))) AS bucket
           FROM cur, rng),
    spine AS (SELECT unnest(range(0, {PSI_BUCKETS})) AS bucket),
    counts AS (
      SELECT s.bucket,
             coalesce(b.n, 0) AS base_n, coalesce(c.n, 0) AS cur_n
      FROM spine s
      LEFT JOIN (SELECT bucket, CAST(count(*) AS BIGINT) AS n
                 FROM bb GROUP BY bucket) b ON b.bucket = s.bucket
      LEFT JOIN (SELECT bucket, CAST(count(*) AS BIGINT) AS n
                 FROM cb GROUP BY bucket) c ON c.bucket = s.bucket),
    tot AS (SELECT sum(base_n) AS nb, sum(cur_n) AS nc FROM counts),
    terms AS (
      SELECT bucket, base_n, cur_n,
             CAST(floor(
               ((base_n + {PSI_SMOOTH}) / (nb + {PSI_SMOOTH * PSI_BUCKETS})
                - (cur_n + {PSI_SMOOTH}) / (nc + {PSI_SMOOTH * PSI_BUCKETS}))
               * ln(((base_n + {PSI_SMOOTH})
                     / (nb + {PSI_SMOOTH * PSI_BUCKETS}))
                    / ((cur_n + {PSI_SMOOTH})
                       / (nc + {PSI_SMOOTH * PSI_BUCKETS})))
               * 1e12 + 0.5) AS BIGINT) AS it
      FROM counts, tot)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(base_n AS BIGINT) AS base_n, CAST(cur_n AS BIGINT) AS cur_n,
           round(CAST(it AS DOUBLE) / 1e12, 8) AS psi_term,
           round(CAST(sum(it) OVER () AS DOUBLE) / 1e12, 6) AS psi_total
    FROM terms ORDER BY bucket
    """,
)
def q425_psi_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index between the first ten sources (baseline
    population) and the last ten (current) over the per-doc word-count
    distribution — THE standard production drift monitor for a data
    pipeline's intake (PSI < 0.1 stable, > 0.25 action). Ten equal-width
    buckets over the BASELINE's range (current values clamp into the edge
    buckets, as a deployed monitor must), add-half smoothing so empty
    buckets stay finite, and per-bucket terms quantized to 1e12-scaled
    integers so the window total is an exact sum on both engines.

    100 TB lens: two partial-aggregated count passes (the range subquery
    and the bucket rollup) — bucket table is PSI_BUCKETS rows; nothing
    corpus-sized shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    m = docs.select(
        F.size(F.split("text", " ")).alias("n_words"),
        F.substring("source", 4, 10).cast("int").alias("src_num"))
    base = m.filter(F.col("src_num") < 10)
    cur = m.filter(F.col("src_num") >= 10)
    rng = base.agg(
        F.min("n_words").alias("lo"),
        ((F.max("n_words") - F.min("n_words"))
         / F.lit(float(PSI_BUCKETS))).alias("width"))

    def bucketed(df):
        return (df.crossJoin(F.broadcast(rng))
                .select(F.least(
                    F.lit(PSI_BUCKETS - 1),
                    F.greatest(F.lit(0), F.floor(
                        (F.col("n_words") - F.col("lo")) / F.col("width"))
                        .cast("bigint")).cast("bigint")).alias("bucket"))
                .groupBy("bucket").agg(F.count("*").cast("bigint").alias("n")))

    spine = spark.range(PSI_BUCKETS).select(F.col("id").alias("bucket"))
    counts = (spine
              .join(bucketed(base).withColumnRenamed("n", "base_n"),
                    "bucket", "left")
              .join(bucketed(cur).withColumnRenamed("n", "cur_n"),
                    "bucket", "left")
              .select("bucket",
                      F.coalesce("base_n", F.lit(0)).alias("base_n"),
                      F.coalesce("cur_n", F.lit(0)).alias("cur_n")))
    tot = counts.agg(F.sum("base_n").alias("nb"), F.sum("cur_n").alias("nc"))
    s, sm = PSI_SMOOTH, PSI_SMOOTH * PSI_BUCKETS
    p = (F.col("base_n") + F.lit(s)) / (F.col("nb") + F.lit(sm))
    q = (F.col("cur_n") + F.lit(s)) / (F.col("nc") + F.lit(sm))
    it = F.floor((p - q) * F.log(p / q) * F.lit(1e12) + F.lit(0.5)) \
        .cast("bigint")
    terms = counts.crossJoin(F.broadcast(tot)).withColumn("it", it)
    from pyspark.sql import Window as W
    return (terms.select(
        F.col("bucket").cast("bigint").alias("bucket"), "base_n", "cur_n",
        F.round(F.col("it").cast("double") / F.lit(1e12), 8)
        .alias("psi_term"),
        F.round(F.sum("it").over(W.partitionBy()).cast("double")
                / F.lit(1e12), 6).alias("psi_total"))
        .orderBy("bucket"))
