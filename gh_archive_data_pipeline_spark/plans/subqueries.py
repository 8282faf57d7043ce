"""Subquery operator family: scalar, correlated-scalar, IN/NOT IN — the
remaining relational surface of the reference's SQL endpoints (SURVEY.md
§2.3 P5 / §3.4). Catalyst decorrelates these into joins; the tests in
test_plan_quality assert no correlated re-execution survives planning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .registry import register


@register(
    "q66_scalar_subquery",
    sql="""
    SELECT p_partkey, p_name, round(p_retailprice, 2) AS p_retailprice
    FROM part
    WHERE p_retailprice > 1.04 * (SELECT avg(p_retailprice) FROM part)
    """,
)
def q66_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: parts priced >1.04× the global average (retailprice is uniform in [900,1000), so larger multipliers select nothing).
    Plans as a one-row broadcast into the filter — the fact scan runs once."""
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part_v")
    return spark.sql("""
        SELECT p_partkey, p_name, round(p_retailprice, 2) AS p_retailprice
        FROM part_v
        WHERE p_retailprice > 1.04 * (SELECT avg(p_retailprice) FROM part_v)
    """)


@register(
    "q67_correlated_scalar",
    sql="""
    SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS c_acctbal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                       WHERE c2.c_nationkey = c.c_nationkey)
    """,
)
def q67_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery: customers above their nation's average
    balance. Catalyst decorrelates to aggregate-then-join — one pass over
    customer + a 25-row broadcast, not a per-row re-execution."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql("""
        SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS c_acctbal
        FROM customer_v c
        WHERE c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer_v c2
                           WHERE c2.c_nationkey = c.c_nationkey)
    """)


@register(
    "q68_in_subquery",
    sql="""
    SELECT o_orderkey, o_orderpriority, round(o_totalprice, 2) AS o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer
                        WHERE c_mktsegment = 'MACHINERY')
      AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem
                             WHERE l_quantity > 49)
    """,
)
def q68_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN + NOT IN subqueries → semi/anti joins after rewrite. NOT IN over a
    non-nullable key is safe here; with nullable keys NOT IN becomes a
    null-aware anti join (documented trap)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql("""
        SELECT o_orderkey, o_orderpriority, round(o_totalprice, 2) AS o_totalprice
        FROM orders_v
        WHERE o_custkey IN (SELECT c_custkey FROM customer_v
                            WHERE c_mktsegment = 'MACHINERY')
          AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem_v
                                 WHERE l_quantity > 49)
    """)


@register(
    "q69_top_customer_per_nation",
    sql="""
    SELECT n_name, c_name, round(c_acctbal, 2) AS c_acctbal
    FROM (SELECT c_nationkey, c_name, c_acctbal,
                 row_number() OVER (PARTITION BY c_nationkey
                                    ORDER BY c_acctbal DESC, c_custkey) AS rn
          FROM customer) c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE rn = 1
    """,
)
def q69_top_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greatest-n-per-group with dimension join: richest customer per nation
    (ties broken by lowest custkey)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    from pyspark.sql import Window

    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), "c_custkey")
    top = (cust.withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") == 1))
    return (
        top.join(F.broadcast(nation), top.c_nationkey == nation.n_nationkey)
        .select("n_name", "c_name", F.round("c_acctbal", 2).alias("c_acctbal"))
    )


@register(
    "q79_sales_opportunity",
    sql="""
    SELECT c_nationkey, count(*) AS numcust,
           round(sum(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_nationkey IN (1, 3, 5)
      AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
                       WHERE c_acctbal > 0 AND c_nationkey IN (1, 3, 5))
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    GROUP BY c_nationkey
    """,
)
def q79_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape on the fixture schema: scalar subquery (avg positive
    balance, broadcast as a 1-row join) + NOT EXISTS (left-anti join against
    high-value orders — the filter is pushed below the anti join so only the
    qualifying order keys shuffle) + grouped agg.
    All three subquery styles composed in one declarative plan."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(1, 3, 5))
    orders = (load_table(spark, sf_dir, "orders")
              .filter(F.col("o_totalprice") > 400000).select("o_custkey"))
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg"))
    rich = (cust.crossJoin(F.broadcast(avg_bal))
            .filter(F.col("c_acctbal") > F.col("__avg")))
    no_orders = rich.join(orders, rich.c_custkey == orders.o_custkey,
                          "left_anti")
    return (no_orders.groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("numcust"),
                 F.round(F.sum("c_acctbal"), 2).alias("totacctbal")))


@register(
    "q104_recursive_month_spine",
    sql="""
    WITH RECURSIVE months(m, stop) AS (
      SELECT date_trunc('month', min(o_orderdate)),
             date_trunc('month', max(o_orderdate)) FROM orders
      UNION ALL
      SELECT m + INTERVAL 1 MONTH, stop FROM months WHERE m < stop
    )
    SELECT m AS month,
           coalesce(n, 0) AS n_orders,
           round(coalesce(total, 0), 2) AS total
    FROM months LEFT JOIN (
      SELECT date_trunc('month', o_orderdate) AS m2,
             count(*) AS n, sum(o_totalprice) AS total
      FROM orders GROUP BY 1
    ) agg ON months.m = agg.m2
    """,
)
def q104_recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE, run through spark.sql): build
    the complete month spine from min to max order date by recursion, then
    left-join monthly aggregates — identical SQL runs on both engines, so
    the recursion semantics themselves are what's oracle-checked. The stop
    bound rides along as a recursion column: a scalar subquery in the
    recursive step re-scans orders once per iteration (measured 12 s over
    80 iterations; this form is one scan)."""
    from ..sources.readers import load_table as _lt

    _lt(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
      WITH RECURSIVE months(m, stop) AS (
        SELECT date_trunc('month', min(o_orderdate)),
               date_trunc('month', max(o_orderdate)) FROM orders
        UNION ALL
        SELECT m + INTERVAL 1 MONTH, stop FROM months WHERE m < stop
      )
      SELECT m AS month,
             coalesce(n, 0) AS n_orders,
             round(coalesce(total, 0), 2) AS total
      FROM months LEFT JOIN (
        SELECT date_trunc('month', o_orderdate) AS m2,
               count(*) AS n, sum(o_totalprice) AS total
        FROM orders GROUP BY 1
      ) agg ON months.m = agg.m2
    """)


@register(
    "q157_multi_supplier_orders",
    sql="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           round(avg(s.n_suppliers), 4) AS avg_suppliers
    FROM orders o JOIN (
        SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_suppliers
        FROM lineitem GROUP BY l_orderkey
        HAVING count(DISTINCT l_suppkey) >= 3
    ) s ON o.o_orderkey = s.l_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def q157_multi_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-flavored shape: per-order distinct-supplier counts with a
    HAVING cutoff, joined back to the order header. The distinct count
    expands to a two-phase aggregate (dedup shuffle then count) keyed on
    orderkey — the same key the join uses, so AQE can plan the join without
    a second fact shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    s = (li.groupBy("l_orderkey")
         .agg(F.count_distinct("l_suppkey").alias("n_suppliers"))
         .where(F.col("n_suppliers") >= 3))
    return (orders.join(s, orders.o_orderkey == s.l_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count("*").cast("bigint").alias("n_orders"),
                 F.round(F.avg("n_suppliers"), 4).alias("avg_suppliers")))


@register(
    "q158_exists_projection",
    sql="""
    SELECT c_custkey, c_mktsegment,
           EXISTS (SELECT 1 FROM orders o
                   WHERE o.o_custkey = c.c_custkey
                     AND o.o_totalprice > 400000) AS has_big_order
    FROM customer c
    """,
)
def q158_exists_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS in the projection (not the WHERE): a boolean flag column per
    customer. Catalyst rewrites the correlated EXISTS to an existence join
    (a left outer with an exists marker) — one pass over each table, no
    per-row subquery execution."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_ex_v")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_ex_v")
    return spark.sql("""
        SELECT c_custkey, c_mktsegment,
               EXISTS (SELECT 1 FROM orders_ex_v o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_totalprice > 400000) AS has_big_order
        FROM customer_ex_v c
    """)


@register(
    "q159_lateral_topn",
    sql="""
    SELECT n.n_name, t.c_custkey, round(t.c_acctbal, 2) AS c_acctbal
    FROM nation n, LATERAL (
        SELECT c_custkey, c_acctbal
        FROM customer c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey
        LIMIT 2
    ) t
    """,
)
def q159_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (top-2 customers per nation) — the SQL
    plane's per-row-subquery surface. Catalyst plans the lateral as a join,
    not 25 re-executions; the equivalent DataFrame shape is q19/q69's
    rank-filter, which WindowGroupLimit optimizes the same way."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_lat_v")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat_v")
    return spark.sql("""
        SELECT n.n_name, t.c_custkey, round(t.c_acctbal, 2) AS c_acctbal
        FROM nation_lat_v n, LATERAL (
            SELECT c_custkey, c_acctbal
            FROM customer_lat_v c
            WHERE c.c_nationkey = n.n_nationkey
            ORDER BY c_acctbal DESC, c_custkey
            LIMIT 2
        ) t
    """)


_REACH_SQL = """
WITH RECURSIVE
seqs AS (
    SELECT event_type,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nxt
    FROM {events}
),
edges AS (
    SELECT DISTINCT event_type AS src, nxt AS dst
    FROM seqs WHERE nxt IS NOT NULL
),
reach(dst, hops) AS (
    SELECT dst, 1 FROM edges WHERE src = 'signup'
    UNION ALL
    SELECT e.dst, r.hops + 1
    FROM reach r JOIN edges e ON e.src = r.dst
    WHERE r.hops < 4
)
SELECT dst AS event_type, CAST(min(hops) AS BIGINT) AS min_hops
FROM reach GROUP BY dst
"""


@register("q209_recursive_reachability", sql=_REACH_SQL.format(events="events"))
def q209_recursive_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph recursion through WITH RECURSIVE (the other recursive-CTE shape
    next to q104's series generation): minimum transition hops from 'signup'
    to every reachable event type over the distinct per-user transition
    graph, depth-bounded at 4 so cyclic edges terminate under UNION ALL.
    The IDENTICAL SQL text runs on Spark and the DuckDB oracle. Spark plans
    each recursive step as a join + union round — the same envelope as the
    hand-rolled loops in operators/graph.py, but driven by the engine."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_rec_v")
    return spark.sql(_REACH_SQL.format(events="events_rec_v"))


@register(
    "q323_q22_shape",
    sql="""
    WITH pos_avg AS (
        SELECT avg(c_acctbal) AS ab FROM customer WHERE c_acctbal > 0
    ),
    cut AS (
        SELECT max(epoch_us(o_orderdate)) - 5184000000000 AS c FROM orders
    ),
    rich_idle AS (
        SELECT c.c_custkey, c.c_acctbal,
               CAST(c.c_nationkey % 5 AS BIGINT) AS cntry_grp
        FROM customer c CROSS JOIN pos_avg p CROSS JOIN cut
        WHERE c.c_acctbal > p.ab
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND epoch_us(o.o_orderdate) > cut.c)
    )
    SELECT cntry_grp,
           CAST(count(*) AS BIGINT) AS n_custs,
           round(sum(c_acctbal), 2) AS total_acctbal
    FROM rich_idle
    GROUP BY cntry_grp
    ORDER BY cntry_grp
    """,
)
def q323_q22_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (Global Sales Opportunity): customers with
    above-average positive balances and no RECENT orders (a 60-day
    recency window replaces the original's no-orders-ever, which the
    fixture's dense order history would leave empty), counted per country
    group (nationkey bucket stands in for the phone prefix the fixture
    lacks). The classic three-part composite: an uncorrelated scalar
    subquery (broadcast one row), an anti join against orders (broadcast
    the filtered customer side, never shuffle the fact), and a grouped
    rollup of the survivors — each piece exists alone (q66, q08, q01);
    this pins their composition, which is where optimizers historically
    get Q22 wrong."""
    for t in ("customer", "orders"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_v")
    return spark.sql("""
        WITH pos_avg AS (
            SELECT avg(c_acctbal) AS ab FROM customer_v WHERE c_acctbal > 0
        ),
        cut AS (
            SELECT max(unix_micros(CAST(o_orderdate AS TIMESTAMP)))
                   - 5184000000000 AS c
            FROM orders_v
        ),
        rich_idle AS (
            SELECT c.c_custkey, c.c_acctbal,
                   CAST(c.c_nationkey % 5 AS BIGINT) AS cntry_grp
            FROM customer_v c CROSS JOIN pos_avg p CROSS JOIN cut
            WHERE c.c_acctbal > p.ab
              AND NOT EXISTS (
                  SELECT 1 FROM orders_v o
                  WHERE o.o_custkey = c.c_custkey
                    AND unix_micros(CAST(o.o_orderdate AS TIMESTAMP)) > cut.c)
        )
        SELECT cntry_grp,
               CAST(count(*) AS BIGINT) AS n_custs,
               round(sum(c_acctbal), 2) AS total_acctbal
        FROM rich_idle
        GROUP BY cntry_grp
        ORDER BY cntry_grp
    """)


@register(
    "q324_q16_shape",
    sql="""
    SELECT p.p_brand, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#23'
      AND p.p_size IN (10, 20, 30, 40)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_size
    LIMIT 20
    """,
)
def q324_q16_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (Parts/Supplier Relationship): how many distinct
    suppliers can deliver parts of each surviving (brand, size) combo,
    excluding one brand, restricting sizes, and dropping complained-about
    suppliers via NOT IN (suppliers in deficit). Exercises the null-aware
    anti join NOT IN compiles to, dimension-filter pushdown into the part
    scan, and grouped COUNT(DISTINCT) over a join — the exact composite
    the benchmark designed Q16 to stress."""
    for t in ("lineitem", "part", "supplier"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_v")
    return spark.sql("""
        SELECT p.p_brand, p.p_size,
               CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM lineitem_v l
        JOIN part_v p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#23'
          AND p.p_size IN (10, 20, 30, 40)
          AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier_v
                                  WHERE s_acctbal < 0)
        GROUP BY p.p_brand, p.p_size
        ORDER BY supplier_cnt DESC, p.p_brand, p.p_size
        LIMIT 20
    """)


# ---------------------------------------------------------------------------
# Round-4 optimizer-shape set (round-3 VERDICT item 8): the classic TPC-H
# planner stressors the registry didn't yet cover, adapted to the fixture
# schema (which has no partsupp — lineitem stands in as the supply
# relation, and Q20's correlated availqty threshold becomes a constant,
# keeping the IN-over-grouped-HAVING shape). Each runs the IDENTICAL SQL
# text on Spark (temp views) and DuckDB.
# ---------------------------------------------------------------------------


def _views(spark, sf_dir: str, *tables: str) -> dict[str, str]:
    out = {}
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_v")
        out[t] = f"{t}_v"
    return out


_Q2_SQL = """
SELECT DISTINCT round(s.s_acctbal, 2) AS s_acctbal, s.s_name,
       p.p_partkey, p.p_name,
       round(l.l_extendedprice, 2) AS best_price
FROM {part} p
JOIN {lineitem} l ON l.l_partkey = p.p_partkey
JOIN {supplier} s ON s.s_suppkey = l.l_suppkey
WHERE p.p_size <= 5 AND p.p_type = 'SMALL'
  AND l.l_extendedprice = (SELECT min(l2.l_extendedprice)
                           FROM {lineitem} l2
                           WHERE l2.l_partkey = p.p_partkey)
ORDER BY s_acctbal DESC, p.p_partkey, s.s_name
LIMIT 100
"""


@register("q359_q2_shape",
          sql=_Q2_SQL.format(part="part", lineitem="lineitem",
                             supplier="supplier"))
def q359_q2_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (Minimum Cost Supplier): for each part in a
    size/type slice, the supplier(s) offering the correlated MINIMUM price
    (lineitem plays partsupp). The planner must decorrelate the scalar
    min-subquery into an aggregate + join rather than re-running it per
    part — the defining Q2 stressor — then order/limit on the outer. Exact
    double equality against the stored value is safe (no arithmetic on
    either side of the comparison)."""
    v = _views(spark, sf_dir, "part", "lineitem", "supplier")
    return spark.sql(_Q2_SQL.format(**v))


_Q9_SQL = """
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       round(CAST(sum(CAST(floor((l.l_extendedprice * (1 - l.l_discount)
                 - 0.6 * p.p_retailprice * l.l_quantity) * 100 + 0.5)
                 AS BIGINT)) AS DOUBLE) / 100.0, 2) AS profit
FROM {lineitem} l
JOIN {supplier} s ON s.s_suppkey = l.l_suppkey
JOIN {part} p ON p.p_partkey = l.l_partkey
JOIN {orders} o ON o.o_orderkey = l.l_orderkey
JOIN {nation} n ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%gear%'
GROUP BY n.n_name, year(o.o_orderdate)
ORDER BY nation, o_year DESC
"""


@register("q360_q9_shape",
          sql=_Q9_SQL.format(lineitem="lineitem", supplier="supplier",
                             part="part", orders="orders", nation="nation"))
def q360_q9_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (Product Type Profit): the five-way multi-fact star —
    lineitem joined to supplier, part (with a LIKE filter the scan should
    receive), orders, and nation — aggregated by (nation, order year).
    Stresses join ORDERING (the part filter must prune before the wide
    joins) and partial aggregation over a multi-join pipeline; dims
    broadcast, the fact shuffles once for the final group.

    The profit sum goes through exact integer CENTS — floor(x·100 + 0.5),
    pure IEEE ops that are bit-identical across engines (round() is not:
    BigDecimal half-up vs float math disagree within an ULP of ties) —
    summed as bigint: the revenue-minus-cost subtraction is
    near-cancelling, which amplified cross-engine summation-order ULP
    noise past the 2dp rounding edge (caught by the full rehearsal:
    417321.13 vs .12). Integer summation is associative, so both engines
    agree for ANY aggregation order."""
    v = _views(spark, sf_dir, "lineitem", "supplier", "part", "orders",
               "nation")
    return spark.sql(_Q9_SQL.format(**v))


_Q11_SQL = """
SELECT l.l_partkey AS p_key,
       round(sum(l.l_extendedprice * l.l_quantity), 2) AS part_value
FROM {lineitem} l
JOIN {supplier} s ON s.s_suppkey = l.l_suppkey
WHERE s.s_nationkey < 5
GROUP BY l.l_partkey
HAVING sum(l.l_extendedprice * l.l_quantity) >
       (SELECT sum(l2.l_extendedprice * l2.l_quantity) * 0.001
        FROM {lineitem} l2
        JOIN {supplier} s2 ON s2.s_suppkey = l2.l_suppkey
        WHERE s2.s_nationkey < 5)
ORDER BY part_value DESC, p_key
"""


@register("q361_q11_shape",
          sql=_Q11_SQL.format(lineitem="lineitem", supplier="supplier"))
def q361_q11_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (Important Stock): grouped value per part with a
    HAVING threshold that is itself an uncorrelated scalar subquery over
    the SAME filtered join (0.1% of total). The planner should evaluate
    the subquery once (broadcast one row), not per group — and ideally
    reuse the shared join subplan. The threshold compare is on unrounded
    sums; rounding only the projected output keeps both engines' hash
    identical while the 0.1% margin swamps summation-order ULP noise."""
    v = _views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(_Q11_SQL.format(**v))


_Q13_SQL = """
WITH c_orders AS (
    SELECT c.c_custkey, count(o.o_orderkey) AS c_count
    FROM {customer} c
    LEFT JOIN {orders} o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
)
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(count(*) AS BIGINT) AS custdist
FROM c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


@register("q362_q13_shape",
          sql=_Q13_SQL.format(customer="customer", orders="orders"))
def q362_q13_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (Customer Distribution): LEFT join with the filter
    in the JOIN CONDITION (not WHERE — pushing it to WHERE would turn the
    join inner and silently drop zero-order customers), then a two-level
    aggregation producing the orders-per-customer histogram. The
    outer-join-preserving filter placement is the classic Q13 trap."""
    v = _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_Q13_SQL.format(**v))


_Q17_SQL = """
SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
FROM {lineitem} l
JOIN {part} p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                      FROM {lineitem} l2
                      WHERE l2.l_partkey = p.p_partkey)
"""


@register("q363_q17_shape",
          sql=_Q17_SQL.format(lineitem="lineitem", part="part"))
def q363_q17_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (Small-Quantity-Order Revenue): a correlated AVG
    subquery per part — the other decorrelation archetype next to Q2's
    correlated MIN. The planner must rewrite it as a per-part aggregate
    joined back to the fact; the naive per-row re-execution is quadratic.
    Single-row output (global sum / 7)."""
    v = _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q17_SQL.format(**v))


_Q20_SQL = """
SELECT s.s_name, round(s.s_acctbal, 2) AS s_acctbal
FROM {supplier} s
JOIN {nation} n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
  AND s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM {lineitem} l
      JOIN {part} p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'small%'
        AND year(l.l_shipdate) >= 1998
      GROUP BY l.l_suppkey, l.l_partkey
      HAVING sum(l.l_quantity) > 60)
ORDER BY s.s_name
"""


@register("q364_q20_shape",
          sql=_Q20_SQL.format(supplier="supplier", nation="nation",
                              lineitem="lineitem", part="part"))
def q364_q20_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (Potential Part Promotion): IN over a GROUPED +
    HAVING subquery — the planner must compile it to a semi join against
    the aggregated supply relation, with the part LIKE and the date filter
    pushed below the aggregate. The fixture has no partsupp, so the
    original's correlated availqty threshold becomes a constant (60);
    the semi-join-over-aggregate shape — what Q20 exists to stress —
    is unchanged."""
    v = _views(spark, sf_dir, "supplier", "nation", "lineitem", "part")
    return spark.sql(_Q20_SQL.format(**v))


# ---------------------------------------------------------------------------
# Round-4 continuation: the remaining classic TPC-H planner shapes the
# fixture schema can express (Q7/Q8/Q10/Q14/Q15/Q18/Q19/Q21 + a Q12
# adaptation; Q16/Q22 shapes landed earlier as q324/q323).
# Money sums go through exact integer cents — floor(x*100+0.5) —
# per the registry's bit-exactness convention.
# ---------------------------------------------------------------------------

_Q7_SQL = """
WITH flows AS (
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                AS BIGINT) AS cents
    FROM {lineitem} l
    JOIN {supplier} s ON s.s_suppkey = l.l_suppkey
    JOIN {orders} o ON o.o_orderkey = l.l_orderkey
    JOIN {customer} c ON c.c_custkey = o.o_custkey
    JOIN {nation} ns ON ns.n_nationkey = s.s_nationkey
    JOIN {nation} nc ON nc.n_nationkey = c.c_nationkey
    WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
           OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
      AND year(l.l_shipdate) IN (1996, 1997)
)
SELECT supp_nation, cust_nation, l_year,
       round(CAST(sum(cents) AS DOUBLE) / 100.0, 2) AS revenue
FROM flows
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@register("q366_q7_shape",
          sql=_Q7_SQL.format(lineitem="lineitem", supplier="supplier",
                             orders="orders", customer="customer",
                             nation="nation"))
def q366_q7_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (Volume Shipping): the six-way join with a
    DISJUNCTIVE nation-PAIR predicate — (A,B) OR (B,A) — that the planner
    must keep above the nation joins (it references both sides) while
    still pushing the year filter into the fact scan, then revenue by
    (supp_nation, cust_nation, year). The same dimension table joins
    twice under different roles."""
    v = _views(spark, sf_dir, "lineitem", "supplier", "orders", "customer",
               "nation")
    return spark.sql(_Q7_SQL.format(**v))


_Q8_SQL = """
WITH vol AS (
    SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                AS BIGINT) AS cents,
           ns.n_name AS supp_nation
    FROM {lineitem} l
    JOIN {part} p ON p.p_partkey = l.l_partkey
    JOIN {supplier} s ON s.s_suppkey = l.l_suppkey
    JOIN {orders} o ON o.o_orderkey = l.l_orderkey
    JOIN {nation} ns ON ns.n_nationkey = s.s_nationkey
    WHERE p.p_type = 'PROMO'
)
SELECT o_year,
       round(CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN cents
                           ELSE 0 END) AS DOUBLE)
             / CAST(sum(cents) AS DOUBLE), 6) AS mkt_share
FROM vol
GROUP BY o_year
ORDER BY o_year
"""


@register("q367_q8_shape",
          sql=_Q8_SQL.format(lineitem="lineitem", part="part",
                             supplier="supplier", orders="orders",
                             nation="nation"))
def q367_q8_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (National Market Share): one nation's share of a
    filtered product market per year — conditional-sum over total-sum in
    a single aggregation pass (never two scans), over a five-way star.
    The share ratio divides two EXACT cent sums, so both engines divide
    identical bigints — no accumulated-double noise under the 6dp round."""
    v = _views(spark, sf_dir, "lineitem", "part", "supplier", "orders",
               "nation")
    return spark.sql(_Q8_SQL.format(**v))


_Q10_SQL = """
SELECT c.c_custkey, c.c_name, n.n_name,
       round(CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                                 * 100 + 0.5) AS BIGINT)) AS DOUBLE)
             / 100.0, 2) AS revenue
FROM {customer} c
JOIN {orders} o ON o.o_custkey = c.c_custkey
JOIN {lineitem} l ON l.l_orderkey = o.o_orderkey
JOIN {nation} n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R' AND year(o.o_orderdate) = 1997
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
              AS BIGINT)) DESC, c.c_custkey
LIMIT 20
"""


@register("q368_q10_shape",
          sql=_Q10_SQL.format(customer="customer", orders="orders",
                              lineitem="lineitem", nation="nation"))
def q368_q10_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (Returned Item Reporting): top-20 customers by
    returned-merchandise revenue in one year — grouped agg over a
    four-way join with ORDER BY the aggregate + LIMIT (the planner should
    produce TakeOrderedAndProject over the final agg, never a global
    sort). The LIMIT cutoff orders by the EXACT cent sum (bigint) with a
    custkey tiebreak, so the cut is engine-independent."""
    v = _views(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return spark.sql(_Q10_SQL.format(**v))


_Q12_SQL = """
SELECT l.l_returnflag,
       CAST(sum(CASE WHEN o.o_orderpriority = '1-URGENT'
                     THEN 1 ELSE 0 END) AS BIGINT) AS urgent_orders,
       CAST(sum(CASE WHEN o.o_orderpriority <> '1-URGENT'
                     THEN 1 ELSE 0 END) AS BIGINT) AS other_orders
FROM {orders} o
JOIN {lineitem} l ON l.l_orderkey = o.o_orderkey
WHERE year(l.l_shipdate) = 1997
GROUP BY l.l_returnflag
ORDER BY l.l_returnflag
"""


@register("q369_q12_shape",
          sql=_Q12_SQL.format(orders="orders", lineitem="lineitem"))
def q369_q12_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (Shipping Modes / Order Priority): CASE-bucketed
    conditional counts over a fact-to-fact join with a year filter — the
    pivot-by-CASE aggregation pattern. The fixture has no l_shipmode /
    commit/receipt dates, so returnflag stands in for shipmode; the
    planner shape (join + conditional aggregation in ONE pass) is
    identical."""
    v = _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_Q12_SQL.format(**v))


_Q14_SQL = """
SELECT round(100.0
             * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                        THEN CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                                        * 100 + 0.5) AS BIGINT)
                        ELSE 0 END) AS DOUBLE)
             / CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                                   * 100 + 0.5) AS BIGINT)) AS DOUBLE),
             6) AS promo_revenue_pct
FROM {lineitem} l
JOIN {part} p ON p.p_partkey = l.l_partkey
WHERE year(l.l_shipdate) = 1998
"""


@register("q370_q14_shape",
          sql=_Q14_SQL.format(lineitem="lineitem", part="part"))
def q370_q14_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (Promotion Effect): single-row promo revenue share
    — conditional sum over total sum in one aggregation, dim broadcast,
    month→year filter on the fact scan. Both sums are exact cents, so the
    ratio divides identical bigints in both engines."""
    v = _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q14_SQL.format(**v))


_Q15_SQL = """
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                    AS BIGINT)) AS total_cents
    FROM {lineitem}
    WHERE year(l_shipdate) = 1998
    GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name,
       round(CAST(r.total_cents AS DOUBLE) / 100.0, 2) AS total_revenue
FROM {supplier} s
JOIN revenue r ON r.supplier_no = s.s_suppkey
WHERE r.total_cents = (SELECT max(total_cents) FROM revenue)
ORDER BY s.s_suppkey
"""


@register("q371_q15_shape",
          sql=_Q15_SQL.format(lineitem="lineitem", supplier="supplier"))
def q371_q15_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (Top Supplier): a derived revenue view compared
    against ITS OWN scalar max — the planner should evaluate the view
    once and reuse it (or at worst twice), never per-supplier. Equality
    is on exact cent BIGINTS, so "the max" is the same supplier set in
    any engine — the classic Q15 tie hazard eliminated by construction."""
    v = _views(spark, sf_dir, "lineitem", "supplier")
    return spark.sql(_Q15_SQL.format(**v))


_Q18_SQL = """
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       round(o.o_totalprice, 2) AS o_totalprice,
       round(sum(l.l_quantity), 2) AS total_qty
FROM {customer} c
JOIN {orders} o ON o.o_custkey = c.c_custkey
JOIN {lineitem} l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (
    SELECT l_orderkey FROM {lineitem}
    GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, year(o.o_orderdate),
         o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
"""


@register("q372_q18_shape",
          sql=_Q18_SQL.format(customer="customer", orders="orders",
                              lineitem="lineitem"))
def q372_q18_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (Large Volume Customer): IN over a grouped-HAVING
    subquery on the SAME fact being joined — the planner must semi-join
    the pre-aggregated order quantities back onto the detail rows (two
    uses of lineitem, one aggregated), then top-100 by order value.
    total_qty sums l_quantity doubles that are exact small integers in
    the fixture, so 2dp rounding is noise-free."""
    v = _views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(_Q18_SQL.format(**v))


_Q19_SQL = """
SELECT round(CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                                 * 100 + 0.5) AS BIGINT)) AS DOUBLE)
             / 100.0, 2) AS revenue
FROM {lineitem} l
JOIN {part} p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 20)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 25
       AND l.l_quantity BETWEEN 10 AND 30)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 20 AND 40
       AND l.l_quantity BETWEEN 20 AND 40)
"""


@register("q373_q19_shape",
          sql=_Q19_SQL.format(lineitem="lineitem", part="part"))
def q373_q19_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (Discounted Revenue): the canonical DISJUNCTIVE
    predicate — OR of three (brand AND size AND quantity) conjunctions
    mixing columns from BOTH join sides. The planner must derive the
    single-table residuals (brand IN (...) on part, quantity range on
    lineitem) and push them into the scans while keeping the cross-side
    disjunction as the join filter — the optimization Q19 exists to
    test."""
    v = _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q19_SQL.format(**v))


_Q21_SQL = """
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM {supplier} s
JOIN {lineitem} l1 ON l1.l_suppkey = s.s_suppkey
JOIN {orders} o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 75 DAY
  AND EXISTS (SELECT 1 FROM {lineitem} l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM {lineitem} l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 75 DAY)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 100
"""


@register("q375_q21_shape",
          sql=_Q21_SQL.format(supplier="supplier", lineitem="lineitem",
                              orders="orders"))
def q375_q21_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (Suppliers Who Kept Orders Waiting): the hardest
    decorrelation archetype — the SAME fact referenced three times, once
    as the outer and twice in correlated EXISTS / NOT EXISTS subqueries
    with a suppkey INEQUALITY in the correlation. The planner must compile
    these to a left-semi and a left-ANTI join on l_orderkey (null-aware is
    not needed: correlation is via predicates, not IN), keeping the
    orderstatus and lateness filters pushed below. The fixture has no
    l_receiptdate/l_commitdate, so "late" is adapted to shipping >75 days
    after the order date — the triple-self-reference shape Q21 exists to
    stress is unchanged. Ties in numwait are broken by the unique s_name,
    so the LIMIT is deterministic."""
    v = _views(spark, sf_dir, "supplier", "lineitem", "orders")
    return spark.sql(_Q21_SQL.format(**v))
