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
