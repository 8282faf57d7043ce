"""As-of (point-in-time) join — SURVEY.md §2.5 J7.

Spark has no built-in as-of join; the classic scalable realization is the
union-sort trick: tag both sides, union on the join key, sort by
(key, ts, side) within key partitions, and carry the right side's values
forward with last(ignorenulls) over an unbounded-preceding frame. One
shuffle + one sort — the same cost envelope as a groupBy on the key, vs the
quadratic range join a naive `l.ts >= r.ts` theta join would plan.

Tie semantics: a right row at exactly ts == left ts IS visible (inclusive
`>=`), matching DuckDB's ASOF JOIN, because the right side sorts before the
left side at equal timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.readers import load_table
from ..plans.registry import register


def asof_join(left: DataFrame, right: DataFrame, on: str | list[str],
              left_ts: str, right_ts: str,
              value_cols: list[str], suffix: str = "_asof") -> DataFrame:
    """Left as-of join: for each left row, the most recent right row with
    ``right_ts <= left_ts`` on the same key(s).

    ``value_cols`` are the right-side columns to carry; they appear in the
    output as ``<col><suffix>`` (plus ``<right_ts><suffix>``).
    """
    keys = [on] if isinstance(on, str) else list(on)
    carried = [right_ts, *value_cols]
    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"{c}{suffix}") for c in carried],
    )
    l = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(dict(r.dtypes)[f"{c}{suffix}"]).alias(f"{c}{suffix}")
          for c in carried],
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (Window.partitionBy(*keys).orderBy("__ts", "__side")
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = unioned.select(
        "*",
        *[F.last(f"{c}{suffix}", ignorenulls=True).over(w)
          .alias(f"__filled_{c}") for c in carried],
    )
    out = filled.filter(F.col("__side") == 1)
    for c in carried:
        out = out.drop(f"{c}{suffix}").withColumnRenamed(f"__filled_{c}",
                                                         f"{c}{suffix}")
    return out.drop("__ts", "__side")


@register(
    "q53_asof_last_purchase",
    sql="""
    SELECT e.event_id, e.user_id, e.event_type,
           p.ts    AS purchase_ts_asof,
           p.value AS purchase_value_asof
    FROM events e
    ASOF LEFT JOIN (SELECT user_id, ts, value FROM events
                    WHERE event_type = 'purchase') p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
)
def q53_asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 as-of join: enrich every event with the user's most recent purchase
    at-or-before the event time (NULL if none yet) — checked against DuckDB's
    native ASOF JOIN."""
    ev = load_table(spark, sf_dir, "events")
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .select("user_id", "ts", "value"))
    joined = asof_join(
        ev.select("event_id", "user_id", "event_type", "ts"),
        purchases, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["value"], suffix="_p",
    )
    return joined.select(
        "event_id", "user_id", "event_type",
        F.col("ts_p").alias("purchase_ts_asof"),
        F.col("value_p").alias("purchase_value_asof"),
    )
